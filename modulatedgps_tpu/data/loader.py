"""Host-side minibatch pipeline (tf.data parity, numpy implementation).

The reference builds Dataset.shuffle(N, seed).batch(B).repeat()
(demos/demo_tf2.py:53-56); with buffer_size == N that is a full reshuffle
every epoch.  This iterator reproduces that: per-epoch permutation from a
seeded Generator, fixed-size batches (the trailing remainder batch is
dropped so every step has a static shape — XLA recompiles on shape change,
so ragged tail batches are a TPU anti-pattern).
"""
from __future__ import annotations

from typing import Iterator

import numpy as np

__all__ = ["minibatch_iterator"]


def minibatch_iterator(X: np.ndarray, Y: np.ndarray, batch_size: int,
                       seed: int = 0, drop_remainder: bool = True,
                       use_native: bool | None = None
                       ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Infinite (X_batch, Y_batch) stream with per-epoch seeded reshuffle.

    When the native library is built (make -C native), the per-epoch
    permutation and row gathers run in C++ (use_native=None autodetects);
    both paths are deterministic in (seed, epoch) but use different PRNGs,
    so pick one per experiment.
    """
    n = X.shape[0]
    batch_size = min(batch_size, n)
    if use_native is None:
        use_native = False  # opt-in: keeps default stream numpy-deterministic
    if use_native:
        from . import native
        if not native.available():
            raise RuntimeError("native loader requested but not built")
        Xc = np.ascontiguousarray(X, dtype=np.float64)
        Yc = np.ascontiguousarray(Y, dtype=np.float64)
        epoch = 0
        while True:
            perm = native.shuffle_epoch(seed, epoch, n)
            epoch += 1
            limit = n - batch_size + 1 if drop_remainder else n
            for start in range(0, limit, batch_size):
                idx = perm[start:start + batch_size]
                if drop_remainder and len(idx) < batch_size:
                    break
                yield native.gather_rows(Xc, idx), native.gather_rows(Yc, idx)
    rng = np.random.default_rng(seed)
    while True:
        perm = rng.permutation(n)
        limit = n - batch_size + 1 if drop_remainder else n
        for start in range(0, limit, batch_size):
            idx = perm[start:start + batch_size]
            if drop_remainder and len(idx) < batch_size:
                break
            yield X[idx], Y[idx]
