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
                       seed: int = 0, drop_remainder: bool = True
                       ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Infinite (X_batch, Y_batch) stream with per-epoch seeded reshuffle."""
    n = X.shape[0]
    rng = np.random.default_rng(seed)
    batch_size = min(batch_size, n)
    while True:
        perm = rng.permutation(n)
        limit = n - batch_size + 1 if drop_remainder else n
        for start in range(0, limit, batch_size):
            idx = perm[start:start + batch_size]
            if drop_remainder and len(idx) < batch_size:
                break
            yield X[idx], Y[idx]
