"""End-to-end N=1M epoch: host pipeline -> TPU train step (VERDICT r4 #7).

BASELINE.json's scaled synthetic names N=1M points; bench.py measures the
steady-state on-device step but nothing showed the HOST pipeline (native
CSV parse + seeded shuffle + C++ row gather, data/loader.py) actually
feeding the chip at that scale.  This harness:

  1. synthesizes 1M points (D=4) and round-trips them through a CSV via
     the native mmap parser (the reference's tf.data analog —
     reference demos/demo_tf2.py:53-56),
  2. measures the host loader alone (gather + f32 cast, batches/s),
  3. trains >= 1 full epoch at the north-star shape (batch 8192, M 4096,
     K 8, S 16) with ASYNC dispatch — the host prepares batch i+1 while
     the device runs batch i, syncing only at epoch end — and reports
     end-to-end points/s vs the steady-state step rate.

Verdict criterion: e2e pts/s within ~0.8x of the steady-state step rate
proves the input pipeline is not the bottleneck.  (The axon relay adds
~22 ms dispatch latency per call; async dispatch overlaps it, and the
artifact records the residual as dispatch overhead, not loader cost.)

Usage: python benchmarks/epoch_e2e.py [--N 1000000] [--M 4096] [--out F]
One JSON line on stdout; diagnostics on stderr.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

K, S, D = 8, 16, 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--N", type=int, default=1_000_000)
    p.add_argument("--M", type=int, default=4096)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--csv", default="/tmp/epoch_e2e_1m.csv")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.training import make_train_step
    from modulatedgps_tpu.ops import linalg
    from modulatedgps_tpu.data import minibatch_iterator
    from modulatedgps_tpu.data import native as native_mod

    if jax.default_backend() == "tpu":
        linalg.set_fast_solves(True)
    dtype = jnp.float32
    N, M, B = args.N, args.M, args.batch
    steps_per_epoch = N // B
    log(f"backend={jax.default_backend()} N={N} M={M} batch={B} "
        f"steps/epoch={steps_per_epoch}")

    # ---- 1. synthesize + CSV round-trip through the native parser --------
    rng = np.random.default_rng(0)
    Xh = rng.uniform(-3, 3, size=(N, D))
    Yh = np.sin(Xh.sum(axis=1, keepdims=True)) + \
        0.1 * rng.normal(size=(N, 1))
    native_ok = native_mod.available()
    t0 = time.perf_counter()
    if native_ok:
        if not os.path.exists(args.csv) or \
                os.path.getsize(args.csv) < 10 * N:
            log("writing CSV ...")
            cols = [f"x{i}" for i in range(D)] + ["y"]
            arr = np.concatenate([Xh, Yh], axis=1)
            with open(args.csv, "w") as f:
                f.write(",".join(cols) + "\n")
                np.savetxt(f, arr, delimiter=",", fmt="%.8f")
        t0 = time.perf_counter()
        csv = native_mod.NativeCsv(args.csv)
        data = csv.read_columns([f"x{i}" for i in range(D)] + ["y"])
        csv.close()
        parse_s = time.perf_counter() - t0
        Xh = np.ascontiguousarray(data[:, :D])
        Yh = np.ascontiguousarray(data[:, D:])
        log(f"native CSV parse: {parse_s:.2f}s "
            f"({os.path.getsize(args.csv) / 1e6 / parse_s:.0f} MB/s)")
    else:
        parse_s = None
        log("native loader not built; using in-memory arrays")

    # ---- 2. host loader alone --------------------------------------------
    it = minibatch_iterator(Xh, Yh, B, seed=0)
    next(it)  # warm (epoch permutation)
    t0 = time.perf_counter()
    for _ in range(steps_per_epoch):
        xb, yb = next(it)
        xb32 = xb.astype(np.float32)
        yb32 = yb.astype(np.float32)
    loader_s = time.perf_counter() - t0
    loader_pts_s = steps_per_epoch * B / loader_s
    log(f"host loader alone: {loader_s:.2f}s/epoch "
        f"({loader_pts_s / 1e3:.0f}k pts/s)")

    # ---- 3. model + step --------------------------------------------------
    lik = Gaussian.create(variance=0.5, D=K, dtype=dtype)
    pred = SVGP.create(SquaredExponential.create(0.5, 0.5, dtype=dtype),
                       rng.normal(size=(M, D)), num_latent_gps=K,
                       dtype=dtype)
    assign = SVGP.create(SquaredExponential.create(0.1, 1.0, dtype=dtype),
                         rng.normal(size=(M, D)), num_latent_gps=K,
                         dtype=dtype)
    model = SMGP(likelihood=lik, pred_layer=pred, assign_layer=assign,
                 K=K, num_samples=S, num_data=N)
    optimizer = optax.adam(5e-3)
    init_fn, step_fn = make_train_step(optimizer)
    step_fn = jax.jit(step_fn, donate_argnums=(0,))
    state = init_fn(model, jax.random.PRNGKey(0))

    xb, yb = next(minibatch_iterator(Xh, Yh, B, seed=0))
    log("compiling step ...")
    t0 = time.perf_counter()
    state, lv = step_fn(state, jnp.asarray(xb.astype(np.float32)),
                        jnp.asarray(yb.astype(np.float32)))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(float(lv))
    log(f"compile+first step: {compile_s:.1f}s")

    # ---- 4. the epoch(s): async dispatch, sync at end --------------------
    it = minibatch_iterator(Xh, Yh, B, seed=1)
    total_steps = args.epochs * steps_per_epoch
    losses = []
    t0 = time.perf_counter()
    for i in range(total_steps):
        xb, yb = next(it)
        state, lv = step_fn(state, jnp.asarray(xb.astype(np.float32)),
                            jnp.asarray(yb.astype(np.float32)))
        losses.append(lv)   # keep handles; do NOT block
    final_loss = float(losses[-1])           # sync point
    epoch_s = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    e2e_pts_s = total_steps * B / epoch_s
    e2e_ms_step = epoch_s / total_steps * 1e3
    log(f"epoch: {epoch_s:.2f}s for {total_steps} steps "
        f"({e2e_ms_step:.1f} ms/step e2e, {e2e_pts_s / 1e3:.1f}k pts/s); "
        f"first/final loss {float(losses[0]):.4f}/{final_loss:.4f}")

    out = {
        "metric": "epoch_e2e_1m",
        "config": {"N": N, "M": M, "batch": B, "K": K, "S": S, "D": D,
                   "epochs": args.epochs,
                   "backend": jax.default_backend(),
                   "native_loader": native_ok},
        "csv_parse_s": round(parse_s, 2) if parse_s else None,
        "host_loader_pts_per_s": round(loader_pts_s),
        "e2e_ms_per_step": round(e2e_ms_step, 2),
        "e2e_pts_per_s": round(e2e_pts_s),
        "steps": total_steps,
        "loss_first": float(losses[0]),
        "loss_final": final_loss,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
