"""Serving-path benchmark at the north-star shape (VERDICT r3 #6).

models/posterior.py's README number (6.2M pts/s) was measured at M=1024
only; BASELINE's scaled synthetic is M=4096/K=8.  This measures, on the
chip:

  * precompute cost: precompute_smgp (chol + trinv + the [K, M, M]
    sandwich products, both layers) — paid once per parameter update;
  * per-batch predict_f throughput of the precomputed posterior
    (kernel build + K MXU matmuls, no chol/solves) vs the training-path
    conditional (chol + TRSM every batch) — the amortization the
    conditional_from_chol/posterior design exists for;
  * the breakeven batch count.

Methodology is bench.py's: on-device chains via lax.scan over per-rep
perturbed X (prevents hoisting), two-length slope timing to cancel the
relay's fixed dispatch cost.

Usage:  python benchmarks/serving_bench.py [--M 4096] [--batch 8192]
One JSON line on stdout; diagnostics on stderr.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

K, D = 8, 4
TRIALS = 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=4096)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.models.posterior import precompute_smgp
    from modulatedgps_tpu.ops import linalg

    if jax.default_backend() == "tpu":
        linalg.set_fast_solves(True)
    dtype = jnp.float32
    log(f"backend={jax.default_backend()} M={args.M} batch={args.batch}")

    rng = np.random.default_rng(0)
    lik = Gaussian.create(variance=0.5, D=K, dtype=dtype)
    pred = SVGP.create(SquaredExponential.create(0.5, 0.5, dtype=dtype),
                       rng.normal(size=(args.M, D)), num_latent_gps=K,
                       dtype=dtype)
    assign = SVGP.create(SquaredExponential.create(0.1, 1.0, dtype=dtype),
                         rng.normal(size=(args.M, D)), num_latent_gps=K,
                         dtype=dtype)
    model = SMGP(likelihood=lik, pred_layer=pred, assign_layer=assign,
                 K=K, num_samples=16, num_data=1_000_000)
    X = jnp.asarray(rng.uniform(-3, 3, size=(args.batch, D)), dtype)

    def slope_time(make_fn, carry0):
        totals = []
        carry = carry0
        for length in (args.reps, 2 * args.reps):
            fn = make_fn(length)
            log(f"compiling len={length} ...")
            carry, v = fn(carry, X)
            assert np.isfinite(float(v))
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                carry, v = fn(carry, X)
                float(v)
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
        return (totals[1] - totals[0]) / args.reps

    # ---- per-batch predict_y: precomputed vs training-path ----------------
    # The model rides in the scan carry, never closed over: a closed-over
    # [K, M, M] Q cache becomes a 537 MB HLO constant, which both poisons
    # dispatch (CLAUDE.md) and exceeds the remote-compile body limit.
    def make_predict(length):
        def body(carry, _):
            m, key, acc = carry
            key, sub = jax.random.split(key)
            Xi = X * (1.0 + 1e-12 * jax.random.uniform(sub, (),
                                                       dtype=dtype))
            mu, var = m.predict_y(Xi)
            return (m, key, acc + jnp.sum(mu[0]) + jnp.sum(var[0])), acc
        def run(carry, X_):
            carry, vals = jax.lax.scan(body, carry, None, length=length)
            return carry, vals[-1]
        return jax.jit(run)

    served = precompute_smgp(model)
    zero = jnp.zeros((), dtype)
    t_serve = slope_time(make_predict,
                         (served, jax.random.PRNGKey(0), zero))
    t_train = slope_time(make_predict,
                         (model, jax.random.PRNGKey(0), zero))
    log(f"predict_y per batch: precomputed {t_serve*1e3:.2f} ms, "
        f"training-path {t_train*1e3:.2f} ms")

    # ---- precompute cost (one-shot, chained) -------------------------------
    def make_pre(length):
        def body(carry, _):
            m, key, acc = carry
            key, sub = jax.random.split(key)
            eps = 1e-12 * jax.random.uniform(sub, (), dtype=dtype)
            m2 = m.replace(pred_layer=m.pred_layer.replace(
                Z=m.pred_layer.Z.replace_raw(
                    m.pred_layer.Z.raw * (1.0 + eps))))
            s = precompute_smgp(m2)
            return (m, key, acc + jnp.sum(s.pred_layer.alpha)
                    + jnp.sum(s.pred_layer.Q[0, 0, :8])), acc
        def run(carry, X_):
            carry, vals = jax.lax.scan(body, carry, None, length=length)
            return carry, vals[-1]
        return jax.jit(run)

    t_pre = slope_time(make_pre, (model, jax.random.PRNGKey(0), zero))
    log(f"precompute_smgp: {t_pre*1e3:.2f} ms")

    pts_s = args.batch / t_serve
    saved = t_train - t_serve
    breakeven = int(np.ceil(t_pre / saved)) if saved > 0 else None
    out = {
        "metric": "serving_predict_y",
        "config": {"batch": args.batch, "M": args.M, "K": K, "D": D,
                   "backend": jax.default_backend(), "reps": args.reps},
        "ms": {"predict_precomputed": round(t_serve * 1e3, 2),
               "predict_training_path": round(t_train * 1e3, 2),
               "precompute": round(t_pre * 1e3, 2)},
        "points_per_sec_precomputed": round(pts_s, 0),
        "speedup_vs_training_path": round(t_train / t_serve, 2),
        "breakeven_batches": breakeven,
        "note": "predict_y = both layers' marginals + likelihood moments; "
                "precompute amortizes chol/trinv/sandwich per parameter "
                "update (models/posterior.py)",
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
