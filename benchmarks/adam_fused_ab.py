"""In-chain A/B of the fused tril Adam (training/fused_adam.py).

optax.adam walks the dense [K, M, M] q_sqrt leaves (params, grads, two
moments, plus a materialized ``updates`` tree and a separate apply pass);
FusedAdam applies the identical arithmetic in one Pallas kernel over the
lower-triangular blocks only — roughly half the optimizer HBM traffic for
the step's largest leaves.  This times bench.py's exact step
(scan-chained, slope-debiased) at the north-star shape under both
optimizers, after checking that a few real steps from the same init land
on the same losses and parameters.

Usage:  python benchmarks/adam_fused_ab.py [--M 4096] [--batch 8192]
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
NUM_DATA = 1_000_000
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
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.training import make_train_step, fused_adam
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
                 K=K, num_samples=S, num_data=NUM_DATA)
    X = jnp.asarray(rng.uniform(-3, 3, size=(args.batch, D)), dtype)
    Y = jnp.asarray(rng.normal(size=(args.batch, 1)), dtype)
    key0 = jax.random.PRNGKey(0)

    steps = {"optax": make_train_step(optax.adam(5e-3)),
             "fused": make_train_step(fused_adam(5e-3))}

    # ---- numerical parity on-chip: 3 real steps from the same init --------
    vals = {}
    for name, (init_fn, step_fn) in steps.items():
        fn = jax.jit(step_fn)
        state = init_fn(model, key0)
        losses = []
        for _ in range(3):
            state, lv = fn(state, X, Y)
            losses.append(float(lv))
        qs = float(jnp.sum(jnp.abs(state.model.pred_layer.q_sqrt.raw)))
        vals[name] = (losses, qs)
        log(f"parity {name}: losses={losses} qsum={qs:.4f}")
    dl = max(abs(a - b) / max(abs(b), 1e-9)
             for a, b in zip(vals["fused"][0], vals["optax"][0]))
    dq = abs(vals["fused"][1] - vals["optax"][1]) / vals["optax"][1]
    # Gates sized for 3 CHAINED steps: step 1 agrees to ~1e-7 (identical
    # grads, pure update-arithmetic rounding); later steps amplify through
    # the loss's gradient chaos, so sums drift at the 1e-4..1e-3 scale.
    parity = {"losses_optax": vals["optax"][0],
              "losses_fused": vals["fused"][0],
              "rel_loss_max": float(dl), "rel_qsqrt_sum": float(dq),
              "ok": bool(dl < 1e-4 and dq < 1e-3)}

    # ---- slope-timed full step --------------------------------------------
    def time_step(tag, init_fn, step_fn):
        def chained(length):
            def body(state, _):
                state, lv = step_fn(state, X, Y)
                return state, lv
            def run(state):
                state, lvs = jax.lax.scan(body, state, None, length=length)
                return state, lvs[-1]
            return jax.jit(run)
        totals = []
        state = init_fn(model, key0)
        for length in (args.reps, 2 * args.reps):
            fn = chained(length)
            log(f"compiling {tag} len={length} ...")
            state, v = fn(state)
            assert np.isfinite(float(v))
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                state, v = fn(state)
                float(v)
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
        slope = (totals[1] - totals[0]) / args.reps
        log(f"{tag}: {slope * 1e3:.2f} ms/step")
        return slope

    res = {}
    for name, (init_fn, step_fn) in steps.items():
        res[name] = time_step(name, init_fn, step_fn)

    out = {
        "metric": "fused_tril_adam_inchain_ab",
        "config": {"batch": args.batch, "M": args.M, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend(), "reps": args.reps},
        "parity": parity,
        "ms_per_step": {k: round(v * 1e3, 2) for k, v in res.items()},
        "speedup": round(res["optax"] / res["fused"], 3),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
