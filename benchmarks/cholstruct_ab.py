"""In-chain A/B of the structured (banded Pallas) Cholesky pullback (r5).

Two questions, both measured on the real train step at the north-star
shape (the CHOLPREC_GRADERR_r04 protocol):

  1. SPEED: dense-HIGH pullback vs the banded-contraction kernels
     (ops/pallas_trimm.py) — slope-timed full step.
  2. PRECISION (diagnostic only): Z-grad deviation from the dense-HIGHEST
     on-chip oracle AT INIT.  r5 found this criterion VOID — at the
     whitened init the true Z-gradient is exactly zero, so all f32 modes
     are cancellation noise and oracle agreement is a shared-arithmetic
     artifact.  The authoritative precision arbitration is
     benchmarks/cholprec_truth.py / CHOLPREC_TRUTH_r05.json (perturbed
     trained-like state vs CPU float64 truth): structured == HIGH class,
     bf16 5x worse.

Usage: python benchmarks/cholstruct_ab.py [--M 4096] [--batch 8192]
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
    from modulatedgps_tpu.training import make_train_step
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

    optimizer = optax.adam(5e-3)
    init_fn, step_fn = make_train_step(optimizer)
    key0 = jax.random.PRNGKey(0)

    # ---- precision: Z-gradient error vs the HIGHEST oracle ---------------
    def z_grads(m):
        def loss(mm):
            return mm.training_loss(key0, X, Y)
        g = jax.jit(jax.grad(loss))(m)
        return (np.asarray(g.pred_layer.Z.raw),
                np.asarray(g.assign_layer.Z.raw),
                float(jax.jit(loss)(m)))

    def set_mode(mode):
        # modes are trace-time: callers re-jit (fresh jit in z_grads)
        if mode == "highest":
            linalg.set_chol_pullback_precision("highest")
            linalg.set_chol_structured(False)
        elif mode == "high":
            linalg.set_chol_pullback_precision("high")
            linalg.set_chol_structured(False)
        else:
            linalg.set_chol_pullback_precision("high")
            linalg.set_chol_structured(None)

    grads = {}
    for mode in ("highest", "high", "structured"):
        set_mode(mode)
        gp, ga, lv = z_grads(model)
        grads[mode] = (gp, ga)
        log(f"{mode}: loss={lv:.6f} |gZp|={np.abs(gp).max():.3e}")

    def rel_err(a, b):
        scale = np.abs(b).max()
        return float(np.abs(a - b).max() / scale)

    err = {
        "high_vs_highest": [rel_err(grads["high"][i], grads["highest"][i])
                            for i in range(2)],
        "structured_vs_highest": [
            rel_err(grads["structured"][i], grads["highest"][i])
            for i in range(2)],
    }
    worst_hi = max(err["high_vs_highest"])
    worst_st = max(err["structured_vs_highest"])
    # diagnostic only — see CHOLPREC_TRUTH_r05.json (init-state
    # oracle agreement is void; kept for cross-round comparability)
    precision_ok = worst_st < 5.0 * max(worst_hi, 1e-6)
    log(f"Z-grad rel err: high {err['high_vs_highest']}, "
        f"structured {err['structured_vs_highest']} -> ok={precision_ok}")

    # ---- speed: slope-timed step -----------------------------------------
    def time_step(tag):
        totals = []
        state = init_fn(model, key0)
        for length in (args.reps, 2 * args.reps):
            def body(state, _):
                state, lv = step_fn(state, X, Y)
                return state, lv

            def run(state):
                state, lvs = jax.lax.scan(body, state, None, length=length)
                return state, lvs[-1]

            fn = jax.jit(run)
            log(f"compiling {tag} len={length} ...")
            state, v = fn(state)
            assert np.isfinite(float(v)), f"{tag} non-finite"
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                state, v = fn(state)
                float(v)
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
        slope = (totals[1] - totals[0]) / args.reps
        log(f"{tag}: {slope * 1e3:.2f} ms/step")
        return slope * 1e3

    set_mode("high")
    t_dense = time_step("dense_high")
    set_mode("structured")
    t_struct = time_step("structured")
    linalg.set_chol_structured(None)
    linalg.set_chol_pullback_precision("high")

    out = {
        "metric": "chol_pullback_structured_ab",
        "config": {"batch": args.batch, "M": args.M, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend(), "reps": args.reps},
        "z_grad_rel_err": err,
        "precision_ok_init_state_diagnostic": bool(precision_ok),
        "precision_authority": "CHOLPREC_TRUTH_r05.json: structured == HIGH class vs f64 truth at a trained-like state",
        "ms_per_step": {"dense_high": round(t_dense, 2),
                        "structured": round(t_struct, 2)},
        "speedup": round(t_dense / t_struct, 3),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
