"""In-chain A/B of the tril-blocked whitened-KL kernels (r5).

Dense closed-form analytic-VJP KL vs the Pallas tril-blocks-only kernels
(ops/pallas_kl.py) on bench.py's exact train step, slope-timed; loss and
gradient-checksum parity checked on-chip first (the routed backward's
strictly-upper garbage must vanish through the Parameter tril-VJP mask).

Usage: python benchmarks/kl_tril_ab.py [--M 4096] [--batch 8192]
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
    from modulatedgps_tpu.ops import kl as kl_mod

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

    # ---- parity on-chip ---------------------------------------------------
    def loss_and_gsum(m):
        val, grads = jax.value_and_grad(
            lambda mm: mm.training_loss(key0, X, Y))(m)
        gs = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads)
                 if hasattr(g, "dtype") and jnp.issubdtype(
                     g.dtype, jnp.floating))
        return val, gs

    vals = {}
    for mode, name in ((False, "dense"), (None, "tril")):
        kl_mod.set_kl_tril_dispatch(mode)
        v, gs = jax.jit(loss_and_gsum)(model)
        vals[name] = (float(v), float(gs))
        log(f"parity {name}: loss={vals[name][0]:.6f} "
            f"gsum={vals[name][1]:.3f}")
    rel_loss = abs(vals["tril"][0] - vals["dense"][0]) / abs(
        vals["dense"][0])
    rel_gsum = abs(vals["tril"][1] - vals["dense"][1]) / abs(
        vals["dense"][1])
    parity = {"rel_loss": float(rel_loss), "rel_gsum": float(rel_gsum),
              "ok": bool(rel_loss < 1e-5 and rel_gsum < 1e-4)}

    # ---- slope-timed step -------------------------------------------------
    def time_step(tag, mode):
        kl_mod.set_kl_tril_dispatch(mode)
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

    t_dense = time_step("dense", False)
    t_tril = time_step("tril", None)
    kl_mod.set_kl_tril_dispatch(None)

    out = {
        "metric": "kl_tril_inchain_ab",
        "config": {"batch": args.batch, "M": args.M, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend(), "reps": args.reps},
        "parity": parity,
        "ms_per_step": {"dense": round(t_dense, 2),
                        "tril": round(t_tril, 2)},
        "speedup": round(t_dense / t_tril, 3),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
