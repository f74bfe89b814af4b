"""Gradient-error measurement for the chol-pullback precision decision.

CHOLPREC_AB_r04.json shows DEFAULT (bf16) precision for the fused
whiten-solve pullback's three M^3 matmuls is worth 9.2 ms/step at the
north-star shape.  Whether it SHIPS depends on what it does to the
gradients it feeds: dKmm flows into dZ and the kernel hyperparameters.
The demo-scale convergence suite cannot test this (routing engages at
M >= 2048 only), so this measures the error directly on-chip: the full
training-loss gradients of both layers' Z and kernel hyperparameters at
'default' and 'high', each against the 'highest' (bf16x6) arm as the
on-chip oracle.  Context for calibration: dKmn — the OTHER half of the
same Z gradient — is computed at plain bf16 in every configuration, so
'high' is only defensible if 'default' is materially worse than it.

Usage:  python benchmarks/cholprec_graderr.py [--M 4096] [--batch 8192]
One JSON line on stdout; diagnostics on stderr.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

K, S, D = 8, 16, 4
NUM_DATA = 1_000_000


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=4096)
    p.add_argument("--batch", type=int, default=8192)
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
    key = jax.random.PRNGKey(0)

    def pull(mode):
        linalg.set_chol_pullback_precision(mode)
        # Fresh jit per mode: the precision global is read at TRACE time,
        # so a shared jitted function would silently reuse the first
        # mode's graph for all three arms (bitwise-equal "errors").
        gfun = jax.jit(jax.grad(lambda m: m.training_loss(key, X, Y)))
        g = gfun(model)
        out = {}
        for layer in ("pred_layer", "assign_layer"):
            gl = getattr(g, layer)
            out[f"{layer}.Z"] = np.asarray(gl.Z.raw)
            out[f"{layer}.lengthscales"] = np.asarray(
                gl.kernel.lengthscales.raw)
            out[f"{layer}.variance"] = np.asarray(gl.kernel.variance.raw)
        log(f"{mode}: done")
        return out

    grads = {m: pull(m) for m in ("highest", "high", "default")}
    linalg.set_chol_pullback_precision("high")

    report = {}
    for leaf in grads["highest"]:
        oracle = grads["highest"][leaf]
        scale = max(float(np.max(np.abs(oracle))), 1e-30)
        report[leaf] = {
            m: round(float(np.max(np.abs(grads[m][leaf] - oracle))) / scale,
                     9)
            for m in ("high", "default")}
        log(f"{leaf:28s} high={report[leaf]['high']:.3e} "
            f"default={report[leaf]['default']:.3e}")

    worst = {m: max(r[m] for r in report.values())
             for m in ("high", "default")}
    out = {
        "metric": "chol_pullback_precision_grad_error",
        "config": {"batch": args.batch, "M": args.M, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend()},
        "oracle": "highest (bf16x6) arm of the same on-chip graph",
        "max_rel_err_vs_oracle": report,
        "worst_leaf": worst,
        "default_vs_high_ratio": round(
            worst["default"] / max(worst["high"], 1e-30), 2),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
