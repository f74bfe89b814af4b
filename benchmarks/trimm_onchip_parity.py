"""On-chip parity of the banded chol-pullback kernels (ops/pallas_trimm.py).

Compiled-mode evidence (interpret-mode tests live in
tests/test_pallas_trimm.py): realistic conditioning — SE-kernel Kmm at
jitter 1e-4, Linv from the Pallas TRSM — each product and the composed
pullback compared against a host float64 oracle, alongside the dense
XLA composition at HIGH.

Usage: python benchmarks/trimm_onchip_parity.py [--M 4096] [--out F]
One JSON line on stdout; diagnostics on stderr.
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=4096)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.ops import pallas_trimm as ptm, linalg

    linalg.set_fast_solves(True)
    M = args.M
    rng = np.random.default_rng(0)
    kern = SquaredExponential.create(0.5, 0.5, dtype=jnp.float32)
    Z = jnp.asarray(rng.normal(size=(M, 4)), jnp.float32)
    Kmm = kern.K(Z) + 1e-4 * jnp.eye(M, dtype=jnp.float32)
    L = np.asarray(jax.jit(jnp.linalg.cholesky)(Kmm))
    Linv = np.asarray(jax.jit(linalg.triangular_inverse)(jnp.asarray(L)))
    Lbar = np.tril(rng.normal(size=(M, M))).astype(np.float32) * 1e-3

    L64, Li64, Lb64 = (x.astype(np.float64) for x in (L, Linv, Lbar))
    P64 = L64.T @ Lb64
    phi64 = np.tril(P64) - 0.5 * np.diag(np.diag(P64))
    S1_64 = Li64.T @ phi64
    Kraw64 = S1_64 @ Li64
    K64 = 0.5 * (Kraw64 + Kraw64.T)

    Lj, Lij, Lbj = map(jnp.asarray, (L, Linv, Lbar))

    def err(a, ref):
        return float(np.abs(np.asarray(a, np.float64) - ref).max()
                     / np.abs(ref).max())

    res = {}
    Ps = jax.jit(lambda a, b: ptm.tri_tt_matmul(a, b, tril_out=True))(Lj, Lbj)
    res["P_tril"] = err(np.tril(np.asarray(Ps)), np.tril(P64))
    phis = jnp.tril(Ps) - 0.5 * jnp.diag(jnp.diagonal(Ps))
    S1s = jax.jit(lambda a, b: ptm.tri_tt_matmul(a, b, tril_out=False))(
        Lij, phis)
    res["S1"] = err(S1s, S1_64)
    Ks = jax.jit(ptm.tri_nt_matmul)(S1s, Lij)
    res["Kraw"] = err(Ks, Kraw64)
    res["pullback_structured"] = err(
        jax.jit(ptm.chol_pullback_structured)(Lj, Lij, Lbj), K64)
    res["pullback_dense_high"] = err(
        jax.jit(lambda a, b, c: ptm.chol_pullback_dense(
            a, b, c, jax.lax.Precision.HIGH))(Lj, Lij, Lbj), K64)
    for k, v in res.items():
        log(f"{k}: rel err vs f64 = {v:.3e}")
    ok = res["pullback_structured"] < 3.0 * max(
        res["pullback_dense_high"], 1e-6)

    out = {"metric": "trimm_onchip_parity",
           "config": {"M": M, "backend": jax.default_backend(),
                      "conditioning": "SE-kernel Kmm, jitter 1e-4, "
                                      "Linv from the Pallas TRSM"},
           "rel_err_vs_f64": {k: round(v, 9) for k, v in res.items()},
           "structured_within_high_class": bool(ok)}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
