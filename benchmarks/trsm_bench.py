"""Large-M linalg routing decision: XLA vs Pallas chol/TRSM on real TPU.

VERDICT r2 #8 asked for a measured decision on the Pallas linalg surface;
the r3 roofline parts decomposition (benchmarks/roofline.py --parts) showed
WHERE it could win: the conditional chain's matmul core already runs at
97-98% of the bf16 roofline, and the entire remaining gap is the
sequential-substitution prologue — chol(Kmm) at 4-18% of its roof and the
explicit triangular inverse (fast-solves path) at 6-9%.  At M=4096 the
triangular inverse alone is ~5 ms = 25% of the chain.

This bench times, per M (N fixed RHS count):
  chol.xla          jnp.linalg.cholesky
  chol.pallas       cholesky_blocked (M<=1024) / cholesky_large
  solve.xla_fast    triangular_inverse + matmul  (current fast_solves path)
  solve.xla_seq     lax.triangular_solve          (sequential substitution)
  solve.pallas      solve_triangular_blocked / solve_triangular_large
  trinv.xla         lax.triangular_solve(L, I)
  trinv.pallas      pallas TRSM with I as RHS

All timings use two-length lax.scan slope timing (cancels the ~22 ms relay
dispatch).  Every contender's chain carry is a FULL-matrix reduction so XLA
cannot narrow the computation (the identical reduction cost cancels in the
comparison).  Writes TRSM_BENCH_r03.json with a routing recommendation.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/trsm_bench.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=8192, help="RHS count")
    ap.add_argument("--Ms", default="1024,4096,8192")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "TRSM_BENCH_r03.json"))
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    if jax.default_backend() != "tpu":
        log("not on TPU — refusing to write a decision artifact")
        sys.exit(2)

    from modulatedgps_tpu.ops.pallas_linalg import (
        cholesky_blocked, cholesky_large, solve_triangular_blocked,
        solve_triangular_large, VMEM_MAX_DIM)

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    results = {}

    def chain(body, length, *operands):
        def run(c0, *ops):
            def step(c, _):
                return body(c, *ops), None
            c, _ = jax.lax.scan(step, c0, None, length=length)
            return c
        return jax.jit(run)

    def timed(name, body, reps, *arr):
        # Adaptive: a non-positive slope means the op is too cheap at this
        # chain length for relay noise — double reps (up to 8x) and retry.
        for attempt in range(4):
            totals = []
            for length in (reps, 2 * reps):
                fn = chain(body, length)
                float(fn(jnp.zeros((), dtype), *arr))
                best = float("inf")
                for _ in range(args.trials):
                    t0 = time.perf_counter()
                    float(fn(jnp.zeros((), dtype), *arr))
                    best = min(best, time.perf_counter() - t0)
                totals.append(best)
            slope = totals[1] - totals[0]
            if slope > 0:
                t = slope / reps
                log(f"{name:20s} {t * 1e3:9.3f} ms  (reps={reps})")
                return t
            log(f"{name}: invalid slope at reps={reps}, retrying x2")
            reps *= 2
        log(f"{name}: INVALID slope after escalation, skipping")
        return None

    N = args.N
    for M in (int(m) for m in args.Ms.split(",")):
        A0 = rng.normal(size=(M, M)).astype(np.float32)
        Kmm = jnp.asarray(A0 @ A0.T / M + 2.0 * np.eye(M, dtype=np.float32))
        L0 = jax.jit(jnp.linalg.cholesky)(Kmm)
        Bmat = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
        reps = max(2, 4096 // M * 4)

        def eyeM():
            # Built INSIDE the traced bodies: a closed-over jnp.eye becomes
            # a literal in the lowered program (268 MB at M=8192 — the
            # compile relay rejects it with HTTP 413).
            return jnp.eye(M, dtype=dtype)
        row = {}

        def chol_xla(c, K):
            L = jnp.linalg.cholesky(K + c * eyeM())
            return jnp.sum(L) * jnp.asarray(1e-12, dtype)

        def chol_pallas(c, K):
            f = cholesky_blocked if M <= VMEM_MAX_DIM else cholesky_large
            L = f(K + c * eyeM())
            return jnp.sum(L) * jnp.asarray(1e-12, dtype)

        def solve_xla_fast(c, L, B):
            Linv = jax.lax.linalg.triangular_solve(L + c * eyeM(), eyeM(),
                                                   left_side=True, lower=True)
            X = jnp.matmul(Linv, B, preferred_element_type=dtype)
            return jnp.sum(X) * jnp.asarray(1e-12, dtype)

        def solve_xla_seq(c, L, B):
            X = jax.lax.linalg.triangular_solve(L + c * eyeM(), B,
                                                left_side=True, lower=True)
            return jnp.sum(X) * jnp.asarray(1e-12, dtype)

        def solve_pallas(c, L, B):
            f = (solve_triangular_blocked if M <= VMEM_MAX_DIM
                 else solve_triangular_large)
            X = f(L + c * eyeM(), B)
            return jnp.sum(X) * jnp.asarray(1e-12, dtype)

        def trinv_xla(c, L):
            Li = jax.lax.linalg.triangular_solve(L + c * eyeM(), eyeM(),
                                                 left_side=True, lower=True)
            return jnp.sum(Li) * jnp.asarray(1e-12, dtype)

        def trinv_pallas(c, L):
            f = (solve_triangular_blocked if M <= VMEM_MAX_DIM
                 else solve_triangular_large)
            Li = f(L + c * eyeM(), eyeM())
            return jnp.sum(Li) * jnp.asarray(1e-12, dtype)

        log(f"--- M={M}, N={N} RHS, reps={reps}")
        row["chol.xla"] = timed("chol.xla", chol_xla, reps, Kmm)
        row["chol.pallas"] = timed("chol.pallas", chol_pallas, reps, Kmm)
        row["solve.xla_fast"] = timed("solve.xla_fast", solve_xla_fast,
                                      reps, L0, Bmat)
        row["solve.xla_seq"] = timed("solve.xla_seq", solve_xla_seq,
                                     reps, L0, Bmat)
        row["solve.pallas"] = timed("solve.pallas", solve_pallas,
                                    reps, L0, Bmat)
        row["trinv.xla"] = timed("trinv.xla", trinv_xla, reps, L0)
        row["trinv.pallas"] = timed("trinv.pallas", trinv_pallas, reps, L0)
        results[str(M)] = {k: (round(v * 1e3, 3) if v else None)
                           for k, v in row.items()}

    payload = {"harness": "benchmarks/trsm_bench.py",
               "device": "TPU v5e (axon relay, slope timing)",
               "N_rhs": N,
               "ms": results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
