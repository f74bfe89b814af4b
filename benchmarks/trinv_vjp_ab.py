"""A/B: full SMGP train step at M=4096 with substitution-free pullbacks.

Four arms, identical model/shapes (bench.py headline config):
  new        HEAD: solve-free trinv VJP + solve-free chol pullback (Murray
             closed with the Pallas inverse) — no sequential substitution
             anywhere in the backward
  no_cholbwd solve-free trinv VJP, but XLA's built-in chol VJP (two
             sequential [M,M]-RHS solves per chol)
  generic    Pallas TRSM forward + generic TRSM VJP (sequential XLA solve
             for Bbar) + XLA chol VJP — the first r3 routed path
  xla        no routing at all

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/trinv_vjp_ab.py
"""
from __future__ import annotations

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
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.training import make_train_step
    from modulatedgps_tpu.ops import linalg

    if jax.default_backend() != "tpu":
        log("not on TPU"); sys.exit(2)
    linalg.set_fast_solves(True)

    M, batch, K, S, D = 4096, 8192, 8, 16, 4
    dtype = jnp.float32

    def build_model():
        # Rebuilt per arm: the chained step DONATES the TrainState, which
        # consumes the model's device buffers.
        rng = np.random.default_rng(0)
        lik = Gaussian.create(variance=0.5, D=K, dtype=dtype)
        pred = SVGP.create(SquaredExponential.create(0.5, 0.5, dtype=dtype),
                           rng.normal(size=(M, D)), num_latent_gps=K,
                           dtype=dtype)
        assign = SVGP.create(SquaredExponential.create(0.1, 1.0, dtype=dtype),
                             rng.normal(size=(M, D)), num_latent_gps=K,
                             dtype=dtype)
        return SMGP(likelihood=lik, pred_layer=pred, assign_layer=assign,
                    K=K, num_samples=S, num_data=1_000_000)

    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(-3, 3, size=(batch, D)), dtype)
    Y = jnp.asarray(rng.normal(size=(batch, 1)), dtype)
    optimizer = optax.adam(5e-3)
    init_fn, step_fn = make_train_step(optimizer)

    def make_chained(length):
        def chained(state, X, Y):
            def body(s, _):
                s2, loss = step_fn(s, X, Y)
                return s2, loss
            state, losses = jax.lax.scan(body, state, None, length=length)
            return state, losses[-1]
        return jax.jit(chained, donate_argnums=(0,))

    def time_arm(reps=4, trials=3):
        state = init_fn(build_model(), jax.random.PRNGKey(0))
        totals = []
        for length in (reps, 2 * reps):
            fn = make_chained(length)
            state, loss = fn(state, X, Y)
            assert np.isfinite(float(loss))
            best = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                state, loss = fn(state, X, Y)
                float(loss)
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
        slope = totals[1] - totals[0]
        if slope <= 0:
            raise RuntimeError(f"invalid slope {totals}")
        return slope / reps

    results = {}
    # new: as shipped
    results["new"] = time_arm()
    log(f"new        {results['new']*1e3:8.2f} ms/step")

    # no_cholbwd: keep the trinv VJP, drop the chol pullback routing
    real_chol = linalg._chol_fast_bwd
    linalg._chol_fast_bwd = jnp.linalg.cholesky
    try:
        results["no_cholbwd"] = time_arm()
        log(f"no_cholbwd {results['no_cholbwd']*1e3:8.2f} ms/step")

        # generic: additionally bypass the custom trinv VJP
        real_tri = linalg._pallas_trinv
        linalg._pallas_trinv = lambda L: linalg._pallas_trsm(
            L, jnp.eye(L.shape[-1], dtype=L.dtype), lower=True, trans=False)
        try:
            results["generic"] = time_arm()
            log(f"generic    {results['generic']*1e3:8.2f} ms/step")
        finally:
            linalg._pallas_trinv = real_tri
    finally:
        linalg._chol_fast_bwd = real_chol

    # xla: routing fully off
    linalg.set_linalg_dispatch(False)
    try:
        results["xla"] = time_arm()
        log(f"xla        {results['xla']*1e3:8.2f} ms/step")
    finally:
        linalg.set_linalg_dispatch(None)

    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
