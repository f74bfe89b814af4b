"""Benchmark: SMGP ELBO training steps/sec on one TPU chip.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "config": {...}}
Diagnostics go to stderr.

Headline shape (round 3): the BASELINE.md north-star scale M=4096 / K=8
(scaled synthetic), per-chip batch 8192 — the shape where the conditional
chain meets the >=70% roofline target (ROOFLINE_r02/r03).  The round-1/2
continuity shape (M=1024, batch 8192) is also measured and reported in
``config.shapes``.

vs_baseline: the reference publishes no perf numbers (BASELINE.md), so the
baseline is the *reference's algorithm* run on the same hardware/stack: the
reference tiles X to [S, N, D] and recomputes the full GP conditional for
every MC sample (reference MixtureGPs/models.py:35-36,56,64).  This
framework computes the conditional once and vectorizes only the sampling —
the measured ratio is the real algorithmic+implementation speedup a
reference user gets by switching.  At M=4096 the reference algorithm's
[S, K, M, N] intermediate alone is 17 GB at batch 8192 — it does NOT fit
one v5e chip — so the baseline runs at its largest feasible batch (2048)
and the ratio is computed on training points/sec (each algorithm at its
best feasible configuration).

Methodology notes (this environment): the TPU is reached through a tunnel
whose per-call dispatch jitter swamps microbenchmarks, so steps are chained
on-device with lax.scan inside a single jit, params are passed as jit
arguments (never closed over — closed-over device constants poison the
dispatch path), and per-step time is the two-length slope
(T(2R) - T(R)) / R, which cancels the relay's ~22 ms fixed dispatch cost.
"""
import json
import os
import sys
import time

import numpy as np

K = 8
S = 16
D = 4
NUM_DATA = 1_000_000
TRIALS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    # Persistent compile cache: each chained-step program costs 40-200s to
    # compile through the remote relay; cached reruns skip that.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

    log(f"devices: {jax.devices()}")
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.float32

    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.training import make_train_step
    from modulatedgps_tpu.ops import linalg
    from modulatedgps_tpu.ops import pallas_linalg

    if on_tpu:
        # inverse+matmul solves: ~20x the throughput of XLA's sequential
        # triangular_solve on the conditional's [M, N] panels
        linalg.set_fast_solves(True)
    if on_tpu and os.environ.get("MGP_BENCH_BACKEND") == "pallas":
        # The pallas chol/trsm backend is timing-neutral at these configs
        # (batched MXU matmuls dominate); opt in via MGP_BENCH_BACKEND=pallas.
        pallas_linalg.register()
        linalg.set_backend("pallas")

    if on_tpu:
        # Product TPU default (training/loop.py run_adam): optax-equivalent
        # arithmetic with the fused tril Pallas update for the q_sqrt
        # leaves (ADAM_FUSED_AB_r04.json, 1.02x in-chain at M=4096).
        from modulatedgps_tpu.training import fused_adam
        optimizer = fused_adam(5e-3)
    else:
        optimizer = optax.adam(5e-3)

    def build(M, batch):
        rng = np.random.default_rng(0)
        Z = rng.normal(size=(M, D))
        lik = Gaussian.create(variance=0.5, D=K, dtype=dtype)
        pred = SVGP.create(SquaredExponential.create(0.5, 0.5, dtype=dtype),
                           Z, num_latent_gps=K, dtype=dtype)
        assign = SVGP.create(SquaredExponential.create(0.1, 1.0, dtype=dtype),
                             rng.normal(size=(M, D)), num_latent_gps=K,
                             dtype=dtype)
        model = SMGP(likelihood=lik, pred_layer=pred, assign_layer=assign,
                     K=K, num_samples=S, num_data=NUM_DATA)
        X = jnp.asarray(rng.uniform(-3, 3, size=(batch, D)), dtype)
        Y = jnp.asarray(rng.normal(size=(batch, 1)), dtype)
        return model, X, Y

    def make_chained(step, length):
        def chained(state, X, Y):
            def body(s, _):
                s2, loss = step(s, X, Y)
                return s2, loss
            state, losses = jax.lax.scan(body, state, None, length=length)
            return state, losses[-1]
        # Donate the train state: at M=4096 the params+Adam moments are
        # ~3.2 GB — holding both input and output copies tips the chip OOM.
        return jax.jit(chained, donate_argnums=(0,))

    def time_it(step, reps, state, X, Y):
        """Slope timing over two chain lengths (cancels fixed dispatch).

        The chained fn donates its state argument, so each call consumes the
        previous state and the returned one is threaded into the next call
        (i.e. training genuinely progresses across timing trials — timing is
        value-independent, shapes/program identical)."""
        totals = []
        for length in (reps, 2 * reps):
            fn = make_chained(step, length)
            # block_until_ready is unreliable through the axon relay — pull
            # the scalar loss to the host to force real completion.
            state, loss = fn(state, X, Y)
            val = float(loss)
            assert np.isfinite(val), f"non-finite loss {val}"
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                state, loss = fn(state, X, Y)
                float(loss)
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
        slope = totals[1] - totals[0]
        if slope <= 0:
            # Relay noise can make T(2R) <= T(R); that is an INVALID
            # measurement, not an infinitely fast step (advisor r2 low).
            raise RuntimeError(
                f"slope timing invalid: T(R)={totals[0]:.4f}s "
                f"T(2R)={totals[1]:.4f}s — rerun with more reps/trials")
        return slope / reps

    # ---- reference-style baseline: tile X to [S, N, D], conditional per
    # sample (the reference's integrate(), MixtureGPs/models.py:35-36). ----
    from modulatedgps_tpu.ops.sampling import reparameterize
    import math

    def ref_style_loss(model, key, X, Y):
        Xt = jnp.broadcast_to(X[None], (S,) + X.shape)      # [S, N, D]
        k1, k2 = jax.random.split(key)
        amu, avar = model.assign_layer.predict_f(Xt)         # S conditionals
        z = jax.random.normal(k1, amu.shape, dtype=amu.dtype)
        logits = reparameterize(amu, avar, z)
        g = jax.random.gumbel(k2, logits.shape, dtype=logits.dtype)
        W = jax.nn.softmax((logits + g) / model.temperature, axis=-1)
        fmu, fvar = model.pred_layer.predict_f(Xt)           # S conditionals
        ve = model.likelihood.variational_expectations(fmu, fvar, Y)
        summed = jnp.sum(ve * W, axis=2)
        e = jax.nn.logsumexp(summed, axis=0) - math.log(S)
        kl = model.pred_layer.prior_kl() + model.assign_layer.prior_kl()
        return -(jnp.mean(e) - kl / model.num_data)

    def measure(M, batch, reps, *, ref_style=False):
        model, X, Y = build(M, batch)
        if ref_style:
            init_fn, step_fn = make_train_step(optimizer,
                                               loss_fn=ref_style_loss)
        else:
            init_fn, step_fn = make_train_step(optimizer)
        state0 = init_fn(model, jax.random.PRNGKey(0))
        tag = "reference-style" if ref_style else "ours"
        log(f"compiling {tag} M={M} batch={batch} ...")
        t = time_it(step_fn, reps, state0, X, Y)
        log(f"{tag} M={M} batch={batch}: {t * 1e3:.2f} ms/step, "
            f"{1.0 / t:.2f} steps/s, {batch / t / 1e6:.3f}M pts/s")
        return t

    shapes = {}

    # -- continuity shape (round-1/2 headline): M=1024, batch 8192 ----------
    t_ours_1k = measure(1024, 8192, 25)
    t_ref_1k = measure(1024, 8192, 25, ref_style=True)
    shapes["m1024_b8192"] = {
        "ours_steps_per_sec": round(1.0 / t_ours_1k, 3),
        "ours_ms_per_step": round(t_ours_1k * 1e3, 3),
        "ref_style_steps_per_sec": round(1.0 / t_ref_1k, 3),
        "vs_baseline": round(t_ref_1k / t_ours_1k, 3),
    }

    # -- north-star shape (BASELINE.md scaled synthetic): M=4096 ------------
    t_ours_4k = measure(4096, 8192, 8)
    # Reference-style at M=4096: [S, K, M, N] at batch 8192 is 17 GB — does
    # not fit the chip.  Its largest feasible batch here is 2048 (same
    # footprint as the M=1024/batch-8192 case); compare on points/sec.
    REF_BATCH_4K = 2048
    t_ref_4k = measure(4096, REF_BATCH_4K, 4, ref_style=True)
    ours_pps = 8192 / t_ours_4k
    ref_pps = REF_BATCH_4K / t_ref_4k
    vs_baseline_4k = ours_pps / ref_pps
    shapes["m4096_b8192"] = {
        "ours_steps_per_sec": round(1.0 / t_ours_4k, 3),
        "ours_ms_per_step": round(t_ours_4k * 1e3, 3),
        "ours_points_per_sec": round(ours_pps, 0),
        "ref_style_batch": REF_BATCH_4K,
        "ref_style_steps_per_sec": round(1.0 / t_ref_4k, 3),
        "ref_style_points_per_sec": round(ref_pps, 0),
        "ref_style_note": "reference algorithm OOMs at batch 8192 "
                          "([S,K,M,N] = 17 GB); measured at its largest "
                          "feasible batch, ratio on points/sec",
        "vs_baseline": round(vs_baseline_4k, 3),
    }
    log(f"speedup vs reference algorithm: {vs_baseline_4k:.2f}x (M=4096, "
        f"points/s), {t_ref_1k / t_ours_1k:.2f}x (M=1024, same shape)")

    print(json.dumps({
        "metric": "smgp_elbo_train_step",
        "value": round(1.0 / t_ours_4k, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline_4k, 3),
        "config": {"batch": 8192, "M": 4096, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend(),
                   "points_per_sec": round(ours_pps, 0),
                   "shapes": shapes},
    }))


if __name__ == "__main__":
    main()
