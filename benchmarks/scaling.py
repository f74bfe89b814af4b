"""Weak-scaling harness: ELBO training steps/s vs mesh size.

BASELINE.md target: >=80% weak-scaling efficiency at N>=2 hosts.  Real
multi-host runs use the same code via parallel.multihost; in this
environment the harness demonstrates the methodology on a virtual CPU mesh
(--platform cpu spawns --devices virtual devices) and on the single real
TPU chip.  Weak scaling: per-device batch is fixed, global batch grows with
the mesh; efficiency = steps/s(n) / steps/s(1).

CAVEAT (virtual mesh): the CPU "devices" share one physical host, so n
devices means n x the work on fixed silicon — raw efficiency trends to 1/n
by construction.  "sim_efficiency" (= n * t(1) / t(n), the throughput
ratio against perfect shared-silicon scaling) is the meaningful number
there; on real multi-chip meshes "efficiency" is the headline metric.

Usage:
    python benchmarks/scaling.py --platform cpu --devices 8 --batch-per-device 512
Emits one JSON line per mesh size on stdout.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch-per-device", type=int, default=512)
    p.add_argument("--M", type=int, default=256)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--S", type=int, default=8)
    p.add_argument("--D", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    if args.platform == "cpu":
        for v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
                  "AXON_LOOPBACK_RELAY"):
            os.environ.pop(v, None)
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    import optax
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.parallel import (make_mesh, shard_batch,
                                           make_parallel_train_step)

    devices = jax.devices()
    log(f"devices: {len(devices)} x {devices[0].platform}")
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= len(devices)]

    M, K, S, D = args.M, args.K, args.S, args.D
    rng = np.random.default_rng(0)
    dtype = jnp.float64 if args.platform == "cpu" else jnp.float32

    results = {}
    for n in sizes:
        mesh = make_mesh(num_data=n, num_expert=1, devices=devices[:n])
        batch = args.batch_per_device * n
        lik = Gaussian.create(0.5, D=K, dtype=dtype)
        pred = SVGP.create(SquaredExponential.create(0.5, 0.5, dtype=dtype),
                           rng.normal(size=(M, D)), num_latent_gps=K, dtype=dtype)
        assign = SVGP.create(SquaredExponential.create(0.1, 1.0, dtype=dtype),
                             rng.normal(size=(M, D)), num_latent_gps=K, dtype=dtype)
        model = SMGP(likelihood=lik, pred_layer=pred, assign_layer=assign,
                     K=K, num_samples=S, num_data=1_000_000)
        X = jnp.asarray(rng.uniform(-3, 3, size=(batch, D)), dtype)
        Y = jnp.asarray(rng.normal(size=(batch, 1)), dtype)
        init_fn, step_fn = make_parallel_train_step(
            optax.adam(5e-3), mesh, K=K, donate=False)
        state = init_fn(model, jax.random.PRNGKey(0))
        Xs, Ys = shard_batch(mesh, X, Y)
        state, loss = step_fn(state, Xs, Ys)
        float(loss)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, loss = step_fn(state, Xs, Ys)
            float(loss)
            best = min(best, (time.perf_counter() - t0) / args.steps)
        sps = 1.0 / best
        results[n] = sps
        eff = sps / results[1]
        sim_eff = eff * n
        print(json.dumps({
            "metric": "weak_scaling", "devices": n,
            "steps_per_sec": round(sps, 3),
            "points_per_sec": round(sps * batch, 0),
            "efficiency": round(eff, 3),
            "sim_efficiency": round(sim_eff, 3),
        }), flush=True)
        log(f"n={n}: {best*1e3:.2f} ms/step, {sps:.1f} steps/s, "
            f"eff {eff:.2f} (sim {sim_eff:.2f})")


if __name__ == "__main__":
    main()
