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

SHARDABILITY (the round-2 0.392 sim-efficiency, diagnosed round 3): XLA has
no sharding rule that keeps `lax.triangular_solve`'s RHS partitioned, so
with the f64-parity sequential solves the GSPMD step ALL-GATHERS the
[M, N_global] Kmn panel (4x f32[M, N] all-gathers in the compiled n=8 HLO)
and every device redundantly computes the full solve and the [K, M, N]
q_sqrt matmuls downstream of it — the sharded program did ~n x the work of
n single-device steps.  The production TPU config (linalg.set_fast_solves:
inverse+matmul) IS shardable: its compiled step contains exactly one
collective, the gradient all-reduce.  This harness therefore measures the
production config; the compiled-HLO collective audit is recorded in the
artifact (and pinned by tests/test_parallel.py).

Usage:
    python benchmarks/scaling.py --platform cpu --devices 8 --batch-per-device 512
Emits one JSON line per mesh size on stdout; writes SCALING_r03.json.
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def collective_audit(hlo_text: str) -> dict:
    """Count collective ops (with result shapes) in compiled HLO."""
    colls = collections.Counter()
    for line in hlo_text.splitlines():
        m = re.search(r"(all-gather|all-reduce|reduce-scatter"
                      r"|collective-permute|all-to-all)\(", line)
        if m:
            shape = re.search(r"=\s*((?:\([^)]*\))|(?:\S+))\s+" + m.group(1),
                              line)
            shp = shape.group(1)[:80] if shape else "?"
            colls[f"{m.group(1)} {shp}"] += 1
    return dict(colls)


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
    p.add_argument("--slow-solves", action="store_true",
                   help="measure the non-shardable sequential-solve config "
                        "(the round-2 regression) for comparison")
    p.add_argument("--out", default=None)
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
    from modulatedgps_tpu.ops import linalg
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.parallel import (make_mesh, shard_batch,
                                           make_parallel_train_step)

    # Production config: shardable solves (see module docstring).
    linalg.set_fast_solves(not args.slow_solves)

    devices = jax.devices()
    log(f"devices: {len(devices)} x {devices[0].platform}")
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= len(devices)]

    M, K, S, D = args.M, args.K, args.S, args.D
    rng = np.random.default_rng(0)
    # f32: the production dtype (f64 is the CPU parity regime, not the
    # deployment one; fast solves at f32 are jitter-bounded, tested).
    dtype = jnp.float32

    results = {}
    rows = []
    audits = {}
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
        if n in (1, max(sizes)):
            audits[str(n)] = collective_audit(
                step_fn.lower(state, Xs, Ys).compile().as_text())

        def time_step(fn, st):
            st, loss = fn(st, Xs, Ys)
            float(loss if loss.ndim == 0 else loss[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    st, loss = fn(st, Xs, Ys)
                float(loss if loss.ndim == 0 else loss[0])
                best = min(best, (time.perf_counter() - t0) / args.steps)
            return best

        best = time_step(step_fn, state)

        # CONTROL: the identical per-device step with NO collectives (each
        # device updates its own param copy; values diverge — timing only).
        # t_nocoll vs t(1) isolates the virtual mesh's thread-
        # oversubscription cost; t_sharded - t_nocoll is what the gradient
        # all-reduce + GSPMD actually add.
        t_nocoll = None
        if n > 1:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            from modulatedgps_tpu.training.loop import make_train_step
            _, base_step = make_train_step(optax.adam(5e-3))
            nocoll = jax.jit(shard_map(
                base_step, mesh=mesh,
                in_specs=(P(), P("data"), P("data")),
                out_specs=(P(), P()), check_vma=False))
            t_nocoll = time_step(nocoll, state)

        sps = 1.0 / best
        results[n] = sps
        eff = sps / results[1]
        sim_eff = eff * n
        row = {
            "metric": "weak_scaling", "devices": n,
            "steps_per_sec": round(sps, 3),
            "points_per_sec": round(sps * batch, 0),
            "efficiency": round(eff, 3),
            "sim_efficiency": round(sim_eff, 3),
        }
        if t_nocoll is not None:
            row["nocoll_ms_per_step"] = round(t_nocoll * 1e3, 2)
            row["collective_overhead_frac"] = round(
                (best - t_nocoll) / best, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
        log(f"n={n}: {best*1e3:.2f} ms/step, {sps:.1f} steps/s, "
            f"eff {eff:.2f} (sim {sim_eff:.2f})")

    out = args.out
    if out is None:
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING_r03.json")
    payload = {
        "harness": "benchmarks/scaling.py",
        "config": {"platform": args.platform, "batch_per_device":
                   args.batch_per_device, "M": M, "K": K, "S": S, "D": D,
                   "fast_solves": not args.slow_solves, "dtype": "float32"},
        "caveat": ("virtual CPU mesh: n devices share one host's silicon; "
                   "sim_efficiency = n * t(1)/t(n) is the meaningful number "
                   "(raw efficiency trends to 1/n by construction)"),
        "diagnosis_r3": ("round-2's 0.392 sim-efficiency came from the "
                         "non-shardable sequential triangular_solve: GSPMD "
                         "all-gathered Kmn [M, N_global] and replicated the "
                         "solve + q_sqrt matmuls on every device; the "
                         "production fast-solves config compiles to a pure "
                         "data-parallel program (one gradient all-reduce)"),
        "collectives_by_mesh_size": audits,
        "rows": rows,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
