"""Static cost profile of the SMGP train step: XLA cost analysis + HLO dump.

SURVEY.md §5.1: the reference has no profiling at all; this tool is the
compile-time half of the TPU observability story (the runtime half is
utils/profiling.trace).  It lowers the jitted train step once, prints
XLA's cost analysis (FLOPs, bytes accessed, arithmetic intensity, ideal
times against the chip peaks) and optionally writes the optimized HLO text
for kernel-level inspection.

Usage:
    python benchmarks/profile_step.py --platform cpu            # quick
    python benchmarks/profile_step.py --platform tpu --hlo /tmp/step.hlo
Emits one JSON line on stdout; diagnostics on stderr.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--M", type=int, default=1024)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--S", type=int, default=16)
    p.add_argument("--D", type=int, default=4)
    p.add_argument("--hlo", default=None, help="write optimized HLO text here")
    p.add_argument("--peak-tflops", type=float, default=197.0)
    p.add_argument("--hbm-gbps", type=float, default=819.0)
    args = p.parse_args()

    if args.platform == "cpu":
        for v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS",
                  "AXON_LOOPBACK_RELAY"):
            os.environ.pop(v, None)
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.likelihoods import Gaussian
    from modulatedgps_tpu.models import SVGP, SMGP
    from modulatedgps_tpu.training import make_train_step
    from modulatedgps_tpu.ops import linalg

    if jax.default_backend() == "tpu":
        linalg.set_fast_solves(True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    lik = Gaussian.create(variance=0.5, D=args.K, dtype=dtype)
    mk = lambda v, l: SVGP.create(SquaredExponential.create(v, l, dtype=dtype),
                                  rng.normal(size=(args.M, args.D)),
                                  num_latent_gps=args.K, dtype=dtype)
    model = SMGP(likelihood=lik, pred_layer=mk(0.5, 0.5),
                 assign_layer=mk(0.1, 1.0), K=args.K, num_samples=args.S,
                 num_data=1_000_000)
    X = jnp.asarray(rng.uniform(-3, 3, size=(args.batch, args.D)), dtype)
    Y = jnp.asarray(rng.normal(size=(args.batch, 1)), dtype)

    init_fn, step_fn = make_train_step(optax.adam(5e-3))
    state = init_fn(model, jax.random.PRNGKey(0))

    log("lowering + compiling train step ...")
    lowered = jax.jit(step_fn).lower(state, X, Y)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    analysis = dict(analysis or {})
    flops = float(analysis.get("flops", -1))
    bytes_ = float(analysis.get("bytes accessed", -1))
    ai = flops / bytes_ if flops > 0 and bytes_ > 0 else None
    t_flops = flops / (args.peak_tflops * 1e12) if flops > 0 else None
    t_bytes = bytes_ / (args.hbm_gbps * 1e9) if bytes_ > 0 else None
    log(f"flops/step          : {flops:.3e}")
    log(f"bytes accessed/step : {bytes_:.3e}")
    if ai:
        log(f"arithmetic intensity: {ai:.1f} FLOP/B "
            f"({'compute' if t_flops > t_bytes else 'memory'}-bound ideal)")
        log(f"ideal time          : {max(t_flops, t_bytes) * 1e3:.3f} ms "
            f"(compute {t_flops * 1e3:.3f} / memory {t_bytes * 1e3:.3f})")

    if args.hlo:
        hlo = compiled.as_text()
        with open(args.hlo, "w") as f:
            f.write(hlo)
        log(f"optimized HLO ({len(hlo.splitlines())} lines) -> {args.hlo}")

    print(json.dumps({
        "metric": "train_step_cost_analysis",
        "flops": flops, "bytes_accessed": bytes_,
        "arithmetic_intensity": round(ai, 2) if ai else None,
        "ideal_ms": round(max(t_flops, t_bytes) * 1e3, 3) if ai else None,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
