"""In-chain tile sweep for the tril backward kernels (VERDICT r4 #1/#8).

The dl/dA kernels hold 51-54% of their slice ideal (STEP_ATTRIB_r04b);
their HBM read traffic scales as K*N*M*(nb+1) with nb = M/BM, so BM=1024
(nb=4 at M=4096) halves re-reads for +11% MXU FLOPs.  This sweeps
per-kernel BM combinations through bench.py's exact train step
(scan-chained, two-point slope timing) and checks loss parity per combo.

Usage: python benchmarks/tril_tile_sweep.py [--M 4096] [--batch 8192]
           [--combos fwd,dl,da;fwd,dl,da;...]   (0 = auto)
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
    p.add_argument("--min-dim", type=int, default=None)
    p.add_argument("--combos",
               default="0,0,0,0,0;0,1024,0,512,0;0,0,1024,0,512;0,1024,1024,512,512",
               help="fwd,dl,da[,tn_dl,tn_da] per combo; 0 = auto")
    p.add_argument("--scoped-vmem-kib", type=int, default=None,
                   help="forward --xla_tpu_scoped_vmem_limit_kib as a "
                        "per-compile option (BM=1024 kernels need ~17-20MB "
                        "scoped; v5e has 128MB VMEM)")
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
    from modulatedgps_tpu.ops import linalg, pallas_tril

    if jax.default_backend() == "tpu":
        linalg.set_fast_solves(True)
    if args.min_dim is not None:
        pallas_tril._TRIL_MIN_DIM = args.min_dim
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

    def _set(combo):
        combo = tuple(combo) + (0,) * (5 - len(combo))
        pallas_tril.set_tril_tiles(fwd=combo[0] or None, dl=combo[1] or None,
                                   da=combo[2] or None,
                                   tn_dl=combo[3] or None,
                                   tn_da=combo[4] or None)

    copts = ({"xla_tpu_scoped_vmem_limit_kib": str(args.scoped_vmem_kib)}
             if args.scoped_vmem_kib else None)

    def _compile(fn, *sample):
        if copts is None:
            return jax.jit(fn)
        return jax.jit(fn).lower(*sample).compile(compiler_options=copts)

    def loss_at(combo):
        _set(combo)
        # tunables are trace-time: fresh jit per combo
        v = _compile(lambda m: m.training_loss(key0, X, Y), model)(model)
        return float(v)

    def time_step(tag, combo):
        _set(combo)
        totals = []
        state = init_fn(model, key0)
        for length in (args.reps, 2 * args.reps):
            def body(state, _):
                state, lv = step_fn(state, X, Y)
                return state, lv

            def run(state):
                state, lvs = jax.lax.scan(body, state, None, length=length)
                return state, lvs[-1]

            log(f"compiling {tag} len={length} ...")
            fn = _compile(run, state)
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
        return slope

    combos = [tuple(int(x) for x in c.split(","))
              for c in args.combos.split(";")]
    base_loss = loss_at(combos[0])
    results = {}
    for combo in combos:
        tag = "/".join(str(x) if x else "auto" for x in combo)
        lv = loss_at(combo)
        rel = abs(lv - base_loss) / abs(base_loss)
        ms = time_step(tag, combo)
        results[tag] = {"ms": round(ms * 1e3, 2), "loss": lv,
                        "rel_loss_vs_base": float(rel)}
    pallas_tril.set_tril_tiles()

    best = min(results, key=lambda k: results[k]["ms"])
    out = {
        "metric": "tril_tile_sweep_inchain",
        "config": {"batch": args.batch, "M": args.M, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend(), "reps": args.reps,
                   "min_dim": args.min_dim},
        "results": results,
        "best": best,
        "speedup_vs_first": round(
            results[list(results)[0]]["ms"] / results[best]["ms"], 3),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
