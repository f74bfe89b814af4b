"""Optimizer-slice attribution at the north-star shape (VERDICT r4 #4).

STEP_ATTRIB_r04b put adam_and_update at 15.75 ms (optax arm) against a
9.6 ms pure-Adam and a 7.9 ms traffic ideal; the fused tril Adam saved
only ~2 ms in-chain.  This harness decomposes the optimizer slice into
measured arms, all scan-chained with donated state and slope-timed:

  fwd          loss forward only
  grad         value_and_grad + scalar sink (no update)
  sgd          grad + p - lr*g on every leaf        (pure-traffic floor)
  adam_optax   grad + optax.adam update/apply       (r4b attribution arm)
  adam_fused   grad + FusedAdam.update_and_apply    (the product TPU path)
  adam_qsqrt   grad + the Pallas tril Adam kernel applied DIRECTLY to the
               two q_sqrt raw leaves only (others get sgd) — isolates the
               kernel + Parameter-boundary cost from the tree plumbing

Derived: each arm minus grad = its optimizer slice; adam_fused - sgd =
what Adam arithmetic + moments cost over the irreducible update traffic.

Usage: python benchmarks/opt_attrib.py [--M 4096] [--batch 8192]
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
    from modulatedgps_tpu.ops import linalg
    from modulatedgps_tpu.params import Parameter
    import importlib
    # the package attribute 'fused_adam' is shadowed by the factory fn
    fa_mod = importlib.import_module(
        'modulatedgps_tpu.training.fused_adam')

    if jax.default_backend() == "tpu":
        linalg.set_fast_solves(True)
    dtype = jnp.float32
    M, B = args.M, args.batch
    log(f"backend={jax.default_backend()} M={M} batch={B}")

    rng = np.random.default_rng(0)
    lik = Gaussian.create(variance=0.5, D=K, dtype=dtype)
    pred = SVGP.create(SquaredExponential.create(0.5, 0.5, dtype=dtype),
                       rng.normal(size=(M, D)), num_latent_gps=K,
                       dtype=dtype)
    assign = SVGP.create(SquaredExponential.create(0.1, 1.0, dtype=dtype),
                         rng.normal(size=(M, D)), num_latent_gps=K,
                         dtype=dtype)
    model = SMGP(likelihood=lik, pred_layer=pred, assign_layer=assign,
                 K=K, num_samples=S, num_data=NUM_DATA)
    X = jnp.asarray(rng.uniform(-3, 3, size=(B, D)), dtype)
    Y = jnp.asarray(rng.normal(size=(B, 1)), dtype)
    key0 = jax.random.PRNGKey(0)
    lr = 5e-3

    fused = fa_mod.FusedAdam(lr)
    adam = optax.adam(lr)

    def loss(m, key):
        return m.training_loss(key, X, Y)

    def is_qsqrt(path):
        return any(getattr(k, "name", "") == "q_sqrt" for k in path)

    # ---- arms: (state) -> state', loss ------------------------------------
    def arm_fwd(state):
        m, key = state
        key, sub = jax.random.split(key)
        v = loss(m, sub)
        return (m, key), v

    def _grads(m, key):
        return jax.value_and_grad(loss)(m, key)

    def arm_grad(state):
        m, key = state
        key, sub = jax.random.split(key)
        v, g = _grads(m, sub)
        # consume grads via a scalar so XLA can't DCE them, but do not
        # write any parameter
        gs = sum(jnp.sum(x.ravel()[:8]) for x in jax.tree.leaves(g))
        return (m, key), v + 0.0 * gs

    def arm_sgd(state):
        m, key = state
        key, sub = jax.random.split(key)
        v, g = _grads(m, sub)
        m2 = jax.tree.map(lambda p, gg: p - lr * gg, m, g)
        return (m2, key), v

    def make_adam_arm(opt, use_fused):
        def arm(state):
            m, opt_state, key = state
            key, sub = jax.random.split(key)
            v, g = _grads(m, sub)
            if use_fused:
                m2, opt_state = opt.update_and_apply(g, opt_state, m)
            else:
                upd, opt_state = opt.update(g, opt_state, m)
                m2 = optax.apply_updates(m, upd)
            return (m2, opt_state, key), v
        return arm

    def arm_adam_qsqrt(state):
        # Pallas tril Adam on the two q_sqrt leaves only, addressed
        # directly by path (no optax tree plumbing); sgd on the rest.
        m, mu, nu, count, key = state
        key, sub = jax.random.split(key)
        v, g = _grads(m, sub)
        count2 = count + 1
        t = count2.astype(jnp.float32)
        corr = jnp.stack([1.0 / (1.0 - 0.9 ** t), 1.0 / (1.0 - 0.999 ** t)])

        flat_g = jax.tree_util.tree_flatten_with_path(g)[0]
        flat_m, treedef = jax.tree_util.tree_flatten_with_path(m)
        flat_mu = jax.tree.leaves(mu)
        flat_nu = jax.tree.leaves(nu)
        out_p, out_mu, out_nu = [], [], []
        for (path, pv), (_, gv), muv, nuv in zip(flat_m, flat_g,
                                                 flat_mu, flat_nu):
            if (is_qsqrt(path) and pv.ndim == 3
                    and fa_mod._block_m(pv.shape[-1]) > 0):
                p2, mu2, nu2 = fa_mod._pallas_adam(
                    pv, gv, muv, nuv, corr, b1=0.9, b2=0.999, eps=1e-8,
                    lr=lr)
            else:
                p2 = pv - lr * gv
                mu2, nu2 = muv, nuv
            out_p.append(p2)
            out_mu.append(mu2)
            out_nu.append(nu2)
        m2 = jax.tree_util.tree_unflatten(treedef, out_p)
        mu2 = jax.tree_util.tree_unflatten(treedef, out_mu)
        nu2 = jax.tree_util.tree_unflatten(treedef, out_nu)
        return (m2, mu2, nu2, count2, key), v

    def time_arm(tag, arm, state0):
        totals = []
        # fresh buffer copies: the donated chain consumes its inputs, and
        # arms share the same underlying model arrays otherwise
        state = jax.tree.map(
            lambda x: jnp.array(x, copy=True) if hasattr(x, "dtype") else x,
            state0)
        for length in (args.reps, 2 * args.reps):
            def run(state):
                def body(s, _):
                    s2, v = arm(s)
                    return s2, v
                s, vs = jax.lax.scan(body, state, None, length=length)
                return s, vs[-1]
            fn = jax.jit(run, donate_argnums=(0,))
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

    zeros_like_f = lambda m: jax.tree.map(jnp.zeros_like, m)
    ms = {}
    ms["fwd"] = time_arm("fwd", arm_fwd, (model, key0))
    ms["grad"] = time_arm("grad", arm_grad, (model, key0))
    ms["sgd"] = time_arm("sgd", arm_sgd, (model, key0))
    ms["adam_optax"] = time_arm(
        "adam_optax", make_adam_arm(adam, False),
        (model, adam.init(model), key0))
    ms["adam_fused"] = time_arm(
        "adam_fused", make_adam_arm(fused, True),
        (model, fused.init(model), key0))
    ms["adam_qsqrt"] = time_arm(
        "adam_qsqrt", arm_adam_qsqrt,
        (model, zeros_like_f(model), zeros_like_f(model),
         jnp.zeros((), jnp.int32), key0))

    derived = {
        "slice_sgd": round(ms["sgd"] - ms["grad"], 2),
        "slice_adam_optax": round(ms["adam_optax"] - ms["grad"], 2),
        "slice_adam_fused": round(ms["adam_fused"] - ms["grad"], 2),
        "slice_adam_qsqrt_direct": round(ms["adam_qsqrt"] - ms["grad"], 2),
        "fused_over_sgd": round(ms["adam_fused"] - ms["sgd"], 2),
        "plumbing_vs_direct": round(
            ms["adam_fused"] - ms["adam_qsqrt"], 2),
    }
    out = {
        "metric": "optimizer_attribution",
        "config": {"batch": B, "M": M, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend(), "reps": args.reps},
        "ms": {k: round(v, 2) for k, v in ms.items()},
        "derived_ms": derived,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
