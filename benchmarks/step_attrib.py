"""Attribute the SMGP train step's time: forward vs backward vs optimizer.

Context: at the north-star shape (batch 8192, M=4096, K=8, S=16) the full
train step measures ~236 ms (BENCH_r03) while XLA's cost analysis puts the
whole step's compute ideal at 84 ms (bf16 peak) — ~36% of roofline, vs the
*forward* conditional chain's measured 78% (ROOFLINE_r03).  This harness
locates the slack by slope-timing four nested programs on the chip:

  fwd       loss only                                (fwd conditionals, VE,
                                                      Gumbel ELBO, KL)
  gradcond  value_and_grad of a conditional-only     (isolates the chol/
            surrogate: sum(fmu)+sum(fvar) both layers  TRSM/matmul chain's
                                                       fwd+bwd)
  grad      value_and_grad of the full loss          (adds sampling/VE/
                                                      logsumexp bwd)
  step      grad + trainable mask + Adam + update    (bench.py's step)

Differences between consecutive arms attribute the time.  Methodology is
bench.py's: steps chained on-device with lax.scan, params passed as jit
arguments (never closed over), two-length slope timing (T(2R)-T(R))/R to
cancel the relay's fixed dispatch cost.  Grad arms carry a scalar
tree-reduction of the grads in the scan (cheap: XLA fuses the reductions
into the producing kernels; full-leaf sums avoid slice-through-dot DCE).

Finer arms (--fine) isolate the two surprises the first run surfaced
(adam_and_update 45.5 ms vs a ~13 ms HBM ideal; sampling/KL extra 26.7 ms
vs MB-scale elementwise work):

  adam_pure   optimizer.update + apply_updates alone, params aliased as
              grads (loop-variant by construction, zero grad-compute cost)
  step_cond   a REAL Adam step on the conditional surrogate loss — vs
              gradcond it prices the optimizer in conditional context
  step_condkl Adam step on surrogate + prior KLs — vs step_cond it prices
              the KL fwd+bwd with exact loop variance (params evolve, so
              XLA cannot hoist the KL out of the scan the way it could in
              a fixed-params arm)

--analyze lowers each arm's SINGLE-step body and records XLA cost
analysis (flops, bytes) + ideal times against the chip peaks, giving the
per-slice ceiling argument the whole-step 84 ms number lacked.

Usage:  python benchmarks/step_attrib.py [--M 4096] [--batch 8192]
Emits one JSON line on stdout; diagnostics on stderr.
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
    p.add_argument("--fine", action="store_true",
                   help="add adam_pure / step_cond / step_condkl arms")
    p.add_argument("--bisect", action="store_true",
                   help="add grad_sink / step_cond_sgd / step_cond_nomask")
    p.add_argument("--analyze", action="store_true",
                   help="XLA cost analysis + ideal ms per arm body")
    p.add_argument("--no-time", action="store_true",
                   help="skip the timing arms (cost analysis only)")
    p.add_argument("--peak-tflops", type=float, default=197.0)
    p.add_argument("--hbm-gbps", type=float, default=819.0)
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
    from modulatedgps_tpu.ops import linalg

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
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

    def tree_scalar(t):
        leaves = [jnp.sum(x) for x in jax.tree.leaves(t)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                            jnp.floating)]
        return sum(leaves)

    def cond_surrogate(m, key, X, Y):
        # Conditional chains only (both layers), no sampling machinery.
        (fmu, fvar), (amu, avar) = m._marginals(X)
        return (jnp.sum(fmu) + jnp.sum(fvar)
                + jnp.sum(amu) + jnp.sum(avar)) / X.shape[0]

    def loss_fn(m, key, X, Y):
        return m.training_loss(key, X, Y)

    # ---- arms: each is body(carry, X, Y) -> (carry, scalar) --------------
    # Two traps both measured on-chip before settling on this form:
    #  * the per-iter value must be ACCUMULATED INTO THE CARRY (a stacked
    #    scan output lets XLA drop all but the last iteration);
    #  * X must be LOOP-VARIANT: the conditional chains depend only on
    #    (params, X), so with fixed X XLA hoists them out of the scan
    #    entirely (measured: 'fwd' reads 1.5 ms/rep = just the key-variant
    #    sampling epilogue).  Real training has evolving params; a
    #    key-derived 1e-12 relative perturbation of X replicates that
    #    liveness at zero cost.
    def vary(X, sub):
        return X * (1.0 + 1e-12 * jax.random.uniform(sub, (), dtype=X.dtype))

    def fwd_body(carry, X, Y):
        m, key, acc = carry
        key, sub, subx = jax.random.split(key, 3)
        val = loss_fn(m, sub, vary(X, subx), Y)
        return (m, key, acc + val), acc + val

    def make_grad_body(f):
        def body(carry, X, Y):
            m, key, acc = carry
            key, sub, subx = jax.random.split(key, 3)
            val, grads = jax.value_and_grad(f)(m, sub, vary(X, subx), Y)
            acc = acc + val + 1e-20 * tree_scalar(grads)
            return (m, key, acc), acc
        return body

    def kl_term(m):
        return (m.pred_layer.prior_kl()
                + m.assign_layer.prior_kl()) / m.num_data

    def condkl_fn(m, key, X, Y):
        return cond_surrogate(m, key, X, Y) + kl_term(m)

    if on_tpu:
        # Match bench.py's product step (fused tril Adam on TPU since r4b;
        # ADAM_FUSED_AB_r04.json).  STEP_ATTRIB_r04b.json was captured with
        # the optax arm — 113.9 vs the fused 113.8, within trial noise.
        from modulatedgps_tpu.training import fused_adam
        optimizer = fused_adam(5e-3)
    else:
        optimizer = optax.adam(5e-3)
    init_fn, step_fn = make_train_step(optimizer)

    def step_body(state, X, Y):
        return step_fn(state, X, Y)

    def make_loss_step_body(f):
        # A real Adam step on a reduced loss: exact loop variance (params
        # evolve), so nothing can be hoisted out of the timing scan.
        from modulatedgps_tpu.params import (apply_trainable_mask,
                                             trainable_mask)

        def body(state, X, Y):
            key, sub = jax.random.split(state.key)
            val, grads = jax.value_and_grad(f)(state.model, sub, X, Y)
            grads = apply_trainable_mask(grads, trainable_mask(state.model))
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.model)
            m = optax.apply_updates(state.model, updates)
            return state.replace(model=m, opt_state=opt_state, key=key), val
        return body

    def fwd_vp_body(carry, X, Y):
        # Forward with loop-VARIANT params (a 1e-12 relative perturbation
        # of both layers' Z): forces the params-only Kuu/chol/trinv chain
        # to run inside the scan.  fwd_vp - fwd = the slice that the
        # fixed-params arms let XLA hoist out (which real training pays
        # every step, since params change).
        m, key, acc = carry
        key, sub, subx = jax.random.split(key, 3)
        eps = 1e-12 * jax.random.uniform(subx, (), dtype=dtype)

        def bump(layer):
            return layer.replace(Z=layer.Z.replace_raw(
                layer.Z.raw * (1.0 + eps)))
        m2 = m.replace(pred_layer=bump(m.pred_layer),
                       assign_layer=bump(m.assign_layer))
        val = loss_fn(m2, sub, X, Y)
        return (m, key, acc + val), acc + val

    def grad_sink_body(carry, X, Y):
        # gradcond with the grads FORCED to materialize (carried as scan
        # state) — prices what the tree_scalar-consumed gradcond arm lets
        # XLA fuse away.
        m, key, acc, _ = carry
        key, sub, subx = jax.random.split(key, 3)
        val, grads = jax.value_and_grad(cond_surrogate)(m, sub,
                                                        vary(X, subx), Y)
        acc = acc + val + 1e-20 * jnp.sum(grads.pred_layer.q_mu.raw)
        return (m, key, acc, grads), acc

    def step_cond_sgd_body(carry, X, Y):
        # Grads consumed by a bare SGD update: no optax, no moments, no
        # trainable mask — the floor for any 'grads -> param update' arm.
        m, key, acc = carry
        key, sub, subx = jax.random.split(key, 3)
        val, grads = jax.value_and_grad(cond_surrogate)(m, sub,
                                                        vary(X, subx), Y)
        m = jax.tree.map(
            lambda p, g: p - 5e-3 * g
            if hasattr(g, "dtype") and jnp.issubdtype(g.dtype, jnp.floating)
            else p, m, grads)
        return (m, key, acc + val), acc + val

    def step_cond_nomask_body(state, X, Y):
        # make_loss_step_body minus apply_trainable_mask.
        key, sub = jax.random.split(state.key)
        val, grads = jax.value_and_grad(cond_surrogate)(state.model, sub,
                                                        X, Y)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.model)
        m = optax.apply_updates(state.model, updates)
        return state.replace(model=m, opt_state=opt_state, key=key), val

    def adam_pure_body(state, X, Y):
        # Params aliased as grads: zero grad-compute cost, loop-variant by
        # construction (the update perturbs the params each iteration).
        from modulatedgps_tpu.params import (apply_trainable_mask,
                                             trainable_mask)
        grads = apply_trainable_mask(state.model, trainable_mask(state.model))
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.model)
        m = optax.apply_updates(state.model, updates)
        val = jnp.sum(m.pred_layer.q_mu.raw)
        return state.replace(model=m, opt_state=opt_state), val

    def make_chained(body, length, donate):
        def chained(carry, X, Y):
            def sbody(c, _):
                c2, v = body(c, X, Y)
                return c2, v
            carry, vals = jax.lax.scan(sbody, carry, None, length=length)
            return carry, vals[-1]
        return jax.jit(chained, donate_argnums=(0,) if donate else ())

    def time_arm(name, body, carry0, donate):
        totals = []
        carry = carry0
        for length in (args.reps, 2 * args.reps):
            fn = make_chained(body, length, donate)
            log(f"compiling {name} len={length} ...")
            carry, v = fn(carry, X, Y)
            val = float(v)
            assert np.isfinite(val), f"{name}: non-finite {val}"
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                carry, v = fn(carry, X, Y)
                float(v)
                best = min(best, time.perf_counter() - t0)
            totals.append(best)
        slope = totals[1] - totals[0]
        if slope <= 0:
            raise RuntimeError(f"{name}: invalid slope {totals}")
        t = slope / args.reps
        log(f"{name:9s}: {t * 1e3:8.2f} ms")
        return t

    key0 = jax.random.PRNGKey(0)
    res = {}
    zero = jnp.zeros((), dtype)
    arms = {
        "fwd": (fwd_body, lambda: (model, key0, zero), False),
        "gradcond": (make_grad_body(cond_surrogate),
                     lambda: (model, key0, zero), False),
        "grad": (make_grad_body(loss_fn), lambda: (model, key0, zero), False),
    }
    if args.fine:
        arms["adam_pure"] = (adam_pure_body, lambda: init_fn(model, key0),
                             False)
        arms["step_cond"] = (make_loss_step_body(cond_surrogate),
                             lambda: init_fn(model, key0), False)
        arms["step_condkl"] = (make_loss_step_body(condkl_fn),
                               lambda: init_fn(model, key0), False)
    if args.bisect:
        zeros_g = jax.tree.map(jnp.zeros_like, model)
        arms["fwd_vp"] = (fwd_vp_body, lambda: (model, key0, zero), False)
        arms["grad_sink"] = (grad_sink_body,
                             lambda: (model, key0, zero, zeros_g), False)
        arms["step_cond_sgd"] = (step_cond_sgd_body,
                                 lambda: (model, key0, zero), False)
        arms["step_cond_nomask"] = (step_cond_nomask_body,
                                    lambda: init_fn(model, key0), False)
    # The donated arm runs LAST: donation invalidates the shared model
    # buffers every other arm's initial carry aliases.
    arms["step"] = (step_body, lambda: init_fn(model, key0), True)

    analysis = {}
    if args.analyze:
        peak_flops = args.peak_tflops * 1e12
        hbm = args.hbm_gbps * 1e9
        for name, (body, carry0, _) in arms.items():
            c = jax.jit(body).lower(carry0(), X, Y).compile().cost_analysis()
            if isinstance(c, list):
                c = c[0]
            fl, by = c.get("flops", 0.0), c.get("bytes accessed", 0.0)
            analysis[name] = {
                "gflops": round(fl / 1e9, 2),
                "gbytes": round(by / 1e9, 3),
                "ideal_ms": round(max(fl / peak_flops, by / hbm) * 1e3, 2),
            }
            log(f"analyze {name:12s}: {analysis[name]}")

    if args.no_time:
        print(json.dumps({"metric": "step_attribution_analysis",
                          "cost_analysis": analysis}))
        return

    for name, (body, carry0, donate) in arms.items():
        res[name] = time_arm(name, body, carry0(), donate=donate)

    ms = {k: round(v * 1e3, 2) for k, v in res.items()}
    derived = {
        "backward_of_conditionals": round(
            (res["gradcond"] - res["fwd"]) * 1e3, 2),
        "sampling_elbo_bwd_extra": round(
            (res["grad"] - res["gradcond"]) * 1e3, 2),
        "adam_and_update": round((res["step"] - res["grad"]) * 1e3, 2),
    }
    if args.fine:
        derived["optimizer_in_cond_context"] = round(
            (res["step_cond"] - res["gradcond"]) * 1e3, 2)
        derived["kl_fwd_bwd"] = round(
            (res["step_condkl"] - res["step_cond"]) * 1e3, 2)
        derived["sampling_ve_lse_net"] = round(
            (res["step"] - res["step_condkl"]) * 1e3, 2)
    if args.bisect:
        # fwd_vp - fwd = the params-only Kuu/chol/trinv chain that XLA
        # HOISTS out of every fixed-params arm's scan but real training
        # pays per step; it is the bulk of what the coarse
        # 'adam_and_update' difference mislabels as optimizer cost.
        derived["hoisted_params_only_chain"] = round(
            (res["fwd_vp"] - res["fwd"]) * 1e3, 2)
        derived["grads_materialization"] = round(
            (res["grad_sink"] - res["gradcond"]) * 1e3, 2)
        derived["bare_sgd_update_in_context"] = round(
            (res["step_cond_sgd"] - res["grad_sink"]) * 1e3, 2)
        derived["adam_vs_sgd_in_context"] = round(
            (res["step_cond_nomask"] - res["step_cond_sgd"]) * 1e3, 2)
    out = {
        "metric": "step_attribution",
        "config": {"batch": args.batch, "M": args.M, "K": K, "S": S, "D": D,
                   "backend": jax.default_backend(), "reps": args.reps},
        "ms": ms,
        "derived_ms": derived,
        "note": "fwd includes sampling/VE/logsumexp forward; gradcond-fwd "
                "~= conditional backward minus the (cheap) sampling fwd it "
                "drops; see module docstring",
    }
    if analysis:
        out["cost_analysis"] = analysis
        out["pct_of_ideal"] = {
            k: round(100 * analysis[k]["ideal_ms"] / ms[k], 1)
            for k in ms if k in analysis and ms[k] > 0}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
