"""Sharded training step and an explicit-collective ELBO.

Two routes to the same math (tested for parity against each other):

1. ``make_parallel_train_step`` — the production path.  The single-device
   jitted step is reused unchanged; GSPMD propagates the input shardings
   (batch over 'data', params replicated or expert-sharded) and inserts the
   psum for the gradient all-reduce itself.  This is the idiomatic
   pjit-style scaling story (SURVEY.md §7.1 L6).

2. ``data_parallel_elbo`` — an explicit ``shard_map`` formulation with a
   hand-placed ``psum``, used to pin down the collective semantics: the
   logsumexp over S runs on the *replicated* S axis per point; only the
   final mean over N crosses shards (sum-then-psum-then-divide), so the
   sharded ELBO is algebraically identical to the single-device one
   (SURVEY.md §7.3 "logsumexp-over-S ... order matters").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..training.loop import make_train_step
from .mesh import expert_shard_state, replicate_state, shard_batch

__all__ = ["make_parallel_train_step", "data_parallel_elbo"]


def make_parallel_train_step(optimizer, mesh: Mesh, *, K: int,
                             shard_experts: bool = False,
                             shard_inducing: bool = False,
                             donate: bool = True):
    """(init_fn, step_fn) with mesh placement.

    init_fn(model, key) places the TrainState (replicated, with the K
    per-expert tensors sharded over 'expert', or — ``shard_inducing=True``,
    the large-M north star — with Z/q_mu row-sharded and q_sqrt
    column-sharded over 'data', running the distributed Cholesky/TRSM ELBO
    of parallel/inducing.py); step_fn(state, X, Y) expects X/Y sharded over
    'data' (use ``shard_batch``) and returns the state with its input
    placement preserved.
    """
    if shard_inducing:
        if shard_experts:
            raise ValueError("shard_experts and shard_inducing shard q_sqrt "
                             "on different axes — pick one")
        from .inducing import make_inducing_sharded_train_step
        return make_inducing_sharded_train_step(optimizer, mesh,
                                                donate=donate)

    base_init, base_step = make_train_step(optimizer)

    def init_fn(model, key):
        state = base_init(model, key)
        if shard_experts:
            return expert_shard_state(mesh, state, K)
        return replicate_state(mesh, state)

    step_fn = jax.jit(base_step, donate_argnums=(0,) if donate else ())
    return init_fn, step_fn


def data_parallel_elbo(model, key: jax.Array, X: jax.Array, Y: jax.Array,
                       mesh: Mesh) -> jax.Array:
    """SMGP ELBO with explicit collectives over the 'data' axis.

    Per-shard: conditionals + var-exp + S-sample logsumexp on the local
    rows (each row's posterior depends only on replicated (Z, q) state —
    the workload is row-parallel, SURVEY.md §5.7).  Cross-shard: one psum
    of the data-fit sum.  KL is computed on replicated state (identical on
    every shard).
    """
    n_total = X.shape[0]
    # Noise is drawn once for the full batch and sharded along N, so the
    # sharded ELBO equals the single-device one bit-for-bit (up to psum
    # reduction order).
    z, g = model.draw_noise(key, n_total, model.num_samples, X.dtype)

    def local(model_rep, Xs, Ys, zs, gs):
        e = model_rep.E_log_p_Y_from_noise(Xs, Ys, zs, gs)   # [N_local]
        fit = jax.lax.psum(jnp.sum(e), axis_name="data")
        return fit / n_total

    fit = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data"), P("data"),
                  P(None, "data"), P(None, "data")),
        out_specs=P(),
    )(model, X, Y, z, g)

    kl = model.pred_layer.prior_kl() + model.assign_layer.prior_kl()
    return fit - kl / model.num_data
