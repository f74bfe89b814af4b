"""Inducing-point (large-M) model sharding: the end-to-end training path.

SURVEY.md §2.4 / BASELINE.md north star: M=4096+ inducing points with the
M x M factorization itself sharded over the mesh — the work the reference
delegates to one tf.linalg.cholesky inside gpflow (reached from reference
MixtureGPs/models.py:141), here distributed because a single chip can't
hold/afford the O(M^3) chain at scale.

Layout over one mesh axis (default 'data', P devices):

  Z      [M, D]     -> P(axis, None)        contiguous block rows
  q_mu   [M, K]     -> P(axis, None)        block rows
  q_sqrt [K, M, M]  -> P(None, None, axis)  contiguous block COLUMNS
  X, Y   [N, ...]   -> P(axis)              batch rows
  kernel hypers / likelihood variance: replicated.

Inside one ``shard_map`` the whitened conditional runs as the local-shard
program (collectives explicit):

  Zg   = all_gather(Z)                      # [M, D], tiny
  Kuu  = rows of K(Z,Z)+jit                 # local [M/P, M]
  L    = blocked._chol_local(Kuu)           # distributed Cholesky
  Kmn  = K(Z_loc, all_gather(X))            # local [M/P, N]
  A    = blocked._solve_lower_local(L, Kmn) # distributed TRSM
  fmean= psum_scatter(A^T q_mu)             # back to batch-sharded [N/P, K]
  fvar = Kdiag - psum_scatter(colsum A^2) + psum_scatter(colsum (Lq^T A)^2)

q_sqrt's column sharding makes the q_sqrt quadratic term local after ONE
all_gather of A: device d computes the M/P columns m' it owns of
LTA[k, m', n] = sum_m Lq[k, m, m'] A[m, n] against the full A, then the
sum over m' is a psum_scatter.  The global tril mask is applied to the raw
leaf directly (Parameter's tril transform would tril the LOCAL block with
local indices — wrong under column sharding).

The whitened KL is exact with the same layout: ||q_mu||^2 is row-sharded,
||tril(q_sqrt)||^2 column-sharded, and log-diagonal entries live at local
column p == global row d*M/P + p.

Whiten=True only (the product default — every reference demo constructs
SVGP(whiten=True), reference demos/demo_tf2.py:43-46); the unwhitened
second solve (L^T) would need a distributed backward substitution.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import default_jitter
from .blocked import _chol_local, _solve_lower_local

__all__ = [
    "inducing_specs",
    "inducing_shard_state",
    "inducing_sharded_elbo",
    "inducing_sharded_predict_f",
    "make_inducing_sharded_train_step",
]


# ----------------------------------------------------------------- placement

def _spec_for(path, leaf, axis: str) -> P:
    """PartitionSpec for one leaf of a model / TrainState pytree.

    Matches by array meaning (field name + rank), so the same rule shards
    the model, the grads and the Adam moment trees (optax states mirror the
    param tree's key paths).
    """
    if not hasattr(leaf, "ndim"):
        return P()
    names = [getattr(p, "name", None) for p in path]
    if "Z" in names and leaf.ndim == 2:
        return P(axis, None)
    if "q_mu" in names and leaf.ndim == 2:
        return P(axis, None)
    if "q_sqrt" in names and leaf.ndim == 3:
        return P(None, None, axis)
    return P()


def inducing_specs(tree, axis: str = "data"):
    """Pytree of PartitionSpecs with the inducing state sharded (see module
    docstring) and everything else replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for(path, leaf, axis), tree)


def inducing_shard_state(mesh: Mesh, state, axis: str = "data"):
    """Place a model or TrainState with its inducing tensors mesh-sharded."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, _spec_for(path, leaf, axis)))
        if hasattr(leaf, "ndim") else leaf,
        state)


# ------------------------------------------------------- local-shard program

def _check_layer(layer):
    if not layer.whiten:
        raise NotImplementedError(
            "inducing-sharded conditional supports whiten=True only")
    if layer.q_sqrt.raw.ndim != 3 or layer.q_sqrt.transform != "tril":
        raise NotImplementedError(
            "inducing-sharded conditional needs a [K, M, M] tril q_sqrt")


def _conditional_local(layer, X_loc, *, axis: str, block: int):
    """Whitened SVGP conditional with M sharded; returns batch-sharded
    (fmean [N/P, K], fvar [N/P, K]) for this device's X rows."""
    Z_loc = layer.Z.value                         # [M/P, D]
    q_mu_loc = layer.q_mu.value                   # [M/P, K]
    q_sqrt_raw = layer.q_sqrt.raw                 # [K, M, M/P] column block
    dtype = Z_loc.dtype
    rpd = Z_loc.shape[0]
    M = q_sqrt_raw.shape[1]
    d = jax.lax.axis_index(axis)
    gloc = d * rpd + jnp.arange(rpd)              # global ids of local rows/cols

    Zg = jax.lax.all_gather(Z_loc, axis, tiled=True)        # [M, D]
    Xg = jax.lax.all_gather(X_loc, axis, tiled=True)        # [N, D]

    jit = jnp.asarray(default_jitter(dtype), dtype)
    Kuu_loc = layer.kernel.K(Z_loc, Zg) + jit * (
        gloc[:, None] == jnp.arange(M)[None, :]).astype(dtype)
    L_loc = _chol_local(Kuu_loc, axis=axis, block=block)    # [M/P, M]

    Kmn_loc = layer.kernel.K(Z_loc, Xg)                     # [M/P, N]
    A_loc = _solve_lower_local(L_loc, Kmn_loc, axis=axis, block=block)

    scat = partial(jax.lax.psum_scatter, axis_name=axis, tiled=True)
    Knn_loc = layer.kernel.K_diag(X_loc)                    # [N/P]
    fvar0 = Knn_loc - scat(jnp.sum(jnp.square(A_loc), axis=0),
                           scatter_dimension=0)             # [N/P]
    fmean = scat(jnp.matmul(A_loc.T, q_mu_loc,
                            preferred_element_type=dtype),
                 scatter_dimension=0)                       # [N/P, K]

    Ag = jax.lax.all_gather(A_loc, axis, tiled=True)        # [M, N]
    tril_mask = (jnp.arange(M)[:, None] >= gloc[None, :]).astype(dtype)
    Lq_loc = q_sqrt_raw * tril_mask[None]                   # [K, M, M/P]
    LTA = jnp.einsum("kmp,mn->kpn", Lq_loc, Ag,
                     preferred_element_type=dtype)          # [K, M/P, N]
    extra = scat(jnp.sum(jnp.square(LTA), axis=1),
                 scatter_dimension=1)                       # [K, N/P]
    fvar = fvar0[:, None] + extra.T                         # [N/P, K]
    return fmean, fvar


def _kl_local(layer, *, axis: str) -> jax.Array:
    """Whitened gauss_kl (ops/kl.py semantics) on the sharded layout.
    Returns the full (replicated) KL scalar."""
    q_mu_loc = layer.q_mu.value
    q_sqrt_raw = layer.q_sqrt.raw                 # [K, M, M/P]
    rpd = q_sqrt_raw.shape[-1]
    M = q_sqrt_raw.shape[1]
    Klat = q_mu_loc.shape[1]
    d = jax.lax.axis_index(axis)
    gloc = d * rpd + jnp.arange(rpd)
    dtype = q_mu_loc.dtype

    mahal = jax.lax.psum(jnp.sum(jnp.square(q_mu_loc)), axis)
    tril_mask = (jnp.arange(M)[:, None] >= gloc[None, :]).astype(dtype)
    trace = jax.lax.psum(jnp.sum(jnp.square(q_sqrt_raw * tril_mask[None])),
                         axis)
    diag_mask = (jnp.arange(M)[:, None] == gloc[None, :]).astype(dtype)
    diag = jnp.sum(q_sqrt_raw * diag_mask[None], axis=1)    # [K, M/P]
    logdet = 2.0 * jax.lax.psum(jnp.sum(jnp.log(jnp.abs(diag))), axis)
    return 0.5 * (mahal - jnp.asarray(M * Klat, dtype) - logdet + trace)


# --------------------------------------------------------------- public API

def _block_for(M: int, nshards: int, block: int | None) -> int:
    rpd = M // nshards
    if block is None:
        block = min(128, rpd)
    return block


def inducing_sharded_elbo(model, key: jax.Array, X: jax.Array, Y: jax.Array,
                          mesh: Mesh, *, axis: str = "data",
                          block: int | None = None) -> jax.Array:
    """SMGP/SMGPModified ELBO with the inducing state sharded over ``axis``.

    Algebraically identical to model.elbo on replicated state (tested to fp
    tolerance); the O(M^3) Cholesky/TRSM chain and the O(M^2 N K) q_sqrt
    quadratic run distributed.  The model pytree may be passed replicated or
    already placed with inducing_shard_state — shard_map reshards by spec.
    """
    _check_layer(model.pred_layer)
    _check_layer(model.assign_layer)
    n_total = X.shape[0]
    M = model.pred_layer.q_sqrt.raw.shape[1]
    nshards = mesh.shape[axis]
    block = _block_for(M, nshards, block)
    z, g = model.draw_noise(key, n_total, model.num_samples, X.dtype)

    def local(model, z, g, X, Y):
        fmu, fvar = _conditional_local(model.pred_layer, X,
                                       axis=axis, block=block)
        amu, avar = _conditional_local(model.assign_layer, X,
                                       axis=axis, block=block)
        e = model.E_log_p_from_marginals(fmu, fvar, amu, avar, z, g, Y)
        fit = jax.lax.psum(jnp.sum(e), axis) / n_total
        kl = (_kl_local(model.pred_layer, axis=axis)
              + _kl_local(model.assign_layer, axis=axis))
        return fit - kl / model.num_data

    return shard_map(
        local, mesh=mesh,
        in_specs=(inducing_specs(model, axis),
                  P(None, axis), P(None, axis), P(axis), P(axis)),
        out_specs=P(),
    )(model, z, g, X, Y)


def inducing_sharded_predict_f(layer, Xnew: jax.Array, mesh: Mesh, *,
                               axis: str = "data", block: int | None = None):
    """predict_f for one SVGP layer with mesh-sharded inducing state.

    Returns (fmean, fvar) [N, K] global arrays sharded over ``axis`` on N.
    """
    _check_layer(layer)
    M = layer.q_sqrt.raw.shape[1]
    block = _block_for(M, mesh.shape[axis], block)
    f = shard_map(
        partial(_conditional_local, axis=axis, block=block),
        mesh=mesh,
        in_specs=(inducing_specs(layer, axis), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    return f(layer, Xnew)


def make_inducing_sharded_train_step(optimizer, mesh: Mesh, *,
                                     axis: str = "data",
                                     block: int | None = None,
                                     donate: bool = True):
    """(init_fn, step_fn) training an SMGP whose inducing state is sharded.

    init_fn(model, key) places the TrainState (params AND Adam moments) with
    inducing_shard_state; step_fn(state, X, Y) expects X/Y sharded over
    ``axis`` and differentiates through the shard_map'd ELBO — gradients of
    sharded leaves come back sharded, so the optimizer update stays local.
    """
    from ..training.loop import make_train_step

    def loss_fn(model, key, X, Y):
        return -inducing_sharded_elbo(model, key, X, Y, mesh,
                                      axis=axis, block=block)

    base_init, base_step = make_train_step(optimizer, loss_fn=loss_fn)

    def init_fn(model, key):
        return inducing_shard_state(mesh, base_init(model, key), axis)

    step_fn = jax.jit(base_step, donate_argnums=(0,) if donate else ())
    return init_fn, step_fn
