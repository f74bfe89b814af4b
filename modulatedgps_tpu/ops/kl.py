"""KL divergence between the variational posterior q(u) and the prior.

Parity with gpflow ``kullback_leiblers.gauss_kl`` as reached from
``prior_kl()`` at reference MixtureGPs/models.py:79.  The demos all use
whiten=True, where KL[q(u) || N(0, I)] has the cheap closed form below
(no solves); the unwhitened form (prior covariance K) is also provided.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import cholesky, solve_triangular

__all__ = ["gauss_kl"]

# Tril-blocked Pallas KL kernels (ops/pallas_kl.py): None = auto (TPU,
# f32, M >= the tril family threshold), True = forced (interpret off-TPU,
# tests), False = dense closed form.  The Pallas backward writes ONLY the
# tril blocks (strictly-upper garbage, masked by the Parameter tril-VJP
# select downstream) — see the pallas_kl module contract.
_KL_TRIL_DISPATCH: bool | None = None


def set_kl_tril_dispatch(mode: bool | None) -> None:
    global _KL_TRIL_DISPATCH
    _KL_TRIL_DISPATCH = mode


def _kl_tril_route(Lq) -> bool:
    if _KL_TRIL_DISPATCH is False:
        return False
    if Lq.ndim != 3 or Lq.dtype != jnp.float32:
        return False
    from jax._src.interpreters.batching import BatchTracer
    if isinstance(Lq, BatchTracer):
        return False
    from .pallas_kl import eligible
    # forced mode (tests) only needs a valid block decomposition; auto
    # keeps the measured large-M threshold of the tril family
    min_M = 1 if _KL_TRIL_DISPATCH is True else 2048
    if not eligible(Lq.shape[-1], min_M):
        return False
    if _KL_TRIL_DISPATCH is None and jax.default_backend() != "tpu":
        return False
    return True


def _kl_white_tril_val(q_mu, Lq):
    M, K = q_mu.shape
    mahalanobis = jnp.sum(jnp.square(q_mu))
    if _kl_tril_route(Lq):
        from .pallas_kl import kl_sq_logdiag
        trace, half_logdet = kl_sq_logdiag(
            Lq, interpret=_KL_TRIL_DISPATCH is True
            and jax.default_backend() != "tpu")
        logdet_qcov = 2.0 * half_logdet
    else:
        idx = jnp.arange(M)
        d = Lq[..., idx, idx]                             # [K, M]
        logdet_qcov = 2.0 * jnp.sum(jnp.log(jnp.abs(d)))
        trace = jnp.sum(jnp.square(Lq))
    return 0.5 * (mahalanobis - jnp.asarray(M * K, q_mu.dtype)
                  - logdet_qcov + trace)


@jax.custom_vjp
def _kl_white_tril(q_mu: jax.Array, Lq: jax.Array) -> jax.Array:
    """Whitened KL for a lower-triangular q_sqrt, with a hand-written
    backward.

    Autodiff of the closed form materializes the log-det gradient as a
    dense [K, M, M] scatter-add of 1/diag plus layout copies — at M=4096
    that is several full 537 MB passes per layer per step (measured in the
    optimized train-step HLO).  The analytic cotangent is one fused
    elementwise pass:

        d/d q_mu  = g * q_mu
        d/d Lq    = g * (Lq - diag_embed(1/diag(Lq)))   (upper stays 0)
    """
    return _kl_white_tril_val(q_mu, Lq)


def _kl_white_tril_fwd(q_mu, Lq):
    return _kl_white_tril_val(q_mu, Lq), (q_mu, Lq)


def _dense_kl_bwd(q_mu, Lq, g):
    M = Lq.shape[-1]
    i = jnp.arange(M)
    eye = i[:, None] == i[None, :]
    safe = jnp.where(eye, Lq, jnp.ones_like(Lq))
    dLq = g * jnp.where(eye, Lq - 1.0 / safe, Lq)
    return g * q_mu, dLq


def _kl_white_tril_bwd(res, g):
    q_mu, Lq = res
    return _dense_kl_bwd(q_mu, Lq, g)


_kl_white_tril.defvjp(_kl_white_tril_fwd, _kl_white_tril_bwd)


@jax.custom_vjp
def _kl_white_tril_param(q_mu: jax.Array, Lq: jax.Array) -> jax.Array:
    """Same KL, for Lq that came through a Parameter "tril" transform
    (``assume_tril=True``): the routed Pallas backward writes ONLY the
    tril blocks — strictly-upper garbage is guaranteed to be masked by
    the Parameter transform's VJP select before any consumer (the
    ops/pallas_kl.py module contract).  Callers differentiating a raw
    array must use the assume_tril=False path."""
    return _kl_white_tril_val(q_mu, Lq)


def _kl_white_tril_param_bwd(res, g):
    q_mu, Lq = res
    if _kl_tril_route(Lq):
        from .pallas_kl import kl_bwd_scale
        dLq = kl_bwd_scale(Lq, g, interpret=_KL_TRIL_DISPATCH is True
                           and jax.default_backend() != "tpu")
        return g * q_mu, dLq
    return _dense_kl_bwd(q_mu, Lq, g)


_kl_white_tril_param.defvjp(_kl_white_tril_fwd, _kl_white_tril_param_bwd)


def gauss_kl(q_mu: jax.Array, q_sqrt: jax.Array,
             Kmm: jax.Array | None = None, *,
             assume_tril: bool = False) -> jax.Array:
    """KL[q(u) || p(u)] summed over the K independent latent GPs.

    q_mu: [M, K]; q_sqrt: [K, M, M] lower-tri or [M, K] diagonal std-devs.
    Kmm=None means whitened prior N(0, I) (the demos' configuration,
    reference demos/demo_tf2.py:43 whiten=True).

    ``assume_tril=True`` promises a rank-3 q_sqrt is ALREADY lower
    triangular (e.g. it came through Parameter's "tril" transform) and
    skips the defensive jnp.tril — saving a full [K, M, M] read/write in
    the forward and its select in the backward.
    """
    M, K = q_mu.shape
    dtype = q_mu.dtype
    diag = q_sqrt.ndim == 2

    if Kmm is None:
        alpha = q_mu                                  # [M, K]
        mahalanobis = jnp.sum(jnp.square(alpha))
    else:
        Lp = cholesky(Kmm)                            # [M, M]
        alpha = solve_triangular(Lp, q_mu, lower=True)
        mahalanobis = jnp.sum(jnp.square(alpha))

    if diag:
        logdet_qcov = 2.0 * jnp.sum(jnp.log(q_sqrt))
        if Kmm is None:
            trace = jnp.sum(jnp.square(q_sqrt))
        else:
            Linv = solve_triangular(Lp, jnp.eye(M, dtype=dtype), lower=True)
            # tr(K^-1 S) with S diagonal = sum_i (K^-1)_ii * s_i
            Kinv_diag = jnp.sum(jnp.square(Linv), axis=0)
            trace = jnp.sum(Kinv_diag[:, None] * jnp.square(q_sqrt))
    else:
        Lq = q_sqrt if assume_tril else jnp.tril(q_sqrt)  # [K, M, M]
        if Kmm is None:
            # Hot path (whiten=True): closed form with an analytic VJP —
            # one fused elementwise backward pass instead of autodiff's
            # dense diag scatter-add + layout copies.  assume_tril (the
            # Parameter-"tril" marker) additionally unlocks the
            # tril-blocks-only Pallas backward on the large-M TPU path.
            if assume_tril:
                return _kl_white_tril_param(q_mu, Lq)
            return _kl_white_tril(q_mu, Lq)
        Lq_diag = jnp.diagonal(Lq, axis1=-2, axis2=-1)
        logdet_qcov = 2.0 * jnp.sum(jnp.log(jnp.abs(Lq_diag)))
        LpiLq = solve_triangular(Lp, Lq, lower=True)      # [K, M, M]
        trace = jnp.sum(jnp.square(LpiLq))

    constant = -jnp.asarray(M * K, dtype)
    twoKL = mahalanobis + constant - logdet_qcov + trace

    if Kmm is not None:
        log_det_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lp)))
        twoKL = twoKL + K * log_det_p

    return 0.5 * twoKL
