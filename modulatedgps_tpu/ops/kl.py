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


def gauss_kl(q_mu: jax.Array, q_sqrt: jax.Array,
             Kmm: jax.Array | None = None) -> jax.Array:
    """KL[q(u) || p(u)] summed over the K independent latent GPs.

    q_mu: [M, K]; q_sqrt: [K, M, M] lower-tri or [M, K] diagonal std-devs.
    Kmm=None means whitened prior N(0, I) (the demos' configuration,
    reference demos/demo_tf2.py:43 whiten=True).
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
        Lq = jnp.tril(q_sqrt)                         # [K, M, M]
        Lq_diag = jnp.diagonal(Lq, axis1=-2, axis2=-1)
        logdet_qcov = 2.0 * jnp.sum(jnp.log(jnp.abs(Lq_diag)))
        if Kmm is None:
            trace = jnp.sum(jnp.square(Lq))
        else:
            LpiLq = solve_triangular(Lp, Lq, lower=True)      # [K, M, M]
            trace = jnp.sum(jnp.square(LpiLq))

    constant = -jnp.asarray(M * K, dtype)
    twoKL = mahalanobis + constant - logdet_qcov + trace

    if Kmm is not None:
        log_det_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lp)))
        twoKL = twoKL + K * log_det_p

    return 0.5 * twoKL
