"""Precomputed SVGP posterior — the serving path.

Parity surface: gpflow's ``SVGP.posterior(PrecomputeCacheType.TENSOR)`` as
subclassed by the reference (reference MixtureGPs/models.py:147-160).  All
X-independent linear algebra is folded into cached tensors once; each
prediction batch then costs one kernel build and K MXU matmuls — no
Cholesky, no solves:

  whitened:   fmean = Kxz @ alpha,          alpha = L^-T q_mu        [M, K]
              fvar_k = Kdiag + rowsum((Kxz @ Q_k) * Kxz)
              Q_k = L^-T (S_k S_k^T - I) L^-1                        [K, M, M]
  unwhitened: same with alpha = K_zz^-1 q_mu and
              Q_k = K_zz^-1 (S_k S_k^T - K_zz) K_zz^-1

This is the deployment-serving analog of the training-path conditional
(ops/conditionals.py), which stays Cholesky-based for stability under
changing parameters.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.conditionals import expand_independent_outputs
from ..ops.linalg import cholesky, triangular_inverse
from ..params import Module, static_field
from ..ops.kernels import Kernel

__all__ = ["PrecomputedPosterior", "precompute_posterior", "precompute_smgp"]


class PrecomputedPosterior(Module):
    kernel: Kernel
    Z: jax.Array           # [M, D]
    alpha: jax.Array       # [M, K]
    Q: jax.Array           # [K, M, M]
    mean_function: object = None

    def predict_f(self, Xnew: jax.Array, *, full_cov: bool = False,
                  full_output_cov: bool = False):
        """Marginal posterior mean/var at Xnew [..., N, D] -> ([..., N, K] x2).

        ``full_output_cov`` expands the independent-latent variance to a
        diagonal [..., N, K, K] (reference MixtureGPs/models.py:144 post-
        processing); full_cov is not served from the cache — use the
        training-path SVGP.predict_f for full input covariances.
        """
        if full_cov:
            raise NotImplementedError(
                "PrecomputedPosterior serves marginal (diag) variances; "
                "use SVGP.predict_f(full_cov=True)")
        Kxz = self.kernel.K(Xnew, self.Z)                 # [..., N, M]
        Kdiag = self.kernel.K_diag(Xnew)                  # [..., N]
        fmean = jnp.matmul(Kxz, self.alpha,
                           preferred_element_type=Kxz.dtype)
        if self.mean_function is not None:
            fmean = fmean + self.mean_function(Xnew)
        # [..., N, K]: quadratic forms k_n^T Q_k k_n via batched matmul
        KQ = jnp.einsum("kmp,...np->...nkm", self.Q, Kxz)
        quad = jnp.sum(KQ * Kxz[..., None, :], axis=-1)   # [..., N, K]
        fvar = jnp.maximum(Kdiag[..., None] + quad, 1e-12)
        return fmean, expand_independent_outputs(fvar, False, full_output_cov)


def precompute_posterior(svgp) -> PrecomputedPosterior:
    """Fold an SVGP's variational state into a PrecomputedPosterior."""
    Kmm = svgp.kuu()
    L = cholesky(Kmm)
    Linv = triangular_inverse(L)                          # [M, M]
    q_mu = svgp.q_mu.value                                # [M, K]
    q_sqrt = svgp.q_sqrt.value
    M, K = q_mu.shape
    if q_sqrt.ndim == 2:                                  # diag std-devs
        S = jax.vmap(jnp.diag, in_axes=1)(q_sqrt)         # [K, M, M]
    else:
        S = jnp.tril(q_sqrt)
    eye = jnp.eye(M, dtype=q_mu.dtype)
    if svgp.whiten:
        alpha = Linv.T @ q_mu
        SSt = jnp.matmul(S, jnp.swapaxes(S, -1, -2),
                         preferred_element_type=S.dtype)  # [K, M, M]
        inner = SSt - eye
    else:
        # Sandwich through L^-1 (never form K_zz^-1 explicitly):
        # K^-1 (S S^T - K) K^-1 = L^-T ((L^-1 S)(L^-1 S)^T - I) L^-1
        alpha = Linv.T @ (Linv @ q_mu)
        LS = jnp.matmul(Linv[None], S, preferred_element_type=S.dtype)
        inner = jnp.matmul(LS, jnp.swapaxes(LS, -1, -2),
                           preferred_element_type=S.dtype) - eye
    Q = jnp.einsum("pm,kpq,qn->kmn", Linv, inner, Linv)
    return PrecomputedPosterior(kernel=svgp.kernel, Z=svgp.Z.value,
                                alpha=alpha, Q=Q,
                                mean_function=svgp.mean_function)


def precompute_smgp(model):
    """Fold BOTH layers of an SMGP/SMGPModified into cached posteriors.

    The returned model serves the full prediction API (predict_assign,
    predict_y, predict_samples, predict_density, sample_W) with no Cholesky
    or solves per batch — SMGP's prediction methods only touch the layers
    through ``predict_f``, which PrecomputedPosterior provides.  Training
    methods (elbo / prior_kl) are invalid on the result; re-precompute after
    any parameter update.
    """
    return model.replace(pred_layer=precompute_posterior(model.pred_layer),
                         assign_layer=precompute_posterior(model.assign_layer))
