"""Likelihood interface.

The reference wraps gpflow scalar likelihoods in a BroadcastingLikelihood to
make them accept [S, N, D] inputs (reference MixtureGPs/broadcasting_lik.py).
Here every likelihood natively broadcasts over arbitrary leading batch dims
(vmap semantics), so the wrapper concept is deleted entirely — SURVEY.md §7.1.

Shape conventions:
  Fmu, Fvar : [..., N, K]  latent marginal means/variances
  Y         : [N, D]       observations (D=1 targets, or D=K)

``variational_expectations`` returns the per-point expected log-density in
the likelihood's natural output shape: [..., N, K] for Gaussian(D=K),
[..., N, 1] for MultiClass/Bernoulli — exactly the shapes the reference's
wrapper produces, so downstream ``* W`` + sum(K) logic is identical.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..params import Module


class Likelihood(Module):
    def log_prob(self, F, Y):
        raise NotImplementedError

    def variational_expectations(self, Fmu, Fvar, Y):
        """E_{f ~ N(Fmu, Fvar)}[log p(Y | f)]."""
        raise NotImplementedError

    def predict_mean_and_var(self, Fmu, Fvar):
        """Moments of the predictive distribution p(y*) = ∫ p(y|f) N(f; Fmu, Fvar) df."""
        raise NotImplementedError

    def predict_log_density(self, Fmu, Fvar, Y):
        raise NotImplementedError

    def predict_density_per_expert(self, Fmu, Fvar, Y):
        """log p_k(y|x) under each mixture expert k's marginals: [..., N, K].

        Used by SMGP.predict_density to form log Σ_k π_k p_k(y|x).  Default:
        likelihoods that couple all K latents into ONE density (MultiClass
        over class latents, Bernoulli) give every expert the same predictive
        density, so broadcast ``predict_log_density`` over the K axis.
        Per-latent likelihoods (Gaussian with D=K) override with the
        elementwise per-column density.
        """
        ld = self.predict_log_density(Fmu, Fvar, Y)        # [..., N]
        return jnp.broadcast_to(ld[..., None], ld.shape + (Fmu.shape[-1],))
