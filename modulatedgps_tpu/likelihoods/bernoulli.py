"""Bernoulli likelihood with probit (inv_probit) link.

Only exercised by the reference through the from_online sanity demo
(reference demos/from_online/demo_SVGP_bernoulli.py:45); included for
surface parity.  Y in {0, 1}.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quadrature import gauss_hermite_expectation
from .base import Likelihood
from ..params import static_field

__all__ = ["Bernoulli", "inv_probit"]

_JITTER = 1e-3


def inv_probit(x):
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(jnp.asarray(2.0, x.dtype)))) \
        * (1 - 2 * _JITTER) + _JITTER


class Bernoulli(Likelihood):
    num_gauss_hermite_points: int = static_field(default=20)

    def log_prob(self, F, Y):
        p = inv_probit(F)
        return jnp.log(jnp.where(Y > 0.5, p, 1.0 - p))

    def variational_expectations(self, Fmu, Fvar, Y):
        return gauss_hermite_expectation(
            lambda f: self.log_prob(f, Y[..., None]),
            Fmu, Fvar, self.num_gauss_hermite_points)

    def predict_mean_and_var(self, Fmu, Fvar):
        p = inv_probit(Fmu / jnp.sqrt(1.0 + Fvar))
        return p, p - jnp.square(p)

    def predict_log_density(self, Fmu, Fvar, Y):
        return jnp.sum(self.predict_density_per_expert(Fmu, Fvar, Y), axis=-1)

    def predict_density_per_expert(self, Fmu, Fvar, Y):
        """Per-latent Bernoulli log-density (elementwise), [..., N, K]."""
        p, _ = self.predict_mean_and_var(Fmu, Fvar)
        return jnp.log(jnp.where(Y > 0.5, p, 1.0 - p))
