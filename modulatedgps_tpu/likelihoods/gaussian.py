"""Gaussian likelihood with optionally per-latent (vector) noise variance.

Parity target: reference MixtureGPs/likelihoods.py:12-41 (GaussianModified).
``Gaussian.create(variance=0.5, D=K)`` gives a (1, K) positive-transformed
variance — one noise level per mixture expert — matching
reference demos/demo_tf2.py:41.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import default_float
from ..params import Parameter
from .base import Likelihood

__all__ = ["Gaussian"]

# Python float (weak-typed), NOT np.float64: a NumPy scalar constant would
# silently promote float32 operands to float64 under jax_enable_x64 —
# breaking compute_dtype=float32 master-weight training (training/loop.py).
_HALF_LOG_2PI = float(0.5 * np.log(2.0 * np.pi))


class Gaussian(Likelihood):
    variance: Parameter

    @classmethod
    def create(cls, variance=1.0, D: int | None = None, dtype=None) -> "Gaussian":
        dtype = dtype or default_float()
        v = jnp.asarray(variance, dtype)
        if D is not None:
            # Per-expert variance of shape (1, D): reference likelihoods.py:16-19.
            v = v * jnp.ones((1, D), dtype)
        return cls(variance=Parameter(v, transform="positive"))

    def log_prob(self, F, Y):
        var = self.variance.value
        return -_HALF_LOG_2PI - 0.5 * jnp.log(var) - 0.5 * jnp.square(Y - F) / var

    def conditional_mean(self, F):
        return F

    def conditional_variance(self, F):
        return jnp.broadcast_to(self.variance.value, F.shape)

    def variational_expectations(self, Fmu, Fvar, Y):
        """Closed form: -0.5 log 2π - 0.5 log σ² - 0.5((Y-Fmu)² + Fvar)/σ²
        (reference likelihoods.py:39-41)."""
        var = self.variance.value
        return (-_HALF_LOG_2PI - 0.5 * jnp.log(var)
                - 0.5 * (jnp.square(Y - Fmu) + Fvar) / var)

    def predict_mean_and_var(self, Fmu, Fvar):
        return Fmu, Fvar + self.variance.value

    def predict_log_density(self, Fmu, Fvar, Y):
        return jnp.sum(self.predict_density_per_expert(Fmu, Fvar, Y), axis=-1)

    def predict_density_per_expert(self, Fmu, Fvar, Y):
        """Elementwise N(Y; Fmu_k, Fvar_k + σ_k²) log-density, [..., N, K]."""
        var = Fvar + self.variance.value
        return -_HALF_LOG_2PI - 0.5 * jnp.log(var) - 0.5 * jnp.square(Y - Fmu) / var
