"""Gauss-Hermite quadrature for non-conjugate likelihood expectations.

The reference reaches quadrature only through gpflow's MultiClass/RobustMax
and Bernoulli likelihoods (constructed at reference
demos/demo_tf2_modified_multiclass.py:43-44).  Nodes/weights are computed
once on the host (numpy) and closed over as constants — static shapes, no
tracing hazards.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["gauss_hermite_points", "gauss_hermite_expectation"]

DEFAULT_NUM_POINTS = 20  # gpflow RobustMax default


def gauss_hermite_points(n: int, dtype) -> tuple[jax.Array, jax.Array]:
    """Physicists' Hermite nodes x_i and weights w_i: ∫ e^{-x^2} f(x) dx ≈ Σ w_i f(x_i)."""
    x, w = np.polynomial.hermite.hermgauss(n)
    return jnp.asarray(x, dtype), jnp.asarray(w, dtype)


def gauss_hermite_expectation(fn, Fmu: jax.Array, Fvar: jax.Array,
                              num_points: int = DEFAULT_NUM_POINTS):
    """E_{f ~ N(Fmu, Fvar)}[fn(f)], elementwise over Fmu/Fvar.

    Substituting f = mu + sqrt(2 var) x gives
    (1/sqrt(pi)) * Σ_i w_i fn(mu + sqrt(2 var) x_i).
    """
    x, w = gauss_hermite_points(num_points, Fmu.dtype)
    f = Fmu[..., None] + jnp.sqrt(2.0 * Fvar[..., None]) * x
    vals = fn(f)
    return jnp.tensordot(vals, w, axes=[[-1], [0]]) / jnp.sqrt(
        jnp.asarray(np.pi, Fmu.dtype))
