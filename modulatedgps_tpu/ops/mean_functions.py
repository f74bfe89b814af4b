"""GP prior mean functions.

Rebuilds the gpflow ``mean_functions`` surface the reference inherits
through its SVGP subclass (reference MixtureGPs/models.py:156-158 passes
``self.mean_function`` into the modified posterior; the demos never set
one, so gpflow's default Zero applies).  ``SVGP.create(...,
mean_function=...)`` / ``VGP.create(...)`` accept these; None means Zero
(and skips the add entirely).

All mean functions map X [..., N, D] -> [..., N, K] (broadcast against the
conditional's fmean).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_float
from ..params import Module, Parameter

__all__ = ["MeanFunction", "Zero", "Constant", "Linear"]


class MeanFunction(Module):
    def __call__(self, X: jax.Array) -> jax.Array:
        raise NotImplementedError


class Zero(MeanFunction):
    def __call__(self, X):
        return jnp.zeros(X.shape[:-1] + (1,), X.dtype)


class Constant(MeanFunction):
    """m(x) = c, one constant per output (gpflow.mean_functions.Constant)."""

    c: Parameter            # [K]

    @classmethod
    def create(cls, c=0.0, output_dim: int = 1, dtype=None) -> "Constant":
        dtype = dtype or default_float()
        c = jnp.broadcast_to(jnp.asarray(c, dtype), (output_dim,))
        return cls(c=Parameter(c))

    def __call__(self, X):
        c = self.c.value
        return jnp.broadcast_to(c, X.shape[:-1] + c.shape)


class Linear(MeanFunction):
    """m(x) = x A + b (gpflow.mean_functions.Linear)."""

    A: Parameter            # [D, K]
    b: Parameter            # [K]

    @classmethod
    def create(cls, A, b=0.0, dtype=None) -> "Linear":
        dtype = dtype or default_float()
        A = jnp.atleast_2d(jnp.asarray(A, dtype))
        b = jnp.broadcast_to(jnp.asarray(b, dtype), (A.shape[-1],))
        return cls(A=Parameter(A), b=Parameter(b))

    def __call__(self, X):
        return jnp.matmul(X, self.A.value,
                          preferred_element_type=X.dtype) + self.b.value
