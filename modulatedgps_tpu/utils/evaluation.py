"""Evaluation metrics for mixture-GP predictions (RMSE, NLPD, accuracy).

The reference evaluates only visually (SURVEY.md §4); these are the
standard quantitative counterparts used by the tests and demos.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mixture_rmse", "mixture_nlpd", "assignment_accuracy"]


def mixture_rmse(model, X, Y) -> float:
    """RMSE of the assignment-weighted mixture mean  Σ_k π_k μ_k."""
    pi = model.predict_assign(X)
    Fmu, _ = model.pred_layer.predict_f(X)
    mean, _ = model.likelihood.predict_mean_and_var(Fmu, jnp.zeros_like(Fmu))
    mix_mean = jnp.sum(pi * mean, axis=-1, keepdims=True)
    return float(jnp.sqrt(jnp.mean(jnp.square(mix_mean - Y))))


def mixture_nlpd(model, X, Y) -> float:
    """Mean negative log predictive density under the mixture."""
    return float(-jnp.mean(model.predict_density(X, Y)))


def assignment_accuracy(model, X, labels) -> float:
    """Fraction of points whose argmax assignment matches integer labels
    (up to permutation of components — best over K! permutations for small K)."""
    import itertools
    pi = np.asarray(model.predict_assign(X))
    pred = np.argmax(pi, axis=-1)
    labels = np.asarray(labels).reshape(-1)
    K = pi.shape[-1]
    best = 0.0
    for perm in itertools.permutations(range(K)):
        mapped = np.asarray(perm)[pred]
        best = max(best, float(np.mean(mapped == labels)))
    return best
