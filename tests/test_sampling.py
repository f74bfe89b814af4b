"""Reparameterized sampling ops (ops/sampling.py) — statistical tests.

Covers reference MixtureGPs/utils.py:8-36 (reparameterize; the full-cov
branch is dead TF1 code there, live here) and the
RelaxedOneHotCategorical(temperature=1e-2) draw at reference
MixtureGPs/models.py:60.
"""
import numpy as np
import jax
import jax.numpy as jnp

from modulatedgps_tpu.ops.sampling import (
    gumbel_softmax_logits, relaxed_one_hot, reparameterize)


def test_reparameterize_diag_moments(rng):
    mean = jnp.asarray(rng.normal(size=(5, 3)))
    var = jnp.asarray(rng.uniform(0.5, 2.0, size=(5, 3)))
    S = 20000
    z = jax.random.normal(jax.random.PRNGKey(0), (S, 5, 3))
    draws = np.asarray(reparameterize(mean, var, z))
    np.testing.assert_allclose(draws.mean(0), np.asarray(mean), atol=0.05)
    np.testing.assert_allclose(draws.var(0), np.asarray(var), rtol=0.08)


def test_reparameterize_var_none_passthrough(rng):
    mean = jnp.asarray(rng.normal(size=(4, 2)))
    out = reparameterize(mean, None, jnp.ones_like(mean))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mean))


def test_reparameterize_full_cov_covariance(rng):
    """Draw covariance must match the requested full covariance."""
    N, D, S = 4, 2, 40000
    A = rng.normal(size=(D, N, N))
    cov = np.einsum("dij,dkj->dik", A, A) / N + 0.5 * np.eye(N)  # [D, N, N]
    var = jnp.asarray(np.moveaxis(cov, 0, -1))                   # [N, N, D]
    mean = jnp.zeros((N, D))
    z = jax.random.normal(jax.random.PRNGKey(1), (S, N, D))
    draws = np.asarray(reparameterize(mean[None], var[None], z,
                                      full_cov=True))            # [S, N, D]
    for d in range(D):
        emp = np.cov(draws[:, :, d].T)
        np.testing.assert_allclose(emp, cov[d], atol=0.12)


def test_relaxed_one_hot_is_simplex_and_near_discrete(rng):
    logits = jnp.asarray(rng.normal(size=(100, 4)))
    W = np.asarray(relaxed_one_hot(jax.random.PRNGKey(2), logits, 1e-2))
    np.testing.assert_allclose(W.sum(-1), 1.0, atol=1e-6)
    # temperature 1e-2 (reference models.py:60) is effectively discrete
    assert np.mean(W.max(-1) > 0.99) > 0.95


def test_relaxed_one_hot_category_frequencies(rng):
    """argmax of Gumbel-softmax draws ~ Categorical(softmax(logits))."""
    logits = jnp.asarray(np.log([0.6, 0.3, 0.1]))
    S = 20000
    W = np.asarray(relaxed_one_hot(
        jax.random.PRNGKey(3), jnp.broadcast_to(logits, (S, 3)), 1e-2))
    freq = np.bincount(W.argmax(-1), minlength=3) / S
    np.testing.assert_allclose(freq, [0.6, 0.3, 0.1], atol=0.02)


def test_gumbel_logits_deterministic_per_key(rng):
    logits = jnp.asarray(rng.normal(size=(7, 3)))
    a = gumbel_softmax_logits(jax.random.PRNGKey(4), logits, 1e-2)
    b = gumbel_softmax_logits(jax.random.PRNGKey(4), logits, 1e-2)
    c = gumbel_softmax_logits(jax.random.PRNGKey(5), logits, 1e-2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
