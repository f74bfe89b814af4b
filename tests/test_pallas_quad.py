"""Fused q_sqrt variance-term kernel (ops/pallas_quad.py), interpret mode."""
import numpy as np
import jax
import jax.numpy as jnp

from modulatedgps_tpu.ops.pallas_quad import qsqrt_sq_colsum, qsqrt_sq_colsum_xla


def _mk(rng, K, M, N):
    S = jnp.asarray(rng.normal(size=(K, M, M)), jnp.float32)
    A = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    return S, A


def test_matches_xla_aligned(rng):
    S, A = _mk(rng, 2, 512, 512)
    got = qsqrt_sq_colsum(S, A, True)
    want = qsqrt_sq_colsum_xla(S, A)
    # kernel contracts in bf16 (same as the XLA dense path's effective
    # TPU precision); compare loosely
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_matches_xla_ragged(rng):
    S, A = _mk(rng, 3, 300, 130)   # forces padding on both M and N
    got = qsqrt_sq_colsum(S, A, True)
    want = qsqrt_sq_colsum_xla(S, A)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_ignores_upper_triangle(rng):
    S, A = _mk(rng, 1, 512, 64)
    S_dirty = S + jnp.triu(
        jnp.asarray(rng.normal(size=S.shape), jnp.float32) * 100.0, k=1)
    np.testing.assert_allclose(np.asarray(qsqrt_sq_colsum(S_dirty, A, True)),
                               np.asarray(qsqrt_sq_colsum(S, A, True)),
                               rtol=1e-6)


def test_gradients_match_xla(rng):
    S, A = _mk(rng, 2, 512, 64)
    f1 = lambda S, A: jnp.sum(jnp.log1p(qsqrt_sq_colsum(S, A, True)))
    f2 = lambda S, A: jnp.sum(jnp.log1p(qsqrt_sq_colsum_xla(S, A)))
    g1S, g1A = jax.grad(f1, argnums=(0, 1))(S, A)
    g2S, g2A = jax.grad(f2, argnums=(0, 1))(S, A)
    np.testing.assert_allclose(np.asarray(jnp.tril(g1S)),
                               np.asarray(jnp.tril(g2S)), rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(g1A), np.asarray(g2A),
                               rtol=5e-2, atol=5e-2)
