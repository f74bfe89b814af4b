"""Distributed blocked Cholesky / TRSM (parallel/blocked.py) on the
8-virtual-device CPU mesh (SURVEY.md §5.7 'sequence-parallel hard case')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from modulatedgps_tpu.parallel import make_mesh
from modulatedgps_tpu.parallel.blocked import (
    distributed_cholesky, distributed_solve_lower)


def _spd(rng, M):
    A = rng.normal(size=(M, M))
    return jnp.asarray(A @ A.T / M + 2.0 * np.eye(M))


@pytest.fixture
def mesh():
    return make_mesh(num_data=8, num_expert=1)


def test_cholesky_matches_dense(rng, mesh):
    for M, block in [(512, 64), (256, 32), (1024, 128)]:
        K = _spd(rng, M)
        L = distributed_cholesky(K, mesh, block=block)
        want = np.linalg.cholesky(np.asarray(K))
        np.testing.assert_allclose(np.asarray(L), want, atol=1e-9)


def test_cholesky_result_is_row_sharded(rng, mesh):
    K = _spd(rng, 512)
    L = distributed_cholesky(K, mesh, block=64)
    shards = {s.device.id: s.index for s in L.addressable_shards}
    assert len(shards) == 8
    # contiguous block-row layout
    assert all(idx[1] == slice(None) for idx in shards.values())


def test_solve_lower_matches_dense(rng, mesh):
    M, N = 512, 96
    K = _spd(rng, M)
    L = jnp.asarray(np.linalg.cholesky(np.asarray(K)))
    B = jnp.asarray(rng.normal(size=(M, N)))
    X = distributed_solve_lower(L, B, mesh, block=64)
    want = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    np.testing.assert_allclose(np.asarray(X), np.asarray(want), atol=1e-9)


def test_chol_then_solve_recovers_inverse_action(rng, mesh):
    """L from the distributed factorization feeds the distributed TRSM:
    together they apply K^-1/2 — the large-M conditional's A panel."""
    M, N = 512, 40
    K = _spd(rng, M)
    B = jnp.asarray(rng.normal(size=(M, N)))
    L = distributed_cholesky(K, mesh, block=64)
    A = distributed_solve_lower(L, B, mesh, block=64)
    # K = L L^T  =>  A^T A = B^T K^-1 B
    got = np.asarray(A.T @ A)
    want = np.asarray(B.T @ jnp.linalg.solve(K, B))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_validation_errors(rng, mesh):
    K = _spd(rng, 96)   # 96 rows over 8 devices = 12 per device
    with pytest.raises(ValueError):
        distributed_cholesky(K, mesh, block=64)   # block > rows-per-device


def test_distributed_conditional_matches_single_device(rng, mesh):
    """Large-M whitened conditional assembled from the distributed
    factorization equals ops/conditionals.base_conditional."""
    from modulatedgps_tpu.ops.conditionals import base_conditional
    from modulatedgps_tpu.ops.kernels import SquaredExponential
    from modulatedgps_tpu.config import default_jitter

    M, N, K = 512, 64, 3
    kern = SquaredExponential.create(0.8, 0.6)
    Z = jnp.asarray(rng.normal(size=(M, 2)))
    X = jnp.asarray(rng.normal(size=(N, 2)))
    q_mu = jnp.asarray(rng.normal(size=(M, K)) * 0.3)
    Kmm = kern.K(Z) + default_jitter(Z.dtype) * jnp.eye(M, dtype=Z.dtype)
    Kmn = kern.K(Z, X)
    Knn = kern(X, full_cov=False)

    # distributed: row-sharded chol + TRSM panels, then local epilogue
    L = distributed_cholesky(Kmm, mesh, block=64)
    A = distributed_solve_lower(L, Kmn, mesh, block=64)     # [M, N] sharded
    fmean = jnp.asarray(A).T @ q_mu
    fvar = Knn - jnp.sum(jnp.square(jnp.asarray(A)), axis=0)

    m_ref, v_ref = base_conditional(Kmn, Kmm, Knn, q_mu, q_sqrt=None,
                                    full_cov=False, white=True)
    np.testing.assert_allclose(np.asarray(fmean), np.asarray(m_ref),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(fvar), np.asarray(v_ref[:, 0]),
                               atol=1e-9)
