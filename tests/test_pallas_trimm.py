"""Banded triangular matmuls for the Cholesky pullback (ops/pallas_trimm.py).

Interpret-mode on CPU; the oracle is the dense composition at HIGHEST
(f32 matmuls on CPU are exact-f32, so the structured path's 3-pass bf16
split is compared at its own HIGH error class).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulatedgps_tpu.ops import pallas_trimm as ptm


@pytest.fixture(scope="module")
def mats():
    rng = np.random.default_rng(0)
    M = 768   # BM=256, nb=3: multi-block banded enumeration
    A0 = rng.normal(size=(M, M)).astype(np.float32)
    K0 = A0 @ A0.T / M + 2.0 * np.eye(M, dtype=np.float32)
    L = np.linalg.cholesky(K0).astype(np.float32)
    Linv = np.linalg.inv(L).astype(np.float32)
    # a tril cotangent with nonzero upper GARBAGE in the raw buffer the
    # kernels must never read
    Lbar = np.tril(rng.normal(size=(M, M))).astype(np.float32)
    return (jnp.asarray(L), jnp.asarray(Linv), jnp.asarray(Lbar))


def test_tri_tt_matches_dense(mats):
    L, Linv, Lbar = mats
    C = ptm.tri_tt_matmul(L, Lbar, tril_out=False, interpret=True)
    C_ref = np.asarray(L).T @ np.asarray(Lbar)
    np.testing.assert_allclose(np.asarray(C), C_ref, rtol=2e-3,
                               atol=2e-3 * np.abs(C_ref).max())


def test_tri_tt_tril_out_lower_blocks_only(mats):
    L, Linv, Lbar = mats
    C = ptm.tri_tt_matmul(L, Lbar, tril_out=True, interpret=True)
    C_ref = np.asarray(L).T @ np.asarray(Lbar)
    # lower triangle (incl. diagonal blocks' full extent) must match
    il = np.tril_indices(L.shape[-1])
    np.testing.assert_allclose(np.asarray(C)[il], C_ref[il], rtol=2e-3,
                               atol=2e-3 * np.abs(C_ref).max())


def test_tri_nt_matches_dense(mats):
    L, Linv, Lbar = mats
    S = jnp.asarray(np.random.default_rng(1).normal(
        size=L.shape).astype(np.float32))
    C = ptm.tri_nt_matmul(S, Linv, interpret=True)
    C_ref = np.asarray(S) @ np.tril(np.asarray(Linv))
    np.testing.assert_allclose(np.asarray(C), C_ref, rtol=2e-3,
                               atol=2e-3 * np.abs(C_ref).max())


def test_chol_pullback_structured_matches_dense(mats):
    L, Linv, Lbar = mats
    K_struct = ptm.chol_pullback_structured(L, Linv, Lbar, interpret=True)
    K_dense = ptm.chol_pullback_dense(L, Linv, Lbar,
                                      jax.lax.Precision.HIGHEST)
    scale = float(jnp.max(jnp.abs(K_dense)))
    np.testing.assert_allclose(np.asarray(K_struct), np.asarray(K_dense),
                               atol=5e-3 * scale, rtol=5e-3)
    # symmetric by construction
    np.testing.assert_allclose(np.asarray(K_struct),
                               np.asarray(K_struct).T, rtol=0, atol=0)


def test_whiten_solve_routes_structured(mats):
    """End-to-end through linalg._whiten_solve_fused: gradients with the
    structured pullback forced (interpret) match the dense-HIGH oracle."""
    from modulatedgps_tpu.ops import linalg

    rng = np.random.default_rng(2)
    M, N = 768, 256
    A0 = rng.normal(size=(M, M)).astype(np.float32)
    Kmm = jnp.asarray(A0 @ A0.T / M + 2.0 * np.eye(M, dtype=np.float32))
    Kmn = jnp.asarray(rng.normal(size=(M, N)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(M, N)).astype(np.float32))

    def loss(Kmm, Kmn):
        A, _ = linalg._whiten_solve_fused_fwd(Kmm, Kmn)
        return jnp.sum(w * A)

    def grads():
        # drive the custom_vjp boundary itself
        f = lambda km, kn: jnp.sum(w * linalg._whiten_solve_fused(km, kn))
        return jax.grad(f, argnums=(0, 1))(Kmm, Kmn)

    try:
        # force the fused route (its forward uses the Pallas TRSM) into
        # interpret mode on CPU
        linalg.set_linalg_dispatch(True, interpret=True)
        linalg.set_fast_solves(True)
        linalg.set_chol_structured(False)
        dK_ref, dKmn_ref = grads()
        linalg.set_chol_structured(True)
        dK_s, dKmn_s = grads()
    finally:
        linalg.set_chol_structured(None)
        linalg.set_linalg_dispatch(None)
        linalg.set_fast_solves(False)
    np.testing.assert_array_equal(np.asarray(dKmn_s), np.asarray(dKmn_ref))
    scale = float(jnp.max(jnp.abs(dK_ref)))
    np.testing.assert_allclose(np.asarray(dK_s), np.asarray(dK_ref),
                               atol=5e-3 * scale, rtol=5e-3)
