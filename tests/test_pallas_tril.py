"""Tril-blocked quadratic kernels (ops/pallas_tril.py) vs the XLA dense op.

Interpret-mode on CPU (compiled-mode on-chip evidence lives in
benchmarks/pallas_tpu_parity.py); f32, tolerances at the bf16-MXU scale
both paths share.  M=1024/BM=256 exercises multi-block tril enumeration;
N=1000 exercises the internal TN padding.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from modulatedgps_tpu.ops import pallas_tril as ptl


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    K, M, N = 3, 1024, 1000
    # Full dense L with NON-ZERO upper garbage: the kernels must read only
    # the lower triangle.
    L = jnp.asarray(rng.normal(size=(K, M, M)), jnp.float32)
    A = jnp.asarray(rng.normal(size=(M, N)) / np.sqrt(M), jnp.float32)
    return A, L


def _interp(fn):
    # Route every pallas_call in the module through interpret mode.
    import contextlib
    import unittest.mock as mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        with mock.patch.object(ptl.pl, "pallas_call", patched):
            return fn(*a, **kw)
    return wrapper


def test_eligible_shapes():
    assert ptl.eligible(2048) and ptl.eligible(4096)
    assert not ptl.eligible(25) and not ptl.eligible(2048 + 128)
    assert ptl._block_m(1024) == 512 and ptl._block_m(4096) == 512
    assert ptl._block_m(768) == 256 and ptl._block_m(100) == 0


def test_fwd_matches_dense(data):
    A, L = data
    run = _interp(lambda: ptl.atl_matmul(A, L))
    B = np.asarray(run())
    B_ref = np.asarray(ptl.atl_matmul_xla(A, L))
    # Both paths accumulate bf16 products in f32; block order differs.
    np.testing.assert_allclose(B, B_ref, atol=5e-2, rtol=1e-2)


def test_grads_match_dense(data):
    A, L = data

    def loss_p(A, L):
        B = ptl.atl_matmul(A, L)
        return jnp.sum(jnp.square(B) * jnp.cos(0.1 * B))

    def loss_x(A, L):
        B = ptl.atl_matmul_xla(A, L)
        return jnp.sum(jnp.square(B) * jnp.cos(0.1 * B))

    run = _interp(lambda: jax.grad(loss_p, argnums=(0, 1))(A, L))
    dA, dL = run()
    dA_ref, dL_ref = jax.grad(loss_x, argnums=(0, 1))(A, L)
    scale = float(jnp.max(jnp.abs(dA_ref)))
    np.testing.assert_allclose(np.asarray(dA), np.asarray(dA_ref),
                               atol=3e-2 * scale, rtol=2e-2)
    scale = float(jnp.max(jnp.abs(dL_ref)))
    np.testing.assert_allclose(np.asarray(dL), np.asarray(dL_ref),
                               atol=3e-2 * scale, rtol=2e-2)
    # Upper triangle of dL is exactly zero (masked, not garbage).
    iu = np.triu_indices(L.shape[-1], k=1)
    assert np.all(np.asarray(dL)[:, iu[0], iu[1]] == 0.0)


def test_route_refuses_vmap(data):
    """Under vmap the conditional must fall back to the dense form (the
    tril pallas grid cannot be batched); reference-style losses vmap the
    conditional over S — this pins the regression bench.py hit."""
    A, L = data
    ptl.set_tril_dispatch(True)
    try:
        def f(a):
            if ptl.route(a, L):
                raise AssertionError("route() fired under vmap")
            return jnp.sum(a)
        jax.vmap(f)(jnp.stack([A, A]))
        # un-batched still routes when forced (at an eligible M)
        A2 = jnp.zeros((2048, 8), jnp.float32)
        L2 = jnp.zeros((2, 2048, 2048), jnp.float32)
        assert ptl.route(A2, L2)
    finally:
        ptl.set_tril_dispatch(None)


def test_sq_colsum_matches_dense(data):
    """atl_sq_colsum (bf16-B fused variant): value parity vs the dense
    square-colsum at bf16 tolerance."""
    A, L = data
    run = _interp(lambda: ptl.atl_sq_colsum(A, L))
    extra = np.asarray(run())
    extra_ref = np.asarray(ptl.atl_sq_colsum_xla(A, L))
    np.testing.assert_allclose(extra, extra_ref, rtol=2e-2,
                               atol=1e-2 * extra_ref.max())


def test_sq_colsum_grads_match_dense(data):
    """atl_sq_colsum gradients (in-kernel 2*gbar*B16 scaling, no HBM W)
    vs autodiff of the dense composition, through a nonuniform cotangent."""
    A, L = data
    w = jnp.asarray(np.random.default_rng(1).normal(
        size=(L.shape[0], A.shape[1])), jnp.float32)

    def loss_p(A, L):
        return jnp.sum(w * ptl.atl_sq_colsum(A, L))

    def loss_x(A, L):
        return jnp.sum(w * ptl.atl_sq_colsum_xla(A, L))

    run = _interp(lambda: jax.grad(loss_p, argnums=(0, 1))(A, L))
    dA, dL = run()
    dA_ref, dL_ref = jax.grad(loss_x, argnums=(0, 1))(A, L)
    scale = float(jnp.max(jnp.abs(dA_ref)))
    np.testing.assert_allclose(np.asarray(dA), np.asarray(dA_ref),
                               atol=3e-2 * scale, rtol=3e-2)
    scale = float(jnp.max(jnp.abs(dL_ref)))
    np.testing.assert_allclose(np.asarray(dL), np.asarray(dL_ref),
                               atol=3e-2 * scale, rtol=3e-2)
    iu = np.triu_indices(L.shape[-1], k=1)
    assert np.all(np.asarray(dL)[:, iu[0], iu[1]] == 0.0)


def test_conditional_routes_and_matches(data):
    """The conditional's B term through the routed op equals the dense
    conditional at f32/bf16 tolerance (route decision is caller-side; here
    we call both forms directly on conditional-shaped operands)."""
    A, L = data
    Ltril = jnp.tril(L)
    run = _interp(lambda: ptl.atl_matmul(A, Ltril))
    extra_p = np.asarray(jnp.sum(jnp.square(run()), axis=-1))
    extra_x = np.asarray(jnp.sum(jnp.square(ptl.atl_matmul_xla(A, L)),
                                 axis=-1))
    np.testing.assert_allclose(extra_p, extra_x, rtol=2e-2,
                               atol=1e-2 * extra_x.max())


def test_asymmetric_tile_overrides(data):
    """Per-kernel BM overrides (set_tril_tiles) keep value+grad parity —
    the r5 tile-sweep machinery: dl/da can take a larger BM than fwd."""
    A, L = data
    w = jnp.asarray(np.random.default_rng(2).normal(
        size=(L.shape[0], A.shape[1])), jnp.float32)

    def loss_p(A, L):
        return jnp.sum(w * ptl.atl_sq_colsum(A, L))

    def loss_x(A, L):
        return jnp.sum(w * ptl.atl_sq_colsum_xla(A, L))

    ref = jax.grad(loss_x, argnums=(0, 1))(A, L)
    try:
        ptl.set_tril_tiles(fwd=256, dl=512, da=256)
        run = _interp(lambda: jax.grad(loss_p, argnums=(0, 1))(A, L))
        dA, dL = run()
        # also the plain atl_matmul path under the same overrides
        run2 = _interp(lambda: ptl.atl_matmul(A, L))
        B = np.asarray(run2())
    finally:
        ptl.set_tril_tiles()
    B_ref = np.asarray(ptl.atl_matmul_xla(A, L))
    np.testing.assert_allclose(B, B_ref, atol=5e-2, rtol=1e-2)
    for g, gr in zip((dA, dL), ref):
        scale = float(jnp.max(jnp.abs(gr)))
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   atol=3e-2 * scale, rtol=3e-2)
    # non-dividing override falls back to auto
    assert ptl._bm_for(1024, 768) == 512
    assert ptl._bm_for(4096, 1024) == 1024
