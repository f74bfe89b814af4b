"""Pallas TPU kernels: fused tiled K(X,Z) construction.

The reference's hottest op is the kernel-matrix build reached from
MixtureGPs/models.py:133/135/139 (through gpflow → TF C++ kernels).  The
XLA form (ops/kernels.py) materializes the [N, M] squared-distance matrix
in HBM before the exp; this Pallas kernel keeps each [TN, TM] tile in VMEM,
computes the cross term on the MXU and applies the exp/scale epilogue in
registers — one HBM write of the result, zero intermediate traffic.

Gradients: custom_vjp whose backward is the (already-fused-enough) XLA
formula, so the Pallas path is usable inside jax.grad training steps.

All shapes are padded to tile multiples in the wrapper; masked on the way
out.  float32 accumulation via preferred_element_type.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rbf_kxz", "matern32_kxz", "pallas_available",
           "set_kxz_dispatch", "kxz_dispatch_enabled", "kxz_interpret"]

# MXU/VPU-aligned tile sizes (pallas_guide: last dim 128, fp32 sublane 8).
TILE_N = 256
TILE_M = 256
# Auto-dispatch state for the kernel-API integration (ops/kernels.py):
# None = auto (on when the default backend is TPU), True/False = forced.
# _INTERPRET routes the kernels through the Pallas interpreter (CPU tests).
_DISPATCH: bool | None = None
_INTERPRET = False
# Below this many output elements XLA wins (kernel launch + padding
# overhead); at/above it the fused tile pipeline pays off.
MIN_DISPATCH_ELEMS = 512 * 512


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def set_kxz_dispatch(mode: bool | None, *, interpret: bool = False) -> None:
    """Force the kernel-API K(X,Z) dispatch on/off (None = auto: TPU only)."""
    global _DISPATCH, _INTERPRET
    _DISPATCH = mode
    _INTERPRET = interpret


def kxz_dispatch_enabled() -> bool:
    if _DISPATCH is not None:
        return _DISPATCH
    return pallas_available()


def kxz_interpret() -> bool:
    return _INTERPRET


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad2(a, n, d):
    return jnp.pad(a, ((0, n - a.shape[0]), (0, d - a.shape[1])))


def _dist_kernel_body(x_ref, z_ref, out_ref, *, epilogue):
    """One [TN, TM] tile: d2 = |x|^2 + |z|^2 - 2 x.z, then epilogue(d2)."""
    x = x_ref[:]                                   # [TN, D]
    z = z_ref[:]                                   # [TM, D]
    xs = jnp.sum(jnp.square(x), axis=-1, keepdims=True)        # [TN, 1]
    zs = jnp.sum(jnp.square(z), axis=-1, keepdims=True)        # [TM, 1]
    cross = jax.lax.dot_general(
        x, z, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)       # [TN, TM]
    d2 = jnp.maximum(xs + zs.T - 2.0 * cross, 0.0)
    out_ref[:] = epilogue(d2)


def _rbf_epilogue(d2):
    return jnp.exp(-0.5 * d2)


def _matern32_epilogue(d2):
    r = jnp.sqrt(d2 + 1e-36)
    s3 = jnp.sqrt(jnp.float32(3.0))
    return (1.0 + s3 * r) * jnp.exp(-s3 * r)


def _kxz_pallas(Xs, Zs, *, epilogue, interpret=False):
    """Unit-variance kernel matrix of pre-scaled inputs, padded shapes.

    2-D tile grid with the M (Z) dimension innermost: the X tile's index map
    is constant in j, so it stays VMEM-resident across the inner sweep and
    HBM traffic is one read of X, N/TILE_N reads of Z and one write of K —
    no operand needs to fit VMEM whole (large-N x large-M safe).
    """
    N, D = Xs.shape
    M, _ = Zs.shape
    grid = (N // TILE_N, M // TILE_M)
    kernel = functools.partial(_dist_kernel_body, epilogue=epilogue)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * M * D + 6 * N * M,
            bytes_accessed=4 * (N * D + (N // TILE_N) * M * D + N * M),
            transcendentals=N * M),
        interpret=interpret,
    )(Xs, Zs)


def _kxz_impl(X, Z, variance, lengthscales, *, epilogue, interpret):
    N, D = X.shape
    M = Z.shape[0]
    dtype = X.dtype
    Xs = (X / lengthscales).astype(jnp.float32)
    Zs = (Z / lengthscales).astype(jnp.float32)
    Np, Mp = _round_up(N, TILE_N), _round_up(M, TILE_M)
    # Lane dim of the *input* blocks is D; pad it to the fp32 lane tile.
    # (A transposed small-D variant computing per-dim differences on the
    # VPU was measured SLOWER on v5e — the [lane]->[sublane] broadcast
    # relayouts per dim cost more than the padded-contraction HIGHEST MXU
    # pass they avoid.  Negative result; keep the MXU body.)
    Dp = _round_up(D, 128)
    Xs = _pad2(Xs, Np, Dp)
    Zs = _pad2(Zs, Mp, Dp)
    K = _kxz_pallas(Xs, Zs, epilogue=epilogue, interpret=interpret)
    return (variance.astype(jnp.float32) * K[:N, :M]).astype(dtype)


def _make_kxz(epilogue, xla_ref):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
    def kxz(X, Z, variance, lengthscales, interpret=False):
        return _kxz_impl(X, Z, variance, lengthscales,
                         epilogue=epilogue, interpret=interpret)

    def fwd(X, Z, variance, lengthscales, interpret):
        out = kxz(X, Z, variance, lengthscales, interpret)
        return out, (X, Z, variance, lengthscales)

    def bwd(interpret, res, g):
        X, Z, variance, lengthscales = res
        _, vjp = jax.vjp(xla_ref, X, Z, variance, lengthscales)
        return vjp(g)

    kxz.defvjp(fwd, bwd)
    return kxz


def _cross_hi(Xs, Zs):
    # The VJP recompute path must match ops/kernels.py: the cross term feeds
    # Cholesky-adjacent gradients, so bf16 TPU matmul default is not enough
    # (measured dX/dZ rel-err ~1.2e-2 vs 5e-4 tol without this).
    return jnp.matmul(Xs, Zs.T, precision=jax.lax.Precision.HIGHEST)


def _rbf_xla(X, Z, variance, lengthscales):
    Xs, Zs = X / lengthscales, Z / lengthscales
    d2 = (jnp.sum(Xs ** 2, -1)[:, None] + jnp.sum(Zs ** 2, -1)[None, :]
          - 2.0 * _cross_hi(Xs, Zs))
    return variance * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def _matern32_xla(X, Z, variance, lengthscales):
    Xs, Zs = X / lengthscales, Z / lengthscales
    d2 = (jnp.sum(Xs ** 2, -1)[:, None] + jnp.sum(Zs ** 2, -1)[None, :]
          - 2.0 * _cross_hi(Xs, Zs))
    r = jnp.sqrt(jnp.maximum(d2, 0.0) + 1e-36)
    s3 = jnp.sqrt(jnp.asarray(3.0, X.dtype))
    return variance * (1.0 + s3 * r) * jnp.exp(-s3 * r)


rbf_kxz = _make_kxz(_rbf_epilogue, _rbf_xla)
matern32_kxz = _make_kxz(_matern32_epilogue, _matern32_xla)
