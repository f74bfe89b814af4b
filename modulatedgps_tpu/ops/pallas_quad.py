"""Pallas TPU kernel for the conditional's q_sqrt variance term.

Computes  extra[k, n] = sum_p ( sum_m tril(S)[k, m, p] * A[m, n] )^2
(= column sums of squares of S_k^T A) — the single most FLOP-heavy op in
the framework, reached from the SVGP conditional (the reference hits the
same math inside gpflow ``base_conditional``, from
MixtureGPs/models.py:141-143).

Why a custom kernel: the XLA form materializes the [K, M, N] product
S_k^T A in HBM (268 MB at the bench shapes) before square-reducing it.
Here each [M, TN] product panel lives only in VMEM: S_k (bf16, tril applied
once outside) stays *resident* across the whole N sweep (its BlockSpec
index is constant in n), the product is one MXU dot per tile, and the
square/column-sum epilogue consumes it in place.  HBM traffic drops from
~570 MB to one bf16 read of S + one of A (~50 MB at bench shapes).

Backward: custom_vjp with the standard three-matmul XLA formula
(recompute S^T A, then dS = tril(A W^T), dA = sum_k S_k W_k with
W = 2 g * S^T A).  Residuals are just (S, A).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["qsqrt_sq_colsum", "qsqrt_sq_colsum_xla"]

TN = 512    # n-tile: data columns per grid step
# The resident S_k block is Mp^2 bf16 bytes; with the A tile, the f32
# product panel and double buffering it must fit ~16 MB VMEM, which caps
# M at 2048.  Larger M falls back to the XLA dense path.
MAX_M = 2048


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quad_kernel(st_ref, a_ref, out_ref):
    """Grid (K, N/TN).  st_ref [1, M, M] bf16 = S_k^T, pre-transposed so the
    dot is in natural (row, contract) x (contract, col) orientation
    (resident across the n sweep); a_ref [M, TN] bf16; out_ref [1, 8, TN]
    f32 (row 0 live)."""
    t = jax.lax.dot_general(
        st_ref[0], a_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [M, TN] in VMEM
    # Column-sum via a ones-row MXU dot: a cross-sublane VPU reduction over
    # [M, TN] f32 is slower than the main matmul itself.
    ones = jnp.ones((8, t.shape[0]), jnp.float32)
    out_ref[0, :, :] = jax.lax.dot_general(
        ones, t * t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _quad_pallas(S, A, *, interpret=False):
    K, M, _ = S.shape
    N = A.shape[-1]
    Mp, Np = _round_up(M, 128), _round_up(N, TN)
    # tril + transpose + bf16 cast once here (outside the kernel): matches
    # the XLA dense path's effective MXU precision, halves S's HBM traffic,
    # and hands the kernel the natural matmul orientation.
    Sp = jnp.pad(jnp.swapaxes(jnp.tril(S), -1, -2).astype(jnp.bfloat16),
                 ((0, 0), (0, Mp - M), (0, Mp - M)))
    Ap = jnp.pad(A.astype(jnp.bfloat16), ((0, Mp - M), (0, Np - N)))
    grid = (K, Np // TN)
    out = pl.pallas_call(
        _quad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Mp, Mp), lambda k, n: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, TN), lambda k, n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        # TPU block tiling needs the last two dims (8, 128)-aligned: carry a
        # dead sublane axis of 8 and read row 0 (output is tiny: [K, N]).
        out_specs=pl.BlockSpec((1, 8, TN), lambda k, n: (k, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, 8, Np), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * M * M * N,
            bytes_accessed=2 * (K * M * M + K * M * N) + 4 * K * N,
            transcendentals=0),
        interpret=interpret,
    )(Sp, Ap)
    return out[:, 0, :N]


def qsqrt_sq_colsum_xla(S, A):
    """XLA reference: sum_m (tril(S)^T A)^2 over m, per (k, n)."""
    LTA = jnp.matmul(jnp.swapaxes(jnp.tril(S), -1, -2), A[None],
                     preferred_element_type=A.dtype)
    return jnp.sum(jnp.square(LTA), axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def qsqrt_sq_colsum(S, A, interpret=False):
    """extra[k, n] = sum_p (tril(S_k)^T A)[p, n]^2  via the Pallas kernel.

    S: [K, M, M] (only the lower triangle is read), A: [M, N], fp32.
    M > MAX_M (VMEM-residency limit) routes to the XLA dense form.
    """
    if S.shape[-1] > MAX_M:
        return qsqrt_sq_colsum_xla(S, A)
    dtype = A.dtype
    return _quad_pallas(S, A, interpret=interpret).astype(dtype)


def _quad_fwd(S, A, interpret):
    return qsqrt_sq_colsum(S, A, interpret), (S, A)


def _quad_bwd(interpret, res, g):
    S, A = res
    St = jnp.tril(S)
    LTA = jnp.matmul(jnp.swapaxes(St, -1, -2), A[None],
                     preferred_element_type=A.dtype)             # [K, M, N]
    W = 2.0 * g[:, None, :] * LTA                                # [K, M, N]
    dA = jnp.sum(jnp.matmul(St, W, preferred_element_type=A.dtype),
                 axis=0)                                         # [M, N]
    dS = jnp.tril(jnp.matmul(A[None], jnp.swapaxes(W, -1, -2),
                             preferred_element_type=A.dtype))    # [K, M, M]
    return dS, dA


qsqrt_sq_colsum.defvjp(_quad_fwd, _quad_bwd)
