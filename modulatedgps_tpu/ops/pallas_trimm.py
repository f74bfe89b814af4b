"""Triangular-structured matmuls for the Cholesky pullback (r5).

The fused whiten-solve backward (ops/linalg.py::_whiten_solve_fused_bwd,
the backward of the conditional chain reached from reference
MixtureGPs/models.py:141) closes with Murray's pullback:

    P    = L^T Lbar            (phi consumes only tril(P))
    phi  = tril(P) - 0.5 diag
    Kbar = Linv^T phi Linv     (then symmetrized)

As dense XLA matmuls at precision HIGH (bf16x3) these cost 9 M^3
MXU-pass-mults per layer; CHOLPREC_AB_r04 measured the HIGH->bf16 switch
worth 9.2 ms/step but CHOLPREC_GRADERR_r04 killed it (631x worse Z
grads — the P/Kbar chain cancels catastrophically in bf16).  Every
operand here is TRIANGULAR, so the contractions are banded:

    P[i,j]   = sum_{k >= max(i,j)} L[k,i] Lbar[k,j]      (tril out only)
    S1[i,j]  = sum_{k >= max(i,j)} Linv[k,i] phi[k,j]    (full out)
    Kraw[i,j]= sum_{k >= j}        S1[i,k] Linv[k,j]     (full out)

Total ~1.0 M^3 mults instead of 3 M^3 — at the SAME effective HIGH
precision, implemented in-kernel as the explicit 3-pass bf16 split
(x = hi + lo; x*y ~ hi*hi + hi*lo + lo*hi with f32 accumulation), i.e.
3 M^3 MXU passes instead of 9 with unchanged per-element arithmetic.

Static banded grid via scalar-prefetched (bi, bj, bk) step arrays (the
ops/pallas_tril.py trick); output blocks accumulate in VMEM across each
contiguous k-run.  Routed by ops/linalg.py on the same predicate as the
rest of the large-M family.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tri_tt_matmul", "tri_nt_matmul", "chol_pullback_structured",
           "chol_pullback_dense"]

_BM = 512
_VMEM_LIMIT = 64 * 1024 * 1024


def _bm(M: int) -> int:
    if M % _BM == 0:
        return _BM
    if M % 256 == 0:
        return 256
    return 0


def eligible(M: int) -> bool:
    return _bm(M) > 0


def _mask_tril(blk, on):
    """tril-mask a block when ``on`` (diagonal block of a lower operand)."""
    ir = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    keep = jnp.logical_not(on) | (ir >= ic)
    return jnp.where(keep, blk, jnp.zeros_like(blk))


def _split_bf16(x):
    """(hi, lo) bf16 split of f32 via mantissa masking.

    The naive ``hi = bf16(x); lo = x - f32(hi)`` is NOT safe here: under
    ``--xla_allow_excess_precision=true`` (pinned by this environment's
    TPU terminal) the compiler may elide the f32->bf16->f32 round-trip,
    folding lo to zero and silently degrading the 3-pass product to
    plain bf16 — measured on-chip as the same 0.4-0.6 Z-grad relative
    error class as the r4 bf16 dead end.  Masking the low 16 mantissa
    bits with integer ops cannot be constant-folded away: hi is exactly
    bf16-representable (truncation), and lo = x - hi is exact in f32.
    """
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(
        xi & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = x - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _dot3(a, b, dims):
    """HIGH-equivalent 3-pass bf16 dot with f32 accumulation."""
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    d = lambda x, y: jax.lax.dot_general(
        x, y, (dims, ((), ())), preferred_element_type=jnp.float32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _steps_tt(nb: int, tril_out: bool):
    """(bi, bj, bk, first) for C[bi,bj] = sum_{bk>=max(bi,bj)} ..."""
    bi_l, bj_l, bk_l, first = [], [], [], []
    for bi in range(nb):
        for bj in range(nb):
            if tril_out and bi < bj:
                continue
            lo = max(bi, bj)
            for bk in range(lo, nb):
                bi_l.append(bi)
                bj_l.append(bj)
                bk_l.append(bk)
                first.append(1 if bk == lo else 0)
    return tuple(np.asarray(x, np.int32) for x in (bi_l, bj_l, bk_l, first))


def _steps_nt(nb: int):
    """(bi, bj, bk, first) for C[bi,bj] = sum_{bk>=bj} A[bi,bk] B[bk,bj]."""
    bi_l, bj_l, bk_l, first = [], [], [], []
    for bi in range(nb):
        for bj in range(nb):
            for bk in range(bj, nb):
                bi_l.append(bi)
                bj_l.append(bj)
                bk_l.append(bk)
                first.append(1 if bk == bj else 0)
    return tuple(np.asarray(x, np.int32) for x in (bi_l, bj_l, bk_l, first))


def _k_tt(mask_a, mask_b, bi_ref, bj_ref, bk_ref, first_ref,
          a_ref, b_ref, c_ref):
    t = pl.program_id(0)
    bi, bj, bk = bi_ref[t], bj_ref[t], bk_ref[t]
    a = a_ref[...]
    b = b_ref[...]
    if mask_a:
        a = _mask_tril(a, bk == bi)
    if mask_b:
        b = _mask_tril(b, bk == bj)
    prod = _dot3(a, b, ((0,), (0,)))          # A[bk,bi]^T B[bk,bj]

    @pl.when(first_ref[t] == 1)
    def _init():
        c_ref[...] = prod

    @pl.when(first_ref[t] == 0)
    def _acc():
        c_ref[...] += prod


def tri_tt_matmul(A, B, *, tril_out: bool, mask_a: bool = True,
                  mask_b: bool = True, interpret: bool = False):
    """C = A^T B with A, B lower-triangular [M, M] f32; contraction
    banded to k >= max(i, j).  ``tril_out=True`` computes only the lower
    blocks (strictly-upper blocks of the result are UNINITIALIZED —
    caller must tril)."""
    M = A.shape[-1]
    BM = _bm(M)
    nb = M // BM
    bi, bj, bk, first = _steps_tt(nb, tril_out)
    spec = lambda sel: pl.BlockSpec((BM, BM), sel)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(len(bi),),
        in_specs=[
            spec(lambda t, bi, bj, bk, first: (bk[t], bi[t])),
            spec(lambda t, bi, bj, bk, first: (bk[t], bj[t])),
        ],
        out_specs=spec(lambda t, bi, bj, bk, first: (bi[t], bj[t])),
    )
    return pl.pallas_call(
        functools.partial(_k_tt, mask_a, mask_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * len(bi) * BM ** 3,
            bytes_accessed=4 * (2 * len(bi) * BM * BM + M * M),
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(bi), jnp.asarray(bj), jnp.asarray(bk),
      jnp.asarray(first), A, B)


def _k_nt(mask_b, bi_ref, bj_ref, bk_ref, first_ref, a_ref, b_ref, c_ref):
    t = pl.program_id(0)
    bj, bk = bj_ref[t], bk_ref[t]
    a = a_ref[...]
    b = b_ref[...]
    if mask_b:
        b = _mask_tril(b, bk == bj)
    prod = _dot3(a, b, ((1,), (0,)))          # A[bi,bk] B[bk,bj]

    @pl.when(first_ref[t] == 1)
    def _init():
        c_ref[...] = prod

    @pl.when(first_ref[t] == 0)
    def _acc():
        c_ref[...] += prod


def tri_nt_matmul(A, B, *, mask_b: bool = True, interpret: bool = False):
    """C = A B with B lower-triangular [M, M] f32 (A dense); contraction
    banded to k >= j; full output."""
    M = A.shape[-1]
    BM = _bm(M)
    nb = M // BM
    bi, bj, bk, first = _steps_nt(nb)
    spec = lambda sel: pl.BlockSpec((BM, BM), sel)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(len(bi),),
        in_specs=[
            spec(lambda t, bi, bj, bk, first: (bi[t], bk[t])),
            spec(lambda t, bi, bj, bk, first: (bk[t], bj[t])),
        ],
        out_specs=spec(lambda t, bi, bj, bk, first: (bi[t], bj[t])),
    )
    return pl.pallas_call(
        functools.partial(_k_nt, mask_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * len(bi) * BM ** 3,
            bytes_accessed=4 * (2 * len(bi) * BM * BM + M * M),
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(bi), jnp.asarray(bj), jnp.asarray(bk),
      jnp.asarray(first), A, B)


def chol_pullback_dense(L, Linv, Lbar, precision):
    """The existing dense composition (Murray 2016 eq. 8-9) — the oracle
    the structured path is tested against."""
    LinvT = jnp.swapaxes(Linv, -1, -2)
    P = jnp.matmul(jnp.swapaxes(L, -1, -2), Lbar, precision=precision,
                   preferred_element_type=L.dtype)
    phi = jnp.tril(P) - 0.5 * jnp.diag(jnp.diagonal(P))
    Kbar = jnp.matmul(jnp.matmul(LinvT, phi, precision=precision,
                                 preferred_element_type=L.dtype),
                      Linv, precision=precision,
                      preferred_element_type=L.dtype)
    return 0.5 * (Kbar + jnp.swapaxes(Kbar, -1, -2))


def chol_pullback_structured(L, Linv, Lbar, *, interpret: bool = False):
    """Banded-contraction form: same HIGH-class arithmetic, ~1/3 the MXU
    passes.  L, Linv, Lbar [M, M] f32 lower-triangular."""
    P = tri_tt_matmul(L, Lbar, tril_out=True, interpret=interpret)
    phi = jnp.tril(P) - 0.5 * jnp.diag(jnp.diagonal(P))
    # phi is lower-triangular by construction; its strictly-upper entries
    # came from uninitialized blocks and are zeroed by the tril above.
    S1 = tri_tt_matmul(Linv, phi, tril_out=False, interpret=interpret)
    Kraw = tri_nt_matmul(S1, Linv, interpret=interpret)
    return 0.5 * (Kraw + jnp.swapaxes(Kraw, -1, -2))
