"""Tril-blocked whitened-KL kernels (r5).

The whitened KL's q_sqrt terms (ops/kl.py::_kl_white_tril, reached from
``prior_kl()`` at reference MixtureGPs/models.py:79) are pure elementwise
traffic over the [K, M, M] tril factor: sum(Lq^2) + sum(log|diag Lq|)
forward, dLq = g * (Lq - diag(1/diag)) backward.  The dense form walks
the STRUCTURAL-ZERO upper half on every pass — at M=4096 that is
~0.8 GB/step of wasted HBM traffic across the two layers
(STEP_ATTRIB_r04b: the KL slice runs at ~2x its ideal).

These kernels enumerate only the lower-triangular blocks (the
ops/pallas_tril.py static-grid trick):

  fwd  one pass over tril blocks -> (sumsq [1,1], logdiag [1,1])
       accumulated in a VMEM-revisited scalar block
  bwd  one pass writing dLq on tril blocks only

CONTRACT: the backward's strictly-upper blocks are UNVISITED and contain
garbage.  The only consumer is the q_sqrt gradient sum, which flows
through Parameter's "tril" transform VJP (a select that zeroes the upper
triangle) before the optimizer — the same downstream mask that already
sanitizes the tril-matmul kernels' dL.  Routing (ops/kl.py) therefore
requires the TPU/f32/large-M product path where that contract holds;
everything else keeps the dense analytic VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tril import _bm_for, _tril_pairs, _VMEM_LIMIT

__all__ = ["kl_sq_logdiag", "kl_bwd_scale", "eligible"]


def eligible(M: int, min_M: int = 2048) -> bool:
    from .pallas_tril import eligible as tril_eligible
    return tril_eligible(M, min_M)


def _k_fwd(nsteps, mpb_ref, mb_ref, lq_ref, sq_ref, ld_ref):
    k, t = pl.program_id(0), pl.program_id(1)
    mp, m = mpb_ref[t], mb_ref[t]
    blk = lq_ref[0]
    first = (k == 0) & (t == 0)
    psq = jnp.sum(blk * blk)
    ir = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    diag = (m == mp) & (ir == ic)
    pld = jnp.sum(jnp.where(diag, jnp.log(jnp.abs(
        jnp.where(diag, blk, jnp.ones_like(blk)))), 0.0))

    # (1, 1)-shaped stores: Mosaic rejects scalar stores to VMEM in some
    # lowering contexts (seen in the scan-chained train step).
    psq2 = jnp.reshape(psq, (1, 1))
    pld2 = jnp.reshape(pld, (1, 1))

    @pl.when(first)
    def _init():
        sq_ref[...] = psq2
        ld_ref[...] = pld2

    @pl.when(jnp.logical_not(first))
    def _acc():
        sq_ref[...] += psq2
        ld_ref[...] += pld2


def kl_sq_logdiag(Lq, *, interpret: bool = False):
    """(sum(Lq^2), sum(log|diag Lq|)) reading only the tril blocks.

    Lq [K, M, M] f32, lower-triangular (upper entries of DIAGONAL blocks
    are read and must be zero — true for Parameter "tril" values)."""
    K, M = Lq.shape[0], Lq.shape[-1]
    BM = _bm_for(M, None)
    nb = M // BM
    mpb, mb = _tril_pairs(nb, "mp")
    T = len(mpb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, T),
        in_specs=[pl.BlockSpec((1, BM, BM),
                               lambda k, t, mpb, mb: (k, mb[t], mpb[t]))],
        out_specs=(pl.BlockSpec((1, 1), lambda k, t, mpb, mb: (0, 0)),
                   pl.BlockSpec((1, 1), lambda k, t, mpb, mb: (0, 0))),
    )
    sq, ld = pl.pallas_call(
        functools.partial(_k_fwd, K * T),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=3 * K * M * M // 2,
            bytes_accessed=4 * K * M * M // 2,
            transcendentals=K * M),
        interpret=interpret,
    )(jnp.asarray(mpb), jnp.asarray(mb), Lq)
    return sq[0, 0], ld[0, 0]


def _k_bwd(mpb_ref, mb_ref, g_ref, lq_ref, d_ref):
    t = pl.program_id(1)
    mp, m = mpb_ref[t], mb_ref[t]
    blk = lq_ref[0]
    g = g_ref[0]
    ir = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    diag = (m == mp) & (ir == ic)
    safe = jnp.where(diag, blk, jnp.ones_like(blk))
    d_ref[0] = g * jnp.where(diag, blk - 1.0 / safe, blk)


def kl_bwd_scale(Lq, g, *, interpret: bool = False):
    """dLq = g * (Lq - diag_embed(1/diag Lq)) on tril blocks ONLY.

    The strictly-upper blocks of the result are UNINITIALIZED — see the
    module contract (downstream Parameter tril-VJP select masks them)."""
    K, M = Lq.shape[0], Lq.shape[-1]
    BM = _bm_for(M, None)
    nb = M // BM
    mpb, mb = _tril_pairs(nb, "mp")
    T = len(mpb)
    g2 = jnp.reshape(g.astype(jnp.float32), (1, 1))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, T),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k, t, mpb, mb: (0, 0)),
            pl.BlockSpec((1, BM, BM),
                         lambda k, t, mpb, mb: (k, mb[t], mpb[t])),
        ],
        out_specs=pl.BlockSpec((1, BM, BM),
                               lambda k, t, mpb, mb: (k, mb[t], mpb[t])),
    )
    return pl.pallas_call(
        _k_bwd,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, M, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=K * M * M,
            bytes_accessed=4 * K * M * M,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(mpb), jnp.asarray(mb), g2, Lq)
