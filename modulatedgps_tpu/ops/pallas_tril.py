"""Triangular-aware Pallas kernels for the q_sqrt quadratic family.

The conditional's variance term B = A^T L (ops/conditionals.py:113-115,
reached from reference MixtureGPs/models.py:141-143 via gpflow
base_conditional) and its two gradient matmuls are the dominant FLOPs of
the whole train step at the north-star shape: STEP_ATTRIB_r04 cost
analysis puts them at 13.2 of the step's 16.6 TFLOP.  L = tril(q_sqrt) is
lower-triangular, so HALF of every one of those dense contractions
multiplies structural zeros.  XLA cannot exploit that (r3 measured:
block-triangular decompositions at the XLA level lose — the partials
round-trip HBM; a fori/dynamic-slice Pallas kernel loses — poor
pipelining).  These kernels enumerate only the lower-triangular blocks in
a STATIC grid via scalar-prefetched block-index arrays — no dynamic
slicing, dense MXU dots per step, standard revisited-output accumulation
— cutting the family's FLOPs from 2*K*M^2*N to ~K*M*(M+BM)*N per op.

Three kernels over block size BM (m/m' axes) and TN (data columns):

  fwd  B[k, n, m']  = sum_{m >= m'} A[m, n] L[k, m, m']     (A^T L)
  bwd  dL[k, m, m'] = sum_n A[m, n] W[k, n, m']   (m >= m', else 0)
  bwd  dA[m, n]     = sum_k sum_{m' <= m} L[k, m, m'] W[k, n, m']

with W = Bbar (the cotangent of B; the caller's square-colsum backward
makes it 2*g*B).  Inputs are pre-cast to bf16 outside the kernels —
identical effective MXU precision to the XLA dense path they replace
(default matmul precision rounds f32 operands to bf16) — with f32
accumulators; diagonal blocks mask their strictly-upper entries in-kernel,
so only the lower triangle of L is ever read (callers may pass the raw
q_sqrt leaf).

Routing: pallas-eligible when M % BM == 0 (BM 512, or 256 at M=1024) —
use ``atl_matmul`` for the custom-VJP op and ``eligible()`` for the
caller-side check; N is zero-padded to a TN multiple internally.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["atl_matmul", "atl_matmul_xla", "atl_sq_colsum", "eligible",
           "route", "set_tril_dispatch"]

TN = 1024   # data-column tile

# Per-kernel block size overrides (None = auto via _block_m).  The dl/da
# backward kernels admit larger BM than the fwd: their revisited f32
# output block is [BM, BM] / [BM, TN] (4 MB at BM=1024), and HBM read
# traffic scales as K*N*M*(nb+1) with nb = M/BM — BM=1024 (nb=4 at
# M=4096) halves the re-read traffic for +11% MXU FLOPs (diagonal-block
# waste).  Swept in-chain by benchmarks/tril_tile_sweep.py.
_BM_FWD: int | None = None
_BM_DL: int | None = None
_BM_DA: int | None = None
# Per-kernel data-column tiles (None = module TN).  Must divide TN (the
# padding granularity).  The dl/da kernels' HBM traffic is TN-independent
# (reads scale as K*N*M*(nb+1)), so a smaller TN is free bandwidth-wise
# and buys VMEM headroom for BM=1024 (the [BM, BM]/[BM, TN] f32 output
# block is double-buffered by the pipeline).
_TN_DL: int | None = None
_TN_DA: int | None = None
# Per-kernel VMEM budget (Mosaic vmem_limit_bytes): the default 16 MB
# scoped limit rejects BM=1024 blocks (buffers + dot stack ~17-21 MB);
# v5e has 128 MB VMEM per core, so grant the tril kernels 64 MB.
_VMEM_LIMIT = 64 * 1024 * 1024

# None = auto (TPU only); True/False force (tests use True + interpret via
# monkeypatching pl.pallas_call — see tests/test_pallas_tril.py).
_TRIL_DISPATCH: bool | None = None
_TRIL_MIN_DIM = 2048
# Route the diag-variance path through atl_sq_colsum (bf16 B + in-kernel
# cotangent scaling) instead of atl_matmul + XLA epilogue; False keeps the
# r4 composition (A/B harness benchmarks/sq_fused_ab.py).
_SQ_FUSED = True


def set_sq_fused(enabled: bool) -> None:
    global _SQ_FUSED
    _SQ_FUSED = bool(enabled)


def sq_fused() -> bool:
    return _SQ_FUSED


def set_tril_dispatch(mode: bool | None) -> None:
    """Force the tril-kernel routing on/off (None = auto: TPU only)."""
    global _TRIL_DISPATCH
    _TRIL_DISPATCH = mode


def route(A, L) -> bool:
    """Should the conditional's B = A^T L use the tril kernels here?"""
    if _TRIL_DISPATCH is False:
        return False
    if A.ndim != 2 or L.ndim != 3 or A.dtype != jnp.float32:
        return False
    # Under vmap the operands are BatchTracers whose reported ndim hides
    # the batch axis; batching a pallas_call with these block specs is
    # unsupported (measured: bench.py's reference-style arm vmaps the
    # conditional over S and crashed in lowering).  Fall back to dense.
    from jax._src.interpreters.batching import BatchTracer
    if isinstance(A, BatchTracer) or isinstance(L, BatchTracer):
        return False
    if not eligible(L.shape[-1], _TRIL_MIN_DIM):
        return False
    if _TRIL_DISPATCH is None and jax.default_backend() != "tpu":
        return False
    return True


def _block_m(M: int) -> int:
    if M % 512 == 0:
        return 512
    if M % 256 == 0:
        return 256
    return 0


def _bm_for(M: int, override: int | None) -> int:
    """Per-kernel block size: the override if it divides M, else auto."""
    if override is not None and M % override == 0:
        return override
    return _block_m(M)


def set_tril_tiles(*, fwd: int | None = None, dl: int | None = None,
                   da: int | None = None, tn_dl: int | None = None,
                   tn_da: int | None = None) -> None:
    """Set per-kernel BM/TN overrides (None = auto).  Tunables are read at
    TRACE time — re-jit after changing (see CLAUDE.md precision-globals
    note)."""
    global _BM_FWD, _BM_DL, _BM_DA, _TN_DL, _TN_DA
    _BM_FWD, _BM_DL, _BM_DA = fwd, dl, da
    _TN_DL, _TN_DA = tn_dl, tn_da


def eligible(M: int, min_M: int = 2048) -> bool:
    """Shapes the tril kernels accept (the caller adds platform/dtype
    routing; min_M is where the win was measured to clear the dispatch
    overhead — same threshold family as ops/linalg's TRSM routing)."""
    return M >= min_M and _block_m(M) > 0


def _tril_pairs(nb: int, major: str):
    """Block-index enumeration of the lower triangle.

    'mp' (m'-major: for each output column block, its m run is contiguous
    — fwd accumulates B over m) or 'm' (m-major: for each output row
    block, its m' run is contiguous — dA accumulates over m' and k)."""
    if major == "mp":
        pairs = [(mp, m) for mp in range(nb) for m in range(mp, nb)]
    else:
        pairs = [(mp, m) for m in range(nb) for mp in range(m + 1)]
    mpb = np.asarray([p[0] for p in pairs], np.int32)
    mb = np.asarray([p[1] for p in pairs], np.int32)
    return mpb, mb


def _masked(lblk, m, mp):
    """Zero the strictly-upper entries of a diagonal block (no-op off the
    diagonal): keeps the contraction exactly tril(L) without ever reading
    the upper blocks."""
    ir = jax.lax.broadcasted_iota(jnp.int32, lblk.shape, 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, lblk.shape, 1)
    keep = (m != mp) | (ir >= ic)
    return jnp.where(keep, lblk, jnp.zeros_like(lblk))


# ------------------------------------------------------------------ forward

def _k_fwd(mpb_ref, mb_ref, a_ref, l_ref, b_ref):
    t = pl.program_id(2)
    mp, m = mpb_ref[t], mb_ref[t]
    lblk = _masked(l_ref[0], m, mp)
    prod = jax.lax.dot_general(
        a_ref[...], lblk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TN, BM]

    @pl.when(m == mp)
    def _init():
        b_ref[0] = prod

    @pl.when(m != mp)
    def _acc():
        b_ref[0] += prod


def _fwd_pallas(A16, L16, M, N, K, BM):
    nb = M // BM
    mpb, mb = _tril_pairs(nb, "mp")
    T = len(mpb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, N // TN, T),
        in_specs=[
            pl.BlockSpec((BM, TN), lambda k, n, t, mpb, mb: (mb[t], n)),
            pl.BlockSpec((1, BM, BM),
                         lambda k, n, t, mpb, mb: (k, mb[t], mpb[t])),
        ],
        out_specs=pl.BlockSpec((1, TN, BM),
                               lambda k, n, t, mpb, mb: (k, n, mpb[t])),
    )
    return pl.pallas_call(
        _k_fwd,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, N, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=K * M * (M + BM) * N,
            bytes_accessed=2 * (K * M * M // 2 + M * N) + 4 * K * N * M,
            transcendentals=0),
    )(jnp.asarray(mpb), jnp.asarray(mb), A16, L16)


# ---------------------------------------------------------------- backward

def _k_dl(mpb_ref, mb_ref, a_ref, w_ref, dl_ref):
    t, n = pl.program_id(1), pl.program_id(2)
    mp, m = mpb_ref[t], mb_ref[t]
    prod = jax.lax.dot_general(
        a_ref[...], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BM(m), BM(mp)]
    prod = _masked(prod, m, mp)

    @pl.when(n == 0)
    def _init():
        dl_ref[0] = prod

    @pl.when(n != 0)
    def _acc():
        dl_ref[0] += prod


def _dl_pallas(A16, W16, M, N, K, BM):
    nb = M // BM
    tn = _TN_DL if (_TN_DL and TN % _TN_DL == 0) else TN
    mpb, mb = _tril_pairs(nb, "mp")
    T = len(mpb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, T, N // tn),
        in_specs=[
            pl.BlockSpec((BM, tn), lambda k, t, n, mpb, mb: (mb[t], n)),
            pl.BlockSpec((1, tn, BM),
                         lambda k, t, n, mpb, mb: (k, n, mpb[t])),
        ],
        out_specs=pl.BlockSpec((1, BM, BM),
                               lambda k, t, n, mpb, mb: (k, mb[t], mpb[t])),
    )
    out = pl.pallas_call(
        _k_dl,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, M, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=K * M * (M + BM) * N,
            bytes_accessed=2 * (M * N + K * N * M) + 4 * K * M * M // 2,
            transcendentals=0),
    )(jnp.asarray(mpb), jnp.asarray(mb), A16, W16)
    # The strictly-upper blocks are never visited, so the output buffer is
    # UNINITIALIZED there (pallas does not zero-fill) — mask them out.  One
    # [K, M, M] select pass; the true dense-path gradient is exactly zero
    # there (cotangent of tril(L)).
    return jnp.tril(out)


def _k_da(mpb_ref, mb_ref, l_ref, w_ref, da_ref):
    t, k = pl.program_id(1), pl.program_id(2)
    mp, m = mpb_ref[t], mb_ref[t]
    lblk = _masked(l_ref[0], m, mp)
    prod = jax.lax.dot_general(
        lblk, w_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BM(m), TN]
    first = (mp == 0) & (k == 0)

    @pl.when(first)
    def _init():
        da_ref[...] = prod

    @pl.when(jnp.logical_not(first))
    def _acc():
        da_ref[...] += prod


def _da_pallas(L16, W16, M, N, K, BM):
    nb = M // BM
    tn = _TN_DA if (_TN_DA and TN % _TN_DA == 0) else TN
    mpb, mb = _tril_pairs(nb, "m")
    T = len(mpb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // tn, T, K),
        in_specs=[
            pl.BlockSpec((1, BM, BM),
                         lambda n, t, k, mpb, mb: (k, mb[t], mpb[t])),
            pl.BlockSpec((1, tn, BM),
                         lambda n, t, k, mpb, mb: (k, n, mpb[t])),
        ],
        out_specs=pl.BlockSpec((BM, tn),
                               lambda n, t, k, mpb, mb: (mb[t], n)),
    )
    return pl.pallas_call(
        _k_da,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=K * M * (M + BM) * N,
            bytes_accessed=2 * (K * M * M // 2 + K * N * M) + 4 * M * N,
            transcendentals=0),
    )(jnp.asarray(mpb), jnp.asarray(mb), L16, W16)


# ------------------------------------------------------------------ wrapper

def _pad_n(x, N, axis):
    Np = (N + TN - 1) // TN * TN
    if Np == N:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, Np - N)
    return jnp.pad(x, pad)


def atl_matmul_xla(A, L):
    """Dense reference: B[k, n, m'] = (A^T tril(L))[k] — the exact op at
    ops/conditionals.py:113-115 (tril applied by the caller there)."""
    return jnp.matmul(jnp.swapaxes(A, -1, -2)[None], jnp.tril(L),
                      preferred_element_type=A.dtype)


@jax.custom_vjp
def atl_matmul(A, L):
    """B = A^T tril(L) with triangular-block-skipping Pallas kernels for
    the forward and BOTH gradient contractions (custom VJP).

    A [M, N] f32, L [K, M, M] f32 (only the lower triangle is read).
    Returns [K, N, M] f32.  Requires eligible(M); N is padded internally.
    Gradient layouts match the dense path's natural orientations
    (dL row-major [K, M, M]) so q_sqrt's Adam moments keep their layout
    (see the measured relayout note at ops/conditionals.py:104-112).
    """
    B, _ = _atl_fwd(A, L)
    return B


def _atl_fwd(A, L):
    M, N = A.shape
    K = L.shape[0]
    BM = _bm_for(M, _BM_FWD)
    A16 = _pad_n(A.astype(jnp.bfloat16), N, 1)
    L16 = L.astype(jnp.bfloat16)
    B = _fwd_pallas(A16, L16, M, A16.shape[1], K, BM)[:, :N, :]
    return B, (A16, L16)


def _atl_bwd(res, Bbar):
    A16, L16 = res
    M = A16.shape[0]
    K = L16.shape[0]
    N = Bbar.shape[1]
    W16 = _pad_n(Bbar.astype(jnp.bfloat16), N, 1)
    Np = W16.shape[1]
    dL = _dl_pallas(A16, W16, M, Np, K, _bm_for(M, _BM_DL))
    dA = _da_pallas(L16, W16, M, Np, K, _bm_for(M, _BM_DA))[:, :N]
    return dA.astype(jnp.float32), dL


atl_matmul.defvjp(lambda A, L: _atl_fwd(A, L), _atl_bwd)


# ---------------------------------------------------- fused square-colsum
#
# The conditional's diag-variance path only ever consumes B through
# extra[k, n] = sum_mp B[k, n, mp]^2 (ops/conditionals.py), and the
# backward's cotangent is the rank-1-scaled W = 2 * gbar[k, n] * B.  The
# atl_matmul form materializes B in f32 ([K, N, M] = 1.07 GB at the
# north-star shape), reads it back for the square-colsum, and round-trips
# the scaled W16 again in the backward.  This op instead:
#
#   * keeps the fwd accumulator in a VMEM f32 scratch and writes B to HBM
#     in bf16 ONCE (half the write traffic; bf16 is exactly the precision
#     the dl/dA kernels would re-read it at anyway),
#   * computes extra from B16 outside (one 0.5 GB read),
#   * applies the 2*gbar scaling INSIDE the dl/dA kernels (a [TN, 1]
#     broadcast per block) so the W cotangent never exists in HBM.
#
# Net: ~2.7 GB less HBM traffic per step at batch 8192/M 4096/K 8 vs the
# atl_matmul + XLA-epilogue composition it replaces.

def _k_fwd_b16(nb, mpb_ref, mb_ref, a_ref, l_ref, b16_ref, acc_ref):
    t = pl.program_id(2)
    mp, m = mpb_ref[t], mb_ref[t]
    lblk = _masked(l_ref[0], m, mp)
    prod = jax.lax.dot_general(
        a_ref[...], lblk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [TN, BM]

    @pl.when(m == mp)
    def _init():
        acc_ref[...] = prod

    @pl.when(m != mp)
    def _acc():
        acc_ref[...] += prod

    # The m-run for output column block mp ends at m == nb-1 ('mp'-major
    # enumeration); flush the finished f32 accumulator to the bf16 output.
    @pl.when(m == nb - 1)
    def _flush():
        b16_ref[0] = acc_ref[...].astype(jnp.bfloat16)


def _fwd_pallas_b16(A16, L16, M, N, K, BM):
    nb = M // BM
    mpb, mb = _tril_pairs(nb, "mp")
    T = len(mpb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, N // TN, T),
        in_specs=[
            pl.BlockSpec((BM, TN), lambda k, n, t, mpb, mb: (mb[t], n)),
            pl.BlockSpec((1, BM, BM),
                         lambda k, n, t, mpb, mb: (k, mb[t], mpb[t])),
        ],
        out_specs=pl.BlockSpec((1, TN, BM),
                               lambda k, n, t, mpb, mb: (k, n, mpb[t])),
        scratch_shapes=[pltpu.VMEM((TN, BM), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_k_fwd_b16, nb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, N, M), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=K * M * (M + BM) * N,
            bytes_accessed=2 * (K * M * M // 2 + M * N) + 2 * K * N * M,
            transcendentals=0),
    )(jnp.asarray(mpb), jnp.asarray(mb), A16, L16)


def _k_dl_g(mpb_ref, mb_ref, a_ref, b_ref, g_ref, dl_ref):
    t, n = pl.program_id(1), pl.program_id(2)
    mp, m = mpb_ref[t], mb_ref[t]
    w = (b_ref[0].astype(jnp.float32) * g_ref[0]).astype(jnp.bfloat16)
    prod = jax.lax.dot_general(
        a_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BM(m), BM(mp)]
    prod = _masked(prod, m, mp)

    @pl.when(n == 0)
    def _init():
        dl_ref[0] = prod

    @pl.when(n != 0)
    def _acc():
        dl_ref[0] += prod


def _dl_pallas_g(A16, B16, G, M, N, K, BM):
    nb = M // BM
    tn = _TN_DL if (_TN_DL and TN % _TN_DL == 0) else TN
    mpb, mb = _tril_pairs(nb, "mp")
    T = len(mpb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K, T, N // tn),
        in_specs=[
            pl.BlockSpec((BM, tn), lambda k, t, n, mpb, mb: (mb[t], n)),
            pl.BlockSpec((1, tn, BM),
                         lambda k, t, n, mpb, mb: (k, n, mpb[t])),
            pl.BlockSpec((1, tn, 1), lambda k, t, n, mpb, mb: (k, n, 0)),
        ],
        out_specs=pl.BlockSpec((1, BM, BM),
                               lambda k, t, n, mpb, mb: (k, mb[t], mpb[t])),
    )
    out = pl.pallas_call(
        _k_dl_g,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, M, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=K * M * (M + BM) * N,
            bytes_accessed=2 * (M * N + K * N * M) + 4 * K * M * M // 2,
            transcendentals=0),
    )(jnp.asarray(mpb), jnp.asarray(mb), A16, B16, G)
    return jnp.tril(out)    # unvisited strictly-upper blocks (see _dl_pallas)


def _k_da_g(mpb_ref, mb_ref, l_ref, b_ref, g_ref, da_ref):
    t, k = pl.program_id(1), pl.program_id(2)
    mp, m = mpb_ref[t], mb_ref[t]
    lblk = _masked(l_ref[0], m, mp)
    w = (b_ref[0].astype(jnp.float32) * g_ref[0]).astype(jnp.bfloat16)
    prod = jax.lax.dot_general(
        lblk, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [BM(m), TN]
    first = (mp == 0) & (k == 0)

    @pl.when(first)
    def _init():
        da_ref[...] = prod

    @pl.when(jnp.logical_not(first))
    def _acc():
        da_ref[...] += prod


def _da_pallas_g(L16, B16, G, M, N, K, BM):
    nb = M // BM
    tn = _TN_DA if (_TN_DA and TN % _TN_DA == 0) else TN
    mpb, mb = _tril_pairs(nb, "m")
    T = len(mpb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(N // tn, T, K),
        in_specs=[
            pl.BlockSpec((1, BM, BM),
                         lambda n, t, k, mpb, mb: (k, mb[t], mpb[t])),
            pl.BlockSpec((1, tn, BM),
                         lambda n, t, k, mpb, mb: (k, n, mpb[t])),
            pl.BlockSpec((1, tn, 1), lambda n, t, k, mpb, mb: (k, n, 0)),
        ],
        out_specs=pl.BlockSpec((BM, tn),
                               lambda n, t, k, mpb, mb: (mb[t], n)),
    )
    return pl.pallas_call(
        _k_da_g,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=K * M * (M + BM) * N,
            bytes_accessed=2 * (K * M * M // 2 + K * N * M) + 4 * M * N,
            transcendentals=0),
    )(jnp.asarray(mpb), jnp.asarray(mb), L16, B16, G)


def atl_sq_colsum_xla(A, L):
    """Dense reference for atl_sq_colsum: sum_mp (A^T tril L)^2."""
    return jnp.sum(jnp.square(atl_matmul_xla(A, L)), axis=-1)


@jax.custom_vjp
def atl_sq_colsum(A, L):
    """extra[k, n] = sum_mp (A^T tril(L))[k, n, mp]^2 — the conditional's
    q_sqrt variance term (ops/conditionals.py diag path) with B held in
    bf16 end-to-end and the cotangent scaling fused into the gradient
    kernels (see the section comment above).

    A [M, N] f32, L [K, M, M] f32 (lower triangle read).  Returns [K, N]
    f32.  Requires eligible(M); N padded internally.
    """
    extra, _ = _atl_sq_fwd(A, L)
    return extra


def _atl_sq_fwd(A, L):
    M, N = A.shape
    K = L.shape[0]
    BM = _bm_for(M, _BM_FWD)
    A16 = _pad_n(A.astype(jnp.bfloat16), N, 1)
    L16 = L.astype(jnp.bfloat16)
    B16 = _fwd_pallas_b16(A16, L16, M, A16.shape[1], K, BM)
    extra = jnp.sum(jnp.square(B16.astype(jnp.float32)[:, :N, :]), axis=-1)
    return extra, (A16, L16, B16)


def _atl_sq_bwd(res, gbar):
    A16, L16, B16 = res
    M = A16.shape[0]
    K, Np = B16.shape[0], B16.shape[1]
    N = gbar.shape[-1]
    G = _pad_n((2.0 * gbar).astype(jnp.float32), N, 1)[:, :, None]
    dL = _dl_pallas_g(A16, B16, G, M, Np, K, _bm_for(M, _BM_DL))
    dA = _da_pallas_g(L16, B16, G, M, Np, K, _bm_for(M, _BM_DA))[:, :N]
    return dA.astype(jnp.float32), dL


atl_sq_colsum.defvjp(lambda A, L: _atl_sq_fwd(A, L), _atl_sq_bwd)
