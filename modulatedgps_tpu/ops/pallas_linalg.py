"""Pallas TPU blocked Cholesky factorization and triangular solve.

The reference's O(M^3) hot ops are tf.linalg.cholesky /
tf.linalg.triangular_solve inside gpflow's base_conditional (reached from
reference MixtureGPs/models.py:141).  XLA's TPU lowering of these is
scalar-loop heavy; these kernels implement the classic right-looking
blocked factorization with MXU panels (SURVEY.md §7.3):

  for j in blocks:                 # B = 128 block size
    D_jj  = chol(A_jj)             # unblocked, 128 VPU rank-1 steps
    I_jj  = D_jj^-1                # forward substitution, reused twice
    P_ij  = A_ij I_jj^T            # TRSM panel -> one MXU matmul per tile
    A_ik -= P_ij P_kj^T            # SYRK trailing update, MXU

The whole matrix lives in VMEM (fp32: M <= 1024 fits comfortably), the
factorization runs as a single kernel instance, and the per-block diagonal
inverses are emitted as a second output so the companion TRSM kernel never
re-runs substitution on the diagonal.

For M above the VMEM budget the public wrappers fall back to XLA; a
HBM-resident multi-kernel variant is the designed extension point.

Gradients: custom_vjp with the standard Cholesky pullback (Murray 2016)
expressed in XLA ops, so the Pallas forward composes with jax.grad.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cholesky_blocked", "solve_triangular_blocked", "register"]

BLK = 128
VMEM_MAX_DIM = 1024  # fp32 matrix + scratch fit in ~16MB VMEM


def _unblocked_chol_and_inv(A, B=BLK):
    """Cholesky L of a BxB SPD tile and L^-1, via B vectorized rank-1 steps.

    Runs inside the kernel: each iteration normalizes column k and applies
    a masked rank-1 update — all (B, B) VPU ops, no scalar loops.
    """
    dtype = A.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)

    def step(k, carry):
        # All extractions are masked reductions — no dynamic gathers, which
        # Mosaic lowers poorly on the sublane dimension.  The loop body is
        # pure VPU work (sqrt + scale + rank-1); the triangular inverse is
        # computed after the loop on the MXU.
        M, L = carry
        dkk = jnp.sqrt(jnp.sum(jnp.where((rows == k) & (cols == k), M, 0.0)))
        col = jnp.sum(jnp.where(cols == k, M, 0.0), axis=1) / dkk   # [B]
        col = jnp.where(rows[:, 0] >= k, col, 0.0)
        L = L + jnp.where(cols == k, col[:, None], 0.0)
        # rank-1 update of the strict trailing submatrix
        M = M - jnp.where((rows > k) & (cols > k),
                          col[:, None] * col[None, :], 0.0)
        return M, L

    L0 = jnp.zeros_like(A)
    _, L = jax.lax.fori_loop(0, B, step, (A, L0))

    # Triangular inverse by Newton iteration X <- X (2I - L X): with
    # X0 = diag(1/l_ii) the error term is strictly-lower-triangular
    # nilpotent, so ceil(log2(B)) = 7 iterations are *exact* — 14 small
    # MXU matmuls instead of B sequential substitution dots.
    hi = jax.lax.Precision.HIGHEST
    diag = jnp.sum(jnp.where(rows == cols, L, 0.0), axis=1)
    eye2 = jnp.where(rows == cols, 2.0, 0.0)
    X = jnp.where(rows == cols, (1.0 / diag)[:, None], 0.0)
    for _ in range(7):
        LX = jax.lax.dot_general(L, X, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=hi)
        X = jax.lax.dot_general(X, eye2 - LX, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=hi)
    return L, X


def _chol_kernel(a_ref, l_ref, inv_ref, *, nblk):
    """Single-program blocked Cholesky; whole matrix in VMEM."""
    hi = jax.lax.Precision.HIGHEST

    # Work in l_ref as the mutable copy of A.
    l_ref[:] = a_ref[:]

    def block(j, _):
        jb = j * BLK
        Ajj = l_ref[pl.ds(jb, BLK), pl.ds(jb, BLK)]
        Ljj, Ijj = _unblocked_chol_and_inv(Ajj)
        l_ref[pl.ds(jb, BLK), pl.ds(jb, BLK)] = Ljj
        inv_ref[pl.ds(j, 1)] = Ijj[None]

        def panel(i, _):
            ib = i * BLK

            @pl.when(i > j)
            def _():
                Aij = l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)]
                Pij = jax.lax.dot_general(
                    Aij, Ijj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hi)
                l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)] = Pij
            return 0

        jax.lax.fori_loop(0, nblk, panel, 0)

        def syrk_row(i, _):
            ib = i * BLK

            @pl.when(i > j)
            def _():
                Pij = l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)]

                def syrk_col(k, _):
                    kb = k * BLK

                    @pl.when((k > j) & (k <= i))
                    def _():
                        Pkj = l_ref[pl.ds(kb, BLK), pl.ds(jb, BLK)]
                        Aik = l_ref[pl.ds(ib, BLK), pl.ds(kb, BLK)]
                        upd = jax.lax.dot_general(
                            Pij, Pkj, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=hi)
                        l_ref[pl.ds(ib, BLK), pl.ds(kb, BLK)] = Aik - upd
                    return 0

                jax.lax.fori_loop(0, nblk, syrk_col, 0)
            return 0

        jax.lax.fori_loop(0, nblk, syrk_row, 0)
        return 0

    jax.lax.fori_loop(0, nblk, block, 0)

    # Zero the strict upper triangle block-wise.
    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    def zero_upper(j, _):
        jb = j * BLK

        def inner(i, _):
            ib = i * BLK

            @pl.when(i < j)
            def _():
                l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)] = jnp.zeros(
                    (BLK, BLK), l_ref.dtype)

            @pl.when(i == j)
            def _():
                blkv = l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)]
                l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)] = jnp.where(
                    rows >= cols, blkv, 0.0)
            return 0

        jax.lax.fori_loop(0, nblk, inner, 0)
        return 0

    jax.lax.fori_loop(0, nblk, zero_upper, 0)


def _chol_kernel_large(a_ref, l_ref, inv_ref, sem, *, nblk):
    """Dynamic-bound variant of _chol_kernel for large M (r5 experiment).

    Same right-looking factorization, but the panel/SYRK loops use
    dynamic fori bounds (fori_loop(j+1, ...)) instead of full-range loops
    with @pl.when masks: at M=4096 the masked form executes nblk^3 = 32k
    loop iterations where only nblk^3/6 do work.  The input is aliased
    onto the L output (input_output_aliases) so only one [M, M] VMEM
    buffer lives — 67 MB at M=4096 fits v5e's 128 MB VMEM where the
    unaliased form (134 MB) cannot.
    """
    hi = jax.lax.Precision.HIGHEST
    # The input stays in HBM (memory_space=ANY): one whole-matrix DMA into
    # the L output's VMEM buffer, so only ONE [M, M] VMEM allocation lives
    # (the aliased two-buffer form measured 130.9 MB — over v5e's 128).
    cp = pltpu.make_async_copy(a_ref, l_ref, sem)
    cp.start()
    cp.wait()

    def block(j, _):
        jb = j * BLK
        Ajj = l_ref[pl.ds(jb, BLK), pl.ds(jb, BLK)]
        Ljj, Ijj = _unblocked_chol_and_inv(Ajj)
        l_ref[pl.ds(jb, BLK), pl.ds(jb, BLK)] = Ljj
        inv_ref[pl.ds(j, 1)] = Ijj[None]

        def panel(i, _):
            ib = i * BLK
            Aij = l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)]
            Pij = jax.lax.dot_general(
                Aij, Ijj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)] = Pij
            return 0

        jax.lax.fori_loop(j + 1, nblk, panel, 0)

        def syrk_row(i, _):
            ib = i * BLK
            Pij = l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)]

            def syrk_col(k, _):
                kb = k * BLK
                Pkj = l_ref[pl.ds(kb, BLK), pl.ds(jb, BLK)]
                Aik = l_ref[pl.ds(ib, BLK), pl.ds(kb, BLK)]
                upd = jax.lax.dot_general(
                    Pij, Pkj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hi)
                l_ref[pl.ds(ib, BLK), pl.ds(kb, BLK)] = Aik - upd
                return 0

            jax.lax.fori_loop(j + 1, i + 1, syrk_col, 0)
            return 0

        jax.lax.fori_loop(j + 1, nblk, syrk_row, 0)
        return 0

    jax.lax.fori_loop(0, nblk, block, 0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    def zero_upper(j, _):
        jb = j * BLK
        blkv = l_ref[pl.ds(jb, BLK), pl.ds(jb, BLK)]
        l_ref[pl.ds(jb, BLK), pl.ds(jb, BLK)] = jnp.where(
            rows >= cols, blkv, 0.0)

        def inner(i, _):
            ib = i * BLK
            l_ref[pl.ds(ib, BLK), pl.ds(jb, BLK)] = jnp.zeros(
                (BLK, BLK), l_ref.dtype)
            return 0

        jax.lax.fori_loop(0, j, inner, 0)
        return 0

    jax.lax.fori_loop(0, nblk, zero_upper, 0)


def _chol_pallas_large(A, *, interpret=False):
    """Large-M single-kernel Cholesky: HBM input DMA'd into a single
    VMEM-resident working buffer, dynamic loop bounds.  Returns
    (L, diag-block inverses).

    MEASURED NEGATIVE at M=4096 on v5e (r5): 3.40 ms vs XLA's 2.61
    standalone (0.77x, on-chip L rel err 2.3e-5 vs f64) — the serial
    in-kernel diagonal factorizations + single-threaded block loop lose
    to XLA's pipelined factorization even with dynamic loop bounds and a
    single VMEM-resident buffer.  NOT routed (cholesky() keeps the XLA
    forward + Pallas-assisted pullback); kept as the working existence
    proof for SURVEY §7.3 and as the base for a future multi-kernel
    pipelined variant.  Mosaic rejects precision=HIGH in-kernel, so the
    SYRK updates run HIGHEST (6-pass); an explicit 3-pass split would at
    best reach parity with XLA at worse accuracy.

    The M=4096 VMEM math: input stays in HBM (memory_space=ANY) and is
    DMA'd into the L output buffer — 67 MB resident vs the 130.9 MB
    (over-capacity) of separate in/out staging copies."""
    Mp = A.shape[-1]
    nblk = Mp // BLK
    kernel = functools.partial(_chol_kernel_large, nblk=nblk)
    L, Inv = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Mp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((nblk, BLK, BLK), jnp.float32)),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=Mp ** 3 // 3, bytes_accessed=8 * Mp * Mp,
            transcendentals=Mp),
        interpret=interpret,
    )(A.astype(jnp.float32))
    return L, Inv


def _chol_pallas_raw(A, *, interpret=False):
    """A [Mp, Mp] (Mp % BLK == 0, SPD) -> (L, diag-block inverses [nblk, BLK, BLK])."""
    Mp = A.shape[-1]
    nblk = Mp // BLK
    kernel = functools.partial(_chol_kernel, nblk=nblk)
    L, Inv = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((Mp, Mp), jnp.float32),
                   jax.ShapeDtypeStruct((nblk, BLK, BLK), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=Mp ** 3 // 3, bytes_accessed=8 * Mp * Mp,
            transcendentals=Mp),
        interpret=interpret,
    )(A.astype(jnp.float32))
    return L, Inv


# ------------------------------------------------------------------ TRSM

def _trsm_kernel(l_ref, inv_ref, b_ref, x_ref, *, nblk):
    """Solve L X = B for one [Mp, TN] tile of B; L and inverses in VMEM."""
    hi = jax.lax.Precision.HIGHEST
    x_ref[:] = b_ref[:]

    def row(k, _):
        kb = k * BLK
        acc = x_ref[pl.ds(kb, BLK), :]

        def sub(j, acc):
            jb = j * BLK
            Lkj = l_ref[pl.ds(kb, BLK), pl.ds(jb, BLK)]
            Xj = x_ref[pl.ds(jb, BLK), :]
            prod = jax.lax.dot_general(
                Lkj, Xj, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)
            return acc - jnp.where(j < k, 1.0, 0.0) * prod

        acc = jax.lax.fori_loop(0, nblk, sub, acc)
        Ikk = inv_ref[k]
        x_ref[pl.ds(kb, BLK), :] = jax.lax.dot_general(
            Ikk, acc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)
        return 0

    jax.lax.fori_loop(0, nblk, row, 0)


def _trsm_t_kernel(l_ref, inv_ref, b_ref, x_ref, *, nblk):
    """Solve L^T X = B (backward substitution) for one [Mp, TN] tile of B.

    Mirror of _trsm_kernel with the block loop reversed: for k from the
    last block row down, acc = B_k - sum_{j>k} L_jk^T X_j, then
    X_k = L_kk^-T acc = Ikk^T acc.  Completes the reference's non-white
    conditional second solve (ops/conditionals.py:57-58) on the Pallas path.
    """
    hi = jax.lax.Precision.HIGHEST
    x_ref[:] = b_ref[:]

    def row(i, _):
        k = nblk - 1 - i
        kb = k * BLK
        acc = x_ref[pl.ds(kb, BLK), :]

        def sub(j, acc):
            jb = j * BLK
            Ljk = l_ref[pl.ds(jb, BLK), pl.ds(kb, BLK)]    # rows j, cols k
            Xj = x_ref[pl.ds(jb, BLK), :]
            prod = jax.lax.dot_general(
                Ljk, Xj, (((0,), (0,)), ((), ())),         # Ljk^T Xj
                preferred_element_type=jnp.float32, precision=hi)
            return acc - jnp.where(j > k, 1.0, 0.0) * prod

        acc = jax.lax.fori_loop(0, nblk, sub, acc)
        Ikk = inv_ref[k]
        x_ref[pl.ds(kb, BLK), :] = jax.lax.dot_general(
            Ikk, acc, (((0,), (0,)), ((), ())),            # Ikk^T acc
            preferred_element_type=jnp.float32, precision=hi)
        return 0

    jax.lax.fori_loop(0, nblk, row, 0)


def _trsm_pallas_raw(L, Inv, B, *, tile_n=512, trans=False, interpret=False):
    """L [Mp, Mp] lower, Inv [nblk, BLK, BLK], B [Mp, Np] -> op(L)^-1 B
    with op = transpose when ``trans``."""
    Mp, Np = B.shape
    nblk = Mp // BLK
    kernel = functools.partial(_trsm_t_kernel if trans else _trsm_kernel,
                               nblk=nblk)
    grid = (Np // tile_n,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, Mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, BLK, BLK), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, tile_n), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=Mp * Mp * Np, bytes_accessed=4 * (Mp * Mp + 2 * Mp * Np),
            transcendentals=0),
        interpret=interpret,
    )(L, Inv, B.astype(jnp.float32))


# --------------------------------------------------------- public wrappers

def _pad_spd(A, Mp):
    """Pad an SPD matrix to [Mp, Mp] keeping it SPD (identity tail)."""
    M = A.shape[-1]
    if M == Mp:
        return A
    out = jnp.zeros((Mp, Mp), A.dtype)
    out = out.at[:M, :M].set(A)
    idx = jnp.arange(M, Mp)
    return out.at[idx, idx].set(1.0)


def _chol_fwd_impl(A, interpret):
    dtype = A.dtype
    M = A.shape[-1]
    Mp = (M + BLK - 1) // BLK * BLK
    L, Inv = _chol_pallas_raw(_pad_spd(A.astype(jnp.float32), Mp),
                              interpret=interpret)
    return L[:M, :M].astype(dtype), (L, Inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky_blocked(A, interpret=False):
    """Lower Cholesky factor via the Pallas blocked kernel (fp32)."""
    return _chol_fwd_impl(A, interpret)[0]


def _chol_vjp_fwd(A, interpret):
    L = cholesky_blocked(A, interpret)
    return L, L


def _chol_vjp_bwd(interpret, L, Lbar):
    # Standard Cholesky pullback: Abar = 0.5 L^-T phi(L^T Lbar + ...) L^-1
    # with phi = tril with halved diagonal (Murray 2016, eq. 8-9).
    dtype = L.dtype
    M = L.shape[-1]
    P = jnp.matmul(L.T, Lbar, precision=jax.lax.Precision.HIGHEST)
    phi = jnp.tril(P) - 0.5 * jnp.diag(jnp.diagonal(P))
    eye = jnp.eye(M, dtype=dtype)
    Linv = jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    Abar = Linv.T @ phi @ Linv
    Abar = 0.5 * (Abar + Abar.T)
    return (Abar,)


cholesky_blocked.defvjp(_chol_vjp_fwd, _chol_vjp_bwd)


def _trsm_fwd_impl(L, B, lower, trans, interpret):
    dtype = B.dtype
    if not lower:
        # Upper solves reduce to lower ones on the transposed factor:
        # U x = b  <=>  (U^T)^T x = b;  U^T x = b  <=>  (U^T) x = b.
        return _trsm_fwd_impl(jnp.swapaxes(L, -1, -2), B, True, not trans,
                              interpret)
    M = L.shape[-1]
    N = B.shape[-1]
    Mp = (M + BLK - 1) // BLK * BLK
    TN = 512
    Np = (N + TN - 1) // TN * TN
    Lp = _pad_spd(L.astype(jnp.float32), Mp)  # identity tail keeps solves exact
    _, Inv = _chol_diag_inverses(Lp)
    Bp = jnp.zeros((Mp, Np), jnp.float32).at[:M, :N].set(B.astype(jnp.float32))
    X = _trsm_pallas_raw(Lp, Inv, Bp, tile_n=TN, trans=trans,
                         interpret=interpret)
    return X[:M, :N].astype(dtype)


def _chol_diag_inverses(Lp):
    """Diagonal-block inverses of an existing lower-tri Lp (for TRSM when L
    didn't come from cholesky_blocked)."""
    Mp = Lp.shape[-1]
    nblk = Mp // BLK
    blocks = Lp.reshape(nblk, BLK, nblk, BLK)
    diag = jnp.stack([blocks[i, :, i, :] for i in range(nblk)])
    eye = jnp.eye(BLK, dtype=Lp.dtype)
    inv = jax.vmap(lambda Lb: jax.lax.linalg.triangular_solve(
        Lb, eye, left_side=True, lower=True))(diag)
    return None, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def solve_triangular_blocked(L, B, lower=True, trans=False, interpret=False):
    """X = op(L)^-1 B via the Pallas blocked TRSM; op(L) = L^T when
    ``trans``, upper factors handled by solving on the transpose."""
    return _trsm_fwd_impl(L, B, lower, trans, interpret)


def _trsm_vjp_fwd(L, B, lower, trans, interpret):
    X = solve_triangular_blocked(L, B, lower, trans, interpret)
    return X, (L, X)


def _trsm_vjp_bwd(lower, trans, interpret, res, Xbar):
    L, X = res
    # X = op(L)^-1 B:  Bbar = op(L)^-T Xbar;
    # trans=False: Lbar = -tri(Bbar X^T);  trans=True: Lbar = -tri(X Bbar^T).
    hi = jax.lax.Precision.HIGHEST
    Bbar = jax.lax.linalg.triangular_solve(L, Xbar, left_side=True,
                                           lower=lower, transpose_a=not trans)
    G = (jnp.matmul(X, Bbar.T, precision=hi) if trans
         else jnp.matmul(Bbar, X.T, precision=hi))
    Lbar = -(jnp.tril(G) if lower else jnp.triu(G))
    return Lbar, Bbar


solve_triangular_blocked.defvjp(_trsm_vjp_fwd, _trsm_vjp_bwd)


# ----------------------------------------------------- large-M (HBM) path

PANEL = 512


def _chol_large_impl(A, interpret):
    """Blocked right-looking Cholesky for M beyond the VMEM budget.

    Host-level Python loop over static panels (shapes are static per step,
    so XLA compiles each trailing-update matmul once): the PANEL x PANEL
    diagonal factor runs in the VMEM Pallas kernel, the TRSM panel uses the
    Pallas blocked solve, and the SYRK trailing update is a plain XLA MXU
    matmul — each piece at its best engine.
    """
    dtype = A.dtype
    M = A.shape[-1]
    B = PANEL
    Mp = (M + B - 1) // B * B
    A = _pad_spd(A.astype(jnp.float32), Mp)
    nb = Mp // B
    hi = jax.lax.Precision.HIGHEST

    L = jnp.zeros_like(A)
    for j in range(nb):
        lo = j * B
        hi_ = lo + B
        Ajj = A[lo:hi_, lo:hi_]
        Ljj = cholesky_blocked(Ajj, interpret)
        L = L.at[lo:hi_, lo:hi_].set(Ljj)
        if hi_ < Mp:
            rest = A[hi_:, lo:hi_]                       # [R, B]
            # P = rest @ Ljj^-T  ==  (Ljj^-1 rest^T)^T
            P = solve_triangular_blocked(Ljj, rest.T, True, False,
                                         interpret).T
            L = L.at[hi_:, lo:hi_].set(P)
            A = A.at[hi_:, hi_:].add(-jnp.matmul(P, P.T, precision=hi))
    return L[:M, :M].astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky_large(A, interpret=False):
    """Lower Cholesky for large M (HBM-resident trailing matrix)."""
    return _chol_large_impl(A, interpret)


def _chol_large_fwd(A, interpret):
    L = cholesky_large(A, interpret)
    return L, L


cholesky_large.defvjp(_chol_large_fwd, _chol_vjp_bwd)


def _trsm_large_impl(L, Bmat, trans, interpret):
    """op(L)^-1 B for large M: blocked substitution over static panels
    (forward when op=I, backward when op=transpose)."""
    dtype = Bmat.dtype
    M = L.shape[-1]
    B = PANEL
    if M % B != 0:
        # ragged large sizes: pad L with identity tail
        Mp = (M + B - 1) // B * B
        L = _pad_spd(L.astype(jnp.float32), Mp)
        Bmat = jnp.pad(Bmat.astype(jnp.float32), ((0, Mp - M), (0, 0)))
        return _trsm_large_impl(L, Bmat, trans, interpret)[:M].astype(dtype)
    nb = M // B
    hi = jax.lax.Precision.HIGHEST
    X = jnp.zeros_like(Bmat, dtype=jnp.float32)
    Bmat = Bmat.astype(jnp.float32)
    Lf = L.astype(jnp.float32)
    order = range(nb) if not trans else reversed(range(nb))
    for k in order:
        lo, hi_ = k * B, (k + 1) * B
        rhs = Bmat[lo:hi_]
        if not trans and k > 0:
            rhs = rhs - jnp.matmul(Lf[lo:hi_, :lo], X[:lo], precision=hi)
        if trans and hi_ < M:
            rhs = rhs - jnp.matmul(Lf[hi_:, lo:hi_].T, X[hi_:], precision=hi)
        Xk = solve_triangular_blocked(Lf[lo:hi_, lo:hi_], rhs, True, trans,
                                      interpret)
        X = X.at[lo:hi_].set(Xk)
    return X.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def solve_triangular_large(L, B, lower=True, trans=False, interpret=False):
    if not lower:
        return _trsm_large_impl(jnp.swapaxes(L, -1, -2), B, not trans,
                                interpret)
    return _trsm_large_impl(L, B, trans, interpret)


def _trsm_large_fwd(L, B, lower, trans, interpret):
    X = solve_triangular_large(L, B, lower, trans, interpret)
    return X, (L, X)


solve_triangular_large.defvjp(_trsm_large_fwd, _trsm_vjp_bwd)


def register() -> None:
    """Install as the 'pallas' linalg backend (ops/linalg.py)."""
    from . import linalg

    def chol(K):
        if K.ndim == 2 and K.shape[-1] <= VMEM_MAX_DIM:
            return cholesky_blocked(K)
        if K.ndim == 2:
            return cholesky_large(K)
        return jnp.linalg.cholesky(K)

    def trsm(L, B, *, lower=True, trans=False):
        if L.ndim == 2 and B.ndim == 2:
            if L.shape[-1] <= VMEM_MAX_DIM:
                return solve_triangular_blocked(L, B, lower, trans)
            return solve_triangular_large(L, B, lower, trans)
        return linalg._xla_solve_triangular(L, B, lower=lower, trans=trans)

    linalg.register_backend("pallas", {"cholesky": chol,
                                       "solve_triangular": trsm})
