"""Adam with a tril-blocked fused Pallas update for large [K, M, M] leaves.

The reference trains with a stock Adam over dense TF variables (reference
utils/training_utils.py:4-28).  Here the dominant optimizer traffic is the
two layers' q_sqrt leaves ([K, M, M] f32 = 537 MB each at the north-star
shape), whose strictly-upper halves are structural zeros (Parameter "tril"
transform; gradients are exactly zero there, so Adam's moments stay zero
and the upper entries never move).  optax's adam walks the DENSE arrays
four-reads/three-writes per step — and materializes the ``updates`` tree
as a fifth full array — so half of ~4.5 GB/step of optimizer HBM traffic
is spent on zeros.

``FusedAdam`` keeps optax's exact arithmetic (scale_by_adam with bias
correction, then scale(-lr)) and optax-compatible state (init delegates to
``optax.adam``; checkpoints interchange), but applies the update for
eligible leaves in ONE Pallas kernel over the lower-triangular blocks
only (same static tril-enumerated grid as ops/pallas_tril.py):

    m' = b1 m + (1-b1) g          p' = p - lr * (m'/(1-b1^t))
    v' = b2 v + (1-b2) g^2                 / (sqrt(v'/(1-b2^t)) + eps)

reading p, g, m, v and writing p', m', v' block-by-block — half the bytes
of the dense walk, no ``updates`` materialization, no separate
apply_updates pass.  Ineligible leaves take the identical jnp math inline.

Eligibility mirrors the tril-kernel routing: TPU, float32, rank-3 square
trailing dims, M >= _FUSED_MIN_DIM, M divisible into 256/512 blocks.
``make_train_step`` detects the ``update_and_apply`` method and uses it in
place of the optax update/apply pair.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_tril import _block_m, _tril_pairs

__all__ = ["FusedAdam", "fused_adam"]

_FUSED_MIN_DIM = 2048


class _Out:
    """Opaque (non-pytree) per-leaf result triple.

    ``update_and_apply`` maps every param leaf to its (p', m', v') triple and
    then splits the mapped tree back into three trees.  A bare tuple is NOT a
    safe carrier: tuples are legitimate pytree *container* nodes in models
    (e.g. Sum/Product kernels hold ``kernels: tuple`` as a data field), so an
    ``is_leaf=isinstance(x, tuple)`` split would stop at the container and
    silently hand back the first sub-kernel subtree as the "param".  A plain
    class instance is a pytree leaf by construction, so the split cannot be
    confused by container structure.
    """
    __slots__ = ("p", "m", "v")

    def __init__(self, p, m, v):
        self.p, self.m, self.v = p, m, v
# None = auto (TPU only); True forces (tests use interpret via
# monkeypatching pl.pallas_call in this module).
_FUSED_DISPATCH: bool | None = None


def set_fused_dispatch(mode: bool | None) -> None:
    global _FUSED_DISPATCH
    _FUSED_DISPATCH = mode


def _eligible(leaf) -> bool:
    if _FUSED_DISPATCH is False:
        return False
    if not (hasattr(leaf, "dtype") and leaf.dtype == jnp.float32):
        return False
    if leaf.ndim != 3 or leaf.shape[-1] != leaf.shape[-2]:
        return False
    M = leaf.shape[-1]
    if M < _FUSED_MIN_DIM or _block_m(M) == 0:
        return False
    if _FUSED_DISPATCH is None and jax.default_backend() != "tpu":
        return False
    return True


def _k_adam(b1, b2, eps, lr, corr_ref, mpb_ref, mb_ref,
            p_ref, g_ref, m_ref, v_ref, po_ref, mo_ref, vo_ref):
    c1, c2 = corr_ref[0], corr_ref[1]
    g = g_ref[...]
    m2 = b1 * m_ref[...] + (1.0 - b1) * g
    v2 = b2 * v_ref[...] + (1.0 - b2) * g * g
    mo_ref[...] = m2
    vo_ref[...] = v2
    po_ref[...] = p_ref[...] - lr * (m2 * c1) / (jnp.sqrt(v2 * c2) + eps)


def _pallas_adam(p, g, m, v, corr, *, b1, b2, eps, lr):
    K, M = p.shape[0], p.shape[-1]
    BM = _block_m(M)
    nb = M // BM
    mpb, mb = _tril_pairs(nb, "mp")
    T = len(mpb)
    blk = lambda k, t, corr, mpb, mb: (k, mb[t], mpb[t])
    spec = pl.BlockSpec((1, BM, BM), blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K, T),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
    )
    tril_bytes = 4 * K * M * M // 2
    return pl.pallas_call(
        functools.partial(_k_adam, b1, b2, eps, lr),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(p.shape, p.dtype),) * 3,
        # The grid only visits lower-triangular blocks; aliasing p/m/v onto
        # the outputs makes the UNVISITED strictly-upper blocks keep their
        # input values (they are structural zeros that must survive
        # bit-exactly — without aliasing they would be uninitialized
        # garbage on-chip).  Indices span all flattened inputs including
        # the 3 scalar-prefetch operands.
        input_output_aliases={3: 0, 5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=10 * K * M * M // 2,
            bytes_accessed=7 * tril_bytes,
            transcendentals=K * M * M // 2),
    )(corr, jnp.asarray(mpb), jnp.asarray(mb), p, g, m, v)


class FusedAdam:
    """optax.adam drop-in with a fused tril update for large leaves.

    ``lr``/``b1``/``b2``/``eps`` must be Python floats (they compile into
    the kernel); schedules are not supported — use plain optax.adam for
    those.
    """

    def __init__(self, lr: float, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = (
            float(lr), float(b1), float(b2), float(eps))
        self._opt = optax.adam(lr, b1=b1, b2=b2, eps=eps)

    def init(self, params):
        return self._opt.init(params)

    def update(self, grads, state, params=None):
        # Generic optax contract (no fusion) — keeps FusedAdam usable
        # anywhere a GradientTransformation is expected.
        return self._opt.update(grads, state, params)

    def update_and_apply(self, grads, state, params):
        """One Adam step: returns (new_params, new_state)."""
        adam_state = state[0]
        count_inc = optax.safe_int32_increment(adam_state.count)
        t = count_inc.astype(jnp.float32)
        corr = jnp.stack([1.0 / (1.0 - self.b1 ** t),
                          1.0 / (1.0 - self.b2 ** t)])

        def leaf(p, g, m, v):
            if not (hasattr(g, "dtype")
                    and jnp.issubdtype(g.dtype, jnp.floating)):
                return _Out(p, m, v)
            if _eligible(p):
                return _Out(*_pallas_adam(p, g, m, v, corr, b1=self.b1,
                                          b2=self.b2, eps=self.eps,
                                          lr=self.lr))
            m2 = self.b1 * m + (1.0 - self.b1) * g
            v2 = self.b2 * v + (1.0 - self.b2) * jnp.square(g)
            td = count_inc.astype(p.dtype)
            c1 = 1.0 / (1.0 - self.b1 ** td)
            c2 = 1.0 / (1.0 - self.b2 ** td)
            p2 = p - self.lr * (m2 * c1) / (jnp.sqrt(v2 * c2) + self.eps)
            return _Out(p2, m2, v2)

        fused = jax.tree.map(leaf, params, grads, adam_state.mu,
                             adam_state.nu)
        is_t = lambda x: isinstance(x, _Out)
        new_p = jax.tree.map(lambda x: x.p, fused, is_leaf=is_t)
        new_m = jax.tree.map(lambda x: x.m, fused, is_leaf=is_t)
        new_v = jax.tree.map(lambda x: x.v, fused, is_leaf=is_t)
        new_state = (adam_state._replace(count=count_inc, mu=new_m,
                                         nu=new_v),) + tuple(state[1:])
        return new_p, new_state


def fused_adam(lr: float, **kw) -> FusedAdam:
    return FusedAdam(lr, **kw)
