"""Dense linear-algebra primitives with a switchable backend.

The reference delegates these to TF's C++/CUDA kernels through gpflow
(tf.linalg.cholesky / tf.linalg.triangular_solve inside base_conditional,
reached from reference MixtureGPs/models.py:141).  Here the default backend
is XLA's native TPU ops; a Pallas blocked implementation
(ops/pallas_linalg.py) registers itself for the large-M hot path.  Both
share this API so correctness tests always have an XLA oracle.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "cholesky",
    "solve_triangular",
    "triangular_inverse",
    "solve_lower",
    "add_jitter",
    "set_backend",
    "get_backend",
    "set_fast_solves",
]

# When True, L^-1 B with many RHS is computed as (L^-1) @ B — one small
# M x M substitution, then a full-speed MXU matmul — instead of XLA's
# sequential triangular_solve over every RHS column (~20x slower on TPU for
# the conditional's [M, N] panels).  Default on for TPU at runtime (see
# set_fast_solves); off for float64 CPU parity tests.
_FAST_SOLVES = False

_BACKENDS: dict[str, dict[str, Callable]] = {
    "xla": {
        "cholesky": jnp.linalg.cholesky,
    }
}
_ACTIVE = "xla"
# Below this matrix size, always use XLA (Pallas launch overhead dominates).
_PALLAS_MIN_DIM = 256


def set_backend(name: str) -> None:
    global _ACTIVE
    if name not in _BACKENDS:
        raise ValueError(f"unknown linalg backend {name!r}; have {list(_BACKENDS)}")
    _ACTIVE = name


def get_backend() -> str:
    return _ACTIVE


def register_backend(name: str, impl: dict[str, Callable]) -> None:
    _BACKENDS[name] = impl


def set_fast_solves(enabled: bool) -> None:
    global _FAST_SOLVES
    _FAST_SOLVES = bool(enabled)


def get_fast_solves() -> bool:
    return _FAST_SOLVES


def triangular_inverse(L: jax.Array, *, lower: bool = True) -> jax.Array:
    """Explicit inverse of a (batched) triangular matrix."""
    m = L.shape[-1]
    eye = jnp.eye(m, dtype=L.dtype)
    if L.ndim > 2:
        eye = jnp.broadcast_to(eye, L.shape)
    return jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=lower)


def solve_lower(L: jax.Array, B: jax.Array, *, trans: bool = False) -> jax.Array:
    """L^-1 B (or L^-T B) choosing substitution vs inverse+matmul by config.

    The inverse+matmul form trades a little backward stability for MXU
    throughput; with the jitter floor (config.default_jitter) cond(L) is
    bounded and fp32 error stays at the 1e-5 level (tested).
    """
    if _FAST_SOLVES:
        Linv = triangular_inverse(L)
        op = jnp.swapaxes(Linv, -1, -2) if trans else Linv
        return jnp.matmul(op, B, preferred_element_type=B.dtype)
    return solve_triangular(L, B, lower=True, trans=trans)


def add_jitter(K: jax.Array, jitter: float) -> jax.Array:
    m = K.shape[-1]
    return K + jitter * jnp.eye(m, dtype=K.dtype)


def cholesky(K: jax.Array) -> jax.Array:
    """Lower Cholesky factor of a (batched) SPD matrix."""
    impl = _BACKENDS[_ACTIVE]
    if _ACTIVE != "xla" and K.shape[-1] >= _PALLAS_MIN_DIM and "cholesky" in impl:
        return impl["cholesky"](K)
    return jnp.linalg.cholesky(K)


def solve_triangular(L: jax.Array, B: jax.Array, *, lower: bool = True,
                     trans: bool = False) -> jax.Array:
    """Solve op(L) X = B with op triangular; batched over leading dims.

    ``trans=True`` solves L^T X = B.  L may have fewer batch dims than B
    (it is broadcast), which is the common case here: one shared [M, M]
    Cholesky factor against per-latent right-hand sides.
    """
    impl = _BACKENDS[_ACTIVE]
    if (_ACTIVE != "xla" and L.shape[-1] >= _PALLAS_MIN_DIM
            and "solve_triangular" in impl):
        return impl["solve_triangular"](L, B, lower=lower, trans=trans)
    return _xla_solve_triangular(L, B, lower=lower, trans=trans)


def _xla_solve_triangular(L, B, *, lower, trans):
    # Broadcast batch dims of L and B.
    batch = jnp.broadcast_shapes(L.shape[:-2], B.shape[:-2])
    Lb = jnp.broadcast_to(L, batch + L.shape[-2:])
    Bb = jnp.broadcast_to(B, batch + B.shape[-2:])
    return jax.lax.linalg.triangular_solve(
        Lb, Bb, left_side=True, lower=lower, transpose_a=trans)
