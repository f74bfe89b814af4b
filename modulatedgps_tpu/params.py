"""Constrained-parameter pytrees and a minimal functional module system.

This replaces gpflow's ``Parameter`` + ``positive()`` transform machinery
(used at reference MixtureGPs/likelihoods.py:19 and throughout gpflow models)
with plain JAX pytrees: parameters store an *unconstrained* array plus a
static bijector name; model classes are frozen dataclasses automatically
registered as pytrees, so ``jax.jit`` / ``jax.grad`` / ``pjit`` operate on
whole models directly.  There is no implicit global state: RNG keys, data and
models are all explicit function arguments (idiomatic JAX, unlike the
reference's global TF seed at demos/demo_tf2.py:19).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .config import default_float

__all__ = [
    "Parameter",
    "Module",
    "static_field",
    "positive",
    "positive_inverse",
    "set_trainable",
    "trainable_mask",
    "module_dataclass",
]

_SOFTPLUS_CUTOFF = 20.0


def positive(raw: jax.Array) -> jax.Array:
    """softplus forward transform == gpflow ``positive()`` default."""
    return jax.nn.softplus(raw)


def positive_inverse(value: jax.Array) -> jax.Array:
    """Numerically-stable softplus inverse: y + log1p(-exp(-y))."""
    value = jnp.asarray(value)
    safe = jnp.where(value > _SOFTPLUS_CUTOFF, 1.0, value)
    inv = safe + jnp.log(-jnp.expm1(-safe))
    return jnp.where(value > _SOFTPLUS_CUTOFF, value, inv)


def _tril(raw: jax.Array) -> jax.Array:
    return jnp.tril(raw)


_FORWARD: dict[str, Callable[[jax.Array], jax.Array]] = {
    "identity": lambda x: x,
    "positive": positive,
    "tril": _tril,
}

_INVERSE: dict[str, Callable[[jax.Array], jax.Array]] = {
    "identity": lambda x: x,
    "positive": positive_inverse,
    "tril": lambda x: jnp.tril(x),
}


@jax.tree_util.register_pytree_with_keys_class
class Parameter:
    """A trainable array in unconstrained space with a static bijector.

    ``Parameter(value, transform="positive")`` stores softplus^-1(value) and
    exposes ``.value`` == softplus(raw), mirroring gpflow Parameter semantics
    (reference MixtureGPs/likelihoods.py:19).
    """

    __slots__ = ("raw", "transform", "trainable")

    def __init__(self, value, transform: str = "identity", trainable: bool = True,
                 dtype=None, _raw: jax.Array | None = None):
        if _raw is not None:
            self.raw = _raw
        else:
            if dtype is None and hasattr(value, "dtype") \
                    and jnp.issubdtype(value.dtype, jnp.floating):
                # Preserve an explicitly-dtyped array (e.g. create(dtype=f32)
                # under an x64 config) instead of recasting to default_float.
                dtype = value.dtype
            arr = jnp.asarray(value, dtype=dtype or default_float())
            self.raw = _INVERSE[transform](arr)
        self.transform = transform
        self.trainable = bool(trainable)

    @property
    def value(self) -> jax.Array:
        return _FORWARD[self.transform](self.raw)

    @property
    def shape(self):
        return self.raw.shape

    @property
    def dtype(self):
        return self.raw.dtype

    def replace_raw(self, raw: jax.Array) -> "Parameter":
        return Parameter(None, transform=self.transform, trainable=self.trainable, _raw=raw)

    def __repr__(self):
        return (f"Parameter(shape={tuple(self.raw.shape)}, transform={self.transform!r}, "
                f"trainable={self.trainable})")

    def tree_flatten_with_keys(self):
        return ((jax.tree_util.GetAttrKey("raw"), self.raw),), (self.transform, self.trainable)

    def tree_flatten(self):
        return (self.raw,), (self.transform, self.trainable)

    @classmethod
    def tree_unflatten(cls, aux, children):
        # Store the child verbatim without __init__ validation: JAX may
        # unflatten treedefs with placeholder leaves (None, PartitionSpecs,
        # tracers) during tree-prefix broadcasting and transforms.
        transform, trainable = aux
        obj = object.__new__(cls)
        obj.raw = children[0]
        obj.transform = transform
        obj.trainable = trainable
        return obj


def static_field(**kwargs):
    """Mark a dataclass field as static (part of the pytree treedef)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def module_dataclass(cls):
    """Register a dataclass as a pytree; fields made with static_field() are aux."""
    cls = dataclasses.dataclass(frozen=True, repr=False)(cls)
    fields = dataclasses.fields(cls)
    data_names = tuple(f.name for f in fields if not f.metadata.get("static"))
    static_names = tuple(f.name for f in fields if f.metadata.get("static"))

    def flatten_with_keys(obj):
        children = tuple((jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names)
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def flatten(obj):
        return tuple(getattr(obj, n) for n in data_names), tuple(
            getattr(obj, n) for n in static_names)

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for n, v in zip(data_names, children):
            object.__setattr__(obj, n, v)
        for n, v in zip(static_names, aux):
            object.__setattr__(obj, n, v)
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)
    cls.__module_data_fields__ = data_names
    cls.__module_static_fields__ = static_names
    return cls


class Module:
    """Base marker; subclasses are auto-registered pytree dataclasses.

    Usage::

        class RBF(Module):
            variance: Parameter
            lengthscales: Parameter
            active_dims: tuple = static_field(default=None)
    """

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        module_dataclass(cls)

    def replace(self, **changes):
        return dataclasses.replace(self, **changes)

    def __repr__(self):
        parts = []
        for name in type(self).__module_data_fields__ + type(self).__module_static_fields__:
            v = getattr(self, name)
            if isinstance(v, (jax.Array,)):
                v = f"Array{tuple(v.shape)}"
            parts.append(f"{name}={v}")
        return f"{type(self).__name__}({', '.join(parts)})"


def set_trainable(param: "Parameter", trainable: bool) -> "Parameter":
    """Functional analog of gpflow ``set_trainable`` (reference
    demos/from_online/demo_multiclass_lik.py:128-129): returns a copy of the
    Parameter with the flag changed.  Because modules are frozen pytrees,
    re-attach it with ``module.replace(field=set_trainable(module.field, False))``."""
    return Parameter(None, transform=param.transform, trainable=trainable,
                     _raw=param.raw)


def trainable_mask(module) -> Any:
    """A pytree of bools matching ``module``'s leaves: True where trainable.

    Leaves inside a ``Parameter`` inherit its ``trainable`` flag; bare arrays
    are trainable.  Use to zero gradients of frozen parameters (the analog of
    gpflow ``set_trainable``, reference demos/from_online/demo_multiclass_lik.py:128).
    """

    def mask_one(x):
        if isinstance(x, Parameter):
            return jax.tree_util.tree_map(lambda _: x.trainable, x)
        return jax.tree_util.tree_map(lambda _: True, x)

    return jax.tree_util.tree_map(mask_one, module,
                                  is_leaf=lambda x: isinstance(x, Parameter))


def apply_trainable_mask(grads, mask):
    return jax.tree_util.tree_map(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


def print_summary(module, name: str = "model") -> str:
    """Parameter table, the analog of gpflow.utilities.print_summary
    (reference demos/demo_tf2.py:51)."""
    lines = [f"{'path':<60} {'transform':<10} {'trainable':<10} {'shape':<16} dtype"]

    def walk(obj, path):
        if isinstance(obj, Parameter):
            lines.append(f"{path:<60} {obj.transform:<10} {str(obj.trainable):<10} "
                         f"{str(tuple(obj.shape)):<16} {obj.dtype}")
            return
        if isinstance(obj, Module):
            for n in type(obj).__module_data_fields__:
                walk(getattr(obj, n), f"{path}.{n}")
            return
        if isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                walk(v, f"{path}[{i}]")
            return
        if isinstance(obj, jax.Array):
            lines.append(f"{path:<60} {'-':<10} {'True':<10} "
                         f"{str(tuple(obj.shape)):<16} {obj.dtype}")

    walk(module, name)
    out = "\n".join(lines)
    print(out)
    return out
