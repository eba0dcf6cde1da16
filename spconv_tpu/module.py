"""Minimal pytree-native module system.

spconv's reference implementation builds on ``torch.nn.Module`` (mutable
parameter containers).  On TPU/JAX the idiomatic equivalent is a *pytree
module*: the module object itself is a JAX pytree whose array-valued fields
are leaves (parameters / buffers) and whose remaining fields are static
configuration baked into the jit cache key.  This gives a torch-like user
API (``m = SubMConv3d(...); y = m(x)``) while remaining fully compatible
with ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` / ``shard_map``.

Reference parity: replaces the role of ``torch.nn.Module`` +
``spconv/pytorch/modules.py:SparseModule`` (see SURVEY.md §2.1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Module",
    "Static",
    "static_field",
    "is_array",
    "partition",
    "combine",
    "filter_grad",
    "filter_value_and_grad",
    "tree_parameters",
]


def is_array(x: Any) -> bool:
    return isinstance(x, (jax.Array, np.ndarray))


class Static:
    """Wrapper marking a value as static (non-leaf) even if array-like."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __repr__(self):
        return f"Static({self.value!r})"

    def __eq__(self, other):
        if not isinstance(other, Static):
            return NotImplemented
        a, b = self.value, other.value
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return (
                isinstance(a, np.ndarray)
                and isinstance(b, np.ndarray)
                and a.shape == b.shape
                and a.dtype == b.dtype
                and bool((a == b).all())
            )
        return a == b

    def __hash__(self):
        v = self.value
        if isinstance(v, np.ndarray):
            return hash((v.shape, str(v.dtype), v.tobytes()))
        try:
            return hash(v)
        except TypeError:
            return hash(repr(v))


def static_field(value):
    return Static(value)


def _is_leafable(v: Any) -> bool:
    """True if the value participates in the dynamic (traced) part."""
    if isinstance(v, Static):
        return False
    if is_array(v) or isinstance(v, Module):
        return True
    if isinstance(v, (list, tuple)):
        return any(_is_leafable(x) for x in v)
    if isinstance(v, dict):
        return any(_is_leafable(x) for x in v.values())
    return False


class _ModuleMeta(type):
    def __call__(cls, *args, **kwargs):
        obj = super().__call__(*args, **kwargs)
        object.__setattr__(obj, "_mod_initialized", True)
        return obj


class Module(metaclass=_ModuleMeta):
    """Pytree module: jnp/np array fields & sub-Modules are leaves,
    everything else is static metadata (part of the treedef)."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            flatten_with_keys=_flatten_module_with_keys,
            unflatten_func=lambda aux, children: _unflatten_module(cls, aux, children),
            flatten_func=_flatten_module,
        )

    # --- convenience -----------------------------------------------------
    def replace(self, **updates) -> "Module":
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        for k, v in updates.items():
            if k not in self.__dict__:
                raise AttributeError(f"{type(self).__name__} has no field {k!r}")
            new.__dict__[k] = v
        return new

    def __repr__(self):
        name = type(self).__name__
        parts = []
        for k, v in self.__dict__.items():
            if k.startswith("_"):
                continue
            if is_array(v):
                parts.append(f"{k}={type(v).__name__}{tuple(v.shape)}")
            else:
                parts.append(f"{k}={v!r}")
            if len(parts) > 6:
                parts.append("...")
                break
        return f"{name}({', '.join(parts)})"


def _split_fields(mod: Module):
    dyn_names: List[str] = []
    dyn_vals: List[Any] = []
    static_items: List[Tuple[str, Any]] = []
    for k, v in mod.__dict__.items():
        if k == "_mod_initialized":
            continue
        if _is_leafable(v):
            dyn_names.append(k)
            dyn_vals.append(v)
        else:
            static_items.append((k, v if isinstance(v, Static) else _hashable(v)))
    return dyn_names, dyn_vals, static_items


def _hashable(v: Any) -> Any:
    """Coerce config values into hashable form for the treedef."""
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, tuple):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    if isinstance(v, np.ndarray):
        return Static(v)
    return v


def _flatten_module(mod: Module):
    dyn_names, dyn_vals, static_items = _split_fields(mod)
    aux = (tuple(dyn_names), tuple(static_items))
    return dyn_vals, aux


def _flatten_module_with_keys(mod: Module):
    dyn_names, dyn_vals, static_items = _split_fields(mod)
    keyed = [(jax.tree_util.GetAttrKey(n), v) for n, v in zip(dyn_names, dyn_vals)]
    aux = (tuple(dyn_names), tuple(static_items))
    return keyed, aux


def _unflatten_module(cls, aux, children):
    dyn_names, static_items = aux
    obj = object.__new__(cls)
    for k, v in static_items:
        obj.__dict__[k] = v
    for k, v in zip(dyn_names, children):
        obj.__dict__[k] = v
    obj.__dict__["_mod_initialized"] = True
    return obj


# --- filtering utilities (equinox-style partition/combine) ---------------

_SENTINEL = object()


def partition(tree, filter_fn: Callable[[Any], bool] = is_array):
    """Split a pytree into (dynamic, static) halves by a leaf predicate."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    dyn = [x if filter_fn(x) else None for x in leaves]
    sta = [None if filter_fn(x) else x for x in leaves]
    return treedef.unflatten(dyn), (treedef, sta)


def combine(dynamic, static):
    treedef, sta = static
    dyn = jax.tree_util.tree_leaves(dynamic, is_leaf=lambda x: x is None)
    merged = [d if s is None else s for d, s in zip(dyn, sta)]
    return treedef.unflatten(merged)


def _is_inexact(x) -> bool:
    return is_array(x) and jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact)


def tree_parameters(tree):
    """All inexact (trainable) array leaves of a module tree."""
    return [x for x in jax.tree_util.tree_leaves(tree) if _is_inexact(x)]


def filter_grad(fn, **grad_kwargs):
    """``jax.grad`` over only the inexact-array leaves of the first arg."""

    def wrapped(tree, *args, **kwargs):
        dyn, sta = partition(tree, _is_inexact)

        def inner(dyn_):
            return fn(combine(dyn_, sta), *args, **kwargs)

        return jax.grad(inner, **grad_kwargs)(dyn)

    return wrapped


def filter_value_and_grad(fn, **grad_kwargs):
    def wrapped(tree, *args, **kwargs):
        dyn, sta = partition(tree, _is_inexact)

        def inner(dyn_):
            return fn(combine(dyn_, sta), *args, **kwargs)

        return jax.value_and_grad(inner, **grad_kwargs)(dyn)

    return wrapped
