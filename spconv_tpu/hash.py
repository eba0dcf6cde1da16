"""HashTable — generic key/value table (parity: ``spconv/pytorch/hash.py``
HashTable over the GPU linear-probing table ``csrc/hash/core.py``).

The TPU-native implementation is a sorted key array + sort-join queries
(hashing is a GPU-ism; sorted tables are the TPU primitive — same public
surface: ``insert``, ``query``, ``insert_exist_keys``, ``assign_arange_``,
``items``).  Fixed capacity, functional updates, fully jittable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HashTable"]


def _empty_for(key_dtype):
    """Empty-slot sentinel: max value of the key dtype (must sort after
    every live key so the sorted-prefix invariant holds)."""
    return np.iinfo(np.dtype(key_dtype)).max


class HashTable:
    """Fixed-capacity key→value table.

    Unlike the torch version (mutable device table), operations returning
    a modified table produce a NEW HashTable; query-like ops mirror the
    reference's (values, is_empty) return convention.
    """

    def __init__(self, max_size: int, key_dtype=jnp.int32,
                 value_dtype=jnp.int32,
                 _keys: Optional[jax.Array] = None,
                 _values: Optional[jax.Array] = None):
        self.max_size = max_size
        self.key_dtype = key_dtype
        self.value_dtype = value_dtype
        if (
            np.dtype(key_dtype).itemsize > 4
            and not jax.config.jax_enable_x64
        ):
            raise ValueError(
                "int64-key HashTable requires jax_enable_x64 (keys would "
                "silently truncate to 32 bits otherwise)"
            )
        self._empty = _empty_for(key_dtype)
        if _keys is None:
            _keys = jnp.full((max_size,), self._empty, key_dtype)
            _values = jnp.zeros((max_size,), value_dtype)
        self.keys = _keys
        self.values = _values

    # ------------------------------------------------------------------
    def _with(self, keys, values) -> "HashTable":
        return HashTable(self.max_size, self.key_dtype, self.value_dtype,
                         keys, values)

    def insert(self, keys: jax.Array,
               values: Optional[jax.Array] = None) -> "HashTable":
        """Insert key(/value) pairs; first writer wins for duplicate keys
        (matching hash-insert semantics).  Table stays key-sorted."""
        if values is None:
            values = jnp.zeros(keys.shape, self.value_dtype)
        all_keys = jnp.concatenate([self.keys, keys.astype(self.key_dtype)])
        all_vals = jnp.concatenate([self.values, values.astype(self.value_dtype)])
        # stable sort → existing entries (first) win over new duplicates
        order = jnp.argsort(all_keys, stable=True)
        sk, sv = all_keys[order], all_vals[order]
        keep = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
        keep = keep & (sk != self._empty)
        pos = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1,
                        self.max_size)
        nk = jnp.full((self.max_size,), self._empty, self.key_dtype)
        nv = jnp.zeros((self.max_size,), self.value_dtype)
        nk = nk.at[pos].set(sk, mode="drop")
        nv = nv.at[pos].set(sv, mode="drop")
        return self._with(nk, nv)

    def query(self, keys: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns (values, is_empty): value per query, and True where the
        key is absent (parity: ``hash.py:query``)."""
        pos = jnp.searchsorted(self.keys, keys.astype(self.key_dtype))
        pos = jnp.minimum(pos, self.max_size - 1)
        found = self.keys[pos] == keys.astype(self.key_dtype)
        vals = jnp.where(found, self.values[pos], 0)
        return vals, ~found

    def insert_exist_keys(self, keys: jax.Array,
                          values: jax.Array) -> Tuple["HashTable", jax.Array]:
        """Update values of keys already present; returns (table,
        is_empty) flags for keys not found."""
        pos = jnp.searchsorted(self.keys, keys.astype(self.key_dtype))
        pos = jnp.minimum(pos, self.max_size - 1)
        found = self.keys[pos] == keys.astype(self.key_dtype)
        nv = self.values.at[jnp.where(found, pos, self.max_size)].set(
            values.astype(self.value_dtype), mode="drop")
        return self._with(self.keys, nv), ~found

    def assign_arange_(self) -> Tuple["HashTable", jax.Array]:
        """Assign 0..n-1 to live slots in key order; returns (table, count)
        (parity: ``hash.py:assign_arange_``)."""
        live = self.keys != self._empty
        ar = jnp.cumsum(live.astype(self.value_dtype)) - 1
        nv = jnp.where(live, ar, self.values)
        cnt = jnp.sum(live.astype(jnp.int32))
        return self._with(self.keys, nv), cnt

    def items(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (keys, values, count); live entries occupy the prefix."""
        live = self.keys != self._empty
        cnt = jnp.sum(live.astype(jnp.int32))
        return self.keys, self.values, cnt

    @property
    def size(self) -> int:
        return self.max_size


def _ht_flatten(t: HashTable):
    return (t.keys, t.values), (t.max_size, t.key_dtype, t.value_dtype)


def _ht_unflatten(aux, children):
    return HashTable(aux[0], aux[1], aux[2], children[0], children[1])


jax.tree_util.register_pytree_node(HashTable, _ht_flatten, _ht_unflatten)
