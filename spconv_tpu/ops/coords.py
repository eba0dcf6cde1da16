"""Coordinate math for sparse convolution.

Re-creates the semantics of the reference's ``ConvOutLocIter``
(``spconv/csrc/sparse/indices.py:77-271``): per-filter-offset mapping
between input coordinates ("nhw") and output coordinates ("npq") under
stride / padding / dilation, with bounds and stride-divisibility checks —
but vectorised over all sites and offsets at once so XLA compiles a single
fused elementwise program instead of a CUDA thread loop.

All functions are shape-static and jittable.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_conv_output_size",
    "get_deconv_output_size",
    "kernel_offsets",
    "linearize",
    "delinearize",
    "key_dtype_for",
    "use_pair_keys",
    "argsort_keys",
    "sort_with_ids",
    "adj_differ",
    "is_sentinel",
    "full_sentinel",
    "out_coords_all_offsets",
    "subm_padding",
]

INT32_MAX = np.iinfo(np.int32).max

# Grids whose batch*volume exceeds this use two-word (hi, lo) int32 keys.
# The reference switches to int64 hash keys at the same point
# (``spconv/pytorch/ops.py:188-190``); JAX disables x64 by default, so a
# single int64 word would silently truncate to 32 bits — instead big keys
# are a ``[N, 2]`` int32 pair sorted lexicographically.  Module-level so
# tests can lower it to force the pair path on small grids.
_KEY32_LIMIT = INT32_MAX
# Max product of trailing spatial dims packed into the low word.
_LO_LIMIT = 2 ** 30


def get_conv_output_size(
    input_size: Sequence[int],
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
) -> List[int]:
    """Standard conv output size (parity: ``spconv/pytorch/ops.py:73-83``,
    including the ksize==-1 → global (size 1) convention)."""
    out = []
    for i in range(len(input_size)):
        if kernel_size[i] == -1:
            out.append(1)
        else:
            size = (
                input_size[i] + 2 * padding[i] - dilation[i] * (kernel_size[i] - 1) - 1
            ) // stride[i] + 1
            out.append(int(size))
    return out


def get_deconv_output_size(
    input_size: Sequence[int],
    kernel_size: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
    output_padding: Sequence[int],
) -> List[int]:
    """Transposed-conv output size (parity: ``ops.py:85-96``)."""
    out = []
    for i in range(len(input_size)):
        if kernel_size[i] == -1:
            raise ValueError("deconv doesn't support kernel_size < 0")
        size = (
            (input_size[i] - 1) * stride[i]
            - 2 * padding[i]
            + kernel_size[i]
            + output_padding[i]
        )
        out.append(int(size))
    return out


def subm_padding(ksize: Sequence[int], dilation: Sequence[int]) -> Tuple[int, ...]:
    """Submanifold convs implicitly pad so out shape == in shape
    (the reference's pair-gen for subm takes no padding argument at all,
    ``ops.py:204-235``)."""
    return tuple((k // 2) * d for k, d in zip(ksize, dilation))


def kernel_offsets(ksize: Sequence[int]) -> np.ndarray:
    """``[kv, ndim]`` integer offsets in the reference's filter-offset
    enumeration order (row-major over kernel dims — matches
    ``ConvOutLocIter::operator++`` / ``LayoutRS``, ``indices.py:116-126``)."""
    grids = np.meshgrid(*[np.arange(k) for k in ksize], indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=-1).astype(np.int32)


def key_dtype_for(spatial_shape: Sequence[int], batch_size: int):
    """int32 keys unless batch*volume overflows (parity: the int64-hash-key
    switch at ``ops.py:188-190``).  When it overflows, :func:`linearize`
    actually emits two-word int32 pair keys (see :func:`use_pair_keys`);
    this function is kept for API parity and reports the *logical* width."""
    vol = int(np.prod([int(s) for s in spatial_shape])) * int(batch_size)
    return jnp.int64 if vol >= _KEY32_LIMIT else jnp.int32


def use_pair_keys(spatial_shape: Sequence[int], batch_size: int) -> bool:
    """True when coordinates need two-word (hi, lo) int32 keys."""
    vol = int(np.prod([int(s) for s in spatial_shape])) * int(batch_size)
    return vol >= _KEY32_LIMIT


def _split_dims(shape: Sequence[int], batch_size: int) -> Tuple[int, int, int]:
    """Split spatial dims for two-word keys: trailing dims whose product
    stays under ``_LO_LIMIT`` go to the low word, the rest (with batch) to
    the high word.  Returns (cut, lo_prod, hi_prod)."""
    shape = [int(s) for s in shape]
    lo = 1
    cut = len(shape)
    while cut > 0 and lo * shape[cut - 1] < _LO_LIMIT:
        lo *= shape[cut - 1]
        cut -= 1
    hi = int(batch_size) * int(np.prod(shape[:cut], dtype=np.int64))
    if hi >= INT32_MAX:
        raise NotImplementedError(
            f"grid batch*{tuple(shape)} exceeds two-word int32 key capacity "
            f"(~2^61 sites)"
        )
    return cut, lo, hi


def linearize(
    indices: jax.Array,
    spatial_shape: Sequence[int],
    batch_size: int,
    valid: jax.Array | None = None,
):
    """Linearize ``[N, ndim+1]`` (batch-first) coords to sortable keys.

    Invalid rows map to a sentinel that sorts after every valid key.
    Parity: ``LayoutNPQ`` linearization in ``indices.py:104-110``.

    Small grids (batch*volume < 2^31): returns (``[N]`` int32 keys,
    scalar sentinel).  Huge grids: returns (``[N, 2]`` int32 (hi, lo)
    pair keys, ``[2]`` sentinel) — compare/sort them only through
    :func:`argsort_keys` / :func:`adj_differ` / :func:`is_sentinel`.
    """
    shape = [int(s) for s in spatial_shape]
    if valid is None:
        valid = indices[:, 0] >= 0
    if not use_pair_keys(shape, batch_size):
        key = indices[:, 0].astype(jnp.int32)
        for i, s in enumerate(shape):
            key = key * s + indices[:, i + 1].astype(jnp.int32)
        sentinel = np.array(int(np.prod(shape)) * int(batch_size), jnp.int32)
        key = jnp.where(valid, key, sentinel)
        return key, sentinel
    cut, _lo_prod, hi_prod = _split_dims(shape, batch_size)
    hi = indices[:, 0].astype(jnp.int32)
    for i in range(cut):
        hi = hi * shape[i] + indices[:, i + 1].astype(jnp.int32)
    lo = jnp.zeros(indices.shape[:1], jnp.int32)
    for i in range(cut, len(shape)):
        lo = lo * shape[i] + indices[:, i + 1].astype(jnp.int32)
    key = jnp.stack([hi, lo], axis=-1)
    sentinel = jnp.asarray([hi_prod, 0], jnp.int32)
    key = jnp.where(valid[:, None], key, sentinel)
    return key, sentinel


def argsort_keys(keys: jax.Array, stable: bool = False) -> jax.Array:
    """argsort for either key layout.  Pair keys sort lexicographically via
    two stable argsorts (sort by lo, then stable-sort by hi)."""
    if keys.ndim == 1:
        return jnp.argsort(keys, stable=stable)
    o1 = jnp.argsort(keys[:, 1], stable=True)
    o2 = jnp.argsort(keys[o1, 0], stable=True)
    return o1[o2]


def sort_with_ids(keys: jax.Array):
    """``(sorted_keys, order)`` in ONE ``lax.sort`` — the payload rides the
    sort, avoiding the post-argsort ``keys[order]`` gather (a 4-byte-row
    gather over millions of elements is a measured hot spot in rulebook
    builds).  Pair keys sort lexicographically via ``num_keys=2``."""
    n = keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    if keys.ndim == 1:
        sk, order = jax.lax.sort((keys, iota), num_keys=1, is_stable=True)
        return sk, order
    hi, lo, order = jax.lax.sort(
        (keys[:, 0], keys[:, 1], iota), num_keys=2, is_stable=True
    )
    return jnp.stack([hi, lo], axis=-1), order


def sort_with_payload(keys: jax.Array, payload: jax.Array):
    """``(sorted_keys, sorted_payload)`` in one stable ``lax.sort``;
    pair keys sort lexicographically via ``num_keys=2``."""
    if keys.ndim == 1:
        sk, p = jax.lax.sort((keys, payload), num_keys=1, is_stable=True)
        return sk, p
    hi, lo, p = jax.lax.sort(
        (keys[:, 0], keys[:, 1], payload), num_keys=2, is_stable=True
    )
    return jnp.stack([hi, lo], axis=-1), p


def keys_equal_shift(sk: jax.Array, s: int) -> jax.Array:
    """``[M]`` bool: ``sk[j] == sk[j-s]`` (False for ``j < s``), for either
    key layout.  On a sorted array this tests whether the whole span
    ``[j-s, j]`` shares one key."""
    if sk.ndim == 1:
        eq = sk[s:] == sk[:-s]
    else:
        eq = jnp.all(sk[s:] == sk[:-s], axis=-1)
    return jnp.concatenate([jnp.zeros((s,), bool), eq])


def adj_differ(sk: jax.Array) -> jax.Array:
    """``sk[1:] != sk[:-1]`` for either key layout (``[N-1]`` bool)."""
    if sk.ndim == 1:
        return sk[1:] != sk[:-1]
    return jnp.any(sk[1:] != sk[:-1], axis=-1)


def is_sentinel(sk: jax.Array, sentinel) -> jax.Array:
    """Elementwise key == sentinel for either layout (``[N]`` bool)."""
    if sk.ndim == 1:
        return sk == sentinel
    return jnp.all(sk == sentinel[None, :], axis=-1)


def full_sentinel(n: int, sentinel) -> jax.Array:
    """``[n]`` (or ``[n, 2]``) buffer filled with the sentinel key."""
    if np.ndim(sentinel) == 0:
        return jnp.full((n,), sentinel)
    return jnp.tile(jnp.asarray(sentinel)[None, :], (n, 1))


def delinearize(keys: jax.Array, spatial_shape: Sequence[int], valid: jax.Array):
    """Inverse of :func:`linearize` → ``[N, ndim+1]`` int32, −1 for invalid."""
    shape = [int(s) for s in spatial_shape]
    if keys.ndim == 2:
        cut, _, _ = _split_dims(shape, 1)
        coords = []
        rem = keys[:, 1]
        for s in reversed(shape[cut:]):
            coords.append(rem % s)
            rem = rem // s
        rem = keys[:, 0]
        for s in reversed(shape[:cut]):
            coords.append(rem % s)
            rem = rem // s
        coords.append(rem)
        out = jnp.stack(list(reversed(coords)), axis=-1).astype(jnp.int32)
        return jnp.where(valid[:, None], out, -1)
    coords = []
    rem = keys
    for s in reversed(shape):
        coords.append(rem % s)
        rem = rem // s
    coords.append(rem)
    out = jnp.stack(list(reversed(coords)), axis=-1).astype(jnp.int32)
    return jnp.where(valid[:, None], out, -1)


def out_coords_all_offsets(
    indices: jax.Array,
    ksize: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
    out_shape: Sequence[int],
    batch_size: int,
    transposed: bool = False,
    subm: bool = False,
):
    """For every (filter offset k, input site i): candidate output coordinate
    and validity.

    Forward conv (parity ``query_npq``, ``indices.py:177-203``):
      ``q = (h + pad - k*dil) / stride`` valid iff divisible & in-bounds.
    Transposed conv (parity ``query_nhw_out`` with swapped roles,
    ``indices.py:252-269``): ``q = h*stride - pad + k*dil``.
    Subm (parity ``query_npq_no_stride`` ``:208`` with implicit padding):
      stride forced to 1, padding = (k//2)*dil.

    Returns: out_coords ``[kv, N, ndim+1]`` int32, valid ``[kv, N]`` bool.
    """
    ndim = indices.shape[1] - 1
    offs = jnp.asarray(kernel_offsets(ksize))  # [kv, ndim]
    if subm:
        padding = subm_padding(ksize, dilation)
        stride = (1,) * ndim
    st = jnp.asarray(list(stride), dtype=jnp.int32)
    pad = jnp.asarray(list(padding), dtype=jnp.int32)
    dil = jnp.asarray(list(dilation), dtype=jnp.int32)
    oshape = jnp.asarray([int(s) for s in out_shape], dtype=jnp.int32)

    in_valid = indices[:, 0] >= 0  # [N]
    b = indices[None, :, 0]  # [1, N]
    xyz = indices[None, :, 1:]  # [1, N, ndim]
    k_off = offs[:, None, :]  # [kv, 1, ndim]

    if not transposed:
        num = xyz + pad - k_off * dil  # [kv, N, ndim]
        q = num // st
        # use true divisibility (floor semantics match C++ here because the
        # in-bounds check q >= 0 discards every negative-numerator case)
        div_ok = (num % st) == 0
        valid = jnp.all((q >= 0) & (q < oshape) & div_ok, axis=-1)
    else:
        q = xyz * st - pad + k_off * dil
        valid = jnp.all((q >= 0) & (q < oshape), axis=-1)
    valid = valid & in_valid[None, :]
    bq = jnp.broadcast_to(b[..., None], (*q.shape[:-1], 1))
    out_coords = jnp.concatenate([bq, q], axis=-1).astype(jnp.int32)
    out_coords = jnp.where(valid[..., None], out_coords, -1)
    return out_coords, valid
