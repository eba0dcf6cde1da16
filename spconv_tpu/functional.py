"""Functional API (parity: ``spconv/pytorch/functional.py`` — the
autograd Functions there are unnecessary under JAX autodiff; what remains
is ``sparse_add`` for misaligned index sets, ``:441-544``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core import SparseConvTensor
from .ops import coords as C

__all__ = ["sparse_add", "sparse_add_hash_based"]


def sparse_add(
    *tens: SparseConvTensor, out_bound: Optional[int] = None
) -> SparseConvTensor:
    """Add sparse tensors whose active-site sets may differ: the result's
    sites are the union (parity: ``functional.py:441-544``, which uses a
    GPU hash-table union / torch.sparse coalesce; here a sort + segmented
    dedup + scatter-add, fully static-shape).

    ``out_bound`` — static bound on the union size; defaults to the sum of
    the operands' buffer sizes rounded up to a lane multiple.

    Note on rulebook caches: the reference keeps ``indice_dict`` only when
    one operand's site set equals the union (``functional.py:497-498``);
    that check is data-dependent, so here the cache is always dropped —
    reuse ``AddTable`` for aligned adds to keep caches.
    """
    assert len(tens) > 0
    first = tens[0]
    for t in tens[1:]:
        assert t.spatial_shape == first.spatial_shape
        assert t.batch_size == first.batch_size
        assert t.features.shape[1] == first.features.shape[1]

    total = sum(t.features.shape[0] for t in tens)
    if out_bound is None:
        out_bound = -(-total // 128) * 128

    keys = []
    for t in tens:
        k, sentinel = C.linearize(t.indices, first.spatial_shape, first.batch_size)
        keys.append(k)
    all_keys = jnp.concatenate(keys)
    all_feats = jnp.concatenate([t.features for t in tens], axis=0)
    all_inds = jnp.concatenate([t.indices for t in tens], axis=0)

    sk, order = C.sort_with_ids(all_keys)
    not_sent = ~C.is_sentinel(sk, sentinel)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out = jnp.minimum(jnp.sum(is_first.astype(jnp.int32)), out_bound)

    pos_of = jnp.zeros((total,), jnp.int32).at[order].set(uniq_pos)
    valid = ~C.is_sentinel(all_keys, sentinel) & (pos_of < out_bound)
    scatter_pos = jnp.where(valid, pos_of, out_bound)

    out_feats = jnp.zeros((out_bound, first.features.shape[1]), first.features.dtype)
    out_feats = out_feats.at[scatter_pos].add(
        jnp.where(valid[:, None], all_feats, 0), mode="drop"
    )
    out_inds = jnp.full((out_bound, all_inds.shape[1]), -1, jnp.int32)
    out_inds = out_inds.at[scatter_pos].set(all_inds, mode="drop")

    return SparseConvTensor(
        out_feats,
        out_inds,
        first.spatial_shape,
        first.batch_size,
        num_voxels=num_out,
        benchmark=first.benchmark,
        # union rows are written at ascending unique-key positions with
        # invalid rows at the tail
        keys_sorted=True,
    )


# API-parity alias: the reference exposes both a torch.sparse based and a
# hash based variant; this sort-based implementation serves both roles.
sparse_add_hash_based = sparse_add
