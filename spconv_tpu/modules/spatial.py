"""Spatial utilities (parity: ``spconv/pytorch/spatial.py``).

``RemoveDuplicate`` drops rows with duplicated coordinates, keeping one
representative per site (reference: ``spatial.py:28`` via
``torch.unique`` row gather).  TPU-native difference: the buffer stays
static-shape — the first row of each equal-key run is kept and the rest
are *invalidated* (indices −1, features 0) rather than compacted away;
rows come out key-sorted (invalid at the tail), so downstream fused
kernels get the ``keys_sorted`` fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import SparseConvTensor
from ..module import Module
from ..ops import coords as C

__all__ = ["RemoveDuplicate"]


class RemoveDuplicate(Module):
    def __init__(self, name=None):
        self.name = name

    def __call__(self, x: SparseConvTensor) -> SparseConvTensor:
        keys, sent = C.linearize(x.indices, x.spatial_shape, x.batch_size)
        n = keys.shape[0]
        sk, order = C.sort_with_ids(keys)
        not_sent = ~C.is_sentinel(sk, sent)
        is_first = jnp.concatenate(
            [not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
        feats = jnp.take(x.features, order, axis=0)
        inds = jnp.take(x.indices, order, axis=0)
        feats = jnp.where(is_first[:, None], feats, 0)
        inds = jnp.where(is_first[:, None], inds, -1)
        # push invalidated duplicates to the tail so the sorted-unique
        # invariant (ascending keys, invalid tail) holds exactly
        resort = jnp.where(is_first, sk, sent)
        order2 = C.argsort_keys(resort)
        feats = jnp.take(feats, order2, axis=0)
        inds = jnp.take(inds, order2, axis=0)
        return SparseConvTensor(
            feats, inds, x.spatial_shape, x.batch_size,
            num_voxels=jnp.sum(is_first.astype(jnp.int32)),
            benchmark=x.benchmark, keys_sorted=True,
        )
