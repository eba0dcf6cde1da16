"""Table containers (parity: ``spconv/pytorch/tables.py``):
``AddTable`` (sum features of aligned sparse tensors), ``ConcatTable``
(apply several modules to the same input → list), ``JoinTable``
(channel-concatenate aligned sparse tensors)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import SparseConvTensor
from .modules import SparseModule

__all__ = ["AddTable", "ConcatTable", "JoinTable"]


class AddTable(SparseModule):
    """Sum features of sparse tensors with *aligned* index buffers
    (the usual residual-add case).  For misaligned indices use
    ``spconv_tpu.functional.sparse_add``."""

    def __call__(self, inputs):
        assert len(inputs) > 0
        out = inputs[0].shadow_copy()
        feats = inputs[0].features
        for t in inputs[1:]:
            feats = feats + t.features
        out.features = feats
        return out


class JoinTable(SparseModule):
    """Channel-concatenate aligned sparse tensors."""

    def __call__(self, inputs):
        assert len(inputs) > 0
        out = inputs[0].shadow_copy()
        out.features = jnp.concatenate([t.features for t in inputs], axis=1)
        return out


class ConcatTable(SparseModule):
    """Apply each sub-module to the same input, return the list."""

    def __init__(self, *modules):
        self.modules_list = list(modules)

    def add(self, module):
        return ConcatTable(*self.modules_list, module)

    def __getitem__(self, i):
        return self.modules_list[i]

    def __call__(self, x):
        return [m(x) for m in self.modules_list]
