"""Small sparse classifier (parity role: ``example/mnist`` +
``test/fake_train.py`` nets — the reference's minimal end-to-end models)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import spconv_tpu
from ..core import SparseConvTensor
from ..module import Module

__all__ = ["SparseClassifier"]


class SparseClassifier(Module):
    """SubMConv → SparseConv downsample ×2 → global pool → linear."""

    def __init__(self, ndim: int, in_channels: int, num_classes: int,
                 width: int = 32, dtype=jnp.float32, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        conv = {2: spconv_tpu.SubMConv2d, 3: spconv_tpu.SubMConv3d}[ndim]
        down = {2: spconv_tpu.SparseConv2d, 3: spconv_tpu.SparseConv3d}[ndim]
        self.c1 = conv(in_channels, width, 3, indice_key="s1", dtype=dtype,
                       key=ks[0])
        self.d1 = down(width, width * 2, 3, stride=2, padding=1, dtype=dtype,
                       key=ks[1])
        self.c2 = conv(width * 2, width * 2, 3, indice_key="s2", dtype=dtype,
                       key=ks[2])
        self.d2 = down(width * 2, width * 4, 3, stride=2, padding=1,
                       dtype=dtype, key=ks[3])
        self.pool = spconv_tpu.SparseGlobalAvgPool()
        wk = ks[4]
        bound = 1.0 / jnp.sqrt(width * 4)
        self.w_head = jax.random.uniform(
            wk, (width * 4, num_classes), jnp.float32, -bound, bound
        ).astype(dtype)
        self.b_head = jnp.zeros((num_classes,), dtype)

    def __call__(self, x: SparseConvTensor) -> jax.Array:
        x = self.c1(x)
        x = x.replace_feature(jax.nn.relu(x.features))
        x = self.d1(x)
        x = x.replace_feature(jax.nn.relu(x.features))
        x = self.c2(x)
        x = x.replace_feature(jax.nn.relu(x.features))
        x = self.d2(x)
        x = x.replace_feature(jax.nn.relu(x.features))
        pooled = self.pool(x)  # [B, C]
        return pooled @ self.w_head + self.b_head
