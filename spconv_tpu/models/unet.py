"""Sparse U-Net for semantic segmentation (the reference's inverse-conv
decoder pattern, docs/USAGE.md:124-146: encoder SparseConv3d downsamples
cached under indice_keys, decoder SparseInverseConv3d layers restoring the
exact site sets, with skip joins)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

import spconv_tpu
from ..core import SparseConvTensor
from ..module import Module

__all__ = ["SparseUNet"]


class SparseUNet(Module):
    def __init__(self, in_channels: int, channels: Sequence[int] = (16, 32, 64),
                 num_classes: int = 16, dtype=jnp.float32, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = iter(jax.random.split(key, 32))
        self.enc_subm = []
        self.enc_down = []
        prev = in_channels
        for i, c in enumerate(channels):
            self.enc_subm.append(spconv_tpu.SubMConv3d(
                prev, c, 3, indice_key=f"subm{i}", dtype=dtype,
                key=next(keys)))
            if i < len(channels) - 1:
                self.enc_down.append(spconv_tpu.SparseConv3d(
                    c, channels[i + 1], 3, stride=2, padding=1,
                    indice_key=f"down{i}", dtype=dtype, key=next(keys)))
            prev = channels[i + 1] if i < len(channels) - 1 else c
        self.dec_up = []
        self.dec_subm = []
        for i in reversed(range(len(channels) - 1)):
            self.dec_up.append(spconv_tpu.SparseInverseConv3d(
                channels[i + 1], channels[i], 3, indice_key=f"down{i}",
                dtype=dtype, key=next(keys)))
            self.dec_subm.append(spconv_tpu.SubMConv3d(
                2 * channels[i], channels[i], 3, indice_key=f"subm{i}",
                dtype=dtype, key=next(keys)))
        self.head = spconv_tpu.SubMConv3d(
            channels[0], num_classes, 1, dtype=dtype, key=next(keys))

    def __call__(self, x: SparseConvTensor) -> SparseConvTensor:
        skips = []
        for i, subm in enumerate(self.enc_subm):
            x = subm(x)
            x = x.replace_feature(jax.nn.relu(x.features))
            skips.append(x)
            if i < len(self.enc_down):
                x = self.enc_down[i](x)
                x = x.replace_feature(jax.nn.relu(x.features))
        for j, (up, subm) in enumerate(zip(self.dec_up, self.dec_subm)):
            x = up(x)
            x = x.replace_feature(jax.nn.relu(x.features))
            skip = skips[len(self.enc_subm) - 2 - j]
            x = spconv_tpu.JoinTable()([x, skip])
            x = subm(x)
            x = x.replace_feature(jax.nn.relu(x.features))
        return self.head(x)
