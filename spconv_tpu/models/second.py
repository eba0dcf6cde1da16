"""SECOND / CenterPoint sparse voxel encoders.

These are the flagship workloads of the reference library (README.md
"spconv is widely used in SECOND, CenterPoint, PV-RCNN"; BASELINE.json
configs 3-4): a stack of submanifold conv blocks with strided sparse-conv
downsamples, ending in a dense BEV feature map.  Topology follows the
standard SECOND middle-extractor shape (16→32→64→128 channels, 3 stride-2
stages, final (3,1,1) stride-(2,1,1) conv collapsing z).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import spconv_tpu
from ..core import SparseConvTensor
from ..module import Module

__all__ = [
    "SparseBasicBlock",
    "SparseEncoder",
    "second_encoder",
    "centerpoint_encoder",
]


def _norm_act(c, bn: bool):
    layers = []
    if bn:
        layers.append(spconv_tpu.BatchNorm1d(c))
    layers.append(spconv_tpu.SparseReLU())
    return layers


class SparseBasicBlock(Module):
    """Two subm convs with a residual add (PV-RCNN / CenterPoint block)."""

    def __init__(self, channels: int, indice_key: str, bn: bool = True,
                 algo=None, dtype=jnp.float32, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        self.conv1 = spconv_tpu.SubMConv3d(
            channels, channels, 3, bias=not bn, indice_key=indice_key,
            algo=algo, dtype=dtype, key=k1)
        self.conv2 = spconv_tpu.SubMConv3d(
            channels, channels, 3, bias=not bn, indice_key=indice_key,
            algo=algo, dtype=dtype, key=k2)
        self.bn1 = spconv_tpu.BatchNorm1d(channels) if bn else None
        self.bn2 = spconv_tpu.BatchNorm1d(channels) if bn else None

    def __call__(self, x: SparseConvTensor, training: bool = False):
        identity = x.features
        out = self.conv1(x)
        if self.bn1 is not None:
            out = self.bn1(out, training=training)
        out = out.replace_feature(jax.nn.relu(out.features))
        out = self.conv2(out)
        if self.bn2 is not None:
            out = self.bn2(out, training=training)
        out = out.replace_feature(
            jnp.where(out.valid_mask[:, None],
                      jax.nn.relu(out.features + identity), 0))
        return out


class SparseEncoder(Module):
    """SECOND-style sparse middle encoder → dense BEV features.

    Stages: subm blocks at each resolution, stride-2 sparse conv between,
    final (3,1,1)/(2,1,1) conv collapsing z, densified and reshaped to
    ``[B, C*D, H, W]``.
    """

    def __init__(
        self,
        in_channels: int = 4,
        base_channels: int = 16,
        channels: Sequence[int] = (16, 32, 64, 128),
        blocks_per_stage: int = 2,
        out_channels: int = 128,
        bn: bool = True,
        algo: Optional[str] = None,
        dtype=jnp.float32,
        out_bounds: Optional[Sequence[int]] = None,
        key=None,
    ):
        key = key if key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, 64)
        ki = iter(range(64))
        self.bn = bn
        self.algo = algo
        self.conv_input = spconv_tpu.SubMConv3d(
            in_channels, base_channels, 3, bias=not bn, indice_key="subm0",
            algo=algo, dtype=dtype, key=keys[next(ki)])
        self.bn_input = spconv_tpu.BatchNorm1d(base_channels) if bn else None

        stages = []
        downs = []
        prev_c = base_channels
        self.out_bounds = tuple(out_bounds) if out_bounds else None
        for si, c in enumerate(channels):
            if si > 0:
                ob = self.out_bounds[si - 1] if self.out_bounds else None
                downs.append(
                    spconv_tpu.SparseConv3d(
                        prev_c, c, 3, stride=2, padding=1, bias=not bn,
                        indice_key=f"down{si}", dtype=dtype,
                        key=keys[next(ki)], out_bound=ob,
                        out_bound_ratio=1.5, algo=algo,
                    )
                )
            blocks = []
            for bi in range(blocks_per_stage):
                blocks.append(
                    SparseBasicBlock(c, indice_key=f"subm{si}", bn=bn,
                                     algo=algo, dtype=dtype,
                                     key=keys[next(ki)])
                )
            stages.append(blocks)
            prev_c = c
        self.stages = stages
        self.downs = downs
        self.conv_out = spconv_tpu.SparseConv3d(
            prev_c, out_channels, (3, 1, 1), stride=(2, 1, 1),
            padding=0, bias=not bn, indice_key="out",
            dtype=dtype, key=keys[next(ki)], out_bound_ratio=1.0, algo=algo)
        self.bn_out = spconv_tpu.BatchNorm1d(out_channels) if bn else None

    def __call__(self, x: SparseConvTensor, training: bool = False):
        x = self.conv_input(x)
        if self.bn_input is not None:
            x = self.bn_input(x, training=training)
        x = x.replace_feature(jax.nn.relu(x.features))
        for si, blocks in enumerate(self.stages):
            if si > 0:
                x = self.downs[si - 1](x)
            for b in blocks:
                x = b(x, training=training)
        x = self.conv_out(x)
        if self.bn_out is not None:
            x = self.bn_out(x, training=training)
        x = x.replace_feature(jax.nn.relu(x.features))
        return x

    def bev(self, x: SparseConvTensor, training: bool = False) -> jax.Array:
        """Forward + densify to BEV ``[B, C*D, H, W]``."""
        out = self(x, training=training)
        dense = out.dense()  # [B, C, D, H, W]
        b, c, d, h, w = dense.shape
        return dense.reshape(b, c * d, h, w)


def second_encoder(in_channels: int = 4, dtype=jnp.float32, key=None,
                   **kw) -> SparseEncoder:
    """SECOND (KITTI) middle extractor config (BASELINE config 3)."""
    return SparseEncoder(in_channels=in_channels, base_channels=16,
                         channels=(16, 32, 64, 128), dtype=dtype, key=key,
                         **kw)


def centerpoint_encoder(in_channels: int = 5, dtype=jnp.float32, key=None,
                        **kw) -> SparseEncoder:
    """CenterPoint (nuScenes) sparse backbone config (BASELINE config 4)."""
    return SparseEncoder(in_channels=in_channels, base_channels=16,
                         channels=(16, 32, 64, 128), dtype=dtype, key=key,
                         **kw)
