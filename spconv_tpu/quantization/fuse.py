"""BN + activation folding for inference (parity:
``example/fuse_bn_act.py:36-53`` weight-folding math and the
quantization stack's ``utils.py:5-37`` fold helpers)."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..modules.conv import SparseConvolution
from ..modules.modules import (
    BatchNorm1d,
    SparseReLU,
    SparseSequential,
)

__all__ = ["fuse_bn_weights", "fuse_conv_bn", "fuse_bn_act_in_sequential"]


def fuse_bn_weights(weight, bias, running_mean, running_var, eps, gamma, beta):
    """KRSC weight + bias folded with BN statistics:
    w' = w·γ/σ (per output channel), b' = β + (b − μ)·γ/σ."""
    inv = gamma / jnp.sqrt(running_var + eps)  # [K]
    w = weight * inv.reshape((-1,) + (1,) * (weight.ndim - 1)).astype(weight.dtype)
    if bias is None:
        bias = jnp.zeros_like(running_mean).astype(weight.dtype)
    b = (beta + (bias.astype(jnp.float32) - running_mean) * inv).astype(weight.dtype)
    return w, b


def fuse_conv_bn(conv: SparseConvolution, bn: BatchNorm1d) -> SparseConvolution:
    """Return a conv with BN folded in (inference only)."""
    gamma = bn.weight if bn.weight is not None else jnp.ones_like(bn.running_mean)
    beta = bn.bias if bn.bias is not None else jnp.zeros_like(bn.running_mean)
    w, b = fuse_bn_weights(
        conv.weight, conv.bias, bn.running_mean, bn.running_var, bn.eps,
        gamma, beta,
    )
    return conv.replace(weight=w, bias=b)


def fuse_bn_act_in_sequential(seq: SparseSequential) -> SparseSequential:
    """Graph rewrite: conv→bn(→relu) chains folded into a single fused conv
    (parity: the torch.fx fusion patterns in
    ``pytorch/quantization/fuse_mapping.py:10-99``, done structurally here
    since there is no bytecode tracing)."""
    layers = list(seq.layers)
    out: List = []
    i = 0
    while i < len(layers):
        l = layers[i]
        if isinstance(l, SparseConvolution) and i + 1 < len(layers) and isinstance(
            layers[i + 1], BatchNorm1d
        ):
            fused = fuse_conv_bn(l, layers[i + 1])
            i += 2
            if i < len(layers) and isinstance(layers[i], SparseReLU):
                fused = fused.replace(act_type="relu")
                i += 1
            out.append(fused)
        else:
            out.append(l)
            i += 1
    return SparseSequential(*out)
