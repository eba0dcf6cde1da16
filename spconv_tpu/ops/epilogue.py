"""Fused inference epilogues (parity: ``spconv/csrc/sparse/inference.py``
InferenceOps — bias_add_inplace, bias_add_act_inplace, activation_inplace
— and the int8 epilogue semantics of ``ops.py:1465-1525``: per-channel
weight scale, output_scale, fused residual add).

On TPU these are expressed functionally and fused by XLA into the
preceding GEMM; the reference needs dedicated CUDA kernels for the same
effect."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["Activation", "apply_act", "bias_add_act"]


class Activation:
    """Activation enum (parity: ``tv.gemm.Activation``)."""

    NONE = "none"
    RELU = "relu"
    SIGMOID = "sigmoid"
    LEAKY_RELU = "leaky_relu"


def apply_act(x: jax.Array, act_type: str, act_alpha: float = 0.0,
              act_beta: float = 0.0) -> jax.Array:
    if act_type in (None, Activation.NONE):
        return x
    if act_type == Activation.RELU:
        return jax.nn.relu(x)
    if act_type == Activation.SIGMOID:
        return jax.nn.sigmoid(x)
    if act_type == Activation.LEAKY_RELU:
        return jax.nn.leaky_relu(x, act_alpha)
    raise NotImplementedError(act_type)


def bias_add_act(
    out: jax.Array,
    bias: Optional[jax.Array],
    act_type: str = Activation.NONE,
    act_alpha: float = 0.0,
    act_beta: float = 0.0,
    add_input: Optional[jax.Array] = None,
) -> jax.Array:
    """bias → residual add → activation, matching the reference's fused
    epilogue order (``convops.py:2075`` implicit_gemm: output = act(conv +
    bias + add_input))."""
    if bias is not None:
        out = out + bias
    if add_input is not None:
        out = out + add_input.astype(out.dtype)
    return apply_act(out, act_type, act_alpha, act_beta)
