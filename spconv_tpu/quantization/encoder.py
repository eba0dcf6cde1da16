"""Whole-encoder int8 PTQ (parity: the reference's fx ``convert_fx``
pipeline applied to a SECOND/CenterPoint backbone —
``spconv/pytorch/quantization/backend_cfg.py`` conv+bn+relu and
conv+bn+add+relu fusion patterns, producing quantized modules incl. the
residual-fused ``SparseConvAddReLU``,
``intrinsic/quantized/conv_relu.py``).

The reference expresses this as torch.fx graph rewrites; here the
encoder topology is known (``models/second.py:SparseEncoder``), so the
conversion is a structural walk: observe activation ranges at every
layer boundary on calibration scans, then rebuild the encoder with
``QuantizedSparseConv`` / ``SparseConvAddReLU`` layers whose epilogues
fuse scale/bias/relu/residual in-kernel (``ops/pallas/dg_conv.py``
int8 kernels on TPU)."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SparseConvTensor
from ..models.second import SparseBasicBlock, SparseEncoder
from ..module import Module
from .fuse import fuse_conv_bn
from .quantize import (
    MinMaxObserver, PerChannelMinMaxObserver, QuantizedSparseConv,
    SparseConvAddReLU, quantize_tensor,
)

__all__ = ["QuantizedSparseEncoder", "quantize_encoder",
           "observe_encoder_scales"]


def _fused_conv(conv, bn):
    return fuse_conv_bn(conv, bn) if bn is not None else conv


def _qconv(conv, obs_in: MinMaxObserver, obs_out: MinMaxObserver,
           act="relu", cls=QuantizedSparseConv, **kw):
    wobs = PerChannelMinMaxObserver()
    wobs.observe(conv.weight)
    if cls is SparseConvAddReLU:
        return cls(conv, wobs.scale, obs_in.scale, obs_out.scale, **kw)
    return cls(conv, wobs.scale, obs_in.scale, obs_out.scale, act_type=act,
               **kw)


class QuantizedSparseBasicBlock(Module):
    """int8 residual block: conv1(+relu) then residual-fused
    conv2+add+relu (``SparseConvAddReLU``).  The add input is the block's
    int8 input; its dequant scale rides the fused epilogue."""

    def __init__(self, q1: QuantizedSparseConv, q2: SparseConvAddReLU):
        self.q1 = q1
        self.q2 = q2

    def __call__(self, x: SparseConvTensor) -> SparseConvTensor:
        out = self.q1(x)
        return self.q2(out, add_input=x, add_scale=self.q2.add_scale)


class QuantizedSparseEncoder(Module):
    """int8 SECOND/CenterPoint encoder produced by
    :func:`quantize_encoder` — takes the fp input tensor, quantizes it
    once, runs the whole backbone in int8, and dequantizes the output."""

    def __init__(self, input_scale, layers, out_scale):
        self.input_scale = float(input_scale)
        self.layers = layers
        self.out_scale = float(out_scale)

    def __call__(self, x: SparseConvTensor) -> SparseConvTensor:
        q = quantize_tensor(x.features, self.input_scale)
        cur = x.replace_feature(q)
        for layer in self.layers:
            cur = layer(cur)
        return cur.replace_feature(
            cur.features.astype(jnp.float32) * self.out_scale)

    def bev(self, x: SparseConvTensor) -> jax.Array:
        out = self(x)
        dense = out.dense()
        b, c, d, h, w = dense.shape
        return dense.reshape(b, c * d, h, w)


def _fuse_encoder(enc: SparseEncoder):
    """Fold BN into convs, returning (conv_in, downs, stages_f, conv_out)
    with stages_f = [[(conv1, conv2), ...] per stage]."""
    conv_in = _fused_conv(enc.conv_input, enc.bn_input)
    downs = []
    stages_f = []
    for si, blocks in enumerate(enc.stages):
        if si > 0:
            downs.append(enc.downs[si - 1])
        fb = []
        for b in blocks:
            fb.append((
                _fused_conv(b.conv1, b.bn1),
                _fused_conv(b.conv2, b.bn2),
            ))
        stages_f.append(fb)
    conv_out = _fused_conv(enc.conv_out, enc.bn_out)
    return conv_in, downs, stages_f, conv_out


def observe_encoder_scales(enc: SparseEncoder,
                           calib_inputs: List[SparseConvTensor]) -> dict:
    """Calibration observation pass: run the (BN-folded) fp encoder on
    the calibration scans recording min/max at every layer boundary.

    Returns a plain-JSON dict of activation scales — the serializable
    calibration artifact.  The pass executes eagerly (per-op dispatch),
    so deployments cache its output on disk and feed it back to
    :func:`quantize_encoder` via ``scales=`` (parity: the reference
    ships TensorRT calibration tables the same way,
    ``docs/TENSORRT_INT8_GUIDE.md``)."""
    conv_in, downs, stages_f, conv_out = _fuse_encoder(enc)

    obs_in = MinMaxObserver()
    obs_cin = MinMaxObserver()
    obs_down = [MinMaxObserver() for _ in downs]
    obs_blocks = [[(MinMaxObserver(), MinMaxObserver()) for _ in fb]
                  for fb in stages_f]
    obs_out = MinMaxObserver()

    def relu_t(t):
        return t.replace_feature(jax.nn.relu(t.features))

    for x in calib_inputs:
        obs_in.observe(x)
        cur = relu_t(conv_in(x))
        obs_cin.observe(cur)
        for si, fb in enumerate(stages_f):
            if si > 0:
                cur = relu_t(downs[si - 1](cur))
                obs_down[si - 1].observe(cur)
            for bi, (c1, c2) in enumerate(fb):
                o1, o2 = obs_blocks[si][bi]
                identity = cur.features
                mid = relu_t(c1(cur))
                o1.observe(mid)
                out = c2(mid)
                cur = out.replace_feature(
                    jnp.where(out.valid_mask[:, None],
                              jax.nn.relu(out.features + identity), 0))
                o2.observe(cur)
        cur = relu_t(conv_out(cur))
        obs_out.observe(cur)

    return {
        "in": float(obs_in.scale),
        "cin": float(obs_cin.scale),
        "down": [float(o.scale) for o in obs_down],
        "blocks": [[[float(o1.scale), float(o2.scale)] for o1, o2 in ob]
                   for ob in obs_blocks],
        "out": float(obs_out.scale),
    }


class _FixedScale:
    """Observer stand-in carrying a pre-computed scale."""

    def __init__(self, scale: float):
        self.scale = float(scale)


def quantize_encoder(enc: SparseEncoder,
                     calib_inputs: Optional[List[SparseConvTensor]] = None,
                     scales: Optional[dict] = None
                     ) -> QuantizedSparseEncoder:
    """Calibrate + convert a ``SparseEncoder`` to int8.

    Either runs the observation pass on ``calib_inputs``
    (:func:`observe_encoder_scales`) or consumes a cached ``scales``
    dict, then rebuilds with quantized layers.  Residual blocks convert
    to conv1(+relu) + residual-fused conv2 (reference pattern:
    conv+bn+add+relu → ``SparseConvAddReLU``)."""
    if scales is None:
        assert calib_inputs is not None, \
            "quantize_encoder needs calib_inputs or cached scales"
        scales = observe_encoder_scales(enc, calib_inputs)
    conv_in, downs, stages_f, conv_out = _fuse_encoder(enc)

    obs_in = _FixedScale(scales["in"])
    obs_cin = _FixedScale(scales["cin"])
    obs_down = [_FixedScale(s) for s in scales["down"]]
    obs_blocks = [[( _FixedScale(s1), _FixedScale(s2))
                   for s1, s2 in ob] for ob in scales["blocks"]]
    obs_out = _FixedScale(scales["out"])

    layers: List[Module] = []
    layers.append(_qconv(conv_in, obs_in, obs_cin))
    prev = obs_cin
    for si, fb in enumerate(stages_f):
        if si > 0:
            layers.append(_qconv(downs[si - 1], prev, obs_down[si - 1]))
            prev = obs_down[si - 1]
        for bi, (c1, c2) in enumerate(fb):
            o1, o2 = obs_blocks[si][bi]
            q1 = _qconv(c1, prev, o1)
            q2 = _qconv(c2, o1, o2, cls=SparseConvAddReLU)
            # residual dequant scale = the block INPUT's scale
            q2.add_scale = float(prev.scale)
            layers.append(QuantizedSparseBasicBlock(q1, q2))
            prev = o2
    layers.append(_qconv(conv_out, prev, obs_out))
    return QuantizedSparseEncoder(obs_in.scale, layers, obs_out.scale)
