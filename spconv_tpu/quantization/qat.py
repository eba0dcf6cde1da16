"""QAT — quantization-aware training (parity:
``spconv/pytorch/quantization/intrinsic/qat/modules.py``: fused conv+BN
fake-quant modules with BN folding; ``fake_q.py`` fake-quant observers).

Fake quantization uses the straight-through estimator (round in forward,
identity in backward) — expressed with ``stop_gradient`` so JAX autodiff
produces STE without a custom VJP.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SparseConvTensor
from ..module import Module
from ..modules.conv import SparseConvolution
from ..modules.modules import BatchNorm1d

__all__ = ["fake_quant", "fake_quant_per_channel", "QATConvBnReLU",
           "QATQuantStub", "QuantizedSequential", "finalize_qat",
           "prepare_qat", "qat_observe", "convert_qat"]


def fake_quant(x: jax.Array, scale: jax.Array, qmin=-127, qmax=127):
    """Per-tensor symmetric fake quantization with STE."""
    s = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(x / s), qmin, qmax) * s
    return x + jax.lax.stop_gradient(q - x)


def fake_quant_per_channel(w: jax.Array, scale: jax.Array, axis=0,
                           qmin=-127, qmax=127):
    shape = [1] * w.ndim
    shape[axis] = -1
    s = jnp.maximum(scale.reshape(shape), 1e-8)
    q = jnp.clip(jnp.round(w / s), qmin, qmax) * s
    return w + jax.lax.stop_gradient(q - w)


class QATConvBnReLU(Module):
    """Fused conv(+BN)(+ReLU) with fake-quantized weights and activations
    (parity: SpconvConvBnReLUnd QAT module,
    ``intrinsic/qat/modules.py`` — which likewise fake-quantizes the
    **BN-folded** weight so train-time quantization noise equals the
    deploy arithmetic exactly).

    BN is folded with *running* statistics ("BN-frozen" QAT — the flow
    assumes a float-pretrained net, like the reference mnist example);
    running stats and scale EMAs advance functionally via
    :func:`qat_observe` / :meth:`observe`.  γ/β stay trainable (grads
    flow through the fold); running stats are stop-gradiented."""

    def __init__(self, conv: SparseConvolution, bn: Optional[BatchNorm1d],
                 relu: bool = True):
        self.conv = conv
        self.bn = bn
        self.relu = relu
        k = conv.weight.shape[0]
        self.w_scale = jnp.full((k,), 0.05, jnp.float32)
        self.act_scale = jnp.asarray(0.05, jnp.float32)

    def folded_weight_bias(self):
        """BN-folded (weight, bias) — the arrays the deploy int8 conv
        quantizes, so fake-quant must see exactly these."""
        if self.bn is None:
            return self.conv.weight, self.conv.bias
        from .fuse import fuse_bn_weights

        bn = self.bn
        gamma = (bn.weight if bn.weight is not None
                 else jnp.ones_like(bn.running_mean))
        beta = (bn.bias if bn.bias is not None
                else jnp.zeros_like(bn.running_mean))
        return fuse_bn_weights(
            self.conv.weight, self.conv.bias,
            jax.lax.stop_gradient(bn.running_mean),
            jax.lax.stop_gradient(bn.running_var),
            bn.eps, gamma, beta,
        )

    def observe(self, x: SparseConvTensor) -> "QATConvBnReLU":
        """Return module with scales updated from this batch (EMA)."""
        out = self(x, training=True)
        feats = jnp.where(out.valid_mask[:, None], out.features, 0)
        amax = jnp.max(jnp.abs(feats.astype(jnp.float32)))
        w, _ = self.folded_weight_bias()
        w = w.astype(jnp.float32)
        wmax = jnp.max(jnp.abs(w.reshape(w.shape[0], -1)), axis=1)
        m = 0.95
        return self.replace(
            act_scale=m * self.act_scale + (1 - m) * amax / 127.0,
            w_scale=m * self.w_scale + (1 - m) * wmax / 127.0,
        )

    def __call__(self, x: SparseConvTensor, training: bool = False):
        w, b = self.folded_weight_bias()
        wq = fake_quant_per_channel(w, self.w_scale)
        conv = self.conv.replace(weight=wq, bias=b)
        out = conv(x)
        if self.relu:
            out = out.replace_feature(jax.nn.relu(out.features))
        # fake-quantize the activation (output scale)
        fq = fake_quant(out.features, self.act_scale)
        return out.replace_feature(
            jnp.where(out.valid_mask[:, None], fq, 0))


class QATQuantStub(Module):
    """Input fake-quant stub (parity: torch.ao ``QuantStub`` placed by
    ``prepare_qat``): learns the network INPUT scale by EMA so
    :func:`convert_qat` knows how to quantize real inputs."""

    def __init__(self, momentum: float = 0.95):
        self.scale = jnp.asarray(0.05, jnp.float32)
        self.momentum = momentum

    def observe_forward(self, x: SparseConvTensor):
        feats = jnp.where(x.valid_mask[:, None], x.features, 0)
        amax = jnp.max(jnp.abs(feats.astype(jnp.float32)))
        m = self.momentum
        new = self.replace(scale=m * self.scale + (1 - m) * amax / 127.0)
        return new, new(x)

    def __call__(self, x: SparseConvTensor, training: bool = False):
        fq = fake_quant(x.features, self.scale)
        return x.replace_feature(jnp.where(x.valid_mask[:, None], fq, 0))


def _observe_qat_conv(m: QATConvBnReLU, x: SparseConvTensor):
    """Functional scale-EMA + BN-running-stat update for one QAT module:
    returns ``(updated_module, output)``.  Jit-friendly (everything is a
    leaf update), so whole-net QAT training steps stay inside one jit —
    the reference instead relies on torch observer mutation
    (``intrinsic/qat/modules.py`` forward hooks)."""
    new = m
    if m.bn is not None:
        pre = m.conv(x)
        new = new.replace(bn=m.bn.updated(pre))
    out = new(x, training=True)
    feats = jnp.where(out.valid_mask[:, None], out.features, 0)
    amax = jnp.max(jnp.abs(feats.astype(jnp.float32)))
    w, _ = new.folded_weight_bias()
    w = w.astype(jnp.float32)
    wmax = jnp.max(jnp.abs(w.reshape(w.shape[0], -1)), axis=1)
    mom = 0.95
    new = new.replace(
        act_scale=mom * new.act_scale + (1 - mom) * amax / 127.0,
        w_scale=mom * new.w_scale + (1 - mom) * wmax / 127.0,
    )
    return new, out


def prepare_qat(seq) -> "object":
    """Whole-net QAT preparation (parity: ``prepare_qat_fx`` with the
    spconv backend config, ``quantization/backend_cfg.py:605-647`` +
    the fused QAT modules of ``intrinsic/qat/modules.py``).

    Structural rewrite of a ``SparseSequential``: a leading
    :class:`QATQuantStub` learns the input scale, and every
    conv(→bn)(→relu) chain becomes one :class:`QATConvBnReLU` with
    fake-quantized weights and activations.  Train the returned net as
    usual (grads flow via STE), interleaving :func:`qat_observe` (or
    calling it inside the jitted step) to EMA the scales, then
    :func:`convert_qat` emits the deployable int8 net."""
    from ..modules.conv import SparseConvolution
    from ..modules.modules import SparseReLU, SparseSequential

    assert isinstance(seq, SparseSequential), \
        "prepare_qat expects a SparseSequential (structural rewrite)"
    layers = list(seq.layers)
    out = [QATQuantStub()]
    i = 0
    while i < len(layers):
        l = layers[i]
        if isinstance(l, SparseConvolution):
            bn = None
            relu = False
            j = i + 1
            if j < len(layers) and isinstance(layers[j], BatchNorm1d):
                bn = layers[j]
                j += 1
            if j < len(layers) and isinstance(layers[j], SparseReLU):
                relu = True
                j += 1
            out.append(QATConvBnReLU(l, bn, relu=relu))
            i = j
        else:
            out.append(l)
            i += 1
    return SparseSequential(*out)


def qat_observe(seq, x: SparseConvTensor):
    """One observation forward through a prepared net: every QAT module's
    activation/weight scales EMA-update and BN running stats advance.
    Functional and jit-friendly — call inside the training step::

        def step(net, opt_state, x, y):
            net, _ = qat_observe(net, x)           # scale EMA
            loss, grads = filter_value_and_grad(loss_fn)(net, x, y)
            ...

    Returns ``(updated_net, output)``."""
    from ..modules.modules import SparseSequential, _accepts_training

    new_layers = []
    cur = x
    for layer in seq.layers:
        if isinstance(layer, QATQuantStub):
            layer, cur = layer.observe_forward(cur)
        elif isinstance(layer, QATConvBnReLU):
            layer, cur = _observe_qat_conv(layer, cur)
        elif _accepts_training(layer):
            cur = layer(cur, training=True)
        else:
            cur = layer(cur)
        new_layers.append(layer)
    return SparseSequential(*new_layers), cur


class QuantizedSequential(Module):
    """Deployable int8 net produced by :func:`convert_qat`: quantizes the
    input once, runs the int8 conv chain (non-conv layers pass through),
    dequantizes at the end (parity role: the converted fx graph of
    ``convert_fx`` + ``transform_qdq``)."""

    def __init__(self, input_scale: float, layers, out_scale: float):
        self.input_scale = float(input_scale)
        self.layers = layers
        self.out_scale = float(out_scale)

    def __call__(self, x: SparseConvTensor) -> SparseConvTensor:
        from .quantize import quantize_tensor

        cur = x.replace_feature(
            quantize_tensor(x.features, self.input_scale))
        cur.q_scale = jnp.float32(self.input_scale)
        for layer in self.layers:
            cur = layer(cur)
        out = cur.replace_feature(
            cur.features.astype(jnp.float32) * self.out_scale)
        out.q_scale = None
        return out


def convert_qat(seq) -> QuantizedSequential:
    """QAT net → int8 deployment net (parity: ``convert_fx`` with
    ``qmapping.py:45`` QAT→static mapping).  Scales chain: each int8
    conv consumes its predecessor's activation scale."""
    from ..modules.modules import SparseSequential

    assert isinstance(seq, SparseSequential)
    assert len(seq.layers) > 0 and isinstance(seq.layers[0], QATQuantStub), \
        "convert_qat expects a net built by prepare_qat (leading stub)"
    prev_scale = float(seq.layers[0].scale)
    input_scale = prev_scale
    out_layers = []
    for layer in seq.layers[1:]:
        if isinstance(layer, QATConvBnReLU):
            out_layers.append(finalize_qat(layer, prev_scale))
            prev_scale = float(layer.act_scale)
        else:
            out_layers.append(layer)
    return QuantizedSequential(input_scale, out_layers, prev_scale)


def finalize_qat(m: QATConvBnReLU, input_scale: float):
    """QAT → deployable int8 module (parity: ``qmapping.py`` QAT→static)."""
    from .fuse import fuse_conv_bn
    from .quantize import QuantizedSparseConv

    conv = m.conv
    if m.bn is not None:
        conv = fuse_conv_bn(conv, m.bn)
    return QuantizedSparseConv(
        conv,
        np.asarray(m.w_scale),
        float(input_scale),
        float(m.act_scale),
        act_type="relu" if m.relu else "none",
    )
