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
           "finalize_qat"]


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
    (parity: SpconvConvBnReLUnd QAT module).  BN runs unfolded during
    training (batch stats); :func:`finalize_qat` folds it and emits a
    ``QuantizedSparseConv``.

    Activation/weight scales are updated as running amax estimates on
    each call when ``training=True`` (returned via ``.updated_scales``).
    """

    def __init__(self, conv: SparseConvolution, bn: Optional[BatchNorm1d],
                 relu: bool = True):
        self.conv = conv
        self.bn = bn
        self.relu = relu
        k = conv.weight.shape[0]
        self.w_scale = jnp.full((k,), 0.05, jnp.float32)
        self.act_scale = jnp.asarray(0.05, jnp.float32)

    def observe(self, x: SparseConvTensor) -> "QATConvBnReLU":
        """Return module with scales updated from this batch (EMA)."""
        out = self(x, training=True)
        feats = jnp.where(out.valid_mask[:, None], out.features, 0)
        amax = jnp.max(jnp.abs(feats.astype(jnp.float32)))
        w = self.conv.weight.astype(jnp.float32)
        wmax = jnp.max(jnp.abs(w.reshape(w.shape[0], -1)), axis=1)
        m = 0.95
        return self.replace(
            act_scale=m * self.act_scale + (1 - m) * amax / 127.0,
            w_scale=m * self.w_scale + (1 - m) * wmax / 127.0,
        )

    def __call__(self, x: SparseConvTensor, training: bool = False):
        wq = fake_quant_per_channel(self.conv.weight, self.w_scale)
        conv = self.conv.replace(weight=wq)
        out = conv(x)
        if self.bn is not None:
            out = self.bn(out, training=training)
        if self.relu:
            out = out.replace_feature(jax.nn.relu(out.features))
        # fake-quantize the activation (output scale)
        fq = fake_quant(out.features, self.act_scale)
        return out.replace_feature(
            jnp.where(out.valid_mask[:, None], fq, 0))


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
