"""Int8 PTQ stack (parity: ``spconv/pytorch/quantization/`` — observers,
per-channel weight quant, quantized inference conv with fused
scale/bias/act/residual — re-architected without torch.ao/fx: calibration
and conversion are structural walks over ``SparseSequential`` nets).

Int8 semantics follow ``docs/TENSORRT_INT8_GUIDE.md`` + ``ops.py:1465-1525``:
weights per-channel int8, activations per-tensor int8, bias float,
``output_scale`` requantization, optional fused residual add
(``SparseConvAddReLU``).  The int8 GEMM accumulates in int32 on the MXU.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SparseConvTensor
from ..module import Module
from ..modules.conv import SparseConvolution
from ..modules.modules import BatchNorm1d, SparseReLU, SparseSequential
from ..ops.gather_gemm import _chunks, _clamp_pairs, _zero_pad
from .fuse import fuse_conv_bn

__all__ = [
    "MinMaxObserver",
    "PerChannelMinMaxObserver",
    "quantize_weight_per_channel",
    "quantize_tensor",
    "dequantize",
    "QuantizedSparseConv",
    "SparseConvAddReLU",
    "calibrate",
    "convert_to_int8",
]


class MinMaxObserver:
    """Per-tensor symmetric int8 observer (parity: ``fake_q.py:25-102``
    sparse-aware observers operating on ``.features``)."""

    def __init__(self):
        self.amax = 0.0

    def observe(self, x):
        if isinstance(x, SparseConvTensor):
            feats, mask = x.features, np.asarray(x.valid_mask)
            vals = np.asarray(feats, np.float32)[mask]
        else:
            vals = np.asarray(x, np.float32)
        if vals.size:
            self.amax = max(self.amax, float(np.abs(vals).max()))

    @property
    def scale(self) -> float:
        return max(self.amax, 1e-8) / 127.0


class PerChannelMinMaxObserver:
    """Per-output-channel weight observer (KRSC axis 0)."""

    def __init__(self):
        self.amax = None

    def observe(self, w):
        w = np.asarray(w, np.float32)
        a = np.abs(w.reshape(w.shape[0], -1)).max(1)
        self.amax = a if self.amax is None else np.maximum(self.amax, a)

    @property
    def scale(self) -> np.ndarray:
        return np.maximum(self.amax, 1e-8) / 127.0


def quantize_tensor(x: jax.Array, scale: float) -> jax.Array:
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def quantize_weight_per_channel(w: jax.Array, scale: jax.Array) -> jax.Array:
    s = jnp.asarray(scale, jnp.float32).reshape((-1,) + (1,) * (w.ndim - 1))
    q = jnp.round(w.astype(jnp.float32) / s)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def dequantize(q: jax.Array, scale) -> jax.Array:
    return q.astype(jnp.float32) * jnp.asarray(scale, jnp.float32)


def _int8_gather_mm(feat_i8, weight_kv_i8, pair_fwd, subm_center):
    """Σ_k gather(feat)ᵀ... int8 × int8 → int32 accumulation on the MXU."""
    kv, n_out = pair_fwd.shape
    n_in = feat_i8.shape[0]
    c = feat_i8.shape[1]
    fz = jnp.concatenate(
        [feat_i8, jnp.zeros((1, c), jnp.int8)], axis=0)
    pf = _clamp_pairs(pair_fwd, n_in)
    if subm_center is not None:
        acc = jnp.dot(feat_i8, weight_kv_i8[subm_center],
                      preferred_element_type=jnp.int32)
        ks = [k for k in range(kv) if k != subm_center]
    else:
        acc = jnp.zeros((n_out, weight_kv_i8.shape[2]), jnp.int32)
        ks = list(range(kv))
    for chunk in _chunks(ks, n_out, c):
        ka = np.array(chunk)
        g = jnp.take(fz, pf[ka], axis=0)
        acc = acc + jnp.einsum("knc,kcd->nd", g, weight_kv_i8[ka],
                               preferred_element_type=jnp.int32)
    return acc


class QuantizedSparseConv(Module):
    """Int8 inference conv (parity: ``quantization/quantized/conv.py``
    SparseConv + the int8 implicit_gemm epilogue).

    Holds int8 KRSC weights, per-channel weight scales, float bias, the
    input scale it was calibrated for, and the output scale; computes
    ``act((int8gemm · s_in · s_w) + bias [+ add·s_add]) / s_out`` → int8.
    """

    def __init__(self, conv: SparseConvolution, weight_scale, input_scale,
                 output_scale, act_type: str = "none"):
        self.base = conv.replace(weight=jnp.zeros((1,), jnp.float32),
                                 bias=None)  # keep config, drop fp weights
        self.weight_i8 = quantize_weight_per_channel(conv.weight, weight_scale)
        self.weight_scale = jnp.asarray(weight_scale, jnp.float32)
        self.bias = (conv.bias.astype(jnp.float32)
                     if conv.bias is not None else None)
        self.input_scale = float(input_scale)
        self.output_scale = float(output_scale)
        self.act_type = act_type
        if conv.act_type != "none":
            self.act_type = conv.act_type

    def __call__(self, x: SparseConvTensor,
                 add_input: Optional[SparseConvTensor] = None,
                 add_scale: float = 1.0) -> SparseConvTensor:
        cfg = self.base
        assert x.features.dtype == jnp.int8, "input must be quantized int8"
        kv = int(np.prod(cfg.kernel_size))
        k_out = self.weight_i8.shape[0]
        c_in = self.weight_i8.shape[-1]
        wkv = jnp.transpose(self.weight_i8.reshape(k_out, kv, c_in), (1, 2, 0))

        from ..ops import coords as _C

        # fused int8 dynamic-gather kernels (quad-packed gather, int8
        # MXU GEMM, in-kernel scale/bias/act/residual/requant epilogue)
        # for subm AND strided convs on statically key-sorted input.
        # keys_sorted gate (ADVICE r2 medium): the fused kernels require
        # key-sorted rows and have no dynamic fallback — unflagged
        # tensors take the always-correct gather path below.
        fused_ok = (
            x.keys_sorted
            and not _C.use_pair_keys(x.spatial_shape, x.batch_size)
            and (jax.default_backend() != "cpu")
            and not cfg.transposed
        )
        scale = (self.input_scale * self.weight_scale
                 / self.output_scale)
        bias_q = (self.bias / self.output_scale
                  if self.bias is not None else None)
        if fused_ok and cfg.subm:
            from ..ops.pallas import sorted_conv as _SK
            from ..ops.pallas.dg_conv import (
                DGData, build_dg_pos, dg_rows_for, dg_subm_conv_q,
                dg_window_for)

            spatial_shape = tuple(int(v) for v in x.spatial_shape)
            rows = dg_rows_for(self.weight_i8.shape[-1],
                               self.weight_i8.shape[0])
            window = dg_window_for(rows)
            # stage-level reuse (mirrors SparseConvolution._call_dg):
            # the windowed binary search runs once per indice_key; every
            # later int8 subm layer of the stage reuses the cached
            # match-position table
            ck = DGData.cache_key(
                cfg.indice_key, cfg.kernel_size, cfg.dilation, window,
                rows=rows) if cfg.indice_key is not None else None
            rec = x.indice_dict.get(ck) if ck else None
            new_rec = None
            pos = None
            if rec is not None and isinstance(rec, DGData):
                keys, plans, pos = rec.keys, rec.plans, rec.pos
            else:
                keys, _ = _C.linearize(x.indices, x.spatial_shape,
                                       x.batch_size)
                deltas_np, _ = _SK.subm_key_deltas(
                    cfg.kernel_size, cfg.dilation, spatial_shape)
                groups = _SK.sk_groups(cfg.kernel_size,
                                       include_center=True)
                sent_i = int(np.prod(spatial_shape)) * int(x.batch_size)
                np_t, n_pad = _SK._n_pad_for(
                    keys.shape[0], 128 * rows, window)
                plans = _SK.build_sk_plans(
                    _SK._pad_rows(keys, np_t, sent_i), sent_i,
                    deltas_np, groups, tile=128 * rows, window=window,
                    n_pad=n_pad, align=128)
                if rows > 1:
                    # a trainable fp layer sharing this indice_key reads
                    # plans[1] at tile=128 for its backward — mirror the
                    # conv.py rows>1 rebuild so the cached record is safe
                    # for both consumers (ADVICE r3)
                    np_t1, n_pad1 = _SK._n_pad_for(keys.shape[0], 128,
                                                   window)
                    _, plan_bwd = _SK.build_sk_plans(
                        _SK._pad_rows(keys, np_t1, sent_i), sent_i,
                        deltas_np, groups, tile=128, window=window,
                        n_pad=n_pad1, align=128)
                    plans = (plans[0], plan_bwd)
                if ck:
                    pos = build_dg_pos(
                        keys, plans[0], ksize=cfg.kernel_size,
                        dilation=cfg.dilation,
                        spatial_shape=spatial_shape,
                        batch_size=x.batch_size, window=window,
                        rows=rows,
                        interpret=jax.default_backend() == "cpu")
                    new_rec = DGData(
                        keys, plans, ksize=cfg.kernel_size,
                        dilation=cfg.dilation,
                        spatial_shape=spatial_shape, window=window,
                        pos=pos)
            q = dg_subm_conv_q(
                x.features, keys, self.weight_i8, scale, bias_q,
                spatial_shape=spatial_shape,
                batch_size=x.batch_size, dilation=cfg.dilation,
                act=self.act_type, out_dtype=jnp.int8,
                add_features=(add_input.features
                              if add_input is not None else None),
                add_scale=float(add_scale) / self.output_scale,
                window=window, rows_per_tile=rows, plans=plans,
                pos=pos,
            )
            valid = x.indices[:, 0] >= 0
            q = jnp.where(valid[:, None], q, 0)
            out = SparseConvTensor(
                q, x.indices, x.spatial_shape, x.batch_size,
                num_voxels=x.num_voxels,
                indice_dict=dict(x.indice_dict), keys_sorted=True)
            if new_rec is not None:
                out.indice_dict[ck] = new_rec
            return out
        if fused_ok and cfg.inverse and add_input is None:
            from ..ops.pallas.dg_conv import dg_regular_conv_q
            from ..ops.pallas.sorted_conv import SKRegData

            spatial_shape = tuple(int(v) for v in x.spatial_shape)
            rec = x.indice_dict.get(f"__dgreg__{cfg.indice_key}")
            enc_in = x.indice_dict.get(f"__dgreg_in__{cfg.indice_key}")
            if (isinstance(rec, SKRegData) and not rec.transposed
                    and rec.ksize == cfg.kernel_size
                    and rec.out_shape == spatial_shape
                    and enc_in is not None):
                q, _ = dg_regular_conv_q(
                    x.features, rec.in_keys, rec.out_keys,
                    self.weight_i8, scale, bias_q,
                    in_shape=rec.in_shape, out_shape=rec.out_shape,
                    batch_size=x.batch_size, stride=rec.stride,
                    padding=rec.padding, dilation=rec.dilation,
                    act=self.act_type, out_dtype=jnp.int8,
                    inverse=True, window=rec.window, plans=rec.plans)
                valid = enc_in[:, 0] >= 0
                q = jnp.where(valid[:, None], q, 0)
                return SparseConvTensor(
                    q, enc_in, rec.in_shape, x.batch_size,
                    num_voxels=jnp.sum(valid.astype(jnp.int32)),
                    indice_dict=dict(x.indice_dict), keys_sorted=True)

        if fused_ok and not cfg.inverse and add_input is None:
            from ..ops.pallas.dg_conv import (
                dg_regular_conv_q, dg_rows_for)
            from ..ops.pallas.sorted_conv import SKRegData
            from ..ops.rulebook import build_conv_outputs

            spatial_shape = tuple(int(v) for v in x.spatial_shape)
            out_shape = tuple(int(v) for v in _C.get_conv_output_size(
                spatial_shape, cfg.kernel_size, cfg.stride, cfg.padding,
                cfg.dilation))
            rows = dg_rows_for(self.weight_i8.shape[-1],
                               self.weight_i8.shape[0])
            window = 384 if rows == 1 else 256 + 256 * rows
            ck = (f"__dgreg__{cfg.indice_key}"
                  if cfg.indice_key is not None else None)
            rec = x.indice_dict.get(ck) if ck else None
            if (isinstance(rec, SKRegData)
                    and rec.ksize == cfg.kernel_size
                    and rec.stride == cfg.stride
                    and rec.padding == cfg.padding
                    and rec.dilation == cfg.dilation
                    and rec.in_shape == spatial_shape
                    and not rec.transposed
                    and rec.tile == 128 * rows
                    and rec.window == window):
                in_keys, out_keys = rec.in_keys, rec.out_keys
                out_indices, num_out = rec.out_indices, rec.num_out
                plans = rec.plans
            else:
                rec = None
                out_indices, out_keys, num_out, _total = build_conv_outputs(
                    x.indices, spatial_shape=spatial_shape,
                    batch_size=x.batch_size, ksize=cfg.kernel_size,
                    stride=cfg.stride, padding=cfg.padding,
                    dilation=cfg.dilation,
                    out_bound=cfg._resolve_out_bound(x.indices.shape[0]))
                in_keys, _ = _C.linearize(x.indices, spatial_shape,
                                          x.batch_size)
                plans = None
            q, plans = dg_regular_conv_q(
                x.features, in_keys, out_keys, self.weight_i8, scale,
                bias_q, in_shape=spatial_shape, out_shape=out_shape,
                batch_size=x.batch_size, stride=cfg.stride,
                padding=cfg.padding, dilation=cfg.dilation,
                act=self.act_type, out_dtype=jnp.int8, window=window,
                rows_per_tile=rows, plans=plans)
            valid = out_indices[:, 0] >= 0
            q = jnp.where(valid[:, None], q, 0)
            out = SparseConvTensor(
                q, out_indices, out_shape, x.batch_size,
                num_voxels=num_out, indice_dict=dict(x.indice_dict),
                keys_sorted=True)
            if ck and rec is None:
                out.indice_dict[ck] = SKRegData(
                    in_keys, out_keys, out_indices, num_out, plans,
                    ksize=cfg.kernel_size, stride=cfg.stride,
                    padding=cfg.padding, dilation=cfg.dilation,
                    in_shape=spatial_shape, out_shape=out_shape,
                    tile=128 * rows, window=window, transposed=False,
                    output_padding=cfg.output_padding)
                # a paired int8 inverse conv outputs THESE input rows
                out.indice_dict[f"__dgreg_in__{cfg.indice_key}"] = \
                    x.indices
            return out

        if cfg.subm:
            from ..ops.rulebook import build_subm_rulebook

            data = x.find_indice_pair(cfg.indice_key)
            if data is None:
                data = build_subm_rulebook(
                    x.indices, spatial_shape=x.spatial_shape,
                    batch_size=x.batch_size, ksize=cfg.kernel_size,
                    dilation=cfg.dilation)
            pair_fwd = data.pair_fwd
            out_indices, out_shape = x.indices, x.spatial_shape
            center = kv // 2
            num_out = x.num_voxels
        elif cfg.inverse:
            # structural inverse on the gather path: swap pair roles;
            # outputs are the encoder's inputs (reference conv.py:348-363)
            data = x.find_indice_pair(cfg.indice_key)
            assert data is not None and not data.is_subm, (
                f"int8 SparseInverseConv requires a cached rulebook "
                f"under indice_key={cfg.indice_key!r}")
            assert tuple(data.ksize) == cfg.kernel_size
            pair_fwd = data.pair_bwd
            out_indices, out_shape = data.indices, data.spatial_shape
            center = None
            valid_in = out_indices[:, 0] >= 0
            num_out = jnp.sum(valid_in.astype(jnp.int32))
        else:
            from ..ops.rulebook import build_conv_rulebook

            data = x.find_indice_pair(cfg.indice_key)
            if data is None or data.is_subm:
                data = build_conv_rulebook(
                    x.indices, spatial_shape=x.spatial_shape,
                    batch_size=x.batch_size, ksize=cfg.kernel_size,
                    stride=cfg.stride, padding=cfg.padding,
                    dilation=cfg.dilation, transposed=cfg.transposed,
                    out_bound=cfg._resolve_out_bound(x.indices.shape[0]))
            pair_fwd = data.pair_fwd
            out_indices, out_shape = data.out_indices, data.out_spatial_shape
            center = None
            num_out = data.num_out

        acc = _int8_gather_mm(x.features, wkv, pair_fwd, center)
        scale = self.input_scale * self.weight_scale  # [K]
        outf = acc.astype(jnp.float32) * scale
        if self.bias is not None:
            outf = outf + self.bias
        if add_input is not None:
            outf = outf + add_input.features.astype(jnp.float32) * add_scale
        if self.act_type == "relu":
            outf = jax.nn.relu(outf)
        q = jnp.clip(jnp.round(outf / self.output_scale), -127, 127)
        valid = out_indices[:, 0] >= 0
        q = jnp.where(valid[:, None], q, 0).astype(jnp.int8)
        if cfg.subm:
            sorted_out = x.keys_sorted
        elif cfg.inverse:
            # inverse outputs = the encoder's input rows
            sorted_out = bool(getattr(data, "in_sorted", False))
        else:
            sorted_out = True
        out = SparseConvTensor(
            q, out_indices, out_shape, x.batch_size, num_voxels=num_out,
            indice_dict=dict(x.indice_dict),
            keys_sorted=sorted_out)
        if cfg.indice_key is not None and cfg.indice_key not in out.indice_dict:
            out.indice_dict[cfg.indice_key] = data
        return out


class SparseConvAddReLU(QuantizedSparseConv):
    """Residual-fused int8 conv (parity:
    ``intrinsic/quantized/conv_relu.py`` SparseConvAddReLU)."""

    def __init__(self, conv, weight_scale, input_scale, output_scale):
        super().__init__(conv, weight_scale, input_scale, output_scale,
                         act_type="relu")


def calibrate(seq: SparseSequential, inputs: List[SparseConvTensor]):
    """Run calibration data through a sequential net, recording per-layer
    activation ranges.  Returns (fused_seq, act_observers) where
    ``fused_seq`` has BN folded (quantization always operates on the
    fused graph, as in the reference's prepare_fx pipeline)."""
    from .fuse import fuse_bn_act_in_sequential

    fused = fuse_bn_act_in_sequential(seq)
    observers = [MinMaxObserver() for _ in range(len(fused.layers) + 1)]
    for x in inputs:
        observers[0].observe(x)
        cur = x
        for i, layer in enumerate(fused.layers):
            cur = layer(cur)
            observers[i + 1].observe(cur)
    return fused, observers


def convert_to_int8(fused: SparseSequential, observers) -> SparseSequential:
    """Swap fp convs for QuantizedSparseConv using calibration scales."""
    out = []
    for i, layer in enumerate(fused.layers):
        if isinstance(layer, SparseConvolution):
            wobs = PerChannelMinMaxObserver()
            wobs.observe(layer.weight)
            out.append(
                QuantizedSparseConv(
                    layer,
                    wobs.scale,
                    observers[i].scale,
                    observers[i + 1].scale,
                )
            )
        else:
            out.append(layer)
    return SparseSequential(*out)
