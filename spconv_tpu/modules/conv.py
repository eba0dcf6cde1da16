"""Sparse convolution modules.

API parity with ``spconv/pytorch/conv.py`` (SURVEY.md §2.1): the full
``SparseConvolution`` family — ``SubMConv{1-4}d``, ``SparseConv{1-4}d``,
``SparseConvTranspose{1-4}d``, ``SparseInverseConv{1-4}d`` — including
1×1-conv fast path, submanifold rulebook reuse via ``indice_key``
(``conv.py:272-277``), inverse conv via swapped fwd/bwd pairs
(``conv.py:348-363``), KRSC weight layout (``constants.py:42``) and the
reference's kaiming init fan convention (``conv.py:705-750``).

TPU-native differences: modules are pytrees; rulebooks are bounded
static-shape buffers; outputs are explicitly masked so the
invalid-rows-are-zero invariant (and its gradient counterpart) holds.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SparseConvTensor, IndiceData, expand_nd
from ..module import Module
from ..ops import coords as C
from ..ops.epilogue import bias_add_act
from ..ops.gather_gemm import indice_conv
from ..ops.rulebook import build_conv_rulebook, build_subm_rulebook

__all__ = [
    "SparseConvolution",
    "SparseConv1d", "SparseConv2d", "SparseConv3d", "SparseConv4d",
    "SubMConv1d", "SubMConv2d", "SubMConv3d", "SubMConv4d",
    "SparseConvTranspose1d", "SparseConvTranspose2d", "SparseConvTranspose3d",
    "SparseConvTranspose4d",
    "SparseInverseConv1d", "SparseInverseConv2d", "SparseInverseConv3d",
    "SparseInverseConv4d",
]

_INIT_SEED = [0]


def _next_key(key):
    if key is not None:
        return key
    _INIT_SEED[0] += 1
    return jax.random.PRNGKey(_INIT_SEED[0])


class SparseConvolution(Module):
    """Base sparse convolution (parity: ``conv.py:563`` SparseConvolution)."""

    def __init__(
        self,
        ndim: int,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, Sequence[int]] = 3,
        stride: Union[int, Sequence[int]] = 1,
        padding: Union[int, Sequence[int]] = 0,
        dilation: Union[int, Sequence[int]] = 1,
        groups: int = 1,
        bias: bool = True,
        subm: bool = False,
        output_padding: Union[int, Sequence[int]] = 0,
        transposed: bool = False,
        inverse: bool = False,
        indice_key: Optional[str] = None,
        algo: Optional[str] = None,
        fp32_accum: Optional[bool] = None,
        out_bound: Optional[int] = None,
        out_bound_ratio: float = 2.0,
        act_type: str = "none",
        act_alpha: float = 0.0,
        act_beta: float = 0.0,
        dtype=jnp.float32,
        key=None,
        name: Optional[str] = None,
    ):
        assert groups == 1, "groups are not supported"
        self.ndim = ndim
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = expand_nd(ndim, kernel_size)
        self.stride = expand_nd(ndim, stride)
        self.padding = expand_nd(ndim, padding)
        self.dilation = expand_nd(ndim, dilation)
        self.output_padding = expand_nd(ndim, output_padding)
        kv = int(np.prod(self.kernel_size))
        kv_stride = int(np.prod(self.stride))
        self.conv1x1 = kv == 1
        if not subm:
            self.conv1x1 = self.conv1x1 and kv_stride == 1
            if self.conv1x1:
                assert self.padding == (0,) * ndim, \
                    "padding must be zero for 1x1 conv (k=1, s=1)"
        self.transposed = transposed
        self.inverse = inverse
        self.subm = subm
        self.indice_key = indice_key
        self.algo = algo or "native"
        self.fp32_accum = True if fp32_accum is None else fp32_accum
        self.out_bound = out_bound
        self.out_bound_ratio = out_bound_ratio
        self.act_type = act_type
        self.act_alpha = act_alpha
        self.act_beta = act_beta
        self.name = name
        if subm:
            assert all(k % 2 == 1 for k in self.kernel_size), \
                "subm conv requires odd kernel size"

        # KRSC weight [K, *ksize, C] — reference 2.2+ layout (conv.py:129).
        key = _next_key(key)
        wkey, bkey = jax.random.split(key)
        fan_in = in_channels * kv
        # kaiming uniform, a=sqrt(5) (matches reference custom KRSC init,
        # conv.py:705-750, == torch Conv default bounds)
        gain = math.sqrt(2.0 / (1 + 5.0))
        bound = math.sqrt(3.0) * gain / math.sqrt(fan_in)
        self.weight = jax.random.uniform(
            wkey, (out_channels, *self.kernel_size, in_channels),
            dtype=jnp.float32, minval=-bound, maxval=bound,
        ).astype(dtype)
        if bias:
            bb = 1.0 / math.sqrt(fan_in)
            self.bias = jax.random.uniform(
                bkey, (out_channels,), dtype=jnp.float32, minval=-bb, maxval=bb
            ).astype(dtype)
        else:
            self.bias = None

    # ------------------------------------------------------------------
    def _resolve_out_bound(self, n_in: int) -> int:
        if self.out_bound is not None:
            return self.out_bound
        if self.transposed:
            # transposed convs expand the active set by up to prod(stride)×
            ratio = max(self.out_bound_ratio,
                        2.0 * float(np.prod(self.stride)))
        elif all(s == 1 for s in self.stride):
            ratio = max(self.out_bound_ratio, 2.0)
        else:
            ratio = self.out_bound_ratio
        b = int(n_in * ratio)
        return max(128, -(-b // 128) * 128)  # pad to lane multiple

    def __call__(
        self,
        input: SparseConvTensor,
        add_input: Optional[SparseConvTensor] = None,
    ) -> SparseConvTensor:
        assert isinstance(input, SparseConvTensor)
        features = input.features
        indices = input.indices
        spatial_shape = input.spatial_shape
        batch_size = input.batch_size

        if self.conv1x1:
            # plain matmul fast path (conv.py:225-241)
            w = self.weight.reshape(self.out_channels, self.in_channels)
            out_feat = jnp.dot(
                features, w.T,
                preferred_element_type=jnp.float32 if self.fp32_accum else None,
            ).astype(features.dtype)
            out_feat = bias_add_act(
                out_feat, self.bias, self.act_type, self.act_alpha,
                self.act_beta,
                add_input.features if add_input is not None else None,
            )
            out_feat = jnp.where(input.valid_mask[:, None], out_feat, 0)
            out = input.shadow_copy()
            out.features = out_feat
            return out

        if self.inverse:
            data = input.find_indice_pair(self.indice_key)
            assert data is not None, (
                f"SparseInverseConv requires a cached rulebook under "
                f"indice_key={self.indice_key!r}"
            )
            assert not data.is_subm and tuple(data.ksize) == self.kernel_size, (
                "inverse conv must reuse a non-subm rulebook with the same "
                f"kernel size, got {data.ksize} vs {self.kernel_size}"
            )
            # structural inverse: swap pair roles; outputs are the encoder's
            # inputs (conv.py:348-363, docs/USAGE.md:124-146)
            pair_fwd, pair_bwd = data.pair_bwd, data.pair_fwd
            out_indices = data.indices
            out_spatial_shape = data.spatial_shape
            new_data = None
            is_subm = False
        elif self.subm:
            data = input.find_indice_pair(self.indice_key)
            if data is not None:
                assert data.is_subm and tuple(data.ksize) == self.kernel_size, (
                    f"subm rulebook reuse mismatch under key "
                    f"{self.indice_key!r}: {data.ksize} vs {self.kernel_size}"
                )
                new_data = None
            else:
                data = build_subm_rulebook(
                    indices,
                    spatial_shape=spatial_shape,
                    batch_size=batch_size,
                    ksize=self.kernel_size,
                    dilation=self.dilation,
                )
                new_data = data
            pair_fwd, pair_bwd = data.pair_fwd, data.pair_bwd
            out_indices = indices
            out_spatial_shape = spatial_shape
            is_subm = True
        else:
            data = input.find_indice_pair(self.indice_key)
            if data is not None and not data.is_subm:
                new_data = None
            else:
                data = build_conv_rulebook(
                    indices,
                    spatial_shape=spatial_shape,
                    batch_size=batch_size,
                    ksize=self.kernel_size,
                    stride=self.stride,
                    padding=self.padding,
                    dilation=self.dilation,
                    out_padding=self.output_padding,
                    transposed=self.transposed,
                    out_bound=self._resolve_out_bound(indices.shape[0]),
                )
                new_data = data
            pair_fwd, pair_bwd = data.pair_fwd, data.pair_bwd
            out_indices = data.out_indices
            out_spatial_shape = data.out_spatial_shape
            is_subm = False
            from ..calibrate import _maybe_record

            _maybe_record(self, data.num_out)

        out_feat = indice_conv(
            features,
            self.weight,
            pair_fwd,
            pair_bwd,
            is_subm=is_subm,
            fp32_accum=self.fp32_accum,
            algo=self.algo,
        )
        out_valid = out_indices[:, 0] >= 0
        out_feat = bias_add_act(
            out_feat, self.bias, self.act_type, self.act_alpha, self.act_beta,
            add_input.features if add_input is not None else None,
        )
        out_feat = jnp.where(out_valid[:, None], out_feat, 0)

        out = SparseConvTensor(
            out_feat,
            out_indices,
            out_spatial_shape,
            batch_size,
            num_voxels=data.num_out if not is_subm else input.num_voxels,
            indice_dict=dict(input.indice_dict),
            benchmark=input.benchmark,
        )
        if new_data is not None and self.indice_key is not None:
            out.indice_dict[self.indice_key] = new_data
        return out

    def __repr__(self):
        kind = (
            "SubMConv" if self.subm
            else "SparseInverseConv" if self.inverse
            else "SparseConvTranspose" if self.transposed
            else "SparseConv"
        )
        return (
            f"{kind}{self.ndim}d({self.in_channels}, {self.out_channels}, "
            f"kernel_size={self.kernel_size}, stride={self.stride}, "
            f"padding={self.padding})"
        )


def _make_variant(n, *, subm=False, transposed=False, inverse=False):
    def __init__(
        self, in_channels, out_channels, kernel_size=3,
        stride=1, padding=0, dilation=1, groups=1, bias=True,
        indice_key=None, algo=None, fp32_accum=None, output_padding=0,
        out_bound=None, out_bound_ratio=2.0, act_type="none", act_alpha=0.0,
        act_beta=0.0, dtype=jnp.float32, key=None, name=None,
    ):
        if inverse:
            assert indice_key is not None, "inverse conv requires indice_key"
        SparseConvolution.__init__(
            self, n, in_channels, out_channels, kernel_size,
            stride=stride, padding=padding, dilation=dilation, groups=groups,
            bias=bias, subm=subm, output_padding=output_padding,
            transposed=transposed, inverse=inverse, indice_key=indice_key,
            algo=algo, fp32_accum=fp32_accum, out_bound=out_bound,
            out_bound_ratio=out_bound_ratio, act_type=act_type,
            act_alpha=act_alpha, act_beta=act_beta, dtype=dtype, key=key,
            name=name,
        )

    return __init__


class SparseConv1d(SparseConvolution):
    __init__ = _make_variant(1)


class SparseConv2d(SparseConvolution):
    __init__ = _make_variant(2)


class SparseConv3d(SparseConvolution):
    __init__ = _make_variant(3)


class SparseConv4d(SparseConvolution):
    __init__ = _make_variant(4)


class SubMConv1d(SparseConvolution):
    __init__ = _make_variant(1, subm=True)


class SubMConv2d(SparseConvolution):
    __init__ = _make_variant(2, subm=True)


class SubMConv3d(SparseConvolution):
    __init__ = _make_variant(3, subm=True)


class SubMConv4d(SparseConvolution):
    __init__ = _make_variant(4, subm=True)


class SparseConvTranspose1d(SparseConvolution):
    __init__ = _make_variant(1, transposed=True)


class SparseConvTranspose2d(SparseConvolution):
    __init__ = _make_variant(2, transposed=True)


class SparseConvTranspose3d(SparseConvolution):
    __init__ = _make_variant(3, transposed=True)


class SparseConvTranspose4d(SparseConvolution):
    __init__ = _make_variant(4, transposed=True)


class SparseInverseConv1d(SparseConvolution):
    __init__ = _make_variant(1, inverse=True)


class SparseInverseConv2d(SparseConvolution):
    __init__ = _make_variant(2, inverse=True)


class SparseInverseConv3d(SparseConvolution):
    __init__ = _make_variant(3, inverse=True)


class SparseInverseConv4d(SparseConvolution):
    __init__ = _make_variant(4, inverse=True)
