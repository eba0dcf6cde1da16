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
        # None/"auto" resolves per call via the tuner (reference parity:
        # ConvAlgo auto-selection, conv.py:110-125; tuner cache-key design
        # convops.py:1283-1301).  The reference's ConvAlgo enum values are
        # accepted as a drop-in shim.
        if algo is not None and not isinstance(algo, str):
            algo = getattr(algo, "value", algo)
        from ..constants import SPCONV_DEFAULT_ALGO

        self.algo = algo or SPCONV_DEFAULT_ALGO
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
        training: bool = False,
    ) -> SparseConvTensor:
        """Forward, wrapped in a ``jax.named_scope`` so profiler traces
        attribute device time per layer, with per-layer voxel counts
        recorded under ``benchmark=True`` (parity: the reference's
        benchmark mode, ``conv.py:201-224,253-256,494-501``).

        ``training`` feeds the ``algo="auto"`` resolution: the tuner
        keeps separate winners for inference (forward-only) and training
        (forward+backward), mirroring the reference's per-op-type tuned
        caches (kForward / kBackwardInput / kBackwardWeight,
        ``convops.py:1283-1301``) — in JAX the whole differentiated call
        runs one algorithm, so the training key selects the algo whose
        *combined* fwd+bwd time wins."""
        name = self.name or type(self).__name__
        eager_bench = (input.benchmark
                       and not isinstance(input.features, jax.core.Tracer))
        if eager_bench:
            import time as _time

            jax.block_until_ready(input.features)
            _t0 = _time.perf_counter()
        with jax.named_scope(name):
            out = self._forward(input, add_input, training=training)
        time_ms = None
        if eager_bench:
            jax.block_until_ready(out.features)
            time_ms = (_time.perf_counter() - _t0) * 1000
        if input.benchmark:
            from .modules import record_benchmark_layer

            # records accumulate down the chain: each layer's output is a
            # fresh tensor, so carry the producer's records forward
            for k, v in input.benchmark_record.items():
                out.benchmark_record.setdefault(k, v)
            num_pairs = None
            if not isinstance(input.features, jax.core.Tracer):
                # exact pair count (→ MAC count) on eager passes: the 1×1
                # path touches every active row once; rulebook paths read
                # the cached pair table when one exists (native algo)
                if self.conv1x1:
                    num_pairs = input.num_voxels
                elif self.indice_key is not None:
                    data = out.find_indice_pair(self.indice_key)
                    if data is not None and hasattr(data, "pair_fwd"):
                        num_pairs = jnp.sum(
                            (data.pair_fwd >= 0).astype(jnp.int32))
            record_benchmark_layer(
                out, name, self, n_in=input.num_voxels,
                n_out=out.num_voxels, num_pairs=num_pairs,
                time_ms=time_ms,
            )
        return out

    def _forward(
        self,
        input: SparseConvTensor,
        add_input: Optional[SparseConvTensor] = None,
        training: bool = False,
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

        algo = self.algo
        if algo == "auto":
            from ..tuner import CONV_TUNER

            kv = int(np.prod(self.kernel_size))
            # auto only picks the sorted-key kernels when sortedness is
            # STATICALLY known (keys_sorted) — then no lax.cond fallback
            # branch is compiled.  Explicit algo="sk" on an unflagged
            # tensor still works through the dynamic fallback.
            sk_ok = ((self._sk_supported(input) and input.keys_sorted)
                     or self._sk_reg_supported(input))
            dg_ok = self._dg_supported(input)
            sig = dict(n=int(indices.shape[0]), c=self.in_channels,
                       k=self.out_channels, kv=kv,
                       dtype=str(features.dtype), training=training)
            if (
                CONV_TUNER.tune_enabled
                and not isinstance(features, jax.core.Tracer)
                and not CONV_TUNER.has_algo(**sig)
            ):
                # tune-on-first-call: measure every supported candidate
                # on the live tensor, cache the winner (reference
                # ConvTunerSimple semantics, convops.py:1283-1301);
                # training keys measure value_and_grad, not just forward
                cands = ["native"] + (["sk"] if sk_ok else []) \
                    + (["dg"] if dg_ok else [])
                algo = CONV_TUNER.tune_conv_algo(self, input, cands,
                                                 **sig)
            else:
                algo = CONV_TUNER.select_algo(
                    subm=self.subm, sk_supported=sk_ok,
                    dg_supported=dg_ok, **sig,
                )

        if algo == "dg" and self._dg_supported(input):
            if self.subm:
                return self._call_dg(input, add_input)
            return self._call_dg_regular(input, add_input)
        if algo == "sk" and self._sk_supported(input):
            return self._call_sk(input, add_input)
        if algo == "sk" and self._sk_reg_supported(input):
            return self._call_sk_regular(input, add_input)
        if algo in ("sk", "dg"):
            # requested specialized path not applicable here — use the
            # native gather path for the compute
            algo = "native"

        if self.inverse:
            data = input.find_indice_pair(self.indice_key)
            if data is None:
                # The encoder may have run on the sorted-key path, which
                # stores an SKRegData record instead of an IndiceData
                # rulebook.  Rebuild the encoder's rulebook from the
                # cached encoder-input indices so an explicitly-native
                # (or f32 / tuned-native) inverse still works (ADVICE r2
                # medium: this previously hit the assert below even
                # though the encoder ran).
                from ..ops.pallas.sorted_conv import SKRegData

                skrec = input.indice_dict.get(f"__skreg__{self.indice_key}")
                enc_in = input.indice_dict.get(
                    f"__skreg_in__{self.indice_key}")
                if skrec is None:
                    # ... or on the dynamic-gather path (same record
                    # class, 128-aligned plans, __dgreg__ namespace)
                    skrec = input.indice_dict.get(
                        f"__dgreg__{self.indice_key}")
                    enc_in = input.indice_dict.get(
                        f"__dgreg_in__{self.indice_key}")
                if isinstance(skrec, SKRegData) and enc_in is not None:
                    data = build_conv_rulebook(
                        enc_in,
                        spatial_shape=skrec.in_shape,
                        batch_size=batch_size,
                        ksize=skrec.ksize,
                        stride=skrec.stride,
                        padding=skrec.padding,
                        dilation=skrec.dilation,
                        out_padding=skrec.output_padding,
                        transposed=skrec.transposed,
                        out_bound=skrec.out_keys.shape[0],
                    )
                    # the encoder ran the sorted-key path, which requires
                    # key-sorted input rows — so this inverse's outputs
                    # (= those rows) are sorted
                    data.in_sorted = True
            assert data is not None, (
                f"SparseInverseConv requires a cached rulebook under "
                f"indice_key={self.indice_key!r}"
            )
            # parity: _check_inverse_reuse_valid (conv.py:542-560) also
            # validates spatial shape and buffer N, not just ksize
            assert not data.is_subm and tuple(data.ksize) == self.kernel_size, (
                "inverse conv must reuse a non-subm rulebook with the same "
                f"kernel size, got {data.ksize} vs {self.kernel_size}"
            )
            assert tuple(data.out_spatial_shape) == tuple(spatial_shape), (
                f"inverse conv under indice_key={self.indice_key!r}: input "
                f"spatial shape {tuple(spatial_shape)} != encoder output "
                f"shape {tuple(data.out_spatial_shape)}"
            )
            assert data.pair_fwd.shape[1] == indices.shape[0], (
                f"inverse conv under indice_key={self.indice_key!r}: input "
                f"buffer N={indices.shape[0]} != encoder output buffer "
                f"N={data.pair_fwd.shape[1]}"
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
                # parity: _check_subm_reuse_valid (conv.py:525-540)
                assert data.is_subm and tuple(data.ksize) == self.kernel_size, (
                    f"subm rulebook reuse mismatch under key "
                    f"{self.indice_key!r}: {data.ksize} vs {self.kernel_size}"
                )
                assert tuple(data.dilation) == self.dilation, (
                    f"subm rulebook reuse mismatch under key "
                    f"{self.indice_key!r}: dilation {data.dilation} vs "
                    f"{self.dilation}"
                )
                assert tuple(data.spatial_shape) == tuple(spatial_shape), (
                    f"subm rulebook reuse mismatch under key "
                    f"{self.indice_key!r}: spatial shape "
                    f"{data.spatial_shape} vs {tuple(spatial_shape)}"
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
                # a regular conv may only reuse a rulebook built with
                # identical geometry — a key collision between two strided
                # layers would otherwise compute silently wrong outputs
                # (the reference forbids non-subm reuse outright except for
                # inverse; we allow it only on an exact match)
                if (
                    tuple(data.ksize) != self.kernel_size
                    or tuple(data.stride) != self.stride
                    or tuple(data.padding) != self.padding
                    or tuple(data.dilation) != self.dilation
                    or bool(data.transposed) != bool(self.transposed)
                    or tuple(data.spatial_shape) != tuple(spatial_shape)
                ):
                    raise ValueError(
                        f"rulebook reuse mismatch under indice_key="
                        f"{self.indice_key!r}: cached (ksize={data.ksize}, "
                        f"stride={data.stride}, padding={data.padding}, "
                        f"dilation={data.dilation}, "
                        f"transposed={data.transposed}, "
                        f"spatial={data.spatial_shape}) vs layer "
                        f"(ksize={self.kernel_size}, stride={self.stride}, "
                        f"padding={self.padding}, dilation={self.dilation}, "
                        f"transposed={self.transposed}, "
                        f"spatial={tuple(spatial_shape)})"
                    )
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
                # a paired inverse conv outputs THESE input rows — record
                # whether they are key-sorted so its output tensor can
                # carry the static flag
                data.in_sorted = bool(input.keys_sorted)
                new_data = data
            pair_fwd, pair_bwd = data.pair_fwd, data.pair_bwd
            out_indices = data.out_indices
            out_spatial_shape = data.out_spatial_shape
            is_subm = False
            from ..calibrate import _maybe_record

            _maybe_record(self, data.num_out)
            from ..debug_utils import maybe_assert_overflow

            maybe_assert_overflow(
                data.num_out_total, data.pair_fwd.shape[1],
                self.name or type(self).__name__)

        out_feat = indice_conv(
            features,
            self.weight,
            pair_fwd,
            pair_bwd,
            is_subm=is_subm,
            fp32_accum=self.fp32_accum,
            algo=algo,
        )
        out_valid = out_indices[:, 0] >= 0
        out_feat = bias_add_act(
            out_feat, self.bias, self.act_type, self.act_alpha, self.act_beta,
            add_input.features if add_input is not None else None,
        )
        out_feat = jnp.where(out_valid[:, None], out_feat, 0)

        if is_subm:
            out_num_voxels = input.num_voxels
            out_sorted = input.keys_sorted
        elif self.inverse:
            # the inverse conv outputs the encoder's INPUT sites, so the
            # count is num_in, not num_out (ADVICE r1: num_out here was the
            # inverse conv's own input count)
            out_num_voxels = data.num_in
            out_sorted = bool(getattr(data, "in_sorted", False))
        else:
            out_num_voxels = data.num_out
            # rulebook output discovery emits sites in ascending key order
            # with invalid rows at the tail (ops/rulebook.py:261)
            out_sorted = True
        out = SparseConvTensor(
            out_feat,
            out_indices,
            out_spatial_shape,
            batch_size,
            num_voxels=out_num_voxels,
            indice_dict=dict(input.indice_dict),
            benchmark=input.benchmark,
            keys_sorted=out_sorted,
            num_out_total=(None if (is_subm or self.inverse)
                           else data.num_out_total),
        )
        if new_data is not None and self.indice_key is not None:
            out.indice_dict[self.indice_key] = new_data
        return out

    # ------------------------------------------------------------------
    def _sk_supported(self, input: SparseConvTensor) -> bool:
        """The fused sorted-key kernel handles subm convs on single-word
        key grids (any ndim, odd ksize — guaranteed by subm)."""
        return (
            self.subm
            and not self.transposed
            and not self.inverse
            and not C.use_pair_keys(input.spatial_shape, input.batch_size)
        )

    def _sk_reg_supported(self, input: SparseConvTensor) -> bool:
        """Regular (strided) and inverse convs on single-word key grids;
        transposed convs stay on the rulebook path.

        Requires ``input.keys_sorted``: the regular-conv kernels have no
        dynamic fallback branch, so an unflagged (possibly unsorted)
        tensor must take the always-correct rulebook path (ADVICE r2
        high: unsorted inputs previously got silently wrong features)."""
        if self.subm or self.conv1x1:
            return False
        if not input.keys_sorted:
            return False
        if C.use_pair_keys(input.spatial_shape, input.batch_size):
            return False
        if self.inverse:
            from ..ops.pallas.sorted_conv import SKRegData

            data = input.indice_dict.get(f"__skreg__{self.indice_key}")
            return isinstance(data, SKRegData)
        if self.transposed:
            out_shape = C.get_deconv_output_size(
                input.spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation, self.output_padding)
        else:
            out_shape = C.get_conv_output_size(
                input.spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation)
        if any(v <= 0 for v in out_shape):
            return False
        return not C.use_pair_keys(out_shape, input.batch_size)

    def _dg_supported(self, input: SparseConvTensor) -> bool:
        """The dynamic-gather kernel family needs STATICALLY key-sorted
        input (it has no dynamic fallback branch at all) on single-word
        key grids; geometry support mirrors the SK family.  For inverse
        convs the encoder must have run the DG path (its 128-aligned
        plans are cached under ``__dgreg__``)."""
        if not input.keys_sorted:
            return False
        if self.subm:
            return self._sk_supported(input)
        if self.conv1x1:
            return False
        if C.use_pair_keys(input.spatial_shape, input.batch_size):
            return False
        if self.inverse:
            from ..ops.pallas.sorted_conv import SKRegData

            rec = input.indice_dict.get(f"__dgreg__{self.indice_key}")
            return isinstance(rec, SKRegData)
        if self.transposed:
            out_shape = C.get_deconv_output_size(
                input.spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation, self.output_padding)
        else:
            out_shape = C.get_conv_output_size(
                input.spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation)
        if any(v <= 0 for v in out_shape):
            return False
        return not C.use_pair_keys(out_shape, input.batch_size)

    def _dg_window_sig(self, input: SparseConvTensor, rows: int) -> dict:
        return dict(n=int(input.indices.shape[0]),
                    kv=int(np.prod(self.kernel_size)),
                    shape=tuple(int(s) for s in input.spatial_shape),
                    batch=int(input.batch_size), tile=128 * rows)

    def _tuned_dg_window(self, input: SparseConvTensor,
                         rows: int) -> Optional[int]:
        from ..tuner import CONV_TUNER

        return CONV_TUNER.get_dg_window(**self._dg_window_sig(input, rows))

    def _call_dg(
        self,
        input: SparseConvTensor,
        add_input: Optional[SparseConvTensor] = None,
    ) -> SparseConvTensor:
        """Dynamic-gather subm conv (``ops/pallas/dg_conv.py``): in-kernel
        binary search over windowed sorted keys + per-sublane lane
        gather; keys and 128-aligned window plans cache per
        (indice_key, geometry)."""
        from ..ops.pallas import dg_conv as DG
        from ..ops.pallas import sorted_conv as SK
        from ..ops.pallas.dg_conv import dg_rows_for, dg_window_for

        features = input.features
        indices = input.indices
        spatial_shape = tuple(int(s) for s in input.spatial_shape)
        batch_size = input.batch_size
        rows = dg_rows_for(self.in_channels, self.out_channels)
        interpret = jax.default_backend() == "cpu"

        # window geometry: the measured default (384 at rows=1) wins on
        # v5e at every tested density (125k/914k scans + CenterPoint;
        # the offset-major gather flattened the old serial-sweep cost
        # that once favored wider windows).  A cached winner, written
        # only by an ON-DEVICE sweep (tools/probe_prefix.py style),
        # overrides — plan-statistics cost models proved unable to
        # predict silicon and were retired in round 4.
        window = (self._tuned_dg_window(input, rows)
                  or dg_window_for(rows))

        ck = DG.DGData.cache_key(
            self.indice_key, self.kernel_size, self.dilation, window,
            rows=rows,
        ) if self.indice_key is not None else None
        rec = input.indice_dict.get(ck) if ck else None
        new_rec = None
        pos = None
        if rec is not None and isinstance(rec, DG.DGData):
            keys = rec.keys
            plans = rec.plans
            pos = rec.pos
        else:
            keys, _sent = C.linearize(indices, spatial_shape, batch_size)
            deltas_np, _ = SK.subm_key_deltas(
                self.kernel_size, self.dilation, spatial_shape
            )
            groups = SK.sk_groups(self.kernel_size, include_center=True)
            sent_i = int(np.prod(spatial_shape)) * int(batch_size)
            n = keys.shape[0]
            np_t, n_pad = SK._n_pad_for(n, 128 * rows, window)
            keys_p = SK._pad_rows(keys, np_t, sent_i)
            plans = SK.build_sk_plans(
                keys_p, sent_i, deltas_np, groups, tile=128 * rows,
                window=window, n_pad=n_pad, align=128,
            )
            if rows > 1:
                np_t1, n_pad1 = SK._n_pad_for(n, 128, window)
                keys_p1 = SK._pad_rows(keys, np_t1, sent_i)
                _, plan_bwd = SK.build_sk_plans(
                    keys_p1, sent_i, deltas_np, groups, tile=128,
                    window=window, n_pad=n_pad1, align=128,
                )
                plans = (plans[0], plan_bwd)
            if ck:
                # run the windowed binary search ONCE for the stage;
                # every later subm layer sharing the indice_key reuses
                # the cached match rows (no search / key DMA per layer)
                pos = DG.build_dg_pos(
                    keys, plans[0], ksize=self.kernel_size,
                    dilation=self.dilation, spatial_shape=spatial_shape,
                    batch_size=batch_size, window=window, rows=rows,
                    interpret=interpret,
                )
                new_rec = DG.DGData(
                    keys, plans, ksize=self.kernel_size,
                    dilation=self.dilation, spatial_shape=spatial_shape,
                    window=window, pos=pos,
                )

        out_feat = DG.dg_subm_conv(
            features, keys, self.weight,
            spatial_shape=spatial_shape, batch_size=batch_size,
            dilation=self.dilation, window=window, rows_per_tile=rows,
            plans=plans, pos=pos, interpret=interpret,
        )
        out_feat = bias_add_act(
            out_feat, self.bias, self.act_type, self.act_alpha,
            self.act_beta,
            add_input.features if add_input is not None else None,
        )
        out_feat = jnp.where(input.valid_mask[:, None], out_feat, 0)
        out = SparseConvTensor(
            out_feat,
            indices,
            input.spatial_shape,
            batch_size,
            num_voxels=input.num_voxels,
            indice_dict=dict(input.indice_dict),
            benchmark=input.benchmark,
            keys_sorted=input.keys_sorted,
        )
        if new_rec is not None:
            out.indice_dict[ck] = new_rec
        return out

    def _call_dg_regular(
        self,
        input: SparseConvTensor,
        add_input: Optional[SparseConvTensor] = None,
    ) -> SparseConvTensor:
        """Dynamic-gather strided/transposed/inverse conv.  Output-site
        discovery runs in XLA; keys/128-aligned plans/sites cache under
        ``__dgreg__<indice_key>`` and are shared with the paired inverse
        conv (reference rulebook-reuse semantics, ``conv.py:348-363``)."""
        from ..ops.pallas import dg_conv as DG
        from ..ops.pallas.dg_conv import dg_rows_for
        from ..ops.pallas.sorted_conv import SKRegData
        from ..ops.rulebook import build_conv_outputs

        features = input.features
        indices = input.indices
        spatial_shape = tuple(int(s) for s in input.spatial_shape)
        batch_size = input.batch_size
        # R-row supertiles for the strided forward (the OUT side of a
        # first downsample is often the LARGEST layer in the net — see
        # DESIGN_NOTES CenterPoint table); transposed/inverse tile at 128
        rows = (1 if (self.transposed or self.inverse)
                else dg_rows_for(self.in_channels, self.out_channels))
        window = 384 if rows == 1 else 256 + 256 * rows
        interpret = jax.default_backend() == "cpu"
        ck = (f"__dgreg__{self.indice_key}"
              if self.indice_key is not None else None)

        if self.inverse:
            data = input.indice_dict.get(ck) if ck else None
            assert isinstance(data, SKRegData), (
                f"SparseInverseConv (dg) requires a cached record under "
                f"indice_key={self.indice_key!r}")
            assert not data.transposed, (
                "inverse conv cannot reuse a transposed-conv record")
            assert data.ksize == self.kernel_size, (
                f"inverse conv ksize {self.kernel_size} != encoder "
                f"{data.ksize}")
            assert data.out_shape == spatial_shape, (
                f"inverse conv input shape {spatial_shape} != encoder "
                f"output shape {data.out_shape}")
            out_feat, _, _ = DG.dg_regular_conv(
                features, data.in_keys, data.out_keys, self.weight,
                in_shape=data.in_shape, out_shape=data.out_shape,
                batch_size=batch_size, stride=data.stride,
                padding=data.padding, dilation=data.dilation,
                inverse=True, window=data.window, plans=data.plans,
                interpret=interpret,
            )
            enc_in_indices = input.indice_dict.get(
                f"__dgreg_in__{self.indice_key}")
            assert enc_in_indices is not None, (
                "encoder input indices missing from the dg cache")
            out_feat = bias_add_act(
                out_feat, self.bias, self.act_type, self.act_alpha,
                self.act_beta,
                add_input.features if add_input is not None else None,
            )
            valid = enc_in_indices[:, 0] >= 0
            out_feat = jnp.where(valid[:, None], out_feat, 0)
            return SparseConvTensor(
                out_feat,
                enc_in_indices,
                data.in_shape,
                batch_size,
                num_voxels=jnp.sum(valid.astype(jnp.int32)),
                indice_dict=dict(input.indice_dict),
                benchmark=input.benchmark,
                keys_sorted=True,
            )

        if self.transposed:
            out_shape = tuple(int(v) for v in C.get_deconv_output_size(
                spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation, self.output_padding))
        else:
            out_shape = tuple(int(v) for v in C.get_conv_output_size(
                spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation))
        rec = input.indice_dict.get(ck) if ck else None
        new_rec = None
        if (
            isinstance(rec, SKRegData)
            and rec.ksize == self.kernel_size
            and rec.stride == self.stride
            and rec.padding == self.padding
            and rec.dilation == self.dilation
            and rec.in_shape == spatial_shape
            and rec.transposed == self.transposed
            and rec.out_shape == out_shape
            and rec.output_padding == self.output_padding
            and rec.tile == 128 * rows
            and rec.window == window
        ):
            in_keys = rec.in_keys
            out_keys = rec.out_keys
            out_indices = rec.out_indices
            num_out = rec.num_out
            num_out_total = rec.num_out_total
            plans = rec.plans
        else:
            if self.transposed:
                from ..ops.rulebook import build_deconv_outputs

                out_bound = self._resolve_out_bound(indices.shape[0])
                out_indices, out_keys, num_out, num_out_total = \
                    build_deconv_outputs(
                        indices, spatial_shape=spatial_shape,
                        batch_size=batch_size, ksize=self.kernel_size,
                        stride=self.stride, padding=self.padding,
                        dilation=self.dilation,
                        out_padding=self.output_padding,
                        out_bound=out_bound,
                    )
            else:
                out_bound = self._resolve_out_bound(indices.shape[0])
                out_indices, out_keys, num_out, num_out_total = \
                    build_conv_outputs(
                        indices, spatial_shape=spatial_shape,
                        batch_size=batch_size, ksize=self.kernel_size,
                        stride=self.stride, padding=self.padding,
                        dilation=self.dilation, out_bound=out_bound,
                    )
            in_keys, _ = C.linearize(indices, spatial_shape, batch_size)
            plans = None
            from ..debug_utils import maybe_assert_overflow

            maybe_assert_overflow(num_out_total, out_bound,
                                  self.name or type(self).__name__)

        if self.transposed:
            # transposed conv == inverse-mode kernel with the spaces
            # swapped: tiles = the EXPANDED output space, table = input
            (out_feat, plans, _geom) = DG.dg_regular_conv(
                features, out_keys, in_keys, self.weight,
                in_shape=out_shape, out_shape=spatial_shape,
                batch_size=batch_size, stride=self.stride,
                padding=self.padding, dilation=self.dilation,
                inverse=True, window=window, plans=plans,
                interpret=interpret,
            )
        else:
            (out_feat, plans, _geom) = DG.dg_regular_conv(
                features, in_keys, out_keys, self.weight,
                in_shape=spatial_shape, out_shape=out_shape,
                batch_size=batch_size, stride=self.stride,
                padding=self.padding, dilation=self.dilation,
                window=window, rows_per_tile=rows, plans=plans,
                interpret=interpret,
            )
        if ck and not isinstance(rec, SKRegData):
            new_rec = SKRegData(
                in_keys, out_keys, out_indices, num_out, plans,
                num_out_total,
                ksize=self.kernel_size, stride=self.stride,
                padding=self.padding, dilation=self.dilation,
                in_shape=spatial_shape, out_shape=out_shape,
                tile=128 * rows,
                window=window, transposed=self.transposed,
                output_padding=self.output_padding,
            )
        out_feat = bias_add_act(
            out_feat, self.bias, self.act_type, self.act_alpha,
            self.act_beta,
            add_input.features if add_input is not None else None,
        )
        out_valid = out_indices[:, 0] >= 0
        out_feat = jnp.where(out_valid[:, None], out_feat, 0)
        from ..calibrate import _maybe_record

        _maybe_record(self, num_out)
        out = SparseConvTensor(
            out_feat,
            out_indices,
            out_shape,
            batch_size,
            num_voxels=num_out,
            indice_dict=dict(input.indice_dict),
            benchmark=input.benchmark,
            keys_sorted=True,
            num_out_total=num_out_total,
        )
        if new_rec is not None:
            out.indice_dict[ck] = new_rec
            out.indice_dict[f"__dgreg_in__{self.indice_key}"] = indices
        return out

    def _call_sk_regular(
        self,
        input: SparseConvTensor,
        add_input: Optional[SparseConvTensor] = None,
    ) -> SparseConvTensor:
        """Fused sorted-key strided/inverse conv
        (``ops/pallas/sorted_conv.py:sk_regular_conv``).  Output-site
        discovery runs in XLA; keys/plans/sites cache per indice_key and
        are shared with the paired inverse conv."""
        from ..ops.pallas import sorted_conv as SK
        from ..ops.rulebook import build_conv_outputs

        features = input.features
        indices = input.indices
        spatial_shape = tuple(int(s) for s in input.spatial_shape)
        batch_size = input.batch_size
        tile, window = 128, 384
        interpret = jax.default_backend() == "cpu"
        ck = (f"__skreg__{self.indice_key}"
              if self.indice_key is not None else None)

        if self.inverse:
            data = input.indice_dict.get(ck) if ck else None
            assert isinstance(data, SK.SKRegData), (
                f"SparseInverseConv requires a cached sorted-key record "
                f"under indice_key={self.indice_key!r}")
            assert not data.transposed, (
                "inverse conv cannot reuse a transposed-conv record")
            assert data.ksize == self.kernel_size, (
                f"inverse conv ksize {self.kernel_size} != encoder "
                f"{data.ksize}")
            assert data.out_shape == spatial_shape, (
                f"inverse conv input shape {spatial_shape} != encoder "
                f"output shape {data.out_shape}")
            out_feat, _, _ = SK.sk_regular_conv(
                features, data.in_keys, data.out_keys, self.weight,
                in_shape=data.in_shape, out_shape=data.out_shape,
                batch_size=batch_size, stride=data.stride,
                padding=data.padding, dilation=data.dilation,
                inverse=True, tile=data.tile, window=data.window,
                plans=data.plans, interpret=interpret,
            )
            out_indices = input.indice_dict.get(f"__skreg_in__{self.indice_key}")
            # output sites = the encoder's input sites
            enc_in_indices = out_indices
            assert enc_in_indices is not None, (
                "encoder input indices missing from the sorted-key cache")
            out_feat = bias_add_act(
                out_feat, self.bias, self.act_type, self.act_alpha,
                self.act_beta,
                add_input.features if add_input is not None else None,
            )
            valid = enc_in_indices[:, 0] >= 0
            out_feat = jnp.where(valid[:, None], out_feat, 0)
            return SparseConvTensor(
                out_feat,
                enc_in_indices,
                data.in_shape,
                batch_size,
                num_voxels=jnp.sum(valid.astype(jnp.int32)),
                indice_dict=dict(input.indice_dict),
                benchmark=input.benchmark,
                # the encoder's SK run required key-sorted input rows
                keys_sorted=True,
            )

        if self.transposed:
            out_shape = tuple(int(v) for v in C.get_deconv_output_size(
                spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation, self.output_padding))
        else:
            out_shape = tuple(int(v) for v in C.get_conv_output_size(
                spatial_shape, self.kernel_size, self.stride,
                self.padding, self.dilation))
        rec = input.indice_dict.get(ck) if ck else None
        new_rec = None
        if (
            isinstance(rec, SK.SKRegData)
            and rec.ksize == self.kernel_size
            and rec.stride == self.stride
            and rec.padding == self.padding
            and rec.dilation == self.dilation
            and rec.in_shape == spatial_shape
            # regular vs transposed records are NOT interchangeable even
            # with identical hyperparameters (ADVICE r2 low)
            and rec.transposed == self.transposed
            and rec.out_shape == out_shape
            and rec.output_padding == self.output_padding
        ):
            in_keys = rec.in_keys
            out_keys = rec.out_keys
            out_indices = rec.out_indices
            num_out = rec.num_out
            num_out_total = rec.num_out_total
            plans = rec.plans
        else:
            if self.transposed:
                from ..ops.rulebook import build_deconv_outputs

                out_bound = self._resolve_out_bound(indices.shape[0])
                out_indices, out_keys, num_out, num_out_total = \
                    build_deconv_outputs(
                        indices, spatial_shape=spatial_shape,
                        batch_size=batch_size, ksize=self.kernel_size,
                        stride=self.stride, padding=self.padding,
                        dilation=self.dilation,
                        out_padding=self.output_padding,
                        out_bound=out_bound,
                    )
            else:
                out_bound = self._resolve_out_bound(indices.shape[0])
                out_indices, out_keys, num_out, num_out_total = \
                    build_conv_outputs(
                        indices, spatial_shape=spatial_shape,
                        batch_size=batch_size, ksize=self.kernel_size,
                        stride=self.stride, padding=self.padding,
                        dilation=self.dilation, out_bound=out_bound,
                    )
            in_keys, _ = C.linearize(indices, spatial_shape, batch_size)
            plans = None
            from ..debug_utils import maybe_assert_overflow

            maybe_assert_overflow(num_out_total, out_bound,
                                  self.name or type(self).__name__)

        if self.transposed:
            # transposed conv == inverse-mode kernel with the spaces
            # swapped: tiles = the EXPANDED output space, table = input
            out_feat, plans, _geom = SK.sk_regular_conv(
                features, out_keys, in_keys, self.weight,
                in_shape=out_shape, out_shape=spatial_shape,
                batch_size=batch_size, stride=self.stride,
                padding=self.padding, dilation=self.dilation,
                inverse=True, tile=tile, window=window, plans=plans,
                interpret=interpret,
            )
        else:
            out_feat, plans, _geom = SK.sk_regular_conv(
                features, in_keys, out_keys, self.weight,
                in_shape=spatial_shape, out_shape=out_shape,
                batch_size=batch_size, stride=self.stride,
                padding=self.padding, dilation=self.dilation,
                tile=tile, window=window, plans=plans, interpret=interpret,
            )
        if ck and not isinstance(rec, SK.SKRegData):
            new_rec = SK.SKRegData(
                in_keys, out_keys, out_indices, num_out, plans,
                num_out_total,
                ksize=self.kernel_size, stride=self.stride,
                padding=self.padding, dilation=self.dilation,
                in_shape=spatial_shape, out_shape=out_shape, tile=tile,
                window=window, transposed=self.transposed,
                output_padding=self.output_padding,
            )
        out_feat = bias_add_act(
            out_feat, self.bias, self.act_type, self.act_alpha,
            self.act_beta,
            add_input.features if add_input is not None else None,
        )
        out_valid = out_indices[:, 0] >= 0
        out_feat = jnp.where(out_valid[:, None], out_feat, 0)
        from ..calibrate import _maybe_record

        _maybe_record(self, num_out)
        out = SparseConvTensor(
            out_feat,
            out_indices,
            out_shape,
            batch_size,
            num_voxels=num_out,
            indice_dict=dict(input.indice_dict),
            benchmark=input.benchmark,
            # build_conv_outputs / build_deconv_outputs emit ascending
            # unique keys with invalid rows at the tail
            keys_sorted=True,
            num_out_total=num_out_total,
        )
        if new_rec is not None:
            out.indice_dict[ck] = new_rec
            out.indice_dict[f"__skreg_in__{self.indice_key}"] = indices
        return out

    def _call_sk(
        self,
        input: SparseConvTensor,
        add_input: Optional[SparseConvTensor] = None,
    ) -> SparseConvTensor:
        """Fused sorted-key subm conv (``ops/pallas/sorted_conv.py``):
        rulebook-free — the key join happens inside the kernel.  Keys and
        window plans are cached per (indice_key, geometry)."""
        from ..ops.pallas import sorted_conv as SK

        features = input.features
        indices = input.indices
        spatial_shape = tuple(int(s) for s in input.spatial_shape)
        batch_size = input.batch_size
        tile, window = 128, 256  # measured best at bench sizes (v5e)
        if indices.shape[0] > 400_000:
            window = 384  # dense scans: wider row spans (avg nw ~1.1 here)
        interpret = jax.default_backend() == "cpu"

        ck = SK.SKData.cache_key(
            self.indice_key, self.kernel_size, self.dilation, tile, window
        ) if self.indice_key is not None else None
        rec = input.indice_dict.get(ck) if ck else None
        new_rec = None
        if rec is not None and isinstance(rec, SK.SKData):
            keys = rec.keys
            plans = rec.plans
        else:
            keys, _sent = C.linearize(indices, spatial_shape, batch_size)
            deltas_np, _ = SK.subm_key_deltas(
                self.kernel_size, self.dilation, spatial_shape
            )
            groups = SK.sk_groups(self.kernel_size)
            sent_i = int(np.prod(spatial_shape)) * int(batch_size)
            n = keys.shape[0]
            np_t, n_pad = SK._n_pad_for(n, tile, window)
            keys_p = SK._pad_rows(keys, np_t, sent_i)
            plans = SK.build_sk_plans(
                keys_p, sent_i, deltas_np, groups, tile=tile,
                window=window, n_pad=n_pad,
            )
            if ck:
                new_rec = SK.SKData(
                    keys, plans, ksize=self.kernel_size,
                    dilation=self.dilation, spatial_shape=spatial_shape,
                    tile=tile, window=window,
                )

        out_feat = SK.sk_subm_conv(
            features, indices, keys, self.weight,
            spatial_shape=spatial_shape, batch_size=batch_size,
            dilation=self.dilation, tile=tile, window=window,
            plans=plans, interpret=interpret,
            # statically-known-sorted input → no lax.cond, no dead
            # rulebook fallback branch compiled
            fallback=not input.keys_sorted,
        )
        out_feat = bias_add_act(
            out_feat, self.bias, self.act_type, self.act_alpha,
            self.act_beta,
            add_input.features if add_input is not None else None,
        )
        out_feat = jnp.where(input.valid_mask[:, None], out_feat, 0)
        out = SparseConvTensor(
            out_feat,
            indices,
            input.spatial_shape,
            batch_size,
            num_voxels=input.num_voxels,
            indice_dict=dict(input.indice_dict),
            benchmark=input.benchmark,
            keys_sorted=input.keys_sorted,
        )
        if new_rec is not None:
            out.indice_dict[ck] = new_rec
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
