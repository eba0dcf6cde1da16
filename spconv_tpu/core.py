"""SparseConvTensor — the central sparse data structure, as a JAX pytree.

Behavioral parity with the reference ``spconv/pytorch/core.py:132``
(``SparseConvTensor``): a ``[N, C]`` feature matrix plus a ``[N, ndim+1]``
int32 coordinate matrix (batch index first), a dense ``spatial_shape``,
``batch_size``, and an ``indice_dict`` rulebook cache keyed by
``indice_key`` for submanifold-rulebook reuse and inverse convolutions.

TPU-native differences (by design, see SURVEY.md §7):

* **Static shapes.**  ``features``/``indices`` are padded to a fixed buffer
  size ``N_buf``; row ``i`` is *active* iff ``indices[i, 0] >= 0``.
  Inactive rows carry ``indices == -1`` and ``features == 0`` (framework
  invariant — every op preserves it).  The true count lives in
  ``num_voxels`` as a **device scalar** that never syncs to host inside a
  step (the reference instead reads dynamic counts on host, e.g.
  ``ops.py:939`` — the classic GPU sync point we eliminate).
* **Pytree.**  The tensor (including its cached rulebooks) flows through
  ``jax.jit`` / ``jax.grad`` / ``shard_map`` directly.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SparseConvTensor",
    "IndiceData",
    "ImplicitGemmIndiceData",
    "expand_nd",
    "scatter_nd",
]


def expand_nd(ndim: int, val: Union[int, Sequence[int]]) -> Tuple[int, ...]:
    """Broadcast a scalar conv parameter to ``ndim`` dims.

    Parity: ``spconv/pytorch/core.py:expand_nd``.
    """
    if isinstance(val, (int, np.integer)):
        return (int(val),) * ndim
    val = tuple(int(v) for v in val)
    assert len(val) == ndim, f"expected length {ndim}, got {val}"
    return val


def scatter_nd(indices: jax.Array, updates: jax.Array, shape: Sequence[int]) -> jax.Array:
    """TF-style scatter_nd (last-writer-wins like the reference's
    ``core.py:115`` torch edition).  Out-of-range indices are dropped.
    """
    ret = jnp.zeros(tuple(shape), dtype=updates.dtype)
    return ret.at[tuple(indices[..., i] for i in range(indices.shape[-1]))].set(
        updates, mode="drop"
    )


class _PytreeRecord:
    """Small pytree base for rulebook records: array fields = leaves."""

    _leaf_fields: Tuple[str, ...] = ()
    _static_fields: Tuple[str, ...] = ()

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)

        def flatten(obj):
            children = tuple(getattr(obj, f) for f in cls._leaf_fields)
            aux = tuple(getattr(obj, f) for f in cls._static_fields)
            return children, aux

        def unflatten(aux, children):
            obj = object.__new__(cls)
            for f, v in zip(cls._leaf_fields, children):
                setattr(obj, f, v)
            for f, v in zip(cls._static_fields, aux):
                setattr(obj, f, v)
            return obj

        jax.tree_util.register_pytree_node(cls, flatten, unflatten)


class IndiceData(_PytreeRecord):
    """Rulebook record (parity: ``spconv/pytorch/core.py:60`` IndiceData +
    ``:81`` ImplicitGemmIndiceData, unified).

    * ``pair_fwd``: ``[kv, N_out]`` int32 — input row feeding output ``o``
      through filter offset ``k`` (−1 when none).
    * ``pair_bwd``: ``[kv, N_in]`` int32 — output row fed by input ``i``
      through offset ``k`` (−1 when none).  For subm this is the
      offset-mirrored view of ``pair_fwd``.
    * ``out_indices``: ``[N_out, ndim+1]`` output coordinates (−1 pad).
    * ``indices``: the layer's input coordinates (for inverse conv).
    * ``num_out``: device scalar — number of active output sites.
    * ``num_in``: device scalar — number of active input sites (the
      inverse conv's output count, ``spconv/pytorch/conv.py:348-363``).
    * ``num_out_total``: device scalar — output-site count BEFORE the
      static ``out_bound`` clamp.  ``num_out_total > num_out`` means the
      bounded build dropped sites (the reference's bounded stage-2 drops
      the same way, ``csrc/sparse/indices.py:460-499`` — but there the
      bounded mode is opt-in; here it is the only mode, so the overflow
      must be observable: see ``SparseConvTensor.check_overflow``).
    """

    _leaf_fields = (
        "pair_fwd", "pair_bwd", "out_indices", "indices", "num_out",
        "num_in", "num_out_total",
    )
    _static_fields = (
        "is_subm",
        "spatial_shape",
        "out_spatial_shape",
        "ksize",
        "stride",
        "padding",
        "dilation",
        "transposed",
        "in_sorted",
    )

    def __init__(
        self,
        pair_fwd: jax.Array,
        pair_bwd: jax.Array,
        out_indices: jax.Array,
        indices: jax.Array,
        num_out: jax.Array,
        num_in: Optional[jax.Array] = None,
        num_out_total: Optional[jax.Array] = None,
        *,
        is_subm: bool,
        spatial_shape: Tuple[int, ...],
        out_spatial_shape: Tuple[int, ...],
        ksize: Tuple[int, ...],
        stride: Tuple[int, ...],
        padding: Tuple[int, ...],
        dilation: Tuple[int, ...],
        transposed: bool = False,
        in_sorted: bool = False,
    ):
        self.pair_fwd = pair_fwd
        self.pair_bwd = pair_bwd
        self.out_indices = out_indices
        self.indices = indices
        self.num_out = num_out
        if num_in is None:
            num_in = jnp.sum((indices[:, 0] >= 0).astype(jnp.int32))
        self.num_in = num_in
        self.num_out_total = num_out if num_out_total is None else num_out_total
        self.is_subm = is_subm
        self.spatial_shape = tuple(spatial_shape)
        self.out_spatial_shape = tuple(out_spatial_shape)
        self.ksize = tuple(ksize)
        self.stride = tuple(stride)
        self.padding = tuple(padding)
        self.dilation = tuple(dilation)
        self.transposed = transposed
        # STATIC: whether the layer's INPUT rows were key-sorted — the
        # inverse conv's outputs live on those rows, so its output
        # tensor inherits this flag
        self.in_sorted = bool(in_sorted)


# alias kept for API parity with the reference, which distinguishes the two
ImplicitGemmIndiceData = IndiceData


class SparseConvTensor:
    """See module docstring.  Construct with already-padded buffers, or use
    :meth:`from_dense` / ``spconv_tpu.utils.PointToVoxel``.
    """

    def __init__(
        self,
        features: jax.Array,
        indices: jax.Array,
        spatial_shape: Sequence[int],
        batch_size: int,
        num_voxels: Optional[jax.Array] = None,
        indice_dict: Optional[Dict[str, IndiceData]] = None,
        benchmark: bool = False,
        keys_sorted: bool = False,
        num_out_total: Optional[jax.Array] = None,
        q_scale: Optional[jax.Array] = None,
    ):
        assert features.ndim == 2, "features must be [N, C]"
        assert indices.ndim == 2, "indices must be [N, ndim+1]"
        ndim = indices.shape[1] - 1
        assert len(spatial_shape) == ndim, "spatial shape must equal ndim"
        self.features = features
        self.indices = indices
        self.spatial_shape = tuple(int(s) for s in spatial_shape)
        self.batch_size = int(batch_size)
        if num_voxels is None:
            num_voxels = jnp.sum((indices[:, 0] >= 0).astype(jnp.int32))
        self.num_voxels = num_voxels
        self.indice_dict: Dict[str, IndiceData] = (
            {} if indice_dict is None else indice_dict
        )
        self.benchmark = benchmark
        self.benchmark_record: Dict[str, Any] = {}
        # STATIC claim that rows are ordered by linearized coordinate key
        # (batch-major, row-major spatial; invalid rows at the tail).
        # Every builder in this framework (PointToVoxel, from_dense,
        # rulebook output discovery, sparse_add, sort_by_key) produces
        # this order and sets the flag; the fused sorted-key kernels
        # require it and are selected statically on it — no runtime
        # sortedness check / lax.cond fallback branch is compiled when it
        # is set.  Hand-built tensors default to False and take the
        # always-correct native path (or call :meth:`sort_by_key`).
        self.keys_sorted = bool(keys_sorted)
        # pre-clamp output-site count of the bounded op that produced this
        # tensor (device scalar), or None when no bounded discovery ran.
        # num_out_total > num_voxels ⇒ sites were silently dropped; see
        # :meth:`check_overflow`.
        self.num_out_total = num_out_total
        # int8 interop: quantization scale of the features, carried on the
        # tensor like the reference (``spconv/pytorch/core.py:132-184``
        # ``q_scale``) so quantized and float layers mix in user graphs.
        self.q_scale = q_scale

    # ------------------------------------------------------------------
    @property
    def ndim(self) -> int:
        return self.indices.shape[1] - 1

    @property
    def valid_mask(self) -> jax.Array:
        """[N] bool — active rows."""
        return self.indices[:, 0] >= 0

    @property
    def spatial_size(self) -> int:
        return int(np.prod(self.spatial_shape))

    def replace_feature(self, feature: jax.Array) -> "SparseConvTensor":
        """Functional feature swap (parity: ``core.py:198``).  The new
        features must keep inactive rows at zero; use
        :meth:`replace_feature_masked` for ops that don't."""
        new = self.shadow_copy()
        new.features = feature
        return new

    def replace_feature_masked(self, feature: jax.Array) -> "SparseConvTensor":
        """replace_feature that re-zeroes inactive rows (safe for e.g.
        sigmoid/bias-like ops whose f(0) != 0)."""
        feature = jnp.where(self.valid_mask[:, None], feature, 0)
        return self.replace_feature(feature)

    @property
    def overflowed(self) -> Optional[jax.Array]:
        """Device bool — True when the bounded op that produced this tensor
        dropped output sites (``num_out_total > num_voxels``).  None when
        no bounded discovery produced this tensor.  Usable inside jit
        (e.g. returned as an aux output and checked per step)."""
        if self.num_out_total is None:
            return None
        return self.num_out_total > self.num_voxels

    def check_overflow(self, context: str = "") -> None:
        """Eager overflow check: raises if the producing op's static
        ``out_bound`` truncated the active set (reference analog: the
        opt-in bounded stage-2, ``csrc/sparse/indices.py:460-499`` — here
        bounded buffers are the only mode, so a miscalibrated bound must
        be detectable, not silent).  Call outside jit (concrete arrays),
        e.g. once on a representative input after choosing bounds, or
        with ``SPCONV_TPU_CHECK_OVERFLOW=1`` every bounded op self-checks
        via a host callback (debug; adds a sync)."""
        if self.num_out_total is None:
            return
        if isinstance(self.num_voxels, jax.core.Tracer):
            raise RuntimeError(
                "check_overflow() must run outside jit — use the "
                ".overflowed device scalar inside traced code")
        total = int(self.num_out_total)
        got = int(self.num_voxels)
        if total > got:
            raise ValueError(
                f"sparse op output overflowed its static out_bound"
                f"{' in ' + context if context else ''}: {total} active "
                f"sites produced, only {got} kept (buffer "
                f"{self.indices.shape[0]}). Raise out_bound / "
                f"out_bound_ratio on the producing layer."
            )

    def find_indice_pair(self, key: Optional[str]) -> Optional[IndiceData]:
        if key is None:
            return None
        return self.indice_dict.get(key, None)

    def dense(self, channels_first: bool = True) -> jax.Array:
        """Densify to ``[B, C, *spatial]`` (parity: ``core.py:264``)."""
        ndim = self.ndim
        shape = (self.batch_size, *self.spatial_shape, self.features.shape[1])
        # clamp inactive rows to index 0; their features are 0 but .set would
        # overwrite — drop them instead by routing to an out-of-range index.
        idx = jnp.where(self.indices >= 0, self.indices, np.iinfo(np.int32).max)
        res = scatter_nd(idx, self.features, shape)
        if not channels_first:
            return res
        perm = (0, ndim + 1, *range(1, ndim + 1))
        return jnp.transpose(res, perm)

    @classmethod
    def from_dense(cls, x: jax.Array, pad_to: Optional[int] = None) -> "SparseConvTensor":
        """Create from a dense ``[B, *spatial, C]`` array (parity:
        ``core.py:237``).  Note: traced-shape friendly only when ``pad_to``
        is given; otherwise runs eagerly on concrete arrays."""
        batch = x.shape[0]
        spatial = x.shape[1:-1]
        mask = jnp.any(x != 0, axis=-1)
        flat_mask = mask.reshape(-1)
        n = int(jnp.sum(flat_mask)) if pad_to is None else pad_to
        order = jnp.argsort(~flat_mask, stable=True)[:n]
        found = flat_mask[order]
        coords = jnp.stack(jnp.unravel_index(order, (batch, *spatial)), axis=-1)
        coords = jnp.where(found[:, None], coords, -1).astype(jnp.int32)
        feats = x.reshape(-1, x.shape[-1])[order]
        feats = jnp.where(found[:, None], feats, 0)
        # row-major flat order over (batch, *spatial) == linearized-key
        # order, and invalid rows sort to the tail
        return cls(feats, coords, spatial, batch,
                   num_voxels=jnp.sum(found.astype(jnp.int32)),
                   keys_sorted=True)

    def select_by_index(self, valid_indices: jax.Array) -> "SparseConvTensor":
        """Gather a subset of rows (parity: ``core.py:select_by_index``)."""
        new = self.shadow_copy()
        new.features = self.features[valid_indices]
        new.indices = self.indices[valid_indices]
        new.num_voxels = jnp.sum((new.indices[:, 0] >= 0).astype(jnp.int32))
        new.indice_dict = {}
        return new

    def sort_by_key(self) -> "SparseConvTensor":
        """Reorder rows by linearized coordinate (batch-major z-major).

        Rulebook-generated outputs and ``PointToVoxel`` results are already
        in this order; applying it to external inputs improves gather
        locality in the conv compute (pair index maps become monotone).
        Drops cached rulebooks (row ids change)."""
        from .ops import coords as C

        keys, _ = C.linearize(self.indices, self.spatial_shape, self.batch_size)
        order = C.argsort_keys(keys)
        feats = jnp.take(self.features, order, axis=0)
        inds = jnp.take(self.indices, order, axis=0)
        return SparseConvTensor(
            feats, inds, self.spatial_shape, self.batch_size,
            num_voxels=self.num_voxels, benchmark=self.benchmark,
            keys_sorted=True,
        )

    def shadow_copy(self) -> "SparseConvTensor":
        new = object.__new__(SparseConvTensor)
        new.features = self.features
        new.indices = self.indices
        new.spatial_shape = self.spatial_shape
        new.batch_size = self.batch_size
        new.num_voxels = self.num_voxels
        new.indice_dict = dict(self.indice_dict)
        new.benchmark = self.benchmark
        new.benchmark_record = dict(self.benchmark_record)
        new.keys_sorted = self.keys_sorted
        new.num_out_total = self.num_out_total
        new.q_scale = self.q_scale
        return new

    def __repr__(self):
        return (
            f"SparseConvTensor[shape={tuple(self.features.shape)}, "
            f"spatial={self.spatial_shape}, batch={self.batch_size}]"
        )


def _sct_flatten(t: SparseConvTensor):
    keys = tuple(sorted(t.indice_dict.keys()))
    children = (t.features, t.indices, t.num_voxels, t.num_out_total,
                t.q_scale) + tuple(t.indice_dict[k] for k in keys)
    aux = (t.spatial_shape, t.batch_size, keys, t.benchmark,
           getattr(t, "keys_sorted", False))
    return children, aux


def _sct_unflatten(aux, children):
    spatial_shape, batch_size, keys, benchmark, keys_sorted = aux
    t = object.__new__(SparseConvTensor)
    (t.features, t.indices, t.num_voxels, t.num_out_total,
     t.q_scale) = children[:5]
    t.indice_dict = dict(zip(keys, children[5:]))
    t.spatial_shape = spatial_shape
    t.batch_size = batch_size
    t.benchmark = benchmark
    t.benchmark_record = {}
    t.keys_sorted = keys_sorted
    return t


jax.tree_util.register_pytree_node(SparseConvTensor, _sct_flatten, _sct_unflatten)
