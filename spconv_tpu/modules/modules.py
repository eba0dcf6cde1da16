"""Containers and feature-wise wrappers.

Parity with ``spconv/pytorch/modules.py``: ``SparseModule``,
``SparseSequential`` (mixes sparse and dense layers — dense callables are
applied to ``.features``), ``SparseBatchNorm`` / ``SparseSyncBatchNorm`` /
``SparseReLU`` / ``SparseIdentity``, ``ToDense``, plus debug helpers
``PrintTensorMeta`` / ``PrintCurrentTime``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import SparseConvTensor
from ..module import Module

__all__ = [
    "SparseModule",
    "SparseSequential",
    "SparseIdentity",
    "Identity",
    "SparseReLU",
    "SparseLeakyReLU",
    "SparseSigmoid",
    "BatchNorm1d",
    "SparseBatchNorm",
    "SparseSyncBatchNorm",
    "ToDense",
    "PrintTensorMeta",
]


class SparseModule(Module):
    """Base class marker (parity: ``modules.py:SparseModule``)."""

    name: Optional[str] = None


_TRAINING_AWARE: dict = {}


def _accepts_training(layer) -> bool:
    """True when ``layer.__call__`` takes a ``training`` keyword (cached
    per type; resolved at trace time, so jit-compatible)."""
    cls = type(layer)
    hit = _TRAINING_AWARE.get(cls)
    if hit is None:
        import inspect

        try:
            sig = inspect.signature(cls.__call__)
            hit = "training" in sig.parameters
        except (TypeError, ValueError):
            hit = False
        _TRAINING_AWARE[cls] = hit
    return hit


def record_benchmark_layer(out, name, module, *, n_in=None, n_out=None,
                           num_pairs=None, time_ms=None):
    """Append a per-layer record to ``out.benchmark_record`` under
    ``benchmark=True`` (parity: reference per-layer time/voxel recording,
    ``conv.py:201-224,494-501``).  On eager (non-jit) passes the record
    carries the layer's measured device time in ``time_ms`` — exactly the
    reference's benchmark mode, which likewise syncs per layer; inside
    jit, per-layer time comes from profiler traces via the
    ``jax.named_scope`` wrapping each layer and the record carries
    geometry + voxel counts only.  Device scalars are only materialized
    OUTSIDE jit (recording a tracer would leak it through the non-pytree
    aux slot)."""
    import jax.core as _core

    def _concrete(v):
        if v is None or isinstance(v, _core.Tracer):
            return None
        try:
            return int(v)
        except TypeError:
            return None

    rec = {
        "layer": name,
        "type": type(module).__name__,
        "num_voxels_in": _concrete(n_in),
        "num_voxels_out": _concrete(n_out),
        # exact (in,out) pair count when available (eager native path):
        # layer MACs = num_pairs * C_in * C_out — feeds the bench's MFU
        # estimate (reference analog: per-layer voxel stats, conv.py:201)
        "num_pairs": _concrete(num_pairs),
        # eager-pass wall time incl. the layer-boundary sync (reference
        # benchmark-mode semantics); None inside jit
        "time_ms": None if time_ms is None else float(time_ms),
    }
    for attr in ("in_channels", "out_channels", "kernel_size", "stride",
                 "algo", "indice_key"):
        if hasattr(module, attr):
            rec[attr] = getattr(module, attr)
    key = name
    i = 1
    while key in out.benchmark_record:
        key = f"{name}#{i}"
        i += 1
    out.benchmark_record[key] = rec


def _apply_featurewise(x, fn: Callable):
    if isinstance(x, SparseConvTensor):
        out = fn(x.features)
        # preserve the invalid-rows-zero invariant for fns with f(0) != 0
        return x.replace_feature(jnp.where(x.valid_mask[:, None], out, 0))
    return fn(x)


class Lambda(SparseModule):
    """Wrap a plain feature-wise callable as a module (keeps the function
    out of the pytree leaves so the container stays jit-able)."""

    def __init__(self, fn: Callable, name=None):
        self.fn = fn
        self.name = name

    def __call__(self, x):
        return _apply_featurewise(x, self.fn)


class SparseSequential(SparseModule):
    """Sequential container mixing sparse modules and dense feature ops
    (parity: ``modules.py:46-146``).  Dense callables receive
    ``x.features`` and their result replaces the features."""

    def __init__(self, *layers, **named_layers):
        ls = list(layers) + list(named_layers.values())
        self.layers = [
            l if isinstance(l, Module) else Lambda(l) for l in ls
        ]
        self._names = tuple(
            [None] * len(layers) + list(named_layers.keys())
        )

    def __getitem__(self, i):
        return self.layers[i]

    def __len__(self):
        return len(self.layers)

    def __iter__(self):
        return iter(self.layers)

    def add(self, layer, name: Optional[str] = None) -> "SparseSequential":
        new = SparseSequential(*self.layers, layer)
        new._names = (*self._names, name)
        return new

    def __call__(self, x, training: bool = False):
        # every layer is a Module (bare callables were wrapped in Lambda);
        # feature-wise modules apply themselves to .features internally.
        # ``training`` is forwarded to layers that accept it (BN batch-stats
        # mode, nested Sequentials, QAT modules).
        for layer in self.layers:
            if _accepts_training(layer):
                x = layer(x, training=training)
            else:
                x = layer(x)
        return x


class SparseIdentity(SparseModule):
    def __init__(self, name=None):
        self.name = name

    def __call__(self, x):
        return x


Identity = SparseIdentity


class SparseReLU(SparseModule):
    def __init__(self, name=None):
        self.name = name

    def __call__(self, x):
        return _apply_featurewise(x, jax.nn.relu)


class SparseLeakyReLU(SparseModule):
    def __init__(self, negative_slope: float = 0.01, name=None):
        self.negative_slope = negative_slope
        self.name = name

    def __call__(self, x):
        return _apply_featurewise(
            x, lambda f: jax.nn.leaky_relu(f, self.negative_slope)
        )


class SparseSigmoid(SparseModule):
    def __init__(self, name=None):
        self.name = name

    def __call__(self, x):
        return _apply_featurewise(x, jax.nn.sigmoid)


class BatchNorm1d(Module):
    """Feature-row batch norm with running stats as pytree leaves.

    Sparse-aware: statistics are computed over *active* rows only (a dense
    BN over the padded buffer would be poisoned by the zero padding — the
    reference operates on the un-padded ``[N, C]`` so never faces this).

    ``training=True`` normalizes with masked batch stats;
    ``training=False`` (default) uses running stats.  Running-stat
    updates are functional: :meth:`updated` returns a new module.
    """

    _consumes_sparse = True

    def __init__(self, num_features: int, eps: float = 1e-5,
                 momentum: float = 0.1, affine: bool = True,
                 axis_name: Optional[str] = None, dtype=jnp.float32,
                 name=None):
        # defaults match torch.nn.BatchNorm1d (the reference subclasses it)
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum
        self.axis_name = axis_name
        self.name = name
        self.weight = jnp.ones((num_features,), dtype) if affine else None
        self.bias = jnp.zeros((num_features,), dtype) if affine else None
        self.running_mean = jnp.zeros((num_features,), jnp.float32)
        self.running_var = jnp.ones((num_features,), jnp.float32)

    def _batch_stats(self, feats, mask):
        m = mask[:, None].astype(jnp.float32)
        cnt = jnp.sum(m)
        f32 = feats.astype(jnp.float32) * m
        s = jnp.sum(f32, axis=0)
        ss = jnp.sum(f32 * f32, axis=0)
        if self.axis_name is not None:
            # SyncBN: aggregate raw moments across data-parallel ranks
            # (reference delegates to torch SyncBatchNorm; modules.py:162)
            cnt = jax.lax.psum(cnt, self.axis_name)
            s = jax.lax.psum(s, self.axis_name)
            ss = jax.lax.psum(ss, self.axis_name)
        cnt = jnp.maximum(cnt, 1.0)
        mean = s / cnt
        var = jnp.maximum(ss / cnt - mean * mean, 0.0)
        return mean, var, cnt

    def _normalize(self, feats, mean, var):
        inv = jax.lax.rsqrt(var + self.eps)
        out = (feats.astype(jnp.float32) - mean) * inv
        if self.weight is not None:
            out = out * self.weight + self.bias
        return out.astype(feats.dtype)

    def __call__(self, x, training: bool = False):
        if isinstance(x, SparseConvTensor):
            feats, mask = x.features, x.valid_mask
        else:
            feats, mask = x, jnp.ones((x.shape[0],), bool)
        if training:
            mean, var, _ = self._batch_stats(feats, mask)
        else:
            mean, var = self.running_mean, self.running_var
        out = self._normalize(feats, mean, var)
        if isinstance(x, SparseConvTensor):
            return x.replace_feature(jnp.where(mask[:, None], out, 0))
        return out

    def updated(self, x) -> "BatchNorm1d":
        """Return a copy with running stats advanced by this batch."""
        if isinstance(x, SparseConvTensor):
            feats, mask = x.features, x.valid_mask
        else:
            feats, mask = x, jnp.ones((x.shape[0],), bool)
        mean, var, cnt = self._batch_stats(feats, mask)
        unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
        mom = self.momentum
        return self.replace(
            running_mean=(1 - mom) * self.running_mean + mom * mean,
            running_var=(1 - mom) * self.running_var + mom * unbiased,
        )


class SparseBatchNorm(BatchNorm1d):
    """Parity: ``modules.py:154`` SparseBatchNorm."""


class SparseSyncBatchNorm(BatchNorm1d):
    """Cross-device BN via ``psum`` over ``axis_name`` inside
    ``shard_map``/``pmap`` (parity: ``modules.py:162`` which wraps torch
    SyncBatchNorm; here sync is native XLA collectives over ICI)."""

    def __init__(self, num_features: int, eps: float = 1e-5,
                 momentum: float = 0.1, affine: bool = True,
                 axis_name: str = "dp", dtype=jnp.float32, name=None):
        super().__init__(num_features, eps, momentum, affine, axis_name,
                         dtype, name)


class ToDense(SparseModule):
    """Densify to ``[B, C, *spatial]`` (parity: ``pytorch/__init__.py:29``)."""

    def __init__(self, name=None):
        self.name = name

    def __call__(self, x: SparseConvTensor):
        return x.dense()


class PrintTensorMeta(SparseModule):
    def __init__(self, name=None):
        self.name = name

    def __call__(self, x):
        if isinstance(x, SparseConvTensor):
            jax.debug.print(
                "SparseConvTensor feat_shape={s} num_voxels={n}",
                s=x.features.shape, n=x.num_voxels,
            )
        return x


class PrintCurrentTime(SparseModule):
    """Debug passthrough (parity: ``modules.py:187-205``)."""

    def __init__(self, name=None):
        self.name = name

    def __call__(self, x):
        import time

        print(f"[spconv_tpu] {time.strftime('%H:%M:%S')}")
        return x


def assign_name_for_sparse_modules(module) -> None:
    """Assign unique names to unnamed sparse modules for benchmark
    bookkeeping (parity: ``spconv.pytorch.assign_name_for_sparse_modules``)."""
    counter = [0]

    def visit(obj):
        if isinstance(obj, Module):
            if getattr(obj, "name", None) is None and "name" in obj.__dict__:
                obj.__dict__["name"] = f"{type(obj).__name__}_{counter[0]}"
                counter[0] += 1
            for v in obj.__dict__.values():
                visit(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                visit(v)
        elif isinstance(obj, dict):
            for v in obj.values():
                visit(v)

    visit(module)
