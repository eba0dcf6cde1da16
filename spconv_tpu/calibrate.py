"""Deployment buffer calibration (parity: the reference's
``record_voxel_count`` buffers + ``get_max_num_voxels``
(``conv.py:502-506,619-639``) used to size static TensorRT buffers).

On TPU every non-subm conv/pool needs a static ``out_bound``; this module
records the actual active-site counts of every layer over calibration
data (eager execution) and returns a copy of the model with snug bounds
baked in — shrinking deep-layer buffers instead of carrying the input
bound through the whole net.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .module import Module

__all__ = ["calibrate_out_bounds", "record_voxel_counts",
           "export_out_bounds", "apply_out_bounds"]

_RECORDER: contextvars.ContextVar = contextvars.ContextVar(
    "spconv_tpu_voxel_recorder", default=None
)


def _maybe_record(module, num_out) -> None:
    rec = _RECORDER.get()
    if rec is None:
        return
    import jax

    if isinstance(num_out, jax.core.Tracer):
        return  # recording needs eager execution
    rec.setdefault(id(module), 0)
    rec[id(module)] = max(rec[id(module)], int(num_out))


@contextlib.contextmanager
def record_voxel_counts():
    """Context manager capturing per-layer max active output counts
    (keyed by module object id)."""
    rec: Dict[int, int] = {}
    token = _RECORDER.set(rec)
    try:
        yield rec
    finally:
        _RECORDER.reset(token)


def _round_up(n: int, mult: int) -> int:
    return max(mult, -(-n // mult) * mult)


def _rebind_bounds(obj, rec: Dict[int, int], margin: float, mult: int):
    """Recursively rebuild module trees, baking recorded bounds into
    conv/pool layers."""
    from .modules.conv import SparseConvolution
    from .modules.pool import _SparsePoolBase

    if isinstance(obj, (SparseConvolution, _SparsePoolBase)):
        if id(obj) in rec:
            bound = _round_up(int(rec[id(obj)] * margin), mult)
            obj = obj.replace(out_bound=bound)
        return obj
    if isinstance(obj, Module):
        new = object.__new__(type(obj))
        new.__dict__.update(obj.__dict__)
        for k, v in obj.__dict__.items():
            new.__dict__[k] = _rebind_bounds(v, rec, margin, mult)
        return new
    if isinstance(obj, list):
        return [_rebind_bounds(v, rec, margin, mult) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_rebind_bounds(v, rec, margin, mult) for v in obj)
    if isinstance(obj, dict):
        return {k: _rebind_bounds(v, rec, margin, mult) for k, v in obj.items()}
    return obj


def calibrate_out_bounds(net: Module, run, inputs: Sequence,
                         margin: float = 1.1, mult: int = 512) -> Module:
    """Run ``run(net, x)`` eagerly over calibration inputs, recording each
    non-subm conv/pool layer's true active output count, and return a net
    with ``out_bound`` set to ``round_up(max_count * margin, mult)``.

    ``run`` defaults to ``net(x)`` when None.
    """
    if run is None:
        run = lambda m, x: m(x)
    with record_voxel_counts() as rec:
        for x in inputs:
            run(net, x)
    return _rebind_bounds(net, rec, margin, mult)


def _walk_layers(obj, out: List):
    """Deterministic traversal collecting every conv/pool layer (the
    order ``export_out_bounds``/``apply_out_bounds`` share)."""
    from .modules.conv import SparseConvolution
    from .modules.pool import _SparsePoolBase

    if isinstance(obj, (SparseConvolution, _SparsePoolBase)):
        out.append(obj)
        return
    if isinstance(obj, Module):
        for v in obj.__dict__.values():
            _walk_layers(v, out)
        return
    if isinstance(obj, (list, tuple)):
        for v in obj:
            _walk_layers(v, out)
        return
    if isinstance(obj, dict):
        for v in obj.values():
            _walk_layers(v, out)


def export_out_bounds(net: Module) -> List[Optional[int]]:
    """Per-layer ``out_bound`` list in deterministic traversal order —
    serializable calibration artifact (a calibration pass is eager per
    op; exporting lets deployments and benchmarks pay it once and load
    the bounds from disk, like the reference's recorded
    ``max_num_voxels`` buffers, ``conv.py:619-639``)."""
    layers: List = []
    _walk_layers(net, layers)
    return [getattr(l, "out_bound", None) for l in layers]


def apply_out_bounds(net: Module, bounds: Sequence[Optional[int]]) -> Module:
    """Inverse of :func:`export_out_bounds`: rebuild ``net`` with the
    given per-layer bounds (same traversal order)."""
    layers: List = []
    _walk_layers(net, layers)
    assert len(layers) == len(bounds), (
        f"bounds list has {len(bounds)} entries for {len(layers)} layers")
    by_id = {id(l): b for l, b in zip(layers, bounds) if b is not None}

    def rebind(obj):
        from .modules.conv import SparseConvolution
        from .modules.pool import _SparsePoolBase

        if isinstance(obj, (SparseConvolution, _SparsePoolBase)):
            if id(obj) in by_id:
                return obj.replace(out_bound=int(by_id[id(obj)]))
            return obj
        if isinstance(obj, Module):
            new = object.__new__(type(obj))
            new.__dict__.update(obj.__dict__)
            for k, v in obj.__dict__.items():
                new.__dict__[k] = rebind(v)
            return new
        if isinstance(obj, list):
            return [rebind(v) for v in obj]
        if isinstance(obj, tuple):
            return tuple(rebind(v) for v in obj)
        if isinstance(obj, dict):
            return {k: rebind(v) for k, v in obj.items()}
        return obj

    return rebind(net)
