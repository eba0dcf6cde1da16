"""Deployment export (role parity: the reference's deployment stack —
``libspconv`` pure-C++ inference (docs/PURE_CPP_BUILD.md) and the
torch.fx ``NetworkInterpreter`` TensorRT converter
(``pytorch/interpreter.py``)).

The TPU-native deployment artifact is a serialized **StableHLO** program:
the whole net (rulebook build + conv + epilogues) compiles to one static
XLA program with fixed buffer bounds — exactly the reference's
StaticAllocator deployment mode, but the "allocator" is the XLA runtime.
The exported artifact runs from C++ via PJRT without Python.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["export_inference", "serialize", "deserialize_and_call"]


def export_inference(fn: Callable, example_args: Sequence):
    """Export ``fn(*example_args)`` as a jax.export Exported object with
    static shapes (deployable to PJRT C++ runtimes)."""
    from jax import export as jexport

    jitted = jax.jit(fn)
    specs = [
        jax.ShapeDtypeStruct(a.shape, a.dtype) if hasattr(a, "shape") else a
        for a in example_args
    ]
    return jexport.export(jitted)(*specs)


def serialize(fn: Callable, example_args: Sequence) -> bytes:  # (bytearray on some jax versions)
    """One-call: export + serialize to portable bytes."""
    return export_inference(fn, example_args).serialize()


def deserialize_and_call(blob: bytes, *args):
    """Load a serialized program and run it (smoke-test helper; C++
    deployments load the same blob through PJRT)."""
    from jax import export as jexport

    exported = jexport.deserialize(blob)
    return exported.call(*args)
