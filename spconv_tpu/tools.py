"""Profiling tools (parity: ``spconv/tools.py`` CUDAKernelTimer and the
``benchmark=True`` per-layer recording, SURVEY.md §5).

On TPU, in-step timing is done with ``jax.profiler`` traces + named
scopes (XLA fuses across Python call boundaries, so per-op host timers
are meaningless inside jit).  This module provides:

* ``KernelTimer`` — reference-compatible namespace/record API; under
  jit it emits ``jax.named_scope`` annotations visible in profiler
  traces; outside jit it records wall times.
* ``benchmark_model`` — device-time measurement of a callable via in-jit
  chained repetition (reliable under async dispatch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["KernelTimer", "CUDAKernelTimer", "benchmark_model"]


class KernelTimer:
    """API parity with ``spconv/tools.py:CUDAKernelTimer``."""

    def __init__(self, enable: bool = True):
        self.enable = enable
        self._records: Dict[str, float] = {}
        self._ns = []

    @contextlib.contextmanager
    def namespace(self, name: str):
        self._ns.append(name)
        with jax.named_scope(name):
            t0 = time.time()
            try:
                yield
            finally:
                if self.enable:
                    key = ".".join(self._ns)
                    self._records[key] = self._records.get(key, 0.0) + (
                        time.time() - t0
                    ) * 1000
                self._ns.pop()

    @contextlib.contextmanager
    def record(self, name: str, stream: int = 0):
        del stream
        with self.namespace(name):
            yield

    def get_all_pair_time(self) -> Dict[str, float]:
        return dict(self._records)


CUDAKernelTimer = KernelTimer  # reference-name alias


def benchmark_model(fn: Callable, args, rep: int = 10, n_outer: int = 3,
                    perturb: Optional[Callable] = None) -> float:
    """Device ms/iteration of ``fn(*args)`` measured with REP chained
    in-jit iterations (see bench.py for why external loops mis-measure on
    remote-dispatch platforms).  ``fn`` must return an array; ``perturb``
    maps (carry_scalar, args) → args adding a data dependency (defaults to
    scaling the first float array arg)."""

    @jax.jit
    def run(seed, *a):
        def body(i, c):
            if perturb is not None:
                aa = perturb(c, a)
            else:
                aa = list(a)
                for j, x in enumerate(aa):
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
                        aa[j] = x * (1.0 + 0.0 * c).astype(x.dtype)
                        break
            out = fn(*aa)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32))

        return jax.lax.fori_loop(0, rep, body, seed)

    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor_ms = (time.time() - t0) / 5 * 1000

    float(run(jnp.float32(0), *args))  # compile
    t0 = time.time()
    for _ in range(n_outer):
        float(run(jnp.float32(0), *args))
    total_ms = (time.time() - t0) / n_outer * 1000
    return max(0.0, (total_ms - floor_ms) / rep)
