#!/usr/bin/env python
"""Fused sorted-key pool vs native pair-gather pool at bench sizes.

Times SparseMaxPool3d(2,2) under algo="sk" vs algo="native" on the
stage-0 geometry of the basic/large scans (C=64 features), plus a
segment-max variant of the native path.

Run: python tools/probe_pool_algo.py [basic|large]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import spconv_tpu
from spconv_tpu.benchmark.basic import (load_basic_data, load_large_data,
                                        make_bench_input)

which = sys.argv[1] if len(sys.argv) > 1 else "large"
if which == "large":
    voxels, coors, spatial_shape = load_large_data()
    bounds = json.loads((REPO / ".bench_pool_bounds_large.json").read_text())
else:
    voxels, coors, spatial_shape = load_basic_data()
    bounds = json.loads((REPO / ".bench_pool_bounds.json").read_text())

x0 = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
n = x0.indices.shape[0]
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(n, 64) * 0.3, jnp.bfloat16)
x = spconv_tpu.SparseConvTensor(feats, x0.indices, spatial_shape, 1,
                                keys_sorted=True)
print(f"[{which}] n={n} grid={spatial_shape} out_bound={bounds[0]}",
      flush=True)

REP = 10
tiny = jax.jit(lambda s: s + 1.0)
float(tiny(0.0))
t0 = time.time()
for _ in range(5):
    float(tiny(0.0))
floor_ms = (time.time() - t0) / 5 * 1000
print(f"sync floor {floor_ms:.1f} ms", flush=True)


def timed(name, pool):
    @jax.jit
    def rep_fn(f0, i0):
        def body(i, c):
            f = f0 * (1.0 + 0.0 * c).astype(f0.dtype)
            ii = i0 + jnp.isnan(c).astype(i0.dtype)
            t = spconv_tpu.SparseConvTensor(f, ii, spatial_shape, 1,
                                            keys_sorted=True)
            o = pool(t)
            return jnp.sum(o.features.astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(rep_fn(x.features, x.indices))
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(rep_fn(x.features, x.indices))
        best = min(best, time.time() - t0)
    ms = (best * 1000 - floor_ms) / REP
    print(f"  {name:28s} {ms:8.2f} ms (compile {comp:.0f}s)", flush=True)


timed("maxpool algo=native",
      spconv_tpu.SparseMaxPool3d(2, 2, out_bound=bounds[0],
                                 out_bound_ratio=1.0, algo="native"))
timed("maxpool algo=sk",
      spconv_tpu.SparseMaxPool3d(2, 2, out_bound=bounds[0],
                                 out_bound_ratio=1.0, algo="sk"))
