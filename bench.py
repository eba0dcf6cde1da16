#!/usr/bin/env python
"""Benchmark driver: reference-parity bench_basic net on the real 120k-voxel
LiDAR scan, bf16 forward, on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: spconv 2.x bench_basic f16 forward on A100 = 13.02 ms
(docs/BENCHMARK.md:27, see BASELINE.md).  vs_baseline = baseline / ours
(>1 means we beat the A100 number).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu.benchmark.basic import (
        BenchNet, load_basic_data, make_bench_input, measure_pool_bounds)

    dtype = jnp.bfloat16
    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=dtype)

    # size per-stage buffers once (deployment-style static sizing); cached
    # on disk because the eager sizing pass costs minutes of dispatch
    # overhead on the tunneled TPU
    import json as _json
    from pathlib import Path

    cache = Path(__file__).parent / ".bench_pool_bounds.json"
    if cache.exists():
        bounds = _json.loads(cache.read_text())
    else:
        x_f32 = make_bench_input(voxels, coors, spatial_shape,
                                 dtype=jnp.float32)
        bounds = measure_pool_bounds(spatial_shape, x_f32)
        cache.write_text(_json.dumps(bounds))
    print(f"pool bounds: {bounds}", file=sys.stderr)

    net = BenchNet(spatial_shape, dtype=dtype, pool_bounds=bounds)

    # Device-time measurement: REP chained iterations inside ONE jitted
    # program (per-dispatch tunnel overhead on this platform is ~30 ms and
    # block_until_ready is unreliable, so external loops mis-measure; an
    # input data dependency per iteration prevents loop-invariant hoisting).
    REP = 10

    @jax.jit
    def fwd_rep(m, feats, inds):
        def body(i, c):
            f = feats * (1.0 + 0.0 * c).astype(feats.dtype)
            t = spconv_tpu.SparseConvTensor(f, inds, spatial_shape, 1)
            out = m(t)
            return jnp.sum(out.features.astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    @jax.jit
    def fwd_once(m, feats, inds):
        t = spconv_tpu.SparseConvTensor(feats, inds, spatial_shape, 1)
        return jnp.sum(m(t).features.astype(jnp.float32))

    # sync floor
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor_ms = (time.time() - t0) / 5 * 1000

    t0 = time.time()
    float(fwd_rep(net, x.features, x.indices))
    print(f"compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    n_outer = 3
    t0 = time.time()
    for _ in range(n_outer):
        float(fwd_rep(net, x.features, x.indices))
    total_ms = (time.time() - t0) / n_outer * 1000
    ms = (total_ms - floor_ms) / REP

    baseline_ms = 13.02  # A100 f16 fwd, docs/BENCHMARK.md:27
    print(json.dumps({
        "metric": "bench_basic bf16 forward ms (120k-voxel scan, ref net)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 3),
    }))


if __name__ == "__main__":
    main()
