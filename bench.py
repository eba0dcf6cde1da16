#!/usr/bin/env python
"""Benchmark driver: reference-parity bench_basic net on the real 120k-voxel
LiDAR scan, bf16 forward, on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: spconv 2.x bench_basic f16 forward on A100 = 13.02 ms
(docs/BENCHMARK.md:27, see BASELINE.md).  vs_baseline = baseline / ours
(>1 means we beat the A100 number).

Flags: --large (900k-voxel scan, baseline 19.85 ms), --bwd (fwd+bwd step,
baselines 25.45 ms combined) — extra results go to stderr, the primary
fwd-basic JSON stays the single stdout line.
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
        BenchNet, load_basic_data, load_large_data, make_bench_input,
        measure_pool_bounds)

    large = "--large" in sys.argv
    do_bwd = "--bwd" in sys.argv
    dtype = jnp.bfloat16
    if large:
        voxels, coors, spatial_shape = load_large_data()
    else:
        voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=dtype)

    # size per-stage buffers once (deployment-style static sizing); cached
    # on disk because the eager sizing pass costs minutes of dispatch
    # overhead on the tunneled TPU
    import json as _json
    from pathlib import Path

    name = ".bench_pool_bounds_large.json" if large else ".bench_pool_bounds.json"
    cache = Path(__file__).parent / name
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

    if do_bwd:
        @jax.jit
        def bwd_rep(m, feats, inds):
            def loss(m_, f):
                t = spconv_tpu.SparseConvTensor(f, inds, spatial_shape, 1)
                return jnp.sum(m_(t).features.astype(jnp.float32) ** 2)

            def body(i, c):
                f = feats * (1.0 + 0.0 * c).astype(feats.dtype)
                l, grads = spconv_tpu.filter_value_and_grad(loss)(m, f)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads)
                           if g is not None)
                return l + gsum

            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        t0 = time.time()
        float(bwd_rep(net, x.features, x.indices))
        print(f"bwd compile: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _ in range(n_outer):
            float(bwd_rep(net, x.features, x.indices))
        bwd_ms = ((time.time() - t0) / n_outer * 1000 - floor_ms) / REP - ms
        base_bwd = 31.24 if large else 12.43  # A100 f16 bwd
        print(json.dumps({
            "metric": "bench bf16 backward ms",
            "value": round(bwd_ms, 3),
            "vs_baseline": round(base_bwd / max(bwd_ms, 1e-9), 3),
        }), file=sys.stderr)

    baseline_ms = 19.85 if large else 13.02  # A100 f16 fwd, BENCHMARK.md
    scan = "900k" if large else "120k"
    print(json.dumps({
        "metric": f"bench_{'large' if large else 'basic'} bf16 forward ms "
                  f"({scan}-voxel scan, ref net)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 3),
    }))


if __name__ == "__main__":
    main()
