#!/usr/bin/env python
"""Benchmark driver — runs the full metric set on the attached TPU chip:

* bench_basic  (120k-voxel scan, ref net, bf16): forward + backward
* bench_large  (900k-voxel scan):                forward + backward
* CenterPoint north star (nuScenes-style encoder): forward

stdout carries ONE JSON line — the primary bench_basic forward metric.
Every metric (including the primary) is also printed to stderr as its own
JSON line so the driver's tail capture records the complete set.

Baselines: spconv 2.x f16 on A100 (docs/BENCHMARK.md:27, BASELINE.md) —
basic fwd 13.02 ms / bwd 12.43 ms; large fwd 19.85 ms / bwd 31.24 ms;
CenterPoint north star ≤5 ms/scan.  vs_baseline = baseline / ours.

Flags:
  --algo=auto|native|sk|dg  compute path (default: auto — tuner-resolved;
                        key-sorted TPU tensors run the dynamic-gather kernel)
  --only=basic|large|cp|int8 run a single section (debugging)
  --skip-bwd            skip backward measurements
"""

import json
import sys
import time

import numpy as np


def _emit(metric, value_ms, baseline_ms, primary=False):
    line = json.dumps({
        "metric": metric,
        "value": round(value_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / max(value_ms, 1e-9), 3),
    })
    print(line, file=sys.stderr, flush=True)
    if primary:
        print(line, flush=True)


def _sync_floor(jax):
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    return (time.time() - t0) / 5 * 1000


def _cached_bounds(name, fn):
    import json as _json
    from pathlib import Path

    cache = Path(__file__).parent / name
    if cache.exists():
        return _json.loads(cache.read_text())
    b = fn()
    cache.write_text(_json.dumps(b))
    return b


def run_bench_net(large, algo, do_bwd, floor_ms):
    import jax
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu.benchmark.basic import (
        BenchNet, load_basic_data, load_large_data, make_bench_input,
        measure_pool_bounds)

    tag = "large" if large else "basic"
    dtype = jnp.bfloat16
    if large:
        voxels, coors, spatial_shape = load_large_data()
    else:
        voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=dtype)

    # deployment-style static sizing, cached on disk (the eager sizing pass
    # costs minutes of dispatch overhead through the TPU tunnel)
    def pool_fn():
        x32 = make_bench_input(voxels, coors, spatial_shape,
                               dtype=jnp.float32)
        return measure_pool_bounds(spatial_shape, x32)

    pool_bounds = _cached_bounds(f".bench_pool_bounds{'_large' if large else ''}.json", pool_fn)

    print(f"[{tag}] pool bounds {pool_bounds}", file=sys.stderr, flush=True)

    net = BenchNet(spatial_shape, dtype=dtype, pool_bounds=pool_bounds,
                   algo=None if algo == "auto" else algo)

    REP = 10

    # NOTE: indices are perturbed per iteration (by an always-zero,
    # unprovably-zero term) so XLA cannot hoist the rulebook builds out of
    # the repetition loop — the reference benchmark rebuilds rulebooks
    # every forward (fresh SparseConvTensor per call, benchmark/basic.py:
    # 182-185), so ours must too.
    @jax.jit
    def fwd_rep(m, feats, inds):
        def body(i, c):
            f = feats * (1.0 + 0.0 * c).astype(feats.dtype)
            ii = inds + jnp.isnan(c).astype(inds.dtype)
            t = spconv_tpu.SparseConvTensor(f, ii, spatial_shape, 1,
                                            keys_sorted=True)
            out = m(t)
            return jnp.sum(out.features.astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(fwd_rep(net, x.features, x.indices))
    print(f"[{tag}] fwd compile+first: {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

    n_outer = 3
    t0 = time.time()
    for _ in range(n_outer):
        float(fwd_rep(net, x.features, x.indices))
    fwd_ms = ((time.time() - t0) / n_outer * 1000 - floor_ms) / REP

    base_fwd = 19.85 if large else 13.02
    _emit(
        f"bench_{tag} bf16 forward ms ({'900k' if large else '120k'}-voxel "
        f"scan, ref net, algo={algo})",
        fwd_ms, base_fwd, primary=not large,
    )

    if do_bwd:
        @jax.jit
        def bwd_rep(m, feats, inds):
            def body(i, c):
                ii = inds + jnp.isnan(c).astype(inds.dtype)

                def loss(m_, f):
                    t = spconv_tpu.SparseConvTensor(
                        f, ii, spatial_shape, 1, keys_sorted=True)
                    return jnp.sum(m_(t).features.astype(jnp.float32) ** 2)

                f = feats * (1.0 + 0.0 * c).astype(feats.dtype)
                l, grads = spconv_tpu.filter_value_and_grad(loss)(m, f)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads)
                           if g is not None)
                return l + gsum

            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        t0 = time.time()
        float(bwd_rep(net, x.features, x.indices))
        print(f"[{tag}] bwd compile: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        for _ in range(n_outer):
            float(bwd_rep(net, x.features, x.indices))
        total_ms = ((time.time() - t0) / n_outer * 1000 - floor_ms) / REP
        bwd_ms = total_ms - fwd_ms  # fwd+bwd step minus fwd
        base_bwd = 31.24 if large else 12.43
        _emit(f"bench_{tag} bf16 backward ms (algo={algo})", bwd_ms, base_bwd)

    return fwd_ms


def run_centerpoint(algo, floor_ms, batch=1):
    import jax
    import jax.numpy as jnp

    from spconv_tpu.benchmark.centerpoint import (
        build_calibrated_encoder, load_centerpoint_input)

    x, nv = load_centerpoint_input(batch=batch)
    tag = "cp" if batch == 1 else f"cp_b{batch}"
    print(f"[{tag}] {nv} voxels, grid {x.spatial_shape}", file=sys.stderr,
          flush=True)
    net = build_calibrated_encoder(x, algo=None if algo == "auto" else algo)

    REP = 5
    shape = x.spatial_shape

    @jax.jit
    def rep(m, feats, inds):
        import spconv_tpu

        def body(i, c):
            f = feats * (1.0 + 0.0 * c).astype(feats.dtype)
            ii = inds + jnp.isnan(c).astype(inds.dtype)
            t = spconv_tpu.SparseConvTensor(f, ii, shape, batch,
                                            keys_sorted=True)
            return jnp.sum(m.bev(t).astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(rep(net, x.features, x.indices))
    print(f"[{tag}] compile+first: {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    n_outer = 3
    t0 = time.time()
    for _ in range(n_outer):
        float(rep(net, x.features, x.indices))
    ms = ((time.time() - t0) / n_outer * 1000 - floor_ms) / REP / batch
    if batch == 1:
        _emit("CenterPoint encoder bf16 forward ms/scan (north star ≤5 ms)",
              ms, 5.0)
    else:
        _emit(f"CenterPoint encoder bf16 forward ms/scan "
              f"(batched throughput, B={batch})", ms, 5.0)
    return ms


def run_int8(floor_ms):
    """int8 vs bf16 DG subm conv at C=K ∈ {64, 128} (reference int8
    story: 1.2-2.7x over f16 at C,K>=64, docs/INT8_GUIDE.md)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from spconv_tpu.benchmark.basic import load_basic_data, make_bench_input
    from spconv_tpu.ops import coords as C
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv, dg_subm_conv_q

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
    shape = tuple(int(s) for s in spatial_shape)
    n = x.indices.shape[0]
    rng = np.random.RandomState(0)
    keys, _ = C.linearize(x.indices, shape, 1)
    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3), include_center=True)
    W = 384
    np_t, n_pad = SK._n_pad_for(n, 128, W)
    sent = int(np.prod(shape))
    plans = SK.build_sk_plans(SK._pad_rows(keys, np_t, sent), sent,
                              deltas_np, groups, tile=128, window=W,
                              n_pad=n_pad, align=128)
    REP = 8

    def timeit(f, arg):
        jf = jax.jit(f)
        float(jf(arg))
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            float(jf(arg))
            best = min(best, time.time() - t0)
        return best * 1000 / REP - floor_ms / REP

    for cch in (64, 128):
        kout = cch
        fbf = jnp.asarray(rng.randn(n, cch) * 0.3, jnp.bfloat16)
        fi8 = jnp.asarray(rng.randint(-100, 100, (n, cch)), jnp.int8)
        wbf = jnp.asarray(rng.randn(kout, 3, 3, 3, cch) * 0.05,
                          jnp.bfloat16)
        wi8 = jnp.asarray(rng.randint(-80, 80, (kout, 3, 3, 3, cch)),
                          jnp.int8)
        scale = jnp.asarray(rng.uniform(0.001, 0.01, (kout,)), jnp.float32)

        def bf(ff):
            def body(_, c):
                f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
                o = dg_subm_conv(f2, keys, wbf, spatial_shape=shape,
                                 batch_size=1, dilation=(1, 1, 1),
                                 window=W, plans=plans)
                return c + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        def i8(ff):
            def body(_, c):
                f2 = (ff.astype(jnp.int32)
                      + (c > 1e30).astype(jnp.int32)).astype(jnp.int8)
                o = dg_subm_conv_q(f2, keys, wi8, scale, None,
                                   spatial_shape=shape, batch_size=1,
                                   dilation=(1, 1, 1), act="relu",
                                   out_dtype=jnp.int8, window=W,
                                   plans=plans)
                return c + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        ms_bf = timeit(bf, fbf)
        ms_i8 = timeit(i8, fi8)
        _emit(f"int8 DG subm conv ms (125k voxels, C=K={cch}; bf16 same "
              f"layer {ms_bf:.2f} ms)", ms_i8, ms_bf)


def run_centerpoint_int8(floor_ms):
    """int8 CenterPoint encoder (PTQ via quantize_encoder: fused
    conv+relu and residual-fused conv+add+relu int8 layers)."""
    import jax
    import jax.numpy as jnp

    from spconv_tpu.benchmark.centerpoint import load_centerpoint_input
    from spconv_tpu.calibrate import calibrate_out_bounds
    from spconv_tpu.models import centerpoint_encoder
    from spconv_tpu.quantization import quantize_encoder

    x, nv = load_centerpoint_input(dtype=jnp.float32)
    print(f"[cpq] {nv} voxels, grid {x.spatial_shape}", file=sys.stderr,
          flush=True)
    net32 = centerpoint_encoder(in_channels=5, bn=False,
                                dtype=jnp.float32)
    net32 = calibrate_out_bounds(net32, lambda m, t: m.bev(t), [x],
                                 margin=1.15, mult=512)
    qenc = quantize_encoder(net32, [x])

    REP = 5
    shape = x.spatial_shape

    @jax.jit
    def rep(m, feats, inds):
        import spconv_tpu

        def body(i, c):
            f = feats * (1.0 + 0.0 * c).astype(feats.dtype)
            ii = inds + jnp.isnan(c).astype(inds.dtype)
            t = spconv_tpu.SparseConvTensor(f, ii, shape, 1,
                                            keys_sorted=True)
            return jnp.sum(m.bev(t).astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(rep(qenc, x.features, x.indices))
    print(f"[cpq] compile+first: {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    n_outer = 3
    t0 = time.time()
    for _ in range(n_outer):
        float(rep(qenc, x.features, x.indices))
    ms = ((time.time() - t0) / n_outer * 1000 - floor_ms) / REP
    _emit("CenterPoint encoder int8 forward ms/scan (PTQ, fused "
          "epilogues)", ms, 5.0)
    return ms


def _enable_compile_cache(jax):
    """Persistent XLA compilation cache: the second bench invocation
    skips the ~9 min of per-kernel compiles (VERDICT r2 weak #7).
    Cache lives in the repo so driver runs from any cwd share it."""
    from pathlib import Path

    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"compile cache unavailable: {e}", file=sys.stderr)


def main():
    import jax

    _enable_compile_cache(jax)
    algo = "auto"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--algo="):
            algo = a.split("=", 1)[1]
        elif a.startswith("--only="):
            only = a.split("=", 1)[1]
        elif a == "--large":  # legacy flag
            only = "large"
    do_bwd = "--skip-bwd" not in sys.argv

    floor_ms = _sync_floor(jax)
    print(f"sync floor {floor_ms:.1f} ms", file=sys.stderr, flush=True)

    # one failing section must not blank the whole artifact
    def _section(name, fn):
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    if only in (None, "basic"):
        _section("basic",
                 lambda: run_bench_net(False, algo, do_bwd, floor_ms))
    if only in (None, "large"):
        _section("large",
                 lambda: run_bench_net(True, algo, do_bwd, floor_ms))
    if only in (None, "cp"):
        _section("cp", lambda: run_centerpoint(algo, floor_ms))
    if only in (None, "cpb"):
        _section("cpb", lambda: run_centerpoint(algo, floor_ms, batch=4))
    if only in (None, "int8"):
        _section("int8", lambda: run_int8(floor_ms))
    if only in (None, "cpq"):
        _section("cpq", lambda: run_centerpoint_int8(floor_ms))


if __name__ == "__main__":
    main()
