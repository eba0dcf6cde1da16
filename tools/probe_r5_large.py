#!/usr/bin/env python
"""Round-5 sweep on the 914k-voxel scan, C=K=64 subm 3^3 (the bench_large
stage-0 shape that dominates the net): posmode R/window matrix, search
mode baseline, and SPCONV_DG_ABLATE-style stage splits.

Run: python tools/probe_r5_large.py [rep]
"""

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

from spconv_tpu.benchmark.basic import load_large_data, make_bench_input
from spconv_tpu.ops import coords as CO
from spconv_tpu.ops.pallas import sorted_conv as SK
from spconv_tpu.ops.pallas import dg_conv as DG

REP = int(sys.argv[1]) if len(sys.argv) > 1 else 8

voxels, coors, spatial_shape = load_large_data()
x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
shape = tuple(int(s) for s in spatial_shape)
n = x.indices.shape[0]
print(f"nbuf={n} grid={shape}", flush=True)

rng = np.random.RandomState(0)
C = K = 64
feats = jnp.asarray(rng.randn(n, C) * 0.3, jnp.bfloat16)
W_kr = jnp.asarray(rng.randn(K, 3, 3, 3, C) * 0.05, jnp.bfloat16)
keys, _ = CO.linearize(x.indices, shape, 1)
keys = jax.block_until_ready(keys)

deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
groups_c = SK.sk_groups((3, 3, 3), include_center=True)
sent = int(np.prod(shape))

tiny = jax.jit(lambda s: s + 1.0)
float(tiny(0.0))
t0 = time.time()
for _ in range(5):
    float(tiny(0.0))
floor_ms = (time.time() - t0) / 5 * 1000
print(f"sync floor {floor_ms:.1f} ms", flush=True)


def build(rows, window):
    np_t, n_pad = SK._n_pad_for(n, 128 * rows, window)
    keys_p = SK._pad_rows(keys, np_t, sent)
    plans = SK.build_sk_plans(keys_p, sent, deltas_np, groups_c,
                              tile=128 * rows, window=window, n_pad=n_pad,
                              align=128)
    return plans


def timeit(label, fn, *args):
    jf = jax.jit(fn)
    t0 = time.time()
    float(jf(*args))
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(jf(*args))
        best = min(best, time.time() - t0)
    ms = (best * 1000 - floor_ms) / REP
    print(f"{label:44s} {ms:8.2f} ms  (compile {comp:.0f}s)", flush=True)
    return ms


def rep_conv(ff, rows, window, plans, pos):
    def body(_, c):
        f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
        o = DG.dg_subm_conv(f2, keys, W_kr, spatial_shape=shape,
                            batch_size=1, dilation=(1, 1, 1),
                            window=window, rows_per_tile=rows,
                            plans=plans, pos=pos)
        return c + jnp.sum(o.astype(jnp.float32))
    return jax.lax.fori_loop(0, REP, body, jnp.float32(0))


def rep_build_pos(ff, rows, window, plans):
    """plan-consumer that ALSO builds pos each iteration (the c0 role)."""
    def body(_, c):
        f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
        pos = DG.build_dg_pos(keys + (c > 1e30).astype(jnp.int32),
                              plans[0], ksize=(3, 3, 3),
                              dilation=(1, 1, 1), spatial_shape=shape,
                              batch_size=1, window=window, rows=rows)
        o = DG.dg_subm_conv(f2, keys, W_kr, spatial_shape=shape,
                            batch_size=1, dilation=(1, 1, 1),
                            window=window, rows_per_tile=rows,
                            plans=plans, pos=pos)
        return c + jnp.sum(o.astype(jnp.float32))
    return jax.lax.fori_loop(0, REP, body, jnp.float32(0))


def rep_plans_only(ff, rows, window):
    def body(_, c):
        k2 = keys + (c > 1e30).astype(jnp.int32)
        np_t, n_pad = SK._n_pad_for(n, 128 * rows, window)
        keys_p = SK._pad_rows(k2, np_t, sent)
        plans = SK.build_sk_plans(keys_p, sent, deltas_np, groups_c,
                                  tile=128 * rows, window=window,
                                  n_pad=n_pad, align=128)
        return c + jnp.sum(plans[0].starts.astype(jnp.float32))
    return jax.lax.fori_loop(0, REP, body, jnp.float32(0))


# --- posmode matrix ---------------------------------------------------
for rows, window in [(1, 256), (1, 384), (1, 512), (2, 512), (4, 768)]:
    try:
        plans = build(rows, window)
        pos = jax.jit(
            lambda pl: DG.build_dg_pos(
                keys, pl, ksize=(3, 3, 3), dilation=(1, 1, 1),
                spatial_shape=shape, batch_size=1, window=window,
                rows=rows)
        )(plans[0])
        pos = jax.block_until_ready(pos)
        timeit(f"posmode R={rows} W={window}",
               lambda ff, r=rows, w=window, pl=plans, p=pos:
               rep_conv(ff, r, w, pl, p), feats)
    except Exception as e:  # noqa: BLE001
        print(f"posmode R={rows} W={window} FAILED: "
              f"{type(e).__name__}: {str(e)[:120]}", flush=True)

# --- search mode + first-layer roles ----------------------------------
plans1 = build(1, 384)
timeit("search mode R=1 W=384 (no pos)",
       lambda ff: rep_conv(ff, 1, 384, plans1, None), feats)
timeit("pos-build + posmode R=1 W=384 (c0 role)",
       lambda ff: rep_build_pos(ff, 1, 384, plans1), feats)
timeit("plan build alone R=1 W=384",
       lambda ff: rep_plans_only(ff, 1, 384), feats)
