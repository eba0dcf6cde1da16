#!/usr/bin/env python
"""Pool-2 implementation shootout at bench sizes (TPU).

Variants:
  native      — current pair-table gather-max (f32 cast)
  native-bf16 — pair-table gather-max, bf16 end to end
  seg-scatter — one payload-sort gather + ordered scatter-max (bf16)
  seg-sorted  — jax.ops.segment_max(indices_are_sorted=True)
  sk          — fused Pallas sorted-key pool

Run: python tools/probe_pool_v2.py [basic|large]
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
from spconv_tpu.ops import coords as C

which = sys.argv[1] if len(sys.argv) > 1 else "large"
if which == "large":
    voxels, coors, spatial_shape = load_large_data()
    bounds = json.loads((REPO / ".bench_pool_bounds_large.json").read_text())
else:
    voxels, coors, spatial_shape = load_basic_data()
    bounds = json.loads((REPO / ".bench_pool_bounds.json").read_text())

x0 = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
n = x0.indices.shape[0]
out_bound = bounds[0]
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(n, 64) * 0.3, jnp.bfloat16)
inds = x0.indices
shape = tuple(int(s) for s in spatial_shape)
print(f"[{which}] n={n} out_bound={out_bound}", flush=True)

REP = 10
tiny = jax.jit(lambda s: s + 1.0)
float(tiny(0.0))
t0 = time.time()
for _ in range(5):
    float(tiny(0.0))
floor_ms = (time.time() - t0) / 5 * 1000
print(f"sync floor {floor_ms:.1f} ms", flush=True)


def timed(name, fn):
    @jax.jit
    def rep_fn(f0, i0):
        def body(i, c):
            f = f0 * (1.0 + 0.0 * c).astype(f0.dtype)
            ii = i0 + jnp.isnan(c).astype(i0.dtype)
            return jnp.sum(fn(f, ii).astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(rep_fn(feats, inds))
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(rep_fn(feats, inds))
        best = min(best, time.time() - t0)
    ms = (best * 1000 - floor_ms) / REP
    print(f"  {name:28s} {ms:8.2f} ms (compile {comp:.0f}s)", flush=True)
    return ms


# ---- shared discovery pieces (inside each variant so rebuild is timed) ----
def pooled_keys(ii):
    ndim = ii.shape[1] - 1
    out_shape = C.get_conv_output_size(
        shape, (2,) * ndim, (2,) * ndim, (0,) * ndim, (1,) * ndim)
    oshape_arr = jnp.asarray(out_shape, jnp.int32)
    oc = ii[:, 1:] // 2
    valid = (ii[:, 0] >= 0) & jnp.all(oc < oshape_arr, axis=-1)
    out_c = jnp.concatenate([ii[:, :1], oc], axis=-1)
    keys, sentinel = C.linearize(out_c, out_shape, 1, valid)
    return keys, sentinel


def native(f, ii, dtype=None):
    from spconv_tpu.ops.rulebook import build_pool2_rulebook
    from spconv_tpu.ops.pool import indice_maxpool

    data = build_pool2_rulebook(ii, spatial_shape=shape, batch_size=1,
                                out_bound=out_bound)
    return indice_maxpool(f, data.pair_fwd)


def native_bf16(f, ii):
    from spconv_tpu.ops.rulebook import build_pool2_rulebook

    data = build_pool2_rulebook(ii, spatial_shape=shape, batch_size=1,
                                out_bound=out_bound)
    pair_fwd = data.pair_fwd
    kv, n_out = pair_fwd.shape
    c = f.shape[1]
    fpad = jnp.concatenate([f, jnp.full((1, c), -jnp.inf, f.dtype)], axis=0)
    pf = jnp.where(pair_fwd >= 0, pair_fwd, f.shape[0])
    acc = jnp.full((n_out, c), -jnp.inf, f.dtype)
    for k in range(kv):
        acc = jnp.maximum(acc, jnp.take(fpad, pf[k], axis=0))
    return jnp.where(jnp.isfinite(acc), acc, 0)


def seg_scatter(f, ii):
    keys, sentinel = pooled_keys(ii)
    sk, order = C.sort_with_ids(keys)
    not_sent = ~C.is_sentinel(sk, sentinel)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    g = jnp.take(f, order, axis=0)  # one gather, bf16
    seg = jnp.where(not_sent & (uniq_pos < out_bound), uniq_pos, out_bound)
    acc = jnp.full((out_bound + 1, f.shape[1]), -jnp.inf, f.dtype)
    acc = acc.at[seg].max(g, mode="drop", indices_are_sorted=True)
    return jnp.where(jnp.isfinite(acc[:out_bound]), acc[:out_bound], 0)


def seg_sorted(f, ii):
    keys, sentinel = pooled_keys(ii)
    sk, order = C.sort_with_ids(keys)
    not_sent = ~C.is_sentinel(sk, sentinel)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    g = jnp.take(f, order, axis=0)
    seg = jnp.where(not_sent & (uniq_pos < out_bound), uniq_pos, out_bound)
    acc = jax.ops.segment_max(g.astype(jnp.float32), seg,
                              num_segments=out_bound + 1,
                              indices_are_sorted=True)[:out_bound]
    return jnp.where(jnp.isfinite(acc), acc, 0).astype(f.dtype)


def sk_fused(f, ii):
    pool = spconv_tpu.SparseMaxPool3d(2, 2, out_bound=out_bound,
                                      out_bound_ratio=1.0, algo="sk")
    t = spconv_tpu.SparseConvTensor(f, ii, shape, 1, keys_sorted=True)
    return pool(t).features


timed("native (f32 cast)", native)
timed("native-bf16", native_bf16)
timed("seg-scatter bf16", seg_scatter)
timed("seg-sorted f32", seg_sorted)
timed("sk fused", sk_fused)
