#!/usr/bin/env python
"""Whole-net-minus-sum-of-layers gap localization: time growing PREFIXES
of the bench net under the exact bench.py harness (fori_loop REP chained,
rulebook rebuilt per rep).  prefix[k] - prefix[k-1] attributes cost to
layer k INCLUDING any inter-layer XLA overhead the per-layer probe
misses.

Run: python tools/probe_prefix.py [basic|large] [REP]
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
from spconv_tpu.benchmark.basic import (BenchNet, load_basic_data,
                                        load_large_data, make_bench_input)

which = sys.argv[1] if len(sys.argv) > 1 else "large"
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 10

if which == "large":
    voxels, coors, spatial_shape = load_large_data()
    bounds = json.loads((REPO / ".bench_pool_bounds_large.json").read_text())
else:
    voxels, coors, spatial_shape = load_basic_data()
    bounds = json.loads((REPO / ".bench_pool_bounds.json").read_text())

x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
net = BenchNet(spatial_shape, dtype=jnp.bfloat16, pool_bounds=bounds)

tiny = jax.jit(lambda s: s + 1.0)
float(tiny(0.0))
t0 = time.time()
for _ in range(5):
    float(tiny(0.0))
floor_ms = (time.time() - t0) / 5 * 1000
print(f"sync floor {floor_ms:.1f} ms", flush=True)

# layer sequence mirroring BenchNet.__call__
seq = []
for stage in range(6):
    seq.append((f"c{2*stage}", net.convs[2 * stage]))
    seq.append((f"c{2*stage+1}", net.convs[2 * stage + 1]))
    seq.append((f"pool{stage}", net.pools[stage]))
seq.append(("c12", net.convs[12]))
seq.append(("c13", net.convs[13]))


TRACED = "--traced" in sys.argv  # pass the net as a jit arg (bench.py
# style: weights live in HBM) instead of closing over it (weights become
# XLA constants)


def time_prefix(k):
    @jax.jit
    def rep_fn(m, feats, inds):
        def body(i, c):
            f = feats * (1.0 + 0.0 * c).astype(feats.dtype)
            ii = inds + jnp.isnan(c).astype(inds.dtype)
            t = spconv_tpu.SparseConvTensor(f, ii, spatial_shape, 1,
                                            keys_sorted=True)
            if TRACED:
                c_, p_ = m.convs, m.pools
                mseq = []
                for stage in range(6):
                    mseq += [c_[2 * stage], c_[2 * stage + 1], p_[stage]]
                mseq += [c_[12], c_[13]]
                for j in range(k):
                    t = mseq[j](t)
            else:
                for j in range(k):
                    t = seq[j][1](t)
            return jnp.sum(t.features.astype(jnp.float32))

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(rep_fn(net, x.features, x.indices))
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(rep_fn(net, x.features, x.indices))
        best = min(best, time.time() - t0)
    return (best * 1000 - floor_ms) / REP, comp


ks = ([int(v) for v in sys.argv[3].split(",")] if len(sys.argv) > 3
      else [1, 2, 3, 6, 9, 20])
prev = 0.0
prev_k = 0
for k in ks:
    ms, comp = time_prefix(k)
    print(f"prefix {k:2d} (thru {seq[k-1][0]:7s}) {ms:8.2f} ms  "
          f"delta(+{k-prev_k} layers) {ms - prev:+7.2f}  "
          f"(compile {comp:.0f}s)", flush=True)
    prev, prev_k = ms, k
