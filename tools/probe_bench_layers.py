#!/usr/bin/env python
"""Per-layer timing of the bench_basic / bench_large nets on the TPU.

Same jitted-capture pattern as probe_cp_layers.py: one jit returns every
layer's input tensors (with indice_dict cache records, so the second
conv of each indice_key pair rides the cached rulebook exactly as in
the full net), then each layer is timed alone — forward, and optionally
the full differentiated step (value_and_grad wrt features and weight)
to localize the backward cost.

Run: python tools/probe_bench_layers.py [basic|large] [fwd|train] [REP]
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

which = sys.argv[1] if len(sys.argv) > 1 else "basic"
mode = sys.argv[2] if len(sys.argv) > 2 else "fwd"
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 10
training = mode == "train"

if which == "large":
    voxels, coors, spatial_shape = load_large_data()
    bounds = json.loads((REPO / ".bench_pool_bounds_large.json").read_text())
else:
    voxels, coors, spatial_shape = load_basic_data()
    bounds = json.loads((REPO / ".bench_pool_bounds.json").read_text())

x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
net = BenchNet(spatial_shape, dtype=jnp.bfloat16, pool_bounds=bounds)
print(f"[{which}] nbuf={x.features.shape[0]} grid={spatial_shape} "
      f"mode={mode}", flush=True)

names, layers, meta = [], [], []


def run_captured(t, dynamic):
    def step(name, layer, t, **kw):
        names.append(name)
        layers.append(layer)
        meta.append((t.spatial_shape, t.batch_size, t.keys_sorted))
        dynamic.append((t.features, t.indices, dict(t.indice_dict)))
        return layer(t, **kw)

    c, p = net.convs, net.pools
    chans = [3, 64, 64, 96, 96, 128, 128, 160, 160, 192, 192, 224, 224,
             256, 256]
    for stage in range(6):
        i = 2 * stage
        t = step(f"c{i} C{chans[i]}->{chans[i+1]}", c[i], t,
                 training=training)
        t = step(f"c{i+1} C{chans[i+1]}->{chans[i+2]}", c[i + 1], t,
                 training=training)
        t = step(f"pool{stage}", p[stage], t)
    t = step(f"c12 C{chans[12]}->{chans[13]}", c[12], t, training=training)
    t = step(f"c13 C{chans[13]}->{chans[14]}", c[13], t, training=training)
    return t


@jax.jit
def capture(feats, inds):
    dynamic = []
    t = spconv_tpu.SparseConvTensor(feats, inds, spatial_shape, 1,
                                    keys_sorted=True)
    out = run_captured(t, dynamic)
    return dynamic, out.features


t0 = time.time()
dynamic, _outf = capture(x.features, x.indices)
jax.block_until_ready(dynamic)
print(f"capture pass (jitted): {time.time() - t0:.1f}s, "
      f"{len(names)} layers", flush=True)

tiny = jax.jit(lambda s: s + 1.0)
float(tiny(0.0))
t0 = time.time()
for _ in range(5):
    float(tiny(0.0))
floor_ms = (time.time() - t0) / 5 * 1000
print(f"sync floor {floor_ms:.1f} ms", flush=True)

only = sys.argv[4].split(",") if len(sys.argv) > 4 else None

rows_out = []
total = 0.0
for name, layer, (shape, bs, ks), (feats, inds, idict) in zip(
        names, layers, meta, dynamic):
    if only and not any(name.startswith(o) for o in only):
        continue
    is_conv = hasattr(layer, "weight")

    if training and is_conv:
        @jax.jit
        def rep_fn(m, f0, i0, idict_, shape=shape, bs=bs, ks=ks):
            def body(i, c):
                f = f0 * (1.0 + 0.0 * c).astype(f0.dtype)
                ii = i0 + jnp.isnan(c).astype(i0.dtype)

                def loss(fw, m=m):
                    f_, w_ = fw
                    import copy
                    m2 = copy.copy(m)
                    m2.weight = w_
                    t = spconv_tpu.SparseConvTensor(
                        f_, ii, shape, bs, indice_dict=dict(idict_),
                        keys_sorted=ks)
                    o = m2(t, training=True)
                    return jnp.sum(o.features.astype(jnp.float32) ** 2)

                l, g = jax.value_and_grad(loss)((f, m.weight))
                return l + sum(jnp.sum(gi.astype(jnp.float32)) for gi in g)

            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
    else:
        @jax.jit
        def rep_fn(m, f0, i0, idict_, shape=shape, bs=bs, ks=ks):
            def body(i, c):
                f = f0 * (1.0 + 0.0 * c).astype(f0.dtype)
                ii = i0 + jnp.isnan(c).astype(i0.dtype)
                t = spconv_tpu.SparseConvTensor(f, ii, shape, bs,
                                                indice_dict=dict(idict_),
                                                keys_sorted=ks)
                kw = {"training": True} if (training and is_conv) else {}
                o = m(t, **kw) if is_conv else m(t)
                return jnp.sum(o.features.astype(jnp.float32))

            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(rep_fn(layer, feats, inds, idict))
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(rep_fn(layer, feats, inds, idict))
        best = min(best, time.time() - t0)
    ms = (best * 1000 - floor_ms) / REP
    total += ms
    rows_out.append((name, int(feats.shape[0]), ms))
    print(f"{name:22s} nbuf={feats.shape[0]:7d} {ms:7.2f} ms  "
          f"(compile {compile_s:.0f}s)", flush=True)

print(f"\nsum of layers: {total:.1f} ms", flush=True)
rows_out.sort(key=lambda r: -r[2])
print("top offenders:", flush=True)
for name, n_in, ms in rows_out[:8]:
    print(f"  {name:22s} nbuf={n_in:7d} {ms:6.2f} ms", flush=True)
