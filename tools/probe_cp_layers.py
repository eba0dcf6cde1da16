#!/usr/bin/env python
"""Per-layer CenterPoint encoder timing on the real TPU chip.

Fills the DESIGN_NOTES CenterPoint table with measured ms (VERDICT r3
next #3).  The capture pass runs inside ONE jit that returns every
conv/pool layer's input tensor (features, indices, indice_dict cache
records — so stage layers 2+ ride the cached-match posmode exactly as
in the full net); an eager capture through the device tunnel costs
~40 ms per op dispatch and never finishes.  Each layer is then timed
alone with in-jit chained repetition.

Run: python tools/probe_cp_layers.py [REP]
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
from spconv_tpu.benchmark.centerpoint import (build_calibrated_encoder,
                                              load_centerpoint_input)

REP = int(sys.argv[1]) if len(sys.argv) > 1 else 10

calib = json.loads((REPO / ".bench_calib.json").read_text())
x, nv = load_centerpoint_input(batch=1)
print(f"{nv} voxels, grid {x.spatial_shape}", flush=True)
net = build_calibrated_encoder(x, bounds=calib["cp_bounds_b1"])

# ---------------------------------------------------------------------------
# capture: ONE jitted forward that returns every leaf layer's input
# ---------------------------------------------------------------------------
names = []      # static: layer display names
layers = []     # static: the layer modules
meta = []       # static: (spatial_shape, batch_size, keys_sorted)


def run_captured(net, t, dynamic):
    """Manual unrolled forward mirroring SparseEncoder.__call__; appends
    each layer's dynamic input (features, indices, indice_dict) to
    ``dynamic`` and its static context to the module-level lists."""

    def step(name, layer, t, **kw):
        names.append(name)
        layers.append(layer)
        meta.append((t.spatial_shape, t.batch_size, t.keys_sorted))
        dynamic.append((t.features, t.indices, dict(t.indice_dict)))
        return layer(t, **kw)

    t = step("conv_input C5->16", net.conv_input, t)
    t = t.replace_feature(jax.nn.relu(t.features))
    for si, blocks in enumerate(net.stages):
        if si > 0:
            d = net.downs[si - 1]
            t = step(f"down{si} C{d.in_channels}->{d.out_channels} s2", d, t)
        for bi, b in enumerate(blocks):
            ident = t.features
            o = step(f"s{si}b{bi}.conv1 C{b.conv1.in_channels}", b.conv1, t)
            o = o.replace_feature(jax.nn.relu(o.features))
            o = step(f"s{si}b{bi}.conv2 C{b.conv2.in_channels}", b.conv2, o)
            t = o.replace_feature(
                jnp.where(o.valid_mask[:, None],
                          jax.nn.relu(o.features + ident), 0))
    t = step("conv_out C128 (3,1,1)", net.conv_out, t)
    t = t.replace_feature(jax.nn.relu(t.features))
    return t


# net is closed over (NOT a jit argument): the captured layer modules
# must be concrete, not tracers, for the later per-layer timing jits
@jax.jit
def capture(feats, inds):
    dynamic = []
    t = spconv_tpu.SparseConvTensor(feats, inds, x.spatial_shape,
                                    x.batch_size, keys_sorted=True)
    out = run_captured(net, t, dynamic)
    return dynamic, out.features


t0 = time.time()
dynamic, _outf = capture(x.features, x.indices)
jax.block_until_ready(dynamic)
print(f"capture pass (jitted): {time.time() - t0:.1f}s, "
      f"{len(names)} layers", flush=True)

# ---------------------------------------------------------------------------
# timing: per layer, REP chained reps inside one jit
# ---------------------------------------------------------------------------
tiny = jax.jit(lambda s: s + 1.0)
float(tiny(0.0))
t0 = time.time()
for _ in range(5):
    float(tiny(0.0))
floor_ms = (time.time() - t0) / 5 * 1000
print(f"sync floor {floor_ms:.1f} ms", flush=True)

rows_out = []
total = 0.0
for name, layer, (shape, bs, ks), (feats, inds, idict) in zip(
        names, layers, meta, dynamic):

    @jax.jit
    def rep_fn(m, f0, i0, idict_, shape=shape, bs=bs, ks=ks):
        def body(i, c):
            f = f0 * (1.0 + 0.0 * c).astype(f0.dtype)
            ii = i0 + jnp.isnan(c).astype(i0.dtype)
            t = spconv_tpu.SparseConvTensor(f, ii, shape, bs,
                                            indice_dict=dict(idict_),
                                            keys_sorted=ks)
            o = m(t)
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
    n_in = int(feats.shape[0])
    rows_out.append((name, n_in, ms))
    print(f"{name:28s} nbuf={n_in:7d} {ms:7.2f} ms  "
          f"(compile {compile_s:.0f}s)", flush=True)

print(f"\nsum of layers: {total:.1f} ms  (full-net bench adds "
      f"relu/residual/dense glue)", flush=True)
rows_out.sort(key=lambda r: -r[2])
print("top offenders:", flush=True)
for name, n_in, ms in rows_out[:6]:
    print(f"  {name:28s} {ms:6.2f} ms", flush=True)
