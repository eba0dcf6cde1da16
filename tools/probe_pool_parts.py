#!/usr/bin/env python
"""Micro-profile the pool2 rulebook's constituent ops at bench sizes:
XLA sort, sort-with-payload, cummax/cumsum, 2-D scatter, gather-max.

Run: python tools/probe_pool_parts.py [N ...]
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

REP = 10

tiny = jax.jit(lambda s: s + 1.0)
float(tiny(0.0))
t0 = time.time()
for _ in range(5):
    float(tiny(0.0))
floor_ms = (time.time() - t0) / 5 * 1000
print(f"sync floor {floor_ms:.1f} ms", flush=True)


def timed(name, fn, *args):
    @jax.jit
    def rep_fn(*a):
        def body(i, c):
            out = fn(*[x * (1 + 0 * c).astype(x.dtype) if x.dtype.kind == "f"
                       else x + (c > 1e30).astype(x.dtype) for x in a])
            return c + jnp.sum(
                jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)
                .ravel()[:1])[()]

        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time()
    float(rep_fn(*args))
    comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(rep_fn(*args))
        best = min(best, time.time() - t0)
    ms = (best * 1000 - floor_ms) / REP
    print(f"  {name:34s} {ms:8.3f} ms (compile {comp:.0f}s)", flush=True)
    return ms


sizes = [int(s) for s in sys.argv[1:]] or [131072, 917504]

for n in sizes:
    print(f"\nN = {n}", flush=True)
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 200_000_000, n), jnp.int32)
    skeys = jnp.sort(keys)
    feats = jnp.asarray(rng.randn(n, 64), jnp.bfloat16)
    iota = jnp.arange(n, dtype=jnp.int32)
    nout = n // 2
    pair = jnp.asarray(rng.randint(0, n, (8, nout)), jnp.int32)

    timed("jnp.sort int32", lambda k: jnp.sort(k), keys)
    timed("lax.sort (key,iota)", lambda k: jax.lax.sort(
        (k, iota), num_keys=1, is_stable=True), keys)
    timed("sort pre-sorted keys", lambda k: jnp.sort(k), skeys)
    timed("cumsum int32", lambda k: jnp.cumsum(k), keys)
    timed("cummax int32", lambda k: jax.lax.cummax(k), keys)
    timed("1d scatter set", lambda k: jnp.zeros(
        (n,), jnp.int32).at[k % n].set(k, mode="drop"), keys)
    timed("2d scatter set [8,n/2]", lambda k: jnp.full(
        (8, nout), -1, jnp.int32).at[
            k[:nout] % 8, (k[:nout] // 8) % nout].set(
            k[:nout], mode="drop"), keys)
    timed("gather rows 8x [n/2,64]",
          lambda p, f: sum(jnp.max(jnp.where((p[i] >= 0)[:, None],
                                             f[p[i]], -1e9), axis=0,
                                   keepdims=True)
                           for i in range(1)), pair, feats)
    timed("maxpool gather-max kv=8",
          lambda p, f: jnp.max(
              jnp.where((p[:, :, None] >= 0), f[p.clip(0)],
                        jnp.bfloat16(-1e9)), axis=0), pair, feats)

    from spconv_tpu.ops.rulebook import build_pool2_rulebook
    inds = np.full((n, 4), -1, np.int32)
    nv = int(n * 0.98)
    # plausible coords on the large grid
    zz = rng.randint(0, 80, nv)
    yy = rng.randint(0, 1600, nv)
    xx = rng.randint(0, 1600, nv)
    key = (zz * 1600 + yy) * 1600 + xx
    key = np.unique(key)[:nv]
    nv = len(key)
    inds[:nv, 0] = 0
    inds[:nv, 1] = key // (1600 * 1600)
    inds[:nv, 2] = (key // 1600) % 1600
    inds[:nv, 3] = key % 1600
    jinds = jnp.asarray(inds)

    timed("build_pool2_rulebook", lambda ii: build_pool2_rulebook(
        ii, spatial_shape=(80, 1600, 1600), batch_size=1,
        out_bound=n // 2).pair_fwd, jinds)

    from spconv_tpu.ops.rulebook import build_pool2_outputs
    timed("build_pool2_outputs", lambda ii: build_pool2_outputs(
        ii, spatial_shape=(80, 1600, 1600), batch_size=1,
        out_bound=n // 2)[1], jinds)
