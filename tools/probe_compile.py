#!/usr/bin/env python
"""Measure Mosaic/XLA compile cost of the DG kernels per (C, K, N) —
the multiplier behind round-3's 200-310 s per-section compile bills.

Questions answered:
  1. per-kernel compile seconds at C=K in {16, 64, 128, 256}
  2. does a second executable reusing the SAME kernel shape recompile?
  3. does grid size (N) alone force a Mosaic recompile?

Run on the TPU: python tools/probe_compile.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from spconv_tpu.ops import coords as C  # noqa: E402
from spconv_tpu.ops.pallas import sorted_conv as SK  # noqa: E402
from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv  # noqa: E402


def make_case(n, cch, seed=0):
    rng = np.random.RandomState(seed)
    shape = (80, 1024, 1024)
    # random active sites, sorted
    keys_np = np.unique(
        rng.randint(0, np.prod(shape), size=n).astype(np.int64))[:n]
    nn = len(keys_np)
    keys = jnp.asarray(keys_np, jnp.int64)
    feats = jnp.asarray(rng.randn(nn, cch), jnp.bfloat16)
    w = jnp.asarray(rng.randn(cch, 3, 3, 3, cch) * 0.05, jnp.bfloat16)
    return keys, feats, w, shape, nn


def time_compile(keys, feats, w, shape, window=384):
    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3), include_center=True)
    n = keys.shape[0]
    np_t, n_pad = SK._n_pad_for(n, 128, window)
    sent = int(np.prod(shape))
    plans = SK.build_sk_plans(SK._pad_rows(keys, np_t, sent), sent,
                              deltas_np, groups, tile=128, window=window,
                              n_pad=n_pad, align=128)

    REP = 20

    def f(ff):
        def body(_, c):
            f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
            o = dg_subm_conv(f2, keys, w, spatial_shape=shape,
                             batch_size=1, dilation=(1, 1, 1),
                             window=window, plans=plans)
            return c + jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    jf = jax.jit(f)
    t0 = time.time()
    float(jf(feats))
    dt = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        float(jf(feats))
        best = min(best, time.time() - t0)
    return dt, best / REP


def main():
    print("backend:", jax.default_backend(), flush=True)
    for cch in (16, 64, 128, 256):
        keys, feats, w, shape, nn = make_case(100_000, cch)
        t, r = time_compile(keys, feats, w, shape)
        print(f"C=K={cch} N={nn}: compile+first {t:.1f}s  run {r*1000:.1f}ms",
              flush=True)
        # same shapes, fresh jit (new executable, same kernel)
        t2, _ = time_compile(keys, feats, w, shape)
        print(f"  re-jit same shapes: {t2:.1f}s", flush=True)
        # different N (different grid + table sizes)
        keys2, feats2, w2, shape, nn2 = make_case(60_000, cch, seed=1)
        t3, _ = time_compile(keys2, feats2, w2, shape)
        print(f"  different N={nn2}: {t3:.1f}s", flush=True)


if __name__ == "__main__":
    main()
