"""TPU microbench: block (brick) subm conv vs native gather path, stage-0
sizes (real 125k-voxel scan, C=K=64, k=3).  Run alone (one tunnel client).

Usage: python tools/bench_brick.py [--bricks 2x2x2,1x2x2,2x4x4] [--c 64]
"""

import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu.ops import brick as B

    voxels, coors, spatial_shape = pickle.load(
        open('/root/reference/test/data/test_spconv.pkl', 'rb'))
    n = coors.shape[0]
    NBUF = 126976  # 124*1024
    C = 64
    for a in sys.argv:
        if a.startswith("--c="):
            C = int(a.split("=")[1])
    rng = np.random.RandomState(0)
    feats = np.zeros((NBUF, C), np.float32)
    feats[:n] = rng.randn(n, C) * 0.1
    inds = np.full((NBUF, 4), -1, np.int32)
    # key-sort for locality parity with bench.py
    shape = [int(s) for s in spatial_shape]
    key = coors[:, 0].astype(np.int64)
    for i, s in enumerate(shape):
        key = key * s + coors[:, i + 1]
    order = np.argsort(key, kind="stable")
    inds[:n] = coors[order]
    feats[:n] = feats[:n][order]

    dtype = jnp.bfloat16
    x = spconv_tpu.SparseConvTensor(
        jnp.asarray(feats, dtype), jnp.asarray(inds), spatial_shape, 1)

    REP = 8

    def timed(fn, *args):
        f = jax.jit(fn)
        t0 = time.time(); float(f(*args)); compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            float(f(*args))
        return (time.time() - t0) / 3 * 1000 / REP, compile_s

    # sync floor
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000
    print(f"sync floor {floor:.1f} ms", flush=True)

    conv_n = spconv_tpu.SubMConv3d(C, C, 3, bias=False, dtype=dtype,
                                   key=jax.random.PRNGKey(0))

    def rep_native(m, f, i):
        def body(_, c):
            ff = f * (1.0 + 0.0 * c).astype(f.dtype)
            t = spconv_tpu.SparseConvTensor(ff, i, spatial_shape, 1)
            return jnp.sum(m(t).features.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    ms, cs = timed(rep_native, conv_n, x.features, x.indices)
    print(f"native conv+rulebook: {ms - floor/REP:.2f} ms (compile {cs:.0f}s)",
          flush=True)

    bricks = [(2, 2, 2), (1, 2, 2), (2, 4, 4), (4, 4, 4)]
    for bs in [a for a in sys.argv if a.startswith("--bricks=")]:
        bricks = [tuple(int(v) for v in b.split("x"))
                  for b in bs.split("=")[1].split(",")]

    for bshape in bricks:
        # measure brick count → tight bound
        xb = B.pack_tensor(x, brick_shape=bshape)
        meta = B.find_brick_meta(xb)
        nb = int(meta.num_bricks)
        bound = -(-int(nb * 1.05) // 128) * 128
        xb = B.pack_tensor(x, brick_shape=bshape, nb_bound=bound)
        meta = B.find_brick_meta(xb)
        slots = meta.num_slots
        print(f"brick {bshape}: nb={nb} bound={bound} slots={slots} "
              f"ovh={slots/n:.2f}x", flush=True)

        conv_b = spconv_tpu.SubMConv3d(
            C, C, 3, bias=False, algo="block", brick_shape=bshape,
            brick_bound=bound, dtype=dtype, key=jax.random.PRNGKey(0))

        # halo assembly alone
        def rep_halo(f, meta=meta, bshape=bshape):
            x3 = lambda ff: ff.reshape(meta.nb, *bshape, C)
            def body(_, c):
                ff = f * (1.0 + 0.0 * c).astype(f.dtype)
                h = B._halo(x3(ff), meta, (1, 1, 1))
                return jnp.sum(h.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        ms, cs = timed(rep_halo, xb.features)
        print(f"  halo alone: {ms - floor/REP:.2f} ms (compile {cs:.0f}s)",
              flush=True)

        # conv only per strategy (packed input reused — steady-state cost)
        for strat in ("gemm",):
            def rep_conv(m, f, i, meta=meta, strat=strat):
                active = i[:, 0] >= 0
                def body(_, c):
                    ff = f * (1.0 + 0.0 * c).astype(f.dtype)
                    o = B.brick_subm_conv(ff, active, meta, m.weight,
                                          (1, 1, 1), strategy=strat)
                    return jnp.sum(o.astype(jnp.float32))
                return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

            ms, cs = timed(rep_conv, conv_b, xb.features, xb.indices)
            print(f"  block conv [{strat}]: {ms - floor/REP:.2f} ms "
                  f"(compile {cs:.0f}s)", flush=True)

        # pack + conv (first layer of a stage)
        def rep_pack(m, f, i):
            def body(_, c):
                ff = f * (1.0 + 0.0 * c).astype(f.dtype)
                t = spconv_tpu.SparseConvTensor(ff, i, spatial_shape, 1)
                return jnp.sum(m(t).features.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        ms, cs = timed(rep_pack, conv_b, x.features, x.indices)
        print(f"  pack+conv: {ms - floor/REP:.2f} ms (compile {cs:.0f}s)",
              flush=True)

    # correctness spot-check on device: block vs native, same weights
    conv_b = spconv_tpu.SubMConv3d(
        C, C, 3, bias=False, algo="block", brick_shape=(2, 2, 2),
        dtype=dtype, key=jax.random.PRNGKey(0))
    conv_b.weight = conv_n.weight
    yn = conv_n(x)
    yb = conv_b(x)
    sn = float(jnp.sum(yn.features.astype(jnp.float32)))
    sb = float(jnp.sum(yb.features.astype(jnp.float32)))
    an = float(jnp.sum(jnp.abs(yn.features.astype(jnp.float32))))
    print(f"device parity: sum native={sn:.3f} block={sb:.3f} "
          f"rel={(sn-sb)/max(abs(an),1e-9):.2e}", flush=True)


if __name__ == "__main__":
    main()
