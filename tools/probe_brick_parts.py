"""Component-level probe of the brick path at stage-0 size (70528 bricks,
2x2x2, C=64): halo gather, concat tree, GEMM, build_bricks, pool,
reduce_window — each timed alone with in-jit repetition.  Run alone.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu.benchmark.basic import load_basic_data, make_bench_input
    from spconv_tpu.ops import brick as B

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)

    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000
    print(f"floor {floor:.1f} ms", flush=True)

    def timed(label, fn, *args):
        f = jax.jit(fn)
        t0 = time.time(); float(f(*args)); cs = time.time() - t0
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            float(f(*args))
            best = min(best, time.time() - t1)
        ms = best * 1000 / REP - floor / REP
        print(f"{label:40s}: {ms:7.2f} ms  [compile {cs:.0f}s]", flush=True)
        return ms

    def rep(body_fn, feats):
        def run(f):
            def body(_, c):
                ff = f * (1.0 + 0.0 * c).astype(f.dtype)
                return body_fn(ff)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
        return run

    C = 64
    xb = B.pack_tensor(x, brick_shape=(2, 2, 2), nb_bound=70528)
    meta = B.find_brick_meta(xb)
    nb = meta.nb
    print(f"nb={nb} slots={meta.num_slots}", flush=True)
    rng = np.random.RandomState(0)
    featsC = jnp.asarray(rng.randn(meta.num_slots, C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(C, 3, 3, 3, C) * 0.05, jnp.bfloat16)
    active = xb.indices[:, 0] >= 0

    # 1. raw row gather: 26 x [nb, bvol*C] rows
    ids = jnp.maximum(meta.nbr, 0)  # [27, nb]

    def g_raw(ff):
        x2 = ff.reshape(nb, 8 * C)
        acc = jnp.float32(0)
        for d in range(27):
            if d == 13:
                continue
            g = jnp.take(x2, ids[d], axis=0)
            acc = acc + jnp.sum(g.astype(jnp.float32))
        return acc

    timed("26x row-gather [nb, 8C]", rep(g_raw, featsC), featsC)

    # 1b. one batched gather of all 26 directions
    def g_batched(ff):
        x2 = ff.reshape(nb, 8 * C)
        ka = np.array([d for d in range(27) if d != 13])
        g = jnp.take(x2, ids[ka].reshape(-1), axis=0)
        return jnp.sum(g.astype(jnp.float32))

    timed("batched 26-dir row-gather", rep(g_batched, featsC), featsC)

    # 2. halo assembly (gather + slice + concat tree)
    def h_full(ff):
        h = B._halo(ff.reshape(nb, 2, 2, 2, C), meta, (1, 1, 1))
        return jnp.sum(h.astype(jnp.float32))

    timed("halo full", rep(h_full, featsC), featsC)

    # 3. GEMM alone [nb, 64C] @ [64C, 8K]
    w_exp = B._expand_weight(w, (2, 2, 2), (1, 1, 1))
    hvol = 64
    hbuf = jnp.asarray(rng.randn(nb, hvol * C), jnp.bfloat16)

    def gemm(hh):
        o = jnp.dot(hh, w_exp.astype(hh.dtype),
                    preferred_element_type=jnp.float32)
        return jnp.sum(o)

    timed("hull GEMM [nb,64C]@[64C,8K]", rep(gemm, hbuf), hbuf)

    # 4. full subm conv
    def conv(ff):
        o = B.brick_subm_conv(ff, active, meta, w, (1, 1, 1))
        return jnp.sum(o.astype(jnp.float32))

    timed("brick_subm_conv full", rep(conv, featsC), featsC)

    # 5. build_bricks alone (the pack sort+join)
    def bb(ff):
        m2, vos = B.build_bricks(
            x.indices, spatial_shape=tuple(int(s) for s in x.spatial_shape),
            batch_size=1, brick_shape=(2, 2, 2), nb_bound=70528)
        return jnp.sum(vos.astype(jnp.float32)) + jnp.sum(ff[:1])

    timed("build_bricks (sort+27-join)", rep(bb, featsC), featsC)

    # 6. reduce_window pool math alone
    def rw(ff):
        f = ff.reshape(nb, 2, 2, 2, C)
        p = jax.lax.reduce_window(
            f.astype(jnp.float32), -jnp.inf, jax.lax.max,
            (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID")
        return jnp.sum(p)

    timed("reduce_window 2x2x2", rep(rw, featsC), featsC)

    # 7. full brick_pool (incl repack at half grid)
    def bp(ff):
        t = spconv_tpu.SparseConvTensor(
            ff, xb.indices, x.spatial_shape, 1)
        t.indice_dict[B.brick_key((2, 2, 2), x.spatial_shape)] = meta
        o = B.brick_pool(t, meta, mode="max", nb_bound=29312)
        return jnp.sum(o.features.astype(jnp.float32))

    timed("brick_pool full (incl repack)", rep(bp, featsC), featsC)


if __name__ == "__main__":
    main()
