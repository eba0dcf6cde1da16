"""A/B probe: halo-assembly variants for the brick conv, stage-0 sizes.
Run alone (one tunnel client).  All variants compute the same conv result;
timing includes the GEMM so fusion differences are visible.
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
    from spconv_tpu.ops import coords as CC

    voxels, coors, spatial_shape = pickle.load(
        open('/root/reference/test/data/test_spconv.pkl', 'rb'))
    n = coors.shape[0]
    NBUF = 126976
    C = 64
    rng = np.random.RandomState(0)
    feats = np.zeros((NBUF, C), np.float32)
    feats[:n] = rng.randn(n, C) * 0.1
    inds = np.full((NBUF, 4), -1, np.int32)
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
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000

    def timed(fn, *args):
        f = jax.jit(fn)
        t0 = time.time(); float(f(*args)); cs = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            float(f(*args))
        return (time.time() - t0) / 3 * 1000 / REP - floor / REP, cs

    results = {}

    for bshape in [(1, 2, 2), (2, 2, 2)]:
        xb = B.pack_tensor(x, brick_shape=bshape)
        meta = B.find_brick_meta(xb)
        nb = int(meta.num_bricks)
        bound = -(-int(nb * 1.05) // 128) * 128
        xb = B.pack_tensor(x, brick_shape=bshape, nb_bound=bound)
        meta = B.find_brick_meta(xb)
        NB = meta.nb
        bvol = meta.bvol
        bz, by, bx = bshape
        w = jnp.asarray(rng.randn(C, 3, 3, 3, C).astype(np.float32) * 0.05,
                        dtype)
        w_exp = B._expand_weight(w, bshape, (1, 1, 1), (1, 1, 1))
        disp = CC.kernel_offsets((3, 3, 3)) - 1
        hull = [b + 2 for b in bshape]
        hvol = int(np.prod(hull))
        print(f"== brick {bshape}: NB={NB} slots={NB*bvol} hull={hvol}",
              flush=True)

        # floor: one take of 26*NB full-brick rows (no assembly, no conv)
        ids_all = jnp.concatenate(
            [jnp.maximum(meta.nbr[i], 0) for i in range(27) if i != 13])

        def v_take(f2):
            def body(_, c):
                ff = f2 * (1.0 + 0.0 * c).astype(f2.dtype)
                x2 = ff.reshape(NB, bvol * C)
                g = jnp.take(x2, ids_all, axis=0)
                return jnp.sum(g[:, :1].astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        ms, cs = timed(v_take, xb.features)
        print(f"  floor one-take 26NB rows: {ms:.2f} ms", flush=True)

        # current: per-direction takes + slice + mask + concat, then GEMM
        def conv_cur(ff):
            x3 = ff.reshape(NB, bz, by, bx, C)
            h = B._halo(x3, meta, (1, 1, 1))
            return jnp.dot(h.reshape(NB, hvol * C), w_exp,
                           preferred_element_type=jnp.float32)

        # zero-row clamp: append a zero brick; no mask multiplies
        def conv_zclamp(ff):
            x2 = ff.reshape(NB, bvol * C)
            xz = jnp.concatenate(
                [x2, jnp.zeros((1, bvol * C), x2.dtype)], axis=0)
            pieces = []
            for i, d in enumerate(disp):
                ids = jnp.where(meta.nbr[i] >= 0, meta.nbr[i], NB)
                if i == 13:
                    src = x2.reshape(NB, bz, by, bx, C)
                else:
                    src = jnp.take(xz, ids, axis=0).reshape(NB, bz, by, bx, C)
                for a, bdim in enumerate(bshape):
                    if d[a] == -1:
                        src = jax.lax.slice_in_dim(src, bdim - 1, bdim,
                                                   axis=1 + a)
                    elif d[a] == 1:
                        src = jax.lax.slice_in_dim(src, 0, 1, axis=1 + a)
                pieces.append(src)
            for a in reversed(range(3)):
                pieces = [jnp.concatenate(pieces[i:i + 3], axis=1 + a)
                          for i in range(0, len(pieces), 3)]
            h = pieces[0]
            return jnp.dot(h.reshape(NB, hvol * C), w_exp,
                           preferred_element_type=jnp.float32)

        # one fused take for all 26 dirs + assembly slices
        def conv_onetake(ff):
            x2 = ff.reshape(NB, bvol * C)
            xz = jnp.concatenate(
                [x2, jnp.zeros((1, bvol * C), x2.dtype)], axis=0)
            ids = jnp.stack(
                [jnp.where(meta.nbr[i] >= 0, meta.nbr[i], NB)
                 for i in range(27) if i != 13])  # [26, NB]
            g = jnp.take(xz, ids.reshape(-1), axis=0).reshape(
                26, NB, bz, by, bx, C)
            pieces = []
            j = 0
            for i, d in enumerate(disp):
                if i == 13:
                    src = x2.reshape(NB, bz, by, bx, C)
                else:
                    src = g[j]; j += 1
                for a, bdim in enumerate(bshape):
                    if d[a] == -1:
                        src = jax.lax.slice_in_dim(src, bdim - 1, bdim,
                                                   axis=1 + a)
                    elif d[a] == 1:
                        src = jax.lax.slice_in_dim(src, 0, 1, axis=1 + a)
                pieces.append(src)
            for a in reversed(range(3)):
                pieces = [jnp.concatenate(pieces[i:i + 3], axis=1 + a)
                          for i in range(0, len(pieces), 3)]
            h = pieces[0]
            return jnp.dot(h.reshape(NB, hvol * C), w_exp,
                           preferred_element_type=jnp.float32)

        # piecewise GEMM: no hull materialization; per-piece dot, summed
        # W_exp rows grouped by hull sites belonging to each piece
        site_of = {}
        hull_sites = CC.kernel_offsets(tuple(hull))  # [hvol, 3]
        for hidx, hs in enumerate(hull_sites):
            src = []
            for a in range(3):
                q = int(hs[a]) - 1  # hull coord − pad
                if q < 0:
                    src.append(-1)
                elif q >= bshape[a]:
                    src.append(1)
                else:
                    src.append(0)
            site_of.setdefault(tuple(src), []).append(hidx)

        def conv_piecewise(ff):
            x2 = ff.reshape(NB, bvol * C)
            xz = jnp.concatenate(
                [x2, jnp.zeros((1, bvol * C), x2.dtype)], axis=0)
            acc = None
            for i, d in enumerate(disp):
                dkey = tuple(d)
                hsites = np.asarray(site_of[dkey])
                rows = (hsites[:, None] * C + np.arange(C)[None, :]).reshape(-1)
                wsub = w_exp[jnp.asarray(rows)]
                if i == 13:
                    src = x2.reshape(NB, bz, by, bx, C)
                else:
                    ids = jnp.where(meta.nbr[i] >= 0, meta.nbr[i], NB)
                    src = jnp.take(xz, ids, axis=0).reshape(NB, bz, by, bx, C)
                for a, bdim in enumerate(bshape):
                    if d[a] == -1:
                        src = jax.lax.slice_in_dim(src, bdim - 1, bdim,
                                                   axis=1 + a)
                    elif d[a] == 1:
                        src = jax.lax.slice_in_dim(src, 0, 1, axis=1 + a)
                p = jnp.dot(src.reshape(NB, -1), wsub,
                            preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            return acc

        for name, conv in [("hull-concat (current)", conv_cur),
                           ("hull zero-clamp", conv_zclamp),
                           ("hull one-take", conv_onetake),
                           ("piecewise GEMM", conv_piecewise)]:
            def rep(f2, conv=conv):
                def body(_, c):
                    ff = f2 * (1.0 + 0.0 * c).astype(f2.dtype)
                    return jnp.sum(conv(ff)[:, :1])
                return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

            ms, cs = timed(rep, xb.features)
            print(f"  {name}: {ms:.2f} ms (compile {cs:.0f}s)", flush=True)

        # parity check of the variants (values should agree)
        r0 = np.asarray(jax.jit(conv_cur)(xb.features))
        for name, conv in [("zclamp", conv_zclamp), ("onetake", conv_onetake),
                           ("piecewise", conv_piecewise)]:
            r = np.asarray(jax.jit(conv)(xb.features))
            print(f"  parity {name}: {np.abs(r - r0).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
