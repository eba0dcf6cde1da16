"""Time the DG (dynamic-gather) subm conv on the real 125k-voxel scan,
vs the SK one-hot kernel, at C=K=64 (bench stage-0) and C=K=16
(CenterPoint stage-1 width).  In-jit chained-repetition timing (external
loops mis-measure through the tunnel; see DESIGN_NOTES)."""

import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from spconv_tpu.ops import coords as CO
from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv
from spconv_tpu.ops.pallas.sorted_conv import sk_subm_conv

REP = 20
WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"


def load_scan():
    voxels, coors, spatial_shape = pickle.load(
        open('/root/reference/test/data/test_spconv.pkl', 'rb'))
    ss = tuple(int(s) for s in spatial_shape)
    keys = (((coors[:, 0].astype(np.int64)) * ss[0] + coors[:, 1]) * ss[1]
            + coors[:, 2]) * ss[2] + coors[:, 3]
    order = np.argsort(keys)
    coors = coors[order]
    n = coors.shape[0]
    nbuf = 131072
    inds = np.full((nbuf, 4), -1, np.int32)
    inds[:n] = coors
    return inds, ss, n


def run_case(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    f(*args).block_until_ready()
    t1 = time.perf_counter()
    r = f(*args).block_until_ready()
    t2 = time.perf_counter()
    per = (t2 - t1) / REP * 1e3
    print(f"{name}: {per:.3f} ms/iter  (compile+first {t1-t0:.1f}s)")
    return r


def main():
    inds, ss, n = load_scan()
    print(f"scan: {n} voxels, grid {ss}")
    inds_j = jnp.asarray(inds)
    keys_j, _ = CO.linearize(inds_j, ss, 1)
    rs = np.random.RandomState(0)

    for c in ([16, 64, 128] if WHICH == "all" else [int(WHICH)]):
        fnp = rs.randn(inds.shape[0], c).astype(np.float32)
        fnp[n:] = 0  # invalid rows: kernels only guarantee zeros here
        feats = jnp.asarray(fnp, dtype=jnp.bfloat16)
        w = jnp.asarray(rs.randn(c, 3, 3, 3, c).astype(np.float32) * .1,
                        dtype=jnp.bfloat16)

        def chain_dg(f0, w_):
            def body(i, acc):
                f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                o = dg_subm_conv(f, keys_j, w_, spatial_shape=ss,
                                 batch_size=1, dilation=(1, 1, 1))
                return jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        # steady-state module path: plans cached per indice_key
        from spconv_tpu.ops.pallas.sorted_conv import (
            _n_pad_for, _pad_rows, build_sk_plans, sk_groups,
            subm_key_deltas)
        deltas_np, _disp = subm_key_deltas((3, 3, 3), (1, 1, 1), ss)
        groups = sk_groups((3, 3, 3), include_center=True)
        sent = int(np.prod(ss))
        np_t, n_pad = _n_pad_for(inds.shape[0], 128, 384)
        plans_c = jax.jit(lambda kk: build_sk_plans(
            _pad_rows(kk, np_t, sent), sent, deltas_np, groups,
            tile=128, window=384, n_pad=n_pad, align=128))(keys_j)

        def chain_dg_cached(f0, w_):
            def body(i, acc):
                f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                o = dg_subm_conv(f, keys_j, w_, spatial_shape=ss,
                                 batch_size=1, dilation=(1, 1, 1),
                                 plans=plans_c)
                return jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        def chain_sk(f0, w_):
            def body(i, acc):
                f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                o = sk_subm_conv(f, inds_j, keys_j, w_, spatial_shape=ss,
                                 batch_size=1, dilation=(1, 1, 1),
                                 fallback=False)
                return jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        r1 = run_case(f"DG subm C=K={c}", chain_dg, feats, w)
        run_case(f"DG subm cached-plans C=K={c}", chain_dg_cached,
                 feats, w)
        r2 = run_case(f"SK subm C=K={c}", chain_sk, feats, w)
        print(f"  sums: dg={float(r1):.1f} sk={float(r2):.1f}")

        # elementwise agreement (sums are cancellation-dominated)
        o_dg = jax.jit(lambda f, w_: dg_subm_conv(
            f, keys_j, w_, spatial_shape=ss, batch_size=1,
            dilation=(1, 1, 1)))(feats, w)
        o_sk = jax.jit(lambda f, w_: sk_subm_conv(
            f, inds_j, keys_j, w_, spatial_shape=ss, batch_size=1,
            dilation=(1, 1, 1), fallback=False))(feats, w)
        d = np.abs(np.asarray(o_dg, np.float64) -
                   np.asarray(o_sk, np.float64))
        scale = np.abs(np.asarray(o_sk, np.float64)).max()
        print(f"  elementwise: max|dg-sk|={d.max():.4f} "
              f"rel={d.max()/max(scale,1e-9):.2e} scale={scale:.1f}")

        # backward (fused dgrad+wgrad)
        def chain_dg_bwd(f0, w_):
            def loss(f, wv):
                o = dg_subm_conv(f, keys_j, wv, spatial_shape=ss,
                                 batch_size=1, dilation=(1, 1, 1))
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def body(i, acc):
                f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                gf, gw = jax.grad(loss, argnums=(0, 1))(f, w_)
                return (jnp.sum(gf.astype(jnp.float32))
                        + jnp.sum(gw.astype(jnp.float32)))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        run_case(f"DG subm fwd+bwd C=K={c}", chain_dg_bwd, feats, w)

        # R-row supertile sweep (shared plane windows; fwd only)
        from spconv_tpu.ops.pallas.dg_conv import dg_window_for
        for R in (2, 4, 8):
            WR = dg_window_for(R)
            np_tR, n_padR = _n_pad_for(inds.shape[0], 128 * R, WR)
            plans_R = jax.jit(lambda kk, R=R, WR=WR, np_tR=np_tR,
                              n_padR=n_padR: build_sk_plans(
                _pad_rows(kk, np_tR, sent), sent, deltas_np, groups,
                tile=128 * R, window=WR, n_pad=n_padR,
                align=128))(keys_j)

            def chain_dg_R(f0, w_, R=R, WR=WR, plans_R=plans_R):
                def body(i, acc):
                    f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                    o = dg_subm_conv(f, keys_j, w_, spatial_shape=ss,
                                     batch_size=1, dilation=(1, 1, 1),
                                     window=WR, rows_per_tile=R,
                                     plans=(plans_R[0], plans_c[1]))
                    return jnp.sum(o.astype(jnp.float32))
                return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

            r3 = run_case(f"DG subm R={R} W={WR} C=K={c}", chain_dg_R,
                          feats, w)
            print(f"  sum R={R}: {float(r3):.1f} (R=1: {float(r1):.1f})")

        # int8 DG (quad-packed gather, int8 MXU GEMM, fused epilogue)
        from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv_q
        fi8 = jnp.asarray(rs.randint(-100, 100, (inds.shape[0], c)),
                          jnp.int8)
        fi8 = jnp.where(inds_j[:, :1] >= 0, fi8, 0)
        wi8 = jnp.asarray(rs.randint(-80, 80, (c, 3, 3, 3, c)), jnp.int8)
        scale = jnp.asarray(rs.uniform(0.001, 0.01, (c,)), jnp.float32)

        def chain_q(f0, w_):
            def body(i, acc):
                f = (f0.astype(jnp.int32)
                     + (acc > 1e30).astype(jnp.int32)).astype(jnp.int8)
                o = dg_subm_conv_q(
                    f, keys_j, w_, scale, None, spatial_shape=ss,
                    batch_size=1, dilation=(1, 1, 1), act="relu",
                    out_dtype=jnp.int8, plans=plans_c)
                return acc + jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        run_case(f"DG int8 subm C=K={c}", chain_q, fi8, wi8)


if __name__ == "__main__":
    main()
