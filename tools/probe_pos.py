"""Posmode DG conv (cached match rows) vs searching DG vs SK, on the
real 125k-voxel scan and the 8x-replicated ~900k large scan, fwd + bwd.
Steady-state comparison: plans AND pos cached per indice_key (this is
what repeated subm layers in a stage pay).  In-jit chained-repetition
timing (external loops mis-measure through the tunnel)."""

import os
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

try:  # persistent compile cache (Mosaic kernel compiles cost minutes)
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from spconv_tpu.ops import coords as CO
from spconv_tpu.ops.pallas.dg_conv import build_dg_pos, dg_subm_conv
from spconv_tpu.ops.pallas.sorted_conv import (
    _n_pad_for, _pad_rows, build_sk_plans, sk_groups, sk_subm_conv,
    subm_key_deltas)

REP = 20
SCAN = sys.argv[1] if len(sys.argv) > 1 else "basic"  # basic | large
WIDTHS = ([int(w) for w in sys.argv[2].split(",")]
          if len(sys.argv) > 2 else [16, 64, 128])
DO_BWD = "--no-bwd" not in sys.argv


def load_scan(large=False):
    scan_path = os.environ.get(
        "SPCONV_BENCH_SCAN", "/root/reference/test/data/test_spconv.pkl")
    if large:
        # the REAL 900k bench_large voxelization (8 shifted copies in
        # ONE batch — locally denser, which is what drives window
        # sweeps; batch-replication would not reproduce it)
        from spconv_tpu.benchmark.basic import load_large_data

        _voxels, coors, spatial_shape = load_large_data()
        ss = tuple(int(s) for s in spatial_shape)
        batch = 1
    else:
        voxels, coors, spatial_shape = pickle.load(open(scan_path, "rb"))
        ss = tuple(int(s) for s in spatial_shape)
        batch = 1
    key = coors[:, 0].astype(np.int64)
    for a, s in enumerate(ss):
        key = key * s + coors[:, a + 1]
    order = np.argsort(key)
    coors = coors[order]
    n = coors.shape[0]
    nbuf = -(-n // 4096) * 4096
    inds = np.full((nbuf, 4), -1, np.int32)
    inds[:n] = coors
    return inds, ss, n, batch


def run_case(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    f(*args).block_until_ready()
    t1 = time.perf_counter()
    f(*args).block_until_ready()
    t2 = time.perf_counter()
    per = (t2 - t1) / REP * 1e3
    print(f"{name}: {per:.3f} ms/iter  (compile+first {t1 - t0:.1f}s)",
          flush=True)
    return per


def main():
    large = SCAN == "large"
    inds, ss, n, batch = load_scan(large)
    print(f"scan: {n} voxels, grid {ss}, batch {batch}")
    inds_j = jnp.asarray(inds)
    keys_j, _ = CO.linearize(inds_j, ss, batch)
    rs = np.random.RandomState(0)

    deltas_np, _disp = subm_key_deltas((3, 3, 3), (1, 1, 1), ss)
    groups = sk_groups((3, 3, 3), include_center=True)
    sent = int(np.prod(ss)) * batch
    W = int(os.environ.get("SPCONV_PROBE_WINDOW", "384"))
    np_t, n_pad = _n_pad_for(inds.shape[0], 128, W)
    R = int(os.environ.get("SPCONV_PROBE_ROWS", "1"))
    np_t, n_pad = _n_pad_for(inds.shape[0], 128 * R, W)
    plans = jax.jit(lambda kk: build_sk_plans(
        _pad_rows(kk, np_t, sent), sent, deltas_np, groups,
        tile=128 * R, window=W, n_pad=n_pad, align=128))(keys_j)
    jax.block_until_ready(plans)
    posf = jax.jit(lambda kk: build_dg_pos(
        kk, plans[0], ksize=(3, 3, 3), dilation=(1, 1, 1),
        spatial_shape=ss, batch_size=batch, window=W, rows=R))
    t0 = time.perf_counter()
    pos = posf(keys_j)
    pos.block_until_ready()
    t1 = time.perf_counter()

    # device cost measured in-jit (a single dispatch through the tunnel
    # costs ~30-40 ms and would swamp the kernel time)
    @jax.jit
    def pos_chain(kk):
        def body(i, acc):
            kk2 = kk + (acc > jnp.int32(2**30)).astype(kk.dtype)
            p = build_dg_pos(kk2, plans[0], ksize=(3, 3, 3),
                             dilation=(1, 1, 1), spatial_shape=ss,
                             batch_size=batch, window=W, rows=R)
            return acc + jnp.sum(jnp.abs(p[0, 0, :3]))
        return jax.lax.fori_loop(0, REP, body, jnp.int32(0))

    int(pos_chain(keys_j))
    t2 = time.perf_counter()
    int(pos_chain(keys_j))
    t3 = time.perf_counter()
    print(f"pos build: {(t3 - t2) / REP * 1e3:.2f} ms/iter "
          f"(compile+first {t1 - t0:.1f}s)  nw_max "
          f"{int(np.max(np.asarray(plans[0].nw)))}")

    for c in WIDTHS:
        fnp = rs.randn(inds.shape[0], c).astype(np.float32)
        fnp[n:] = 0
        feats = jnp.asarray(fnp, dtype=jnp.bfloat16)
        w = jnp.asarray(rs.randn(c, 3, 3, 3, c).astype(np.float32) * .1,
                        dtype=jnp.bfloat16)

        def mk_chain(use_pos):
            def chain(f0, w_):
                def body(i, acc):
                    f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                    o = dg_subm_conv(
                        f, keys_j, w_, spatial_shape=ss,
                        batch_size=batch, dilation=(1, 1, 1),
                        window=W, rows_per_tile=R,
                        plans=plans, pos=pos if use_pos else None)
                    return jnp.sum(o.astype(jnp.float32))
                return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
            return chain

        def chain_sk(f0, w_):
            def body(i, acc):
                f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                o = sk_subm_conv(f, inds_j, keys_j, w_,
                                 spatial_shape=ss, batch_size=batch,
                                 dilation=(1, 1, 1), fallback=False)
                return jnp.sum(o.astype(jnp.float32))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        p_pos = run_case(f"DG+pos C=K={c}", mk_chain(True), feats, w)
        p_dg = run_case(f"DG     C=K={c}", mk_chain(False), feats, w)
        p_sk = run_case(f"SK     C=K={c}", chain_sk, feats, w)
        print(f"  fwd: pos/dg={p_pos / p_dg:.2f} pos/sk="
              f"{p_pos / p_sk:.2f}")

        # agreement
        o_p = jax.jit(lambda f, w_: dg_subm_conv(
            f, keys_j, w_, spatial_shape=ss, batch_size=batch,
            dilation=(1, 1, 1), plans=plans, pos=pos))(feats, w)
        o_d = jax.jit(lambda f, w_: dg_subm_conv(
            f, keys_j, w_, spatial_shape=ss, batch_size=batch,
            dilation=(1, 1, 1), plans=plans))(feats, w)
        d = np.abs(np.asarray(o_p, np.float64)
                   - np.asarray(o_d, np.float64)).max()
        print(f"  elementwise max|pos-dg|={d:.5f}")

        if not DO_BWD:
            continue

        def mk_bwd(use_pos):
            def chain(f0, w_):
                def loss(f, wv):
                    o = dg_subm_conv(
                        f, keys_j, wv, spatial_shape=ss,
                        batch_size=batch, dilation=(1, 1, 1),
                        plans=plans, pos=pos if use_pos else None)
                    return jnp.sum(o.astype(jnp.float32) ** 2)

                def body(i, acc):
                    f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                    l, (gf, gw) = jax.value_and_grad(
                        loss, argnums=(0, 1))(f, w_)
                    return (l + jnp.sum(gf.astype(jnp.float32))
                            + jnp.sum(gw.astype(jnp.float32)))
                return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
            return chain

        def chain_sk_bwd(f0, w_):
            def loss(f, wv):
                o = sk_subm_conv(f, inds_j, keys_j, wv,
                                 spatial_shape=ss, batch_size=batch,
                                 dilation=(1, 1, 1), fallback=False)
                return jnp.sum(o.astype(jnp.float32) ** 2)

            def body(i, acc):
                f = f0 * (1.0 + 0.0 * acc).astype(f0.dtype)
                l, (gf, gw) = jax.value_and_grad(
                    loss, argnums=(0, 1))(f, w_)
                return (l + jnp.sum(gf.astype(jnp.float32))
                        + jnp.sum(gw.astype(jnp.float32)))
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

        b_pos = run_case(f"DG+pos fwd+bwd C=K={c}", mk_bwd(True),
                         feats, w)
        b_dg = run_case(f"DG     fwd+bwd C=K={c}", mk_bwd(False),
                        feats, w)
        b_sk = run_case(f"SK     fwd+bwd C=K={c}", chain_sk_bwd,
                        feats, w)
        print(f"  fwd+bwd: pos/dg={b_pos / b_dg:.2f} "
              f"pos/sk={b_pos / b_sk:.2f}")


if __name__ == "__main__":
    main()
