"""Standalone TPU prototype v3 of the packed sorted-key conv kernel:
plane-shared windows (one DMA per dz-plane instead of per offset) +
double-buffered DMA across (tile, plane) steps.  Verifies numerics vs the
rulebook path, then times at stage-0 size (127k voxels, C=K=64, k=3^3)."""

import sys
import time
import functools
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"

T = 256          # output tile rows
W = 512          # window, original rows
ALIGN = 256      # ws alignment (original rows)
P = 2            # pack factor (C=64)
WP = W // P      # packed window rows
NSH = 8          # shifted key copies
NP_ = 3          # planes (dz groups for 3x3x3)
MAXNW = 24


def build_keys_sh(keys_pad):
    n_pad = keys_pad.shape[0]
    npk = n_pad // P
    out = []
    for j in range(P):
        kj = keys_pad[j::P]
        rows = []
        for i in range(NSH):
            shifted = jnp.concatenate(
                [kj[i * 128:],
                 jnp.full((i * 128 + 2048,), 2**31 - 1, jnp.int32)])
            rows.append(shifted.reshape(npk // 128 + 16, 128))
        out.append(jnp.stack(rows))
    return jnp.stack(out)  # [P, NSH, npk/128 + 16, 128]


def build_plan_grouped(keys, sent, deltas, groups, n_pad):
    """ws/nw per (group, tile): one window plan covering every offset of
    the group.  keys [Np] sorted sentinel-padded, Np % T == 0."""
    np_ = keys.shape[0]
    n_tiles = np_ // T
    kv = len(deltas)
    d = jnp.asarray(deltas, jnp.int32)
    bkeys = keys[::T]
    probes = (bkeys[None, :] + d[:, None]).reshape(-1)
    npb = probes.shape[0]
    allk = jnp.concatenate([probes, keys])
    src = jnp.arange(npb + np_, dtype=jnp.int32)
    _, src_s = jax.lax.sort((allk, src), num_keys=1, is_stable=True)
    cnt = jnp.cumsum((src_s >= npb).astype(jnp.int32))
    _, ranks = jax.lax.sort((src_s, cnt), num_keys=1, is_stable=False)
    lo = ranks[:npb].reshape(kv, n_tiles)
    n_valid = jnp.sum((keys != sent).astype(jnp.int32))
    hi = jnp.concatenate(
        [lo[:, 1:], jnp.broadcast_to(n_valid, (kv, 1))], axis=1)
    hi = jnp.minimum(hi, n_valid)
    lo = jnp.minimum(lo, n_valid)
    tile_live = bkeys != sent
    glo, ghi = [], []
    for g in groups:
        glo.append(jnp.min(jnp.stack([lo[k] for k in g]), axis=0))
        ghi.append(jnp.max(jnp.stack([hi[k] for k in g]), axis=0))
    glo = jnp.stack(glo)  # [G, n_tiles]
    ghi = jnp.stack(ghi)
    present = (ghi > glo) & tile_live[None, :]
    ws = (glo // ALIGN) * ALIGN
    ws = jnp.clip(ws, 0, max((n_pad - W) // ALIGN * ALIGN, 0))
    nw = jnp.where(present, -(-(ghi - ws) // W), 0)
    overflow = jnp.any(nw > MAXNW)
    unsorted = jnp.any(keys[1:] < keys[:-1])
    return (ws.astype(jnp.int32), nw.astype(jnp.int32),
            overflow | unsorted)


def kernel(kv, center, c, k_ch, deltas, dims, sentinel, groups, n_tiles,
           ws_ref, nw_ref,
           kt_ref, ft_ref, keys_sh_hbm, featp_hbm, w_ref,
           out_ref,
           wk2_ref, wf2_ref, wk1_ref, wf1_ref, gbuf_ref,
           ksem2, fsem2, ksem1, fsem1):
    t = pl.program_id(0)

    kt = kt_ref[0, 0]
    live = kt != sentinel
    rem = kt
    coord = []
    for s in reversed(dims):
        coord.append(jax.lax.rem(rem, s))
        rem = jax.lax.div(rem, s)
    coord = coord[::-1]

    def probe_of(k):
        disp_k = deltas[1][k]
        ok = live
        for a in range(len(dims)):
            da = int(disp_k[a])
            if da != 0:
                ok = ok & (coord[a] + da >= 0) & (coord[a] + da < dims[a])
        return jnp.where(ok, kt + int(deltas[0][k]), -1)

    def start_dma(step, buf):
        """Start key+feature DMA for flattened step (= t*NP_ + p),
        window 0, into pipeline buffer `buf`."""
        tt = step // NP_
        pp = step % NP_
        base = ws_ref[pp, tt]
        ps = base // P
        m = ps // 128
        ish = jax.lax.rem(m, NSH)
        r0 = pl.multiple_of(m - ish, 8)
        for j in range(P):
            pltpu.make_async_copy(
                keys_sh_hbm.at[j, ish, pl.ds(r0, 8), :],
                wk2_ref.at[buf, j], ksem2.at[buf, j]).start()
        pltpu.make_async_copy(
            featp_hbm.at[pl.ds(pl.multiple_of(ps, 128), WP), :],
            wf2_ref.at[buf], fsem2.at[buf]).start()

    def start_dma1(pp, tt, wi, buf):
        base = ws_ref[pp, tt] + wi * W
        ps = base // P
        m = ps // 128
        ish = jax.lax.rem(m, NSH)
        r0 = pl.multiple_of(m - ish, 8)
        for j in range(P):
            pltpu.make_async_copy(
                keys_sh_hbm.at[j, ish, pl.ds(r0, 8), :],
                wk1_ref.at[buf, j], ksem1.at[buf, j]).start()
        pltpu.make_async_copy(
            featp_hbm.at[pl.ds(pl.multiple_of(ps, 128), WP), :],
            wf1_ref.at[buf], fsem1.at[buf]).start()

    gbuf_ref[:, center * c:(center + 1) * c] = ft_ref[:].astype(
        gbuf_ref.dtype)

    def plane_matmul(wk, wf, probes_p):
        """One-hot gather of every offset of the plane from the shared
        window (v4): per-128-entry-row matmuls (no [T,WP] concat) and
        any()+where slot selection (no f32 rowsums)."""
        if VARIANT == "v4":
            outs = []
            for probe in probes_p:
                p2 = probe[:, None]
                g2 = jnp.zeros((T, 128), jnp.float32)
                msel = None
                for r in range(WP // 128):
                    ohr = None
                    for j in range(P):
                        o = p2 == wk[j, r][None, :]
                        if j == 0:
                            m0 = jnp.any(o, axis=1, keepdims=True)
                            msel = m0 if msel is None else (msel | m0)
                        ohr = o if ohr is None else (ohr | o)
                    g2 = g2 + jnp.dot(
                        ohr.astype(jnp.bfloat16),
                        wf[r * 128:(r + 1) * 128].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                outs.append(jnp.where(msel, g2[:, :c], g2[:, c:]))
            return outs
        g = len(probes_p)
        iota = jax.lax.broadcasted_iota(jnp.int32, (T, WP), 1)
        ohs_all = []      # per offset per slot [T, WP]
        oh_any_rows = []  # per offset [T, WP]
        for probe in probes_p:
            p2 = probe[:, None]
            ohs = []
            for j in range(P):
                if VARIANT == "nocmp":
                    ohs.append(iota == p2)
                else:
                    rows = [p2 == wk[j, r][None, :]
                            for r in range(WP // 128)]
                    ohs.append(jnp.concatenate(rows, axis=1))
            oh_any = ohs[0]
            for j in range(1, P):
                oh_any = oh_any | ohs[j]
            ohs_all.append(ohs)
            oh_any_rows.append(oh_any)
        if VARIANT == "nomm":
            return [jnp.sum(o[0].astype(jnp.float32), axis=1,
                            keepdims=True)
                    * jnp.ones((T, c), jnp.float32) for o in ohs_all]
        big = jnp.concatenate(oh_any_rows, axis=0)  # [g*T, WP]
        g2 = jnp.dot(big.astype(jnp.bfloat16), wf.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # [g*T, 128]
        outs = []
        for i in range(g):
            gi = g2[i * T:(i + 1) * T]
            if VARIANT in ("norowsum",):
                outs.append(gi[:, :c])
                continue
            contrib = jnp.zeros((T, c), jnp.float32)
            for j in range(P):
                mj = jnp.sum(ohs_all[i][j].astype(jnp.float32), axis=1,
                             keepdims=True)
                contrib = contrib + gi[:, j * c:(j + 1) * c] * mj
            outs.append(contrib)
        return outs

    for p in range(NP_):
        s = t * NP_ + p
        buf = s % 2
        if p == 0:
            @pl.when(t == 0)
            def _():
                start_dma(0, 0)
        # prefetch next step
        @pl.when(s + 1 < n_tiles * NP_)
        def _(s=s):
            start_dma(s + 1, (s + 1) % 2)

        for j in range(P):
            pltpu.make_async_copy(
                keys_sh_hbm.at[0, 0, pl.ds(0, 8), :],
                wk2_ref.at[buf, 0], ksem2.at[buf, j]).wait()
        pltpu.make_async_copy(
            featp_hbm.at[pl.ds(0, WP), :], wf2_ref.at[buf],
            fsem2.at[buf]).wait()

        probes_p = [probe_of(k) for k in groups[p]]
        nw = nw_ref[p, t]

        # start window-1 DMA (if any) before computing window 0 so the
        # extra-window sweep overlaps the first matmul
        @pl.when(nw > 1)
        def _():
            start_dma1(p, t, 1, 1)

        outs = plane_matmul(wk2_ref[buf], wf2_ref[buf], probes_p)

        # extra windows, double-buffered serial sweep (buf = wi % 2)
        def extra(wi, accs):
            sb = jax.lax.rem(wi, 2)
            @pl.when(wi + 1 < nw)
            def _():
                start_dma1(p, t, wi + 1, jax.lax.rem(wi + 1, 2))
            for j in range(P):
                pltpu.make_async_copy(
                    keys_sh_hbm.at[0, 0, pl.ds(0, 8), :],
                    wk1_ref.at[0, 0], ksem1.at[sb, j]).wait()
            pltpu.make_async_copy(
                featp_hbm.at[pl.ds(0, WP), :], wf1_ref.at[0],
                fsem1.at[sb]).wait()
            extra_outs = plane_matmul(wk1_ref[sb], wf1_ref[sb], probes_p)
            return [a + e for a, e in zip(accs, extra_outs)]

        outs = jax.lax.fori_loop(1, nw, extra, outs)

        zero = nw == 0
        for i, k in enumerate(groups[p]):
            val = jnp.where(zero, jnp.zeros((T, c), jnp.float32), outs[i])
            gbuf_ref[:, k * c:(k + 1) * c] = val.astype(gbuf_ref.dtype)

    out = jnp.dot(gbuf_ref[:], w_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def main():
    from spconv_tpu.benchmark.basic import load_basic_data, make_bench_input
    from spconv_tpu.ops import coords as C
    from spconv_tpu.ops.pallas.sorted_conv import subm_key_deltas
    from spconv_tpu.ops.rulebook import build_subm_rulebook
    from spconv_tpu.ops.gather_gemm import indice_conv

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
    shape = tuple(int(s) for s in spatial_shape)
    n = x.indices.shape[0]
    c = k_ch = 64
    kv, center = 27, 13
    groups = [list(range(0, 9)), [k for k in range(9, 18) if k != 13],
              list(range(18, 27))]

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(n, c) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(k_ch, 3, 3, 3, c) * 0.05, jnp.bfloat16)
    inds = x.indices
    keys, sent = C.linearize(inds, shape, 1)
    sent_i = int(sent)

    deltas_np, disp_np = subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    n_tiles = -(-n // T)
    np_t = n_tiles * T
    n_pad = -(-(np_t + MAXNW * W + 2048) // 2048) * 2048

    keys_p = jnp.concatenate(
        [keys, jnp.full((n_pad - n,), sent_i, jnp.int32)])
    feat_p = jnp.concatenate(
        [feats, jnp.zeros((n_pad - n, c), jnp.bfloat16)])
    featp2 = feat_p.reshape(n_pad // P, 128)
    keys_sh = build_keys_sh(keys_p)
    kt3 = keys_p[:np_t].reshape(n_tiles, 1, T)
    ft = feat_p[:np_t]
    wflat = jnp.transpose(
        w.reshape(k_ch, kv, c), (1, 2, 0)).reshape(kv * c, k_ch
                                                   ).astype(jnp.bfloat16)

    ws, nw, fb = build_plan_grouped(
        keys_p[:np_t], sent_i,
        tuple(int(d) for d in deltas_np), groups, n_pad)
    nwm = np.asarray(nw)
    print(f"fallback={bool(fb)} avg nw={nwm[nwm>0].mean():.2f} "
          f"max nw={nwm.max()} planes/tile={(nwm>0).sum(0).mean():.1f}",
          flush=True)

    deltas = (np.asarray(deltas_np, np.int32),
              np.asarray(disp_np, np.int32).reshape(kv, 3))

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, c), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, k_ch), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, P, 8, 128), jnp.int32),
            pltpu.VMEM((2, WP, 128), jnp.bfloat16),
            pltpu.VMEM((2, P, 8, 128), jnp.int32),
            pltpu.VMEM((2, WP, 128), jnp.bfloat16),
            pltpu.VMEM((T, kv * c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    kern = functools.partial(kernel, kv, center, c, k_ch, deltas, shape,
                             sent_i, groups, n_tiles)
    f = pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n_tiles, T, k_ch), jnp.bfloat16))

    try:
        out = jax.jit(lambda *a: f(*a))(
            ws, nw, kt3, ft, keys_sh, featp2, wflat)
        out.block_until_ready()
        print("compile OK", flush=True)
    except Exception as e:
        msg = str(e)
        i = msg.find("Mosaic")
        print("FAIL:", msg[i:i + 1200] if i >= 0 else msg[:1200],
              flush=True)
        return

    if VARIANT in ("full", "v4"):
        out2 = np.asarray(out.reshape(np_t, k_ch)[:n])
        data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                                   ksize=(3, 3, 3), dilation=(1, 1, 1))
        refo = indice_conv(feats, w, data.pair_fwd, data.pair_bwd,
                           is_subm=True)
        dd = float(np.max(np.abs(out2.astype(np.float32)
                                 - np.asarray(refo, np.float32))))
        print(f"parity: max abs diff {dd:.4f}", flush=True)
    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000

    @jax.jit
    def rep(ff):
        def body(_, cacc):
            f2 = ff * (1.0 + 0.0 * cacc).astype(ff.dtype)
            fp = jnp.concatenate(
                [f2, jnp.zeros((n_pad - n, c), jnp.bfloat16)]
            ).reshape(n_pad // P, 128)
            ftt = fp.reshape(n_pad, c)[:np_t]
            o = f(ws, nw, kt3, ftt, keys_sh, fp, wflat)
            return jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time(); float(rep(feats)); cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(rep(feats)); best = min(
            best, time.time() - t0)
    print(f"sk-v3[{VARIANT}] fwd: {best*1000/REP - floor/REP:.2f} ms "
          f"(compile {cs:.0f}s)", flush=True)
    return


def _never(out2, n):
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    ref = None
    d = float(jnp.max(jnp.abs(out2.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    m = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"parity: max abs diff {d:.4f} (max |ref| {m:.2f})", flush=True)

    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000

    @jax.jit
    def rep(ff):
        def body(_, cacc):
            f2 = ff * (1.0 + 0.0 * cacc).astype(ff.dtype)
            fp = jnp.concatenate(
                [f2, jnp.zeros((n_pad - n, c), jnp.bfloat16)]
            ).reshape(n_pad // P, 128)
            ftt = fp.reshape(n_pad, c)[:np_t]
            o = f(ws, nw, kt3, ftt, keys_sh, fp, wflat)
            return jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    t0 = time.time(); float(rep(feats)); cs = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(rep(feats)); best = min(
            best, time.time() - t0)
    print(f"sk-v3 fwd: {best*1000/REP - floor/REP:.2f} ms "
          f"(compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
