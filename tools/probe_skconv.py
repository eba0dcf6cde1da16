"""TPU probe: fused sorted-key conv vs rulebook+gather at stage-0 sizes
(127k voxels, C=K=64, k=3).  Measures plan build, kernel fwd (plan cached
and not), bwd, and the honest (rulebook-included) native path.
Run alone (one tunnel client)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from spconv_tpu.benchmark.basic import load_basic_data, make_bench_input
    from spconv_tpu.ops import coords as C
    from spconv_tpu.ops.gather_gemm import indice_conv
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.rulebook import build_subm_rulebook

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
    shape = tuple(int(s) for s in spatial_shape)
    n = x.indices.shape[0]
    cch = 64

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(n, cch) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(64, 3, 3, 3, cch) * 0.05, jnp.bfloat16)
    inds = x.indices
    keys, sent = C.linearize(inds, shape, 1)
    sent = int(sent)

    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000
    print(f"floor {floor:.1f} ms  n={n}", flush=True)

    def timed(label, fn, *args):
        f = jax.jit(fn)
        t0 = time.time(); float(f(*args)); cs = time.time() - t0
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            float(f(*args))
            best = min(best, time.time() - t1)
        ms = best * 1000 / REP - floor / REP
        print(f"{label:46s}: {ms:7.2f} ms  [compile {cs:.0f}s]", flush=True)
        return ms

    def rep(body_fn):
        def run(f):
            def body(_, c):
                ff = f * (1.0 + 0.0 * c).astype(f.dtype)
                return body_fn(ff)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
        return run

    def rep_keys(body_fn):
        """Perturb keys too (plan rebuilt per rep)."""
        def run(f):
            def body(_, c):
                ff = f * (1.0 + 0.0 * c).astype(f.dtype)
                kk = keys + jnp.isnan(c).astype(jnp.int32)
                return body_fn(ff, kk)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
        return run

    # plan build alone
    deltas_np, disp_np = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    for tile, window in [(256, 512), (256, 1024), (512, 1024), (128, 512)]:
        n_tiles = -(-n // tile)
        n_pad = -(-(n_tiles * tile + window) // 128) * 128

        def plan_only(ff, kk, tile=tile, window=window, n_pad=n_pad):
            plans = SK.build_sk_plans(kk, sent, deltas_np, tile=tile,
                                      window=window, n_pad=n_pad)
            return (jnp.sum(plans[0].ws.astype(jnp.float32))
                    + jnp.sum(ff[:1].astype(jnp.float32)))

        def kern(ff, kk, tile=tile, window=window):
            o = SK.sk_subm_conv(
                ff, inds, kk, w, spatial_shape=shape, batch_size=1,
                dilation=(1, 1, 1), tile=tile, window=window)
            return jnp.sum(o.astype(jnp.float32))

        # overflow check (eager)
        plans = SK.build_sk_plans(keys, sent, deltas_np, tile=tile,
                                  window=window, n_pad=n_pad)
        fb = bool(plans[0].fallback) or bool(plans[1].fallback)
        nw = np.asarray(plans[0].nw)
        print(f"T={tile} W={window}: fallback={fb} "
              f"avg present offsets/tile={(nw > 0).sum(0).mean():.1f} "
              f"avg windows/offset={nw[nw > 0].mean():.2f} "
              f"max nw={nw.max()}", flush=True)
        if fb:
            continue
        timed(f"plan build 2x (T={tile} W={window})",
              rep_keys(plan_only), feats)
        timed(f"sk fwd+plan (T={tile} W={window})", rep_keys(kern), feats)

        def kern_cached(ff, plans=plans, tile=tile, window=window):
            o = SK.sk_subm_conv(
                ff, inds, keys, w, spatial_shape=shape, batch_size=1,
                dilation=(1, 1, 1), tile=tile, window=window, plans=plans)
            return jnp.sum(o.astype(jnp.float32))

        timed(f"sk fwd cached-plan (T={tile} W={window})",
              rep(kern_cached), feats)

    # honest native layer: rulebook + gather conv
    def native(ff, kk):
        ii = inds + (kk[:1, None] * 0)
        data = build_subm_rulebook(
            ii, spatial_shape=shape, batch_size=1, ksize=(3, 3, 3),
            dilation=(1, 1, 1))
        o = indice_conv(ff, w, data.pair_fwd, data.pair_bwd, is_subm=True)
        return jnp.sum(o.astype(jnp.float32))

    timed("native rulebook+gather (honest)", rep_keys(native), feats)

    # bwd through the kernel (cached plans)
    plans = SK.build_sk_plans(keys, sent, deltas_np, tile=256, window=1024,
                              n_pad=-(-(-(-n // 256) * 256 + 1024) // 128)
                              * 128)

    def skloss(ff, ww):
        o = SK.sk_subm_conv(
            ff, inds, keys, ww, spatial_shape=shape, batch_size=1,
            dilation=(1, 1, 1), tile=256, window=1024, plans=plans)
        return jnp.sum((o * o).astype(jnp.float32))

    def bwd(ff):
        def body(_, c):
            f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
            l, (df, dw) = jax.value_and_grad(skloss, argnums=(0, 1))(f2, w)
            return l + jnp.sum(df.astype(jnp.float32)) + jnp.sum(
                dw.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    timed("sk fwd+bwd cached-plan (T=256 W=1024)", bwd, feats)

    # numeric check vs native on device
    o1 = SK.sk_subm_conv(feats, inds, keys, w, spatial_shape=shape,
                         batch_size=1, dilation=(1, 1, 1), tile=256,
                         window=1024)
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    o2 = indice_conv(feats, w, data.pair_fwd, data.pair_bwd, is_subm=True)
    d = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                              - o2.astype(jnp.float32))))
    m = float(jnp.max(jnp.abs(o2.astype(jnp.float32))))
    print(f"device parity: max abs diff {d:.4f} (max |ref| {m:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
