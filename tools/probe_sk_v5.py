"""TPU probe for the v5 library sorted-key conv: parity + fwd/bwd timing
at stage-0 sizes (126k voxels, C=K=64, 3x3x3)."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    from spconv_tpu.benchmark.basic import load_basic_data, make_bench_input
    from spconv_tpu.ops import coords as C
    from spconv_tpu.ops.gather_gemm import indice_conv
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.rulebook import build_subm_rulebook

    cch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    kout = int(sys.argv[2]) if len(sys.argv) > 2 else cch
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
    shape = tuple(int(s) for s in spatial_shape)
    n = x.indices.shape[0]

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(n, cch) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.randn(kout, 3, 3, 3, cch) * 0.05, jnp.bfloat16)
    inds = x.indices
    keys, sent = C.linearize(inds, shape, 1)
    sent = int(sent)

    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3))
    np_t, n_pad = SK._n_pad_for(n, T, W)
    keys_p = SK._pad_rows(keys, np_t, sent)
    plans = SK.build_sk_plans(keys_p, sent, deltas_np, groups, tile=T,
                              window=W, n_pad=n_pad)
    nwm = np.asarray(plans[0].nw)
    print(f"C={cch} K={kout} T={T} W={W}: fallback="
          f"{bool(plans[0].fallback) or bool(plans[1].fallback)} "
          f"avg nw={nwm[nwm > 0].mean():.2f} max nw={nwm.max()}",
          flush=True)

    # parity vs rulebook path
    o1 = SK.sk_subm_conv(feats, inds, keys, w, spatial_shape=shape,
                         batch_size=1, dilation=(1, 1, 1), tile=T,
                         window=W, plans=plans)
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    o2 = indice_conv(feats, w, data.pair_fwd, data.pair_bwd, is_subm=True)
    d = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                              - o2.astype(jnp.float32))))
    print(f"parity: max abs diff {d:.4f}", flush=True)

    REP = 8
    tiny = jax.jit(lambda s: s + 1.0)
    float(tiny(0.0))
    t0 = time.time()
    for _ in range(5):
        float(tiny(0.0))
    floor = (time.time() - t0) / 5 * 1000

    def timed(label, run):
        f = jax.jit(run)
        t0 = time.time(); float(f(feats)); cs = time.time() - t0
        best = 1e9
        for _ in range(3):
            t1 = time.time()
            float(f(feats))
            best = min(best, time.time() - t1)
        ms = best * 1000 / REP - floor / REP
        print(f"{label:40s}: {ms:7.2f} ms  [compile {cs:.0f}s]",
              flush=True)

    def fwd_cached(ff):
        def body(_, c):
            f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
            o = SK.sk_subm_conv(
                f2, inds, keys, w, spatial_shape=shape, batch_size=1,
                dilation=(1, 1, 1), tile=T, window=W, plans=plans)
            return jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    def fwd_plan(ff):
        def body(_, c):
            f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
            kk = keys + jnp.isnan(c).astype(jnp.int32)
            o = SK.sk_subm_conv(
                f2, inds, kk, w, spatial_shape=shape, batch_size=1,
                dilation=(1, 1, 1), tile=T, window=W)
            return jnp.sum(o.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    def fwdbwd(ff):
        def loss(f2, ww):
            o = SK.sk_subm_conv(
                f2, inds, keys, ww, spatial_shape=shape, batch_size=1,
                dilation=(1, 1, 1), tile=T, window=W, plans=plans)
            return jnp.sum((o * o).astype(jnp.float32))

        def body(_, c):
            f2 = ff * (1.0 + 0.0 * c).astype(ff.dtype)
            l, (df, dw) = jax.value_and_grad(loss, argnums=(0, 1))(f2, w)
            return l + jnp.sum(df.astype(jnp.float32)) + jnp.sum(
                dw.astype(jnp.float32))
        return jax.lax.fori_loop(0, REP, body, jnp.float32(0))

    timed("sk fwd cached-plan", fwd_cached)
    timed("sk fwd + plan build", fwd_plan)
    timed("sk fwd+bwd cached-plan", fwdbwd)


if __name__ == "__main__":
    main()
