"""Probe the first bench layer (SubMConv3d 3->64) cost components on TPU:
rulebook build alone, expand-first conv, direct gather conv, and the
einsum/take pieces of expand-first.  Run alone (one tunnel client).
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
    from spconv_tpu.ops.rulebook import build_subm_rulebook
    from spconv_tpu.ops import gather_gemm as gg

    voxels, coors, spatial_shape = load_basic_data()
    x = make_bench_input(voxels, coors, spatial_shape, dtype=jnp.bfloat16)
    shape = tuple(int(s) for s in spatial_shape)
    n = x.indices.shape[0]

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
        print(f"{label:44s}: {ms:7.2f} ms  [compile {cs:.0f}s]", flush=True)
        return ms

    def rep(body_fn):
        def run(f):
            def body(_, c):
                ff = f * (1.0 + 0.0 * c).astype(f.dtype)
                return body_fn(ff)
            return jax.lax.fori_loop(0, REP, body, jnp.float32(0))
        return run

    # rulebook build alone (perturb indices invariantly so it re-runs)
    def rb(ff):
        data = build_subm_rulebook(
            x.indices + (ff[:1, :1].astype(jnp.int32) * 0),
            spatial_shape=shape, batch_size=1, ksize=(3, 3, 3),
            dilation=(1, 1, 1))
        return jnp.sum(data.pair_fwd.astype(jnp.float32))

    timed("subm rulebook build (127k, kv=27)", rep(rb), x.features)

    data = build_subm_rulebook(
        x.indices, spatial_shape=shape, batch_size=1, ksize=(3, 3, 3),
        dilation=(1, 1, 1))
    pf, pb = data.pair_fwd, data.pair_bwd

    rng = np.random.RandomState(0)
    C = 3
    feats3 = jnp.asarray(rng.randn(n, C), jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(27, C, 64) * 0.1, jnp.bfloat16)

    # expand-first path (current default for C=3)
    def ef(ff):
        o = gg.gather_mm(ff, w3, pf, 13)
        return jnp.sum(o.astype(jnp.float32))

    timed("conv 3->64 expand-first (current)", rep(ef), feats3)

    # direct path (pre-fix): gather 3-wide rows then einsum
    def direct(ff):
        fz = gg._zero_pad(ff)
        pfc = gg._clamp_pairs(pf, n)
        acc = jnp.dot(ff, w3[13], preferred_element_type=jnp.float32)
        ks = np.array([k for k in range(27) if k != 13])
        for chunk in [ks[:13], ks[13:]]:
            g = jnp.take(fz, pfc[chunk], axis=0)
            acc = acc + jnp.einsum("knc,kcd->nd", g, w3[chunk],
                                   preferred_element_type=jnp.float32)
        return jnp.sum(acc)

    timed("conv 3->64 direct gather (old)", rep(direct), feats3)

    # pad-to-8 then direct gather (wider rows, 16B)
    feats8 = jnp.concatenate(
        [feats3, jnp.zeros((n, 5), jnp.bfloat16)], axis=1)
    w8 = jnp.concatenate([w3, jnp.zeros((27, 5, 64), jnp.bfloat16)], axis=1)

    def pad8(ff):
        fz = gg._zero_pad(ff)
        pfc = gg._clamp_pairs(pf, n)
        acc = jnp.dot(ff, w8[13], preferred_element_type=jnp.float32)
        ks = np.array([k for k in range(27) if k != 13])
        for chunk in [ks[:13], ks[13:]]:
            g = jnp.take(fz, pfc[chunk], axis=0)
            acc = acc + jnp.einsum("knc,kcd->nd", g, w8[chunk],
                                   preferred_element_type=jnp.float32)
        return jnp.sum(acc)

    timed("conv 3->64 pad-to-8 gather", rep(pad8), feats8)


if __name__ == "__main__":
    main()
