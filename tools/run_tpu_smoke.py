#!/usr/bin/env python
"""TPU hardware smoke lane — runs the kernel matrix COMPILED on the real
chip (pytest runs interpret-mode on CPU; until this lane existed, the
only hardware exercise any kernel got was the benchmark itself —
VERDICT r3 #6).

Each case drives a Pallas kernel family through the public module API
on a real sparse scan slice and checks against the native gather path
computed on the same device.  Runtime ~3-6 min through the tunnel.

Run: python tools/run_tpu_smoke.py  (exit 0 = all green)
"""

import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import spconv_tpu

FAILS = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        FAILS.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)


def load_scan(n_cap=40000):
    voxels, coors, spatial_shape = pickle.load(
        open("/root/reference/test/data/test_spconv.pkl", "rb"))
    shape = [int(s) for s in spatial_shape]
    key = coors[:, 0].astype(np.int64)
    for i, s in enumerate(shape):
        key = key * s + coors[:, i + 1]
    order = np.argsort(key, kind="stable")[:n_cap]
    order = np.sort(order)
    coors = coors[order]
    n = coors.shape[0]
    nbuf = -(-n // 1024) * 1024
    inds = np.full((nbuf, 4), -1, np.int32)
    inds[:n] = coors
    return jnp.asarray(inds), shape, n


def main():
    assert jax.default_backend() != "cpu", "smoke lane needs the TPU"
    inds, shape, n = load_scan()
    print(f"scan slice: {n} voxels, grid {shape}", flush=True)
    rng = np.random.RandomState(0)
    nbuf = inds.shape[0]

    def make_x(c, dtype=jnp.bfloat16):
        f = np.zeros((nbuf, c), np.float32)
        f[:n] = rng.randn(n, c) * 0.3
        return spconv_tpu.SparseConvTensor(
            jnp.asarray(f, dtype), inds, shape, 1, keys_sorted=True)

    def assert_close(a, b, rel=2e-2):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        assert d < rel, f"rel-to-max diff {d:.3e}"

    def conv_pair(c, k, algo, dtype=jnp.bfloat16, **kw):
        x = make_x(c, dtype)
        m = spconv_tpu.SubMConv3d(c, k, 3, bias=False, dtype=dtype,
                                  key=jax.random.PRNGKey(1), **kw)
        y = jax.jit(lambda f: m.replace(algo=algo)(
            x.replace_feature(f)).features)(x.features)
        yr = jax.jit(lambda f: m.replace(algo="native")(
            x.replace_feature(f)).features)(x.features)
        assert_close(y, yr)

    # DG subm: narrow (channel-major) and wide (offset-major) gathers
    check("dg subm bf16 C=16", lambda: conv_pair(16, 16, "dg"))
    check("dg subm bf16 C=64 (offmode)", lambda: conv_pair(64, 64, "dg"))
    check("dg subm f32 C=32 (offmode)",
          lambda: conv_pair(32, 32, "dg", dtype=jnp.float32))
    check("sk subm bf16 C=64", lambda: conv_pair(64, 64, "sk"))

    # posmode reuse: two layers sharing an indice_key
    def posmode_case():
        from spconv_tpu.ops.pallas.dg_conv import DGData

        c = 32
        x = make_x(c)
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        m1 = spconv_tpu.SubMConv3d(c, c, 3, bias=False, indice_key="s0",
                                   dtype=jnp.bfloat16, key=k1, algo="dg")
        m2 = spconv_tpu.SubMConv3d(c, c, 3, bias=False, indice_key="s0",
                                   dtype=jnp.bfloat16, key=k2, algo="dg")

        def run(f, algo1, algo2):
            y = m1.replace(algo=algo1)(x.replace_feature(f))
            return m2.replace(algo=algo2)(y).features

        y = jax.jit(lambda f: run(f, "dg", "dg"))(x.features)
        yr = jax.jit(lambda f: run(f, "native", "native"))(x.features)
        assert_close(y, yr)

    check("dg posmode stage reuse C=32", posmode_case)

    # strided + inverse (rulebook reuse through the dg regular path)
    def strided_case():
        c = 32
        x = make_x(c)
        down = spconv_tpu.SparseConv3d(c, c, 3, stride=2, padding=1,
                                       bias=False, indice_key="d0",
                                       dtype=jnp.bfloat16,
                                       key=jax.random.PRNGKey(3))
        up = spconv_tpu.SparseInverseConv3d(c, c, 3, indice_key="d0",
                                            dtype=jnp.bfloat16,
                                            key=jax.random.PRNGKey(4))

        def run(f, algo):
            y = down.replace(algo=algo)(x.replace_feature(f))
            return up.replace(algo=algo)(y).features

        y = jax.jit(lambda f: run(f, "dg"))(x.features)
        yr = jax.jit(lambda f: run(f, "native"))(x.features)
        assert_close(y, yr)

    check("dg strided+inverse C=32", strided_case)

    # fused SK backward (training path) vs native grads
    def bwd_case():
        c = 64
        x = make_x(c)
        m = spconv_tpu.SubMConv3d(c, c, 3, bias=False,
                                  dtype=jnp.bfloat16,
                                  key=jax.random.PRNGKey(5))

        def loss(algo):
            def f(w, ff):
                m2 = m.replace(algo=algo, weight=w)
                o = m2(x.replace_feature(ff))
                return jnp.sum(o.features.astype(jnp.float32) ** 2)
            return f

        gw, gf = jax.jit(jax.grad(loss("sk"), argnums=(0, 1)))(
            m.weight, x.features)
        gwr, gfr = jax.jit(jax.grad(loss("native"), argnums=(0, 1)))(
            m.weight, x.features)
        assert_close(gw, gwr, rel=3e-2)
        assert_close(gf, gfr, rel=3e-2)

    check("sk fused bwd C=64", bwd_case)

    # int8 quad-packed kernels (narrow + offmode widths), fused epilogue
    def int8_case(c):
        from spconv_tpu.ops import coords as CO
        from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv_q
        from spconv_tpu.quantization.quantize import _int8_gather_mm
        from spconv_tpu.ops.rulebook import build_subm_rulebook

        keys, _ = CO.linearize(inds, shape, 1)
        fi8 = np.zeros((nbuf, c), np.int8)
        fi8[:n] = rng.randint(-90, 90, (n, c))
        fi8 = jnp.asarray(fi8)
        wi8 = jnp.asarray(rng.randint(-60, 60, (c, 3, 3, 3, c)), jnp.int8)
        scale = jnp.asarray(rng.uniform(0.001, 0.01, (c,)), jnp.float32)
        out = jax.jit(lambda f: dg_subm_conv_q(
            f, keys, wi8, scale, None, spatial_shape=tuple(shape),
            batch_size=1, dilation=(1, 1, 1), act="relu",
            out_dtype=jnp.int8))(fi8)
        data = build_subm_rulebook(inds, spatial_shape=shape,
                                   batch_size=1, ksize=(3, 3, 3),
                                   dilation=(1, 1, 1))
        wkv = jnp.transpose(wi8.reshape(c, 27, c), (1, 2, 0))
        acc = jax.jit(lambda f: _int8_gather_mm(f, wkv, data.pair_fwd,
                                                13))(fi8)
        y = jnp.maximum(np.asarray(acc, np.float32)
                        * np.asarray(scale)[None, :], 0.0)
        ref = np.clip(np.round(y), -127, 127).astype(np.int8)
        valid = np.asarray(inds[:, 0] >= 0)
        mism = (np.asarray(out)[valid] != ref[valid]).mean()
        assert mism < 1e-4, f"int8 mismatch rate {mism}"

    check("dg int8 C=32", lambda: int8_case(32))
    check("dg int8 C=128 (offmode)", lambda: int8_case(128))

    # fused sorted-key max pool
    def pool_case():
        c = 32
        x = make_x(c)
        p = spconv_tpu.SparseMaxPool3d(2, 2, out_bound=nbuf)
        y = jax.jit(lambda f: p(x.replace_feature(f)).features)(x.features)
        assert np.isfinite(np.asarray(y, np.float32)).all()

    check("sk max pool", pool_case)

    print(f"\n{'ALL GREEN' if not FAILS else f'FAILURES: {FAILS}'}",
          flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
