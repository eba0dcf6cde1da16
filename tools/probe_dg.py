"""Probe Mosaic capabilities needed by the dynamic-gather (DG) conv kernel.

Round-3 findings (v5e via axon tunnel, jax 0.9.0):
  * ``jnp.take_along_axis(x, idx, axis=1)`` (per-sublane dynamic LANE
    gather) lowers and runs for f32 — the "dynamic gather" unlock that
    round-1 DESIGN_NOTES called the single biggest one.  axis=0
    (sublane) and bf16 variants are REJECTED by the remote compiler
    (HTTP 500) — and a failed remote compile can wedge the tunnel for
    ~10 min, so this probe only exercises the supported forms.
  * Run each case in its own jit; print PASS/FAIL.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rs = np.random.RandomState(0)


def run(name, kernel, out_shape, *args):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            kernel, out_shape=out_shape)(*a))
        out = np.asarray(f(*args))
        print(f"{name}: ran, out[0,:4]={out.reshape(out.shape[0], -1)[0, :4]}")
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:160]}")
        return None


def main():
    print(jax.devices())

    # 1. f32 lane gather at several sublane counts
    for c in (8, 32, 64, 128):
        x = rs.rand(c, 128).astype(np.float32)
        idx = rs.randint(0, 128, (c, 128)).astype(np.int32)

        def k(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

        out = run(f"f32 lane gather C={c}", k,
                  jax.ShapeDtypeStruct((c, 128), jnp.float32), x, idx)
        if out is not None:
            assert np.allclose(out, np.take_along_axis(x, idx, 1)), c
            print(f"  C={c} values OK")

    # 2. int32 lane gather
    x = rs.randint(-2**30, 2**30, (16, 128)).astype(np.int32)
    idx = rs.randint(0, 128, (16, 128)).astype(np.int32)

    def ki(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    out = run("int32 lane gather", ki,
              jax.ShapeDtypeStruct((16, 128), jnp.int32), x, idx)
    if out is not None:
        assert np.array_equal(out, np.take_along_axis(x, idx, 1))
        print("  int32 values OK")

    # 3. lane reduction (rank counting) int32 [16,128] -> [16,1] bcast
    keys = np.sort(rs.randint(0, 10_000, (1, 128))).astype(np.int32)
    probes = rs.randint(0, 10_000, (16, 128)).astype(np.int32)

    def kr(k_ref, p_ref, o_ref):
        wk = k_ref[:]          # [1,128]
        lt = (wk < p_ref[:, :1]).astype(jnp.int32)  # bcast [16,128]? no
        o_ref[:] = jnp.sum(lt, axis=1, keepdims=True) * jnp.ones(
            (1, 128), jnp.int32)

    out = run("lane-reduce rank", kr,
              jax.ShapeDtypeStruct((16, 128), jnp.int32), keys, probes)
    if out is not None:
        want = (keys[0][None, :] < probes[:, :1]).sum(1, keepdims=True)
        assert np.array_equal(out[:, :1], want)
        print("  rank values OK")

    # 4. stack lane vectors into sublanes + static row extract + bcast
    def ks(x_ref, o_ref):
        v = x_ref[:]                       # [8, 128]
        rows = [v[i:i+1] * (i + 1) for i in range(8)]
        stk = jnp.concatenate(rows, axis=0)   # [8,128]
        r3 = stk[3:4]                      # static row extract [1,128]
        o_ref[:] = jnp.broadcast_to(r3, (8, 128)) + stk * 0

    x = rs.rand(8, 128).astype(np.float32)
    out = run("stack/extract/bcast", ks,
              jax.ShapeDtypeStruct((8, 128), jnp.float32), x)
    if out is not None:
        assert np.allclose(out, np.broadcast_to(x[3:4] * 4, (8, 128)))
        print("  stack/extract OK")

    # 5. deep GEMM [128,432]@[432,128] bf16 from f32 casts
    a = rs.rand(128, 432).astype(np.float32)
    b = rs.rand(432, 128).astype(np.float32)

    def kg(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:].astype(jnp.bfloat16),
                           b_ref[:].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    out = run("deep GEMM 432 bf16", kg,
              jax.ShapeDtypeStruct((128, 128), jnp.float32), a, b)
    if out is not None:
        assert np.allclose(out, a @ b, rtol=2e-2)
        print("  GEMM OK")

    # 6. [128,128] transpose in kernel
    def kt(a_ref, o_ref):
        o_ref[:] = jnp.transpose(a_ref[:], (1, 0))

    a = rs.rand(128, 128).astype(np.float32)
    out = run("transpose 128x128", kt,
              jax.ShapeDtypeStruct((128, 128), jnp.float32), a)
    if out is not None:
        assert np.allclose(out, a.T)
        print("  transpose OK")

    # 7. DMA: dynamic leading-dim slice of [nc, C, 128] HBM chunked table
    nc, c = 16, 16
    tab = rs.rand(nc, c, 128).astype(np.float32)

    def kd(s_ref, tab_hbm, o_ref, buf, sem):
        s = s_ref[0]
        pltpu.make_async_copy(
            tab_hbm.at[pl.ds(s, 3)], buf, sem).start()
        pltpu.make_async_copy(
            tab_hbm.at[pl.ds(0, 3)], buf, sem).wait()
        o_ref[:] = buf[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((c, 128), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, c, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    try:
        f = jax.jit(lambda s, t: pl.pallas_call(
            kd, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((c, 128), jnp.float32))(s, t))
        out = np.asarray(f(np.array([5], np.int32), tab))
        assert np.allclose(out, tab[6])
        print("chunked-table DMA: OK")
    except Exception as e:  # noqa: BLE001
        print(f"chunked-table DMA: FAIL {type(e).__name__} {str(e)[:200]}")


if __name__ == "__main__":
    main()
