"""Mosaic int8 capability probe: (a) DMA row-start granularity for int8
tables, (b) int8 x int8 -> int32 MXU matmul, (c) one-hot(int8) gather
matmul — the building blocks of an int8 sorted-key conv kernel."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, ROWS = 4096, 64


def probe_dma(mult):
    def kern(s_ref, x_hbm, o_ref, buf, sem):
        st = pl.multiple_of(s_ref[0], mult)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(st, ROWS), :], buf, sem)
        cp.start()
        cp.wait()
        o_ref[:] = buf[:].astype(jnp.int32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.int8),
                        pltpu.SemaphoreType.DMA])
    f = pl.pallas_call(gs and kern, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((ROWS, 128),
                                                      jnp.int32))
    x = jnp.asarray(np.arange(N * 128).reshape(N, 128) % 117 - 58, jnp.int8)
    try:
        st = mult * 3
        out = jax.jit(f)(jnp.array([st], jnp.int32), x)
        ok = np.array_equal(np.asarray(out),
                            np.asarray(x[st:st + ROWS], np.int32))
        print(f"int8 dma mult={mult}: {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        m = str(e); i = m.find("Mosaic")
        print(f"int8 dma mult={mult}: FAIL {m[i:i+160] if i>=0 else m[:160]}",
              flush=True)


def probe_matmul():
    T, W, C = 128, 256, 128

    def kern(kt_ref, wk_ref, f_ref, o_ref):
        probe = kt_ref[0]
        p2 = probe[:, None]
        oh = jnp.concatenate(
            [p2 == wk_ref[r][None, :] for r in range(W // 128)], axis=1)
        o_ref[:] = jnp.dot(oh.astype(jnp.int8), f_ref[:],
                           preferred_element_type=jnp.int32)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(1,),
        in_specs=[
            pl.BlockSpec((1, T), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W // 128, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, C), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, C), lambda t: (0, 0),
                               memory_space=pltpu.VMEM))
    f = pl.pallas_call(gs and kern, grid_spec=gs,
                       out_shape=jax.ShapeDtypeStruct((T, C), jnp.int32))
    rng = np.random.RandomState(0)
    kt = jnp.asarray((np.arange(T) * 3).reshape(1, T), jnp.int32)
    wk = jnp.asarray((np.arange(W) // 2 * 2).reshape(W // 128, 128),
                     jnp.int32)
    x = jnp.asarray(rng.randint(-127, 127, (W, C)), jnp.int8)
    try:
        out = jax.jit(f)(kt, wk, x)
        oh = (np.asarray(kt)[0][:, None]
              == np.asarray(wk).reshape(-1)[None, :])
        ref = oh.astype(np.int32) @ np.asarray(x, np.int32)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"int8 onehot matmul: {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        m = str(e); i = m.find("Mosaic")
        print(f"int8 onehot matmul: FAIL "
              f"{m[i:i+300] if i>=0 else m[:300]}", flush=True)


def probe_plain_matmul():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.int32)

    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((128, 256), lambda: (0, 0)),
                  pl.BlockSpec((256, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        grid=())
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randint(-127, 127, (128, 256)), jnp.int8)
    b = jnp.asarray(rng.randint(-127, 127, (256, 128)), jnp.int8)
    try:
        out = jax.jit(f)(a, b)
        ref = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
        ok = np.array_equal(np.asarray(out), ref)
        print(f"int8 plain matmul: {'OK' if ok else 'WRONG'}", flush=True)
    except Exception as e:
        m = str(e); i = m.find("Mosaic")
        print(f"int8 plain matmul: FAIL "
              f"{m[i:i+300] if i>=0 else m[:300]}", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mm"):
        probe_plain_matmul()
        probe_matmul()
    if which in ("all", "dma"):
        for m in (32, 8, 4, 1):
            probe_dma(m)
