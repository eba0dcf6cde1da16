"""Which HBM->VMEM DMA row-start granularities does Mosaic accept?
Tests bf16 [N,128] and int32 [N,128] slices at dynamic starts that are
multiples of 8/16/128 rows."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
ROWS = 64


def make(dt, mult):
    def kern(s_ref, x_hbm, o_ref, buf, sem):
        st = pl.multiple_of(s_ref[0], mult)
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(st, ROWS), :], buf, sem)
        cp.start()
        cp.wait()
        o_ref[:] = buf[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((ROWS, 128), lambda t, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS, 128), dt),
                        pltpu.SemaphoreType.DMA])
    return pl.pallas_call(
        gs and kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), dt))


for dt, name in [(jnp.bfloat16, "bf16"), (jnp.int32, "int32"),
                 (jnp.float32, "f32")]:
    x = jnp.asarray(
        np.arange(N * 128).reshape(N, 128) % 977, dt)
    for mult in (128, 32, 16, 8, 1):
        try:
            f = make(dt, mult)
            start = mult * 3
            out = jax.jit(f)(jnp.array([start], jnp.int32), x)
            ok = np.allclose(np.asarray(out, np.float32),
                             np.asarray(x[start:start + ROWS], np.float32))
            print(f"{name} mult={mult}: {'OK' if ok else 'WRONG-DATA'}",
                  flush=True)
        except Exception as e:
            msg = str(e)
            i = msg.find("Mosaic")
            print(f"{name} mult={mult}: FAIL {msg[i:i+160] if i>=0 else msg[:160]}",
                  flush=True)
