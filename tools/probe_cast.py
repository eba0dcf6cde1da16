"""Bisect Mosaic support for the one-hot compare formulations the
sorted-key kernel needs: [T]->[T,1] 2-D compare vs 3-D broadcast."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, WR = 256, 8
W = WR * 128


def run(name, kern, extra_scratch=()):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(1,),
        in_specs=[
            pl.BlockSpec((1, T), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WR, 128), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 64), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 64), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=list(extra_scratch))
    f = pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, 64), jnp.float32))
    kt = jnp.arange(T, dtype=jnp.int32).reshape(1, T) * 3
    wk = (jnp.arange(W, dtype=jnp.int32).reshape(WR, 128) // 2) * 2
    feat = jnp.asarray(np.random.RandomState(0).randn(W, 64), jnp.float32)
    try:
        out = jax.jit(f)(kt, wk, feat)
        out.block_until_ready()
        # numpy check
        ktn, wkn, fn = map(np.asarray, (kt, wk, feat))
        oh = (ktn[0][:, None] == wkn.reshape(-1)[None, :])
        ref = oh.astype(np.float32) @ fn
        d = float(np.max(np.abs(np.asarray(out) - ref)))
        print(f"{name}: OK maxdiff {d:.2e}", flush=True)
    except Exception as e:
        msg = str(e)
        i = msg.find("Mosaic")
        print(f"{name}: FAIL {msg[i:i+300] if i>=0 else msg[:300]}",
              flush=True)


def k_2d(kt_ref, wk_ref, f_ref, out_ref):
    probe = kt_ref[0]          # [T] 1-D
    p2 = probe[:, None]        # [T,1]
    rows = [p2 == wk_ref[r][None, :] for r in range(WR)]
    oh = jnp.concatenate(rows, axis=1)  # [T, W]
    out_ref[:] = jnp.dot(oh.astype(jnp.float32), f_ref[:],
                         preferred_element_type=jnp.float32)


def k_3d(kt_ref, wk_ref, f_ref, out_ref):
    probe = kt_ref[0]
    oh = (probe[:, None, None] == wk_ref[:][None, :, :]).reshape(T, W)
    out_ref[:] = jnp.dot(oh.astype(jnp.float32), f_ref[:],
                         preferred_element_type=jnp.float32)


def k_2d_bcast(kt_ref, wk_ref, f_ref, out_ref):
    probe = kt_ref[0]
    p2 = jax.lax.broadcast_in_dim(probe, (T, 128), (0,))  # [T,128]
    rows = [p2 == wk_ref[r][None, :] for r in range(WR)]
    oh = jnp.concatenate(rows, axis=1)
    out_ref[:] = jnp.dot(oh.astype(jnp.float32), f_ref[:],
                         preferred_element_type=jnp.float32)


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "2d"):
    run("2d", k_2d)
if which in ("all", "bcast"):
    run("2d_bcast", k_2d_bcast)
if which in ("all", "3d"):
    run("3d", k_3d)
