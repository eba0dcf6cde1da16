"""Data-parallel training example (parity: ``test/fake_dist_train.py`` —
the reference's Horovod-based distributed smoke test, runnable on one
process).  Here DP is native: shard_map over a device mesh, psum'd
gradients, SyncBN — run with any device count (defaults to a virtual
8-device CPU mesh when no multi-chip platform is present).

Usage: python examples/dist_train.py [--steps 5]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu.core import SparseConvTensor
    from spconv_tpu.parallel import (
        data_parallel_value_and_grad, make_mesh, stack_sparse_batch)

    n_dev = jax.device_count()
    mesh = make_mesh(n_dev)
    print(f"devices: {n_dev}")

    shape = (12, 14, 14)

    def make_scan(seed, nbuf=256):
        rng = np.random.RandomState(seed)
        vol = int(np.prod(shape))
        flat = rng.choice(vol, 120, replace=False)
        coords = np.stack(np.unravel_index(flat, shape), -1)
        inds = np.full((nbuf, 4), -1, np.int32)
        inds[:120, 0] = 0
        inds[:120, 1:] = coords
        feats = np.zeros((nbuf, 4), np.float32)
        feats[:120] = rng.randn(120, 4)
        return SparseConvTensor(jnp.asarray(feats), jnp.asarray(inds), shape, 1)

    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 16, 3, indice_key="c1"),
        spconv_tpu.SparseSyncBatchNorm(16, axis_name="dp"),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SparseConv3d(16, 32, 3, stride=2, padding=1),
    )

    def loss_fn(m, f, i):
        x = SparseConvTensor(f, i, shape, 1)
        out = m(x)
        pooled = spconv_tpu.SparseGlobalAvgPool()(out)
        return jnp.mean(pooled ** 2)

    step = jax.jit(data_parallel_value_and_grad(loss_fn, mesh))
    lr = 0.05
    for s in range(args.steps):
        scans = [make_scan(s * n_dev + d) for d in range(n_dev)]
        feats, inds = stack_sparse_batch(scans)
        loss, grads = step(net, feats, inds)
        dyn, sta = spconv_tpu.partition(
            net, lambda v: spconv_tpu.module._is_inexact(v))
        dyn = jax.tree_util.tree_map(
            lambda p, g: p - lr * g if g is not None else p, dyn, grads,
            is_leaf=lambda v: v is None)
        net = spconv_tpu.combine(dyn, sta)
        print(f"step {s}: loss {float(loss):.5f}")


if __name__ == "__main__":
    main()
