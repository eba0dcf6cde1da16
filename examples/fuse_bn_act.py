"""BN + activation fusion for inference (parity: ``example/fuse_bn_act.py``)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.quantization import fuse_bn_act_in_sequential


def main():
    rng = np.random.RandomState(0)
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 16, 3, bias=False, indice_key="c1"),
        spconv_tpu.BatchNorm1d(16),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SubMConv3d(16, 16, 3, bias=True, indice_key="c1"),
    )
    # pretend-trained BN stats
    bn = net.layers[1].replace(
        running_mean=jnp.asarray(rng.randn(16).astype(np.float32)) * 0.1,
        running_var=jnp.asarray(rng.uniform(0.5, 2, 16).astype(np.float32)))
    net = spconv_tpu.SparseSequential(net.layers[0], bn, *net.layers[2:])

    fused = fuse_bn_act_in_sequential(net)
    print(f"layers: {len(net.layers)} -> {len(fused.layers)} "
          f"(conv act_type={fused.layers[0].act_type})")

    # verify equivalence
    n, nbuf = 150, 256
    flat = rng.choice(9 * 10 * 11, n, replace=False)
    coords = np.stack(np.unravel_index(flat, (9, 10, 11)), -1)
    inds = np.full((nbuf, 4), -1, np.int32)
    inds[:n, 0] = 0
    inds[:n, 1:] = coords
    feats = np.zeros((nbuf, 4), np.float32)
    feats[:n] = rng.randn(n, 4)
    x = SparseConvTensor(jnp.asarray(feats), jnp.asarray(inds), (9, 10, 11), 1)
    d = np.abs(np.asarray(net(x).features) - np.asarray(fused(x).features))
    print(f"max abs diff fused vs unfused: {d.max():.2e}")


if __name__ == "__main__":
    main()
