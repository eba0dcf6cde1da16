"""Voxelization example (parity: ``example/voxel_gen.py``): raw point
cloud → PointToVoxel → SparseConvTensor → one SubMConv3d block
(BASELINE config 2)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.utils import PointToVoxel, gather_features_by_pc_voxel_id


def main():
    rng = np.random.RandomState(0)
    pc = rng.uniform(-10, 10, size=(20000, 4)).astype(np.float32)
    pc[:, 2] = rng.uniform(-2, 2, 20000)

    gen = PointToVoxel(
        vsize_xyz=[0.25, 0.25, 0.25],
        coors_range_xyz=[-10, -10, -2, 10, 10, 2],
        num_point_features=4,
        max_num_voxels=20000,
        max_num_points_per_voxel=5,
    )
    voxels, coords, num_per_voxel, pc_voxel_id, num_voxels = \
        gen.generate_voxel_with_id(pc, empty_mean=True)
    print(f"voxels: {voxels.shape}, active: {int(num_voxels)}")

    # mean-pool points per voxel → features
    feats = jnp.sum(voxels, axis=1) / jnp.maximum(
        num_per_voxel[:, None], 1).astype(voxels.dtype)
    # prefix batch index 0 (coords are ZYX, invalid rows stay −1)
    inds = jnp.concatenate(
        [jnp.where(coords[:, :1] >= 0, 0, -1), coords], axis=1)
    feats = jnp.where((inds[:, 0] >= 0)[:, None], feats, 0)

    x = SparseConvTensor(feats, inds, gen.grid_size, 1)
    conv = spconv_tpu.SubMConv3d(4, 16, 3, indice_key="c1",
                                 key=jax.random.PRNGKey(0))
    y = jax.jit(lambda m, t: m(t).features)(conv, x)
    print("conv out:", y.shape)

    # map per-voxel results back to points (segmentation-style)
    per_point = gather_features_by_pc_voxel_id(y, pc_voxel_id)
    print("per-point features:", per_point.shape)


if __name__ == "__main__":
    main()
