"""User-facing utilities (parity: ``spconv/pytorch/utils.py`` PointToVoxel
and ``spconv/utils/__init__.py`` Point2Voxel aliases)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.point2voxel import gather_features_by_pc_voxel_id, point_to_voxel

__all__ = [
    "PointToVoxel",
    "Point2VoxelCPU1d", "Point2VoxelCPU2d", "Point2VoxelCPU3d", "Point2VoxelCPU4d",
    "Point2VoxelGPU1d", "Point2VoxelGPU2d", "Point2VoxelGPU3d", "Point2VoxelGPU4d",
    "gather_features_by_pc_voxel_id",
]


class PointToVoxel:
    """Voxel generator (parity: ``spconv/pytorch/utils.py:23`` — same ctor
    signature minus the torch device; runs as one jitted XLA program).

    Returns static-size buffers plus a ``num_voxels`` device scalar; use
    ``num_voxels`` (or the −1 padding in ``coords``) instead of slicing so
    no host sync is forced.
    """

    def __init__(
        self,
        vsize_xyz: Sequence[float],
        coors_range_xyz: Sequence[float],
        num_point_features: int,
        max_num_voxels: int,
        max_num_points_per_voxel: int,
        device=None,  # accepted for API parity; unused
    ):
        self.ndim = len(vsize_xyz)
        self.vsize_xyz = tuple(float(v) for v in vsize_xyz)
        self.coors_range_xyz = tuple(float(v) for v in coors_range_xyz)
        self.num_point_features = num_point_features
        self.max_num_voxels = max_num_voxels
        self.max_num_points_per_voxel = max_num_points_per_voxel
        grid = np.round(
            (np.array(self.coors_range_xyz[self.ndim:])
             - np.array(self.coors_range_xyz[:self.ndim]))
            / np.array(self.vsize_xyz)
        ).astype(np.int64)
        self.grid_size = tuple(int(g) for g in grid[::-1])  # ZYX

    def __call__(self, pc, clear_voxels: bool = True, empty_mean: bool = False):
        v, c, n, _, _ = self.generate_voxel_with_id(pc, clear_voxels, empty_mean)
        return v, c, n

    def generate_voxel_with_id(
        self, pc, clear_voxels: bool = True, empty_mean: bool = False
    ):
        del clear_voxels  # buffers are freshly created each call (functional)
        return point_to_voxel(
            jnp.asarray(pc),
            vsize_xyz=self.vsize_xyz,
            coors_range_xyz=self.coors_range_xyz,
            max_num_voxels=self.max_num_voxels,
            max_num_points_per_voxel=self.max_num_points_per_voxel,
            empty_mean=empty_mean,
        )


# API-parity aliases (reference exposes per-ndim CPU/GPU classes in
# spconv/utils/__init__.py; one XLA implementation serves all)
Point2VoxelCPU1d = Point2VoxelCPU2d = Point2VoxelCPU3d = Point2VoxelCPU4d = PointToVoxel
Point2VoxelGPU1d = Point2VoxelGPU2d = Point2VoxelGPU3d = Point2VoxelGPU4d = PointToVoxel
