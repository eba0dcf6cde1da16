"""Point-cloud voxelization (parity: ``spconv/csrc/sparse/pointops.py`` —
Point2Voxel hash-based GPU kernels + ``spconv/pytorch/utils.py``
PointToVoxel wrapper).

The reference inserts points into a GPU hash keyed by voxel coordinate
(``pointops.py:138-251``).  Here: quantize → linearize → stable sort →
segment boundaries → conflict-free scatter into the ``[M, maxpts, C]``
buffer.  Static shapes throughout (``max_num_voxels`` /
``max_num_points_per_voxel`` bounds are the reference's own API).

Coordinate convention matches the reference (``pointops.py:42-89``
``calc_meta_data``): user passes ``vsize_xyz`` / ``coors_range_xyz`` in
XYZ order; produced voxel coords are **ZYX** (reversed), ready to be
prefixed with a batch index for SparseConvTensor.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["point_to_voxel", "gather_features_by_pc_voxel_id"]


@partial(
    jax.jit,
    static_argnames=(
        "vsize_xyz",
        "coors_range_xyz",
        "max_num_voxels",
        "max_num_points_per_voxel",
        "empty_mean",
    ),
)
def point_to_voxel(
    pc: jax.Array,  # [N, 3+] xyz + extra features
    *,
    vsize_xyz: Tuple[float, ...],
    coors_range_xyz: Tuple[float, ...],  # (xmin, ymin, zmin, xmax, ymax, zmax)
    max_num_voxels: int,
    max_num_points_per_voxel: int,
    empty_mean: bool = False,
):
    """Returns (voxels [M, maxpts, C], coords [M, ndim] ZYX int32 (−1 pad),
    num_per_voxel [M] int32, pc_voxel_id [N] int32 (−1 for dropped points),
    num_voxels device scalar)."""
    ndim = len(vsize_xyz)
    n = pc.shape[0]
    c = pc.shape[1]
    vsize = jnp.asarray(vsize_xyz, jnp.float32)
    lower = jnp.asarray(coors_range_xyz[:ndim], jnp.float32)
    upper = jnp.asarray(coors_range_xyz[ndim:], jnp.float32)
    grid_xyz = np.round(
        (np.array(coors_range_xyz[ndim:]) - np.array(coors_range_xyz[:ndim]))
        / np.array(vsize_xyz)
    ).astype(np.int64)
    grid_zyx = tuple(int(g) for g in grid_xyz[::-1])

    xyz = pc[:, :ndim].astype(jnp.float32)
    vox_xyz = jnp.floor((xyz - lower) / vsize).astype(jnp.int32)
    in_range = jnp.all(
        (xyz >= lower) & (xyz < upper) & (vox_xyz >= 0)
        & (vox_xyz < jnp.asarray(grid_xyz, jnp.int32)),
        axis=-1,
    )
    vox_zyx = vox_xyz[:, ::-1]

    # linearize ZYX; huge grids get two-word int32 keys (the reference
    # switches to an int64 hash key the same way — a bare int64 here would
    # silently truncate under JAX's default x64-off config)
    from . import coords as C

    pseudo = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), vox_zyx], axis=-1
    )
    key, sentinel = C.linearize(pseudo, grid_zyx, 1, in_range)

    sk, order = C.sort_with_ids(key)  # stable → first-come point order
    not_sent = ~C.is_sentinel(sk, sentinel)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    vid_sorted = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_voxels_total = jnp.sum(is_first.astype(jnp.int32))

    # rank of each point within its voxel group
    pos = jnp.arange(n, dtype=jnp.int32)
    group_start = jnp.zeros((max_num_voxels + 1,), jnp.int32).at[
        jnp.where(is_first & (vid_sorted < max_num_voxels), vid_sorted,
                  max_num_voxels)
    ].set(pos, mode="drop")
    slot_sorted = pos - group_start[jnp.minimum(vid_sorted, max_num_voxels)]

    keep_voxel = (vid_sorted < max_num_voxels) & not_sent
    keep_point = keep_voxel & (slot_sorted < max_num_points_per_voxel)

    # per-original-point voxel id (−1 for dropped voxels / out of range)
    pc_voxel_id = jnp.full((n,), -1, jnp.int32).at[order].set(
        jnp.where(keep_voxel, vid_sorted, -1)
    )

    # scatter points into [M, maxpts, C]
    v_idx = jnp.where(keep_point, vid_sorted, max_num_voxels)
    s_idx = jnp.where(keep_point, slot_sorted, 0)
    voxels = jnp.zeros((max_num_voxels, max_num_points_per_voxel, c), pc.dtype)
    voxels = voxels.at[v_idx, s_idx].set(pc[order], mode="drop")

    # num_per_voxel (clamped to maxpts, parity with generate_voxel kernel)
    num_per_voxel = jnp.zeros((max_num_voxels + 1,), jnp.int32).at[
        jnp.where(keep_point, vid_sorted, max_num_voxels)
    ].add(1, mode="drop")[:max_num_voxels]

    # voxel coords: scatter first-point coords
    coords = jnp.full((max_num_voxels, ndim), -1, jnp.int32)
    coords = coords.at[
        jnp.where(is_first & keep_voxel, vid_sorted, max_num_voxels)
    ].set(vox_zyx[order], mode="drop")

    if empty_mean:
        cnt = jnp.maximum(num_per_voxel, 1)[:, None]
        mean = jnp.sum(voxels, axis=1) / cnt.astype(voxels.dtype)
        slot_ids = jnp.arange(max_num_points_per_voxel)[None, :, None]
        filled = slot_ids < num_per_voxel[:, None, None]
        voxels = jnp.where(filled, voxels, mean[:, None, :])

    num_voxels = jnp.minimum(num_voxels_total, max_num_voxels)
    return voxels, coords, num_per_voxel, pc_voxel_id, num_voxels


def gather_features_by_pc_voxel_id(
    seg_res_features: jax.Array,
    pc_voxel_id: jax.Array,
    invalid_value=0,
) -> jax.Array:
    """Map per-voxel results back to per-point (parity:
    ``pytorch/utils.py:160``)."""
    g = jnp.take(seg_res_features, jnp.maximum(pc_voxel_id, 0), axis=0)
    mask = (pc_voxel_id >= 0).reshape((-1,) + (1,) * (seg_res_features.ndim - 1))
    return jnp.where(mask, g, invalid_value)
