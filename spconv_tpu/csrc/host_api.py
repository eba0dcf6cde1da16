"""Python API over the native host library (numpy in/out).

These mirror the XLA rulebook/voxelizer exactly and serve as the
hardware-free reference backend (role parity: spconv's CPU wheel used in
its CI, SURVEY.md §4) and as host-side preprocessing for input pipelines.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from . import get_lib

__all__ = [
    "generate_subm_pairs_host",
    "generate_conv_pairs_host",
    "point_to_voxel_host",
    "gather_host",
    "scatter_add_host",
    "indice_conv_host",
]


def generate_subm_pairs_host(indices: np.ndarray, spatial_shape, ksize,
                             dilation) -> Tuple[np.ndarray, np.ndarray, int]:
    indices = np.ascontiguousarray(indices, np.int32)
    n, nd1 = indices.shape
    ndim = nd1 - 1
    kv = int(np.prod(ksize))
    pf = np.empty((kv, n), np.int32)
    pb = np.empty((kv, n), np.int32)
    n_act = get_lib().spconv_generate_subm_pairs(
        indices, n, ndim,
        np.ascontiguousarray(spatial_shape, np.int32),
        np.ascontiguousarray(ksize, np.int32),
        np.ascontiguousarray(dilation, np.int32), pf, pb)
    return pf, pb, int(n_act)


def generate_conv_pairs_host(indices: np.ndarray, spatial_shape, out_shape,
                             ksize, stride, padding, dilation,
                             transposed=False, out_cap: Optional[int] = None):
    indices = np.ascontiguousarray(indices, np.int32)
    n, nd1 = indices.shape
    ndim = nd1 - 1
    kv = int(np.prod(ksize))
    if out_cap is None:
        out_cap = n * kv
    pf = np.empty((kv, out_cap), np.int32)
    pb = np.empty((kv, n), np.int32)
    oi = np.empty((out_cap, ndim + 1), np.int32)
    n_out = get_lib().spconv_generate_conv_pairs(
        indices, n, ndim,
        np.ascontiguousarray(spatial_shape, np.int32),
        np.ascontiguousarray(out_shape, np.int32),
        np.ascontiguousarray(ksize, np.int32),
        np.ascontiguousarray(stride, np.int32),
        np.ascontiguousarray(padding, np.int32),
        np.ascontiguousarray(dilation, np.int32),
        int(transposed), out_cap, pf, pb, oi)
    return pf, pb, oi, int(n_out)


def point_to_voxel_host(pc: np.ndarray, vsize_xyz, coors_range_xyz,
                        max_voxels: int, max_points_per_voxel: int):
    pc = np.ascontiguousarray(pc, np.float32)
    n, c = pc.shape
    ndim = len(vsize_xyz)
    voxels = np.empty((max_voxels, max_points_per_voxel, c), np.float32)
    coords = np.empty((max_voxels, ndim), np.int32)
    npv = np.empty((max_voxels,), np.int32)
    pvid = np.empty((n,), np.int32)
    nv = get_lib().spconv_point_to_voxel(
        pc, n, c, ndim,
        np.ascontiguousarray(vsize_xyz, np.float32),
        np.ascontiguousarray(coors_range_xyz, np.float32),
        max_voxels, max_points_per_voxel, voxels, coords, npv, pvid)
    return voxels, coords, npv, pvid, int(nv)


def gather_host(features: np.ndarray, inds: np.ndarray) -> np.ndarray:
    features = np.ascontiguousarray(features, np.float32)
    inds = np.ascontiguousarray(inds, np.int32)
    out = np.empty((inds.shape[0], features.shape[1]), np.float32)
    get_lib().spconv_gather(features, inds, inds.shape[0],
                            features.shape[1], out)
    return out


def scatter_add_host(buffer: np.ndarray, inds: np.ndarray,
                     out: np.ndarray) -> np.ndarray:
    buffer = np.ascontiguousarray(buffer, np.float32)
    inds = np.ascontiguousarray(inds, np.int32)
    assert out.flags["C_CONTIGUOUS"] and out.dtype == np.float32
    get_lib().spconv_scatter_add(buffer, inds, inds.shape[0],
                                 buffer.shape[1], out)
    return out


def indice_conv_host(features: np.ndarray, weight_krsc: np.ndarray,
                     pair_fwd: np.ndarray) -> np.ndarray:
    """Full CPU sparse conv: per-offset gather → sgemm → accumulate
    (reference CPU Native path, ``ops.py:971-986`` + GatherCPU)."""
    kv = pair_fwd.shape[0]
    k_out = weight_krsc.shape[0]
    c_in = weight_krsc.shape[-1]
    w = weight_krsc.reshape(k_out, kv, c_in)
    out = np.zeros((pair_fwd.shape[1], k_out), np.float32)
    for k in range(kv):
        g = gather_host(features, pair_fwd[k])
        out += g @ w[:, k, :].T
    return out
