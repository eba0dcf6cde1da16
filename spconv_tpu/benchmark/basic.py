"""Benchmark network — topology parity with the reference's
``spconv/benchmark/basic.py::Net``: 14 SubMConv3d (3→64→64→96→96→128→128→
160→160→192→192→224→224→256→256, bias=False, paired layers sharing an
``indice_key``) interleaved with 6 SparseMaxPool3d(2, 2).  Input: the
120k-voxel real LiDAR scan (``test/data/test_spconv.pkl``) on a
``[80, 1600, 1600]`` grid; "large" = the same scan's point cloud shifted
and re-voxelized 8× (~900k voxels), matching ``benchmark/core.py:42-60``.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import spconv_tpu
import spconv_tpu.utils
from spconv_tpu import SparseConvTensor

REF_DATA = Path("/root/reference/test/data")

# Active-voxel counts per stage for the basic scan, measured once; buffer
# buckets are the counts rounded up with margin (the reference's
# deployment-mode static sizing, docs/TENSORRT_INT8_GUIDE.md).
_CHANNELS = [(3, 64), (64, 64), (64, 96), (96, 96), (96, 128), (128, 128),
             (128, 160), (160, 160), (160, 192), (192, 192), (224, 224),
             (224, 256)]


def _round_bucket(n: int, mult: int = 1024) -> int:
    return max(mult, -(-n // mult) * mult)


class BenchNet(spconv_tpu.Module):
    """The reference benchmark net with per-stage static buffer buckets."""

    def __init__(self, shape: Sequence[int], dtype=jnp.float32,
                 pool_bounds: Optional[List[int]] = None,
                 algo: Optional[str] = None,
                 key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(key, 16)
        chans = [3, 64, 64, 96, 96, 128, 128, 160, 160, 192, 192, 224, 224,
                 256, 256]
        self.shape = tuple(int(s) for s in shape)
        self.algo = algo
        convs = []
        for i in range(14):
            convs.append(
                spconv_tpu.SubMConv3d(
                    chans[i], chans[i + 1], 3, bias=False,
                    indice_key=f"c{i // 2}", dtype=dtype, key=ks[i],
                    algo=algo,
                )
            )
        self.convs = convs
        self.pool_bounds = tuple(pool_bounds) if pool_bounds else None
        pools = []
        for i in range(6):
            ob = self.pool_bounds[i] if self.pool_bounds else None
            pools.append(
                spconv_tpu.SparseMaxPool3d(2, 2, out_bound=ob,
                                           out_bound_ratio=1.0)
            )
        self.pools = pools

    def __call__(self, x: SparseConvTensor,
                 training: bool = False) -> SparseConvTensor:
        c, p = self.convs, self.pools
        for stage in range(6):
            x = c[2 * stage](x, training=training)
            x = c[2 * stage + 1](x, training=training)
            x = p[stage](x)
        x = c[12](x, training=training)
        x = c[13](x, training=training)
        return x


def load_basic_data():
    with (REF_DATA / "test_spconv.pkl").open("rb") as f:
        voxels, coors, spatial_shape = pickle.load(f)
    return voxels, coors, spatial_shape


def load_large_data():
    """8× replicated scan voxelized at 0.1 m (parity:
    ``benchmark/core.py:42-60``).  The voxelization result is cached on
    disk: an eager PointToVoxel pass through the device tunnel costs
    minutes of dispatch latency and the input is deterministic."""
    # cache key = voxelizer params + source file size/mtime, so any change
    # to PointToVoxel config or the reference point cloud invalidates the
    # cache instead of silently masking it (ADVICE r4 low); files are
    # gitignored (.bench_cache_large*.npz)
    import hashlib

    vox_params = ("v2", (0.1, 0.1, 0.1), (-80, -80, -2, 80, 80, 6), 3,
                  1600000, 1, 8)
    src = REF_DATA / "benchmark-pc.npz"
    st = src.stat()
    tag = hashlib.sha1(
        repr((vox_params, st.st_size, int(st.st_mtime))).encode()
    ).hexdigest()[:10]
    cache = (Path(__file__).resolve().parents[2]
             / f".bench_cache_large.{tag}.npz")
    if cache.exists():
        z = np.load(str(cache))
        return z["voxels"], z["coors"], list(z["shape"])
    pc = np.load(str(src))["pc"]
    pcs = [pc]
    for i in range(7):
        pc2 = pc.copy()
        pc2[:, 1] += i + 1
        pcs.append(pc2)
    pc = np.concatenate(pcs)
    gen = spconv_tpu.utils.PointToVoxel(
        [0.1, 0.1, 0.1], [-80, -80, -2, 80, 80, 6], 3, 1600000, 1)
    voxels, coords, _num, _vid, nv = gen.generate_voxel_with_id(pc)
    nv = int(nv)
    voxels = np.asarray(voxels).reshape(-1, 3)[:nv]
    coords = np.asarray(coords)[:nv]
    coors = np.concatenate(
        [np.zeros((nv, 1), np.int32), coords], axis=1)
    np.savez_compressed(str(cache), voxels=np.asarray(voxels),
                        coors=coors, shape=np.asarray(gen.grid_size))
    return voxels, coors, list(gen.grid_size)


def make_bench_input(voxels, coors, spatial_shape, dtype=jnp.float32,
                     bucket: int = 1024):
    n = voxels.shape[0]
    nbuf = _round_bucket(n, bucket)
    # key-sort rows on ingestion (PointToVoxel output order): pair maps
    # become monotone, which measurably improves gather locality
    shape = [int(s) for s in spatial_shape]
    key = coors[:, 0].astype(np.int64)
    for i, s in enumerate(shape):
        key = key * s + coors[:, i + 1]
    order = np.argsort(key, kind="stable")
    voxels, coors = voxels[order], coors[order]
    feats = np.zeros((nbuf, voxels.shape[1]), np.float32)
    feats[:n] = voxels
    inds = np.full((nbuf, 4), -1, np.int32)
    inds[:n] = coors
    return SparseConvTensor(
        jnp.asarray(feats, dtype=dtype), jnp.asarray(inds), spatial_shape, 1,
        keys_sorted=True,
    )


def measure_pool_bounds(shape, x: SparseConvTensor) -> List[int]:
    """One eager pass to size per-stage buffers (reference parity:
    record_voxel_count / get_max_num_voxels deployment sizing)."""
    net = BenchNet(shape)
    bounds = []
    c, p = net.convs, net.pools
    for stage in range(6):
        x = c[2 * stage](x)
        x = c[2 * stage + 1](x)
        x = p[stage](x)
        n_act = int(jnp.sum((x.indices[:, 0] >= 0).astype(jnp.int32)))
        bounds.append(_round_bucket(int(n_act * 1.05), 512))
        # shrink the buffer for the next stage
        feats = x.features[: _round_bucket(int(n_act * 1.05), 512)]
        inds = x.indices[: _round_bucket(int(n_act * 1.05), 512)]
        x = SparseConvTensor(feats, inds, x.spatial_shape, x.batch_size)
    return bounds
