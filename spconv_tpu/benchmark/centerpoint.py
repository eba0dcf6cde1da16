"""CenterPoint-backbone benchmark — the BASELINE.json north-star config:
nuScenes-style sparse encoder forward, bf16, one scan per step.

Voxelizes the real LiDAR scan (``benchmark-pc.npz``) at 0.1 m over a
[-51.2, 51.2]² × [-5, 3] range → grid [80, 1024, 1024], runs
``models.centerpoint_encoder`` (inference mode, BN folded out via
``bn=False`` weights) to the dense BEV map.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.calibrate import calibrate_out_bounds
from spconv_tpu.models import centerpoint_encoder
from spconv_tpu.utils import PointToVoxel

REF_PC = Path("/root/reference/test/data/benchmark-pc.npz")


def load_centerpoint_input(dtype=jnp.bfloat16, bucket=1024, batch=1):
    """The north-star input scan; ``batch`` > 1 replicates it across batch
    indices (batch-major rows keep the key-sorted invariant) for ms/scan
    throughput measurement."""
    # cache keyed on voxelizer params + source stat so config/data changes
    # invalidate it (ADVICE r4 low); gitignored
    import hashlib

    vox_params = ("v2", (0.1, 0.1, 0.1), (-51.2, -51.2, -5, 51.2, 51.2, 3),
                  3, 200000, 1)
    st = REF_PC.stat()
    tag = hashlib.sha1(
        repr((vox_params, st.st_size, int(st.st_mtime))).encode()
    ).hexdigest()[:10]
    cache = (Path(__file__).resolve().parents[2]
             / f".bench_cache_cp.{tag}.npz")
    if cache.exists():
        z = np.load(str(cache))
        feats, coords, grid = z["feats"], z["coords"], tuple(z["shape"])
        nv = feats.shape[0]
    else:
        pc = np.load(str(REF_PC))["pc"].astype(np.float32)
        gen = PointToVoxel([0.1, 0.1, 0.1],
                           [-51.2, -51.2, -5, 51.2, 51.2, 3], 3, 200000, 1)
        voxels, coords, npv, _vid, nv = gen.generate_voxel_with_id(pc)
        nv = int(nv)
        feats = np.asarray(voxels).reshape(-1, 3)[:nv]
        coords = np.asarray(coords)[:nv]
        grid = tuple(gen.grid_size)
        np.savez_compressed(str(cache), feats=feats, coords=coords,
                            shape=np.asarray(grid))
    nbuf = max(bucket, -(-(nv * batch) // bucket) * bucket)
    fp = np.zeros((nbuf, 5), np.float32)
    ip = np.full((nbuf, 4), -1, np.int32)
    for b in range(batch):
        fp[b * nv:(b + 1) * nv, :3] = feats
        fp[b * nv:(b + 1) * nv, 3] = 1.0  # intensity placeholder
        fp[b * nv:(b + 1) * nv, 4] = 0.0  # timestamp (nuScenes 5-feature)
        ip[b * nv:(b + 1) * nv, 0] = b
        ip[b * nv:(b + 1) * nv, 1:] = coords
    shape = tuple(int(s) for s in grid)
    # PointToVoxel assigns voxel ids in linearized-key order, so rows are
    # key-sorted with the invalid tail at the end
    return SparseConvTensor(jnp.asarray(fp, dtype=dtype), jnp.asarray(ip),
                            shape, batch, keys_sorted=True), nv * batch


def build_calibrated_encoder(x: SparseConvTensor, dtype=jnp.bfloat16,
                             algo=None, bounds=None):
    """CenterPoint encoder with deployment-calibrated buffer bounds.

    ``bounds`` (from :func:`spconv_tpu.calibrate.export_out_bounds`)
    skips the eager calibration pass — essential when the device sits
    behind a high-latency tunnel where per-op dispatch costs ~40 ms
    (the bench caches bounds on disk via ``tools/bench_calib.py``)."""
    from spconv_tpu.calibrate import apply_out_bounds

    net32 = centerpoint_encoder(in_channels=5, bn=False, dtype=jnp.float32,
                                algo=algo)
    if bounds is not None:
        net32 = apply_out_bounds(net32, bounds)
    else:
        x32 = x.replace_feature(x.features.astype(jnp.float32))
        net32 = calibrate_out_bounds(net32, lambda m, t: m.bev(t), [x32],
                                     margin=1.15, mult=512)
    # rebuild in bf16 with the calibrated bounds
    net16 = jax.tree_util.tree_map(
        lambda v: v.astype(dtype)
        if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
        else v,
        net32,
    )
    return net16
