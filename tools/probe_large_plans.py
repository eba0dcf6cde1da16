#!/usr/bin/env python
"""Plan statistics for the bench_large (900k-voxel) net — diagnoses the
round-3 large-scan regression without touching the TPU: for each stage's
active-site set, build the DG window plans and report window counts
(nw>1 → serial in-kernel sweeps) and tile counts.

Run: JAX_PLATFORMS=cpu python tools/probe_large_plans.py [basic|large]
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def pool_coords(coords, shape):
    """Factor-2 max-pool active sites (batch col preserved)."""
    c2 = coords.copy()
    c2[:, 1:] = coords[:, 1:] // 2
    shape2 = [(s + 1) // 2 for s in shape]
    key = c2[:, 0].astype(np.int64)
    for a, s in enumerate(shape2):
        key = key * s + c2[:, a + 1]
    _, idx = np.unique(key, return_index=True)
    return c2[np.sort(idx)], shape2


def stage_stats(coords, shape, window=384, tile=128):
    from spconv_tpu.ops.pallas import sorted_conv as SK

    key = coords[:, 0].astype(np.int64)
    for a, s in enumerate(shape):
        key = key * s + coords[:, a + 1]
    key = np.sort(key)
    sent = int(np.prod(shape))
    keys = jnp.asarray(key, jnp.int32) if sent < 2**31 else jnp.asarray(key)
    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3), include_center=True)
    np_t, n_pad = SK._n_pad_for(len(key), tile, window)
    plans = SK.build_sk_plans(
        SK._pad_rows(keys, np_t, sent), sent, deltas_np, groups,
        tile=tile, window=window, n_pad=n_pad, align=128)
    plan = plans[0]
    nw = np.asarray(plan.nw)  # [P, n_tiles]
    n_tiles = nw.shape[1]
    frac_multi = float((nw > 1).any(axis=0).mean())
    extra = int(np.maximum(nw - 1, 0).sum())
    print(f"  n={len(key):7d} tiles={n_tiles:5d} "
          f"nw max={int(nw.max())} mean={nw.mean():.2f} "
          f"tiles-with-sweeps={frac_multi:.1%} extra-windows={extra}")
    # reach: how many key rows a tile's plane windows actually span
    ws = np.asarray(plan.ws)
    span = ws.max(axis=0) - ws.min(axis=0)
    print(f"  plane-window start spread: mean={span.mean():.0f} "
          f"p99={np.percentile(span, 99):.0f} max={span.max()}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "large"
    from spconv_tpu.benchmark.basic import load_basic_data, load_large_data

    if which == "large":
        voxels, coors, spatial_shape = load_large_data()
    else:
        voxels, coors, spatial_shape = load_basic_data()
    coords = np.asarray(coors)
    shape = [int(s) for s in spatial_shape]
    print(f"{which}: {len(coords)} voxels, grid {shape}")
    for stage in range(7):
        print(f"stage {stage} (grid {shape}):")
        for w in (384, 768):
            print(f" window={w}:")
            stage_stats(coords, shape, window=w)
        if stage < 6:
            coords, shape = pool_coords(coords, shape)


if __name__ == "__main__":
    main()
