"""PointToVoxel vs a brute-force python voxelizer (parity method: the
reference tests voxelization in example/voxel_gen.py on real data; here we
use randomized goldens)."""

import numpy as np
import jax.numpy as jnp

from spconv_tpu.utils import PointToVoxel, gather_features_by_pc_voxel_id


def brute_force_voxelize(pc, vsize, crange, max_vox, max_pts):
    ndim = len(vsize)
    lower = np.array(crange[:ndim])
    upper = np.array(crange[ndim:])
    grid = np.round((upper - lower) / np.array(vsize)).astype(np.int64)
    vox = {}
    order = []
    pc_vid = np.full(pc.shape[0], -1, np.int64)
    for i, p in enumerate(pc):
        xyz = p[:ndim]
        if np.any(xyz < lower) or np.any(xyz >= upper):
            continue
        vc = np.floor((xyz - lower) / vsize).astype(np.int64)
        if np.any(vc < 0) or np.any(vc >= grid):
            continue
        kzyx = tuple(vc[::-1])
        if kzyx not in vox:
            vox[kzyx] = []
            order.append(kzyx)
        vox[kzyx].append(i)
    # note: our implementation orders voxels by linearized ZYX coordinate,
    # the reference orders by first occurrence — both are valid; compare by
    # coordinate key.
    return vox, pc_vid, grid


def test_point2voxel_golden(rng):
    pc = rng.uniform(-2, 4, size=(500, 5)).astype(np.float32)
    gen = PointToVoxel(
        vsize_xyz=[0.5, 0.5, 0.5],
        coors_range_xyz=[-1, -1, -1, 3, 3, 3],
        num_point_features=5,
        max_num_voxels=600,
        max_num_points_per_voxel=4,
    )
    voxels, coords, num_per_voxel, pc_vid, num_voxels = \
        gen.generate_voxel_with_id(pc)
    voxels, coords = np.asarray(voxels), np.asarray(coords)
    num_per_voxel, pc_vid = np.asarray(num_per_voxel), np.asarray(pc_vid)

    want, _, grid = brute_force_voxelize(
        pc, [0.5, 0.5, 0.5], [-1, -1, -1, 3, 3, 3], 600, 4)
    got_coords = {tuple(c): i for i, c in enumerate(coords) if c[0] >= 0}
    assert set(got_coords.keys()) == set(want.keys())
    assert int(num_voxels) == len(want)

    for kzyx, pts in want.items():
        vid = got_coords[kzyx]
        assert num_per_voxel[vid] == min(len(pts), 4)
        # first-come point order within the voxel
        for s, pi in enumerate(pts[:4]):
            np.testing.assert_allclose(voxels[vid, s], pc[pi], atol=1e-6)
        # points of a kept voxel carry its id
        for pi in pts:
            assert pc_vid[pi] == vid
    # out-of-range points → -1
    in_any = {p for pts in want.values() for p in pts}
    for i in range(pc.shape[0]):
        if i not in in_any:
            assert pc_vid[i] == -1


def test_point2voxel_empty_mean(rng):
    pc = rng.uniform(0, 1, size=(20, 3)).astype(np.float32)
    gen = PointToVoxel([1.0, 1.0, 1.0], [0, 0, 0, 1, 1, 1], 3, 8, 16)
    voxels, coords, npv, _, nv = gen.generate_voxel_with_id(pc, empty_mean=True)
    v = np.asarray(voxels)[0]
    mean = v[: int(npv[0])].mean(0)
    for s in range(int(npv[0]), 16):
        np.testing.assert_allclose(v[s], mean, atol=1e-6)


def test_voxel_overflow(rng):
    """More voxels than max_num_voxels: extras dropped, ids consistent."""
    pc = rng.uniform(-1, 3, size=(300, 4)).astype(np.float32)
    gen = PointToVoxel([0.5, 0.5, 0.5], [-1, -1, -1, 3, 3, 3], 4, 16, 2)
    voxels, coords, npv, pc_vid, nv = gen.generate_voxel_with_id(pc)
    assert int(nv) == 16
    coords = np.asarray(coords)
    assert np.all(coords[:, 0] >= 0)
    pc_vid = np.asarray(pc_vid)
    assert pc_vid.max() < 16


def test_gather_by_voxel_id(rng):
    feats = rng.uniform(size=(10, 3)).astype(np.float32)
    vid = np.array([0, 3, -1, 9], np.int32)
    out = np.asarray(gather_features_by_pc_voxel_id(jnp.asarray(feats),
                                                    jnp.asarray(vid)))
    np.testing.assert_allclose(out[0], feats[0])
    np.testing.assert_allclose(out[1], feats[3])
    assert np.all(out[2] == 0)
    np.testing.assert_allclose(out[3], feats[9])
