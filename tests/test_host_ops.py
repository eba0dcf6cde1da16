"""Native host library vs the XLA implementations (cross-backend
equivalence — the reference uses its CPU build the same way, SURVEY §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spconv_tpu.csrc.host_api import (
    generate_conv_pairs_host, generate_subm_pairs_host, point_to_voxel_host,
    indice_conv_host)
from spconv_tpu.ops.rulebook import build_conv_rulebook, build_subm_rulebook
from spconv_tpu.ops.gather_gemm import indice_conv
from spconv_tpu.utils import PointToVoxel
from utils import generate_sparse_data, pad_sparse


def pairs_set(pf, oi=None):
    got = set()
    for k in range(pf.shape[0]):
        for o in np.nonzero(pf[k] >= 0)[0]:
            oc = tuple(int(v) for v in oi[o]) if oi is not None else int(o)
            got.add((k, int(pf[k, o]), oc))
    return got


def test_host_subm_matches_xla(rng):
    shape = (9, 10, 11)
    feats, inds = generate_sparse_data(shape, 150, 4, batch_size=2, rng=rng)
    _, inds_p = pad_sparse(feats, inds, 320)
    pf_h, pb_h, n_act = generate_subm_pairs_host(inds_p, shape, (3, 3, 3),
                                                 (1, 1, 1))
    data = build_subm_rulebook(jnp.asarray(inds_p), spatial_shape=shape,
                               batch_size=2, ksize=(3, 3, 3),
                               dilation=(1, 1, 1))
    np.testing.assert_array_equal(pf_h, np.asarray(data.pair_fwd))
    np.testing.assert_array_equal(pb_h, np.asarray(data.pair_bwd))
    assert n_act == int(data.num_out)


@pytest.mark.parametrize("transposed", [False, True])
def test_host_conv_pairs_match_xla(rng, transposed):
    shape = (9, 10, 11)
    feats, inds = generate_sparse_data(shape, 120, 4, batch_size=2, rng=rng)
    _, inds_p = pad_sparse(feats, inds, 320)
    ks, st, pd, dl = (3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1)
    from spconv_tpu.ops import coords as C
    if transposed:
        out_shape = C.get_deconv_output_size(shape, ks, st, pd, dl, (0,) * 3)
    else:
        out_shape = C.get_conv_output_size(shape, ks, st, pd, dl)
    cap = 2048
    pf_h, pb_h, oi_h, n_out_h = generate_conv_pairs_host(
        inds_p, shape, out_shape, ks, st, pd, dl, transposed, cap)
    data = build_conv_rulebook(jnp.asarray(inds_p), spatial_shape=shape,
                               batch_size=2, ksize=ks, stride=st, padding=pd,
                               dilation=dl, transposed=transposed,
                               out_bound=cap)
    assert n_out_h == int(data.num_out)
    np.testing.assert_array_equal(oi_h, np.asarray(data.out_indices))
    np.testing.assert_array_equal(pf_h, np.asarray(data.pair_fwd))
    np.testing.assert_array_equal(pb_h, np.asarray(data.pair_bwd))


def test_host_voxelizer_matches_xla(rng):
    pc = rng.uniform(-2, 4, size=(400, 4)).astype(np.float32)
    args = dict(vsize_xyz=[0.5, 0.5, 0.5],
                coors_range_xyz=[-1, -1, -1, 3, 3, 3])
    v_h, c_h, n_h, id_h, nv_h = point_to_voxel_host(
        pc, args["vsize_xyz"], args["coors_range_xyz"], 600, 4)
    gen = PointToVoxel(args["vsize_xyz"], args["coors_range_xyz"], 4, 600, 4)
    v_x, c_x, n_x, id_x, nv_x = gen.generate_voxel_with_id(pc)
    assert nv_h == int(nv_x)
    # host orders voxels by first occurrence; XLA by key — align by coord
    hmap = {tuple(c_h[i]): i for i in range(nv_h)}
    c_xn = np.asarray(c_x)
    for j in range(int(nv_x)):
        i = hmap[tuple(c_xn[j])]
        assert n_h[i] == int(n_x[j])
        np.testing.assert_allclose(v_h[i, :n_h[i]],
                                   np.asarray(v_x)[j, :n_h[i]], atol=1e-6)


def test_host_conv_compute_matches_xla(rng):
    shape = (9, 10, 11)
    feats, inds = generate_sparse_data(shape, 150, 6, batch_size=1, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, 320)
    w = rng.uniform(-1, 1, (8, 3, 3, 3, 6)).astype(np.float32)
    pf, pb, _ = generate_subm_pairs_host(inds_p, shape, (3, 3, 3), (1, 1, 1))
    got = indice_conv_host(feats_p, w, pf)
    want = indice_conv(jnp.asarray(feats_p), jnp.asarray(w),
                       jnp.asarray(pf), jnp.asarray(pb), is_subm=True)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4)
