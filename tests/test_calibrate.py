"""Deployment calibration: recorded bounds shrink buffers without
changing results."""

import numpy as np
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.calibrate import calibrate_out_bounds, record_voxel_counts
from utils import generate_sparse_data, pad_sparse


def make_input(rng, nbuf=512):
    feats, inds = generate_sparse_data((12, 12, 12), 200, 4, batch_size=1,
                                       rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p),
                            (12, 12, 12), 1)


def test_calibrate_shrinks_and_preserves(rng):
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="c"),
        spconv_tpu.SparseConv3d(8, 8, 3, stride=2, padding=1),
        spconv_tpu.SparseMaxPool3d(2, 2),
    )
    xs = [make_input(np.random.RandomState(s)) for s in range(3)]

    with record_voxel_counts() as rec:
        baseline = [net(x) for x in xs]
    assert len(rec) == 2  # the conv and the pool recorded

    net2 = calibrate_out_bounds(net, None, xs, margin=1.2, mult=128)
    conv2 = net2.layers[1]
    pool2 = net2.layers[2]
    assert conv2.out_bound is not None and conv2.out_bound < 1024
    assert pool2.out_bound is not None

    # calibrated net produces the same active sites/features
    for x, want in zip(xs, baseline):
        got = net2(x)
        from utils import assert_sparse_allclose
        assert_sparse_allclose(
            np.asarray(got.features), np.asarray(got.indices),
            np.asarray(want.features), np.asarray(want.indices))
