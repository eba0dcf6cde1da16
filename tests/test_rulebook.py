"""Rulebook correctness vs a brute-force numpy reference.

Mirrors the reference's op-level test strategy (``test/test_all_algo.py``):
test the pair-generation op directly over a grid of conv configs, not just
through networks.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from spconv_tpu.ops import coords as C
from spconv_tpu.ops.rulebook import build_subm_rulebook, build_conv_rulebook
from utils import generate_sparse_data, pad_sparse


def brute_force_pairs(indices, spatial_shape, ksize, stride, padding, dilation,
                      transposed=False, subm=False):
    """O(N*kv) python reference: returns (out_coord_set, pairs set of
    (k, in_idx, out_coord))."""
    ndim = len(spatial_shape)
    offs = C.kernel_offsets(ksize)
    if subm:
        padding = [(k // 2) * d for k, d in zip(ksize, dilation)]
        stride = [1] * ndim
        out_shape = list(spatial_shape)
    elif transposed:
        out_shape = C.get_deconv_output_size(spatial_shape, ksize, stride,
                                             padding, dilation, [0] * ndim)
    else:
        out_shape = C.get_conv_output_size(spatial_shape, ksize, stride,
                                           padding, dilation)
    valid_rows = indices[:, 0] >= 0
    out_sites = set()
    pairs = set()
    for i in np.nonzero(valid_rows)[0]:
        b = indices[i, 0]
        x = indices[i, 1:]
        for k in range(len(offs)):
            if not transposed:
                num = x + np.array(padding) - offs[k] * np.array(dilation)
                q, r = np.divmod(num, np.array(stride))
                if np.any(r != 0):
                    continue
            else:
                q = x * np.array(stride) - np.array(padding) + offs[k] * np.array(dilation)
            if np.all(q >= 0) and np.all(q < np.array(out_shape)):
                oc = (int(b), *[int(v) for v in q])
                out_sites.add(oc)
                pairs.add((k, int(i), oc))
    if subm:
        # subm keeps only out sites that are input sites
        in_sites = {tuple(int(v) for v in indices[i]) for i in np.nonzero(valid_rows)[0]}
        pairs = {p for p in pairs if p[2] in in_sites}
        out_sites = in_sites
    return out_shape, out_sites, pairs


def pairs_from_rulebook(data, indices_in):
    """Convert pair_fwd to the same set representation."""
    pf = np.asarray(data.pair_fwd)
    oi = np.asarray(data.out_indices)
    got = set()
    for k in range(pf.shape[0]):
        for o in np.nonzero(pf[k] >= 0)[0]:
            i = pf[k, o]
            oc = tuple(int(v) for v in oi[o])
            got.add((k, int(i), oc))
    return got


@pytest.mark.parametrize("ksize,dilation", [((3, 3, 3), (1, 1, 1)),
                                            ((3, 1, 3), (1, 1, 1)),
                                            ((3, 3, 3), (2, 1, 2)),
                                            ((5, 3, 3), (1, 1, 1))])
def test_subm_rulebook(rng, ksize, dilation):
    shape = (11, 13, 12)
    feats, inds = generate_sparse_data(shape, 150, 4, batch_size=2, rng=rng)
    _, inds_p = pad_sparse(feats, inds, 320)
    data = build_subm_rulebook(
        jnp.asarray(inds_p), spatial_shape=shape, batch_size=2,
        ksize=ksize, dilation=dilation)
    _, _, want = brute_force_pairs(inds_p, shape, ksize, [1, 1, 1], None,
                                   dilation, subm=True)
    got = pairs_from_rulebook(data, inds_p)
    assert got == want
    # pair_bwd consistency: pair_bwd[k][i] == o  <=>  pair_fwd[k][o] == i
    pf = np.asarray(data.pair_fwd)
    pb = np.asarray(data.pair_bwd)
    for k in range(pf.shape[0]):
        for i in np.nonzero(pb[k] >= 0)[0]:
            assert pf[k, pb[k, i]] == i


@pytest.mark.parametrize(
    "ksize,stride,padding,dilation",
    [
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1)),
        ((3, 3, 3), (1, 1, 1), (0, 0, 0), (1, 1, 1)),
        ((2, 2, 2), (2, 2, 2), (0, 0, 0), (1, 1, 1)),
        ((3, 2, 3), (2, 1, 2), (1, 0, 1), (1, 1, 1)),
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (2, 2, 2)),
        ((1, 1, 1), (2, 2, 2), (0, 0, 0), (1, 1, 1)),
    ],
)
def test_conv_rulebook(rng, ksize, stride, padding, dilation):
    shape = (11, 13, 12)
    feats, inds = generate_sparse_data(shape, 150, 4, batch_size=2, rng=rng)
    _, inds_p = pad_sparse(feats, inds, 320)
    kv = int(np.prod(ksize))
    data = build_conv_rulebook(
        jnp.asarray(inds_p), spatial_shape=shape, batch_size=2,
        ksize=ksize, stride=stride, padding=padding, dilation=dilation,
        out_bound=320 * min(kv, 8))
    out_shape, want_sites, want = brute_force_pairs(
        inds_p, shape, ksize, stride, padding, dilation)
    assert tuple(data.out_spatial_shape) == tuple(out_shape)
    oi = np.asarray(data.out_indices)
    got_sites = {tuple(int(v) for v in r) for r in oi if r[0] >= 0}
    assert got_sites == want_sites
    assert int(data.num_out) == len(want_sites)
    got = pairs_from_rulebook(data, inds_p)
    assert got == want
    # bwd/fwd consistency
    pf = np.asarray(data.pair_fwd)
    pb = np.asarray(data.pair_bwd)
    for k in range(pf.shape[0]):
        for i in np.nonzero(pb[k] >= 0)[0]:
            assert pf[k, pb[k, i]] == i
        for o in np.nonzero(pf[k] >= 0)[0]:
            assert pb[k, pf[k, o]] == o


@pytest.mark.parametrize(
    "ksize,stride,padding",
    [((2, 2, 2), (2, 2, 2), (0, 0, 0)), ((3, 3, 3), (2, 2, 2), (1, 1, 1))],
)
def test_transposed_rulebook(rng, ksize, stride, padding):
    shape = (6, 7, 8)
    feats, inds = generate_sparse_data(shape, 60, 4, batch_size=2, rng=rng)
    _, inds_p = pad_sparse(feats, inds, 128)
    kv = int(np.prod(ksize))
    data = build_conv_rulebook(
        jnp.asarray(inds_p), spatial_shape=shape, batch_size=2,
        ksize=ksize, stride=stride, padding=padding, dilation=(1, 1, 1),
        transposed=True, out_bound=128 * kv)
    out_shape, want_sites, want = brute_force_pairs(
        inds_p, shape, ksize, stride, padding, (1, 1, 1), transposed=True)
    assert tuple(data.out_spatial_shape) == tuple(out_shape)
    oi = np.asarray(data.out_indices)
    got_sites = {tuple(int(v) for v in r) for r in oi if r[0] >= 0}
    assert got_sites == want_sites
    got = pairs_from_rulebook(data, inds_p)
    assert got == want


def test_out_bound_truncation(rng):
    """Overflowing out_bound keeps the smallest keys and stays consistent."""
    shape = (8, 8, 8)
    feats, inds = generate_sparse_data(shape, 100, 4, batch_size=1, rng=rng)
    _, inds_p = pad_sparse(feats, inds, 128)
    data = build_conv_rulebook(
        jnp.asarray(inds_p), spatial_shape=shape, batch_size=1,
        ksize=(3, 3, 3), stride=(1, 1, 1), padding=(1, 1, 1),
        dilation=(1, 1, 1), out_bound=64)
    oi = np.asarray(data.out_indices)
    n_active = int((oi[:, 0] >= 0).sum())
    assert n_active == 64
    assert int(data.num_out) == 64
    pf = np.asarray(data.pair_fwd)
    pb = np.asarray(data.pair_bwd)
    assert pf.shape[1] == 64
    # all bwd entries point inside the bound
    assert pb.max() < 64
    for k in range(pf.shape[0]):
        for o in np.nonzero(pf[k] >= 0)[0]:
            assert pb[k, pf[k, o]] == o
