"""Additional golden coverage: avgpool vs torch, transposed conv with
output_padding, dense round-trips, dilation edge cases."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

import spconv_tpu
from spconv_tpu import SparseConvTensor
from utils import generate_sparse_data, pad_sparse, dense_from_sparse


def make_input(rng, shape=(8, 9, 10), n=110, c=4, batch=2, nbuf=256):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=batch, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return (SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p),
                             shape, batch), feats_p, inds_p)


def test_avgpool_vs_dense_count_semantics(rng):
    """Sparse avg = sum present / count present; equals dense avg only
    where all window sites are active — check exactly that subset."""
    x, feats_p, inds_p = make_input(rng)
    y = spconv_tpu.SparseAvgPool3d(2, 2)(x)
    xd = torch.tensor(dense_from_sparse(feats_p, inds_p, x.spatial_shape, 2))
    occ = torch.tensor(dense_from_sparse(
        np.ones_like(feats_p[:, :1]), inds_p, x.spatial_shape, 2))
    yd = F.avg_pool3d(xd, 2, 2).numpy()
    cnt = F.avg_pool3d(occ, 2, 2).numpy() * 8  # active sites per window
    oi = np.asarray(y.indices)
    got = np.asarray(y.features)
    valid = oi[:, 0] >= 0
    for row in np.nonzero(valid)[0]:
        b, z, yy, xx = oi[row]
        n_present = cnt[b, 0, z, yy, xx]
        want = yd[b, :, z, yy, xx] * 8.0 / max(n_present, 1)
        np.testing.assert_allclose(got[row], want, atol=1e-4)


def test_transposed_output_padding(rng):
    x, feats_p, inds_p = make_input(rng)
    m = spconv_tpu.SparseConvTranspose3d(4, 6, 2, stride=2, bias=False,
                                         output_padding=1,
                                         out_bound_ratio=8.0)
    y = m(x)
    want_shape = tuple((s - 1) * 2 + 2 + 1 for s in x.spatial_shape)
    assert tuple(y.spatial_shape) == want_shape
    # torch golden
    xd = torch.tensor(dense_from_sparse(feats_p, inds_p, x.spatial_shape, 2))
    wt = torch.tensor(np.moveaxis(np.asarray(m.weight), [0, -1],
                                  [1, 0]).copy())
    yd = F.conv_transpose3d(xd, wt, stride=2, output_padding=1).numpy()
    oi = np.asarray(y.indices)
    got = np.asarray(y.features)
    valid = oi[:, 0] >= 0
    want = np.stack([yd[r[0], :, r[1], r[2], r[3]] for r in oi[valid]])
    np.testing.assert_allclose(got[valid], want, atol=1e-4, rtol=1e-4)


def test_dense_from_dense_roundtrip(rng):
    x, feats_p, inds_p = make_input(rng, batch=2)
    d = x.dense(channels_first=False)  # [B, *spatial, C]
    x2 = SparseConvTensor.from_dense(d)
    m1 = {tuple(r): f for r, f in zip(inds_p, feats_p) if r[0] >= 0
          and np.abs(f).sum() > 0}
    i2, f2 = np.asarray(x2.indices), np.asarray(x2.features)
    m2 = {tuple(r): f for r, f in zip(i2, f2) if r[0] >= 0}
    assert set(m1) == set(m2)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], atol=1e-6)


def test_dense_channels_first_matches(rng):
    x, feats_p, inds_p = make_input(rng)
    d = np.asarray(x.dense())
    want = dense_from_sparse(feats_p, inds_p, x.spatial_shape, 2)
    np.testing.assert_allclose(d, want, atol=1e-6)


def test_dilated_strided_combo(rng):
    x, feats_p, inds_p = make_input(rng, shape=(10, 11, 12))
    m = spconv_tpu.SparseConv3d(4, 5, 3, stride=2, padding=2, dilation=2,
                                bias=False, out_bound_ratio=8.0)
    y = m(x)
    xd = torch.tensor(dense_from_sparse(feats_p, inds_p, x.spatial_shape, 2))
    w = torch.tensor(np.moveaxis(np.asarray(m.weight), -1, 1).copy())
    yd = F.conv3d(xd, w, stride=2, padding=2, dilation=2).numpy()
    oi = np.asarray(y.indices)
    got = np.asarray(y.features)
    valid = oi[:, 0] >= 0
    want = np.stack([yd[r[0], :, r[1], r[2], r[3]] for r in oi[valid]])
    np.testing.assert_allclose(got[valid], want, atol=1e-4, rtol=1e-4)


def test_pcc_roundtrip(rng):
    from spconv_tpu.utils.pcc import encode_xyz, decode_xyz

    # surface-like points (LiDAR clusters into voxels; uniform random is
    # the codec's worst case since per-voxel overhead dominates)
    base = rng.uniform(-40, 40, size=(500, 3)).astype(np.float32)
    pc = (base[rng.randint(0, 500, 5000)] +
          rng.uniform(-0.5, 0.5, (5000, 3))).astype(np.float32)
    blob = encode_xyz(pc, error=0.01)
    dec = decode_xyz(blob)
    assert dec.shape == pc.shape
    # order changes (voxel-grouped); match by nearest within error bound
    assert len(blob) < pc.nbytes  # actually compresses
    # every decoded point lies within the error bound of an original point
    from scipy.spatial import cKDTree

    d, _ = cKDTree(pc).query(dec, k=1)
    assert d.max() < 0.01 * np.sqrt(3) + 1e-6, d.max()

    pci = rng.uniform(-40, 40, size=(1000, 4)).astype(np.float32)
    blob = encode_xyz(pci, error=0.02)
    dec = decode_xyz(blob)
    assert dec.shape == (1000, 4)


def test_empty_input_through_net(rng):
    """All-invalid input flows through conv/pool/global without NaNs."""
    shape = (8, 9, 10)
    x = SparseConvTensor(jnp.zeros((128, 4)),
                         jnp.full((128, 4), -1, jnp.int32), shape, 1)
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="e"),
        spconv_tpu.SparseMaxPool3d(2, 2),
    )
    y = net(x)
    assert int(jnp.sum((y.indices[:, 0] >= 0))) == 0
    assert np.all(np.asarray(y.features) == 0)
    g = spconv_tpu.SparseGlobalAvgPool()(y)
    assert np.isfinite(np.asarray(g)).all()


def test_transposed_default_bound_no_truncation(rng):
    """Default out_bound for transposed convs must cover the expansion."""
    x, feats_p, inds_p = make_input(rng, n=50, nbuf=128)
    m = spconv_tpu.SparseConvTranspose3d(4, 4, 2, stride=2, bias=False)
    y = m(x)
    n_in = int((inds_p[:, 0] >= 0).sum())
    n_out = int(np.asarray(y.indices[:, 0] >= 0).sum())
    # k=2,s=2 transposed: every input spawns exactly 8 outputs (disjoint)
    assert n_out == 8 * n_in
