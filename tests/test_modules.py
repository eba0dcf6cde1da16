"""Module-level tests (parity with reference ``test/test_conv.py`` and
``test/test_multi_impl.py``): modules vs torch dense golden, deep net with
encoder/decoder (inverse conv) structure, pooling, containers, training
step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

import spconv_tpu
from spconv_tpu import SparseConvTensor
from utils import generate_sparse_data, pad_sparse, dense_from_sparse, \
    assert_sparse_allclose


def make_input(rng, shape=(9, 10, 11), n=120, c=4, batch=2, nbuf=280):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=batch, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p), shape,
                            batch), feats_p, inds_p


def rows_from_dense(dense_bcxyz, inds):
    valid = inds[:, 0] >= 0
    out = np.zeros((inds.shape[0], dense_bcxyz.shape[1]), dense_bcxyz.dtype)
    out[valid] = np.stack(
        [dense_bcxyz[r[0], :, r[1], r[2], r[3]] for r in inds[valid]])
    return out


def test_subm_module_vs_dense(rng):
    x, feats_p, inds_p = make_input(rng)
    m = spconv_tpu.SubMConv3d(4, 8, 3, bias=True, indice_key="s1")
    y = m(x)
    # torch golden
    xd = torch.tensor(dense_from_sparse(feats_p, inds_p, x.spatial_shape, 2))
    w = torch.tensor(np.moveaxis(np.asarray(m.weight), -1, 1).copy())
    yd = F.conv3d(xd, w, bias=torch.tensor(np.asarray(m.bias)), padding=1)
    got = np.asarray(y.features)
    want = rows_from_dense(yd.numpy(), inds_p)
    valid = inds_p[:, 0] >= 0
    np.testing.assert_allclose(got[valid], want[valid], atol=1e-4, rtol=1e-4)
    assert np.all(got[~valid] == 0)
    # rulebook cached
    assert "s1" in y.indice_dict


def test_sparse_conv_module_and_inverse_roundtrip(rng):
    """Encoder conv downsample then SparseInverseConv3d restores the exact
    input site set (parity: docs/USAGE.md inverse conv semantics)."""
    x, feats_p, inds_p = make_input(rng)
    enc = spconv_tpu.SparseConv3d(4, 8, 3, stride=2, padding=1,
                                  indice_key="down1", bias=False)
    dec = spconv_tpu.SparseInverseConv3d(8, 4, 3, indice_key="down1",
                                         bias=False)
    mid = enc(x)
    back = dec(mid)
    assert back.features.shape[0] == x.features.shape[0]
    np.testing.assert_array_equal(np.asarray(back.indices),
                                  np.asarray(x.indices))
    # every originally-active row is active again
    assert np.all((np.asarray(back.indices)[:, 0] >= 0) ==
                  (inds_p[:, 0] >= 0))


def test_maxpool_vs_dense(rng):
    x, feats_p, inds_p = make_input(rng)
    m = spconv_tpu.SparseMaxPool3d(2, 2)
    y = m(x)
    xd = torch.tensor(dense_from_sparse(feats_p, inds_p, x.spatial_shape, 2))
    # torch maxpool counts absent sites as 0 -> only compare sites where
    # sparse output exists and all contributing values are from active sites
    yd = F.max_pool3d(xd, 2, 2).numpy()
    oi = np.asarray(y.indices)
    got = np.asarray(y.features)
    valid = oi[:, 0] >= 0
    # our maxpool takes max over *present* inputs; dense maxpool includes
    # zeros for absent sites, so dense >= sparse with equality iff max > 0
    want = rows_from_dense(yd, oi)
    pos = got[valid] > 0
    np.testing.assert_allclose(got[valid][pos], want[valid][pos], atol=1e-5)


def test_avgpool_counts(rng):
    x, _, _ = make_input(rng)
    m = spconv_tpu.SparseAvgPool3d(2, 2)
    y = m(x)
    assert y.features.shape[1] == x.features.shape[1]
    got = np.asarray(y.features)
    assert np.isfinite(got).all()


def test_global_pools(rng):
    x, feats_p, inds_p = make_input(rng)
    gmax = spconv_tpu.SparseGlobalMaxPool()(x)
    gavg = spconv_tpu.SparseGlobalAvgPool()(x)
    assert gmax.shape == (2, 4) and gavg.shape == (2, 4)
    valid = inds_p[:, 0] >= 0
    for b in range(2):
        sel = valid & (inds_p[:, 0] == b)
        np.testing.assert_allclose(np.asarray(gmax)[b],
                                   feats_p[sel].max(0), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gavg)[b],
                                   feats_p[sel].mean(0), atol=1e-5)


def test_sparse_sequential_and_bn(rng):
    x, _, _ = make_input(rng)
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="l1"),
        spconv_tpu.BatchNorm1d(8),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SubMConv3d(8, 8, 3, indice_key="l1"),
    )
    y = net(x)
    got = np.asarray(y.features)
    valid = np.asarray(y.indices)[:, 0] >= 0
    assert np.all(got[~valid] == 0)
    assert np.abs(got[valid]).sum() > 0
    # jit over the whole module pytree
    fast = jax.jit(lambda m, t: m(t).features)
    got2 = np.asarray(fast(net, x))
    np.testing.assert_allclose(got, got2, atol=1e-5)


def test_bn_masked_stats(rng):
    """BN batch stats must ignore padded rows."""
    x, feats_p, inds_p = make_input(rng)
    bn = spconv_tpu.BatchNorm1d(4, eps=1e-5, affine=False)
    y = bn(x, training=True)
    valid = inds_p[:, 0] >= 0
    f = feats_p[valid]
    want = (f - f.mean(0)) / np.sqrt(f.var(0) + 1e-5)
    np.testing.assert_allclose(np.asarray(y.features)[valid], want, atol=1e-4)


def test_sparse_add_misaligned(rng):
    shape = (9, 10, 11)
    f1, i1 = generate_sparse_data(shape, 50, 4, batch_size=1, rng=rng)
    f2, i2 = generate_sparse_data(shape, 60, 4, batch_size=1, rng=rng)
    f1p, i1p = pad_sparse(f1, i1, 64)
    f2p, i2p = pad_sparse(f2, i2, 96)
    a = SparseConvTensor(jnp.asarray(f1p), jnp.asarray(i1p), shape, 1)
    b = SparseConvTensor(jnp.asarray(f2p), jnp.asarray(i2p), shape, 1)
    c = spconv_tpu.sparse_add(a, b)
    # golden: dict-based union add
    m = {}
    for f, i in [(f1, i1), (f2, i2)]:
        for row in range(f.shape[0]):
            k = tuple(i[row])
            m[k] = m.get(k, np.zeros(4, np.float32)) + f[row]
    got = {tuple(r): v for r, v in zip(np.asarray(c.indices),
                                       np.asarray(c.features))
           if r[0] >= 0}
    assert set(got.keys()) == set(m.keys())
    for k in m:
        np.testing.assert_allclose(got[k], m[k], atol=1e-5)
    assert int(c.num_voxels) == len(m)


def test_add_join_tables(rng):
    x, _, _ = make_input(rng)
    y = spconv_tpu.AddTable()([x, x])
    np.testing.assert_allclose(np.asarray(y.features),
                               2 * np.asarray(x.features), atol=1e-6)
    j = spconv_tpu.JoinTable()([x, x])
    assert j.features.shape[1] == 8


def test_training_step(rng):
    """End-to-end training smoke (parity: test/fake_train.py): grads flow
    through a small classifier net."""
    x, _, _ = make_input(rng)
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="c1"),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SparseConv3d(8, 16, 3, stride=2, padding=1,
                                indice_key="d1"),
        spconv_tpu.SparseReLU(),
    )

    def loss_fn(m, t):
        out = m(t)
        pooled = spconv_tpu.SparseGlobalAvgPool()(out)
        return jnp.sum(pooled ** 2)

    loss, grads = spconv_tpu.filter_value_and_grad(loss_fn)(net, x)
    assert np.isfinite(float(loss))
    leaves = [g for g in jax.tree_util.tree_leaves(grads)
              if g is not None and hasattr(g, "dtype")]
    assert any(float(jnp.abs(g).sum()) > 0 for g in leaves)


def test_conv1x1_fast_path(rng):
    x, feats_p, inds_p = make_input(rng)
    m = spconv_tpu.SubMConv3d(4, 6, 1, bias=True)
    y = m(x)
    w = np.asarray(m.weight).reshape(6, 4)
    want = feats_p @ w.T + np.asarray(m.bias)
    valid = inds_p[:, 0] >= 0
    np.testing.assert_allclose(np.asarray(y.features)[valid], want[valid],
                               atol=1e-5)
    assert np.all(np.asarray(y.features)[~valid] == 0)


def test_benchmark_record_per_layer(rng):
    """benchmark=True threads per-layer records through conv and pool
    layers (parity: reference benchmark mode, conv.py:201-224,494-501)."""
    x, _, inds_p = make_input(rng)
    x.benchmark = True
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="c1"),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SparseConv3d(8, 16, 3, stride=2, padding=1,
                                indice_key="d1"),
        spconv_tpu.SparseMaxPool3d(2, out_bound=64),
    )
    out = net(x)
    recs = out.benchmark_record
    types = [r["type"] for r in recs.values()]
    assert "SubMConv3d" in types and "SparseConv3d" in types
    assert "SparseMaxPool3d" in types
    conv_rec = next(r for r in recs.values() if r["type"] == "SubMConv3d")
    # outside jit the voxel counts are concrete
    assert conv_rec["num_voxels_in"] is not None
    assert conv_rec["in_channels"] == 4 and conv_rec["out_channels"] == 8
    # under jit the records still appear (counts become None, not tracers)
    import jax as _jax

    @_jax.jit
    def f(feats):
        t = spconv_tpu.SparseConvTensor(feats, x.indices, x.spatial_shape,
                                        x.batch_size)
        t.benchmark = True
        o = net(t)
        assert len(o.benchmark_record) >= 3
        return o.features

    f(x.features)


def test_keyed_pool_then_inverse_conv(rng):
    """A SparseMaxPool2x2 with indice_key must register a rulebook record
    so SparseInverseConv can reuse it (ADVICE r4 high; reference parity:
    spconv/pytorch/pool.py:161-173 stores IndiceData)."""
    x, feats_p, inds_p = make_input(rng, shape=(8, 10, 12))
    pool = spconv_tpu.SparseMaxPool3d(2, 2, indice_key="p1")
    dec = spconv_tpu.SparseInverseConv3d(4, 4, 2, indice_key="p1",
                                         bias=False)
    mid = pool(x)
    assert "p1" in mid.indice_dict
    back = dec(mid)
    np.testing.assert_array_equal(np.asarray(back.indices),
                                  np.asarray(x.indices))


def test_pool2_seg_preserves_nonfinite(rng):
    """pool2_seg masks empty rows by segment presence, so legitimate
    -inf/+inf/nan feature values survive the max (ADVICE r4 low)."""
    from spconv_tpu.ops.pool import pool2_seg

    inds = np.array([[0, 0, 0, 0], [0, 0, 0, 1], [0, 2, 2, 2],
                     [-1, -1, -1, -1]], np.int32)
    feats = np.array([[-np.inf, 1.0], [-np.inf, 0.5],
                      [np.inf, np.nan], [0.0, 0.0]], np.float32)
    out_feat, out_inds, num_out, _total = pool2_seg(
        jnp.asarray(feats), jnp.asarray(inds),
        spatial_shape=(4, 4, 4), batch_size=1, out_bound=8, mode="max")
    out_feat = np.asarray(out_feat)
    oi = np.asarray(out_inds)
    assert int(num_out) == 2
    row0 = np.where((oi == [0, 0, 0, 0]).all(1))[0][0]
    row1 = np.where((oi == [0, 1, 1, 1]).all(1))[0][0]
    assert out_feat[row0, 0] == -np.inf and out_feat[row0, 1] == 1.0
    assert out_feat[row1, 0] == np.inf and np.isnan(out_feat[row1, 1])
    # empty rows stay exactly zero
    assert np.all(out_feat[int(num_out):] == 0)
