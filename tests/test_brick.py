"""Block-dense (brick) path golden tests: algo="block" must match the
native gather path exactly on the same inputs (coord-keyed comparison —
the brick layout orders rows differently)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spconv_tpu
from spconv_tpu.core import SparseConvTensor
from spconv_tpu.ops import brick as B

from utils import (assert_sparse_allclose, generate_sparse_data, pad_sparse)


def _make_input(shape, n, c, rng, batch_size=1, nbuf=None):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=batch_size,
                                       rng=rng)
    nbuf = nbuf or -(-feats.shape[0] // 64) * 64
    f, i = pad_sparse(feats, inds, nbuf)
    return SparseConvTensor(jnp.asarray(f), jnp.asarray(i), shape, batch_size)


class TestPackRoundtrip:
    @pytest.mark.parametrize("brick_shape", [(2, 2, 2), (1, 2, 2), (2, 4, 4)])
    def test_pack_preserves_sites(self, rng, brick_shape):
        x = _make_input((9, 13, 11), 150, 5, rng, batch_size=2)
        y = B.pack_tensor(x, brick_shape=brick_shape)
        assert_sparse_allclose(
            np.asarray(x.features), np.asarray(x.indices),
            np.asarray(y.features), np.asarray(y.indices),
        )
        assert int(y.num_voxels) == int(x.num_voxels)
        meta = B.find_brick_meta(y)
        assert meta is not None
        # inactive slots carry zeros
        act = np.asarray(y.indices[:, 0] >= 0)
        assert np.all(np.asarray(y.features)[~act] == 0)

    def test_neighbor_table(self, rng):
        x = _make_input((8, 8, 8), 100, 1, rng)
        y = B.pack_tensor(x, brick_shape=(2, 2, 2))
        meta = B.find_brick_meta(y)
        bc = np.asarray(meta.brick_coords)
        nbr = np.asarray(meta.nbr)
        rows = {tuple(r): i for i, r in enumerate(bc) if r[0] >= 0}
        from spconv_tpu.ops import coords as C
        disp = C.kernel_offsets((3, 3, 3)) - 1  # [27, 3], build order
        assert nbr.shape[0] == 27
        for i, r in enumerate(bc):
            if r[0] < 0:
                continue
            for a, d in enumerate(disp):
                want = rows.get((r[0], r[1] + d[0], r[2] + d[1], r[3] + d[2]),
                                -1)
                assert nbr[a, i] == want, (i, a, tuple(r))


class TestBlockConv:
    @pytest.mark.parametrize("brick_shape", [(2, 2, 2), (1, 2, 2), (2, 4, 4)])
    @pytest.mark.parametrize("c,k", [(5, 7)])
    def test_subm_matches_native(self, rng, brick_shape, c, k):
        shape = (9, 13, 11)
        x = _make_input(shape, 150, c, rng, batch_size=2)
        conv_n = spconv_tpu.SubMConv3d(c, k, 3, key=jax.random.PRNGKey(3))
        conv_b = spconv_tpu.SubMConv3d(c, k, 3, algo="block",
                                       brick_shape=brick_shape,
                                       key=jax.random.PRNGKey(3))
        conv_b.weight = conv_n.weight
        conv_b.bias = conv_n.bias
        yn = conv_n(x)
        yb = conv_b(x)
        assert_sparse_allclose(
            np.asarray(yn.features), np.asarray(yn.indices),
            np.asarray(yb.features), np.asarray(yb.indices),
            atol=1e-4,
        )

    def test_subm_dilated(self, rng):
        shape = (9, 9, 9)
        x = _make_input(shape, 120, 4, rng)
        conv_n = spconv_tpu.SubMConv3d(4, 6, 3, dilation=2,
                                       key=jax.random.PRNGKey(5))
        conv_b = spconv_tpu.SubMConv3d(4, 6, 3, dilation=2, algo="block",
                                       brick_shape=(2, 2, 2),
                                       key=jax.random.PRNGKey(5))
        conv_b.weight = conv_n.weight
        conv_b.bias = conv_n.bias
        yn, yb = conv_n(x), conv_b(x)
        assert_sparse_allclose(
            np.asarray(yn.features), np.asarray(yn.indices),
            np.asarray(yb.features), np.asarray(yb.indices),
            atol=1e-4,
        )

    def test_chained_convs_reuse_meta(self, rng):
        shape = (9, 13, 11)
        x = _make_input(shape, 150, 4, rng)
        c1n = spconv_tpu.SubMConv3d(4, 6, 3, key=jax.random.PRNGKey(1))
        c2n = spconv_tpu.SubMConv3d(6, 6, 3, key=jax.random.PRNGKey(2))
        c1b = spconv_tpu.SubMConv3d(4, 6, 3, algo="block",
                                    key=jax.random.PRNGKey(1))
        c2b = spconv_tpu.SubMConv3d(6, 6, 3, algo="block",
                                    key=jax.random.PRNGKey(2))
        c1b.weight, c1b.bias = c1n.weight, c1n.bias
        c2b.weight, c2b.bias = c2n.weight, c2n.bias
        yn = c2n(c1n(x))
        yb_mid = c1b(x)
        # second conv must reuse the cached brick meta (same buffer size)
        yb = c2b(yb_mid)
        assert yb.features.shape[0] == yb_mid.features.shape[0]
        assert_sparse_allclose(
            np.asarray(yn.features), np.asarray(yn.indices),
            np.asarray(yb.features), np.asarray(yb.indices),
            atol=1e-4,
        )

    def test_block_conv_grads_match_native(self, rng):
        shape = (7, 9, 9)
        x = _make_input(shape, 80, 4, rng)
        conv_n = spconv_tpu.SubMConv3d(4, 5, 3, bias=False,
                                       key=jax.random.PRNGKey(7))
        conv_b = spconv_tpu.SubMConv3d(4, 5, 3, bias=False, algo="block",
                                       key=jax.random.PRNGKey(7))
        conv_b.weight = conv_n.weight

        def loss_n(w, feats):
            m = conv_n.replace(weight=w)
            t = SparseConvTensor(feats, x.indices, shape, 1)
            return jnp.sum(m(t).features.astype(jnp.float32) ** 2)

        def loss_b(w, feats):
            m = conv_b.replace(weight=w)
            t = SparseConvTensor(feats, x.indices, shape, 1)
            return jnp.sum(m(t).features.astype(jnp.float32) ** 2)

        gn_w, gn_f = jax.grad(loss_n, argnums=(0, 1))(conv_n.weight, x.features)
        gb_w, gb_f = jax.grad(loss_b, argnums=(0, 1))(conv_b.weight, x.features)
        np.testing.assert_allclose(np.asarray(gn_w), np.asarray(gb_w),
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gn_f), np.asarray(gb_f),
                                   atol=1e-3, rtol=1e-4)


class TestBlockDownsample:
    @pytest.mark.parametrize("cfg", [
        # (ksize, stride, padding, dilation)
        (3, 2, 1, 1),
        (3, 2, 0, 1),
        (2, 2, 0, 1),
        (3, 1, 1, 1),
        ((3, 1, 1), (2, 1, 1), 0, 1),
    ])
    def test_strided_matches_native(self, rng, cfg):
        k, s, p, d = cfg
        shape = (9, 13, 11)
        x = _make_input(shape, 150, 5, rng, batch_size=2)
        conv_n = spconv_tpu.SparseConv3d(5, 7, k, stride=s, padding=p,
                                         dilation=d, out_bound=4096,
                                         key=jax.random.PRNGKey(3))
        conv_b = spconv_tpu.SparseConv3d(5, 7, k, stride=s, padding=p,
                                         dilation=d, algo="block",
                                         brick_shape=(2, 2, 2),
                                         key=jax.random.PRNGKey(3))
        conv_b.weight = conv_n.weight
        conv_b.bias = conv_n.bias
        yn = conv_n(x)
        yb = conv_b(x)
        assert yn.spatial_shape == yb.spatial_shape
        assert int(yn.num_voxels) == int(yb.num_voxels)
        assert_sparse_allclose(
            np.asarray(yn.features), np.asarray(yn.indices),
            np.asarray(yb.features), np.asarray(yb.indices),
            atol=1e-4,
        )

    def test_down_then_subm_chain(self, rng):
        """Downsample output is brick-packed: a following block subm conv
        reuses it, and the whole chain matches native."""
        shape = (8, 12, 12)
        x = _make_input(shape, 150, 4, rng)
        dn = spconv_tpu.SparseConv3d(4, 8, 3, stride=2, padding=1,
                                     out_bound=512, key=jax.random.PRNGKey(0))
        sn = spconv_tpu.SubMConv3d(8, 8, 3, key=jax.random.PRNGKey(1))
        db = spconv_tpu.SparseConv3d(4, 8, 3, stride=2, padding=1,
                                     algo="block", key=jax.random.PRNGKey(0))
        sb = spconv_tpu.SubMConv3d(8, 8, 3, algo="block",
                                   key=jax.random.PRNGKey(1))
        db.weight, db.bias = dn.weight, dn.bias
        sb.weight, sb.bias = sn.weight, sn.bias
        yn = sn(dn(x))
        mid = db(x)
        from spconv_tpu.ops import brick as B
        assert B.find_brick_meta(mid) is not None
        yb = sb(mid)
        assert yb.features.shape[0] == mid.features.shape[0]  # meta reused
        assert_sparse_allclose(
            np.asarray(yn.features), np.asarray(yn.indices),
            np.asarray(yb.features), np.asarray(yb.indices),
            atol=1e-4,
        )


class TestBlockPool:
    @pytest.mark.parametrize("mode", ["max", "mean"])
    @pytest.mark.parametrize("shape", [(8, 12, 12), (9, 13, 11)])
    def test_pool_matches_native(self, rng, mode, shape):
        cls = (spconv_tpu.SparseMaxPool3d if mode == "max"
               else spconv_tpu.SparseAvgPool3d)
        x = _make_input(shape, 150, 5, rng, batch_size=2)
        pool = cls(2, 2)
        yn = pool(x)
        xb = B.pack_tensor(x, brick_shape=(2, 2, 2))
        yb = pool(xb)
        assert B.find_brick_meta(yb) is not None  # output is brick-packed
        assert_sparse_allclose(
            np.asarray(yn.features), np.asarray(yn.indices),
            np.asarray(yb.features), np.asarray(yb.indices),
            atol=1e-5,
        )
        assert int(yn.num_voxels) == int(yb.num_voxels)

    def test_full_stage_pipeline(self, rng):
        """conv-conv-pool ×2 in block mode vs native (the bench topology)."""
        shape = (16, 16, 16)
        x = _make_input(shape, 200, 3, rng)
        keys = [jax.random.PRNGKey(i) for i in range(4)]
        convs_n = [
            spconv_tpu.SubMConv3d(3, 8, 3, bias=False, key=keys[0]),
            spconv_tpu.SubMConv3d(8, 8, 3, bias=False, key=keys[1]),
            spconv_tpu.SubMConv3d(8, 16, 3, bias=False, key=keys[2]),
            spconv_tpu.SubMConv3d(16, 16, 3, bias=False, key=keys[3]),
        ]
        convs_b = [
            spconv_tpu.SubMConv3d(3, 8, 3, bias=False, algo="block", key=keys[0]),
            spconv_tpu.SubMConv3d(8, 8, 3, bias=False, algo="block", key=keys[1]),
            spconv_tpu.SubMConv3d(8, 16, 3, bias=False, algo="block", key=keys[2]),
            spconv_tpu.SubMConv3d(16, 16, 3, bias=False, algo="block", key=keys[3]),
        ]
        for cn, cb in zip(convs_n, convs_b):
            cb.weight = cn.weight
        pool = spconv_tpu.SparseMaxPool3d(2, 2)

        def run(convs, t):
            t = convs[0](t)
            t = convs[1](t)
            t = pool(t)
            t = convs[2](t)
            t = convs[3](t)
            t = pool(t)
            return t

        yn = run(convs_n, x)
        yb = run(convs_b, x)
        assert_sparse_allclose(
            np.asarray(yn.features), np.asarray(yn.indices),
            np.asarray(yb.features), np.asarray(yb.indices),
            atol=1e-4,
        )

    def test_centerpoint_encoder_block_matches_native(self, rng):
        """Full SECOND/CenterPoint encoder (subm blocks + strided downs +
        mixed-stride conv_out + residuals) in block mode vs native."""
        from spconv_tpu.models import centerpoint_encoder

        shape = (21, 16, 16)
        x = _make_input(shape, 180, 5, rng)
        nn = centerpoint_encoder(in_channels=5, bn=False,
                                 key=jax.random.PRNGKey(0))
        nb = centerpoint_encoder(in_channels=5, bn=False, algo="block",
                                 key=jax.random.PRNGKey(0))
        bev_n = np.asarray(nn.bev(x))
        bev_b = np.asarray(nb.bev(x))
        np.testing.assert_allclose(bev_b, bev_n, atol=2e-3, rtol=1e-3)

    def test_pipeline_under_jit(self, rng):
        shape = (8, 8, 8)
        x = _make_input(shape, 100, 4, rng)
        conv = spconv_tpu.SubMConv3d(4, 8, 3, algo="block",
                                     key=jax.random.PRNGKey(0))
        pool = spconv_tpu.SparseMaxPool3d(2, 2)

        @jax.jit
        def f(m, feats, inds):
            t = SparseConvTensor(feats, inds, shape, 1)
            return pool(m(t)).features

        out = f(conv, x.features, x.indices)
        out_eager = pool(conv(x)).features
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_eager),
                                   atol=1e-5)
