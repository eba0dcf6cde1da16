"""Round-2 correctness fixes: two-word big-grid keys, inverse num_voxels,
rulebook-reuse validation, BN torch defaults, Sequential training flag,
HashTable sentinel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spconv_tpu
from spconv_tpu.core import SparseConvTensor
from spconv_tpu.ops import coords as C
from spconv_tpu.ops.rulebook import build_conv_rulebook, build_subm_rulebook

from utils import generate_sparse_data, pad_sparse


@pytest.fixture
def force_pair_keys(monkeypatch):
    """Force the two-word key path on small grids."""
    monkeypatch.setattr(C, "_KEY32_LIMIT", 2 ** 10)
    monkeypatch.setattr(C, "_LO_LIMIT", 2 ** 5)
    yield


def _rulebook_fields(data):
    return {
        "pair_fwd": np.asarray(data.pair_fwd),
        "pair_bwd": np.asarray(data.pair_bwd),
        "out_indices": np.asarray(data.out_indices),
        "num_out": int(data.num_out),
    }


class TestPairKeys:
    def test_linearize_roundtrip_pair(self, force_pair_keys, rng):
        shape = (7, 9, 11)
        feats, inds = generate_sparse_data(shape, 50, 1, batch_size=2, rng=rng)
        f, i = pad_sparse(feats, inds, 128)
        i = jnp.asarray(i)
        keys, sent = C.linearize(i, shape, 2)
        assert keys.ndim == 2 and keys.shape[1] == 2
        back = C.delinearize(keys, shape, i[:, 0] >= 0)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(i))

    def test_argsort_keys_lexicographic(self, force_pair_keys, rng):
        hi = rng.randint(0, 5, size=200).astype(np.int32)
        lo = rng.randint(0, 7, size=200).astype(np.int32)
        keys = jnp.asarray(np.stack([hi, lo], -1))
        order = np.asarray(C.argsort_keys(keys))
        combined = hi.astype(np.int64) * 1000 + lo
        np.testing.assert_array_equal(np.sort(combined), combined[order])

    @pytest.mark.parametrize("subm", [True, False])
    def test_rulebook_pair_vs_int32(self, rng, monkeypatch, subm):
        shape = (7, 9, 11)
        feats, inds = generate_sparse_data(shape, 60, 1, batch_size=2, rng=rng)
        f, i = pad_sparse(feats, inds, 128)
        i = jnp.asarray(i)
        kwargs = dict(spatial_shape=shape, batch_size=2, ksize=(3, 3, 3),
                      dilation=(1, 1, 1))
        if subm:
            ref = build_subm_rulebook(i, **kwargs)
        else:
            ref = build_conv_rulebook(
                i, spatial_shape=shape, batch_size=2, ksize=(3, 3, 3),
                stride=(2, 2, 2), padding=(1, 1, 1), dilation=(1, 1, 1),
                out_bound=128,
            )
        ref_fields = _rulebook_fields(ref)

        monkeypatch.setattr(C, "_KEY32_LIMIT", 2 ** 6)
        monkeypatch.setattr(C, "_LO_LIMIT", 2 ** 5)
        # new jit cache entry: key layout differs → different jaxpr
        build_subm_rulebook.clear_cache()
        build_conv_rulebook.clear_cache()
        try:
            if subm:
                got = build_subm_rulebook(i, **kwargs)
            else:
                got = build_conv_rulebook(
                    i, spatial_shape=shape, batch_size=2, ksize=(3, 3, 3),
                    stride=(2, 2, 2), padding=(1, 1, 1), dilation=(1, 1, 1),
                    out_bound=128,
                )
            got_fields = _rulebook_fields(got)
        finally:
            build_subm_rulebook.clear_cache()
            build_conv_rulebook.clear_cache()
        for k in ref_fields:
            np.testing.assert_array_equal(ref_fields[k], got_fields[k], err_msg=k)

    def test_point2voxel_pair_keys(self, monkeypatch, rng):
        from spconv_tpu.ops.point2voxel import point_to_voxel

        pts = rng.uniform(0, 4.0, size=(300, 3)).astype(np.float32)
        kwargs = dict(
            vsize_xyz=(0.25, 0.25, 0.25),
            coors_range_xyz=(0, 0, 0, 4, 4, 4),
            max_num_voxels=256,
            max_num_points_per_voxel=4,
        )
        ref = point_to_voxel(jnp.asarray(pts), **kwargs)
        monkeypatch.setattr(C, "_KEY32_LIMIT", 2 ** 6)
        monkeypatch.setattr(C, "_LO_LIMIT", 2 ** 5)
        point_to_voxel.clear_cache()
        try:
            got = point_to_voxel(jnp.asarray(pts), **kwargs)
        finally:
            point_to_voxel.clear_cache()
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_huge_grid_no_silent_truncation(self):
        # two distinct coords on a 2048x2048x1024 grid must get distinct keys
        shape = (2048, 2048, 1024)
        inds = jnp.asarray(
            [[0, 2047, 2047, 1023], [0, 2047, 2047, 1022]], jnp.int32
        )
        keys, sent = C.linearize(inds, shape, 1)
        k = np.asarray(keys)
        assert not np.array_equal(k[0], k[1])
        assert not np.asarray(C.is_sentinel(keys, sent)).any()


class TestModuleFixes:
    def test_inverse_num_voxels(self, rng):
        shape = (8, 8, 8)
        feats, inds = generate_sparse_data(shape, 40, 4, rng=rng)
        f, i = pad_sparse(feats, inds, 64)
        x = SparseConvTensor(jnp.asarray(f), jnp.asarray(i), shape, 1)
        enc = spconv_tpu.SparseConv3d(4, 8, 3, stride=2, padding=1,
                                      indice_key="ds", out_bound=64,
                                      key=jax.random.PRNGKey(0))
        dec = spconv_tpu.SparseInverseConv3d(8, 4, 3, indice_key="ds",
                                             key=jax.random.PRNGKey(1))
        y = enc(x)
        z = dec(y)
        n_active = int(jnp.sum((z.indices[:, 0] >= 0).astype(jnp.int32)))
        assert int(z.num_voxels) == n_active == 40

    def test_nonsubm_reuse_mismatch_raises(self, rng):
        shape = (8, 8, 8)
        feats, inds = generate_sparse_data(shape, 30, 4, rng=rng)
        f, i = pad_sparse(feats, inds, 64)
        x = SparseConvTensor(jnp.asarray(f), jnp.asarray(i), shape, 1)
        c1 = spconv_tpu.SparseConv3d(4, 8, 3, stride=2, padding=1,
                                     indice_key="k", out_bound=64,
                                     key=jax.random.PRNGKey(0))
        c2 = spconv_tpu.SparseConv3d(8, 8, 3, stride=1, padding=1,
                                     indice_key="k", out_bound=64,
                                     key=jax.random.PRNGKey(1))
        y = c1(x)
        with pytest.raises(ValueError, match="reuse mismatch"):
            c2(y)

    def test_subm_reuse_dilation_mismatch_raises(self, rng):
        shape = (8, 8, 8)
        feats, inds = generate_sparse_data(shape, 30, 4, rng=rng)
        f, i = pad_sparse(feats, inds, 64)
        x = SparseConvTensor(jnp.asarray(f), jnp.asarray(i), shape, 1)
        c1 = spconv_tpu.SubMConv3d(4, 8, 3, indice_key="s",
                                   key=jax.random.PRNGKey(0))
        c2 = spconv_tpu.SubMConv3d(8, 8, 3, dilation=2, indice_key="s",
                                   key=jax.random.PRNGKey(1))
        y = c1(x)
        with pytest.raises(AssertionError, match="dilation"):
            c2(y)

    def test_bn_torch_defaults(self):
        bn = spconv_tpu.SparseBatchNorm(8)
        assert bn.eps == 1e-5
        assert bn.momentum == 0.1

    def test_sequential_training_flag(self, rng):
        shape = (8, 8, 8)
        feats, inds = generate_sparse_data(shape, 40, 4, rng=rng)
        f, i = pad_sparse(feats, inds, 64)
        x = SparseConvTensor(jnp.asarray(f) * 5.0 + 3.0, jnp.asarray(i),
                             shape, 1)
        seq = spconv_tpu.SparseSequential(
            spconv_tpu.SparseBatchNorm(4),
        )
        out_eval = seq(x)
        out_train = seq(x, training=True)
        # eval mode uses fresh running stats (mean 0 / var 1) → features
        # unchanged; training mode normalizes with batch stats → mean ~0
        mask = np.asarray(x.indices[:, 0] >= 0)
        fe = np.asarray(out_eval.features)[mask]
        ft = np.asarray(out_train.features)[mask]
        np.testing.assert_allclose(fe, np.asarray(x.features)[mask], atol=1e-3)
        assert abs(ft.mean()) < 0.05
        # works under jit too (BN batch-stats inside a container)
        out_jit = jax.jit(
            lambda m, t: m(t, training=True).features
        )(seq, x)
        np.testing.assert_allclose(np.asarray(out_jit)[mask], ft, atol=1e-5)

    def test_hashtable_int64_guard(self):
        if jax.config.jax_enable_x64:
            pytest.skip("x64 enabled")
        with pytest.raises(ValueError, match="x64"):
            spconv_tpu.HashTable(16, key_dtype=jnp.int64)
