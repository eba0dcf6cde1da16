"""Multi-device data parallelism on the 8-device virtual CPU mesh
(parity role: reference delegates to Horovod in ``test/fake_dist_train.py``;
here DP is native shard_map + psum)."""

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu.parallel import (
    make_mesh, data_parallel_value_and_grad, stack_sparse_batch)
from spconv_tpu.core import SparseConvTensor
from utils import generate_sparse_data, pad_sparse


def make_net(key):
    return spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="c1",
                              key=jax.random.PRNGKey(1)),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SparseConv3d(8, 16, 3, stride=2, padding=1,
                                key=jax.random.PRNGKey(2)),
    )


def make_scan(seed, shape=(9, 10, 11), nbuf=256):
    rng = np.random.RandomState(seed)
    feats, inds = generate_sparse_data(shape, 100, 4, batch_size=1, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p), shape, 1)


def test_dp_grads_match_single_device():
    assert jax.device_count() >= 8, "conftest should give 8 cpu devices"
    shape = (9, 10, 11)
    net = make_net(jax.random.PRNGKey(0))
    scans = [make_scan(s) for s in range(8)]
    feats, inds = stack_sparse_batch(scans)

    def loss_fn(m, f, i):
        x = SparseConvTensor(f, i, shape, 1)
        out = m(x)
        pooled = spconv_tpu.SparseGlobalAvgPool()(out)
        return jnp.sum(pooled ** 2)

    mesh = make_mesh(8)
    step = data_parallel_value_and_grad(loss_fn, mesh)
    loss_dp, grads_dp = jax.jit(step)(net, feats, inds)

    # single-device reference: mean over the same 8 scans
    def loss_all(m):
        return sum(loss_fn(m, t.features, t.indices) for t in scans) / 8.0

    loss_1, grads_1 = spconv_tpu.filter_value_and_grad(loss_all)(net)
    np.testing.assert_allclose(float(loss_dp), float(loss_1), rtol=1e-5)
    for g_dp, g_1 in zip(jax.tree_util.tree_leaves(grads_dp),
                         jax.tree_util.tree_leaves(grads_1)):
        np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_1),
                                   atol=1e-5, rtol=1e-4)


def test_sync_bn_matches_global_stats():
    """SyncBN with psum == BN over the concatenated batch."""
    shape = (9, 10, 11)
    scans = [make_scan(100 + s) for s in range(4)]
    feats, inds = stack_sparse_batch(scans[:4])
    bn_sync = spconv_tpu.SparseSyncBatchNorm(4, affine=False, axis_name="dp")
    mesh = make_mesh(4)

    def shard_fn(f, i):
        x = SparseConvTensor(f[0], i[0], shape, 1)
        return bn_sync(x, training=True).features[None]

    from jax.sharding import PartitionSpec as P
    out = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P("dp"), P("dp")),
        out_specs=P("dp")))(feats, inds)
    out = np.asarray(out)

    # golden: global masked stats over all 4 scans
    all_f = np.concatenate([np.asarray(t.features) for t in scans[:4]])
    all_m = np.concatenate([np.asarray(t.valid_mask) for t in scans[:4]])
    f = all_f[all_m]
    mean, var = f.mean(0), f.var(0)
    want = (f - mean) / np.sqrt(var + 1e-5)  # torch-default eps
    got = np.concatenate([out[s][np.asarray(scans[s].valid_mask)]
                          for s in range(4)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_channel_parallel_conv_matches_single_device(rng):
    """Column-parallel conv (K sharded over 8 virtual devices) equals the
    single-device layer."""
    import spconv_tpu
    from spconv_tpu.parallel import channel_parallel_conv, make_mesh
    from utils import generate_sparse_data

    shape = (9, 10, 11)
    c, k_out = 8, 16
    feats, inds = generate_sparse_data(shape, 200, c, batch_size=1,
                                       rng=rng)
    fb = np.zeros((256, c), np.float32)
    ib = np.full((256, 4), -1, np.int32)
    fb[: len(inds)] = feats
    ib[: len(inds)] = inds
    feats, inds = jnp.asarray(fb), jnp.asarray(ib)

    conv = spconv_tpu.SubMConv3d(c, k_out, 3, indice_key="t0",
                                 key=jax.random.PRNGKey(3))
    mesh = make_mesh(8, axis="tp")
    fn = channel_parallel_conv(conv, mesh, axis="tp")
    of, oi = jax.jit(
        lambda w, b, f, i: fn(w, b, f, i, shape, 1)
    )(conv.weight, conv.bias, feats, inds)

    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1)
    ref = conv(x)
    np.testing.assert_allclose(np.asarray(of),
                               np.asarray(ref.features), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(ref.indices))
