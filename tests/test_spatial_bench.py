"""RemoveDuplicate (parity: ``spconv/pytorch/spatial.py:28``) and
per-layer device-time recording under ``benchmark=True``
(parity: ``spconv/pytorch/conv.py:201-224``)."""

import numpy as np

import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import RemoveDuplicate, SparseConvTensor


def test_remove_duplicate():
    shape = (8, 9, 10)
    inds = np.array([
        [0, 1, 2, 3],
        [0, 1, 2, 3],   # dup of row 0
        [0, 4, 5, 6],
        [0, 0, 0, 0],
        [0, 4, 5, 6],   # dup of row 2
        [-1, -1, -1, -1],
    ], np.int32)
    feats = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    t = SparseConvTensor(jnp.asarray(feats), jnp.asarray(inds), shape, 1)
    out = RemoveDuplicate()(t)
    assert int(out.num_voxels) == 3
    oi = np.asarray(out.indices)
    valid = oi[:, 0] >= 0
    assert valid.sum() == 3
    got = {tuple(r) for r in oi[valid]}
    assert got == {(0, 1, 2, 3), (0, 4, 5, 6), (0, 0, 0, 0)}
    # kept features come from SOME original row with that coordinate
    of = np.asarray(out.features)
    for r, f in zip(oi[valid], of[valid]):
        srcs = np.where((inds == r).all(1))[0]
        assert any(np.allclose(f, feats[s]) for s in srcs)
    # invalid rows zeroed; output is key-sorted with invalid tail
    assert np.all(of[~valid] == 0)
    assert out.keys_sorted
    # idempotent under jit
    out2 = jax.jit(lambda tt: RemoveDuplicate()(tt))(out)
    assert int(out2.num_voxels) == 3


def test_benchmark_records_per_layer_time():
    rng = np.random.RandomState(0)
    shape = (16, 16, 16)
    n = 64
    flat = rng.choice(np.prod(shape), n, replace=False)
    coords = np.stack(np.unravel_index(flat, shape), -1)
    inds = np.concatenate([np.zeros((n, 1), np.int32),
                           coords.astype(np.int32)], 1)
    feats = rng.randn(n, 8).astype(np.float32)
    x = SparseConvTensor(jnp.asarray(feats), jnp.asarray(inds), shape, 1,
                         benchmark=True).sort_by_key()
    x.benchmark = True  # sort_by_key preserves it, but be explicit
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(8, 8, 3, indice_key="b0", algo="native",
                              name="conv_a", key=jax.random.PRNGKey(0)),
        spconv_tpu.SparseMaxPool3d(2, 2, name="pool_a"),
    )
    out = net(x)
    rec = out.benchmark_record
    assert "conv_a" in rec and "pool_a" in rec
    # eager pass → measured per-layer time present and positive
    assert rec["conv_a"]["time_ms"] is not None
    assert rec["conv_a"]["time_ms"] > 0
    assert rec["pool_a"]["time_ms"] > 0
    assert rec["conv_a"]["num_voxels_in"] == n

    # inside jit: records exist, time is None (profiler scopes cover it)
    @jax.jit
    def step(f, i):
        t = SparseConvTensor(f, i, shape, 1, benchmark=True,
                             keys_sorted=True)
        return net(t).features

    step(x.features, x.indices)  # must trace without leaking tracers
