"""Quantization stack tests: BN fold exactness, int8 PTQ end-to-end
accuracy vs fp32 (parity method: reference develop/mnist_int8_dev.py
checks int8 output close to fp32)."""

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.quantization import (
    calibrate, convert_to_int8, fuse_conv_bn, fuse_bn_act_in_sequential,
    quantize_tensor, dequantize, MinMaxObserver)
from utils import generate_sparse_data, pad_sparse


def make_input(rng, shape=(9, 10, 11), n=120, c=4, batch=2, nbuf=280):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=batch, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p), shape,
                            batch)


def test_fuse_conv_bn_exact(rng):
    x = make_input(rng)
    conv = spconv_tpu.SubMConv3d(4, 8, 3, bias=True, indice_key="c")
    bn = spconv_tpu.BatchNorm1d(8)
    # non-trivial running stats
    bn = bn.replace(
        running_mean=jnp.asarray(rng.uniform(-1, 1, 8).astype(np.float32)),
        running_var=jnp.asarray(rng.uniform(0.5, 2, 8).astype(np.float32)),
        weight=jnp.asarray(rng.uniform(0.5, 1.5, 8).astype(np.float32)),
        bias=jnp.asarray(rng.uniform(-1, 1, 8).astype(np.float32)))
    want = bn(conv(x)).features
    fused = fuse_conv_bn(conv, bn)
    got = fused(x).features
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fuse_bn_act_sequential(rng):
    x = make_input(rng)
    seq = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, bias=False, indice_key="c1"),
        spconv_tpu.BatchNorm1d(8),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SubMConv3d(8, 8, 3, bias=True, indice_key="c1"),
    )
    fused = fuse_bn_act_in_sequential(seq)
    assert len(fused.layers) == 2
    assert fused.layers[0].act_type == "relu"
    want = seq(x).features
    got = fused(x).features
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_int8_ptq_end_to_end(rng):
    x = make_input(rng)
    seq = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 16, 3, bias=False, indice_key="c1"),
        spconv_tpu.BatchNorm1d(16),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SubMConv3d(16, 16, 3, bias=True, indice_key="c1"),
        spconv_tpu.SparseReLU(),
    )
    calib = [make_input(np.random.RandomState(s)) for s in range(3)]
    fused, obs = calibrate(seq, calib)
    qnet = convert_to_int8(fused, obs)

    want = np.asarray(fused(x).features)
    xq = x.replace_feature(quantize_tensor(x.features, obs[0].scale))
    got_q = qnet(xq)
    got = np.asarray(dequantize(got_q.features, qnet.layers[-1].output_scale
                                if hasattr(qnet.layers[-1], 'output_scale')
                                else qnet.layers[-2].output_scale))
    valid = np.asarray(x.valid_mask)
    err = np.abs(got[valid] - want[valid])
    rel = err.mean() / (np.abs(want[valid]).mean() + 1e-6)
    assert rel < 0.1, f"int8 PTQ relative error too high: {rel}"


def test_conv_act_fusion_matches_separate(rng):
    x = make_input(rng)
    c1 = spconv_tpu.SubMConv3d(4, 8, 3, bias=True, indice_key="a",
                               act_type="relu")
    c2 = spconv_tpu.SubMConv3d(4, 8, 3, bias=True, indice_key="a")
    c2 = c2.replace(weight=c1.weight, bias=c1.bias)
    got = c1(x).features
    want = jnp.where(c2(x).valid_mask[:, None],
                     jax.nn.relu(c2(x).features), 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_conv_residual_add_input(rng):
    x = make_input(rng)
    c = spconv_tpu.SubMConv3d(4, 4, 3, bias=False, indice_key="a")
    base = c(x)
    fused = c(x, add_input=x)
    np.testing.assert_allclose(
        np.asarray(fused.features),
        np.asarray(base.features + x.features), atol=1e-5)
