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


def test_quantize_encoder_end_to_end(rng):
    """Whole-encoder PTQ (quantize_encoder): int8 output tracks the fp
    encoder within quantization error, incl. residual-fused blocks."""
    import spconv_tpu
    from spconv_tpu.models import SparseEncoder
    from spconv_tpu.quantization import quantize_encoder

    shape = (8, 12, 12)
    feats, inds = generate_sparse_data(shape, 150, 4, batch_size=1,
                                       rng=rng)
    key = inds[:, 0].astype(np.int64)
    for a, s in enumerate(shape):
        key = key * s + inds[:, a + 1]
    order = np.argsort(key, kind="stable")
    feats, inds = feats[order], inds[order]
    fb = np.zeros((256, 4), np.float32)
    ib = np.full((256, 4), -1, np.int32)
    fb[:len(inds)] = feats
    ib[:len(inds)] = inds
    x = spconv_tpu.SparseConvTensor(jnp.asarray(fb), jnp.asarray(ib),
                                    shape, 1, keys_sorted=True)

    enc = SparseEncoder(in_channels=4, base_channels=8, channels=(8, 16),
                        blocks_per_stage=1, out_channels=16, bn=False,
                        out_bounds=(256,), key=jax.random.PRNGKey(7))
    qenc = quantize_encoder(enc, [x])

    ref = enc(x)
    out = qenc(x)
    rf = np.asarray(ref.features, np.float32)
    of = np.asarray(out.features, np.float32)
    assert of.shape == rf.shape
    scale = np.abs(rf).max()
    err = np.abs(of - rf).max() / max(scale, 1e-9)
    l2 = np.linalg.norm(of - rf) / max(np.linalg.norm(rf), 1e-9)
    # int8 PTQ error through 5 conv layers on random (worst-case) data;
    # the reference's int8 dev script tolerates similar drift
    assert err < 0.25, f"int8 max rel err {err:.3f}"
    assert l2 < 0.1, f"int8 L2 rel err {l2:.3f}"
    # int8 layers actually used (not a silent fp path)
    from spconv_tpu.quantization.encoder import QuantizedSparseBasicBlock
    kinds = [type(l).__name__ for l in qenc.layers]
    assert "QuantizedSparseConv" in kinds
    assert "QuantizedSparseBasicBlock" in kinds


def test_int8_inverse_conv(rng):
    """int8 SparseInverseConv: gather path swaps pair roles and outputs
    the encoder's input sites (reference conv.py:348-363); the fused DG
    inverse kernel matches it in interpret mode."""
    from spconv_tpu.quantization.quantize import (
        QuantizedSparseConv, _int8_gather_mm)

    shape = (8, 10, 12)
    c, k_mid, k_out = 4, 8, 4
    x = make_input(rng, shape=shape, n=150, c=c, batch=1, nbuf=256)
    xq = x.replace_feature(
        jnp.asarray(rng.randint(-90, 90, (256, c)), jnp.int8))
    xq = xq.replace_feature(
        jnp.where(xq.valid_mask[:, None], xq.features, 0))

    down = spconv_tpu.SparseConv3d(c, k_mid, 3, stride=2, padding=1,
                                   indice_key="d0", bias=False,
                                   out_bound=256,
                                   key=jax.random.PRNGKey(1))
    inv = spconv_tpu.SparseInverseConv3d(k_mid, k_out, 3,
                                         indice_key="d0", bias=False,
                                         key=jax.random.PRNGKey(2))
    qd = QuantizedSparseConv(down, np.full(k_mid, 0.02, np.float32),
                             0.05, 0.8)
    qi = QuantizedSparseConv(inv, np.full(k_out, 0.03, np.float32),
                             0.8, 0.9)
    y = qd(xq)
    z = qi(y)

    data = y.find_indice_pair("d0")
    wkv = jnp.transpose(qi.weight_i8.reshape(k_out, 27, k_mid), (1, 2, 0))
    acc = _int8_gather_mm(y.features, wkv, data.pair_bwd, None)
    ref = acc.astype(jnp.float32) * (0.8 * np.full(k_out, 0.03)) / 0.9
    ref = jnp.clip(jnp.round(ref), -127, 127).astype(jnp.int8)
    valid = np.asarray(x.indices[:, 0] >= 0)
    np.testing.assert_array_equal(np.asarray(z.features)[valid],
                                  np.asarray(ref)[valid])
    assert z.spatial_shape == x.spatial_shape


def test_dg_int8_inverse_kernel(rng):
    """Fused int8 DG inverse kernel vs the gather-swap reference."""
    from spconv_tpu.ops import coords as C
    from spconv_tpu.ops.pallas.dg_conv import dg_regular_conv_q
    from spconv_tpu.ops.rulebook import build_conv_rulebook
    from spconv_tpu.quantization.quantize import _int8_gather_mm
    from utils import generate_sparse_data

    shape = (8, 10, 12)
    c, k_out = 8, 8
    feats, inds = generate_sparse_data(shape, 200, c, batch_size=1,
                                       rng=rng)
    key = inds[:, 0].astype(np.int64)
    for a, s in enumerate(shape):
        key = key * s + inds[:, a + 1]
    order = np.argsort(key, kind="stable")
    inds = inds[order]
    ib = np.full((256, 4), -1, np.int32)
    ib[:len(inds)] = inds
    inds_j = jnp.asarray(ib)
    in_keys, _ = C.linearize(inds_j, shape, 1)

    data = build_conv_rulebook(
        inds_j, spatial_shape=shape, batch_size=1, ksize=(3, 3, 3),
        stride=(2, 2, 2), padding=(1, 1, 1), dilation=(1, 1, 1),
        out_bound=256)
    out_shape = tuple(int(v) for v in data.out_spatial_shape)
    out_keys, _ = C.linearize(data.out_indices, out_shape, 1)
    # encoder outputs are key-sorted by construction of the builder
    assert bool(jnp.all(out_keys[1:] >= out_keys[:-1]))

    nb = data.out_indices.shape[0]
    fi8 = jnp.asarray(rng.randint(-90, 90, (nb, c)), jnp.int8)
    fi8 = jnp.where(data.out_indices[:, :1] >= 0, fi8, 0)
    wi8 = jnp.asarray(rng.randint(-60, 60, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)

    out, _ = dg_regular_conv_q(
        fi8, in_keys, out_keys, wi8, scale, None,
        in_shape=shape, out_shape=out_shape, batch_size=1,
        stride=(2, 2, 2), padding=(1, 1, 1), dilation=(1, 1, 1),
        act="relu", out_dtype=jnp.int8, inverse=True, interpret=True)

    wkv = jnp.transpose(wi8.reshape(k_out, 27, c), (1, 2, 0))
    acc = _int8_gather_mm(fi8, wkv, data.pair_bwd, None)
    y = jnp.maximum(acc.astype(jnp.float32) * scale[None, :], 0)
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    valid = np.asarray(ib[:, 0] >= 0)
    np.testing.assert_array_equal(np.asarray(out)[valid],
                                  np.asarray(ref)[valid])
