"""QAT: STE gradients, scale observation, QAT→int8 conversion."""

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.quantization.qat import (QATConvBnReLU, fake_quant,
                                         finalize_qat)
from spconv_tpu.quantization import quantize_tensor, dequantize
from utils import generate_sparse_data, pad_sparse


def make_input(rng, nbuf=280):
    feats, inds = generate_sparse_data((9, 10, 11), 120, 4, batch_size=2,
                                       rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p),
                            (9, 10, 11), 2)


def test_fake_quant_ste():
    x = jnp.asarray([0.1, -0.27, 0.5])
    s = jnp.asarray(0.1)
    y = fake_quant(x, s)
    np.testing.assert_allclose(np.asarray(y), [0.1, -0.3, 0.5], atol=1e-6)
    # STE: gradient of sum(fq(x)) wrt x is 1
    g = jax.grad(lambda v: jnp.sum(fake_quant(v, s)))(x)
    np.testing.assert_allclose(np.asarray(g), [1, 1, 1], atol=1e-6)


def test_qat_module_trains_and_converts(rng):
    x = make_input(rng)
    # explicit key: module init otherwise depends on a process-global
    # counter, making the quantization-error margin order-dependent
    conv = spconv_tpu.SubMConv3d(4, 8, 3, bias=False, indice_key="q",
                                 key=jax.random.PRNGKey(11))
    bn = spconv_tpu.BatchNorm1d(8)
    qm = QATConvBnReLU(conv, bn, relu=True)

    # observe updates scales
    qm2 = qm.observe(x)
    assert float(qm2.act_scale) != float(qm.act_scale)

    # grads flow through fake-quant to the weights
    def loss(m, t):
        return jnp.mean(m(t, training=True).features ** 2)

    _, grads = spconv_tpu.filter_value_and_grad(loss)(qm2, x)
    gw = grads.conv.weight
    assert float(jnp.abs(gw).sum()) > 0

    # finalize → int8 module runs and roughly matches the fake-quant net
    # (eval mode: running BN stats)
    for _ in range(3):
        qm2 = qm2.observe(x)
        qm2 = qm2.replace(bn=qm2.bn.updated(qm2.conv(x)))
    input_scale = float(jnp.max(jnp.abs(x.features)) / 127.0)
    qconv = finalize_qat(qm2, input_scale)
    xq = x.replace_feature(quantize_tensor(x.features, input_scale))
    out_q = qconv(xq)
    got = np.asarray(dequantize(out_q.features, qconv.output_scale))
    want = np.asarray(qm2(x, training=False).features, np.float32)
    valid = np.asarray(x.valid_mask)
    rel = np.abs(got[valid] - want[valid]).mean() / (
        np.abs(want[valid]).mean() + 1e-6)
    assert rel < 0.25, rel
