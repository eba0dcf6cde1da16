"""Fused sorted-key conv kernel vs rulebook+gather golden path.

Covers: fwd equality, input/weight grads, bounds handling at grid edges,
pad rows, non-cubic kernels, dilation, 2d, fallback on unsorted keys.
Interpret mode (no TPU in CI).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spconv_tpu.ops import coords as C
from spconv_tpu.ops.gather_gemm import indice_conv
from spconv_tpu.ops.pallas.sorted_conv import (
    build_sk_plans, sk_subm_conv, subm_key_deltas)
from spconv_tpu.ops.rulebook import build_subm_rulebook

from utils import generate_sparse_data


def _sorted_input(rng, shape, n, c, nbuf, batch_size=1):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=batch_size,
                                       rng=rng)
    nbuf = max(nbuf, -(-inds.shape[0] // 128) * 128)
    key = inds[:, 0].astype(np.int64)
    for a, s in enumerate(shape):
        key = key * s + inds[:, a + 1]
    order = np.argsort(key, kind="stable")
    inds, feats = inds[order], feats[order]
    fb = np.zeros((nbuf, c), np.float32)
    ib = np.full((nbuf, inds.shape[1]), -1, np.int32)
    fb[: len(inds)] = feats
    ib[: len(inds)] = inds
    return jnp.asarray(fb), jnp.asarray(ib)


def _keys_of(inds, shape, batch_size):
    keys, sent = C.linearize(inds, shape, batch_size)
    return keys, int(sent)


@pytest.mark.parametrize(
    "shape,ksize,dilation,batch",
    [
        ((11, 13, 17), (3, 3, 3), (1, 1, 1), 1),
        ((11, 13, 17), (3, 1, 3), (1, 1, 1), 1),
        ((15, 15, 15), (3, 3, 3), (2, 1, 2), 1),
        ((9, 40, 40), (3, 3, 3), (1, 1, 1), 2),
        ((25, 25), (3, 3), (1, 1), 1),
    ],
)
def test_sk_conv_fwd_matches_rulebook(rng, shape, ksize, dilation, batch):
    ndim = len(shape)
    c, k_out = 8, 16
    n = 300
    nbuf = 512
    feats, inds = _sorted_input(rng, shape, n, c, nbuf, batch)
    keys, sent = _keys_of(inds, shape, batch)
    w = jnp.asarray(rng.randn(k_out, *ksize, c).astype(np.float32) * 0.1)

    out = sk_subm_conv(
        feats, inds, keys, w, spatial_shape=shape, batch_size=batch,
        dilation=dilation, tile=128, window=256, interpret=True,
    )
    data = build_subm_rulebook(
        inds, spatial_shape=shape, batch_size=batch, ksize=ksize,
        dilation=dilation)
    ref = indice_conv(feats, w, data.pair_fwd, data.pair_bwd, is_subm=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-2, atol=1e-2)


def test_sk_conv_grads_match(rng):
    shape = (11, 13, 17)
    c, k_out, n, nbuf = 8, 8, 250, 384
    feats, inds = _sorted_input(rng, shape, n, c, nbuf)
    keys, sent = _keys_of(inds, shape, 1)
    w = jnp.asarray(rng.randn(k_out, 3, 3, 3, c).astype(np.float32) * 0.1)

    def loss_sk(f, ww):
        o = sk_subm_conv(
            f, inds, keys, ww, spatial_shape=shape, batch_size=1,
            dilation=(1, 1, 1), tile=128, window=256, interpret=True)
        return jnp.sum(o * o)

    data = build_subm_rulebook(
        inds, spatial_shape=shape, batch_size=1, ksize=(3, 3, 3),
        dilation=(1, 1, 1))

    def loss_ref(f, ww):
        o = indice_conv(f, ww, data.pair_fwd, data.pair_bwd, is_subm=True)
        return jnp.sum(o * o)

    g_sk = jax.grad(loss_sk, argnums=(0, 1))(feats, w)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(
        np.asarray(g_sk[0]), np.asarray(g_ref[0]), rtol=5e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(g_sk[1]), np.asarray(g_ref[1]), rtol=5e-2, atol=2e-2)


def test_sk_conv_fallback_on_unsorted(rng):
    """Unsorted keys must take the rulebook path and stay correct."""
    shape = (9, 9, 9)
    c, k_out, n, nbuf = 4, 4, 120, 256
    feats, inds = _sorted_input(rng, shape, n, c, nbuf)
    # shuffle active rows out of key order
    perm = np.concatenate([rng.permutation(n), np.arange(n, nbuf)])
    feats = feats[perm]
    inds = inds[perm]
    keys, sent = _keys_of(inds, shape, 1)
    assert bool(jnp.any(keys[1:] < keys[:-1]))
    w = jnp.asarray(rng.randn(k_out, 3, 3, 3, c).astype(np.float32) * 0.1)
    out = sk_subm_conv(
        feats, inds, keys, w, spatial_shape=shape, batch_size=1,
        dilation=(1, 1, 1), tile=128, window=256, interpret=True)
    data = build_subm_rulebook(
        inds, spatial_shape=shape, batch_size=1, ksize=(3, 3, 3),
        dilation=(1, 1, 1))
    ref = indice_conv(feats, w, data.pair_fwd, data.pair_bwd, is_subm=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-2, atol=1e-2)


def test_sk_plan_presence_and_deltas():
    """Key deltas match coordinate displacements on the linearized grid."""
    shape = (5, 7, 9)
    deltas, disp = subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    assert deltas.shape == (27,)
    assert deltas[13] == 0  # center
    # delta of offset (dz,dy,dx) = dz*7*9 + dy*9 + dx
    for k in range(27):
        dz, dy, dx = disp[k]
        assert deltas[k] == dz * 63 + dy * 9 + dx


def test_sk_module_path_and_cache(rng):
    """SubMConv3d(algo="sk") matches the native module path, and two
    layers sharing an indice_key reuse the cached SKData plans."""
    import spconv_tpu
    from spconv_tpu.ops.pallas.sorted_conv import SKData

    shape = (11, 13, 17)
    c = 8
    feats, inds = _sorted_input(rng, shape, 300, c, 512)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)

    kw = dict(bias=True, indice_key="s0", key=jax.random.PRNGKey(3))
    conv_sk = spconv_tpu.SubMConv3d(c, 16, 3, algo="sk", **kw)
    conv_nat = spconv_tpu.SubMConv3d(c, 16, 3, algo="native", **kw)
    conv_nat.weight = conv_sk.weight
    conv_nat.bias = conv_sk.bias

    y_sk = conv_sk(x)
    y_nat = conv_nat(x)
    np.testing.assert_allclose(
        np.asarray(y_sk.features), np.asarray(y_nat.features),
        rtol=1e-2, atol=1e-2,
    )

    # cache: one SKData record exists and a second sk layer reuses it
    sk_keys = [k for k in y_sk.indice_dict if k.startswith("__sk__")]
    assert len(sk_keys) == 1
    rec = y_sk.indice_dict[sk_keys[0]]
    assert isinstance(rec, SKData)

    conv_sk2 = spconv_tpu.SubMConv3d(16, 16, 3, algo="sk", bias=False,
                                     indice_key="s0",
                                     key=jax.random.PRNGKey(4))
    y2 = conv_sk2(y_sk)
    assert [k for k in y2.indice_dict if k.startswith("__sk__")] == sk_keys


def test_sk_int8_conv_vs_reference(rng):
    """int8 SK kernel vs the int8 gather reference (exact int32
    accumulation, fused scale/bias/relu epilogue)."""
    from spconv_tpu.ops.pallas.sorted_conv import sk_subm_conv_q
    from spconv_tpu.quantization.quantize import _int8_gather_mm

    shape = (11, 13, 17)
    c, k_out = 8, 16
    feats, inds = _sorted_input(rng, shape, 300, c, 512)
    keys, sent = _keys_of(inds, shape, 1)
    fi8 = jnp.asarray(rng.randint(-100, 100, feats.shape), jnp.int8)
    fi8 = jnp.where(inds[:, :1] >= 0, fi8, 0)
    wi8 = jnp.asarray(rng.randint(-80, 80, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1, 1, (k_out,)), jnp.float32)

    out = sk_subm_conv_q(
        fi8, keys, wi8, scale, bias, spatial_shape=shape, batch_size=1,
        dilation=(1, 1, 1), act="relu", out_dtype=jnp.int8,
        interpret=True)

    from spconv_tpu.ops.rulebook import build_subm_rulebook
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    wkv = jnp.transpose(wi8.reshape(k_out, 27, c), (1, 2, 0))
    acc = _int8_gather_mm(fi8, wkv, data.pair_fwd, 13)
    y = acc.astype(jnp.float32) * scale[None, :] + bias[None, :]
    y = jnp.maximum(y, 0.0)
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    valid = np.asarray(inds[:, 0] >= 0)
    np.testing.assert_array_equal(np.asarray(out)[valid],
                                  np.asarray(ref)[valid])


@pytest.mark.parametrize("mode", ["max", "mean"])
def test_sk_pool2_matches_rulebook(rng, mode):
    """Fused sorted-key pool vs rulebook gather-reduce (fwd + input
    grads, interpret mode)."""
    import spconv_tpu
    from spconv_tpu.ops.pallas import sorted_pool as SP
    from spconv_tpu.ops.pool import indice_avgpool, indice_maxpool
    from spconv_tpu.ops.rulebook import (build_pool2_outputs,
                                         build_pool2_rulebook)

    shape = (11, 14, 17)  # odd lead dim exercises edge clamping
    c = 8
    feats, inds = _sorted_input(rng, shape, 400, c, 512)
    feats = feats - 0.5  # negative values exercise max masking

    from spconv_tpu.ops import coords as CC
    out_shape = tuple(int(v) for v in CC.get_conv_output_size(
        shape, (2,) * 3, (2,) * 3, (0,) * 3, (1,) * 3))
    out_indices, out_keys, num_out, _total = build_pool2_outputs(
        inds, spatial_shape=shape, batch_size=1, out_bound=512)
    in_keys, _ = _keys_of(inds, shape, 1)

    geom = (shape, out_shape, 1, mode, 128, 512, True)
    out = SP.sk_pool2_ad(feats, in_keys, out_keys, inds, geom)

    data = build_pool2_rulebook(inds, spatial_shape=shape, batch_size=1,
                                out_bound=512)
    if mode == "max":
        ref = indice_maxpool(feats, data.pair_fwd)
    else:
        ref = indice_avgpool(feats, data.pair_fwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # grads
    cot = jnp.asarray(rng.randn(*np.asarray(ref).shape), jnp.float32)

    def loss_sk(f):
        return jnp.sum(SP.sk_pool2_ad(f, in_keys, out_keys, inds, geom)
                       * cot)

    def loss_ref(f):
        if mode == "max":
            return jnp.sum(indice_maxpool(f, data.pair_fwd) * cot)
        return jnp.sum(indice_avgpool(f, data.pair_fwd) * cot)

    g_sk = jax.grad(loss_sk)(feats)
    g_ref = jax.grad(loss_ref)(feats)
    np.testing.assert_allclose(np.asarray(g_sk), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_sk_pool_module_path(rng):
    """SparseMaxPool3d with algo='sk' (interpret on CPU) matches the
    rulebook module path."""
    import spconv_tpu

    shape = (11, 13, 17)
    c = 8
    feats, inds = _sorted_input(rng, shape, 300, c, 512)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)
    p_sk = spconv_tpu.SparseMaxPool3d(2, 2, algo="sk", out_bound=512)
    p_nat = spconv_tpu.SparseMaxPool3d(2, 2, algo="native", out_bound=512)
    y1 = jax.jit(lambda t: p_sk(t))(x)  # jit: statics must stay static
    y2 = p_nat(x)
    np.testing.assert_array_equal(np.asarray(y1.indices),
                                  np.asarray(y2.indices))
    np.testing.assert_allclose(np.asarray(y1.features),
                               np.asarray(y2.features), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("ksize,stride,padding",
                         [((3, 3, 3), (2, 2, 2), (1, 1, 1)),
                          ((3, 1, 1), (2, 1, 1), (0, 0, 0)),
                          ((2, 2, 2), (2, 2, 2), (0, 0, 0))])
def test_sk_regular_conv_vs_rulebook(rng, ksize, stride, padding):
    """Strided sorted-key conv (fwd + input/weight grads) vs the
    rulebook gather path, plus the inverse conv via swapped plans."""
    from spconv_tpu.ops.gather_gemm import indice_conv
    from spconv_tpu.ops.pallas.sorted_conv import sk_regular_conv
    from spconv_tpu.ops.rulebook import (build_conv_outputs,
                                         build_conv_rulebook)
    from spconv_tpu.ops import coords as CC

    shape = (13, 14, 15)
    c, k_out = 8, 16
    feats, inds = _sorted_input(rng, shape, 400, c, 512)
    in_keys, _ = _keys_of(inds, shape, 1)
    w = jnp.asarray(rng.randn(k_out, *ksize, c).astype(np.float32) * 0.1)
    dil = (1, 1, 1)

    out_indices, out_keys, num_out, _total = build_conv_outputs(
        inds, spatial_shape=shape, batch_size=1, ksize=ksize,
        stride=stride, padding=padding, dilation=dil, out_bound=512)
    out_shape = tuple(int(v) for v in CC.get_conv_output_size(
        shape, ksize, stride, padding, dil))

    out, plans, geom = sk_regular_conv(
        feats, in_keys, out_keys, w, in_shape=shape, out_shape=out_shape,
        batch_size=1, stride=stride, padding=padding, dilation=dil,
        interpret=True)

    data = build_conv_rulebook(
        inds, spatial_shape=shape, batch_size=1, ksize=ksize,
        stride=stride, padding=padding, dilation=dil, out_bound=512)
    np.testing.assert_array_equal(np.asarray(out_indices),
                                  np.asarray(data.out_indices))
    ref = indice_conv(feats, w, data.pair_fwd, data.pair_bwd,
                      is_subm=False)
    ref = jnp.where((data.out_indices[:, 0] >= 0)[:, None], ref, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)

    # grads
    cot = jnp.asarray(rng.randn(*np.asarray(ref).shape), jnp.float32)
    cot = jnp.where((data.out_indices[:, 0] >= 0)[:, None], cot, 0)

    def loss_sk(f, ww):
        o, _, _ = sk_regular_conv(
            f, in_keys, out_keys, ww, in_shape=shape,
            out_shape=out_shape, batch_size=1, stride=stride,
            padding=padding, dilation=dil, plans=plans, interpret=True)
        return jnp.sum(o * cot)

    def loss_ref(f, ww):
        o = indice_conv(f, ww, data.pair_fwd, data.pair_bwd,
                        is_subm=False)
        return jnp.sum(o * cot)

    gf, gw = jax.grad(loss_sk, argnums=(0, 1))(feats, w)
    gf_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)

    # ---- inverse conv: decoder over the same geometry (swapped plans)
    w_inv = jnp.asarray(
        rng.randn(c, *ksize, k_out).astype(np.float32) * 0.1)
    dec_in = jnp.where((out_indices[:, 0] >= 0)[:, None],
                       jnp.asarray(rng.randn(512, k_out), jnp.float32), 0)
    inv_out, _, _ = sk_regular_conv(
        dec_in, in_keys, out_keys, w_inv, in_shape=shape,
        out_shape=out_shape, batch_size=1, stride=stride,
        padding=padding, dilation=dil, inverse=True, plans=plans,
        interpret=True)
    # reference: swapped pairs through indice_conv
    ref_inv = indice_conv(dec_in, w_inv, data.pair_bwd, data.pair_fwd,
                          is_subm=False)
    ref_inv = jnp.where((inds[:, 0] >= 0)[:, None], ref_inv, 0)
    inv_out = jnp.where((inds[:, 0] >= 0)[:, None], inv_out, 0)
    np.testing.assert_allclose(np.asarray(inv_out), np.asarray(ref_inv),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("ksize,stride,padding",
                         [((2, 2, 2), (2, 2, 2), (0, 0, 0)),
                          ((3, 3, 3), (2, 2, 2), (1, 1, 1))])
def test_sk_transposed_conv_vs_rulebook(rng, ksize, stride, padding):
    """Transposed conv through the sorted-key machinery: the inverse-mode
    kernel with swapped space naming (table=input, tiles=expanded
    output)."""
    from spconv_tpu.ops.gather_gemm import indice_conv
    from spconv_tpu.ops.pallas.sorted_conv import sk_regular_conv
    from spconv_tpu.ops.rulebook import (build_conv_rulebook,
                                         build_deconv_outputs)
    from spconv_tpu.ops import coords as CC

    shape = (7, 8, 9)
    c, k_out = 8, 16
    feats, inds = _sorted_input(rng, shape, 150, c, 256)
    in_keys, _ = _keys_of(inds, shape, 1)
    w = jnp.asarray(rng.randn(k_out, *ksize, c).astype(np.float32) * 0.1)
    dil = (1, 1, 1)
    opad = (0, 0, 0)

    out_indices, out_keys, num_out, _total = build_deconv_outputs(
        inds, spatial_shape=shape, batch_size=1, ksize=ksize,
        stride=stride, padding=padding, dilation=dil, out_padding=opad,
        out_bound=2048)
    out_shape = tuple(int(v) for v in CC.get_deconv_output_size(
        shape, ksize, stride, padding, dil, opad))

    # inverse-mode space swap: "in" space := expanded output (tiles),
    # "out" space := the conv's input (gather table)
    out, plans, geom = sk_regular_conv(
        feats, out_keys, in_keys, w, in_shape=out_shape, out_shape=shape,
        batch_size=1, stride=stride, padding=padding, dilation=dil,
        inverse=True, interpret=True)

    data = build_conv_rulebook(
        inds, spatial_shape=shape, batch_size=1, ksize=ksize,
        stride=stride, padding=padding, dilation=dil, transposed=True,
        out_bound=2048)
    np.testing.assert_array_equal(np.asarray(out_indices),
                                  np.asarray(data.out_indices))
    ref = indice_conv(feats, w, data.pair_fwd, data.pair_bwd,
                      is_subm=False)
    valid = (np.asarray(out_indices)[:, 0] >= 0)
    np.testing.assert_allclose(np.asarray(out)[valid],
                               np.asarray(ref)[valid], rtol=1e-3,
                               atol=1e-3)


def test_sk_transposed_module_path(rng):
    """SparseConvTranspose3d(algo='sk') matches the native module path."""
    import spconv_tpu

    shape = (7, 8, 9)
    c = 8
    feats, inds = _sorted_input(rng, shape, 150, c, 256)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)
    kw = dict(bias=True, key=jax.random.PRNGKey(5), out_bound=2048)
    t_sk = spconv_tpu.SparseConvTranspose3d(c, 12, 2, stride=2,
                                            algo="sk", **kw)
    t_nat = spconv_tpu.SparseConvTranspose3d(c, 12, 2, stride=2,
                                             algo="native", **kw)
    t_nat.weight, t_nat.bias = t_sk.weight, t_sk.bias
    y1 = t_sk(x)
    y2 = t_nat(x)
    np.testing.assert_array_equal(np.asarray(y1.indices),
                                  np.asarray(y2.indices))
    np.testing.assert_allclose(np.asarray(y1.features),
                               np.asarray(y2.features), rtol=1e-3,
                               atol=1e-3)


def test_dg_int8_subm_vs_reference(rng):
    """int8 DG kernel (quad-packed gather + int8 MXU GEMM) vs the int8
    gather reference — exact, incl. fused bias/relu/requant epilogue."""
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv_q
    from spconv_tpu.quantization.quantize import _int8_gather_mm

    shape = (11, 13, 17)
    c, k_out = 8, 16
    feats, inds = _sorted_input(rng, shape, 300, c, 512)
    keys, sent = _keys_of(inds, shape, 1)
    fi8 = jnp.asarray(rng.randint(-100, 100, feats.shape), jnp.int8)
    fi8 = jnp.where(inds[:, :1] >= 0, fi8, 0)
    wi8 = jnp.asarray(rng.randint(-80, 80, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-1, 1, (k_out,)), jnp.float32)

    out = dg_subm_conv_q(
        fi8, keys, wi8, scale, bias, spatial_shape=shape, batch_size=1,
        dilation=(1, 1, 1), act="relu", out_dtype=jnp.int8,
        interpret=True)

    from spconv_tpu.ops.rulebook import build_subm_rulebook
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    wkv = jnp.transpose(wi8.reshape(k_out, 27, c), (1, 2, 0))
    acc = _int8_gather_mm(fi8, wkv, data.pair_fwd, 13)
    y = acc.astype(jnp.float32) * scale[None, :] + bias[None, :]
    y = jnp.maximum(y, 0.0)
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    valid = np.asarray(inds[:, 0] >= 0)
    np.testing.assert_array_equal(np.asarray(out)[valid],
                                  np.asarray(ref)[valid])


def test_dg_int8_subm_residual_fused(rng):
    """Residual-fused int8 DG conv (parity: SparseConvAddReLU) — the add
    rides the in-kernel epilogue."""
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv_q
    from spconv_tpu.quantization.quantize import _int8_gather_mm

    shape = (9, 11, 13)
    c = k_out = 16
    feats, inds = _sorted_input(rng, shape, 250, c, 384)
    keys, _ = _keys_of(inds, shape, 1)
    fi8 = jnp.asarray(rng.randint(-90, 90, feats.shape), jnp.int8)
    fi8 = jnp.where(inds[:, :1] >= 0, fi8, 0)
    add_i8 = jnp.asarray(rng.randint(-90, 90, (feats.shape[0], k_out)),
                         jnp.int8)
    add_i8 = jnp.where(inds[:, :1] >= 0, add_i8, 0)
    wi8 = jnp.asarray(rng.randint(-60, 60, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)
    add_scale = 0.37

    out = dg_subm_conv_q(
        fi8, keys, wi8, scale, None, spatial_shape=shape, batch_size=1,
        dilation=(1, 1, 1), act="relu", out_dtype=jnp.int8,
        add_features=add_i8, add_scale=add_scale, interpret=True)

    from spconv_tpu.ops.rulebook import build_subm_rulebook
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    wkv = jnp.transpose(wi8.reshape(k_out, 27, c), (1, 2, 0))
    acc = _int8_gather_mm(fi8, wkv, data.pair_fwd, 13)
    y = acc.astype(jnp.float32) * scale[None, :] \
        + add_i8.astype(jnp.float32) * add_scale
    y = jnp.maximum(y, 0.0)
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    valid = np.asarray(inds[:, 0] >= 0)
    np.testing.assert_array_equal(np.asarray(out)[valid],
                                  np.asarray(ref)[valid])


def test_dg_int8_regular_strided(rng):
    """int8 DG strided conv vs the int8 gather reference (coord-keyed
    output alignment); bf16 out_dtype path included."""
    from spconv_tpu.ops import coords as C
    from spconv_tpu.ops.pallas.dg_conv import dg_regular_conv_q
    from spconv_tpu.ops.rulebook import build_conv_rulebook
    from spconv_tpu.quantization.quantize import _int8_gather_mm

    shape = (10, 12, 14)
    c, k_out = 8, 16
    feats, inds = _sorted_input(rng, shape, 280, c, 384)
    in_keys, _ = _keys_of(inds, shape, 1)
    fi8 = jnp.asarray(rng.randint(-90, 90, feats.shape), jnp.int8)
    fi8 = jnp.where(inds[:, :1] >= 0, fi8, 0)
    wi8 = jnp.asarray(rng.randint(-60, 60, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)

    data = build_conv_rulebook(
        inds, spatial_shape=shape, batch_size=1, ksize=(3, 3, 3),
        stride=(2, 2, 2), padding=(1, 1, 1), dilation=(1, 1, 1),
        out_bound=384)
    out_shape = tuple(int(v) for v in data.out_spatial_shape)
    ref_keys, _ = C.linearize(data.out_indices, out_shape, 1)
    order = np.argsort(np.asarray(ref_keys), kind="stable")
    out_keys = jnp.asarray(np.asarray(ref_keys)[order])

    out, _plans = dg_regular_conv_q(
        fi8, in_keys, out_keys, wi8, scale, None,
        in_shape=shape, out_shape=out_shape, batch_size=1,
        stride=(2, 2, 2), padding=(1, 1, 1), dilation=(1, 1, 1),
        act="none", out_dtype=jnp.int8, interpret=True)

    acc = _int8_gather_mm(fi8,
                          jnp.transpose(wi8.reshape(k_out, 27, c),
                                        (1, 2, 0)),
                          data.pair_fwd, None)
    y = acc.astype(jnp.float32) * scale[None, :]
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    ref_sorted = np.asarray(ref)[order]
    valid = np.asarray(data.out_indices[:, 0] >= 0)[order]
    np.testing.assert_array_equal(np.asarray(out)[valid],
                                  ref_sorted[valid])


def test_dg_int8_multiwindow_sweeps(rng):
    """int8 DG conv with a deliberately tiny window so the serial
    multi-window sweep ACCUMULATE path runs (the int8 gbuf accumulate
    widens to i32 in-kernel — Mosaic has no vector<i8> add)."""
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv_q
    from spconv_tpu.quantization.quantize import _int8_gather_mm

    shape = (6, 17, 23)
    c = k_out = 16
    feats, inds = _sorted_input(rng, shape, 900, c, 1024)
    keys, sent = _keys_of(inds, shape, 1)
    fi8 = jnp.asarray(rng.randint(-90, 90, feats.shape), jnp.int8)
    fi8 = jnp.where(inds[:, :1] >= 0, fi8, 0)
    wi8 = jnp.asarray(rng.randint(-60, 60, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)

    W = 128  # far below the per-tile reach → nw > 1 on many tiles
    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3), include_center=True)
    np_t, n_pad = SK._n_pad_for(keys.shape[0], 128, W)
    plans = SK.build_sk_plans(
        SK._pad_rows(keys, np_t, sent), sent, deltas_np, groups,
        tile=128, window=W, n_pad=n_pad, align=128)
    assert int(np.max(np.asarray(plans[0].nw))) > 1  # sweeps exercised

    out = dg_subm_conv_q(
        fi8, keys, wi8, scale, None, spatial_shape=shape, batch_size=1,
        dilation=(1, 1, 1), act="relu", out_dtype=jnp.int8, window=W,
        plans=plans, interpret=True)

    from spconv_tpu.ops.rulebook import build_subm_rulebook
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    wkv = jnp.transpose(wi8.reshape(k_out, 27, c), (1, 2, 0))
    acc = _int8_gather_mm(fi8, wkv, data.pair_fwd, 13)
    y = jnp.maximum(acc.astype(jnp.float32) * scale[None, :], 0.0)
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    valid = np.asarray(inds[:, 0] >= 0)
    np.testing.assert_array_equal(np.asarray(out)[valid],
                                  np.asarray(ref)[valid])


def test_dg_rows_supertile_sweeps(rng):
    """R-row supertiles with a deliberately tiny window so the serial
    multi-window sweep path runs — vs the native gather path."""
    import spconv_tpu
    from spconv_tpu.ops import coords as C
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv

    shape = (6, 17, 23)
    c = k_out = 8
    feats, inds = _sorted_input(rng, shape, 900, c, 1024)
    keys, sent = _keys_of(inds, shape, 1)
    w = jnp.asarray(rng.randn(k_out, 3, 3, 3, c).astype(np.float32) * .2)

    R, W = 4, 128  # window far below the supertile span → nw > 1
    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3), include_center=True)
    np_t, n_pad = SK._n_pad_for(keys.shape[0], 128 * R, W)
    plans = SK.build_sk_plans(
        SK._pad_rows(keys, np_t, sent), sent, deltas_np, groups,
        tile=128 * R, window=W, n_pad=n_pad, align=128)
    assert int(np.max(np.asarray(plans[0].nw))) > 1  # sweeps exercised

    out = dg_subm_conv(feats, keys, w, spatial_shape=shape,
                       batch_size=1, dilation=(1, 1, 1), window=W,
                       rows_per_tile=R, plans=plans, interpret=True)

    m = spconv_tpu.SubMConv3d(c, k_out, 3, bias=False, algo="native")
    m = m.replace(weight=w)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1)
    ref = m(x).features
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dg_rows_strided_module(rng, monkeypatch):
    """R-row supertiles through the strided + inverse module path
    (SPCONV_DG_ROWS=auto activates the width heuristic)."""
    monkeypatch.setenv("SPCONV_DG_ROWS", "auto")
    import spconv_tpu

    shape = (6, 14, 18)
    c = 8
    feats, inds = _sorted_input(rng, shape, 600, c, 1024)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)

    kw = dict(bias=False, indice_key="rd0", key=jax.random.PRNGKey(5),
              out_bound=2048)
    down_dg = spconv_tpu.SparseConv3d(c, 16, 3, stride=2, padding=1,
                                      algo="dg", **kw)
    down_nat = spconv_tpu.SparseConv3d(c, 16, 3, stride=2, padding=1,
                                       algo="native", **kw)
    down_nat = down_nat.replace(weight=down_dg.weight)
    inv_dg = spconv_tpu.SparseInverseConv3d(16, c, 3, indice_key="rd0",
                                            bias=False, algo="dg",
                                            key=jax.random.PRNGKey(6))
    inv_nat = inv_dg.replace(algo="native")

    y_dg = down_dg(x)
    y_nat = down_nat(x)
    # coord-keyed alignment (output row orders differ between paths)
    import numpy as np
    kd = _keys_of(y_dg.indices, tuple(int(v) for v in y_dg.spatial_shape),
                  1)[0]
    kn = _keys_of(y_nat.indices, tuple(int(v) for v in y_nat.spatial_shape),
                  1)[0]
    vd = np.asarray(y_dg.indices[:, 0] >= 0)
    vn = np.asarray(y_nat.indices[:, 0] >= 0)
    od = np.argsort(np.asarray(kd)[vd])
    on = np.argsort(np.asarray(kn)[vn])
    np.testing.assert_array_equal(np.asarray(kd)[vd][od],
                                  np.asarray(kn)[vn][on])
    np.testing.assert_allclose(
        np.asarray(y_dg.features)[vd][od],
        np.asarray(y_nat.features)[vn][on], rtol=2e-4, atol=2e-4)

    z_dg = inv_dg(y_dg)
    z_nat = inv_nat(y_nat)
    np.testing.assert_allclose(
        np.asarray(z_dg.features), np.asarray(z_nat.features),
        rtol=2e-4, atol=2e-4)
    assert z_dg.spatial_shape == x.spatial_shape


@pytest.mark.slow
def test_dg_pos_cached_matches_search(rng):
    """Posmode DG conv (cached match rows, no in-kernel search) must be
    bit-identical to the searching DG forward, incl. grads and the
    multi-window sweep path (tiny window forces nw > 1)."""
    import spconv_tpu  # noqa: F401
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.pallas.dg_conv import build_dg_pos, dg_subm_conv

    shape = (6, 17, 23)
    c, k_out = 8, 16
    feats, inds = _sorted_input(rng, shape, 900, c, 1024)
    keys, sent = _keys_of(inds, shape, 1)
    w = jnp.asarray(rng.randn(k_out, 3, 3, 3, c).astype(np.float32))

    for W in (384, 128):  # 128 forces multi-window sweeps
        deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
        groups = SK.sk_groups((3, 3, 3), include_center=True)
        np_t, n_pad = SK._n_pad_for(keys.shape[0], 128, W)
        plans = SK.build_sk_plans(
            SK._pad_rows(keys, np_t, sent), sent, deltas_np, groups,
            tile=128, window=W, n_pad=n_pad, align=128)
        if W == 128:
            assert int(np.max(np.asarray(plans[0].nw))) > 1

        pos = build_dg_pos(
            keys, plans[0], ksize=(3, 3, 3), dilation=(1, 1, 1),
            spatial_shape=shape, batch_size=1, window=W,
            interpret=True)

        def f_pos(ft, wt):
            return jnp.sum(dg_subm_conv(
                ft, keys, wt, spatial_shape=shape, batch_size=1,
                dilation=(1, 1, 1), window=W, plans=plans, pos=pos,
                interpret=True).astype(jnp.float32) ** 2)

        def f_ref(ft, wt):
            return jnp.sum(dg_subm_conv(
                ft, keys, wt, spatial_shape=shape, batch_size=1,
                dilation=(1, 1, 1), window=W, plans=plans,
                interpret=True).astype(jnp.float32) ** 2)

        out_p = dg_subm_conv(
            feats, keys, w, spatial_shape=shape, batch_size=1,
            dilation=(1, 1, 1), window=W, plans=plans, pos=pos,
            interpret=True)
        out_r = dg_subm_conv(
            feats, keys, w, spatial_shape=shape, batch_size=1,
            dilation=(1, 1, 1), window=W, plans=plans,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(out_p),
                                      np.asarray(out_r))

        gp = jax.grad(f_pos, argnums=(0, 1))(feats, w)
        gr = jax.grad(f_ref, argnums=(0, 1))(feats, w)
        for a, b in zip(gp, gr):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dg_pos_module_cache_reuse(rng):
    """Two subm layers sharing an indice_key: the second must reuse the
    first's cached DGData pos table, and the stacked outputs must match
    the native gather path."""
    import spconv_tpu
    from spconv_tpu.ops.pallas.dg_conv import DGData

    shape = (11, 13, 17)
    c = 8
    feats, inds = _sorted_input(rng, shape, 400, c, 512)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)
    rngk = jax.random.PRNGKey(3)
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(c, c, 3, indice_key="s0", algo="dg",
                              key=rngk),
        spconv_tpu.SubMConv3d(c, c, 3, indice_key="s0", algo="dg",
                              key=jax.random.PRNGKey(4)),
    )
    out = net(x)
    recs = [v for v in out.indice_dict.values()
            if isinstance(v, DGData)]
    assert len(recs) == 1 and recs[0].pos is not None

    net_ref = spconv_tpu.SparseSequential(
        net.layers[0].replace(algo="native"),
        net.layers[1].replace(algo="native"),
    )
    ref = net_ref(x)
    np.testing.assert_allclose(
        np.asarray(out.features), np.asarray(ref.features),
        rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_dg_offmode_f32_matches_native(rng):
    """Offset-major gather mode (cg > kv → per-offset [cg,128] gathers,
    offset-major gbuf, no gs-pad GEMM rows) — f32 at C=32 triggers it;
    exact vs the native gather path."""
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv

    shape = (9, 15, 15)
    c, k_out = 32, 16
    feats, inds = _sorted_input(rng, shape, 300, c, 512)
    keys, sent = _keys_of(inds, shape, 1)
    w = jnp.asarray(rng.randn(k_out, 3, 3, 3, c).astype(np.float32) * .1)

    out = dg_subm_conv(feats, keys, w, spatial_shape=shape, batch_size=1,
                       dilation=(1, 1, 1), interpret=True)
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    ref = indice_conv(feats, w, data.pair_fwd, data.pair_bwd,
                      is_subm=True)
    valid = np.asarray(inds[:, 0] >= 0)
    np.testing.assert_allclose(np.asarray(out)[valid],
                               np.asarray(ref)[valid], rtol=1e-4,
                               atol=1e-4)


def test_dg_offmode_bf16_pack2(rng):
    """Offset-major mode with bf16 pair packing (C=64 → cg=32 > kv=27),
    including the multi-window sweep accumulate path (tiny window)."""
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv

    shape = (6, 17, 23)
    c, k_out = 64, 16
    feats, inds = _sorted_input(rng, shape, 900, c, 1024)
    keys, sent = _keys_of(inds, shape, 1)
    fbf = feats.astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(k_out, 3, 3, 3, c).astype(np.float32) * .1
                    ).astype(jnp.bfloat16)

    W = 128  # far below the per-tile reach → nw > 1 on many tiles
    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3), include_center=True)
    np_t, n_pad = SK._n_pad_for(keys.shape[0], 128, W)
    plans = SK.build_sk_plans(
        SK._pad_rows(keys, np_t, sent), sent, deltas_np, groups,
        tile=128, window=W, n_pad=n_pad, align=128)
    assert int(np.max(np.asarray(plans[0].nw))) > 1  # sweeps exercised

    out = dg_subm_conv(fbf, keys, w, spatial_shape=shape, batch_size=1,
                       dilation=(1, 1, 1), window=W, plans=plans,
                       interpret=True)
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    ref = indice_conv(fbf, w, data.pair_fwd, data.pair_bwd,
                      is_subm=True)
    valid = np.asarray(inds[:, 0] >= 0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[valid],
        np.asarray(ref, np.float32)[valid], rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_dg_offmode_int8_q4(rng):
    """Offset-major mode with int8 quad packing (C=128 → cq=32 > kv=27)
    — bit-exact vs the int32 gather reference."""
    from spconv_tpu.ops.pallas.dg_conv import dg_subm_conv_q
    from spconv_tpu.quantization.quantize import _int8_gather_mm

    shape = (9, 15, 15)
    c, k_out = 128, 16
    feats, inds = _sorted_input(rng, shape, 300, c, 512)
    keys, sent = _keys_of(inds, shape, 1)
    fi8 = jnp.asarray(rng.randint(-90, 90, feats.shape), jnp.int8)
    fi8 = jnp.where(inds[:, :1] >= 0, fi8, 0)
    wi8 = jnp.asarray(rng.randint(-60, 60, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)

    out = dg_subm_conv_q(
        fi8, keys, wi8, scale, None, spatial_shape=shape, batch_size=1,
        dilation=(1, 1, 1), act="relu", out_dtype=jnp.int8,
        interpret=True)
    data = build_subm_rulebook(inds, spatial_shape=shape, batch_size=1,
                               ksize=(3, 3, 3), dilation=(1, 1, 1))
    wkv = jnp.transpose(wi8.reshape(k_out, 27, c), (1, 2, 0))
    acc = _int8_gather_mm(fi8, wkv, data.pair_fwd, 13)
    y = jnp.maximum(acc.astype(jnp.float32) * scale[None, :], 0.0)
    ref = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    valid = np.asarray(inds[:, 0] >= 0)
    np.testing.assert_array_equal(np.asarray(out)[valid],
                                  np.asarray(ref)[valid])


@pytest.mark.slow
def test_dg_int8_posmode(rng):
    """int8 DG conv through the cached-match-rows (posmode) path, with
    and without the fused residual add — bit-identical to the searching
    int8 kernel (ADVICE r3: posmode int8 was untested)."""
    from spconv_tpu.ops.pallas import sorted_conv as SK
    from spconv_tpu.ops.pallas.dg_conv import build_dg_pos, dg_subm_conv_q

    shape = (9, 13, 15)
    c = k_out = 16
    feats, inds = _sorted_input(rng, shape, 350, c, 512)
    keys, sent = _keys_of(inds, shape, 1)
    fi8 = jnp.asarray(rng.randint(-90, 90, feats.shape), jnp.int8)
    fi8 = jnp.where(inds[:, :1] >= 0, fi8, 0)
    wi8 = jnp.asarray(rng.randint(-60, 60, (k_out, 3, 3, 3, c)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.01, (k_out,)), jnp.float32)
    add8 = jnp.asarray(rng.randint(-90, 90, (feats.shape[0], k_out)),
                       jnp.int8)

    W = 384
    deltas_np, _ = SK.subm_key_deltas((3, 3, 3), (1, 1, 1), shape)
    groups = SK.sk_groups((3, 3, 3), include_center=True)
    np_t, n_pad = SK._n_pad_for(keys.shape[0], 128, W)
    plans = SK.build_sk_plans(
        SK._pad_rows(keys, np_t, sent), sent, deltas_np, groups,
        tile=128, window=W, n_pad=n_pad, align=128)
    pos = build_dg_pos(keys, plans[0], ksize=(3, 3, 3),
                       dilation=(1, 1, 1), spatial_shape=shape,
                       batch_size=1, window=W, interpret=True)

    for add in (None, add8):
        kw = dict(spatial_shape=shape, batch_size=1, dilation=(1, 1, 1),
                  act="relu", out_dtype=jnp.int8, window=W, plans=plans,
                  add_features=add, add_scale=0.5, interpret=True)
        out_p = dg_subm_conv_q(fi8, keys, wi8, scale, None, pos=pos, **kw)
        out_r = dg_subm_conv_q(fi8, keys, wi8, scale, None, **kw)
        np.testing.assert_array_equal(np.asarray(out_p),
                                      np.asarray(out_r))
