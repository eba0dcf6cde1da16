"""Exhaustive algo × dtype × geometry matrix (parity:
``/root/reference/test/test_all_algo.py:15-17,152-166`` — "testing via
networks only exercises the tuner's winner", so every kernel family is
driven directly against the native gather path across kernel sizes,
strides, paddings, dilations and conv kinds, with coord-keyed output
alignment).

Quick set (default): representative geometries, f32, forward.
Slow set (``-m slow``): the broader cross incl. bf16, kv=125 (5³,
multi-plane windows), ndim 2/4, and forward+backward.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spconv_tpu

from utils import generate_sparse_data


def _sorted_input(rng, shape, n, c, nbuf, batch=1):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=batch,
                                       rng=rng)
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


def _make_conv(kind, ndim, c_in, c_out, k, s, p, d, algo, key,
               indice_key="m0"):
    cls = {
        ("subm", 2): spconv_tpu.SubMConv2d,
        ("subm", 3): spconv_tpu.SubMConv3d,
        ("subm", 4): spconv_tpu.SubMConv4d,
        ("regular", 2): spconv_tpu.SparseConv2d,
        ("regular", 3): spconv_tpu.SparseConv3d,
        ("regular", 4): spconv_tpu.SparseConv4d,
        ("transposed", 2): spconv_tpu.SparseConvTranspose2d,
        ("transposed", 3): spconv_tpu.SparseConvTranspose3d,
        ("inverse", 3): spconv_tpu.SparseInverseConv3d,
    }[(kind, ndim)]
    kw = dict(indice_key=indice_key, algo=algo, key=key)
    if kind == "inverse":
        return cls(c_in, c_out, k, **kw)
    if kind == "subm":
        return cls(c_in, c_out, k, dilation=d, **kw)
    return cls(c_in, c_out, k, stride=s, padding=p, dilation=d,
               out_bound_ratio=3.0, **kw)


def _by_key(t):
    """(sorted_keys, sorted_features) for coord-keyed comparison."""
    ss = tuple(int(v) for v in t.spatial_shape)
    inds = np.asarray(t.indices)
    key = inds[:, 0].astype(np.int64)
    for a, s in enumerate(ss):
        key = np.where(inds[:, 0] >= 0, key * s + inds[:, 1 + a], 2**62)
    order = np.argsort(key, kind="stable")
    return key[order], np.asarray(t.features, np.float64)[order]


def _run_matrix_case(kind, ndim, k, s, p, d, algo, dtype, rng,
                     with_bwd=False):
    shape = {2: (17, 19), 3: (11, 13, 15), 4: (5, 7, 9, 6)}[ndim]
    n = {2: 140, 3: 260, 4: 200}[ndim]
    nbuf = 512
    c_in, c_out = 5, 7
    feats, inds = _sorted_input(rng, shape, n, c_in, nbuf)
    if dtype == "bfloat16":
        feats = feats.astype(jnp.bfloat16)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)

    key = jax.random.PRNGKey(11)
    enc_kind = "regular" if kind == "inverse" else kind
    mods = {}
    for a in ("native", algo):
        enc = _make_conv(enc_kind, ndim, c_in, c_out, k, s, p, d, a, key)
        layers = [enc]
        if kind == "inverse":
            layers.append(_make_conv("inverse", ndim, c_out, c_in, k, s,
                                     p, d, a, key))
            layers[1].weight = jax.random.normal(
                key, layers[1].weight.shape) * 0.1
        enc.weight = jax.random.normal(key, enc.weight.shape) * 0.1
        if dtype == "bfloat16":
            for m in layers:
                m.weight = m.weight.astype(jnp.bfloat16)
                if m.bias is not None:
                    m.bias = m.bias.astype(jnp.bfloat16)
        mods[a] = layers

    def fwd(layers, f):
        xx = spconv_tpu.SparseConvTensor(f, inds, shape, 1,
                                         keys_sorted=True)
        for m in layers:
            xx = m(xx)
        return xx

    y_ref = fwd(mods["native"], feats)
    y_alt = fwd(mods[algo], feats)

    k_ref, f_ref = _by_key(y_ref)
    k_alt, f_alt = _by_key(y_alt)
    nv = int(min((k_ref < 2**62).sum(), (k_alt < 2**62).sum()))
    assert nv > 0, "degenerate case: no outputs"
    np.testing.assert_array_equal(k_ref[:nv], k_alt[:nv])
    tol = 3e-2 if dtype == "bfloat16" else 1e-4
    scale = max(np.abs(f_ref[:nv]).max(), 1e-6)
    np.testing.assert_allclose(f_alt[:nv] / scale, f_ref[:nv] / scale,
                               rtol=tol, atol=tol)

    if with_bwd:
        def loss(layers, f):
            out = fwd(layers, f)
            return jnp.sum(out.features.astype(jnp.float32) ** 2)

        g_ref = jax.grad(lambda f: loss(mods["native"], f))(feats)
        g_alt = jax.grad(lambda f: loss(mods[algo], f))(feats)
        gs = max(float(jnp.max(jnp.abs(g_ref.astype(jnp.float32)))),
                 1e-6)
        np.testing.assert_allclose(
            np.asarray(g_alt, np.float64) / gs,
            np.asarray(g_ref, np.float64) / gs,
            rtol=max(tol, 1e-3), atol=max(tol, 1e-3))


# ---------------------------------------------------------------------------
# quick set: one representative geometry per (kind, algo), f32 forward
# ---------------------------------------------------------------------------

QUICK = [
    ("subm", 3, 3, 1, 0, 1),
    ("subm", 3, 3, 1, 0, 2),        # dilated
    ("regular", 3, 2, 2, 0, 1),     # the classic ↓2
    ("regular", 3, 3, 2, 1, 1),
    ("transposed", 3, 2, 2, 0, 1),
    ("inverse", 3, 3, 2, 1, 1),
]


@pytest.mark.parametrize("algo", ["sk", "dg"])
@pytest.mark.parametrize("kind,ndim,k,s,p,d", QUICK)
def test_algo_matrix_quick(kind, ndim, k, s, p, d, algo, rng):
    _run_matrix_case(kind, ndim, k, s, p, d, algo, "float32", rng)


# ---------------------------------------------------------------------------
# slow set: broader cross — bf16, kv=125, ndim 2/4, strides 3, fwd+bwd
# ---------------------------------------------------------------------------

SLOW = [
    ("subm", 3, 5, 1, 0, 1),        # kv=125: multi-plane windows
    ("subm", 2, 3, 1, 0, 1),
    ("subm", 4, 3, 1, 0, 1),
    ("regular", 3, 3, 3, 1, 1),     # stride 3
    ("regular", 3, 3, 2, 1, 2),     # strided + dilated
    ("regular", 2, 2, 2, 0, 1),
    ("transposed", 3, 3, 2, 1, 1),
    ("inverse", 3, 2, 2, 0, 1),
]


@pytest.mark.slow
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("algo", ["sk", "dg"])
@pytest.mark.parametrize("kind,ndim,k,s,p,d", SLOW)
def test_algo_matrix_slow(kind, ndim, k, s, p, d, algo, dtype, rng):
    _run_matrix_case(kind, ndim, k, s, p, d, algo, dtype, rng,
                     with_bwd=(dtype == "float32"))


@pytest.mark.slow
def test_algo_matrix_pair_key_grid(rng):
    """≥2³¹ key space routes to the pair-key rulebook path under every
    algo request (sk/dg unsupported there → native compute)."""
    shape = (1300, 1300, 1300)
    n, nbuf, c = 200, 256, 4
    feats, inds = _sorted_input(rng, shape, n, c, nbuf)
    x = spconv_tpu.SparseConvTensor(feats, inds, shape, 1,
                                    keys_sorted=True)
    key = jax.random.PRNGKey(0)
    outs = []
    for algo in ("native", "auto", "sk", "dg"):
        m = spconv_tpu.SubMConv3d(c, 6, 3, algo=algo, key=key)
        m.weight = jax.random.normal(key, m.weight.shape) * 0.1
        outs.append(np.asarray(m(x).features))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-4, atol=1e-4)
