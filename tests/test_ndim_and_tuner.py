"""1d/2d/4d conv coverage (reference supports ndim 1-4) + tuner smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.tuner import ConvTuner
from utils import generate_sparse_data, pad_sparse


def make_x(rng, shape, n, c, nbuf, batch=2):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=batch, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return (SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p),
                             shape, batch), feats_p, inds_p)


def dense_of(x, feats_p, inds_p):
    ndim = len(x.spatial_shape)
    c = feats_p.shape[1]
    out = np.zeros((x.batch_size, *x.spatial_shape, c), np.float32)
    valid = inds_p[:, 0] >= 0
    idx = inds_p[valid]
    out[tuple(idx[:, i] for i in range(ndim + 1))] = feats_p[valid]
    return np.moveaxis(out, -1, 1)


@pytest.mark.parametrize("ndim,conv_cls,torch_fn", [
    (1, spconv_tpu.SubMConv1d, F.conv1d),
    (2, spconv_tpu.SubMConv2d, F.conv2d),
])
def test_subm_lowdim_vs_dense(rng, ndim, conv_cls, torch_fn):
    shape = (15,) if ndim == 1 else (12, 13)
    x, feats_p, inds_p = make_x(rng, shape, 10 if ndim == 1 else 60, 3, 160)
    m = conv_cls(3, 5, 3, bias=True, indice_key="a")
    y = m(x)
    xd = torch.tensor(dense_of(x, feats_p, inds_p))
    w = torch.tensor(np.moveaxis(np.asarray(m.weight), -1, 1).copy())
    yd = torch_fn(xd, w, bias=torch.tensor(np.asarray(m.bias)),
                  padding=1).numpy()
    valid = inds_p[:, 0] >= 0
    got = np.asarray(y.features)[valid]
    want = np.stack([yd[(r[0], slice(None), *r[1:])] for r in inds_p[valid]])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_conv4d_brute_force(rng):
    """No torch conv4d — check against the brute-force pair reference."""
    shape = (5, 6, 5, 6)
    x, feats_p, inds_p = make_x(rng, shape, 60, 3, 160, batch=1)
    m = spconv_tpu.SubMConv4d(3, 4, 3, bias=False, indice_key="a")
    y = m(x)
    w = np.asarray(m.weight).reshape(4, 81, 3)
    # brute force: for each active site, sum over present neighbors
    sites = {tuple(r): i for i, r in enumerate(inds_p) if r[0] >= 0}
    from spconv_tpu.ops.coords import kernel_offsets
    offs = kernel_offsets((3, 3, 3, 3)) - 1
    got = np.asarray(y.features)
    for coord, row in list(sites.items())[:40]:
        acc = np.zeros(4, np.float32)
        for k in range(81):
            nb = (coord[0], *(np.array(coord[1:]) + offs[k]))
            if nb in sites:
                acc += w[:, k, :] @ feats_p[sites[nb]]
        np.testing.assert_allclose(got[row], acc, atol=1e-4)


def test_large_kernel_5x5x5(rng):
    shape = (9, 10, 11)
    x, feats_p, inds_p = make_x(rng, shape, 100, 3, 256)
    m = spconv_tpu.SubMConv3d(3, 4, 5, bias=False, indice_key="big")
    y = m(x)
    xd = torch.tensor(dense_of(x, feats_p, inds_p))
    w = torch.tensor(np.moveaxis(np.asarray(m.weight), -1, 1).copy())
    yd = F.conv3d(xd, w, padding=2).numpy()
    valid = inds_p[:, 0] >= 0
    got = np.asarray(y.features)[valid]
    want = np.stack([yd[r[0], :, r[1], r[2], r[3]] for r in inds_p[valid]])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_tuner_heuristic_and_cache(tmp_path, rng):
    t = ConvTuner(cache_dir=str(tmp_path))
    p = t.get_tuned_params("gather_mm", 4096, 64, 64, 27, "bfloat16")
    assert p["source"] == "heuristic" and p["chunk"] >= 1
    # tune on tiny real data (CPU)
    feats = jnp.asarray(rng.randn(257, 8).astype(np.float32))
    pair = jnp.asarray(rng.randint(-1, 256, size=(27, 256)).astype(np.int32))
    wkv = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32))
    won = t.tune_conv_chunk(feats, wkv, pair, None, chunks=(3, 27))
    assert won["source"] == "tuned" and "chunk" in won
    # cache round-trip
    t2 = ConvTuner(cache_dir=str(tmp_path))
    p2 = t2.get_tuned_params("gather_mm", 256, 8, 8, 27, "float32")
    assert p2["source"] == "tuned"


def test_select_algo_and_cache(tmp_path):
    """Auto algo resolution: heuristic (cpu->native), cached winner
    overrides, and unsupported-sk cached winners are ignored."""
    t = ConvTuner(cache_dir=str(tmp_path))
    kw = dict(subm=True, sk_supported=True, n=4096, c=64, k=64, kv=27,
              dtype="bfloat16")
    # on the CPU test backend the heuristic picks native
    assert t.select_algo(**kw) == "native"
    # a cached tuned winner overrides the heuristic
    t.cache_algo(n=4096, c=64, k=64, kv=27, dtype="bfloat16", algo="sk",
                 ms=1.0)
    assert t.select_algo(**kw) == "sk"
    # fresh tuner instance reads the winner from disk
    t2 = ConvTuner(cache_dir=str(tmp_path))
    assert t2.select_algo(**kw) == "sk"
    # an sk winner is ignored when the layer can't run sk
    kw2 = dict(kw, sk_supported=False)
    assert t2.select_algo(**kw2) == "native"


def test_default_algo_is_auto(rng):
    import spconv_tpu

    conv = spconv_tpu.SubMConv3d(4, 8, 3)
    assert conv.algo == "auto"


def test_tune_on_first_call(tmp_path, rng, monkeypatch):
    """Tune mode measures every supported candidate on the live tensor
    at first dispatch and caches the winner (reference ConvTunerSimple
    semantics); subsequent auto resolution uses the cached winner."""
    import jax
    import jax.numpy as jnp

    import spconv_tpu
    from spconv_tpu import tuner as tuner_mod
    from utils import generate_sparse_data, pad_sparse

    t = tuner_mod.ConvTuner(cache_dir=str(tmp_path))
    t.force_tune = True
    # conv._forward imports CONV_TUNER from spconv_tpu.tuner per call
    monkeypatch.setattr(tuner_mod, "CONV_TUNER", t)

    shape = (9, 10, 11)
    feats, inds = generate_sparse_data(shape, 150, 6, batch_size=1,
                                       rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, 256)
    key = inds_p[:, 0].astype(np.int64)
    for a, s in enumerate(shape):
        key = key * s + inds_p[:, a + 1]
    order = np.argsort(np.where(inds_p[:, 0] >= 0, key, 2**62),
                       kind="stable")
    x = spconv_tpu.SparseConvTensor(
        jnp.asarray(feats_p[order]), jnp.asarray(inds_p[order]), shape, 1,
        keys_sorted=True)

    m = spconv_tpu.SubMConv3d(6, 8, 3, algo="auto",
                              key=jax.random.PRNGKey(0))

    measured = []
    real_tune = t.tune_conv_algo

    def fake_tune(module, inp, candidates, **sig):
        measured.extend(candidates)
        return real_tune(module, inp, candidates,
                         timer=lambda a: {"native": 1.0, "sk": 9.0,
                                          "dg": 9.0}[a], **sig)

    t.tune_conv_algo = fake_tune
    m(x)  # eager first call → tunes
    assert "native" in measured
    # winner cached: auto resolution now returns it without measuring
    assert t.select_algo(subm=True, sk_supported=True, dg_supported=True,
                         n=256, c=6, k=8, kv=27,
                         dtype="float32") == "native"
    # under jit (tracing) the tuner must NOT try to measure
    t.tune_conv_algo = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("tuned under trace"))
    jax.jit(lambda f: m(x.replace_feature(f)).features)(x.features)
