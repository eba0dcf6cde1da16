"""Integration tests: deep nets (parity: reference ``test_multi_impl.py``
deep-net equivalence + ``fake_train.py``), checkpoint round-trip, bf16."""

import numpy as np
import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor
from spconv_tpu.checkpoint import (load_checkpoint, save_checkpoint,
                                   state_dict, load_state_dict,
                                   convert_torch_weight_layout)
from spconv_tpu.models import SparseUNet, centerpoint_encoder
from utils import generate_sparse_data, pad_sparse


def make_input(rng, shape=(21, 16, 16), n=200, c=5, nbuf=512):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=1, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    return SparseConvTensor(jnp.asarray(feats_p), jnp.asarray(inds_p), shape, 1)


def test_centerpoint_encoder_fwd_bwd(rng):
    x = make_input(rng)
    net = centerpoint_encoder(in_channels=5, key=jax.random.PRNGKey(0))

    def loss(m, t):
        return jnp.mean(m.bev(t, training=True) ** 2)

    l1, grads = spconv_tpu.filter_value_and_grad(loss)(net, x)
    assert np.isfinite(float(l1))
    # every parameter except BN running stats (unused in training mode)
    # must receive a gradient
    from spconv_tpu.checkpoint import state_dict
    gsd = state_dict(grads)
    for k, g in gsd.items():
        if "running_" in k:
            continue
        assert np.abs(g).sum() > 0, f"zero grad for {k}"
    # jit == eager
    l2 = jax.jit(loss)(net, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_unet_site_preservation(rng):
    x = make_input(rng, shape=(12, 12, 12), n=150, c=4, nbuf=256)
    net = SparseUNet(in_channels=4, channels=(8, 16, 24), num_classes=5,
                     key=jax.random.PRNGKey(1))
    out = net(x)
    # segmentation output has exactly the input site set
    np.testing.assert_array_equal(np.asarray(out.indices),
                                  np.asarray(x.indices))
    assert out.features.shape[1] == 5


def test_bf16_matches_f32_loosely(rng):
    x32 = make_input(rng, c=5)
    net32 = centerpoint_encoder(in_channels=5, bn=False,
                                key=jax.random.PRNGKey(2))
    sd = state_dict(net32)
    net16 = centerpoint_encoder(in_channels=5, bn=False, dtype=jnp.bfloat16,
                                key=jax.random.PRNGKey(2))
    net16 = load_state_dict(net16, sd, strict=False)
    x16 = x32.replace_feature(x32.features.astype(jnp.bfloat16))
    b32 = np.asarray(net32.bev(x32), np.float32)
    b16 = np.asarray(net16.bev(x16).astype(jnp.float32))
    denom = np.abs(b32).mean() + 1e-6
    assert np.abs(b32 - b16).mean() / denom < 0.1


def test_checkpoint_roundtrip(tmp_path, rng):
    x = make_input(rng)
    net = centerpoint_encoder(in_channels=5, key=jax.random.PRNGKey(3))
    want = np.asarray(net.bev(x))
    path = tmp_path / "ckpt.npz"
    save_checkpoint(net, path)
    net2 = centerpoint_encoder(in_channels=5, key=jax.random.PRNGKey(99))
    net2 = load_checkpoint(net2, path)
    got = np.asarray(net2.bev(x))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_torch_layout_conversion():
    k, c = 8, 4
    krsc = np.arange(k * 27 * c).reshape(k, 3, 3, 3, c).astype(np.float32)
    rskc = np.moveaxis(krsc, 0, 3)
    rsck = np.moveaxis(krsc, 0, 4)
    np.testing.assert_array_equal(
        convert_torch_weight_layout(rskc, "RSKC", 3), krsc)
    np.testing.assert_array_equal(
        convert_torch_weight_layout(rsck, "RSCK", 3), krsc)
    np.testing.assert_array_equal(
        convert_torch_weight_layout(krsc, "KRSC", 3), krsc)


def test_optax_training_loop(rng):
    """Training with optax over the module pytree (framework integration)."""
    import optax

    x = make_input(rng, shape=(12, 12, 12), n=120, c=4, nbuf=256)
    net = spconv_tpu.SparseSequential(
        spconv_tpu.SubMConv3d(4, 8, 3, indice_key="c"),
        spconv_tpu.SparseReLU(),
        spconv_tpu.SubMConv3d(8, 4, 3, indice_key="c"),
    )
    tx = optax.adam(1e-2)
    dyn, sta = spconv_tpu.partition(
        net, lambda v: spconv_tpu.module._is_inexact(v))
    opt_state = tx.init(dyn)

    def loss_fn(d, t):
        m = spconv_tpu.combine(d, sta)
        return jnp.mean(m(t).features ** 2)

    @jax.jit
    def step(d, os, t):
        l, g = jax.value_and_grad(loss_fn)(d, t)
        updates, os = tx.update(g, os, d)
        return optax.apply_updates(d, updates), os, l

    losses = []
    for _ in range(5):
        dyn, opt_state, l = step(dyn, opt_state, x)
        losses.append(float(l))
    assert losses[-1] < losses[0]
