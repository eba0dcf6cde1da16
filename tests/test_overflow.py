"""Out-bound overflow observability (VERDICT r4 weak #6).

The framework's bounded output buffers are the reference's
``num_out_act_bound`` deployment mode made the only mode
(``spconv/pytorch/ops.py:264-266``, bounded stage-2
``csrc/sparse/indices.py:460-499``).  There truncation is opt-in; here it
must be *detectable*: every bounded discovery surfaces the pre-clamp
count as ``SparseConvTensor.num_out_total``, ``check_overflow()`` raises
eagerly, ``.overflowed`` is a device bool usable inside jit, and
``SPCONV_TPU_CHECK_OVERFLOW=1`` asserts via host callback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import spconv_tpu
from spconv_tpu import SparseConvTensor


def _make_input(n=200, shape=(40, 40, 40), seed=0):
    rng = np.random.RandomState(seed)
    # distinct coordinates → every input voxel reaches ~8 outputs of a
    # k2s2 pool / k3s2 conv, so a small out_bound must overflow
    flat = rng.choice(np.prod(shape), size=n, replace=False)
    coords = np.stack(np.unravel_index(flat, shape), axis=-1)
    inds = np.concatenate(
        [np.zeros((n, 1), np.int32), coords.astype(np.int32)], axis=1)
    feats = rng.randn(n, 16).astype(np.float32)
    t = SparseConvTensor(jnp.asarray(feats), jnp.asarray(inds), shape, 1)
    return t.sort_by_key()


def test_conv_overflow_detected():
    x = _make_input()
    conv = spconv_tpu.SparseConv3d(16, 16, 3, stride=2, padding=1,
                                   out_bound=128, algo="native", key=jax.random.PRNGKey(0))
    out = conv(x)
    assert out.num_out_total is not None
    total = int(out.num_out_total)
    kept = int(out.num_voxels)
    assert total > 128, "test setup: the bound must actually overflow"
    assert kept == 128
    assert bool(out.overflowed)
    with pytest.raises(ValueError, match="overflowed its static out_bound"):
        out.check_overflow("downsample0")


def test_conv_no_overflow_passes():
    x = _make_input()
    conv = spconv_tpu.SparseConv3d(16, 16, 3, stride=2, padding=1,
                                   out_bound=4096, algo="native",
                                   key=jax.random.PRNGKey(0))
    out = conv(x)
    assert int(out.num_out_total) == int(out.num_voxels)
    assert not bool(out.overflowed)
    out.check_overflow()  # must not raise


def test_pool_overflow_detected():
    x = _make_input()
    pool = spconv_tpu.SparseMaxPool3d(2, 2, out_bound=128)
    out = pool(x)
    assert int(out.num_out_total) > 128
    assert bool(out.overflowed)
    with pytest.raises(ValueError):
        out.check_overflow()


def test_overflowed_usable_inside_jit():
    x = _make_input()
    conv = spconv_tpu.SparseConv3d(16, 16, 3, stride=2, padding=1,
                                   out_bound=128, algo="native",
                                   key=jax.random.PRNGKey(0))

    @jax.jit
    def step(m, feats, inds):
        t = SparseConvTensor(feats, inds, x.spatial_shape, 1,
                             keys_sorted=True)
        o = m(t)
        return jnp.sum(o.features), o.overflowed

    _, ovf = step(conv, x.features, x.indices)
    assert bool(ovf)


def test_env_flag_asserts(monkeypatch):
    # the flag is read at import; patch the module constant directly
    import spconv_tpu.debug_utils as dbg

    monkeypatch.setattr(dbg, "SPCONV_CHECK_OVERFLOW", True)
    x = _make_input()
    conv = spconv_tpu.SparseConv3d(16, 16, 3, stride=2, padding=1,
                                   out_bound=128, algo="native",
                                   key=jax.random.PRNGKey(0))
    with pytest.raises(Exception, match="SPCONV_TPU_CHECK_OVERFLOW"):
        out = conv(x)
        jax.block_until_ready(out.features)


def test_subm_has_no_overflow_state():
    x = _make_input()
    conv = spconv_tpu.SubMConv3d(16, 16, 3, padding=1, algo="native",
                                 key=jax.random.PRNGKey(0))
    out = conv(x)
    assert out.num_out_total is None
    assert out.overflowed is None
    out.check_overflow()  # no-op


def test_q_scale_carried_and_preserved():
    x = _make_input()
    xq = x.shadow_copy()
    xq.q_scale = jnp.float32(0.025)
    y = xq.replace_feature(xq.features * 2)
    assert float(y.q_scale) == pytest.approx(0.025)

    # survives the pytree roundtrip (jit boundaries)
    leaves, treedef = jax.tree_util.tree_flatten(xq)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert float(back.q_scale) == pytest.approx(0.025)
    assert back.num_out_total is None
