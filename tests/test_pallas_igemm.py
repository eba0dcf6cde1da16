"""Pallas implicit-GEMM kernel vs the gather-einsum reference, in
interpreter mode on CPU (hardware run happens in bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spconv_tpu.ops.gather_gemm import gather_mm
from spconv_tpu.ops.pallas.implicit_gemm import (
    build_igemm_plan, implicit_gemm)
from spconv_tpu.ops.rulebook import build_subm_rulebook
from utils import generate_sparse_data, pad_sparse


def make_problem(rng, shape=(9, 10, 11), n=150, nbuf=256, c=16, k=8):
    feats, inds = generate_sparse_data(shape, n, c, batch_size=1, rng=rng)
    feats_p, inds_p = pad_sparse(feats, inds, nbuf)
    data = build_subm_rulebook(jnp.asarray(inds_p), spatial_shape=shape,
                               batch_size=1, ksize=(3, 3, 3),
                               dilation=(1, 1, 1))
    wkv = jnp.asarray(rng.uniform(-1, 1, (27, c, k)).astype(np.float32))
    return jnp.asarray(feats_p), wkv, data


def test_plan_overflow_detection(rng):
    feats, wkv, data = make_problem(rng)
    # huge window → no overflow
    plan = build_igemm_plan(data.pair_fwd, feats.shape[0], tile=64,
                            window=256)
    assert int(plan.overflow) == 0
    # tiny window → overflow detected
    plan2 = build_igemm_plan(data.pair_fwd, feats.shape[0], tile=64,
                             window=8)
    assert int(plan2.overflow) > 0


def test_igemm_matches_gather_mm(rng):
    feats, wkv, data = make_problem(rng)
    want = gather_mm(feats, wkv, data.pair_fwd, None, jnp.float32)
    got = implicit_gemm(feats.astype(jnp.bfloat16), wkv, data.pair_fwd,
                        tile=64, window=256, interpret=True, fallback=False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.05)


def test_igemm_fp32_exactish(rng):
    feats, wkv, data = make_problem(rng)
    want = np.asarray(gather_mm(feats, wkv, data.pair_fwd, None, jnp.float32))
    got = np.asarray(implicit_gemm(feats, wkv, data.pair_fwd, tile=64,
                                   window=256, interpret=True,
                                   fallback=False))
    # kernel casts to bf16 for the MXU; tolerance accordingly
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 0.02


def test_igemm_fallback_on_overflow(rng):
    feats, wkv, data = make_problem(rng)
    want = np.asarray(gather_mm(feats, wkv, data.pair_fwd, None, jnp.float32))
    # window too small → cond takes the exact XLA path
    got = np.asarray(implicit_gemm(feats, wkv, data.pair_fwd, tile=64,
                                   window=8, interpret=True, fallback=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_igemm_packed_c64(rng):
    """2-row packed kernel path (c=64) matches the reference compute."""
    feats, _, data = make_problem(rng, c=64, k=32)
    wkv = jnp.asarray(rng.uniform(-1, 1, (27, 64, 32)).astype(np.float32))
    want = np.asarray(gather_mm(feats, wkv, data.pair_fwd, None, jnp.float32))
    got = np.asarray(implicit_gemm(feats, wkv, data.pair_fwd, tile=64,
                                   window=256, interpret=True,
                                   fallback=False))
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 0.02


@pytest.mark.parametrize("c,k", [(16, 16), (32, 8), (128, 32)])
def test_igemm_packed_other_widths(rng, c, k):
    feats, _, data = make_problem(rng, c=c, k=k)
    wkv = jnp.asarray(rng.uniform(-1, 1, (27, c, k)).astype(np.float32))
    want = np.asarray(gather_mm(feats, wkv, data.pair_fwd, None, jnp.float32))
    got = np.asarray(implicit_gemm(feats, wkv, data.pair_fwd, tile=64,
                                   window=256, interpret=True,
                                   fallback=False))
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 0.02
