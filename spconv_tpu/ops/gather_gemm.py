"""Sparse conv compute: gather → GEMM → accumulate, with a custom VJP.

This is the TPU equivalent of both reference compute paths:

* Native algo (``spconv/pytorch/ops.py:811-1095``): per-offset
  gather → cuBLAS GEMM → scatter-add.  Here the *scatter* disappears:
  because we build ``pair_fwd[kv, N_out]`` (one input per (offset, output)),
  the accumulation is a pure sum of gathered GEMMs — gathers only, which
  XLA/TPU executes far better than scatter-adds.
* Backward (``ops.py:1103-1449``): dgrad uses ``pair_bwd`` (again pure
  gather, mirroring the reference's reverse-direction pairs), wgrad is a
  per-offset ``gatherᵀ @ dout`` reduction.

The kv-loop is an ``lax.scan`` over stacked weights so the HLO stays small
for 27- or 125-tap kernels.  All matmuls accumulate in fp32 by default
(the reference's ``fp32_accum`` flag, ``conv.py:79``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["indice_conv", "gather_mm", "dgrad_gather_mm", "wgrad_gather_mm"]


def _masked_gather(features: jax.Array, idx: jax.Array) -> jax.Array:
    """features[idx] with idx == −1 → zero row."""
    g = jnp.take(features, jnp.maximum(idx, 0), axis=0)
    return jnp.where((idx >= 0)[:, None], g, 0)


def gather_mm(
    features: jax.Array,  # [N_in, C]
    weight_kv: jax.Array,  # [kv, C, K]
    pair_fwd: jax.Array,  # [kv, N_out]
    subm_center: Optional[int],
    accum_dtype=jnp.float32,
    out_dtype=None,
) -> jax.Array:
    """out[o] = Σ_k features[pair_fwd[k, o]] @ W[k]   →  [N_out, K]."""
    kv = pair_fwd.shape[0]
    n_out = pair_fwd.shape[1]
    k_ch = weight_kv.shape[2]
    out_dtype = out_dtype or features.dtype

    if subm_center is not None:
        # subm center offset is the identity map — plain matmul, no gather
        # (reference exploits the same, ``convops.py:1504`` center-init GEMM).
        init = jnp.dot(
            features, weight_kv[subm_center], preferred_element_type=accum_dtype
        )
        ks = [k for k in range(kv) if k != subm_center]
    else:
        init = jnp.zeros((n_out, k_ch), dtype=accum_dtype)
        ks = list(range(kv))

    if not ks:
        return init.astype(out_dtype)

    pf = pair_fwd[np.array(ks)]
    w = weight_kv[np.array(ks)]

    def body(acc, inp):
        pf_k, w_k = inp
        g = _masked_gather(features, pf_k)
        return acc + jnp.dot(g, w_k, preferred_element_type=accum_dtype), None

    acc, _ = jax.lax.scan(body, init, (pf, w))
    return acc.astype(out_dtype)


def dgrad_gather_mm(
    dout: jax.Array,  # [N_out, K]
    weight_kv: jax.Array,  # [kv, C, K]
    pair_bwd: jax.Array,  # [kv, N_in]
    subm_center: Optional[int],
    accum_dtype=jnp.float32,
    out_dtype=None,
) -> jax.Array:
    """din[i] = Σ_k dout[pair_bwd[k, i]] @ W[k]ᵀ   →  [N_in, C]."""
    kv = pair_bwd.shape[0]
    n_in = pair_bwd.shape[1]
    c_ch = weight_kv.shape[1]
    out_dtype = out_dtype or dout.dtype

    if subm_center is not None:
        init = jnp.dot(
            dout, weight_kv[subm_center].T, preferred_element_type=accum_dtype
        )
        ks = [k for k in range(kv) if k != subm_center]
    else:
        init = jnp.zeros((n_in, c_ch), dtype=accum_dtype)
        ks = list(range(kv))

    if not ks:
        return init.astype(out_dtype)

    pb = pair_bwd[np.array(ks)]
    w = weight_kv[np.array(ks)]

    def body(acc, inp):
        pb_k, w_k = inp
        g = _masked_gather(dout, pb_k)
        return acc + jnp.dot(g, w_k.T, preferred_element_type=accum_dtype), None

    acc, _ = jax.lax.scan(body, init, (pb, w))
    return acc.astype(out_dtype)


def wgrad_gather_mm(
    features: jax.Array,  # [N_in, C]
    dout: jax.Array,  # [N_out, K]
    pair_fwd: jax.Array,  # [kv, N_out]
    subm_center: Optional[int],
    accum_dtype=jnp.float32,
    out_dtype=None,
) -> jax.Array:
    """dW[k] = gather_k(features)ᵀ @ dout   →  [kv, C, K]."""
    out_dtype = out_dtype or features.dtype
    kv = pair_fwd.shape[0]

    def body(_, pf_k):
        g = _masked_gather(features, pf_k)
        dw = jnp.dot(g.T, dout, preferred_element_type=accum_dtype)
        return None, dw

    _, dws = jax.lax.scan(body, None, pair_fwd)
    if subm_center is not None:
        # center gather is identity over the *output* rows == input rows;
        # pair_fwd already encodes it, so nothing special needed — but the
        # identity row avoids the gather:
        dw_c = jnp.dot(features.T, dout, preferred_element_type=accum_dtype)
        dws = dws.at[subm_center].set(dw_c)
    return dws.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _indice_conv_core(features, weight_kv, pair_fwd, pair_bwd, subm_center, fp32_accum):
    accum = jnp.float32 if fp32_accum else features.dtype
    return gather_mm(features, weight_kv, pair_fwd, subm_center, accum)


def _indice_conv_fwd(features, weight_kv, pair_fwd, pair_bwd, subm_center, fp32_accum):
    out = _indice_conv_core(
        features, weight_kv, pair_fwd, pair_bwd, subm_center, fp32_accum
    )
    return out, (features, weight_kv, pair_fwd, pair_bwd)


def _indice_conv_bwd(subm_center, fp32_accum, res, g):
    features, weight_kv, pair_fwd, pair_bwd = res
    accum = jnp.float32 if fp32_accum else features.dtype
    g = g.astype(features.dtype)
    din = dgrad_gather_mm(
        g, weight_kv, pair_bwd, subm_center, accum, out_dtype=features.dtype
    )
    dw = wgrad_gather_mm(
        features, g, pair_fwd, subm_center, accum, out_dtype=weight_kv.dtype
    )
    zf = jax.dtypes.float0
    return (
        din,
        dw,
        np.zeros(pair_fwd.shape, dtype=zf),
        np.zeros(pair_bwd.shape, dtype=zf),
    )


_indice_conv_core.defvjp(_indice_conv_fwd, _indice_conv_bwd)


def indice_conv(
    features: jax.Array,
    weight: jax.Array,  # KRSC: [K, *ksize, C]
    pair_fwd: jax.Array,
    pair_bwd: jax.Array,
    *,
    is_subm: bool,
    fp32_accum: bool = True,
) -> jax.Array:
    """Sparse convolution compute given a rulebook.

    ``weight`` is KRSC (out-channels, *kernel, in-channels) — the only
    layout the reference supports in 2.2+ (``conv.py:129-139``,
    ``constants.py:42``).
    """
    k_out = weight.shape[0]
    c_in = weight.shape[-1]
    kv = int(np.prod(weight.shape[1:-1]))
    assert pair_fwd.shape[0] == kv, (pair_fwd.shape, weight.shape)
    # [K, kv, C] → [kv, C, K]
    weight_kv = jnp.transpose(weight.reshape(k_out, kv, c_in), (1, 2, 0))
    subm_center = kv // 2 if (is_subm and kv % 2 == 1) else None
    return _indice_conv_core(
        features, weight_kv, pair_fwd, pair_bwd, subm_center, fp32_accum
    )
