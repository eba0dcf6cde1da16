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

Performance structure (measured on TPU v5e, 127k voxels, C=K=64):

* masking by ``where`` on gathered features costs a full extra memory
  pass; instead invalid pairs are clamped to a **zero row** appended at
  index ``N`` (one cheap int-where on indices, zero math afterwards),
* offsets are gathered in **chunks** and contracted with one einsum per
  chunk, which XLA fuses far better than a scan carrying an accumulator
  (15.4 ms scan → 6.1 ms batched at stage-0 sizes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["indice_conv", "gather_mm", "dgrad_gather_mm", "wgrad_gather_mm"]

# max elements of a [chunk, N, C] gather buffer (bf16) before chunking
_CHUNK_BUDGET = 64 * 1024 * 1024


def _zero_pad(features: jax.Array) -> jax.Array:
    """Append one zero row (the clamp target for invalid pairs)."""
    return jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), features.dtype)], axis=0
    )


# NOTE (round-2 correction): an "expand-first" path for narrow channel
# counts (project through W per offset, then gather K-wide rows) was tried
# here and measured 10× SLOWER than the direct gather on the real TPU
# (63.9 ms vs 6.2 ms for the 3→64 bench layer — the original 50 ms
# "direct" number had the 30 ms rulebook build folded in).  There is no
# narrow-row gather cliff at these sizes; the direct chunked gather is
# used for every channel width (tools/probe_c0.py).


def _clamp_pairs(pair: jax.Array, zero_row: int) -> jax.Array:
    return jnp.where(pair >= 0, pair, zero_row)


def _chunks(ks: list, n: int, c: int, dtype: str = "bfloat16") -> list:
    if not ks:
        return []
    # a tuned winner (CONV_TUNER cache, reference cache-key design
    # convops.py:1283-1301) overrides the VMEM-budget heuristic
    from ..tuner import CONV_TUNER

    params = CONV_TUNER.get_tuned_params(
        "gather_mm", n, c, 0, len(ks), dtype)
    if params.get("source") == "tuned" and "chunk" in params:
        per = max(1, min(len(ks), int(params["chunk"])))
    else:
        per = max(1, min(len(ks), _CHUNK_BUDGET // max(1, n * c)))
    return [ks[i : i + per] for i in range(0, len(ks), per)]


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
    n_in = features.shape[0]
    c = features.shape[1]
    k_ch = weight_kv.shape[2]
    out_dtype = out_dtype or features.dtype

    fz = _zero_pad(features)
    pf = _clamp_pairs(pair_fwd, n_in)

    if subm_center is not None:
        # subm center offset is the identity map — plain matmul, no gather
        # (reference exploits the same, ``convops.py:1504`` center-init GEMM)
        acc = jnp.dot(features, weight_kv[subm_center],
                      preferred_element_type=accum_dtype)
        ks = [k for k in range(kv) if k != subm_center]
    else:
        acc = jnp.zeros((n_out, k_ch), dtype=accum_dtype)
        ks = list(range(kv))

    for chunk in _chunks(ks, n_out, c):
        ka = np.array(chunk)
        g = jnp.take(fz, pf[ka], axis=0)  # [chunk, N_out, C]
        acc = acc + jnp.einsum(
            "knc,kcd->nd", g, weight_kv[ka], preferred_element_type=accum_dtype
        )
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
    n_out = dout.shape[0]
    c = weight_kv.shape[1]
    k_ch = weight_kv.shape[2]
    out_dtype = out_dtype or dout.dtype

    dz = _zero_pad(dout)
    pb = _clamp_pairs(pair_bwd, n_out)

    if subm_center is not None:
        acc = jnp.dot(dout, weight_kv[subm_center].T,
                      preferred_element_type=accum_dtype)
        ks = [k for k in range(kv) if k != subm_center]
    else:
        acc = jnp.zeros((n_in, c), dtype=accum_dtype)
        ks = list(range(kv))

    for chunk in _chunks(ks, n_in, k_ch):
        ka = np.array(chunk)
        g = jnp.take(dz, pb[ka], axis=0)  # [chunk, N_in, K]
        acc = acc + jnp.einsum(
            "knd,kcd->nc", g, weight_kv[ka], preferred_element_type=accum_dtype
        )
    return acc.astype(out_dtype)


def wgrad_gather_mm(
    features: jax.Array,  # [N_in, C]
    dout: jax.Array,  # [N_out, K]
    pair_fwd: jax.Array,  # [kv, N_out]
    subm_center: Optional[int],
    accum_dtype=jnp.float32,
    out_dtype=None,
    pair_bwd: Optional[jax.Array] = None,
) -> jax.Array:
    """dW[k] = gather_k(features)ᵀ @ dout   →  [kv, C, K]."""
    out_dtype = out_dtype or features.dtype
    kv = pair_fwd.shape[0]
    n_out = pair_fwd.shape[1]
    n_in = features.shape[0]
    c = features.shape[1]
    k_ch = dout.shape[1]
    del subm_center  # center pair is identity-masked; generic path is exact
    del pair_bwd  # input-side walk measured no faster (probe_c0)

    parts = []
    ks = list(range(kv))
    fz = _zero_pad(features)
    pf = _clamp_pairs(pair_fwd, n_in)
    for chunk in _chunks(ks, n_out, c):
        ka = np.array(chunk)
        g = jnp.take(fz, pf[ka], axis=0)  # [chunk, N_out, C]
        parts.append(
            jnp.einsum("knc,nd->kcd", g, dout, preferred_element_type=accum_dtype)
        )
    return jnp.concatenate(parts, axis=0).astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _indice_conv_core(features, weight_kv, pair_fwd, pair_bwd, subm_center,
                      fp32_accum, algo):
    # (round 3: the pair-table Pallas implicit-GEMM variant was deleted —
    # superseded by the rulebook-free SK/DG kernel families; see
    # DESIGN_NOTES "Round 3 — settling the variant matrix")
    accum = jnp.float32 if fp32_accum else features.dtype
    return gather_mm(features, weight_kv, pair_fwd, subm_center, accum)


def _indice_conv_fwd(features, weight_kv, pair_fwd, pair_bwd, subm_center,
                     fp32_accum, algo):
    out = _indice_conv_core(
        features, weight_kv, pair_fwd, pair_bwd, subm_center, fp32_accum, algo
    )
    return out, (features, weight_kv, pair_fwd, pair_bwd)


def _indice_conv_bwd(subm_center, fp32_accum, algo, res, g):
    features, weight_kv, pair_fwd, pair_bwd = res
    accum = jnp.float32 if fp32_accum else features.dtype
    g = g.astype(features.dtype)
    din = dgrad_gather_mm(
        g, weight_kv, pair_bwd, subm_center, accum, out_dtype=features.dtype
    )
    dw = wgrad_gather_mm(
        features, g, pair_fwd, subm_center, accum, out_dtype=weight_kv.dtype,
        pair_bwd=pair_bwd,
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
    algo: str = None,
) -> jax.Array:
    """Sparse convolution compute given a rulebook.

    ``weight`` is KRSC (out-channels, *kernel, in-channels) — the only
    layout the reference supports in 2.2+ (``conv.py:129-139``,
    ``constants.py:42``).

    ``algo``: None/"native" = chunked gather+einsum.
    """
    k_out = weight.shape[0]
    c_in = weight.shape[-1]
    kv = int(np.prod(weight.shape[1:-1]))
    assert pair_fwd.shape[0] == kv, (pair_fwd.shape, weight.shape)
    # [K, kv, C] → [kv, C, K]
    weight_kv = jnp.transpose(weight.reshape(k_out, kv, c_in), (1, 2, 0))
    subm_center = kv // 2 if (is_subm and kv % 2 == 1) else None
    if algo == "native":
        algo = None
    return _indice_conv_core(
        features, weight_kv, pair_fwd, pair_bwd, subm_center, fp32_accum, algo
    )
