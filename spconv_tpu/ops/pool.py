"""Sparse pooling compute (parity: ``spconv/csrc/sparse/maxpool.py`` —
IndiceMaxPool fwd/bwd, avgpool with present-count normalization, global
pool rearrange — re-expressed as masked gather reductions that XLA
fuses; backward comes from JAX autodiff through the max/mean, which
matches the reference's argmax-routing semantics)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import coords as C

__all__ = ["indice_maxpool", "indice_avgpool", "global_pool", "pool2_seg"]


_POOL_CHUNK_BUDGET = 64 * 1024 * 1024


def _pool_chunks(kv: int, n: int, c: int):
    per = max(1, min(kv, _POOL_CHUNK_BUDGET // max(1, n * c)))
    return [list(range(i, min(i + per, kv))) for i in range(0, kv, per)]


def indice_maxpool(features: jax.Array, pair_fwd: jax.Array) -> jax.Array:
    """out[o] = max over offsets k (present pairs only) of feat[pair[k,o]];
    outputs with no pairs → 0.  Batched chunked gathers (a scan-carried
    accumulator blocks XLA fusion — same finding as the conv compute)."""
    kv, n_out = pair_fwd.shape
    c = features.shape[1]
    # clamp invalid pairs to a -inf row appended at the end
    fpad = jnp.concatenate(
        [features.astype(jnp.float32),
         jnp.full((1, c), -jnp.inf, jnp.float32)], axis=0)
    pf = jnp.where(pair_fwd >= 0, pair_fwd, features.shape[0])
    acc = jnp.full((n_out, c), -jnp.inf, jnp.float32)
    for ch in _pool_chunks(kv, n_out, c):
        g = jnp.take(fpad, pf[np.array(ch)], axis=0)  # [chunk, N, C]
        acc = jnp.maximum(acc, jnp.max(g, axis=0))
    acc = jnp.where(jnp.isfinite(acc), acc, 0)
    return acc.astype(features.dtype)


def indice_avgpool(features: jax.Array, pair_fwd: jax.Array) -> jax.Array:
    """Average over *present* inputs per output (count_include_pad=False
    semantics, parity: ``maxpool.py:211-302`` avgpool count normalization)."""
    kv, n_out = pair_fwd.shape
    c = features.shape[1]
    fpad = jnp.concatenate(
        [features.astype(jnp.float32), jnp.zeros((1, c), jnp.float32)], axis=0)
    pf = jnp.where(pair_fwd >= 0, pair_fwd, features.shape[0])
    acc = jnp.zeros((n_out, c), jnp.float32)
    for ch in _pool_chunks(kv, n_out, c):
        g = jnp.take(fpad, pf[np.array(ch)], axis=0)
        acc = acc + jnp.sum(g, axis=0)
    cnt = jnp.sum((pair_fwd >= 0).astype(jnp.float32), axis=0)[:, None]
    out = acc / jnp.maximum(cnt, 1)
    return out.astype(features.dtype)


@partial(
    jax.jit,
    static_argnames=("spatial_shape", "batch_size", "out_bound", "mode"),
)
def pool2_seg(
    features: jax.Array,
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    out_bound: int,
    mode: str = "max",
):
    """Fused discovery + reduction for the kernel-2/stride-2/pad-0 pool:
    one payload sort of the pooled keys, one row gather into sorted
    order, then an *ordered* scatter-max/sum over the segment ids (which
    are non-decreasing by construction, so XLA reduces linearly instead
    of doing kv random pair-table gathers).  Measured 13.6 ms vs the
    pair-table path's 66.3 ms at 914k voxels / C=64 on v5e.

    (r5 note: a log-shift run-reduction formulation — ndim roll+select
    passes + 1-lane position scatter + row gather — was built and
    MEASURED SLOWER on v5e: 20.9 ms fwd / 52.0 ms fwd+bwd vs this
    formulation's 14.7 / 24.7; the rolled [N,C] copies cost more HBM
    traffic than the sorted scatter saves.  Reverted.)

    Semantics parity: ``spconv/csrc/sparse/maxpool.py`` fwd kernels;
    avg = present-count normalization (``maxpool.py:211-302``).

    Returns ``(out_features [out_bound, C], out_indices
    [out_bound, ndim+1], num_out, num_out_total)``; invalid tail rows
    are 0-features / -1-indices.
    """
    n, c = features.shape
    ndim = indices.shape[1] - 1
    out_shape = C.get_conv_output_size(
        spatial_shape, (2,) * ndim, (2,) * ndim, (0,) * ndim, (1,) * ndim
    )
    oshape_arr = jnp.asarray(out_shape, jnp.int32)
    oc = indices[:, 1:] // 2
    # odd-edge inputs fall outside the last full window (VALID pooling)
    valid = (indices[:, 0] >= 0) & jnp.all(oc < oshape_arr, axis=-1)
    out_c = jnp.concatenate([indices[:, :1], oc], axis=-1)
    keys, sentinel = C.linearize(out_c, out_shape, batch_size, valid)

    sk, order = C.sort_with_ids(keys)
    not_sent = ~C.is_sentinel(sk, sentinel)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out_total = jnp.sum(is_first.astype(jnp.int32))
    seg = jnp.where(not_sent & (uniq_pos < out_bound), uniq_pos, out_bound)

    g = jnp.take(features, order, axis=0)
    # segments are compacted by uniq_pos, so output row i is occupied iff
    # i < num_out_total; masking by presence (not isfinite) preserves
    # genuine non-finite feature values (ADVICE r4 low)
    present = (jnp.arange(out_bound) < num_out_total)[:, None]
    if mode == "max":
        # bf16 stays bf16 end to end (max is exact; halves HBM traffic)
        acc = jnp.full((out_bound + 1, c), -jnp.inf, features.dtype)
        acc = acc.at[seg].max(g, mode="drop", indices_are_sorted=True,
                              unique_indices=False)
        out_feat = jnp.where(present, acc[:out_bound], 0)
    elif mode == "mean":
        acc = jnp.zeros((out_bound + 1, c), jnp.float32)
        acc = acc.at[seg].add(g.astype(jnp.float32), mode="drop",
                              indices_are_sorted=True)
        cnt = jnp.zeros((out_bound + 1,), jnp.float32).at[seg].add(
            jnp.where(not_sent, 1.0, 0.0), mode="drop",
            indices_are_sorted=True)
        out_feat = (acc[:out_bound]
                    / jnp.maximum(cnt[:out_bound, None], 1)).astype(
                        features.dtype)
    else:
        raise ValueError(mode)

    uniq_scatter = jnp.where(is_first & (uniq_pos < out_bound), uniq_pos,
                             out_bound)
    out_keys = C.full_sentinel(out_bound, sentinel).astype(
        sk.dtype if sk.ndim == 1 else jnp.int32
    )
    out_keys = out_keys.at[uniq_scatter].set(sk, mode="drop")
    out_valid = ~C.is_sentinel(out_keys, sentinel)
    out_indices = C.delinearize(out_keys, out_shape, out_valid)
    return (out_feat, out_indices, jnp.minimum(num_out_total, out_bound),
            num_out_total)


def global_pool(
    features: jax.Array,
    indices: jax.Array,
    batch_size: int,
    mode: str = "max",
) -> jax.Array:
    """Per-batch global max/avg over active sites → dense ``[B, C]``
    (parity: ``pool.py:251-285`` + ``ops.py:2108`` global_pool_rearrange)."""
    valid = indices[:, 0] >= 0
    seg = jnp.where(valid, indices[:, 0], batch_size)
    if mode == "max":
        out = jax.ops.segment_max(
            jnp.where(valid[:, None], features.astype(jnp.float32), -jnp.inf),
            seg,
            num_segments=batch_size + 1,
        )[:batch_size]
        out = jnp.where(jnp.isfinite(out), out, 0)
    elif mode == "mean":
        s = jax.ops.segment_sum(
            jnp.where(valid[:, None], features.astype(jnp.float32), 0),
            seg,
            num_segments=batch_size + 1,
        )[:batch_size]
        cnt = jax.ops.segment_sum(
            valid.astype(jnp.float32), seg, num_segments=batch_size + 1
        )[:batch_size]
        out = s / jnp.maximum(cnt[:, None], 1)
    else:
        raise ValueError(mode)
    return out.astype(features.dtype)
