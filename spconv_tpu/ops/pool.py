"""Sparse pooling compute (parity: ``spconv/csrc/sparse/maxpool.py`` —
IndiceMaxPool fwd/bwd, avgpool with present-count normalization, global
pool rearrange — re-expressed as masked gather reductions that XLA
fuses; backward comes from JAX autodiff through the max/mean, which
matches the reference's argmax-routing semantics)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["indice_maxpool", "indice_avgpool", "global_pool"]


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
