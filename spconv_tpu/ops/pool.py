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


def indice_maxpool(features: jax.Array, pair_fwd: jax.Array) -> jax.Array:
    """out[o] = max over offsets k (present pairs only) of feat[pair[k,o]];
    outputs with no pairs → 0."""
    neg_inf = jnp.array(-jnp.inf, dtype=jnp.float32)

    def body(acc, pf_k):
        g = jnp.take(features, jnp.maximum(pf_k, 0), axis=0).astype(jnp.float32)
        g = jnp.where((pf_k >= 0)[:, None], g, neg_inf)
        return jnp.maximum(acc, g), None

    init = jnp.full((pair_fwd.shape[1], features.shape[1]), -jnp.inf, jnp.float32)
    acc, _ = jax.lax.scan(body, init, pair_fwd)
    acc = jnp.where(jnp.isfinite(acc), acc, 0)
    return acc.astype(features.dtype)


def indice_avgpool(features: jax.Array, pair_fwd: jax.Array) -> jax.Array:
    """Average over *present* inputs per output (count_include_pad=False
    semantics, parity: ``maxpool.py:211-302`` avgpool count normalization)."""

    def body(carry, pf_k):
        acc, cnt = carry
        valid = (pf_k >= 0)[:, None]
        g = jnp.take(features, jnp.maximum(pf_k, 0), axis=0).astype(jnp.float32)
        g = jnp.where(valid, g, 0)
        return (acc + g, cnt + valid.astype(jnp.float32)), None

    n_out = pair_fwd.shape[1]
    init = (
        jnp.zeros((n_out, features.shape[1]), jnp.float32),
        jnp.zeros((n_out, 1), jnp.float32),
    )
    (acc, cnt), _ = jax.lax.scan(body, init, pair_fwd)
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
