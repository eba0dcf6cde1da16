"""Fused sorted-key 2×-pooling — rulebook-free pair phase.

Role parity: the reference's IndiceMaxPool/avgpool kernels consume
precomputed indice pairs (``spconv/csrc/sparse/maxpool.py``); here the
kernel joins children to parents in-pass over the sorted keys, the same
machinery as the sorted-key conv (``sorted_conv.py``), with:

* probes = child keys of each output (parent) row — a monotone but
  nonlinear map of the parent key, computed in-kernel from decoded
  coordinates (2·c + off, bounds-checked at odd edges);
* presence carried in a spare padded feature lane (lane ``C`` holds 1.0
  for valid rows), so max-pooling can mask absent children without any
  lane reduction;
* two plane groups (leading-axis offset 0/1) sharing one window DMA
  each, double-buffered across (tile, plane) steps.

Output-site discovery (sort + dedup of parent keys) stays in XLA —
``build_pool2_rulebook`` — but the pair scatters and gather-reduce are
replaced by this kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sorted_conv as SK
from .sorted_conv import (_ALIGN, _KPITCH, _LANE, SKPlan,
                          _n_pad_for, _pad_lanes, _pad_rows,
                          _plan_from_row_probes, prep_keys_sh)

__all__ = ["sk_pool2", "sk_pool2_ad", "build_pool2_sk_plan", "pool2_row_probes"]


def _pool_offsets(ndim: int) -> np.ndarray:
    """2^ndim child offsets, leading axis most significant."""
    offs = np.stack(np.meshgrid(*([np.arange(2)] * ndim), indexing="ij"),
                    axis=-1).reshape(-1, ndim)
    return offs.astype(np.int32)


def _pool_groups(ndim: int) -> Tuple[Tuple[int, ...], ...]:
    lead = 2 ** (ndim - 1)
    return (tuple(range(lead)), tuple(range(lead, 2 * lead)))


def pool2_row_probes(out_keys, out_dims, in_dims, sentinel_out):
    """Per-row child probes [kv, M] of each parent key + validity."""
    ndim = len(out_dims)
    offs = _pool_offsets(ndim)
    rem = out_keys
    coord = []
    for s in reversed(out_dims):
        coord.append(rem % s)
        rem = rem // s
    coord = coord[::-1]
    b = rem
    live = out_keys != sentinel_out
    probes, valids = [], []
    for off in offs:
        ok = live
        key = b
        for a in range(ndim):
            ca = coord[a] * 2 + int(off[a])
            ok = ok & (ca < in_dims[a])
            key = key * in_dims[a] + ca
        probes.append(key.astype(jnp.int32))
        valids.append(ok)
    return jnp.stack(probes), jnp.stack(valids)


def build_pool2_sk_plan(
    in_keys_padded, out_keys_padded, sentinel_in, sentinel_out,
    *, out_dims, in_dims, tile, window, n_pad,
) -> SKPlan:
    nt = out_keys_padded.shape[0] // tile * tile
    probes, valids = pool2_row_probes(out_keys_padded[:nt], out_dims,
                                      in_dims, sentinel_out)
    groups = _pool_groups(len(out_dims))
    return _plan_from_row_probes(
        in_keys_padded, probes, valids, sentinel_in, tile=tile,
        groups=groups, window=window, n_pad=n_pad,
    )


def _sk_pool_kernel(
    kv, tile, window, c_pad, c_real, out_dims, in_dims, sentinel_out,
    groups, offs, n_tiles, mode,
    ws_ref, nw_ref,
    okt_ref,     # [1, 1, tile] int32 parent keys
    ksh_hbm,     # shifted child-key copies
    feat_hbm,    # [n_pad, c_pad] (lane c_real = presence 1.0)
    out_ref,     # [1, tile, c_pad]
    wk2_ref, wf2_ref, wk1_ref, wf1_ref,
    ksem2, fsem2, ksem1, fsem1,
):
    t = pl.program_id(0)
    n_planes = len(groups)
    wr = window // _LANE

    okt = okt_ref[0, 0]
    live = okt != sentinel_out
    rem = okt
    coord = []
    for s in reversed(out_dims):
        coord.append(jax.lax.rem(rem, s))
        rem = jax.lax.div(rem, s)
    coord = coord[::-1]
    bidx = rem

    def probe_of(k, plive):
        ok = plive
        key = bidx
        for a in range(len(in_dims)):
            ca = coord[a] * 2 + int(offs[k][a])
            ok = ok & (ca < in_dims[a])
            key = key * in_dims[a] + ca
        return jnp.where(ok, key, -1)

    def start_dma2(step, buf):
        tt = step // n_planes
        pp = step % n_planes
        base = ws_ref[pp, tt]
        ish = jax.lax.rem(base, _LANE) // _KPITCH
        r0 = base // _LANE
        pltpu.make_async_copy(
            ksh_hbm.at[ish, pl.ds(r0, wr), :], wk2_ref.at[buf],
            ksem2.at[buf],
        ).start()
        pltpu.make_async_copy(
            feat_hbm.at[pl.ds(pl.multiple_of(base, _ALIGN), window), :],
            wf2_ref.at[buf], fsem2.at[buf],
        ).start()

    def start_dma1(pp, wi, buf):
        base = ws_ref[pp, t] + wi * window
        ish = jax.lax.rem(base, _LANE) // _KPITCH
        r0 = base // _LANE
        pltpu.make_async_copy(
            ksh_hbm.at[ish, pl.ds(r0, wr), :], wk1_ref.at[buf],
            ksem1.at[buf],
        ).start()
        pltpu.make_async_copy(
            feat_hbm.at[pl.ds(pl.multiple_of(base, _ALIGN), window), :],
            wf1_ref.at[buf], fsem1.at[buf],
        ).start()

    if mode == "max":
        acc = jnp.full((tile, c_pad), -jnp.inf, jnp.float32)
    else:
        acc = jnp.zeros((tile, c_pad), jnp.float32)

    for p, grp in enumerate(groups):
        s = t * n_planes + p
        buf = s % 2
        if p == 0:
            @pl.when(t == 0)
            def _():
                start_dma2(0, 0)

        @pl.when(s + 1 < n_tiles * n_planes)
        def _(s=s):
            start_dma2(s + 1, (s + 1) % 2)

        pltpu.make_async_copy(
            ksh_hbm.at[0, pl.ds(0, wr), :], wk2_ref.at[buf],
            ksem2.at[buf],
        ).wait()
        pltpu.make_async_copy(
            feat_hbm.at[pl.ds(0, window), :], wf2_ref.at[buf],
            fsem2.at[buf],
        ).wait()

        nw = nw_ref[p, t]
        plive = live & (nw > 0)
        probes = [probe_of(k, plive) for k in grp]

        @pl.when(nw > 1)
        def _(p=p):
            start_dma1(p, 1, 1)

        outs = SK._plane_gather(wk2_ref[buf], wf2_ref[buf], probes, tile,
                                window, c_pad)

        def extra(wi, accs, p=p, probes=probes):
            sb = jax.lax.rem(wi, 2)

            @pl.when(wi + 1 < nw)
            def _():
                start_dma1(p, wi + 1, jax.lax.rem(wi + 1, 2))
            pltpu.make_async_copy(
                ksh_hbm.at[0, pl.ds(0, wr), :], wk1_ref.at[0],
                ksem1.at[sb],
            ).wait()
            pltpu.make_async_copy(
                feat_hbm.at[pl.ds(0, window), :], wf1_ref.at[0],
                fsem1.at[sb],
            ).wait()
            eo = SK._plane_gather(wk1_ref[sb], wf1_ref[sb], probes, tile,
                                  window, c_pad)
            return [a + e for a, e in zip(accs, eo)]

        outs = jax.lax.fori_loop(1, nw, extra, outs)

        for g2 in outs:
            if mode == "max":
                present = g2[:, c_real:c_real + 1] > 0.5
                acc = jnp.maximum(acc, jnp.where(present, g2, -jnp.inf))
            else:
                acc = acc + g2

    if mode == "max":
        acc = jnp.where(jnp.isfinite(acc), acc, 0.0)
    else:
        cnt = jnp.maximum(acc[:, c_real:c_real + 1], 1.0)
        acc = acc / cnt
    out_ref[0] = acc.astype(out_ref.dtype)


def sk_pool2(
    features: jax.Array,     # [N, C]
    in_keys: jax.Array,      # [N] int32 sorted child keys
    out_keys: jax.Array,     # [M] int32 sorted parent keys (sentinel pad)
    *,
    in_shape: Sequence[int],
    out_shape: Sequence[int],
    batch_size: int,
    mode: str = "max",
    tile: int = 128,
    window: int = 512,
    plan: Optional[SKPlan] = None,
    interpret: bool = False,
) -> jax.Array:
    """Rulebook-free 2×/stride-2 pooling on sorted keys → ``[M, C]``.
    Returns features only (output sites are discovered by the caller).

    Not differentiated through (inference pooling); training uses the
    rulebook path.
    """
    in_dims = tuple(int(s) for s in in_shape)
    out_dims = tuple(int(s) for s in out_shape)
    ndim = len(in_dims)
    kv = 2 ** ndim
    c = features.shape[1]
    # +1: presence lane
    c_pad = SK._round_up(c + 1, _LANE)
    n = in_keys.shape[0]
    m = out_keys.shape[0]
    sent_in = int(np.prod(in_dims)) * int(batch_size)
    sent_out = int(np.prod(out_dims)) * int(batch_size)

    n_tiles = -(-m // tile)
    m_t = n_tiles * tile
    _, n_pad = _n_pad_for(n, tile, window)

    in_keys_p = _pad_rows(in_keys, n_pad, sent_in)
    okeys_p = _pad_rows(out_keys, m_t, sent_out)
    # presence lane (lane c): 1.0 on valid (non-pad) rows
    pres = ((in_keys >= 0) & (in_keys < sent_in)).astype(features.dtype)
    feat_p = _pad_lanes(
        jnp.concatenate([features, pres[:, None]], axis=1), c_pad)
    feat_p = _pad_rows(feat_p, n_pad, 0)
    ksh = prep_keys_sh(in_keys_p)
    okt = okeys_p.reshape(n_tiles, 1, tile)

    if plan is None:
        plan = build_pool2_sk_plan(
            in_keys_p, okeys_p, sent_in, sent_out,
            out_dims=out_dims, in_dims=in_dims, tile=tile, window=window,
            n_pad=n_pad,
        )

    offs = _pool_offsets(ndim)
    groups = _pool_groups(ndim)
    wr = window // _LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile, c_pad), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, c_pad), feat_p.dtype),
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, c_pad), feat_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _sk_pool_kernel, kv, tile, window, c_pad, c, out_dims, in_dims,
        sent_out, groups, offs, n_tiles, mode,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, c_pad),
                                       features.dtype),
        interpret=interpret,
    )(plan.ws, plan.nw, okt, ksh, feat_p)
    return out.reshape(m_t, c_pad)[:m, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def sk_pool2_ad(features, in_keys, out_keys, indices, geom):
    """Differentiable sorted-key pool.  Forward = fused kernel; backward =
    the XLA parent-gather formula over the fast pool rulebook — max grads
    route to every input equal to the max, the reference's value-compare
    semantics (``csrc/sparse/maxpool.py:41-158``).

    ``geom[7]`` (``sorted_static``): when the caller statically knows the
    input rows are key-sorted, no ``lax.cond`` rulebook fallback branch
    is compiled at all; otherwise unsorted input falls back dynamically."""
    (in_shape, out_shape, batch_size, mode, tile, window, interpret,
     sorted_static) = (geom + (False,))[:8]

    plan = None
    n = in_keys.shape[0]
    m = out_keys.shape[0]
    sent_in = int(np.prod(in_shape)) * int(batch_size)
    sent_out = int(np.prod(out_shape)) * int(batch_size)
    n_tiles = -(-m // tile)
    m_t = n_tiles * tile
    _, n_pad = _n_pad_for(n, tile, window)
    in_keys_p = _pad_rows(in_keys, n_pad, sent_in)
    okeys_p = _pad_rows(out_keys, m_t, sent_out)
    plan = build_pool2_sk_plan(
        in_keys_p, okeys_p, sent_in, sent_out, out_dims=out_shape,
        in_dims=in_shape, tile=tile, window=window, n_pad=n_pad,
    )

    def fast(f):
        return sk_pool2(
            f, in_keys, out_keys, in_shape=in_shape, out_shape=out_shape,
            batch_size=batch_size, mode=mode, tile=tile, window=window,
            plan=plan, interpret=interpret,
        )

    def slow(f):
        from ...ops.rulebook import build_pool2_rulebook
        from ...ops.pool import indice_avgpool, indice_maxpool

        data = build_pool2_rulebook.__wrapped__(
            indices, spatial_shape=in_shape, batch_size=batch_size,
            out_bound=m,
        )
        if mode == "max":
            return indice_maxpool(f, data.pair_fwd)
        return indice_avgpool(f, data.pair_fwd)

    if sorted_static:
        return fast(features)
    return jax.lax.cond(plan.fallback, slow, fast, features)


def _sk_pool2_ad_fwd(features, in_keys, out_keys, indices, geom):
    out = sk_pool2_ad(features, in_keys, out_keys, indices, geom)
    return out, (features, out, indices)


def _sk_pool2_ad_bwd(geom, res, dout):
    in_shape, out_shape, batch_size, mode, tile, window, interpret = geom[:7]
    features, out, indices = res
    from ...ops.rulebook import build_pool2_rulebook

    data = build_pool2_rulebook.__wrapped__(
        indices, spatial_shape=in_shape, batch_size=batch_size,
        out_bound=out.shape[0],
    )
    parent = data.pair_bwd[0]  # output row fed by each input (−1 = none)
    pc = jnp.where(parent >= 0, parent, out.shape[0])
    dpad = jnp.concatenate(
        [dout.astype(jnp.float32),
         jnp.zeros((1, dout.shape[1]), jnp.float32)], axis=0)
    dg = jnp.take(dpad, pc, axis=0)  # [N, C] dout at parent
    if mode == "max":
        opad = jnp.concatenate(
            [out.astype(jnp.float32),
             jnp.full((1, out.shape[1]), jnp.inf, jnp.float32)], axis=0)
        og = jnp.take(opad, pc, axis=0)
        din = jnp.where(features.astype(jnp.float32) == og, dg, 0.0)
    else:
        cnt = jnp.sum((data.pair_fwd >= 0).astype(jnp.float32), axis=0)
        cpad = jnp.concatenate([jnp.maximum(cnt, 1.0),
                                jnp.ones((1,), jnp.float32)])
        din = dg / jnp.take(cpad, pc)[:, None]
    zf = jax.dtypes.float0
    return (din.astype(features.dtype),
            np.zeros((features.shape[0],), dtype=zf),
            np.zeros((out.shape[0],), dtype=zf),
            np.zeros(indices.shape, dtype=zf))


sk_pool2_ad.defvjp(_sk_pool2_ad_fwd, _sk_pool2_ad_bwd)
