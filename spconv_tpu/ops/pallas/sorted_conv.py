"""Fused sorted-key submanifold convolution — rulebook-free sparse conv.

The TPU-native answer to the reference's pair-gen + masked implicit GEMM
pipeline (``spconv/csrc/sparse/indices.py`` + ``convops.py:2075``): instead
of materializing indice pairs at all, the kernel joins, gathers and
contracts in one pass over the *sorted linearized keys* of the active
sites.

Key observations (all measured, tools/probe_sort2.py, DESIGN_NOTES.md):

* XLA's row gather runs at ~200-250 GB/s and int32 element ops at
  ~0.15-0.2 G/s — both far below HBM speed — while sorts cost ~1.5 ms per
  M elements.  Any rulebook-then-gather pipeline pays these walls per
  layer.
* When the tensor's rows are sorted by linearized coordinate key (an
  invariant every builder in this framework already maintains), the rows
  matching ``keys + Δ_k`` for a fixed filter-offset key-shift ``Δ_k`` lie
  in a narrow contiguous window per output tile.  The match itself is an
  equality compare — the "hash probe" *is* the one-hot matrix the MXU
  gather needs anyway.

Per (tile, offset) the kernel: DMAs the key window + feature window
HBM→VMEM (contiguous, full bandwidth), builds the one-hot as
``probe[:, None] == key_window[None, :]``, gathers via one-hot × window on
the MXU, and accumulates all offsets through a single deep GEMM
``[T, kv·C] @ [kv·C, K]``.  Absent (offset, tile) combinations are
skipped entirely using window ranks (the role of the reference's
mask_argsort tile scheduling, ``spconv/pytorch/ops.py:766-785``) — on
LiDAR scans most tiles touch far fewer than ``kv`` offsets.

The same kernel computes dgrad (probes ``−Δ`` ≡ reversed offsets, weights
transposed — the reference's ``reverse_mask`` trick,
``convops.py:2247``); a sibling kernel accumulates wgrad per tile
(``mask_output`` role, ``ops.py:1606-1614``).

Plan (window starts / presence / overflow) is a cheap XLA computation on
tile-boundary ranks; it depends only on the keys, so layers sharing an
``indice_key`` reuse it.  Any overflow (window too narrow), unsorted
input, or huge grid (two-word keys) falls back to the rulebook+gather
path via ``lax.cond``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import coords as C

__all__ = ["SKPlan", "build_sk_plan", "sk_subm_conv", "subm_key_deltas"]

# NOTE: none of the internal functions here are @jax.jit-decorated — they
# always run under the caller's jit, and a nested jit inside lax.cond /
# fori_loop trips an XLA lowering-cache bug (KeyError: 'closed_call') on
# this jax version.

_LANE = 128


def subm_key_deltas(
    ksize: Sequence[int],
    dilation: Sequence[int],
    spatial_shape: Sequence[int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-offset key shift ``Δ_k`` and coordinate displacement ``d_k``
    on the linearized (batch-major, row-major spatial) key space."""
    offs = C.kernel_offsets(ksize)  # [kv, ndim]
    centers = np.array([k // 2 for k in ksize])
    disp = (offs - centers) * np.array([int(d) for d in dilation])
    strides = np.ones(len(spatial_shape), np.int64)
    for i in range(len(spatial_shape) - 2, -1, -1):
        strides[i] = strides[i + 1] * int(spatial_shape[i + 1])
    deltas = (disp.astype(np.int64) * strides).sum(axis=1)
    assert np.abs(deltas).max() < 2**31
    return deltas.astype(np.int32), disp.astype(np.int32)


class SKPlan(NamedTuple):
    ws: jax.Array        # [kv, n_tiles] int32 — 128-aligned window starts
    nw: jax.Array        # [kv, n_tiles] int32 — windows to sweep (0 = skip)
    fallback: jax.Array  # scalar bool — too many windows or unsorted input
    tile: int
    window: int


# A (offset, tile) whose match span exceeds MAX_NW windows (activity gaps
# make rank spans much larger than real match spans) forces the layer-wide
# rulebook fallback; in practice gap tiles need 2-4 windows.
MAX_NW = 16


def build_sk_plan(
    keys: jax.Array,  # [Np] int32 sorted, sentinel-padded
    sentinel,
    *,
    deltas: Tuple[int, ...],  # static per-offset key shifts (incl. center)
    tile: int,
    window: int,
    n_pad: int,  # padded table length the windows index into
    align: int = _LANE,  # window-start alignment (original rows)
) -> SKPlan:
    """Window plan from tile-boundary ranks.

    ``lo[k,t] = #keys < boundary_key[t] + Δ_k`` gives, per (offset, tile),
    the first possible match row; ``hi = lo[k, t+1]`` bounds the last.
    Ranks come from ONE sort of [boundary probes ‖ keys] (probes sort
    before equal table keys) + cumsum — no searchsorted (measured 30×
    slower than a sort on TPU).
    """
    np_ = keys.shape[0]
    assert np_ % tile == 0
    n_tiles = np_ // tile
    kv = len(deltas)
    d = jnp.asarray(deltas, jnp.int32)

    bkeys = keys[::tile]  # [n_tiles]
    probes = (bkeys[None, :] + d[:, None]).reshape(-1)  # [kv * n_tiles]
    npb = probes.shape[0]
    allk = jnp.concatenate([probes, keys])
    src = jnp.arange(npb + np_, dtype=jnp.int32)
    _, src_s = jax.lax.sort((allk, src), num_keys=1, is_stable=True)
    cnt = jnp.cumsum((src_s >= npb).astype(jnp.int32))
    # rank at probe positions, restored to probe order
    _, ranks = jax.lax.sort((src_s, cnt), num_keys=1, is_stable=False)
    lo = ranks[:npb].reshape(kv, n_tiles)
    n_valid = jnp.sum((keys != sentinel).astype(jnp.int32))
    # matches only exist among real keys (positions < n_valid): clamp both
    # bounds there, else a boundary probe at/past the sentinel counts the
    # pad keys and trips the overflow check spuriously
    hi = jnp.concatenate(
        [lo[:, 1:], jnp.broadcast_to(n_valid, (kv, 1))], axis=1
    )
    hi = jnp.minimum(hi, n_valid)
    lo = jnp.minimum(lo, n_valid)
    tile_live = bkeys != sentinel  # tile has at least one real row
    present = (hi > lo) & tile_live[None, :]
    ws = (lo // align) * align
    ws = jnp.clip(ws, 0, max((n_pad - window) // align * align, 0))
    # number of windows sweeping [ws, hi); most tiles need one, tiles at
    # activity gaps a few — the kernel loops, so any span stays exact
    nw = jnp.where(present, -(-(hi - ws) // window), 0)
    overflow = jnp.any(nw > MAX_NW)
    unsorted = jnp.any(keys[1:] < keys[:-1])
    return SKPlan(
        ws=ws.astype(jnp.int32),
        nw=nw.astype(jnp.int32),
        fallback=overflow | unsorted,
        tile=tile,
        window=window,
    )


def _probe_coords(kt, dims):
    """Per-axis coordinates of each tile key for bounds checks (batch
    never wraps: an out-of-range leading coordinate shifts the key out of
    the valid range, where no table key exists)."""
    rem = kt
    coord = []
    for s in reversed(dims):
        coord.append(jax.lax.rem(rem, s))
        rem = jax.lax.div(rem, s)
    return coord[::-1]


def _offset_probe(kt, live, coord, deltas, dims, k):
    disp_k = deltas[1][k]
    ok = live
    for a in range(len(dims)):
        da = int(disp_k[a])
        if da != 0:
            ok = ok & (coord[a] + da >= 0) & (coord[a] + da < dims[a])
    return jnp.where(ok, kt + int(deltas[0][k]), -1)


def _windowed_gather(probe, k, t, ws_ref, nw_ref, keys_hbm, src_hbm,
                     wkeys_ref, wsrc_ref, ksem, fsem, tile, window, c):
    """Sweep ``nw[k, t]`` windows of (keys, rows); return the one-hot
    gathered rows ``[tile, c]`` (f32).  Windows are disjoint, so each
    probe matches in exactly one sweep — any match span stays exact."""
    wr = window // _LANE
    base = pl.multiple_of(ws_ref[k, t], _LANE)

    def body(wi, g):
        start = pl.multiple_of(base + wi * window, _LANE)
        kcp = pltpu.make_async_copy(
            keys_hbm.at[pl.ds(start // _LANE, wr), :], wkeys_ref, ksem
        )
        fcp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(start, window), :], wsrc_ref, fsem
        )
        kcp.start()
        fcp.start()
        kcp.wait()
        # 2-D compares per 128-key row (Mosaic rejects the 3-D broadcast
        # form: [T]->[T,1,1] is an unsupported shape cast)
        p2 = probe[:, None]  # [tile, 1]
        oh = jnp.concatenate(
            [p2 == wkeys_ref[r][None, :] for r in range(wr)], axis=1
        )  # [tile, window]
        fcp.wait()
        return g + jnp.dot(
            oh.astype(jnp.bfloat16),
            wsrc_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    return jax.lax.fori_loop(
        0, nw_ref[k, t], body, jnp.zeros((tile, c), jnp.float32)
    )


def _sk_fwd_kernel(
    kv, center, tile, window, c, k_ch, deltas, dims, sentinel, out_dtype,
    # scalar prefetch
    ws_ref, nw_ref,
    # inputs
    kt_ref,      # [1, 1, tile] int32 - this tile's keys
    ft_ref,      # [tile, c] - this tile's features (center identity)
    keys_hbm,    # [n_pad/128, 128] int32
    feat_hbm,    # [n_pad, c]
    w_ref,       # [kv*c, k_ch] VMEM
    # output
    out_ref,     # [1, tile, k_ch]
    # scratch
    wkeys_ref, wfeat_ref, gbuf_ref, ksem, fsem,
):
    t = pl.program_id(0)
    kt = kt_ref[0, 0]  # [tile] int32
    live = kt != sentinel
    coord = _probe_coords(kt, dims)

    gbuf_ref[:, center * c:(center + 1) * c] = ft_ref[:].astype(
        gbuf_ref.dtype
    )

    for k in range(kv):
        if k == center:
            continue
        probe = _offset_probe(kt, live, coord, deltas, dims, k)

        @pl.when(nw_ref[k, t] > 0)
        def _(probe=probe, k=k):
            g = _windowed_gather(
                probe, k, t, ws_ref, nw_ref, keys_hbm, feat_hbm,
                wkeys_ref, wfeat_ref, ksem, fsem, tile, window, c,
            )
            gbuf_ref[:, k * c:(k + 1) * c] = g.astype(gbuf_ref.dtype)

        @pl.when(nw_ref[k, t] == 0)
        def _(k=k):
            gbuf_ref[:, k * c:(k + 1) * c] = jnp.zeros(
                (tile, c), gbuf_ref.dtype
            )

    out = jnp.dot(
        gbuf_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _sk_wgrad_kernel(
    kv, center, tile, window, c, k_ch, deltas, dims, sentinel,
    ws_ref, nw_ref,
    kt_ref, ft_ref, dt_ref,  # tile keys, tile features, tile dout
    keys_hbm, feat_hbm,
    out_ref,  # [kv, c, k_ch] accumulated over the grid
    wkeys_ref, wfeat_ref, ksem, fsem,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    kt = kt_ref[0, 0]
    live = kt != sentinel
    coord = _probe_coords(kt, dims)

    dt = dt_ref[:].astype(jnp.bfloat16)  # [tile, k_ch]

    # center: dW[c] += f_tile^T @ dout_tile
    out_ref[center] += jax.lax.dot_general(
        ft_ref[:].astype(jnp.bfloat16), dt,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)

    for k in range(kv):
        if k == center:
            continue
        probe = _offset_probe(kt, live, coord, deltas, dims, k)

        @pl.when(nw_ref[k, t] > 0)
        def _(probe=probe, k=k):
            g = _windowed_gather(
                probe, k, t, ws_ref, nw_ref, keys_hbm, feat_hbm,
                wkeys_ref, wfeat_ref, ksem, fsem, tile, window, c,
            )  # [tile, c] gathered features
            out_ref[k] += jax.lax.dot_general(
                g.astype(jnp.bfloat16), dt,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


def _pad_rows(x: jax.Array, n_pad: int, fill) -> jax.Array:
    if x.shape[0] == n_pad:
        return x
    pad = jnp.full((n_pad - x.shape[0], *x.shape[1:]), fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _sk_conv_call(
    features, keys, weight_kv, plan,
    *, deltas_key, disp, dims, sentinel_i, tile, window, interpret=False,
):
    """Shared fwd/dgrad kernel invocation (dgrad passes reversed deltas
    and transposed per-offset weights)."""
    n = keys.shape[0]
    kv, c, k_ch = weight_kv.shape
    n_tiles = -(-n // tile)
    np_t = n_tiles * tile
    n_pad = max(np_t + window, window)
    n_pad = -(-n_pad // _LANE) * _LANE

    keys_p = _pad_rows(keys, n_pad, sentinel_i)
    feat_p = _pad_rows(features, n_pad, 0)
    keys_tiles = keys_p[:np_t].reshape(n_tiles, 1, tile)
    keys2d = keys_p.reshape(n_pad // _LANE, _LANE)
    wflat = jnp.transpose(weight_kv, (0, 1, 2)).reshape(kv * c, k_ch)

    deltas = (np.asarray(deltas_key, np.int32),
              np.asarray(disp, np.int32).reshape(kv, len(dims)))
    center = kv // 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k_ch), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window // _LANE, _LANE), jnp.int32),
            pltpu.VMEM((window, c), features.dtype),
            pltpu.VMEM((tile, kv * c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _sk_fwd_kernel, kv, center, tile, window, c, k_ch, deltas,
        tuple(dims), sentinel_i, features.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, k_ch),
                                       features.dtype),
        interpret=interpret,
    )(plan.ws, plan.nw, keys_tiles, feat_p[:np_t], keys2d, feat_p,
      wflat.astype(jnp.bfloat16))
    return out.reshape(np_t, k_ch)[:n]


def _sk_wgrad_call(
    features, dout, keys, plan,
    *, deltas_key, disp, dims, sentinel_i, tile, window, kv,
    interpret=False,
):
    n = keys.shape[0]
    c = features.shape[1]
    k_ch = dout.shape[1]
    n_tiles = -(-n // tile)
    np_t = n_tiles * tile
    n_pad = -(-(np_t + window) // _LANE) * _LANE

    keys_p = _pad_rows(keys, n_pad, sentinel_i)
    feat_p = _pad_rows(features, n_pad, 0)
    dout_p = _pad_rows(dout, np_t, 0)
    keys_tiles = keys_p[:np_t].reshape(n_tiles, 1, tile)
    keys2d = keys_p.reshape(n_pad // _LANE, _LANE)

    deltas = (np.asarray(deltas_key, np.int32),
              np.asarray(disp, np.int32).reshape(kv, len(dims)))
    center = kv // 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k_ch), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((kv, c, k_ch), lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window // _LANE, _LANE), jnp.int32),
            pltpu.VMEM((window, c), features.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _sk_wgrad_kernel, kv, center, tile, window, c, k_ch, deltas,
        tuple(dims), sentinel_i,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kv, c, k_ch), jnp.float32),
        interpret=interpret,
    )(plan.ws, plan.nw, keys_tiles, feat_p[:np_t], dout_p, keys2d,
      feat_p)
    return out


class _SKGeom(NamedTuple):
    """Static geometry closed over by the custom-vjp entry."""
    deltas_key: tuple
    disp: tuple
    dims: tuple
    sentinel: int
    tile: int
    window: int
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sk_conv(features, keys, weight_kv, plans, geom: _SKGeom):
    """plans = (plan_fwd, plan_bwd); plan_bwd uses reversed deltas."""
    plan_fwd, _ = plans
    return _sk_conv_call(
        features, keys, weight_kv, plan_fwd,
        deltas_key=geom.deltas_key, disp=geom.disp, dims=geom.dims,
        sentinel_i=geom.sentinel, tile=geom.tile, window=geom.window,
        interpret=geom.interpret,
    )


def _sk_conv_fwd(features, keys, weight_kv, plans, geom):
    out = _sk_conv(features, keys, weight_kv, plans, geom)
    return out, (features, keys, weight_kv, plans)


def _sk_conv_bwd(geom, res, g):
    features, keys, weight_kv, plans = res
    plan_fwd, plan_bwd = plans
    g = g.astype(features.dtype)
    kv = weight_kv.shape[0]
    # dgrad: offset k probes −Δ_k and contracts with W[k]ᵀ
    rev_deltas = tuple(-d for d in geom.deltas_key)
    rev_disp = tuple(-d for d in geom.disp)
    w_rev_t = jnp.transpose(weight_kv, (0, 2, 1))
    din = _sk_conv_call(
        g, keys, w_rev_t, plan_bwd,
        deltas_key=rev_deltas, disp=rev_disp, dims=geom.dims,
        sentinel_i=geom.sentinel, tile=geom.tile, window=geom.window,
        interpret=geom.interpret,
    ).astype(features.dtype)
    dw = _sk_wgrad_call(
        features, g, keys, plan_fwd,
        deltas_key=geom.deltas_key, disp=geom.disp, dims=geom.dims,
        sentinel_i=geom.sentinel, tile=geom.tile, window=geom.window,
        kv=kv, interpret=geom.interpret,
    ).astype(weight_kv.dtype)
    zf = jax.dtypes.float0
    return (din, np.zeros(keys.shape, dtype=zf), dw,
            jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), dtype=zf),
                (plan_fwd, plan_bwd)))


_sk_conv.defvjp(_sk_conv_fwd, _sk_conv_bwd)


def sk_subm_conv(
    features: jax.Array,   # [N, C]
    indices: jax.Array,    # [N, ndim+1] — for the fallback path only
    keys: jax.Array,       # [N] int32 sorted linearized keys
    weight: jax.Array,     # KRSC [K, *ksize, C]
    *,
    spatial_shape: Sequence[int],
    batch_size: int,
    dilation: Sequence[int],
    tile: int = 256,
    window: int = 512,
    plans: Optional[Tuple[SKPlan, SKPlan]] = None,
    interpret: bool = False,
    fallback: bool = True,
) -> jax.Array:
    """Rulebook-free subm conv on a key-sorted tensor → ``[N, K]``.

    Differentiable (custom VJP: dgrad = reversed-offset kernel, wgrad =
    per-tile accumulation kernel).  Falls back to rulebook + gather when
    the plan reports window overflow or unsorted keys.
    """
    ndim = indices.shape[1] - 1
    ksize = tuple(int(k) for k in weight.shape[1:-1])
    dilation = tuple(int(d) for d in dilation)
    k_out = weight.shape[0]
    c = weight.shape[-1]
    kv = int(np.prod(ksize))
    weight_kv = jnp.transpose(
        weight.reshape(k_out, kv, c), (1, 2, 0)
    )  # [kv, C, K]

    deltas_np, disp_np = subm_key_deltas(ksize, dilation, spatial_shape)
    dims = tuple(int(s) for s in spatial_shape)
    sentinel = int(np.prod(dims)) * int(batch_size)
    n = keys.shape[0]
    n_tiles = -(-n // tile)
    np_t = n_tiles * tile
    n_pad = -(-(np_t + window) // _LANE) * _LANE

    if plans is None:
        plans = build_sk_plans(
            keys, sentinel, deltas_np, tile=tile, window=window,
            n_pad=n_pad,
        )

    geom = _SKGeom(
        deltas_key=tuple(int(d) for d in deltas_np),
        disp=tuple(int(v) for v in disp_np.reshape(-1)),
        dims=dims, sentinel=sentinel, tile=tile, window=window,
        interpret=interpret,
    )

    def fast(args):
        f, k_, w = args
        return _sk_conv(f, k_, w, plans, geom)

    if not fallback:
        return fast((features, keys, weight_kv))

    def slow(args):
        f, k_, w = args
        from ..rulebook import build_subm_rulebook
        from ..gather_gemm import indice_conv

        # __wrapped__: a jitted call inside lax.cond trips an XLA lowering
        # cache bug (KeyError: closed_call) on this jax version
        data = build_subm_rulebook.__wrapped__(
            indices, spatial_shape=dims, batch_size=batch_size,
            ksize=ksize, dilation=dilation,
        )
        return indice_conv(
            f, weight, data.pair_fwd, data.pair_bwd, is_subm=True,
            fp32_accum=True,
        )

    need_fallback = plans[0].fallback | plans[1].fallback
    return jax.lax.cond(
        need_fallback, slow, fast, (features, keys, weight_kv)
    )


def build_sk_plans(keys, sentinel, deltas_np, *, tile, window, n_pad):
    """(fwd, bwd) plans — bwd probes are the reversed (negated) deltas."""
    fwd = build_sk_plan(
        keys, sentinel,
        deltas=tuple(int(d) for d in deltas_np),
        tile=tile, window=window, n_pad=n_pad,
    )
    bwd = build_sk_plan(
        keys, sentinel,
        deltas=tuple(int(-d) for d in deltas_np),
        tile=tile, window=window, n_pad=n_pad,
    )
    return fwd, bwd
