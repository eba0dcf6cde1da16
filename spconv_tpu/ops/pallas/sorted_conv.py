"""Fused sorted-key submanifold convolution — rulebook-free sparse conv.

The TPU-native answer to the reference's pair-gen + masked implicit GEMM
pipeline (``spconv/csrc/sparse/indices.py`` + ``convops.py:2075``): instead
of materializing indice pairs at all, the kernel joins, gathers and
contracts in one pass over the *sorted linearized keys* of the active
sites.

Design (v5 — measured on a v5e, tools/probe_sk_v3.py ablations):

* When rows are sorted by linearized coordinate key (an invariant every
  builder in this framework maintains), the rows matching ``keys + Δ_k``
  for a filter-offset key-shift ``Δ_k`` lie in a narrow contiguous window
  per output tile, and offsets sharing a leading-axis displacement (a
  "dz-plane" of the kernel) have windows within a few rows of each other.
  The kernel DMAs ONE window per plane (3 for a 3×3×3 kernel instead of
  26) and double-buffers the (tile, plane) window stream so DMA latency
  hides behind compute.
* The join is an equality compare ``probe[:, None] == window_keys`` whose
  result IS the one-hot matrix the MXU gather needs; matches provably lie
  inside ``[lo, hi)`` of the plan, so comparing against a covering
  superset of DMA'd rows is harmless — window starts only need the DMA's
  native alignment, with no shifted-copy gymnastics for features.
* Features are lane-padded to a multiple of 128 (``c_pad``) so the row
  windows are legal DMA slices; the weight GEMM's padded rows are zero so
  no masking is needed anywhere.  (A 2-row-packed variant measured faster
  DMA but pays an expensive per-slot selection — rejected.)
* Keys are kept as 8 row-shifted copies (``NSH``) so the int32 key-window
  DMA start can always be snapped to an 8-sublane-aligned row.

Per (tile, plane): DMA key+feature windows HBM→VMEM; per offset of the
plane build the one-hot and gather via one MXU matmul (batched across the
plane's offsets); all offsets accumulate through a single deep GEMM
``[T, kv·c_pad] @ [kv·c_pad, K]``.  Skipping absent (plane, tile)
combinations plays the role of the reference's mask_argsort tile
scheduling (``spconv/pytorch/ops.py:766-785``).

The same kernel computes dgrad (probes ``−Δ`` ≡ reversed offsets, weights
transposed — the reference's ``reverse_mask`` trick, ``convops.py:2247``);
a sibling kernel accumulates wgrad per tile (``mask_output`` role,
``ops.py:1606-1614``).

The plan (window starts / counts) is a cheap XLA computation on
tile-boundary ranks; it depends only on the keys, so layers sharing an
``indice_key`` reuse it.  Unsorted input falls back to the
rulebook+gather path via ``lax.cond`` — but when the caller statically
knows the keys are sorted (``SparseConvTensor.keys_sorted``) no fallback
branch is compiled at all.  Huge grids (two-word keys) are routed to the
rulebook path statically by the modules.
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

__all__ = [
    "SKPlan", "build_sk_plans", "sk_subm_conv", "subm_key_deltas",
    "sk_groups", "prep_keys_sh", "SKData", "sk_subm_conv_q",
    "sk_regular_conv", "build_sk_reg_plans", "SKRegData",
]

# NOTE: none of the internal functions here are @jax.jit-decorated — they
# always run under the caller's jit, and a nested jit inside lax.cond /
# fori_loop trips an XLA lowering-cache bug (KeyError: 'closed_call') on
# this jax version.

_LANE = 128
# Window starts are aligned to 8 rows — the DMA sublane granularity for
# every dtype (measured, tools/probe_dma_align.py).  Key windows start at
# arbitrary 8-key offsets via 16 key-table copies shifted by 8 keys each
# (copy i row r holds keys[8*i + 128*r : ...]).
_ALIGN = 8
_KPITCH = 8    # key-copy shift pitch (keys)
NSH = 16       # number of shifted key copies (NSH * _KPITCH == 128)

# NOTE (round 3): there is no window-count bound.  The window sweep is
# EXACT for any nw (double-buffered fori loop), and because every plan
# clamps hi ≤ n_valid, the sweep provably never reads past
# np_t + window ≤ n_pad — so long spans just sweep serially (real scans
# measure avg nw ≈ 1, max 131) and the only dynamic fallback condition
# left is an unsorted key table.  Callers that KNOW their keys are
# sorted (``SparseConvTensor.keys_sorted``) skip the fallback branch
# entirely — no ``lax.cond``, no dead rulebook path compiled.


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


def sk_groups(ksize: Sequence[int],
              include_center: bool = False) -> Tuple[Tuple[int, ...], ...]:
    """Offsets grouped by leading-axis displacement ("planes"): their key
    shifts differ by at most a few minor-axis strides, so one window per
    group covers all members.  For subm the center offset is excluded
    (identity shortcut); regular convs gather every offset."""
    kv = int(np.prod([int(k) for k in ksize]))
    center = kv // 2
    lead = int(np.prod([int(k) for k in ksize[1:]])) if len(ksize) > 1 \
        else 1
    groups = []
    for g0 in range(0, kv, lead):
        g = tuple(k for k in range(g0, g0 + lead)
                  if include_center or k != center)
        if g:
            groups.append(g)
    return tuple(groups)


class SKPlan(NamedTuple):
    ws: jax.Array        # [G, n_tiles] int32 — aligned window starts
    nw: jax.Array        # [G, n_tiles] int32 — windows to sweep (0 = skip)
    fallback: jax.Array  # scalar bool — too many windows or unsorted input


def _plan_from_tile_bounds(
    table_keys, pmin, pmax, present_off, sentinel,
    *, groups, window, n_pad, align=_ALIGN,
):
    """Window plan from per-(offset, tile) probe bounds (see
    :func:`_plan_from_row_probes`, which derives them from per-row
    probes; shift-probe callers compute them exactly as
    ``tile_min_key + Δ_k`` without materializing [kv, N])."""
    np_ = table_keys.shape[0]
    kv, n_tiles = pmin.shape
    probes = jnp.concatenate([pmin.reshape(-1), pmax.reshape(-1)])
    npb = probes.shape[0]
    allk = jnp.concatenate([probes, table_keys])
    src = jnp.arange(npb + np_, dtype=jnp.int32)
    _, src_s = jax.lax.sort((allk, src), num_keys=1, is_stable=True)
    cnt = jnp.cumsum((src_s >= npb).astype(jnp.int32))
    _, ranks = jax.lax.sort((src_s, cnt), num_keys=1, is_stable=False)
    n_valid = jnp.sum((table_keys != sentinel).astype(jnp.int32))
    half = kv * n_tiles
    lo = jnp.minimum(ranks[:half].reshape(kv, n_tiles), n_valid)
    # +1: a table key equal to the max probe ranks AT the boundary
    # (probes sort before equal table keys)
    hi = jnp.minimum(ranks[half:npb].reshape(kv, n_tiles) + 1, n_valid)

    glo = jnp.stack([
        jnp.min(jnp.stack(
            [jnp.where(present_off[k], lo[k], n_valid) for k in g]),
            axis=0)
        for g in groups
    ])  # [G, n_tiles]
    ghi = jnp.stack([
        jnp.max(jnp.stack(
            [jnp.where(present_off[k], hi[k], 0) for k in g]), axis=0)
        for g in groups
    ])
    present = jnp.stack([
        jnp.any(jnp.stack([present_off[k] for k in g]), axis=0)
        for g in groups
    ]) & (ghi > glo)
    ws = (glo // align) * align
    ws = jnp.clip(ws, 0, max((n_pad - window) // align * align, 0))
    nw = jnp.where(present, -(-(ghi - ws) // window), 0)
    unsorted = jnp.any(table_keys[1:] < table_keys[:-1])
    return SKPlan(
        ws=ws.astype(jnp.int32),
        nw=nw.astype(jnp.int32),
        fallback=unsorted,
    )


def _plan_from_row_probes(
    table_keys: jax.Array,   # [Np] sorted sentinel-padded table
    probes_rows: jax.Array,  # [kv, n_tiles*tile] per-ROW probe keys
    valid_rows: jax.Array,   # [kv, n_tiles*tile] bool
    sentinel,
    *,
    tile: int,
    groups: Tuple[Tuple[int, ...], ...],
    window: int,
    n_pad: int,
    align: int = _ALIGN,
) -> SKPlan:
    """Window plan from EXACT per-row probes: per (offset, tile) the
    window must cover [rank(min valid probe), rank(max valid probe)].

    Boundary-derived plans require the probe map to be lexicographically
    monotone — false for floor-division (stride) maps whenever an axis
    collapses (two coords mapping to one let later axes invert the
    order; measured as silently empty windows).  Ranks of per-tile
    min/max probes need no monotonicity at all, and are tighter.  Ranks
    come from ONE sort of [min ‖ max probes ‖ table] + cumsum — no
    searchsorted (measured 30× slower than a sort on TPU)."""
    kv, npt = probes_rows.shape
    n_tiles = npt // tile
    big = jnp.int32(2**31 - 1)
    pmin = jnp.min(
        jnp.where(valid_rows, probes_rows, big).reshape(kv, n_tiles, tile),
        axis=2,
    )
    pmax = jnp.max(
        jnp.where(valid_rows, probes_rows, jnp.int32(-1)).reshape(
            kv, n_tiles, tile),
        axis=2,
    )
    present_off = jnp.any(valid_rows.reshape(kv, n_tiles, tile), axis=2)
    return _plan_from_tile_bounds(
        table_keys, pmin, pmax, present_off, sentinel, groups=groups,
        window=window, n_pad=n_pad, align=align,
    )


def _row_coords(keys, dims):
    rem = keys
    coord = []
    for v in reversed(dims):
        coord.append(rem % v)
        rem = rem // v
    return coord[::-1], rem


def _shift_row_probes(tile_keys, deltas, disp, dims, sentinel):
    """Per-row subm probes [kv, Np]: key + Δ_k with bounds validity."""
    coord, _b = _row_coords(tile_keys, dims)
    live = tile_keys != sentinel
    kv = len(deltas)
    probes, valids = [], []
    for k in range(kv):
        ok = live
        for a in range(len(dims)):
            da = int(disp[k][a])
            if da != 0:
                ok = ok & (coord[a] + da >= 0) & (coord[a] + da < dims[a])
        probes.append(tile_keys + int(deltas[k]))
        valids.append(ok)
    return jnp.stack(probes), jnp.stack(valids)


def _affine_row_probes(tile_keys, stride, disp, decode_dims, table_dims,
                       sentinel_tile):
    """Per-row OUT→IN probes (``in = out·s + off·dil − pad``)."""
    coord, b = _row_coords(tile_keys, decode_dims)
    live = tile_keys != sentinel_tile
    probes, valids = [], []
    for k in range(disp.shape[0]):
        ok = live
        key = b
        for a in range(len(decode_dims)):
            ca = coord[a] * int(stride[a]) + int(disp[k][a])
            ok = ok & (ca >= 0) & (ca < table_dims[a])
            key = key * table_dims[a] + ca
        probes.append(key.astype(jnp.int32))
        valids.append(ok)
    return jnp.stack(probes), jnp.stack(valids)


def _divide_row_probes(tile_keys, stride, disp, decode_dims, table_dims,
                       sentinel_tile):
    """Per-row IN→OUT probes with stride divisibility."""
    coord, b = _row_coords(tile_keys, decode_dims)
    live = tile_keys != sentinel_tile
    probes, valids = [], []
    for k in range(disp.shape[0]):
        ok = live
        key = b
        for a in range(len(decode_dims)):
            ta = coord[a] - int(disp[k][a])
            sa = int(stride[a])
            ca = ta // sa
            ok = (ok & (ta >= 0) & (ta % sa == 0) & (ca < table_dims[a]))
            key = key * table_dims[a] + ca
        probes.append(key.astype(jnp.int32))
        valids.append(ok)
    return jnp.stack(probes), jnp.stack(valids)


def build_sk_plans(keys, sentinel, deltas_np, groups, *, tile, window,
                   n_pad, disp_np=None, dims=None, align=_ALIGN):
    """(fwd, bwd) subm plans — bwd probes are the reversed (negated)
    deltas.  ``keys``: [Np] sorted sentinel-padded with Np % tile == 0.

    Shift probes are exact constant adds, so per-tile probe bounds are
    ``tile_min/max_live_key + Δ_k`` — O(N + kv·n_tiles), nothing of
    shape [kv, N] is materialized — and both plans share ONE rank sort
    (2·kv stacked offsets)."""
    kv = len(deltas_np)
    npt = keys.shape[0]
    n_tiles = npt // tile
    live = keys != sentinel
    big = jnp.int32(2**31 - 1)
    kt = keys.reshape(n_tiles, tile)
    lv = live.reshape(n_tiles, tile)
    tmin = jnp.min(jnp.where(lv, kt, big), axis=1)     # [n_tiles]
    tmax = jnp.max(jnp.where(lv, kt, jnp.int32(-1)), axis=1)
    tlive = jnp.any(lv, axis=1)

    d = jnp.asarray([int(v) for v in deltas_np], jnp.int32)
    d2 = jnp.concatenate([d, -d])                      # fwd ‖ bwd
    pmin = tmin[None, :] + d2[:, None]
    pmax = tmax[None, :] + d2[:, None]
    present = jnp.broadcast_to(tlive[None, :], (2 * kv, n_tiles))
    groups2 = tuple(groups) + tuple(
        tuple(k + kv for k in g) for g in groups
    )
    plan2 = _plan_from_tile_bounds(
        keys, pmin, pmax, present, sentinel, groups=groups2,
        window=window, n_pad=n_pad, align=align,
    )
    g = len(groups)
    fwd = SKPlan(ws=plan2.ws[:g], nw=plan2.nw[:g], fallback=plan2.fallback)
    bwd = SKPlan(ws=plan2.ws[g:], nw=plan2.nw[g:], fallback=plan2.fallback)
    return fwd, bwd


def prep_keys_sh(keys_pad: jax.Array) -> jax.Array:
    """``NSH`` copies of the padded key table shifted by ``_KPITCH`` keys
    each, [NSH, rows, 128]: copy ``i`` row ``r`` holds
    ``keys_pad[_KPITCH*i + 128*r : ...]``, so a window starting at any
    8-key-aligned position ``s`` is rows ``[s//128 ...]`` of copy
    ``(s % 128) // _KPITCH`` — a legal DMA at any row (int32 slices have
    no sublane-alignment requirement; tools/probe_dma_align.py)."""
    n_pad = keys_pad.shape[0]
    assert n_pad % _LANE == 0
    rows = n_pad // _LANE
    out = []
    for i in range(NSH):
        shifted = jnp.concatenate(
            [keys_pad[i * _KPITCH:],
             jnp.full((i * _KPITCH + 2 * _LANE,), np.int32(2**31 - 1),
                      jnp.int32)]
        )
        out.append(shifted[: (rows + 2) * _LANE].reshape(rows + 2, _LANE))
    return jnp.stack(out)  # [NSH, rows + 2, 128]


def _probe_coords(kt, dims):
    """Per-axis coordinates (+ batch index) of each tile key for bounds
    checks (batch never wraps: an out-of-range leading coordinate shifts
    the key out of the valid range, where no table key exists)."""
    rem = kt
    coord = []
    for s in reversed(dims):
        coord.append(jax.lax.rem(rem, s))
        rem = jax.lax.div(rem, s)
    return coord[::-1], rem


def _probe_shift_fn(deltas, dims):
    """Subm probes: constant key shift Δ_k with per-axis bounds checks."""
    def f(kt, live, coord, b, k):
        disp_k = deltas[1][k]
        ok = live
        for a in range(len(dims)):
            da = int(disp_k[a])
            if da != 0:
                ok = ok & (coord[a] + da >= 0) & (coord[a] + da < dims[a])
        return jnp.where(ok, kt + int(deltas[0][k]), -1)
    return f


def _probe_affine_fn(stride, disp, table_dims):
    """Regular-conv forward probes: OUT coords → IN keys
    (``in = out·s + off·dil − pad``, the ConvOutLocIter map,
    reference ``indices.py:177-203``)."""
    def f(kt, live, coord, b, k):
        ok = live
        key = b
        for a in range(len(table_dims)):
            ca = coord[a] * int(stride[a]) + int(disp[k][a])
            ok = ok & (ca >= 0) & (ca < table_dims[a])
            key = key * table_dims[a] + ca
        return jnp.where(ok, key, -1)
    return f


def _probe_divide_fn(stride, disp, table_dims):
    """Reverse probes: IN coords → OUT keys with stride-divisibility
    (``out = (in − off·dil + pad)/s`` — the query_npq semantics used by
    dgrad and inverse conv, reference ``indices.py:177-269``)."""
    def f(kt, live, coord, b, k):
        ok = live
        key = b
        for a in range(len(table_dims)):
            ta = coord[a] - int(disp[k][a])
            sa = int(stride[a])
            ca = jax.lax.div(ta, sa)
            ok = (ok & (ta >= 0) & (jax.lax.rem(ta, sa) == 0)
                  & (ca < table_dims[a]))
            key = key * table_dims[a] + ca
        return jnp.where(ok, key, -1)
    return f


def _plane_gather(wk, wf, probes, tile, window, c_pad, int8=False):
    """One-hot gather of every offset of the plane from the shared window.

    ``wk``: [window/128 (+slack), 128] int32 window keys; ``wf``:
    [window, c_pad] features.  Returns a list of [tile, c_pad] gathered
    rows (f32, or int32 in int8 mode), one per probe.  2-D compares per
    128-key row (Mosaic rejects the 3-D broadcast form), batched into
    one MXU matmul across the plane's offsets."""
    wr = window // _LANE
    ohs = []
    for probe in probes:
        p2 = probe[:, None]  # [tile, 1]
        ohs.append(jnp.concatenate(
            [p2 == wk[r][None, :] for r in range(wr)], axis=1
        ))  # [tile, window]
    big = jnp.concatenate(ohs, axis=0)  # [g*tile, window]
    if int8:
        g2 = jnp.dot(
            big.astype(jnp.int8), wf[:],
            preferred_element_type=jnp.int32,
        )  # [g*tile, c_pad] — gathered rows are exact int8 values
    elif wf.dtype == jnp.float32:
        # f32 tables gather exactly (f32 MXU path); bf16 one-hot would
        # truncate the gathered values
        g2 = jnp.dot(
            big.astype(jnp.float32), wf[:],
            preferred_element_type=jnp.float32,
        )
    else:
        g2 = jnp.dot(
            big.astype(jnp.bfloat16), wf.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # [g*tile, c_pad]
    return [g2[i * tile:(i + 1) * tile] for i in range(len(probes))]


def _sk_fwd_kernel(
    kv, center, tile, window, c_pad, k_pad, probe_fn, dims, sentinel,
    groups, n_tiles,
    # scalar prefetch
    ws_ref, nw_ref,
    # inputs
    kt_ref,      # [1, 1, tile] int32 - this tile's keys
    ft_ref,      # [tile, c_pad] - this tile's features (center identity)
    ksh_hbm,     # [NSH, rows + NSH, 128] int32
    feat_hbm,    # [n_pad, c_pad]
    w_ref,       # [kv*c_pad, k_pad] VMEM
    # output
    out_ref,     # [1, tile, k_pad]
    # scratch
    wk2_ref, wf2_ref, wk1_ref, wf1_ref, gbuf_ref,
    ksem2, fsem2, ksem1, fsem1,
):
    t = pl.program_id(0)
    n_planes = len(groups)
    wr = window // _LANE

    kt = kt_ref[0, 0]  # [tile] int32
    live = kt != sentinel
    coord, bidx = _probe_coords(kt, dims)

    def start_dma2(step, buf):
        """Window-0 DMA for flattened step (= t*n_planes + p) into
        pipeline buffer ``buf``."""
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

    if center is not None:
        gbuf_ref[:, center * c_pad:(center + 1) * c_pad] = \
            ft_ref[:].astype(gbuf_ref.dtype)

    for p, grp in enumerate(groups):
        s = t * n_planes + p
        buf = s % 2
        if p == 0:
            @pl.when(t == 0)
            def _():
                start_dma2(0, 0)
        # prefetch next (tile, plane) step
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
        # dead plane => probes -1 (match nothing in the stale window);
        # cheaper than masking the gathered [tile, c_pad] outputs
        plive = live & (nw > 0)
        probes = [probe_fn(kt, plive, coord, bidx, k) for k in grp]

        # start window-1 DMA (if any) before computing window 0 so the
        # extra-window sweep overlaps the first matmul
        @pl.when(nw > 1)
        def _(p=p):
            start_dma1(p, 1, 1)

        outs = _plane_gather(wk2_ref[buf], wf2_ref[buf], probes, tile,
                             window, c_pad)

        # rare extra windows: double-buffered serial sweep (buf = wi % 2)
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
            eo = _plane_gather(wk1_ref[sb], wf1_ref[sb], probes, tile,
                               window, c_pad)
            return [a + e for a, e in zip(accs, eo)]

        outs = jax.lax.fori_loop(1, nw, extra, outs)

        for i, k in enumerate(grp):
            gbuf_ref[:, k * c_pad:(k + 1) * c_pad] = outs[i].astype(
                gbuf_ref.dtype
            )

    out = jnp.dot(
        gbuf_ref[:], w_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _sk_fwd_kernel_q(
    kv, center, tile, window, c_pad, k_pad, probe_fn, dims, sentinel,
    groups, n_tiles, act, out_int8,
    # scalar prefetch
    ws_ref, nw_ref,
    # inputs
    kt_ref,      # [1, 1, tile] int32
    ft_ref,      # [tile, c_pad] int8 (center identity)
    ksh_hbm,     # shifted key copies
    feat_hbm,    # [n_pad, c_pad] int8
    w_ref,       # [kv*c_pad, k_pad] int8 VMEM
    scale_ref,   # [1, k_pad] f32 — input_scale*w_scale/output_scale
    bias_ref,    # [1, k_pad] f32 (already output-scaled)
    # output
    out_ref,     # [1, tile, k_pad] int8 or bf16
    # scratch
    wk2_ref, wf2_ref, wk1_ref, wf1_ref, gbuf_ref,
    ksem2, fsem2, ksem1, fsem1,
):
    """int8 forward: one-hot(int8) x window(int8) -> int32 gather; deep
    GEMM int8 x int8 -> int32; fused per-channel scale + bias + act +
    requant epilogue (parity: the reference's int8 implicit_gemm fused
    epilogue, ``ops.py:1465-1525``, ``docs/TENSORRT_INT8_GUIDE.md``)."""
    t = pl.program_id(0)
    n_planes = len(groups)
    wr = window // _LANE

    kt = kt_ref[0, 0]
    live = kt != sentinel
    coord, bidx = _probe_coords(kt, dims)

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

    if center is not None:
        gbuf_ref[:, center * c_pad:(center + 1) * c_pad] = ft_ref[:]

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
        probes = [probe_fn(kt, plive, coord, bidx, k) for k in grp]

        @pl.when(nw > 1)
        def _(p=p):
            start_dma1(p, 1, 1)

        outs = _plane_gather(wk2_ref[buf], wf2_ref[buf], probes, tile,
                             window, c_pad, int8=True)

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
            eo = _plane_gather(wk1_ref[sb], wf1_ref[sb], probes, tile,
                               window, c_pad, int8=True)
            return [a + e for a, e in zip(accs, eo)]

        outs = jax.lax.fori_loop(1, nw, extra, outs)

        for i, k in enumerate(grp):
            gbuf_ref[:, k * c_pad:(k + 1) * c_pad] = outs[i].astype(
                jnp.int8)

    acc = jnp.dot(
        gbuf_ref[:], w_ref[:], preferred_element_type=jnp.int32
    )  # [tile, k_pad] int32
    y = acc.astype(jnp.float32) * scale_ref[0][None, :] \
        + bias_ref[0][None, :]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    if out_int8:
        # symmetric int8 like the reference int8 path (±127)
        y = jnp.clip(jnp.round(y), -127.0, 127.0)
    out_ref[0] = y.astype(out_ref.dtype)


def sk_subm_conv_q(
    features_i8: jax.Array,   # [N, C] int8
    keys: jax.Array,          # [N] int32 sorted linearized keys
    weight_i8: jax.Array,     # KRSC [K, *ksize, C] int8
    scale: jax.Array,         # [K] f32 — in_scale*w_scale/out_scale
    bias: Optional[jax.Array],  # [K] f32 (output-scale units)
    *,
    spatial_shape: Sequence[int],
    batch_size: int,
    dilation: Sequence[int],
    act: str = "none",
    out_dtype=jnp.int8,
    tile: int = 128,
    window: int = 256,
    plans: Optional[Tuple[SKPlan, SKPlan]] = None,
    interpret: bool = False,
) -> jax.Array:
    """int8 rulebook-free subm conv with fused scale/bias/act/requant
    epilogue (inference; parity: quantized ``SparseConv`` semantics,
    ``spconv/pytorch/quantization/quantized/conv.py``)."""
    ksize = tuple(int(k) for k in weight_i8.shape[1:-1])
    dilation = tuple(int(d) for d in dilation)
    k_out = weight_i8.shape[0]
    c = weight_i8.shape[-1]
    kv = int(np.prod(ksize))
    c_pad = _round_up(c, _LANE)
    k_pad = _round_up(k_out, _LANE)
    weight_kv = jnp.transpose(
        weight_i8.reshape(k_out, kv, c), (1, 2, 0)
    )  # [kv, C, K] int8

    deltas_np, disp_np = subm_key_deltas(ksize, dilation, spatial_shape)
    groups = sk_groups(ksize)
    dims = tuple(int(s) for s in spatial_shape)
    sentinel = int(np.prod(dims)) * int(batch_size)
    n = keys.shape[0]
    n_tiles = -(-n // tile)
    np_t, n_pad = _n_pad_for(n, tile, window)

    if plans is None:
        keys_p0 = _pad_rows(keys, np_t, sentinel)
        plans = build_sk_plans(
            keys_p0, sentinel, deltas_np, groups, tile=tile,
            window=window, n_pad=n_pad,
        )
    plan = plans[0]

    keys_p = _pad_rows(keys, n_pad, sentinel)
    feat_p = _pad_lanes(_pad_rows(features_i8, n_pad, 0), c_pad)
    keys_tiles = keys_p[:np_t].reshape(n_tiles, 1, tile)
    ksh = prep_keys_sh(keys_p)
    wflat = jnp.pad(
        weight_kv, ((0, 0), (0, c_pad - c), (0, k_pad - k_out))
    ).reshape(kv * c_pad, k_pad)
    scale_p = jnp.pad(scale.astype(jnp.float32),
                      (0, k_pad - k_out)).reshape(1, k_pad)
    bias_p = (jnp.pad(bias.astype(jnp.float32), (0, k_pad - k_out))
              if bias is not None else jnp.zeros((k_pad,), jnp.float32)
              ).reshape(1, k_pad)

    probe_fn = _probe_shift_fn(
        (np.asarray(deltas_np, np.int32),
         np.asarray(disp_np, np.int32).reshape(kv, len(dims))), dims)
    center = kv // 2
    wr = window // _LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k_pad), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, c_pad), jnp.int8),
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, c_pad), jnp.int8),
            pltpu.VMEM((tile, kv * c_pad), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_int8 = out_dtype == jnp.int8
    kernel = functools.partial(
        _sk_fwd_kernel_q, kv, center, tile, window, c_pad, k_pad,
        probe_fn, dims, sentinel, groups, n_tiles, act, out_int8,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, k_pad), out_dtype),
        interpret=interpret,
    )(plan.ws, plan.nw, keys_tiles, feat_p[:np_t], ksh, feat_p,
      wflat, scale_p, bias_p)
    return out.reshape(np_t, k_pad)[:n, :k_out]


def _sk_bwd_kernel(
    kv, center, tile, window, c_pad, k_pad, probe_fn, dims, sentinel,
    groups, n_tiles,
    ws_ref, nw_ref,
    kt_ref,      # [1, 1, tile] keys
    ft_ref,      # [tile, c_pad] forward features (for wgrad)
    dt_ref,      # [tile, k_pad] dout tile (center gather identity)
    ksh_hbm,     # shifted key copies
    dout_hbm,    # [n_pad, k_pad] padded dout table
    wrev_ref,    # [kv*k_pad, c_pad] W[k]^T blocks (dgrad weights)
    # outputs
    din_ref,     # [1, tile, c_pad]
    dw_ref,      # [kv, c_pad, k_pad] accumulated over the grid
    # scratch
    wk2_ref, wf2_ref, wk1_ref, wf1_ref, gbuf_ref,
    ksem2, fsem2, ksem1, fsem1,
):
    """Fused backward: ONE windowed gather of dout at the reversed-offset
    probes yields both dgrad (``din = Σ_k g_k @ W[k]ᵀ``) and wgrad
    (``dW[k] += f_tileᵀ @ g_k``) — the reference computes these as two
    separate kernel families (``convops.py:2247`` reverse_mask dgrad +
    ``ops.py:1606-1614`` mask_output wgrad); on TPU sharing the gather
    halves backward time."""
    t = pl.program_id(0)
    n_planes = len(groups)
    wr = window // _LANE

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    kt = kt_ref[0, 0]
    live = kt != sentinel
    coord, bidx = _probe_coords(kt, dims)

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
            dout_hbm.at[pl.ds(pl.multiple_of(base, _ALIGN), window), :],
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
            dout_hbm.at[pl.ds(pl.multiple_of(base, _ALIGN), window), :],
            wf1_ref.at[buf], fsem1.at[buf],
        ).start()

    cdt = gbuf_ref.dtype
    ftb = ft_ref[:].astype(cdt)   # [tile, c_pad]
    dt = dt_ref[:].astype(cdt)    # [tile, k_pad]

    if center is not None:
        # center: gather identity — din gets dt @ W[center]ᵀ via gbuf,
        # and dW[center] += f_tileᵀ @ dout_tile
        gbuf_ref[:, center * k_pad:(center + 1) * k_pad] = dt
        dw_ref[center] += jax.lax.dot_general(
            ftb, dt,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw_ref.dtype)

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
            dout_hbm.at[pl.ds(0, window), :], wf2_ref.at[buf],
            fsem2.at[buf],
        ).wait()

        nw = nw_ref[p, t]
        plive = live & (nw > 0)
        probes = [probe_fn(kt, plive, coord, bidx, k) for k in grp]

        @pl.when(nw > 1)
        def _(p=p):
            start_dma1(p, 1, 1)

        outs = _plane_gather(wk2_ref[buf], wf2_ref[buf], probes, tile,
                             window, k_pad)

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
                dout_hbm.at[pl.ds(0, window), :], wf1_ref.at[0],
                fsem1.at[sb],
            ).wait()
            eo = _plane_gather(wk1_ref[sb], wf1_ref[sb], probes, tile,
                               window, k_pad)
            return [a + e for a, e in zip(accs, eo)]

        outs = jax.lax.fori_loop(1, nw, extra, outs)

        for i, k in enumerate(grp):
            gb = outs[i].astype(cdt)
            gbuf_ref[:, k * k_pad:(k + 1) * k_pad] = gb
            dw_ref[k] += jax.lax.dot_general(
                ftb, gb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dw_ref.dtype)

    din = jnp.dot(
        gbuf_ref[:], wrev_ref[:], preferred_element_type=jnp.float32
    )
    din_ref[0] = din.astype(din_ref.dtype)


def _pad_rows(x: jax.Array, n_pad: int, fill) -> jax.Array:
    if x.shape[0] == n_pad:
        return x
    pad = jnp.full((n_pad - x.shape[0], *x.shape[1:]), fill, x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _pad_lanes(x: jax.Array, c_pad: int) -> jax.Array:
    if x.shape[1] == c_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], c_pad - x.shape[1]), x.dtype)], axis=1
    )


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


class _SKGeom(NamedTuple):
    """Static geometry closed over by the custom-vjp entry."""
    deltas_key: tuple
    disp: tuple
    dims: tuple
    sentinel: int
    tile: int
    window: int
    groups: tuple
    interpret: bool


def _n_pad_for(n: int, tile: int, window: int) -> Tuple[int, int]:
    """Padded table length: window reads end at < hi + window ≤
    np_t + window for every plan (hi is clamped to n_valid), so one
    window of slack suffices for DMA legality at any window count."""
    n_tiles = -(-n // tile)
    np_t = n_tiles * tile
    n_pad = _round_up(np_t + window + 2 * _LANE, _LANE)
    return np_t, n_pad


def _sk_conv_call(
    table_feats, table_keys, tile_keys, tile_feats, weight_kv, plan,
    *, probe_fn, decode_dims, sentinel_tile, center, groups, tile,
    window, interpret=False,
):
    """Shared gather-GEMM kernel invocation.

    Tiles run over ``tile_keys`` (the OUTPUT rows); gathers read
    ``table_feats`` rows keyed by ``table_keys`` through ``probe_fn``.
    For subm convs both key sets are the same and ``center`` enables the
    identity shortcut; regular convs pass ``center=None``.
    """
    kv, c, k_ch = weight_kv.shape
    c_pad = _round_up(c, _LANE)
    k_pad = _round_up(k_ch, _LANE)
    n_tile = tile_keys.shape[0]
    n_tiles = -(-n_tile // tile)
    np_t = n_tiles * tile
    _, n_pad = _n_pad_for(table_keys.shape[0], tile, window)

    tkeys_p = _pad_rows(table_keys, n_pad, np.int32(2**31 - 1))
    feat_p = _pad_lanes(_pad_rows(table_feats, n_pad, 0), c_pad)
    tile_keys_p = _pad_rows(tile_keys, np_t, sentinel_tile)
    keys_tiles = tile_keys_p.reshape(n_tiles, 1, tile)
    if tile_feats is None:
        tf = jnp.zeros((np_t, c_pad), feat_p.dtype)
    else:
        tf = _pad_lanes(_pad_rows(tile_feats, np_t, 0), c_pad)
    ksh = prep_keys_sh(tkeys_p)
    wflat = _pad_lanes(weight_kv.reshape(kv * c, k_ch), k_pad)
    if c_pad != c:
        wkv = wflat.reshape(kv, c, k_pad)
        wkv = jnp.concatenate(
            [wkv, jnp.zeros((kv, c_pad - c, k_pad), wkv.dtype)], axis=1
        )
        wflat = wkv.reshape(kv * c_pad, k_pad)

    # bf16 tables compute through bf16 (exact one-hot gathers); f32
    # tables keep a full-precision pipeline (f32 MXU)
    comp_dtype = (jnp.float32 if feat_p.dtype == jnp.float32
                  else jnp.bfloat16)
    wr = window // _LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k_pad), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, c_pad), feat_p.dtype),
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, c_pad), feat_p.dtype),
            pltpu.VMEM((tile, kv * c_pad), comp_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _sk_fwd_kernel, kv, center, tile, window, c_pad, k_pad, probe_fn,
        tuple(decode_dims), sentinel_tile, groups, n_tiles,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, k_pad),
                                       table_feats.dtype),
        interpret=interpret,
    )(plan.ws, plan.nw, keys_tiles, tf, ksh, feat_p,
      wflat.astype(comp_dtype))
    return out.reshape(np_t, k_pad)[:n_tile, :k_ch]


def _sk_bwd_call(
    tile_feats, tile_keys, dout_table, table_keys, weight_kv, plan_bwd,
    *, probe_fn, decode_dims, sentinel_tile, center, groups, tile,
    window, interpret=False,
):
    """Fused dgrad+wgrad: tiles run over the INPUT rows (``tile_feats``
    is the wgrad operand); gathers read ``dout_table`` rows keyed by
    ``table_keys`` through ``probe_fn`` (reversed/divide probes).
    Returns ``(din [n_tile, C], dw [kv, C, K])``."""
    n_tile = tile_keys.shape[0]
    kv, c, k_ch = weight_kv.shape
    c_pad = _round_up(c, _LANE)
    k_pad = _round_up(k_ch, _LANE)
    n_tiles = -(-n_tile // tile)
    np_t = n_tiles * tile
    _, n_pad = _n_pad_for(table_keys.shape[0], tile, window)

    tkeys_p = _pad_rows(table_keys, n_pad, np.int32(2**31 - 1))
    feat_p = _pad_lanes(_pad_rows(tile_feats, np_t, 0), c_pad)
    dout_p = _pad_lanes(_pad_rows(dout_table, n_pad, 0), k_pad)
    tile_keys_p = _pad_rows(tile_keys, np_t, sentinel_tile)
    keys_tiles = tile_keys_p.reshape(n_tiles, 1, tile)
    ksh = prep_keys_sh(tkeys_p)
    if center is not None:
        # subm: table rows align with tile rows — center gather identity
        dt = dout_p[:np_t]
    else:
        dt = jnp.zeros((np_t, k_pad), dout_p.dtype)

    comp_dtype = (jnp.float32 if dout_p.dtype == jnp.float32
                  else jnp.bfloat16)
    # dgrad weights: blocks W[k]ᵀ [k_pad, c_pad]
    wrev = jnp.transpose(weight_kv, (0, 2, 1))  # [kv, K, C]
    wrev = jnp.pad(wrev, ((0, 0), (0, k_pad - k_ch), (0, c_pad - c)))
    wrev_flat = wrev.reshape(kv * k_pad, c_pad)

    wr = window // _LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k_pad), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, c_pad), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kv, c_pad, k_pad), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, k_pad), dout_p.dtype),
            pltpu.VMEM((2, wr, _LANE), jnp.int32),
            pltpu.VMEM((2, window, k_pad), dout_p.dtype),
            pltpu.VMEM((tile, kv * k_pad), comp_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _sk_bwd_kernel, kv, center, tile, window, c_pad, k_pad, probe_fn,
        tuple(decode_dims), sentinel_tile, groups, n_tiles,
    )
    din, dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile, c_pad),
                                 tile_feats.dtype),
            jax.ShapeDtypeStruct((kv, c_pad, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(plan_bwd.ws, plan_bwd.nw, keys_tiles, feat_p[:np_t], dt, ksh,
      dout_p, wrev_flat.astype(comp_dtype))
    return din.reshape(np_t, c_pad)[:n_tile, :c], dw[:, :c, :k_ch]


def _geom_deltas(geom: "_SKGeom"):
    ndim = len(geom.dims)
    kv = len(geom.deltas_key)
    return (np.asarray(geom.deltas_key, np.int32),
            np.asarray(geom.disp, np.int32).reshape(kv, ndim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sk_conv(features, keys, weight_kv, plans, geom: _SKGeom):
    """Subm conv custom-vjp core; plans = (plan_fwd, plan_bwd) where
    plan_bwd was built with reversed deltas."""
    plan_fwd, _ = plans
    kv = len(geom.deltas_key)
    return _sk_conv_call(
        features, keys, keys, features, weight_kv, plan_fwd,
        probe_fn=_probe_shift_fn(_geom_deltas(geom), geom.dims),
        decode_dims=geom.dims, sentinel_tile=geom.sentinel,
        center=kv // 2, groups=geom.groups, tile=geom.tile,
        window=geom.window, interpret=geom.interpret,
    )


def _sk_conv_fwd(features, keys, weight_kv, plans, geom):
    out = _sk_conv(features, keys, weight_kv, plans, geom)
    return out, (features, keys, weight_kv, plans)


def _sk_conv_bwd(geom, res, g):
    features, keys, weight_kv, plans = res
    plan_fwd, plan_bwd = plans
    g = g.astype(features.dtype)
    kv = len(geom.deltas_key)
    # fused dgrad+wgrad: one gather of dout at the reversed-offset probes
    deltas, disp = _geom_deltas(geom)
    rev = (-deltas, -disp)
    din, dw_kv = _sk_bwd_call(
        features, keys, g, keys, weight_kv, plan_bwd,
        probe_fn=_probe_shift_fn(rev, geom.dims),
        decode_dims=geom.dims, sentinel_tile=geom.sentinel,
        center=kv // 2, groups=geom.groups, tile=geom.tile,
        window=geom.window, interpret=geom.interpret,
    )
    din = din.astype(features.dtype)
    dw = dw_kv.astype(weight_kv.dtype)
    zf = jax.dtypes.float0
    return (din, np.zeros(keys.shape, dtype=zf), dw,
            jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), dtype=zf),
                (plan_fwd, plan_bwd)))


_sk_conv.defvjp(_sk_conv_fwd, _sk_conv_bwd)


class _SKRegGeom(NamedTuple):
    """Static geometry for the regular/inverse sorted-key conv (encoder
    perspective: IN = the conv's input space, OUT = its strided output
    space)."""
    stride: tuple
    disp: tuple       # flattened [kv * ndim] off*dil - pad
    in_dims: tuple
    out_dims: tuple
    sent_in: int
    sent_out: int
    tile: int
    window: int
    groups: tuple
    inverse: bool
    interpret: bool


def _reg_disp(geom: _SKRegGeom):
    ndim = len(geom.in_dims)
    return np.asarray(geom.disp, np.int32).reshape(-1, ndim)


def build_sk_reg_plans(in_keys, out_keys, geom: _SKRegGeom, align=_ALIGN,
                       tile_io=None):
    """(plan_io, plan_oi): windows over the IN table for OUT tiles, and
    over the OUT table for IN tiles — built from exact per-row probes
    (:func:`_plan_from_row_probes`).  The regular conv uses (fwd=io,
    bwd=oi); the inverse conv of the same encoder uses the swap — one
    cache serves both (the reference's rulebook-reuse role,
    ``conv.py:348-363``).  ``tile_io`` overrides the OUT-tile size (the
    DG R-row forward tiles R·128 rows while its backward keeps 128)."""
    disp = _reg_disp(geom)
    tile, window = geom.tile, geom.window
    tile_io = int(tile_io or tile)
    nt_out = -(-out_keys.shape[0] // tile_io) * tile_io
    nt_in = -(-in_keys.shape[0] // tile) * tile
    _, npad_in = _n_pad_for(in_keys.shape[0], tile_io, window)
    _, npad_out = _n_pad_for(out_keys.shape[0], tile, window)
    in_p = _pad_rows(in_keys, npad_in, geom.sent_in)
    out_p = _pad_rows(out_keys, max(npad_out, nt_out), geom.sent_out)

    p_io, v_io = _affine_row_probes(
        out_p[:nt_out], geom.stride, disp, geom.out_dims, geom.in_dims,
        geom.sent_out,
    )
    plan_io = _plan_from_row_probes(
        in_p, p_io, v_io, geom.sent_in, tile=tile_io, groups=geom.groups,
        window=window, n_pad=npad_in, align=align,
    )

    p_oi, v_oi = _divide_row_probes(
        in_p[:nt_in], geom.stride, disp, geom.in_dims, geom.out_dims,
        geom.sent_in,
    )
    plan_oi = _plan_from_row_probes(
        out_p, p_oi, v_oi, geom.sent_out, tile=tile, groups=geom.groups,
        window=window, n_pad=npad_out, align=align,
    )
    return plan_io, plan_oi


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _sk_reg_conv(features, in_keys, out_keys, weight_kv, plans,
                 geom: _SKRegGeom):
    """Regular (strided) or inverse sorted-key conv core.

    Regular: output rows = ``out_keys`` sites, gathers the IN table via
    OUT→IN affine probes.  Inverse: output rows = ``in_keys`` sites
    (the encoder's inputs), gathers the OUT table via IN→OUT divide
    probes with ``W[k]`` un-transposed (pair-swap semantics,
    ``conv.py:348-363``)."""
    disp = _reg_disp(geom)
    plan_io, plan_oi = plans
    if not geom.inverse:
        return _sk_conv_call(
            features, in_keys, out_keys, None, weight_kv, plan_io,
            probe_fn=_probe_affine_fn(geom.stride, disp, geom.in_dims),
            decode_dims=geom.out_dims, sentinel_tile=geom.sent_out,
            center=None, groups=geom.groups, tile=geom.tile,
            window=geom.window, interpret=geom.interpret,
        )
    return _sk_conv_call(
        features, out_keys, in_keys, None, weight_kv, plan_oi,
        probe_fn=_probe_divide_fn(geom.stride, disp, geom.out_dims),
        decode_dims=geom.in_dims, sentinel_tile=geom.sent_in,
        center=None, groups=geom.groups, tile=geom.tile,
        window=geom.window, interpret=geom.interpret,
    )


def _sk_reg_conv_fwd(features, in_keys, out_keys, weight_kv, plans, geom):
    out = _sk_reg_conv(features, in_keys, out_keys, weight_kv, plans,
                       geom)
    return out, (features, in_keys, out_keys, weight_kv, plans)


def _sk_reg_conv_bwd(geom, res, g):
    features, in_keys, out_keys, weight_kv, plans = res
    plan_io, plan_oi = plans
    g = g.astype(features.dtype)
    disp = _reg_disp(geom)
    if not geom.inverse:
        # tiles over IN rows (features = wgrad operand), gather dout over
        # the OUT table via divide probes
        din, dw_kv = _sk_bwd_call(
            features, in_keys, g, out_keys, weight_kv, plan_oi,
            probe_fn=_probe_divide_fn(geom.stride, disp, geom.out_dims),
            decode_dims=geom.in_dims, sentinel_tile=geom.sent_in,
            center=None, groups=geom.groups, tile=geom.tile,
            window=geom.window, interpret=geom.interpret,
        )
    else:
        # inverse: features live on enc-OUT rows; dout lives on enc-IN
        din, dw_kv = _sk_bwd_call(
            features, out_keys, g, in_keys, weight_kv, plan_io,
            probe_fn=_probe_affine_fn(geom.stride, disp, geom.in_dims),
            decode_dims=geom.out_dims, sentinel_tile=geom.sent_out,
            center=None, groups=geom.groups, tile=geom.tile,
            window=geom.window, interpret=geom.interpret,
        )
    zf = jax.dtypes.float0
    return (din.astype(features.dtype),
            np.zeros(in_keys.shape, dtype=zf),
            np.zeros(out_keys.shape, dtype=zf),
            dw_kv.astype(weight_kv.dtype),
            jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), dtype=zf), plans))


_sk_reg_conv.defvjp(_sk_reg_conv_fwd, _sk_reg_conv_bwd)


def sk_regular_conv(
    features: jax.Array,    # [N_in, C] (regular) or [N_out, C] (inverse)
    in_keys: jax.Array,     # [N_in] sorted enc-input keys
    out_keys: jax.Array,    # [N_out] sorted enc-output keys
    weight: jax.Array,      # KRSC [K, *ksize, C]
    *,
    in_shape: Sequence[int],
    out_shape: Sequence[int],
    batch_size: int,
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
    inverse: bool = False,
    tile: int = 128,
    window: int = 384,
    plans=None,
    interpret: bool = False,
):
    """Rulebook-free regular/inverse sparse conv on sorted keys.

    Output discovery (for regular convs) happens outside — pass the
    resulting ``out_keys``.  Returns features on the OUT sites (regular)
    or the IN sites (inverse).  Differentiable (fused dgrad+wgrad)."""
    ksize = tuple(int(k) for k in weight.shape[1:-1])
    k_out = weight.shape[0]
    c = weight.shape[-1]
    kv = int(np.prod(ksize))
    ndim = len(ksize)
    offs = C.kernel_offsets(ksize)  # [kv, ndim]
    disp = (offs * np.asarray([int(d) for d in dilation])
            - np.asarray([int(p) for p in padding])).astype(np.int32)
    geom = _SKRegGeom(
        stride=tuple(int(v) for v in stride),
        disp=tuple(int(v) for v in disp.reshape(-1)),
        in_dims=tuple(int(v) for v in in_shape),
        out_dims=tuple(int(v) for v in out_shape),
        sent_in=int(np.prod([int(v) for v in in_shape])) * int(batch_size),
        sent_out=int(np.prod([int(v) for v in out_shape]))
        * int(batch_size),
        tile=tile, window=window,
        groups=sk_groups(ksize, include_center=True),
        inverse=bool(inverse), interpret=bool(interpret),
    )
    weight_kv = jnp.transpose(
        weight.reshape(k_out, kv, c), (1, 2, 0)
    )  # [kv, C, K]
    if plans is None:
        plans = build_sk_reg_plans(in_keys, out_keys, geom)
    return _sk_reg_conv(features, in_keys, out_keys, weight_kv, plans,
                        geom), plans, geom


def sk_subm_conv(
    features: jax.Array,   # [N, C]
    indices: jax.Array,    # [N, ndim+1] — for the fallback path only
    keys: jax.Array,       # [N] int32 sorted linearized keys
    weight: jax.Array,     # KRSC [K, *ksize, C]
    *,
    spatial_shape: Sequence[int],
    batch_size: int,
    dilation: Sequence[int],
    tile: int = 128,
    window: int = 256,
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
    groups = sk_groups(ksize)
    dims = tuple(int(s) for s in spatial_shape)
    sentinel = int(np.prod(dims)) * int(batch_size)
    n = keys.shape[0]
    np_t, n_pad = _n_pad_for(n, tile, window)

    if plans is None:
        keys_p = _pad_rows(keys, np_t, sentinel)
        plans = build_sk_plans(
            keys_p, sentinel, deltas_np, groups, tile=tile, window=window,
            n_pad=n_pad,
        )

    geom = _SKGeom(
        deltas_key=tuple(int(d) for d in deltas_np),
        disp=tuple(int(v) for v in disp_np.reshape(-1)),
        dims=dims, sentinel=sentinel, tile=tile, window=window,
        groups=groups, interpret=interpret,
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

class SKData:
    """Cached sorted-key state for an ``indice_key`` stage: the linearized
    keys plus the (fwd, bwd) window plans.  Stored in
    ``SparseConvTensor.indice_dict`` under ``"__sk__<key>/<geometry>"``
    so subm layers sharing an ``indice_key`` reuse both (the role of the
    reference's subm rulebook reuse, ``spconv/pytorch/conv.py:272-277``).

    Registered as a pytree so it can live inside jitted state.
    """

    def __init__(self, keys, plans, *, ksize, dilation, spatial_shape,
                 tile, window):
        self.keys = keys
        self.plans = plans
        self.ksize = tuple(ksize)
        self.dilation = tuple(dilation)
        self.spatial_shape = tuple(spatial_shape)
        self.tile = int(tile)
        self.window = int(window)

    @staticmethod
    def cache_key(indice_key, ksize, dilation, tile, window) -> str:
        return (f"__sk__{indice_key}/{tuple(ksize)}/{tuple(dilation)}"
                f"/{tile}x{window}")


def _skdata_flatten(obj):
    return ((obj.keys, obj.plans),
            (obj.ksize, obj.dilation, obj.spatial_shape, obj.tile,
             obj.window))


def _skdata_unflatten(aux, children):
    obj = object.__new__(SKData)
    obj.keys, obj.plans = children
    (obj.ksize, obj.dilation, obj.spatial_shape, obj.tile,
     obj.window) = aux
    return obj


jax.tree_util.register_pytree_node(SKData, _skdata_flatten,
                                   _skdata_unflatten)

class SKRegData:
    """Cached sorted-key state for a strided conv stage: in/out keys,
    output sites, and the (io, oi) window-plan pair.  An inverse conv
    sharing the ``indice_key`` reuses everything with the plans swapped
    (the reference's rulebook-reuse semantics, ``conv.py:348-363``)."""

    def __init__(self, in_keys, out_keys, out_indices, num_out, plans,
                 num_out_total=None, *,
                 ksize, stride, padding, dilation, in_shape, out_shape,
                 tile, window, transposed=False, output_padding=None):
        self.in_keys = in_keys
        self.out_keys = out_keys
        self.out_indices = out_indices
        self.num_out = num_out
        self.plans = plans
        # pre-clamp output-site count (overflow observability; None on
        # records built before the count was threaded through)
        self.num_out_total = num_out if num_out_total is None else num_out_total
        self.ksize = tuple(ksize)
        self.stride = tuple(stride)
        self.padding = tuple(padding)
        self.dilation = tuple(dilation)
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)
        self.tile = int(tile)
        self.window = int(window)
        self.transposed = bool(transposed)
        self.output_padding = (tuple(output_padding) if output_padding
                               else (0,) * len(self.ksize))


def _skreg_flatten(obj):
    return ((obj.in_keys, obj.out_keys, obj.out_indices, obj.num_out,
             obj.plans, obj.num_out_total),
            (obj.ksize, obj.stride, obj.padding, obj.dilation,
             obj.in_shape, obj.out_shape, obj.tile, obj.window,
             obj.transposed, obj.output_padding))


def _skreg_unflatten(aux, children):
    obj = object.__new__(SKRegData)
    (obj.in_keys, obj.out_keys, obj.out_indices, obj.num_out,
     obj.plans, obj.num_out_total) = children
    (obj.ksize, obj.stride, obj.padding, obj.dilation, obj.in_shape,
     obj.out_shape, obj.tile, obj.window, obj.transposed,
     obj.output_padding) = aux
    return obj


jax.tree_util.register_pytree_node(SKRegData, _skreg_flatten,
                                   _skreg_unflatten)
