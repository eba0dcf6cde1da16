"""Dynamic-gather (DG) sorted-key sparse conv — useful-FLOPs-only kernels.

Second-generation TPU formulation of the rulebook-free sorted-key conv
(see ``sorted_conv.py`` for the first).  The SK kernel's join is a
one-hot compare consumed by an MXU matmul, which costs
``tile·window·128`` FLOPs per kernel offset *regardless of channel
width* — a ~100× waste factor at the 16/32-channel stages that dominate
CenterPoint-style encoders (the reference serves those widths with
dedicated SIMT kernels, ``/root/reference/spconv/core.py:205-412``).

The DG kernel instead exploits Mosaic's per-sublane dynamic LANE gather
(``jnp.take_along_axis(x, idx, axis=1)`` — probed working for f32/int32
on v5e, ``tools/probe_dg.py``):

* Tables live **transposed and lane-chunked**: ``[n_chunks, C, 128]``
  f32, chunk ``c`` holding voxel rows ``128c..128c+127`` along lanes,
  channels along sublanes.  Keys ride a parallel ``[n_chunks, 8, 128]``
  int32 table (row 0).
* Per (tile, plane): DMA the plan's key+feature window (128-aligned
  starts, ``WCH`` chunks).  For each kernel offset, find the match
  position of every probe by **in-register binary search** over the
  window keys (9 select/gather steps on [G,128] vectors — VPU-only),
  then gather the matched feature columns with ``take_along_axis``
  (cost ∝ C·tile, not 128·window).
* The only MXU work left is the deep GEMM
  ``W [K, kv·C] @ gbufT [kv·C, tile]`` — exactly the conv's useful
  FLOPs.  Everything is transposed (outputs ``[K, tile]``) so gather
  lanes = voxel rows throughout; the [N,K] view is restored by one XLA
  transpose at the boundary.

Same window plans as the SK family (``build_sk_plans`` with
``align=128``), same probe maps (shift / affine / divide), same
plan-reuse story via ``indice_key``.

Parity: this plays the role of the reference's implicit-GEMM kernel
family for *all* channel widths (``convops.py:1150-1467``), with the
mask_argsort tile scheduling replaced by plan-driven window skipping.
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
from .sorted_conv import (
    _LANE, _n_pad_for, _pad_lanes, _pad_rows, _probe_affine_fn,
    _probe_coords, _probe_divide_fn, _probe_shift_fn, _round_up,
    build_sk_plans, sk_groups, subm_key_deltas, SKPlan,
)

__all__ = [
    "dg_subm_conv", "dg_regular_conv", "dg_subm_conv_q",
    "dg_regular_conv_q", "chunk_table", "chunk_keys",
    "unchunk_out", "DGData", "dg_rows_for", "dg_window_for",
    "build_dg_pos",
]

_KROWS = 8  # sublane rows in the chunked key table (row 0 = keys)

def dg_rows_for(c_in: int, c_out: int) -> int:
    """Supertile row count.  MEASURED on v5e (125k-voxel scan,
    tools/probe_dg_bench.py): R=1 wins at every width — C=16: R=1
    3.30 ms vs R=2 3.60 / R=4 3.89 / R=8 8.48; C=64: R=1 4.99 vs
    R=2 5.63 / R=4 7.40 (R=8 VMEM-OOM).  The amortization hypothesis
    fails because per-probe search AND gather cost scale with the
    window chunk count (every binary-search step and every feature
    gather walks all ``wch = W/128`` chunks), and W must grow with R
    to cover the supertile span.  ``SPCONV_DG_ROWS`` overrides for
    experiments; ``auto`` = the measured default (1)."""
    import os

    env = os.environ.get("SPCONV_DG_ROWS", "1")
    if env != "auto":
        return max(1, int(env))
    return 1


def dg_window_for(rows: int) -> int:
    """Window size for R-row supertiles: per-128-row reach (~256 keys
    measured on the bench scans) plus the supertile's own span."""
    return 256 + 128 * int(rows)


# A plan-statistics window cost model ("serial sweep passes cost 4×")
# lived here through round 4 and was retired: its winners (768/1024 on
# the 900k scan) were measured 10-40% SLOWER on v5e than the fixed 384
# default once the offset-major gather landed — extra sweep passes
# pipeline well; wider windows pay real search-step and DMA cost on
# every tile.  On-device sweeps are the only trusted window tuner
# (ConvTuner.cache_dg_window); plan stats could not predict silicon.

# perf-ablation knob (tools/probe_dg_bench.py): "nosearch" replaces the
# binary search with an iota guess, "nogather" skips the feature gather,
# "nogemm" skips the deep GEMM — results are WRONG under any of these;
# timing deltas isolate each stage's cost.
import os as _os

_ABLATE = _os.environ.get("SPCONV_DG_ABLATE", "")


# ---------------------------------------------------------------------------
# table layout
# ---------------------------------------------------------------------------

def chunk_table(x: jax.Array, n_pad: int, c_sub: int) -> jax.Array:
    """``[N, C]`` → transposed lane-chunked ``[n_pad//128, c_sub, 128]``
    f32 (gatherable dtype), channels padded to ``c_sub`` sublanes."""
    n = x.shape[0]
    xp = _pad_lanes(_pad_rows(x.astype(jnp.float32), n_pad, 0), c_sub)
    nc = n_pad // _LANE
    # [n_pad, c_sub] -> [c_sub, n_pad] -> [c_sub, nc, 128] -> [nc, c_sub, 128]
    return jnp.transpose(
        jnp.transpose(xp).reshape(c_sub, nc, _LANE), (1, 0, 2)
    )


def pack_pairs(c: int) -> int:
    """Packed sublane count: bf16 channel PAIRS ride int32 lanes (the
    only per-sublane-gatherable dtype on v5e — bf16 take_along_axis is
    rejected, tools/probe_dg.py), halving gather ops and window DMA."""
    return _round_up(-(-c // 2), 8)


def chunk_table_packed(x: jax.Array, n_pad: int, c2: int) -> jax.Array:
    """``[N, C]`` → ``[n_pad//128, c2, 128]`` int32, packed row ``r``
    holding bf16 channels ``2r`` (low 16 bits) and ``2r+1`` (high)."""
    n = x.shape[0]
    xb = _pad_lanes(_pad_rows(x.astype(jnp.bfloat16), n_pad, 0), 2 * c2)
    x2 = xb.reshape(n_pad, c2, 2)
    lo = jax.lax.bitcast_convert_type(x2[:, :, 0], jnp.uint16)
    hi = jax.lax.bitcast_convert_type(x2[:, :, 1], jnp.uint16)
    packed = (lo.astype(jnp.uint32)
              | (hi.astype(jnp.uint32) << 16)).astype(jnp.int32)
    nc = n_pad // _LANE
    return jnp.transpose(
        jnp.transpose(packed).reshape(c2, nc, _LANE), (1, 0, 2)
    )


def _unpack_pair(acc_i):
    """[c2,128] int32 → (lo, hi) f32 values of the packed bf16 pair
    (bf16→f32 = append 16 zero bits; zero stays zero for misses)."""
    lo = jax.lax.bitcast_convert_type(acc_i << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(acc_i & np.int32(-65536),
                                      jnp.float32)
    return lo, hi


def pair_perm(c2: int) -> np.ndarray:
    """Channel order of an unpacked gather block: [even | odd] over the
    ``2*c2`` padded channels — weights permute to match (the deep GEMM
    is invariant to a shared contraction-order permutation)."""
    return np.concatenate([np.arange(c2) * 2, np.arange(c2) * 2 + 1])


def quad_count(c: int) -> int:
    """Packed sublane count for int8: channel QUADS ride int32 lanes
    (4 int8 channels per gatherable int32), quartering gather ops and
    window DMA vs an unpacked int8 table."""
    return _round_up(-(-c // 4), 8)


def chunk_table_packed4(x_i8: jax.Array, n_pad: int, cq: int) -> jax.Array:
    """``[N, C]`` int8 → ``[n_pad//128, cq, 128]`` int32, packed row
    ``r`` holding int8 channels ``4r..4r+3`` (little-endian bytes)."""
    n = x_i8.shape[0]
    xb = _pad_lanes(_pad_rows(x_i8, n_pad, 0), 4 * cq)  # [n_pad, 4cq] int8
    x4 = xb.reshape(n_pad, cq, 4).astype(jnp.uint8).astype(jnp.uint32)
    packed = (x4[:, :, 0] | (x4[:, :, 1] << 8) | (x4[:, :, 2] << 16)
              | (x4[:, :, 3] << 24)).astype(jnp.int32)
    nc = n_pad // _LANE
    return jnp.transpose(
        jnp.transpose(packed).reshape(cq, nc, _LANE), (1, 0, 2)
    )


def _unpack_quad(acc_i):
    """[cq,128] int32 → 4 sign-extended int32 planes of the packed int8
    quad (byte ``s`` = channel ``4r+s``; zero stays zero for misses)."""
    return [
        (acc_i << 24) >> 24,
        (acc_i << 16) >> 24,
        (acc_i << 8) >> 24,
        acc_i >> 24,
    ]


def quad_perm(cq: int) -> np.ndarray:
    """Channel order of an unpacked int8 gather block: byte-plane-major
    ``[4r+0... | 4r+1... | 4r+2... | 4r+3...]`` over ``4*cq`` padded
    channels — weights permute to match."""
    return np.concatenate([np.arange(cq) * 4 + s for s in range(4)])


def chunk_keys(keys: jax.Array, n_pad: int, sentinel) -> jax.Array:
    """``[N]`` int32 sorted keys → ``[n_pad//128, _KROWS, 128]`` (row 0
    holds the keys; rows 1.. are sentinel padding for DMA shape)."""
    kp = _pad_rows(keys, n_pad, np.int32(2**31 - 1))
    nc = n_pad // _LANE
    k0 = kp.reshape(nc, 1, _LANE)
    pad = jnp.full((nc, _KROWS - 1, _LANE), np.int32(2**31 - 1), jnp.int32)
    return jnp.concatenate([k0, pad], axis=1)


def unchunk_out(out: jax.Array, n: int, k: int) -> jax.Array:
    """``[n_tiles, k_sub, R*128]`` → ``[n, k]`` (undo the transposed
    tiling)."""
    n_tiles, k_sub, lanes = out.shape
    return jnp.transpose(out, (0, 2, 1)).reshape(n_tiles * lanes,
                                                 k_sub)[:n, :k]


# ---------------------------------------------------------------------------
# in-kernel search + gather (v2: all offsets stacked along sublanes)
# ---------------------------------------------------------------------------

def _key_at(wk_chunks, idx):
    """Window key at ``idx`` ∈ [0, window) per element.  ``wk_chunks``:
    list of [G,128] int32 (chunk j of each row's window, already
    plane-selected per row)."""
    res = jnp.full(idx.shape, np.int32(2**31 - 1), jnp.int32)
    for j, rows in enumerate(wk_chunks):
        within = jnp.clip(idx - j * _LANE, 0, _LANE - 1)
        kj = jnp.take_along_axis(rows, within, axis=1)
        res = jnp.where((idx // _LANE) == j, kj, res)
    return res


def _search_window(wk_chunks, probes, window: int):
    """Lower-bound binary search of each probe in its (sorted) window.

    ``probes``: [gs, 128] int32 (−1 = dead).  Returns ``pos`` ∈
    [0, window) and ``found`` bool, both [gs, 128]."""
    lo = jnp.zeros(probes.shape, jnp.int32)
    hi = jnp.full(probes.shape, np.int32(window), jnp.int32)
    steps = int(np.ceil(np.log2(window + 1)))
    for _ in range(steps):
        active = lo < hi
        mid = jax.lax.div(lo + hi, np.int32(2))
        kmid = _key_at(wk_chunks, mid)
        go_right = kmid < probes
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & (~go_right), mid, hi)
    pos = jnp.clip(lo, 0, window - 1)
    found = (_key_at(wk_chunks, pos) == probes)
    return pos, found


def _gather_feat(wf_chunks, pos, found, c_rows):
    """Gather matched feature columns from the window chunks.

    ``pos``/``found``: [1,128] per-lane match position/flag.
    ``wf_chunks``: list of [c_rows,128] (f32 or packed int32).  Returns
    [c_rows,128] in the chunk dtype (zeros where unmatched — also the
    packed-int32 identity, so disjoint-window sums stay valid)."""
    idx = jnp.broadcast_to(pos, (c_rows, _LANE))
    fnd = jnp.broadcast_to(found, (c_rows, _LANE))
    acc = jnp.zeros((c_rows, _LANE), wf_chunks[0].dtype)
    for j, ch in enumerate(wf_chunks):
        within = jnp.clip(idx - j * _LANE, 0, _LANE - 1)
        fj = jnp.take_along_axis(ch, within, axis=1)
        acc = jnp.where(((idx // _LANE) == j) & fnd, fj, acc)
    return acc


def make_ptab(deltas, disp, gs, rows: int = 1) -> jax.Array:
    """Per-offset constant table [rows*gs, 128] int32 passed INTO the
    kernel (closure constants are rejected by pallas): col 0 = key shift
    Δ_k (0 for affine/divide probes), cols 1..ndim = displacement d_k,
    col ndim+1 = live flag (0 on the gs padding rows).  With
    ``rows`` > 1 the gs block tiles per supertile row."""
    kv, ndim = disp.shape
    tab = np.zeros((gs, 128), np.int32)
    if deltas is not None:
        tab[:kv, 0] = np.asarray(deltas, np.int64)
    tab[:kv, 1:1 + ndim] = np.asarray(disp, np.int32)
    tab[:kv, 1 + ndim] = 1
    return jnp.asarray(np.tile(tab, (rows, 1)))


def _vec_shift_probes(ktS, liveS, coordS, bidxS, ptab, dims):
    """Stacked subm probes [G,128] (−1 = dead/out-of-range), G = R·gs,
    row r·gs+k = supertile row r, kernel offset k.  Vectorized form of
    ``_probe_shift_fn`` — per-offset constants ride [G,1] columns of the
    ``ptab`` input (live flag at col ndim+1)."""
    nd = len(dims)
    ok = liveS & (ptab[:, nd + 1:nd + 2] > 0)
    for a in range(nd):
        ca = coordS[a] + ptab[:, a + 1:a + 2]
        ok = ok & (ca >= 0) & (ca < dims[a])
    probes = ktS + ptab[:, 0:1]
    return jnp.where(ok, probes, np.int32(-1))


def _vec_affine_probes(ktS, liveS, coordS, bidxS, ptab, stride,
                       table_dims):
    """Stacked OUT→IN probes [G,128]."""
    nd = len(table_dims)
    ok = liveS & (ptab[:, nd + 1:nd + 2] > 0)
    key = bidxS
    for a in range(nd):
        ca = coordS[a] * int(stride[a]) + ptab[:, a + 1:a + 2]
        ok = ok & (ca >= 0) & (ca < table_dims[a])
        key = key * int(table_dims[a]) + ca
    return jnp.where(ok, key, np.int32(-1))


def _vec_divide_probes(ktS, liveS, coordS, bidxS, ptab, stride,
                       table_dims):
    """Stacked IN→OUT probes (stride divisibility) [G,128]."""
    nd = len(table_dims)
    ok = liveS & (ptab[:, nd + 1:nd + 2] > 0)
    key = bidxS
    for a in range(nd):
        ta = coordS[a] - ptab[:, a + 1:a + 2]
        sa = int(stride[a])
        ca = jax.lax.div(ta, np.int32(sa))
        ok = (ok & (ta >= 0) & (jax.lax.rem(ta, np.int32(sa)) == 0)
              & (ca < table_dims[a]))
        key = key * int(table_dims[a]) + ca
    return jnp.where(ok, key, np.int32(-1))


# ---------------------------------------------------------------------------
# forward kernel (v3: R-row supertiles — R 128-lane rows per grid step
# share plane windows; probes stack [R·gs, 128]; gathers run per packed
# channel row; gbuf blocks stay 8-aligned; R deep GEMMs per step.
# R amortizes per-step fixed costs AND window reach: the per-voxel
# search/gather work scales with wch/R ≈ (R·128·density + reach)/(R·128).
# ---------------------------------------------------------------------------

def _dg_fwd_kernel(
    kv, c_sub, k_sub, R, vprobe_fn, dims, sentinel, groups, n_tiles,
    window, comp_dtype, packmode, act, have_add, add_scale, posmode,
    offmode,
    # scalar prefetch
    ws_ref, nw_ref,
    *args,
    # posmode=False inputs: kt_ref [1, R, 128] int32 (this supertile's
    #   OUTPUT keys); ptab_ref [R*gs, 128] int32 (make_ptab); ksh_hbm
    #   [nc, _KROWS, 128] int32 chunked key table; feat_hbm
    #   [nc, cg, 128] chunked feature table (i32 packed / f32); w_ref
    #   [k_sub, c_sub*gs] comp_dtype (int8 in q4 mode), column
    #   (cc*gs + k) = W[offset k, perm channel cc]
    # posmode=True inputs: pos_ref [1, G, 128] int32 — this tile's
    #   cached ABSOLUTE match rows (build_dg_pos; −1 = no match) —
    #   replacing kt/ptab/ksh (no probes, no search, no key DMA);
    #   then feat_hbm, w_ref as above
    # q4 mode only: scb_ref [2, k_sub, 128] f32 (scale row 0, bias row 1)
    #               add_ref [1, k_sub, R*128] int8 (when have_add)
    # then: out_ref [1, k_sub, R*128]
    # scratch: wk_ref [2, P, wch, _KROWS, 128] i32 (skipped in posmode);
    #          wf_ref [2, P, wch, cg, 128] table dtype;
    #          wk1_ref/wf1_ref single-window sweep buffers (wk1 skipped
    #          in posmode); gbuf_ref [R*c_sub*gs, 128] comp_dtype;
    #          DMA semaphores (feature-only in posmode)
):
    kt_ref = ptab_ref = ksh_hbm = pos_ref = None
    if posmode:
        pos_ref, feat_hbm, w_ref, *rest = args
    else:
        kt_ref, ptab_ref, ksh_hbm, feat_hbm, w_ref, *rest = args
    i = 0
    scb_ref = add_ref = None
    if packmode == "q4":
        scb_ref = rest[i]
        i += 1
        if have_add:
            add_ref = rest[i]
            i += 1
    out_ref = rest[i]
    wk_ref = wk1_ref = ksems = ksem1 = None
    if posmode:
        (wf_ref, wf1_ref, gbuf_ref, fsems, fsem1) = rest[i + 1:]
    else:
        (wk_ref, wf_ref, wk1_ref, wf1_ref, gbuf_ref,
         ksems, fsems, ksem1, fsem1) = rest[i + 1:]

    t = pl.program_id(0)
    P = len(groups)
    gp = kv // P  # include_center groups are uniform contiguous ranges
    assert all(len(g) == gp and g[0] == p * gp
               for p, g in enumerate(groups)), groups
    wch = window // _LANE
    gs = _round_up(kv, 8)
    G = R * gs
    # offmode = offset-major gbuf (rows k*c_sub + cc, no gs-pad rows):
    # kv gathers of [cg,128] per window chunk instead of cg gathers of
    # [G,128] — compile time AND op count scale with the gather count,
    # so wide channels (cg > kv) flip to offset-major (probe: Mosaic
    # compile 34.8 s at C=256 channel-major, linear in cg)
    blk = kv * c_sub if offmode else c_sub * gs
    # gather width: packed modes ride bf16 channel PAIRS / int8 channel
    # QUADS on int32 lanes
    cg = {"pack2": c_sub // 2, "q4": c_sub // 4}.get(packmode, c_sub)

    def start_tile(tt, buf):
        for p in range(P):
            c0 = ws_ref[p, tt] // _LANE
            if not posmode:
                pltpu.make_async_copy(
                    ksh_hbm.at[pl.ds(c0, wch)], wk_ref.at[buf, p],
                    ksems.at[buf, p]).start()
            pltpu.make_async_copy(
                feat_hbm.at[pl.ds(c0, wch)], wf_ref.at[buf, p],
                fsems.at[buf, p]).start()

    buf = jax.lax.rem(t, 2)

    if _ABLATE != "nodma":
        @pl.when(t == 0)
        def _():
            start_tile(0, 0)

        @pl.when(t + 1 < n_tiles)
        def _():
            start_tile(t + 1, jax.lax.rem(t + 1, 2))

        for p in range(P):
            if not posmode:
                pltpu.make_async_copy(
                    ksh_hbm.at[pl.ds(0, wch)], wk_ref.at[0, p],
                    ksems.at[buf, p]).wait()
            pltpu.make_async_copy(
                feat_hbm.at[pl.ds(0, wch)], wf_ref.at[0, p],
                fsems.at[buf, p]).wait()

    def stack_rows(build_one):
        """[G,128] from a per-supertile-row builder (r → [gs,128])."""
        rows = [build_one(r) for r in range(R)]
        return jnp.concatenate(rows, axis=0) if R > 1 else rows[0]

    # rows of a plane whose window is absent match nothing.  Built with
    # iota + scalar selects: Mosaic rejects concatenation of i1 vectors
    # ("Invalid vector register cast" on vector<8x128xi1>).
    rowk = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0), np.int32(gs))

    probes = None
    gpos = wsP = None
    if posmode:
        # cached absolute match rows (−1 = miss); per-row plane window
        # start turns them into window-local gather positions
        gpos = pos_ref[0]
        wsP = jnp.zeros((G, 1), jnp.int32)
        for p in range(P):
            in_p = (rowk >= p * gp) & (rowk < (p + 1) * gp)
            wsP = jnp.where(in_p, ws_ref[p, t], wsP)
    else:
        ktS = stack_rows(lambda r: jnp.broadcast_to(
            kt_ref[0, r:r + 1, :], (gs, _LANE)))
        liveS = ktS != sentinel
        if _ABLATE == "noprobe":
            probes = ktS
        else:
            # decode coords on the [1,128] tile-key rows, THEN broadcast
            # — integer div/rem on the [G,128] stack costs gs× the VPU
            # work
            per_row = [_probe_coords(kt_ref[0, r:r + 1, :], dims)
                       for r in range(R)]
            coordS = [stack_rows(lambda r, a=a: jnp.broadcast_to(
                per_row[r][0][a], (gs, _LANE)))
                for a in range(len(dims))]
            bidxS = stack_rows(lambda r: jnp.broadcast_to(
                per_row[r][1], (gs, _LANE)))
            probes = vprobe_fn(ktS, liveS, coordS, bidxS, ptab_ref[:])

        pnw = jnp.zeros((G, 1), jnp.int32)
        for p in range(P):
            in_p = (rowk >= p * gp) & (rowk < (p + 1) * gp)
            pnw = jnp.where(in_p, nw_ref[p, t], pnw)
        probes = jnp.where(pnw > 0, probes, np.int32(-1))

    big = np.int32(2**31 - 1)

    def stacked_chunk(rows_per_plane, pad_value):
        """[G,128] per-offset-row view of P per-plane [1,128] rows:
        rows of plane p's offsets see ``rows_per_plane[p]``; the gs
        padding rows see ``pad_value``."""
        pieces = [jnp.broadcast_to(rows_per_plane[p], (gp, _LANE))
                  for p in range(P)]
        if gs > kv:
            pieces.append(jnp.full((gs - kv, _LANE), pad_value,
                                   rows_per_plane[0].dtype))
        inner = (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                 else pieces[0])
        return (jnp.concatenate([inner] * R, axis=0) if R > 1
                else inner)

    def gather_all(get_key_row, get_feat_row, accumulate, wi=None,
                   plane=None):
        """One full search+gather pass against the current windows.

        ``get_key_row(p, j)`` / ``get_feat_row(p, j, craw)`` return the
        [1,128] window key row / packed feature row of plane p, chunk j.
        Writes (or accumulates) every gbuf block.  In posmode the search
        is replaced by the cached positions: ``wi`` is the (traced)
        sweep-window index and ``plane`` restricts matches to one
        plane's offset rows during the serial sweep."""
        if posmode:
            local = gpos - wsP
            if wi is not None:
                local = local - wi * np.int32(window)
            found = (gpos >= 0) & (local >= 0) & (local < window)
            if plane is not None:
                found = found & (rowk >= plane * gp) \
                    & (rowk < (plane + 1) * gp)
            pos = jnp.clip(local, 0, window - 1)
        elif _ABLATE in ("nosearch", "bare"):
            pos = jnp.broadcast_to(
                jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1),
                (G, _LANE))
            found = probes >= 0
        else:
            wkS = [stacked_chunk([get_key_row(p, j) for p in range(P)],
                                 big)
                   for j in range(wch)]
            pos, found = _search_window(wkS, probes, window)

        if _ABLATE in ("nogather", "bare"):
            rep = -(-gbuf_ref.shape[0] // G)
            stack = jnp.concatenate(
                [pos.astype(gbuf_ref.dtype)] * rep, axis=0)
            gbuf_ref[:] = stack[:gbuf_ref.shape[0]]
            return

        if offmode:
            # offset-major: per (r, offset) gather ALL channel groups in
            # one [cg,128] take_along_axis (same search result, row g
            # sliced and broadcast across the channel sublanes)
            def feat_block(p, j):
                if wi is None:
                    return wf_ref[buf, p, j]
                return wf1_ref[j]

            koffs = (range(plane * gp, (plane + 1) * gp)
                     if plane is not None else range(kv))
            for r in range(R):
                for kk in koffs:
                    g = r * gs + kk
                    p = kk // gp
                    posr = pos[g:g + 1]
                    fr = found[g:g + 1]
                    acc = None
                    for j in range(wch):
                        within = jnp.broadcast_to(
                            jnp.clip(posr - j * _LANE, 0, _LANE - 1),
                            (cg, _LANE))
                        gth = jnp.take_along_axis(feat_block(p, j),
                                                  within, axis=1)
                        gth = jnp.where(((posr // _LANE) == j) & fr, gth,
                                        jnp.zeros_like(gth))
                        acc = gth if acc is None else acc + gth
                    if packmode == "pack2":
                        parts = _unpack_pair(acc)
                    elif packmode == "q4":
                        parts = _unpack_quad(acc)
                    else:
                        parts = [acc]
                    block = (jnp.concatenate(parts, axis=0)
                             if len(parts) > 1 else parts[0])
                    vv = block.astype(gbuf_ref.dtype)
                    dst = slice(r * blk + kk * c_sub,
                                r * blk + (kk + 1) * c_sub)
                    if accumulate:
                        if gbuf_ref.dtype == jnp.int8:
                            gbuf_ref[dst, :] = (
                                gbuf_ref[dst, :].astype(jnp.int32)
                                + vv.astype(jnp.int32)
                            ).astype(jnp.int8)
                        else:
                            gbuf_ref[dst, :] += vv
                    else:
                        gbuf_ref[dst, :] = vv
            return

        # zero of the packed table dtype is also the packed zero, so
        # the miss value is correct pre- and post-unpack
        for craw in range(cg):
            acc = None
            for j in range(wch):
                fj = stacked_chunk(
                    [get_feat_row(p, j, craw) for p in range(P)],
                    np.int32(0) if packmode in ("pack2", "q4")
                    else np.float32(0))
                within = jnp.clip(pos - j * _LANE, 0, _LANE - 1)
                g = jnp.take_along_axis(fj, within, axis=1)
                g = jnp.where(((pos // _LANE) == j) & found, g,
                              jnp.zeros_like(g))
                acc = g if acc is None else acc + g
            if packmode == "pack2":
                parts = _unpack_pair(acc)
            elif packmode == "q4":
                parts = _unpack_quad(acc)
            else:
                parts = [acc]
            for s, v in enumerate(parts):
                cc = s * cg + craw
                vv = v.astype(gbuf_ref.dtype)
                for r in range(R):
                    dst = slice(r * blk + cc * gs,
                                r * blk + (cc + 1) * gs)
                    src = vv[r * gs:(r + 1) * gs, :]
                    if accumulate:
                        if gbuf_ref.dtype == jnp.int8:
                            # Mosaic has no vector<i8> add — widen to i32
                            # (disjoint windows: one side is always 0)
                            gbuf_ref[dst, :] = (
                                gbuf_ref[dst, :].astype(jnp.int32)
                                + src.astype(jnp.int32)
                            ).astype(jnp.int8)
                        else:
                            gbuf_ref[dst, :] += src
                    else:
                        gbuf_ref[dst, :] = src

    gather_all(lambda p, j: wk_ref[buf, p, j, 0:1, :],
               lambda p, j, craw: wf_ref[buf, p, j, craw:craw + 1, :],
               accumulate=False)

    # rare extra windows: per-plane serial sweep
    if _ABLATE in ("nodma", "nosweep", "bare"):
        mx = jnp.int32(1)
    else:
        mx = nw_ref[0, t]
        for p in range(1, P):
            mx = jnp.maximum(mx, nw_ref[p, t])

    @pl.when(mx > 1)
    def _():
        def sweep(wi, carry):
            for p in range(P):
                @pl.when(wi < nw_ref[p, t])
                def _(p=p):
                    c0 = ws_ref[p, t] // _LANE + wi * wch
                    if not posmode:
                        pltpu.make_async_copy(
                            ksh_hbm.at[pl.ds(c0, wch)], wk1_ref,
                            ksem1).start()
                    pltpu.make_async_copy(
                        feat_hbm.at[pl.ds(c0, wch)], wf1_ref,
                        fsem1).start()
                    if not posmode:
                        pltpu.make_async_copy(
                            ksh_hbm.at[pl.ds(0, wch)], wk1_ref,
                            ksem1).wait()
                    pltpu.make_async_copy(
                        feat_hbm.at[pl.ds(0, wch)], wf1_ref,
                        fsem1).wait()

                    # rows of OTHER planes see sentinel keys → no match
                    def key_row(q, j, p=p):
                        if q == p:
                            return wk1_ref[j, 0:1, :]
                        return jnp.full((1, _LANE), big, jnp.int32)

                    def feat_row(q, j, craw, p=p):
                        return wf1_ref[j, craw:craw + 1, :]

                    gather_all(key_row, feat_row, accumulate=True,
                               wi=wi, plane=p)
            return carry

        jax.lax.fori_loop(1, mx, sweep, 0)

    for r in range(R):
        gslice = gbuf_ref[r * blk:(r + 1) * blk, :]
        lanes = slice(r * _LANE, (r + 1) * _LANE)
        if _ABLATE == "nogemm":
            out_ref[0, :, lanes] = jnp.broadcast_to(
                gslice[0:1, :], (k_sub, _LANE)).astype(out_ref.dtype)
        elif packmode == "q4":
            # int8 × int8 → int32 MXU GEMM with the fused scale/bias/
            # act/residual/requant epilogue (parity: the reference int8
            # implicit_gemm epilogue, ops.py:1465-1525)
            acc = jnp.dot(w_ref[:], gslice,
                          preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * scb_ref[0] + scb_ref[1]
            if have_add:
                y = y + add_ref[0][:, lanes].astype(jnp.float32) \
                    * add_scale
            if act == "relu":
                y = jnp.maximum(y, 0.0)
            if out_ref.dtype == jnp.int8:
                y = jnp.clip(jnp.round(y), -127.0, 127.0)
            out_ref[0, :, lanes] = y.astype(out_ref.dtype)
        else:
            out = jnp.dot(w_ref[:], gslice,
                          preferred_element_type=jnp.float32)
            out_ref[0, :, lanes] = out.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# cached match positions — the binary-search result depends only on the
# GEOMETRY (sorted keys + window plan), so subm stages that share an
# ``indice_key`` (4–5 layers each in SECOND/CenterPoint encoders) can
# run the search ONCE and reuse the absolute match rows, dropping the
# per-layer search, probe arithmetic, AND key-window DMA.  Plays the
# role of the reference's cached pair table (``pytorch/ops.py:360-362``)
# in output-centric [kv, N_out] layout.
# ---------------------------------------------------------------------------

def _dg_pos_kernel(
    kv, R, vprobe_fn, dims, sentinel, groups, n_tiles, window,
    ws_ref, nw_ref,
    kt_ref,      # [1, R, 128] int32 — this supertile's keys
    ptab_ref,    # [R*gs, 128] int32 per-offset constants
    ksh_hbm,     # [nc, _KROWS, 128] int32 chunked key table
    pos_ref,     # out [1, G, 128] int32 — absolute match rows (−1 miss)
    wk_ref, wk1_ref, ksems, ksem1,
):
    t = pl.program_id(0)
    P = len(groups)
    gp = kv // P
    wch = window // _LANE
    gs = _round_up(kv, 8)
    G = R * gs
    big = np.int32(2**31 - 1)

    def start_tile(tt, buf):
        for p in range(P):
            c0 = ws_ref[p, tt] // _LANE
            pltpu.make_async_copy(
                ksh_hbm.at[pl.ds(c0, wch)], wk_ref.at[buf, p],
                ksems.at[buf, p]).start()

    buf = jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        start_tile(0, 0)

    @pl.when(t + 1 < n_tiles)
    def _():
        start_tile(t + 1, jax.lax.rem(t + 1, 2))

    for p in range(P):
        pltpu.make_async_copy(
            ksh_hbm.at[pl.ds(0, wch)], wk_ref.at[0, p],
            ksems.at[buf, p]).wait()

    def stack_rows(build_one):
        rows = [build_one(r) for r in range(R)]
        return jnp.concatenate(rows, axis=0) if R > 1 else rows[0]

    ktS = stack_rows(lambda r: jnp.broadcast_to(
        kt_ref[0, r:r + 1, :], (gs, _LANE)))
    liveS = ktS != sentinel
    per_row = [_probe_coords(kt_ref[0, r:r + 1, :], dims)
               for r in range(R)]
    coordS = [stack_rows(lambda r, a=a: jnp.broadcast_to(
        per_row[r][0][a], (gs, _LANE))) for a in range(len(dims))]
    bidxS = stack_rows(lambda r: jnp.broadcast_to(
        per_row[r][1], (gs, _LANE)))
    probes = vprobe_fn(ktS, liveS, coordS, bidxS, ptab_ref[:])

    rowk = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0), np.int32(gs))
    pnw = jnp.zeros((G, 1), jnp.int32)
    wsP = jnp.zeros((G, 1), jnp.int32)
    for p in range(P):
        in_p = (rowk >= p * gp) & (rowk < (p + 1) * gp)
        pnw = jnp.where(in_p, nw_ref[p, t], pnw)
        wsP = jnp.where(in_p, ws_ref[p, t], wsP)
    probes = jnp.where(pnw > 0, probes, np.int32(-1))

    def stacked_chunk(rows_per_plane):
        pieces = [jnp.broadcast_to(rows_per_plane[p], (gp, _LANE))
                  for p in range(P)]
        if gs > kv:
            pieces.append(jnp.full((gs - kv, _LANE), big, jnp.int32))
        inner = (jnp.concatenate(pieces, axis=0) if len(pieces) > 1
                 else pieces[0])
        return (jnp.concatenate([inner] * R, axis=0) if R > 1
                else inner)

    wkS = [stacked_chunk([wk_ref[buf, p, j, 0:1, :] for p in range(P)])
           for j in range(wch)]
    pos, found = _search_window(wkS, probes, window)
    pos_ref[0] = jnp.where(found, wsP + pos, np.int32(-1))

    mx = nw_ref[0, t]
    for p in range(1, P):
        mx = jnp.maximum(mx, nw_ref[p, t])

    @pl.when(mx > 1)
    def _():
        def sweep(wi, carry):
            for p in range(P):
                @pl.when(wi < nw_ref[p, t])
                def _(p=p):
                    c0 = ws_ref[p, t] // _LANE + wi * wch
                    pltpu.make_async_copy(
                        ksh_hbm.at[pl.ds(c0, wch)], wk1_ref,
                        ksem1).start()
                    pltpu.make_async_copy(
                        ksh_hbm.at[pl.ds(0, wch)], wk1_ref,
                        ksem1).wait()

                    def key_row(q, j, p=p):
                        if q == p:
                            return wk1_ref[j, 0:1, :]
                        return jnp.full((1, _LANE), big, jnp.int32)

                    wk1S = [stacked_chunk([key_row(q, j)
                                           for q in range(P)])
                            for j in range(wch)]
                    pos2, found2 = _search_window(wk1S, probes, window)
                    g2 = jnp.where(
                        found2, wsP + wi * np.int32(window) + pos2,
                        np.int32(-1))
                    # windows are disjoint → at most one match per row
                    pos_ref[0] = jnp.maximum(pos_ref[0], g2)
            return carry

        jax.lax.fori_loop(1, mx, sweep, 0)


def build_dg_pos(
    keys: jax.Array, plan_fwd, *, ksize, dilation, spatial_shape,
    batch_size, window: int, rows: int = 1, reverse: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Run the windowed binary search ONCE for a subm stage, returning
    the cached absolute match rows ``[n_tiles, G, 128]`` int32 (−1 =
    miss) consumed by the posmode forward (``dg_subm_conv(pos=...)``).
    ``reverse=True`` negates the offsets (the backward's probe map —
    pass the BWD plan), caching positions for the fused dgrad+wgrad
    pass instead."""
    ksize = tuple(int(k) for k in ksize)
    dilation = tuple(int(d) for d in dilation)
    dims = tuple(int(s) for s in spatial_shape)
    deltas_np, disp_np = subm_key_deltas(ksize, dilation, dims)
    if reverse:
        deltas_np = -np.asarray(deltas_np)
        disp_np = -np.asarray(disp_np)
    groups = sk_groups(ksize, include_center=True)
    sentinel = int(np.prod(dims)) * int(batch_size)
    return _build_dg_pos(keys, plan_fwd, deltas_np, disp_np, groups,
                         dims, sentinel, window, rows, interpret)


def _build_dg_pos(keys, plan_fwd, deltas_np, disp_np, groups, dims,
                  sentinel, window, rows=1, interpret=False):
    kv = len(deltas_np)
    gs = _round_up(kv, 8)
    R = int(rows)
    G = R * gs
    tile = R * _LANE
    n = keys.shape[0]
    n_tiles = -(-n // tile)
    np_t = n_tiles * tile
    _, n_pad = _n_pad_for(n, tile, window)
    n_pad = _round_up(max(n_pad, np_t), _LANE)

    ksh = chunk_keys(keys, n_pad, sentinel)
    keys_tiles = _pad_rows(keys, np_t, sentinel).reshape(
        n_tiles, R, _LANE)
    ptab = make_ptab(deltas_np, disp_np, gs, rows=R)
    vprobe = functools.partial(_vec_shift_probes, dims=dims)

    wch = window // _LANE
    P = len(groups)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, R, _LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, G, _LANE), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, P, wch, _KROWS, _LANE), jnp.int32),
            pltpu.VMEM((wch, _KROWS, _LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _dg_pos_kernel, kv, R, vprobe, dims, sentinel, groups,
        n_tiles, window,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, G, _LANE), jnp.int32),
        interpret=interpret,
    )(plan_fwd.ws, plan_fwd.nw, keys_tiles, ptab, ksh)


def _dg_conv_call(
    table_feats, table_keys, tile_keys, weight_kv, plan, ptab,
    *, vprobe_builder, decode_dims, sentinel_tile, groups,
    window, out_dtype, rows=1, interpret=False, pos=None,
):
    """Shared DG forward invocation.

    ``table_feats`` [N_tab, C], ``table_keys`` [N_tab] (the gather
    side); ``tile_keys`` [N_out] (the tile side).  ``vprobe_builder``
    returns the stacked [gs,128] probe array from (kt, live, coord,
    bidx).  Returns ``[N_out, K]`` in ``out_dtype``."""
    kv, c, k_ch = weight_kv.shape
    k_sub = _round_up(k_ch, 8)
    gs = _round_up(kv, 8)
    R = int(rows)
    tile = R * _LANE
    n_out = tile_keys.shape[0]
    n_tiles = -(-n_out // tile)
    np_t = n_tiles * tile
    _, n_pad = _n_pad_for(table_keys.shape[0], tile, window)
    n_pad = _round_up(max(n_pad, np_t), _LANE)

    comp_dtype = (jnp.float32 if table_feats.dtype == jnp.float32
                  else jnp.bfloat16)
    packed = comp_dtype == jnp.bfloat16
    if packed:
        cg = pack_pairs(c)
        c_sub = 2 * cg
        perm_c = pair_perm(cg)
    else:
        c_sub = _round_up(c, 8)
        cg = c_sub
        perm_c = np.arange(c_sub)

    if packed:
        feat_ch = chunk_table_packed(table_feats, n_pad, cg)
    else:
        feat_ch = chunk_table(table_feats, n_pad, c_sub)

    # offset-major gather when channel groups outnumber kernel offsets:
    # kv gathers of [cg,128] per chunk beat cg gathers of [G,128] — and
    # Mosaic compile time is linear in the gather-op count
    offmode = cg > kv and not _ABLATE

    # C axis permuted to the packed unpack order ([even | odd]);
    # column order matches the kernel's gbuf blocks: (cc*gs + k)
    # channel-major, (k*c_sub + cc) offset-major (no gs-pad rows)
    wpad = jnp.pad(weight_kv,
                   ((0, 0 if offmode else gs - kv), (0, c_sub - c),
                    (0, k_sub - k_ch)))
    wpad = wpad[:, perm_c, :]
    if offmode:
        wflat = jnp.transpose(wpad, (2, 0, 1)).reshape(k_sub, kv * c_sub)
    else:
        wflat = jnp.transpose(wpad, (2, 1, 0)).reshape(k_sub, c_sub * gs)
    blk = kv * c_sub if offmode else c_sub * gs

    wch = window // _LANE
    P = len(groups)
    ftab_dtype = jnp.int32 if packed else jnp.float32
    posmode = pos is not None
    if posmode:
        G = R * gs
        assert pos.shape == (n_tiles, G, _LANE), (pos.shape, n_tiles)
        in_specs = [
            pl.BlockSpec((1, G, _LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((2, P, wch, cg, _LANE), ftab_dtype),
            pltpu.VMEM((wch, cg, _LANE), ftab_dtype),
            pltpu.VMEM((R * blk, _LANE), comp_dtype),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA,
        ]
        operands = (plan.ws, plan.nw, pos, feat_ch,
                    wflat.astype(comp_dtype))
    else:
        ksh = chunk_keys(table_keys, n_pad, sentinel_tile)
        tile_keys_p = _pad_rows(tile_keys, np_t, sentinel_tile)
        keys_tiles = tile_keys_p.reshape(n_tiles, R, _LANE)
        in_specs = [
            pl.BlockSpec((1, R, _LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((2, P, wch, _KROWS, _LANE), jnp.int32),
            pltpu.VMEM((2, P, wch, cg, _LANE), ftab_dtype),
            pltpu.VMEM((wch, _KROWS, _LANE), jnp.int32),
            pltpu.VMEM((wch, cg, _LANE), ftab_dtype),
            pltpu.VMEM((R * blk, _LANE), comp_dtype),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA((2, P)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ]
        operands = (plan.ws, plan.nw, keys_tiles, ptab, ksh, feat_ch,
                    wflat.astype(comp_dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, k_sub, R * _LANE),
                               lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _dg_fwd_kernel, kv, c_sub, k_sub, R, vprobe_builder,
        tuple(decode_dims), sentinel_tile, groups, n_tiles, window,
        comp_dtype, "pack2" if packed else "f32", "none", False, 0.0,
        posmode, offmode,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, k_sub, R * _LANE),
                                       out_dtype),
        interpret=interpret,
    )(*operands)
    return unchunk_out(out, n_out, k_ch)


def _dg_conv_call_q(
    table_feats_i8, table_keys, tile_keys, weight_kv_i8, plan, ptab,
    *, vprobe_builder, decode_dims, sentinel_tile, groups, window,
    scale, bias, act, out_dtype, add_features=None, add_scale=1.0,
    rows=1, interpret=False, pos=None,
):
    """int8 DG forward: quad-packed gather (4 int8 channels per int32
    lane), int8×int8→int32 deep GEMM, fused scale/bias/act/residual/
    requant epilogue.  Returns ``[N_out, K]`` in ``out_dtype``."""
    kv, c, k_ch = weight_kv_i8.shape
    k_sub = _round_up(k_ch, 32)  # int8 sublane tiling is (32, 128)
    gs = _round_up(kv, 8)
    R = int(rows)
    tile = R * _LANE
    n_out = tile_keys.shape[0]
    n_tiles = -(-n_out // tile)
    np_t = n_tiles * tile
    _, n_pad = _n_pad_for(table_keys.shape[0], tile, window)
    n_pad = _round_up(max(n_pad, np_t), _LANE)

    cq = quad_count(c)
    c_sub = 4 * cq
    perm_c = quad_perm(cq)
    offmode = cq > kv and not _ABLATE
    blk = kv * c_sub if offmode else c_sub * gs

    feat_ch = chunk_table_packed4(table_feats_i8, n_pad, cq)

    wpad = jnp.pad(weight_kv_i8,
                   ((0, 0 if offmode else gs - kv), (0, c_sub - c),
                    (0, k_sub - k_ch)))
    wpad = wpad[:, perm_c, :]
    if offmode:
        wflat = jnp.transpose(wpad, (2, 0, 1)).reshape(k_sub, kv * c_sub)
    else:
        wflat = jnp.transpose(wpad, (2, 1, 0)).reshape(k_sub, c_sub * gs)

    scale_p = jnp.pad(jnp.asarray(scale, jnp.float32), (0, k_sub - k_ch))
    bias_p = (jnp.pad(jnp.asarray(bias, jnp.float32), (0, k_sub - k_ch))
              if bias is not None else jnp.zeros((k_sub,), jnp.float32))
    scb = jnp.stack([
        jnp.broadcast_to(scale_p[:, None], (k_sub, _LANE)),
        jnp.broadcast_to(bias_p[:, None], (k_sub, _LANE)),
    ])  # [2, k_sub, 128] f32

    have_add = add_features is not None
    wch = window // _LANE
    P = len(groups)
    posmode = pos is not None
    if posmode:
        G = R * gs
        assert pos.shape == (n_tiles, G, _LANE), (pos.shape, n_tiles)
        in_specs = [
            pl.BlockSpec((1, G, _LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((2, k_sub, _LANE), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [plan.ws, plan.nw, pos, feat_ch, wflat, scb]
    else:
        ksh = chunk_keys(table_keys, n_pad, sentinel_tile)
        tile_keys_p = _pad_rows(tile_keys, np_t, sentinel_tile)
        keys_tiles = tile_keys_p.reshape(n_tiles, R, _LANE)
        in_specs = [
            pl.BlockSpec((1, R, _LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((2, k_sub, _LANE), lambda t, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [plan.ws, plan.nw, keys_tiles, ptab, ksh, feat_ch,
                wflat, scb]
    if have_add:
        # residual rows align 1:1 with output tile rows (subm add);
        # transposed to the kernel's [k_sub, R*128] out layout
        ap = _pad_lanes(_pad_rows(add_features, np_t, 0), k_sub)
        add_ch = jnp.transpose(
            ap.reshape(n_tiles, R * _LANE, k_sub), (0, 2, 1))
        in_specs.append(
            pl.BlockSpec((1, k_sub, R * _LANE),
                         lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(add_ch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, k_sub, R * _LANE),
                               lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            [
                pltpu.VMEM((2, P, wch, cq, _LANE), jnp.int32),
                pltpu.VMEM((wch, cq, _LANE), jnp.int32),
                pltpu.VMEM((R * blk, _LANE), jnp.int8),
                pltpu.SemaphoreType.DMA((2, P)),
                pltpu.SemaphoreType.DMA,
            ] if posmode else [
                pltpu.VMEM((2, P, wch, _KROWS, _LANE), jnp.int32),
                pltpu.VMEM((2, P, wch, cq, _LANE), jnp.int32),
                pltpu.VMEM((wch, _KROWS, _LANE), jnp.int32),
                pltpu.VMEM((wch, cq, _LANE), jnp.int32),
                pltpu.VMEM((R * blk, _LANE), jnp.int8),
                pltpu.SemaphoreType.DMA((2, P)),
                pltpu.SemaphoreType.DMA((2, P)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ]
        ),
    )
    kernel = functools.partial(
        _dg_fwd_kernel, kv, c_sub, k_sub, R, vprobe_builder,
        tuple(decode_dims), sentinel_tile, groups, n_tiles, window,
        jnp.int8, "q4", act, have_add, float(add_scale), posmode,
        offmode,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, k_sub, R * _LANE),
                                       out_dtype),
        interpret=interpret,
    )(*args)
    return unchunk_out(out, n_out, k_ch)


def dg_subm_conv_q(
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
    add_features: Optional[jax.Array] = None,  # [N, K] int8 residual
    add_scale: float = 1.0,   # add_in_scale / out_scale
    window: int = 384,
    rows_per_tile: int = 1,
    plans: Optional[Tuple[SKPlan, SKPlan]] = None,
    pos: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """int8 dynamic-gather subm conv with the fused epilogue, including
    the residual-fused variant (parity: ``SparseConvAddReLU``,
    ``intrinsic/quantized/conv_relu.py``).  Inference-only; requires a
    statically key-sorted tensor."""
    ksize = tuple(int(k) for k in weight_i8.shape[1:-1])
    dilation = tuple(int(d) for d in dilation)
    k_out = weight_i8.shape[0]
    c = weight_i8.shape[-1]
    kv = int(np.prod(ksize))
    weight_kv = jnp.transpose(
        weight_i8.reshape(k_out, kv, c), (1, 2, 0))  # [kv, C, K] int8

    deltas_np, disp_np = subm_key_deltas(ksize, dilation, spatial_shape)
    groups = sk_groups(ksize, include_center=True)
    dims = tuple(int(s) for s in spatial_shape)
    sentinel = int(np.prod(dims)) * int(batch_size)
    n = keys.shape[0]
    R = int(rows_per_tile)
    np_t, n_pad = _n_pad_for(n, R * _LANE, window)
    if plans is None:
        keys_p = _pad_rows(keys, np_t, sentinel)
        plans = build_sk_plans(
            keys_p, sentinel, deltas_np, groups, tile=R * _LANE,
            window=window, n_pad=n_pad, align=_LANE,
        )
    gs = _round_up(kv, 8)
    vprobe = functools.partial(_vec_shift_probes, dims=dims)
    return _dg_conv_call_q(
        features_i8, keys, keys, weight_kv, plans[0],
        make_ptab(deltas_np, disp_np, gs, rows=R),
        vprobe_builder=vprobe, decode_dims=dims, sentinel_tile=sentinel,
        groups=groups, window=window, scale=scale, bias=bias, act=act,
        out_dtype=out_dtype, add_features=add_features,
        add_scale=add_scale, rows=R, interpret=interpret, pos=pos,
    )


def dg_regular_conv_q(
    features_i8: jax.Array,
    in_keys: jax.Array,
    out_keys: jax.Array,
    weight_i8: jax.Array,     # KRSC int8
    scale: jax.Array,
    bias: Optional[jax.Array],
    *,
    in_shape: Sequence[int],
    out_shape: Sequence[int],
    batch_size: int,
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
    act: str = "none",
    out_dtype=jnp.int8,
    inverse: bool = False,
    window: int = 384,
    rows_per_tile: int = 1,
    plans=None,
    interpret: bool = False,
):
    """int8 dynamic-gather regular (strided) / inverse conv with fused
    epilogue.  Output sites must be precomputed (``out_keys``); for
    ``inverse`` the features live at ``out_keys`` (the encoder's output
    sites) and results land on ``in_keys``.  Returns
    ``(out_features, plans)``."""
    from .sorted_conv import _SKRegGeom, build_sk_reg_plans

    ksize = tuple(int(k) for k in weight_i8.shape[1:-1])
    k_out = weight_i8.shape[0]
    c = weight_i8.shape[-1]
    kv = int(np.prod(ksize))
    offs = C.kernel_offsets(ksize)
    disp = (offs * np.asarray([int(d) for d in dilation])
            - np.asarray([int(p) for p in padding])).astype(np.int32)
    in_dims = tuple(int(v) for v in in_shape)
    out_dims = tuple(int(v) for v in out_shape)
    sent_in = int(np.prod(in_dims)) * int(batch_size)
    sent_out = int(np.prod(out_dims)) * int(batch_size)
    groups = sk_groups(ksize, include_center=True)
    weight_kv = jnp.transpose(
        weight_i8.reshape(k_out, kv, c), (1, 2, 0))
    R = 1 if inverse else int(rows_per_tile)
    if plans is None:
        sk_geom = _SKRegGeom(
            stride=tuple(int(v) for v in stride),
            disp=tuple(int(v) for v in disp.reshape(-1)),
            in_dims=in_dims, out_dims=out_dims, sent_in=sent_in,
            sent_out=sent_out, tile=_LANE, window=window,
            groups=groups, inverse=bool(inverse),
            interpret=bool(interpret),
        )
        plans = build_sk_reg_plans(in_keys, out_keys, sk_geom,
                                   align=_LANE, tile_io=R * _LANE)
    plan_io, plan_oi = plans
    gs = _round_up(kv, 8)
    if inverse:
        vprobe = functools.partial(
            _vec_divide_probes, stride=tuple(int(v) for v in stride),
            table_dims=out_dims)
        out = _dg_conv_call_q(
            features_i8, out_keys, in_keys, weight_kv, plan_oi,
            make_ptab(None, disp, gs),
            vprobe_builder=vprobe, decode_dims=in_dims,
            sentinel_tile=sent_in, groups=groups, window=window,
            scale=scale, bias=bias, act=act, out_dtype=out_dtype,
            interpret=interpret,
        )
        return out, plans
    vprobe = functools.partial(
        _vec_affine_probes, stride=tuple(int(v) for v in stride),
        table_dims=in_dims)
    out = _dg_conv_call_q(
        features_i8, in_keys, out_keys, weight_kv, plan_io,
        make_ptab(None, disp, gs, rows=R),
        vprobe_builder=vprobe, decode_dims=out_dims,
        sentinel_tile=sent_out, groups=groups, window=window,
        scale=scale, bias=bias, act=act, out_dtype=out_dtype,
        rows=R, interpret=interpret,
    )
    return out, plans


# ---------------------------------------------------------------------------
# fused backward kernel (dgrad + wgrad share the dout gather)
# ---------------------------------------------------------------------------

def _dg_bwd_kernel(
    kv, c_sub, k_sub, probe_fn, dims, sentinel, groups,
    n_tiles, window, comp_dtype, packed, posmode,
    ws_ref, nw_ref,
    *args,
    # posmode=False inputs: kt_ref [1, 1, 128] (tile keys, input rows);
    #   ft_ref [tile, c_sub] (forward features tile, wgrad operand);
    #   ksh_hbm chunked table keys (dout side); dout_hbm [nc, kg, 128]
    #   chunked dout table (i32 packed / f32); wdg_ref
    #   [c_sub, kv*k_sub] comp_dtype — W[k] blocks (dgrad), K-axis
    #   permuted to the unpack order when packed
    # posmode=True: kt/ksh replaced by pos_ref [1, gs, 128] int32 —
    #   cached REVERSED match rows (build_dg_pos(reverse=True) on the
    #   bwd plan); no probes, no search, no key DMA
    # outputs: din_ref [1, c_sub, 128];
    #          dw_ref [kv*k_sub, c_sub] f32 grid-accumulated, K-permuted
    # scratch: wk2/wf2 double-buffered windows (wk2 absent in posmode),
    #          wk1/wf1 sweep buffers (wk1 absent in posmode),
    #          gbuf [kv*k_sub, 128]; DMA semaphores
):
    kt_ref = ksh_hbm = pos_ref = None
    wk2_ref = wk1_ref = ksem2 = ksem1 = None
    if posmode:
        (pos_ref, ft_ref, dout_hbm, wdg_ref, din_ref, dw_ref,
         wf2_ref, wf1_ref, gbuf_ref, fsem2, fsem1) = args
    else:
        (kt_ref, ft_ref, ksh_hbm, dout_hbm, wdg_ref, din_ref, dw_ref,
         wk2_ref, wf2_ref, wk1_ref, wf1_ref, gbuf_ref,
         ksem2, fsem2, ksem1, fsem1) = args

    t = pl.program_id(0)
    n_planes = len(groups)
    wch = window // _LANE
    kg = k_sub // 2 if packed else k_sub

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    if not posmode:
        kt = kt_ref[0, 0]
        live = kt != sentinel
        coord, bidx = _probe_coords(kt, dims)

    def start_dma2(step, buf):
        tt = step // n_planes
        pp = step % n_planes
        c0 = ws_ref[pp, tt] // _LANE
        if not posmode:
            pltpu.make_async_copy(
                ksh_hbm.at[pl.ds(c0, wch)], wk2_ref.at[buf],
                ksem2.at[buf]).start()
        pltpu.make_async_copy(
            dout_hbm.at[pl.ds(c0, wch)], wf2_ref.at[buf], fsem2.at[buf],
        ).start()

    def start_dma1(pp, wi, buf):
        c0 = ws_ref[pp, t] // _LANE + wi * wch
        if not posmode:
            pltpu.make_async_copy(
                ksh_hbm.at[pl.ds(c0, wch)], wk1_ref.at[buf],
                ksem1.at[buf]).start()
        pltpu.make_async_copy(
            dout_hbm.at[pl.ds(c0, wch)], wf1_ref.at[buf], fsem1.at[buf],
        ).start()

    ftt = ft_ref[:].astype(comp_dtype)  # [128, c_sub] (rows = voxels)

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

        if not posmode:
            pltpu.make_async_copy(
                ksh_hbm.at[pl.ds(0, wch)], wk2_ref.at[buf],
                ksem2.at[buf]).wait()
        pltpu.make_async_copy(
            dout_hbm.at[pl.ds(0, wch)], wf2_ref.at[buf], fsem2.at[buf],
        ).wait()

        nw = nw_ref[p, t]
        g_sub = _round_up(len(grp), 8)
        if not posmode:
            plive = live & (nw > 0)
            prows = [probe_fn(kt, plive, coord, bidx, k)
                     .reshape(1, _LANE) for k in grp]
            if g_sub > len(grp):
                prows = prows + [jnp.full((g_sub - len(grp), _LANE),
                                          np.int32(-1), jnp.int32)]
            probes = (jnp.concatenate(prows, axis=0) if len(prows) > 1
                      else prows[0])

        @pl.when(nw > 1)
        def _(p=p):
            start_dma1(p, 1, 1)

        def window_pass(wk_ref_buf, wf_ref_buf, wi=None, p=p,
                        g_sub=g_sub, grp=grp):
            wf_chunks = [wf_ref_buf[j] for j in range(wch)]
            if posmode:
                outs = []
                for i, k in enumerate(grp):
                    gp1 = pos_ref[0, k:k + 1, :]
                    lp = gp1 - ws_ref[p, t]
                    if wi is not None:
                        lp = lp - wi * np.int32(window)
                    fnd = (gp1 >= 0) & (lp >= 0) & (lp < window)
                    pos1 = jnp.clip(lp, 0, window - 1)
                    outs.append(_gather_feat(wf_chunks, pos1, fnd, kg))
                return outs
            # broadcast key rows to the probe stack height: Mosaic's
            # take_along_axis only supports exact-2D matching shapes
            wk_chunks = [
                jnp.broadcast_to(wk_ref_buf[j, 0:1, :], (g_sub, _LANE))
                for j in range(wch)
            ]
            pos, found = _search_window(wk_chunks, probes, window)
            return [
                _gather_feat(wf_chunks, pos[i:i + 1], found[i:i + 1],
                             kg)
                for i in range(len(grp))
            ]

        outs = window_pass(wk2_ref[buf] if not posmode else None,
                           wf2_ref[buf])

        def extra(wi, accs, p=p):
            sb = jax.lax.rem(wi, 2)

            @pl.when(wi + 1 < nw)
            def _():
                start_dma1(p, wi + 1, jax.lax.rem(wi + 1, 2))
            if not posmode:
                pltpu.make_async_copy(
                    ksh_hbm.at[pl.ds(0, wch)], wk1_ref.at[0],
                    ksem1.at[sb]).wait()
            pltpu.make_async_copy(
                dout_hbm.at[pl.ds(0, wch)], wf1_ref.at[0], fsem1.at[sb],
            ).wait()
            eo = window_pass(wk1_ref[sb] if not posmode else None,
                             wf1_ref[sb], wi=wi)
            # at most one window matches per lane and misses are exact
            # zeros (valid for packed int32 too), so add combines windows
            return [a + e for a, e in zip(accs, eo)]

        outs = jax.lax.fori_loop(1, nw, extra, outs)

        for i, k in enumerate(grp):
            if packed:
                lo, hi = _unpack_pair(outs[i])  # [kg,128] f32 each
                r0 = k * k_sub
                gbuf_ref[r0:r0 + kg, :] = lo.astype(gbuf_ref.dtype)
                gbuf_ref[r0 + kg:r0 + k_sub, :] = hi.astype(
                    gbuf_ref.dtype)
            else:
                gbuf_ref[k * k_sub:(k + 1) * k_sub, :] = outs[i].astype(
                    gbuf_ref.dtype)

    # ONE fused wgrad GEMM for all kv offsets (was kv tiny matmuls —
    # each paid full MXU pipeline latency at narrow k_sub)
    dw_ref[:] += jnp.dot(
        gbuf_ref[:].astype(comp_dtype), ftt,
        preferred_element_type=jnp.float32,
    ).astype(dw_ref.dtype)

    din = jnp.dot(wdg_ref[:], gbuf_ref[:],
                  preferred_element_type=jnp.float32)
    din_ref[0] = din.astype(din_ref.dtype)


def _dg_bwd_call(
    tile_feats, tile_keys, dout_table, table_keys, weight_kv, plan_bwd,
    *, probe_fn, decode_dims, sentinel_tile, groups, window,
    interpret=False, pos=None,
):
    """Fused dgrad+wgrad.  Tiles run over the INPUT rows; gathers read
    the chunked ``dout_table`` through the reversed probes — or, when
    ``pos`` (the cached ``build_dg_pos(reverse=True)`` table on the bwd
    plan) is given, through the cached match rows with no search or key
    DMA at all.  Returns ``(din [N_in, C], dw [kv, C, K])``."""
    kv, c, k_ch = weight_kv.shape
    c_sub = _round_up(c, 8)
    k_sub = _round_up(k_ch, 8)
    tile = _LANE
    n_in = tile_keys.shape[0]
    n_tiles = -(-n_in // tile)
    np_t = n_tiles * tile
    _, n_pad = _n_pad_for(table_keys.shape[0], tile, window)
    n_pad = max(n_pad, np_t)
    n_pad = _round_up(n_pad, _LANE)

    comp_dtype = (jnp.float32 if dout_table.dtype == jnp.float32
                  else jnp.bfloat16)
    packed = comp_dtype == jnp.bfloat16
    if packed:
        kg = pack_pairs(k_ch)
        k_sub = 2 * kg
        perm_k = pair_perm(kg)
    else:
        kg = k_sub
        perm_k = np.arange(k_sub)
    inv_perm_k = np.argsort(perm_k)

    if packed:
        dout_ch = chunk_table_packed(dout_table, n_pad, kg)
    else:
        dout_ch = chunk_table(dout_table, n_pad, k_sub)
    feat_p = _pad_lanes(
        _pad_rows(tile_feats, np_t, 0), c_sub).astype(
            comp_dtype if packed else tile_feats.dtype)

    # dgrad weights: din_tile = Σ_k W[k] [C,K] @ gathered_k [K,128];
    # K axis permuted to the packed unpack order ([even | odd])
    wpad = jnp.pad(weight_kv, ((0, 0), (0, c_sub - c), (0, k_sub - k_ch)))
    wpad = wpad[:, :, perm_k]
    wdg = jnp.transpose(wpad, (1, 0, 2)).reshape(c_sub, kv * k_sub)

    wch = window // _LANE
    posmode = pos is not None
    dout_dtype = jnp.int32 if packed else jnp.float32
    if posmode:
        gs = _round_up(kv, 8)
        assert pos.shape == (n_tiles, gs, _LANE), (pos.shape, n_tiles)
        in_specs = [
            pl.BlockSpec((1, gs, _LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c_sub), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((2, wch, kg, _LANE), dout_dtype),
            pltpu.VMEM((2, wch, kg, _LANE), dout_dtype),
            pltpu.VMEM((kv * k_sub, _LANE), comp_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        operands = (plan_bwd.ws, plan_bwd.nw, pos, feat_p, dout_ch,
                    wdg.astype(comp_dtype))
    else:
        ksh = chunk_keys(table_keys, n_pad, sentinel_tile)
        tile_keys_p = _pad_rows(tile_keys, np_t, sentinel_tile)
        keys_tiles = tile_keys_p.reshape(n_tiles, 1, tile)
        in_specs = [
            pl.BlockSpec((1, 1, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c_sub), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((2, wch, _KROWS, _LANE), jnp.int32),
            pltpu.VMEM((2, wch, kg, _LANE), dout_dtype),
            pltpu.VMEM((2, wch, _KROWS, _LANE), jnp.int32),
            pltpu.VMEM((2, wch, kg, _LANE), dout_dtype),
            pltpu.VMEM((kv * k_sub, _LANE), comp_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        operands = (plan_bwd.ws, plan_bwd.nw, keys_tiles, feat_p, ksh,
                    dout_ch, wdg.astype(comp_dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, c_sub, _LANE), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kv * k_sub, c_sub), lambda t, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _dg_bwd_kernel, kv, c_sub, k_sub, probe_fn,
        tuple(decode_dims), sentinel_tile, groups, n_tiles, window,
        comp_dtype, packed, posmode,
    )
    din, dwt = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, c_sub, _LANE),
                                 tile_feats.dtype),
            jax.ShapeDtypeStruct((kv * k_sub, c_sub), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    din2 = unchunk_out(din, n_in, c)
    # undo the packed K permutation; dwt rows are [kv, k_sub(perm)]
    dw = jnp.transpose(
        dwt.reshape(kv, k_sub, c_sub)[:, inv_perm_k, :],
        (0, 2, 1))[:, :c, :k_ch]  # [kv, C, K]
    return din2, dw


# ---------------------------------------------------------------------------
# custom-vjp entry points
# ---------------------------------------------------------------------------

class _DGGeom(NamedTuple):
    deltas_key: tuple
    disp: tuple
    dims: tuple
    sentinel: int
    window: int
    groups: tuple
    interpret: bool
    rows: int = 1


def _geom_deltas(geom: "_DGGeom"):
    ndim = len(geom.dims)
    kv = len(geom.deltas_key)
    return (np.asarray(geom.deltas_key, np.int32),
            np.asarray(geom.disp, np.int32).reshape(kv, ndim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _dg_conv(features, keys, weight_kv, plans, geom: _DGGeom):
    plan_fwd, _ = plans
    kv = len(geom.deltas_key)
    gs = _round_up(kv, 8)
    deltas, disp = _geom_deltas(geom)
    vprobe = functools.partial(_vec_shift_probes, dims=geom.dims)
    return _dg_conv_call(
        features, keys, keys, weight_kv, plan_fwd,
        make_ptab(deltas, disp, gs, rows=geom.rows),
        vprobe_builder=vprobe,
        decode_dims=geom.dims, sentinel_tile=geom.sentinel,
        groups=geom.groups, window=geom.window,
        out_dtype=features.dtype, rows=geom.rows,
        interpret=geom.interpret,
    )


def _dg_conv_fwd(features, keys, weight_kv, plans, geom):
    out = _dg_conv(features, keys, weight_kv, plans, geom)
    return out, (features, keys, weight_kv, plans)


def _dg_conv_bwd(geom, res, g):
    features, keys, weight_kv, plans = res
    _, plan_bwd = plans
    g = g.astype(features.dtype)
    deltas, disp = _geom_deltas(geom)
    rev = (-deltas, -disp)
    din, dw_kv = _dg_bwd_call(
        features, keys, g, keys, weight_kv, plan_bwd,
        probe_fn=_probe_shift_fn(rev, geom.dims),
        decode_dims=geom.dims, sentinel_tile=geom.sentinel,
        groups=geom.groups, window=geom.window,
        interpret=geom.interpret,
    )
    zf = jax.dtypes.float0
    return (din.astype(features.dtype), np.zeros(keys.shape, dtype=zf),
            dw_kv.astype(weight_kv.dtype),
            jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), dtype=zf), plans))


_dg_conv.defvjp(_dg_conv_fwd, _dg_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dg_conv_p(features, keys, weight_kv, plans, pos, geom: _DGGeom):
    """Posmode subm conv: forward consumes the cached match rows
    (no in-kernel search); backward is the standard fused
    dgrad+wgrad pass."""
    plan_fwd, _ = plans
    return _dg_conv_call(
        features, keys, keys, weight_kv, plan_fwd, None,
        vprobe_builder=None,
        decode_dims=geom.dims, sentinel_tile=geom.sentinel,
        groups=geom.groups, window=geom.window,
        out_dtype=features.dtype, rows=geom.rows,
        interpret=geom.interpret, pos=pos,
    )


def _dg_conv_p_fwd(features, keys, weight_kv, plans, pos, geom):
    out = _dg_conv_p(features, keys, weight_kv, plans, pos, geom)
    # cache the REVERSED positions for the fused dgrad+wgrad pass.
    # Built here (not in the module) so pure inference never pays for
    # it; identical builds across a stage's layers are deduplicated by
    # XLA CSE (same operands, same pure kernel).
    deltas, disp = _geom_deltas(geom)
    pos_bwd = _build_dg_pos(
        keys, plans[1], -deltas, -disp, geom.groups, geom.dims,
        geom.sentinel, geom.window, rows=1, interpret=geom.interpret)
    return out, (features, keys, weight_kv, plans, pos.shape, pos_bwd)


def _dg_conv_p_bwd(geom, res, g):
    features, keys, weight_kv, plans, pos_shape, pos_bwd = res
    g = g.astype(features.dtype)
    deltas, disp = _geom_deltas(geom)
    rev = (-deltas, -disp)
    _, plan_bwd = plans
    din, dw_kv = _dg_bwd_call(
        features, keys, g, keys, weight_kv, plan_bwd,
        probe_fn=_probe_shift_fn(rev, geom.dims),
        decode_dims=geom.dims, sentinel_tile=geom.sentinel,
        groups=geom.groups, window=geom.window,
        interpret=geom.interpret, pos=pos_bwd,
    )
    zf = jax.dtypes.float0
    return (din.astype(features.dtype),
            np.zeros(keys.shape, dtype=zf),
            dw_kv.astype(weight_kv.dtype),
            jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), dtype=zf), plans),
            np.zeros(pos_shape, dtype=zf))


_dg_conv_p.defvjp(_dg_conv_p_fwd, _dg_conv_p_bwd)


def dg_subm_conv(
    features: jax.Array,   # [N, C]
    keys: jax.Array,       # [N] int32 sorted linearized keys
    weight: jax.Array,     # KRSC [K, *ksize, C]
    *,
    spatial_shape: Sequence[int],
    batch_size: int,
    dilation: Sequence[int],
    window: int = 384,
    rows_per_tile: int = 1,
    plans: Optional[Tuple[SKPlan, SKPlan]] = None,
    pos: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Dynamic-gather subm conv on a key-sorted tensor → ``[N, K]``.

    Requires statically-sorted input (``SparseConvTensor.keys_sorted``);
    no dynamic fallback branch exists.  Differentiable with a fused
    dgrad+wgrad backward.  ``rows_per_tile`` (R) processes R 128-lane
    rows per grid step over shared plane windows — per-voxel search and
    gather cost scales with window/(R·128), amortizing the kernel reach
    (the narrow-channel lever; the fwd plan is built at tile R·128, the
    bwd plan stays at 128)."""
    ksize = tuple(int(k) for k in weight.shape[1:-1])
    dilation = tuple(int(d) for d in dilation)
    k_out = weight.shape[0]
    c = weight.shape[-1]
    kv = int(np.prod(ksize))
    weight_kv = jnp.transpose(
        weight.reshape(k_out, kv, c), (1, 2, 0))  # [kv, C, K]

    deltas_np, disp_np = subm_key_deltas(ksize, dilation, spatial_shape)
    # DG searches the center offset like any other (no identity
    # shortcut): all kv offsets ride the ONE stacked binary search, so
    # excluding the center would save nothing and complicate the plans.
    groups = sk_groups(ksize, include_center=True)
    dims = tuple(int(s) for s in spatial_shape)
    sentinel = int(np.prod(dims)) * int(batch_size)
    n = keys.shape[0]
    R = int(rows_per_tile)

    if plans is None:
        np_t, n_pad = _n_pad_for(n, R * _LANE, window)
        keys_p = _pad_rows(keys, np_t, sentinel)
        plans = build_sk_plans(
            keys_p, sentinel, deltas_np, groups, tile=R * _LANE,
            window=window, n_pad=n_pad, align=_LANE,
        )
        if R > 1:
            # the fused backward tiles 128 rows — its plan keeps tile 128
            np_t1, n_pad1 = _n_pad_for(n, _LANE, window)
            keys_p1 = _pad_rows(keys, np_t1, sentinel)
            _, plan_bwd = build_sk_plans(
                keys_p1, sentinel, deltas_np, groups, tile=_LANE,
                window=window, n_pad=n_pad1, align=_LANE,
            )
            plans = (plans[0], plan_bwd)

    geom = _DGGeom(
        deltas_key=tuple(int(d) for d in deltas_np),
        disp=tuple(int(v) for v in disp_np.reshape(-1)),
        dims=dims, sentinel=sentinel, window=window, groups=groups,
        interpret=interpret, rows=R,
    )
    if pos is not None:
        return _dg_conv_p(features, keys, weight_kv, plans, pos, geom)
    return _dg_conv(features, keys, weight_kv, plans, geom)


# ---------------------------------------------------------------------------
# regular / inverse convs
# ---------------------------------------------------------------------------

class _DGRegGeom(NamedTuple):
    stride: tuple
    disp: tuple
    in_dims: tuple
    out_dims: tuple
    sent_in: int
    sent_out: int
    window: int
    groups: tuple
    inverse: bool
    interpret: bool
    rows: int = 1


def _reg_disp(geom: _DGRegGeom):
    ndim = len(geom.in_dims)
    return np.asarray(geom.disp, np.int32).reshape(-1, ndim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dg_reg_conv(features, in_keys, out_keys, weight_kv, plans,
                 geom: _DGRegGeom):
    disp = _reg_disp(geom)
    plan_io, plan_oi = plans
    kv = disp.shape[0]
    gs = _round_up(kv, 8)
    if not geom.inverse:
        vprobe = functools.partial(
            _vec_affine_probes, stride=geom.stride,
            table_dims=geom.in_dims)
        return _dg_conv_call(
            features, in_keys, out_keys, weight_kv, plan_io,
            make_ptab(None, disp, gs, rows=geom.rows),
            vprobe_builder=vprobe,
            decode_dims=geom.out_dims, sentinel_tile=geom.sent_out,
            groups=geom.groups, window=geom.window,
            out_dtype=features.dtype, rows=geom.rows,
            interpret=geom.interpret,
        )
    ptab = make_ptab(None, disp, gs)
    vprobe = functools.partial(
        _vec_divide_probes, stride=geom.stride,
        table_dims=geom.out_dims)
    return _dg_conv_call(
        features, out_keys, in_keys, weight_kv, plan_oi, ptab,
        vprobe_builder=vprobe,
        decode_dims=geom.in_dims, sentinel_tile=geom.sent_in,
        groups=geom.groups, window=geom.window,
        out_dtype=features.dtype, interpret=geom.interpret,
    )


def _dg_reg_conv_fwd(features, in_keys, out_keys, weight_kv, plans, geom):
    out = _dg_reg_conv(features, in_keys, out_keys, weight_kv, plans,
                       geom)
    return out, (features, in_keys, out_keys, weight_kv, plans)


def _dg_reg_conv_bwd(geom, res, g):
    features, in_keys, out_keys, weight_kv, plans = res
    plan_io, plan_oi = plans
    g = g.astype(features.dtype)
    disp = _reg_disp(geom)
    if not geom.inverse:
        din, dw_kv = _dg_bwd_call(
            features, in_keys, g, out_keys, weight_kv, plan_oi,
            probe_fn=_probe_divide_fn(geom.stride, disp, geom.out_dims),
            decode_dims=geom.in_dims, sentinel_tile=geom.sent_in,
            groups=geom.groups, window=geom.window,
            interpret=geom.interpret,
        )
    else:
        din, dw_kv = _dg_bwd_call(
            features, out_keys, g, in_keys, weight_kv, plan_io,
            probe_fn=_probe_affine_fn(geom.stride, disp, geom.in_dims),
            decode_dims=geom.out_dims, sentinel_tile=geom.sent_out,
            groups=geom.groups, window=geom.window,
            interpret=geom.interpret,
        )
    zf = jax.dtypes.float0
    return (din.astype(features.dtype),
            np.zeros(in_keys.shape, dtype=zf),
            np.zeros(out_keys.shape, dtype=zf),
            dw_kv.astype(weight_kv.dtype),
            jax.tree_util.tree_map(
                lambda x: np.zeros(np.shape(x), dtype=zf), plans))


_dg_reg_conv.defvjp(_dg_reg_conv_fwd, _dg_reg_conv_bwd)


def dg_regular_conv(
    features: jax.Array,
    in_keys: jax.Array,
    out_keys: jax.Array,
    weight: jax.Array,      # KRSC
    *,
    in_shape: Sequence[int],
    out_shape: Sequence[int],
    batch_size: int,
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
    inverse: bool = False,
    window: int = 384,
    rows_per_tile: int = 1,
    plans=None,
    interpret: bool = False,
):
    """Dynamic-gather regular (strided) / inverse sparse conv on sorted
    keys.  Same calling convention as ``sk_regular_conv``; plans are
    built with 128-aligned window starts (reusable only with other DG
    layers).  ``rows_per_tile`` applies to the non-inverse forward
    (plan_io builds at tile R·128; plan_oi — the backward and any paired
    inverse — keeps 128).  Returns ``(out_features, plans, geom)``."""
    from .sorted_conv import _SKRegGeom, build_sk_reg_plans

    ksize = tuple(int(k) for k in weight.shape[1:-1])
    k_out = weight.shape[0]
    c = weight.shape[-1]
    kv = int(np.prod(ksize))
    offs = C.kernel_offsets(ksize)
    disp = (offs * np.asarray([int(d) for d in dilation])
            - np.asarray([int(p) for p in padding])).astype(np.int32)
    R = 1 if inverse else int(rows_per_tile)
    geom = _DGRegGeom(
        stride=tuple(int(v) for v in stride),
        disp=tuple(int(v) for v in disp.reshape(-1)),
        in_dims=tuple(int(v) for v in in_shape),
        out_dims=tuple(int(v) for v in out_shape),
        sent_in=int(np.prod([int(v) for v in in_shape]))
        * int(batch_size),
        sent_out=int(np.prod([int(v) for v in out_shape]))
        * int(batch_size),
        window=window, groups=sk_groups(ksize, include_center=True),
        inverse=bool(inverse), interpret=bool(interpret), rows=R,
    )
    weight_kv = jnp.transpose(
        weight.reshape(k_out, kv, c), (1, 2, 0))  # [kv, C, K]
    if plans is None:
        sk_geom = _SKRegGeom(
            stride=geom.stride, disp=geom.disp, in_dims=geom.in_dims,
            out_dims=geom.out_dims, sent_in=geom.sent_in,
            sent_out=geom.sent_out, tile=_LANE, window=window,
            groups=geom.groups, inverse=geom.inverse,
            interpret=geom.interpret,
        )
        plans = build_sk_reg_plans(in_keys, out_keys, sk_geom,
                                   align=_LANE, tile_io=R * _LANE)
    return _dg_reg_conv(features, in_keys, out_keys, weight_kv, plans,
                        geom), plans, geom


class DGData:
    """Cached DG state for an ``indice_key`` stage: sorted keys, the
    (fwd, bwd) 128-aligned window plans, and the cached match-position
    table (``build_dg_pos``) every later layer of the stage reuses
    (pytree; mirrors ``SKData``)."""

    def __init__(self, keys, plans, *, ksize, dilation, spatial_shape,
                 window, pos=None):
        self.keys = keys
        self.plans = plans
        self.pos = pos
        self.ksize = tuple(ksize)
        self.dilation = tuple(dilation)
        self.spatial_shape = tuple(spatial_shape)
        self.window = int(window)

    @staticmethod
    def cache_key(indice_key, ksize, dilation, window, rows=1) -> str:
        return (f"__dg__{indice_key}/{tuple(ksize)}/{tuple(dilation)}"
                f"/w{window}/r{rows}")


def _dgdata_flatten(obj):
    return ((obj.keys, obj.plans, obj.pos),
            (obj.ksize, obj.dilation, obj.spatial_shape, obj.window))


def _dgdata_unflatten(aux, children):
    obj = object.__new__(DGData)
    obj.keys, obj.plans, obj.pos = children
    obj.ksize, obj.dilation, obj.spatial_shape, obj.window = aux
    return obj


jax.tree_util.register_pytree_node(DGData, _dgdata_flatten,
                                   _dgdata_unflatten)
