"""Block-dense ("brick") execution path — the TPU answer to the
reference's masked implicit GEMM (``spconv/csrc/sparse/convops.py:1150``).

The reference keeps its MMA units busy by sorting outputs by kv-bitmask so
GEMM tiles see coherent filter subsets.  On TPU the analogous problem is
the XLA row-gather wall (~0.5–1.5 G rows/s regardless of locality — see
DESIGN_NOTES.md): a gather-per-offset conv pays ``kv·N`` gathered rows per
layer.  Instead of fighting the gather, this module changes the data
layout: active voxels are packed once per stage into occupied *bricks*
(small dense boxes, e.g. 1×2×2 or 2×2×2).  A submanifold conv then becomes

* a 3-pass face-neighbor halo exchange — ``2·ndim`` gathers of *wide*
  contiguous brick rows (DMA-bound at HBM speeds, not row-rate-bound), and
* one dense ``lax.conv_general_dilated`` over ``[NB, *bshape+2p, C]`` —
  pure MXU work, with inactive slots masked after (zeros in ⇒ masking out
  restores exact submanifold semantics).

Point clouds are locally dense (surfaces), so the slot/active overhead is
small (measured 2.6–4.3× for 1×2×2 / 2×2×2 bricks on the reference's
120k-voxel scan) while the MXU has ~200× FLOP headroom over the sparse
op's arithmetic.  Backward falls out of XLA's native conv dgrad/wgrad.

A brick-packed tensor is still a perfectly ordinary SparseConvTensor:
``features`` is ``[NB·bvol, C]`` and ``indices`` marks inactive slots
with −1, so every feature-wise op (masked BN, ReLU, bias…) works
unchanged, and any op without a brick path simply falls back to the
native gather algorithm on the same tensor.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SparseConvTensor, _PytreeRecord
from . import coords as C
from .rulebook import _join_lookup

__all__ = [
    "BrickMeta",
    "brick_key",
    "build_bricks",
    "pack_tensor",
    "brick_subm_conv",
    "brick_downsample_conv",
    "brick_pool",
    "default_brick_shape",
]


def default_brick_shape(ndim: int) -> Tuple[int, ...]:
    """Measured sweet spot on LiDAR scans: thin in the leading (z) axis."""
    if ndim == 3:
        return (2, 2, 2)
    if ndim == 2:
        return (4, 4)
    if ndim == 1:
        return (8,)
    raise ValueError(f"brick algo supports ndim 1-3, got {ndim}")


def brick_key(brick_shape: Sequence[int], spatial_shape: Sequence[int]) -> str:
    """indice_dict key under which a stage's BrickMeta is cached."""
    bs = "x".join(str(int(b)) for b in brick_shape)
    ss = "x".join(str(int(s)) for s in spatial_shape)
    return f"__bricks_{bs}_{ss}__"


class BrickMeta(_PytreeRecord):
    """Brick decomposition of an active-site set.

    * ``brick_coords``: ``[NB, ndim+1]`` int32 — batch + brick-grid coords
      of each occupied brick (−1 pad rows).
    * ``nbr``: ``[3^ndim, NB]`` int32 — neighbor brick row per direction in
      ``kernel_offsets((3,)*ndim)`` order (displacements −1/0/+1 per axis;
      the center entry is the identity), −1 when absent.  All 26 diagonal
      neighbors are kept because the brick set is sparse: a face-pass halo
      exchange would silently drop diagonal contributions whenever the
      intermediate face brick is unoccupied.
    * ``num_bricks``: device scalar.

    Static: ``brick_shape``, ``grid`` (brick-grid dims), ``spatial_shape``,
    ``batch_size``, ``nb`` (static brick-row bound).
    """

    _leaf_fields = ("brick_coords", "nbr", "num_bricks")
    _static_fields = ("brick_shape", "grid", "spatial_shape", "batch_size", "nb")

    def __init__(self, brick_coords, nbr, num_bricks, *, brick_shape, grid,
                 spatial_shape, batch_size, nb):
        self.brick_coords = brick_coords
        self.nbr = nbr
        self.num_bricks = num_bricks
        self.brick_shape = tuple(int(b) for b in brick_shape)
        self.grid = tuple(int(g) for g in grid)
        self.spatial_shape = tuple(int(s) for s in spatial_shape)
        self.batch_size = int(batch_size)
        self.nb = int(nb)

    @property
    def bvol(self) -> int:
        return int(np.prod(self.brick_shape))

    @property
    def num_slots(self) -> int:
        return self.nb * self.bvol

    def slot_indices(self, active: jax.Array) -> jax.Array:
        """``[NB·bvol, ndim+1]`` full coordinates per slot (−1 where the
        slot is inactive).  Derived from brick coords + static offsets."""
        ndim = len(self.brick_shape)
        offs = jnp.asarray(C.kernel_offsets(self.brick_shape))  # [bvol, ndim]
        bshape = jnp.asarray(self.brick_shape, jnp.int32)
        origin = self.brick_coords[:, None, 1:] * bshape  # [NB, 1, ndim]
        xyz = origin + offs[None, :, :]  # [NB, bvol, ndim]
        b = jnp.broadcast_to(
            self.brick_coords[:, None, :1], (self.nb, self.bvol, 1)
        )
        inds = jnp.concatenate([b, xyz], axis=-1).reshape(
            self.num_slots, ndim + 1
        )
        return jnp.where(active[:, None], inds, -1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("spatial_shape", "batch_size", "brick_shape", "nb_bound"),
)
def build_bricks(
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    brick_shape: Tuple[int, ...],
    nb_bound: int,
) -> Tuple[BrickMeta, jax.Array]:
    """Decompose an active-site set into occupied bricks.

    Returns ``(meta, voxel_of_slot)`` where ``voxel_of_slot[NB·bvol]``
    holds the input row occupying each slot (−1 empty).  One sort +
    one batched neighbor join; bricks are ordered by linearized brick
    coordinate, slots brick-major/row-major — so packed tensors keep the
    key-sorted layout the rest of the framework expects.

    Bricks beyond ``nb_bound`` are dropped deterministically (largest
    coordinates first), mirroring the rulebook's bounded-buffer contract.
    """
    n = indices.shape[0]
    ndim = indices.shape[1] - 1
    brick_shape = tuple(int(b) for b in brick_shape)
    assert len(brick_shape) == ndim
    bvol = int(np.prod(brick_shape))
    grid = tuple(
        -(-int(s) // b) for s, b in zip(spatial_shape, brick_shape)
    )
    bshape_arr = jnp.asarray(brick_shape, jnp.int32)

    valid = indices[:, 0] >= 0
    bc = jnp.where(valid[:, None], indices[:, 1:] // bshape_arr, -1)
    local = indices[:, 1:] - bc * bshape_arr  # garbage on invalid rows; masked
    pseudo = jnp.concatenate([indices[:, :1], bc], axis=-1)

    meta, row_flat = _dedup_coords_to_meta(
        pseudo, valid, grid, spatial_shape, batch_size, brick_shape, nb_bound
    )
    in_brick = valid & (row_flat >= 0)

    # slot occupancy: voxel_of_slot via conflict-free scatter
    lflat = jnp.zeros((n,), jnp.int32)
    for i, b in enumerate(brick_shape):
        lflat = lflat * b + local[:, i]
    slot = jnp.where(in_brick, row_flat * bvol + lflat, nb_bound * bvol)
    voxel_of_slot = jnp.full((nb_bound * bvol,), -1, jnp.int32)
    voxel_of_slot = voxel_of_slot.at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return meta, voxel_of_slot


def _dedup_coords_to_meta(
    pseudo: jax.Array,  # [M, ndim+1] brick-grid coords (batch first)
    valid: jax.Array,  # [M]
    grid,
    spatial_shape,
    batch_size: int,
    brick_shape,
    nb_bound: int,
) -> Tuple[BrickMeta, jax.Array]:
    """Dedup brick-coordinate candidates into a BrickMeta (sorted brick
    table + full 3^ndim neighbor join).  Returns ``(meta, row_of_item)``
    with ``row_of_item[i]`` = the brick row of candidate ``i`` (−1 when
    invalid or beyond ``nb_bound``)."""
    m = pseudo.shape[0]
    ndim = pseudo.shape[1] - 1
    bkeys, bsent = C.linearize(pseudo, grid, batch_size, valid)

    sk, order = C.sort_with_ids(bkeys)
    not_sent = ~C.is_sentinel(sk, bsent)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_bricks = jnp.minimum(jnp.sum(is_first.astype(jnp.int32)), nb_bound)

    # brick row per candidate — unsort via a second sort (cheaper than an
    # element scatter, tools/probe_sort2.py)
    _, row_flat = jax.lax.sort((order, uniq_pos), num_keys=1,
                               is_stable=False)
    row_flat = jnp.where(valid & (row_flat < nb_bound), row_flat, -1)

    # unique brick coords buffer (ascending key order)
    uniq_scatter = jnp.where(
        is_first & (uniq_pos < nb_bound), uniq_pos, nb_bound
    )
    bkeys_buf = C.full_sentinel(nb_bound, bsent).astype(
        sk.dtype if sk.ndim == 1 else jnp.int32
    )
    bkeys_buf = bkeys_buf.at[uniq_scatter].set(sk, mode="drop")
    brick_valid = ~C.is_sentinel(bkeys_buf, bsent)
    brick_coords = C.delinearize(bkeys_buf, grid, brick_valid)

    # all 3^ndim-1 neighbors (center = identity), one batched sort-join
    ndirs = 3 ** ndim
    disp = C.kernel_offsets((3,) * ndim) - 1  # [ndirs, ndim], −1/0/+1
    d = jnp.asarray(disp)
    nc = brick_coords[None, :, 1:] + d[:, None, :]  # [ndirs, NB, ndim]
    grid_arr = jnp.asarray(grid, jnp.int32)
    nb_valid = (
        jnp.all((nc >= 0) & (nc < grid_arr), axis=-1) & brick_valid[None, :]
    )
    bcol = jnp.broadcast_to(
        brick_coords[None, :, :1], (ndirs, nb_bound, 1)
    )
    nfull = jnp.concatenate([bcol, nc], axis=-1).reshape(
        ndirs * nb_bound, ndim + 1
    )
    nkeys, _ = C.linearize(nfull, grid, batch_size, nb_valid.reshape(-1))
    # pad rows of bkeys_buf already hold the sentinel → valid table
    nbr = _join_lookup(bkeys_buf, nkeys, bsent).reshape(ndirs, nb_bound)
    nbr = jnp.where(nb_valid, nbr, -1)

    meta = BrickMeta(
        brick_coords, nbr, num_bricks,
        brick_shape=tuple(int(b) for b in brick_shape),
        grid=tuple(int(g) for g in grid),
        spatial_shape=tuple(int(s) for s in spatial_shape),
        batch_size=batch_size, nb=nb_bound,
    )
    return meta, row_flat


def pack_tensor(
    x: SparseConvTensor,
    brick_shape: Optional[Sequence[int]] = None,
    nb_bound: Optional[int] = None,
) -> SparseConvTensor:
    """Repack a sparse tensor into brick-slot layout.

    The result is an equivalent SparseConvTensor (same active sites &
    features, more padding rows) whose rows are brick slots; its BrickMeta
    is cached in ``indice_dict`` for the stage's conv/pool layers.
    """
    ndim = x.ndim
    if brick_shape is None:
        brick_shape = default_brick_shape(ndim)
    brick_shape = tuple(int(b) for b in brick_shape)
    if nb_bound is None:
        # worst case: one brick per active row; buffers stay lane-aligned
        nb_bound = max(64, -(-x.indices.shape[0] // 64) * 64)
    meta, vos = build_bricks(
        x.indices,
        spatial_shape=x.spatial_shape,
        batch_size=x.batch_size,
        brick_shape=brick_shape,
        nb_bound=nb_bound,
    )
    active = vos >= 0
    feats = jnp.where(
        active[:, None],
        jnp.take(x.features, jnp.maximum(vos, 0), axis=0),
        0,
    ).astype(x.features.dtype)
    inds = meta.slot_indices(active)
    out = SparseConvTensor(
        feats, inds, x.spatial_shape, x.batch_size,
        num_voxels=x.num_voxels,
        indice_dict=dict(x.indice_dict),
        benchmark=x.benchmark,
    )
    out.indice_dict[brick_key(brick_shape, x.spatial_shape)] = meta
    return out


def find_brick_meta(x: SparseConvTensor) -> Optional[BrickMeta]:
    """The BrickMeta matching this tensor's layout, if it is brick-packed."""
    for key, v in x.indice_dict.items():
        if (
            isinstance(v, BrickMeta)
            and v.spatial_shape == x.spatial_shape
            and v.num_slots == x.features.shape[0]
        ):
            return v
    return None


def _conv_dn(ndim: int):
    spatial = "DHW"[3 - ndim:]
    return jax.lax.conv_dimension_numbers(
        (1, *([1] * ndim), 1),
        (*([1] * ndim), 1, 1),
        (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"),
    )


def _halo(x: jax.Array, meta: BrickMeta, pad: Sequence[int]) -> jax.Array:
    """One-pass 3^ndim-direction halo assembly.

    ``x``: ``[NB, *bshape, C]`` → ``[NB, *(bshape+2·pad), C]``.  The haloed
    volume is a concat tree over per-direction slabs, each a static slice
    of the gathered neighbor brick in that direction.  A multi-pass
    face-exchange would be cheaper but is *wrong* on sparse brick sets
    (diagonal content is lost when the intermediate face brick is empty),
    so every direction gathers directly.  Missing neighbors (grid edge /
    unoccupied) contribute zeros — exactly the sparse-conv semantics for
    absent sites.
    """
    ndim = len(meta.brick_shape)
    bshape = meta.brick_shape
    pad = [int(p) for p in pad]
    for ax in range(ndim):
        assert pad[ax] <= bshape[ax], (
            f"halo pad {pad[ax]} exceeds brick dim {bshape[ax]}"
        )
    disp = C.kernel_offsets((3,) * ndim) - 1  # [ndirs, ndim], build order
    # gather on the flattened [NB, bvol·C] view: one contiguous row per
    # brick.  A take on the 5-D view lowers to a multi-dim-slice gather,
    # which is catastrophically slow on TPU (measured: 35 ms vs ~3 ms for
    # the identical bytes as plain row gathers — see DESIGN_NOTES.md).
    x2 = x.reshape(x.shape[0], -1)

    def slab(d_idx: int, d: np.ndarray) -> Optional[jax.Array]:
        """Neighbor slab for direction d, or None when pad==0 on an axis
        with d != 0 (that direction contributes nothing)."""
        if any(pad[a] == 0 and d[a] != 0 for a in range(ndim)):
            return None
        ids = meta.nbr[d_idx]
        if np.all(d == 0):
            src = x
        else:
            src = jnp.take(x2, jnp.maximum(ids, 0), axis=0).reshape(x.shape)
        for a in range(ndim):
            if d[a] == -1:  # lower halo ← top slab of the −1 neighbor
                src = jax.lax.slice_in_dim(
                    src, bshape[a] - pad[a], bshape[a], axis=1 + a
                )
            elif d[a] == 1:  # upper halo ← bottom slab of the +1 neighbor
                src = jax.lax.slice_in_dim(src, 0, pad[a], axis=1 + a)
        if not np.all(d == 0):
            # mask absent neighbors after slicing (cheaper than masking
            # the full gathered brick)
            src = src * (ids >= 0).reshape(
                (-1,) + (1,) * (x.ndim - 1)
            ).astype(x.dtype)
        return src

    # concat tree: innermost axis varies fastest in kernel_offsets order
    pieces = [slab(i, d) for i, d in enumerate(disp)]
    for a in reversed(range(ndim)):
        grouped = []
        for i in range(0, len(pieces), 3):
            parts = [p for p in pieces[i:i + 3] if p is not None]
            grouped.append(
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=1 + a)
            )
        pieces = grouped
    assert len(pieces) == 1
    return pieces[0]


def _axis_pieces(bs_in: int, hull: int, pad: int):
    """Which input bricks (relative index ``e``) cover the hull range
    ``[−pad, −pad+hull)`` along one axis, and the slice of each.
    Returns ``[(e, lo, hi)]`` with ``lo:hi`` the in-brick slice."""
    out = []
    e_lo = -((pad + bs_in - 1) // bs_in) if pad > 0 else 0
    e_hi = (hull - 1 - pad) // bs_in
    for e in range(e_lo, e_hi + 1):
        lo = max(-pad - e * bs_in, 0)
        hi = min(-pad + hull - e * bs_in, bs_in)
        if hi > lo:
            out.append((e, lo, hi))
    return out


def _assemble_hull(
    x2z: jax.Array,  # [NB_in + 1, bvol_in·C] — zero row appended at NB_in
    ids: jax.Array,  # [npieces, NB_out] — input brick row per piece (clamped)
    pieces,  # list of per-axis (e, lo, hi) combos, x-fastest order
    axis_pieces,  # per-axis piece lists (for the concat tree arity)
    bshape_in: Sequence[int],
    c: int,
    center_src: Optional[jax.Array] = None,
    center_idx: Optional[int] = None,
) -> jax.Array:
    """Gather + slice + concat-tree the hull volume ``[NB_out, *hull, C]``.

    Gathers run on the flattened 2-D brick-row view (multi-dim-slice
    gathers are catastrophic on TPU); missing bricks hit the appended zero
    row.  ``center_src`` short-circuits the identity piece for the subm
    case (no gather for a brick's own content)."""
    ndim = len(bshape_in)
    nb_out = ids.shape[1]
    chunks = []
    for pi, combo in enumerate(pieces):
        if center_idx is not None and pi == center_idx:
            src = center_src
        else:
            src = jnp.take(x2z, ids[pi], axis=0).reshape(
                nb_out, *bshape_in, c
            )
        for a, (_, lo, hi) in enumerate(combo):
            if (lo, hi) != (0, bshape_in[a]):
                src = jax.lax.slice_in_dim(src, lo, hi, axis=1 + a)
        chunks.append(src)
    for a in reversed(range(ndim)):
        arity = len(axis_pieces[a])
        chunks = [
            chunks[i] if arity == 1
            else jnp.concatenate(chunks[i:i + arity], axis=1 + a)
            for i in range(0, len(chunks), arity)
        ]
    assert len(chunks) == 1
    return chunks[0]


def _hull_dims(brick_shape, ksize, stride, dilation):
    """Input-hull size per axis: ``s·(b−1) + (k−1)·d + 1``."""
    return [
        int(s) * (int(b) - 1) + (int(k) - 1) * int(d) + 1
        for b, k, s, d in zip(brick_shape, ksize, stride, dilation)
    ]


def _expand_weight(
    weight: jax.Array,  # KRSC [K, *ksize, C]
    brick_shape: Sequence[int],
    dilation: Sequence[int],
    stride: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Unroll the conv kernel into one hull→brick GEMM matrix.

    ``W_exp[(h, c), (s, k)] = W[k, t, c]`` where hull site ``h`` equals
    ``stride·slot + tap·dilation`` — so the whole brick conv becomes
    ``x_hull [NB, hvol·C] @ W_exp [hvol·C, bvol·K]``, one MXU-shaped GEMM
    instead of a tiny-spatial conv that XLA lowers poorly (measured 36–63
    ms/layer vs ~1–3 ms for the GEMM at stage-0).  The hull/kv FLOP
    overhead (e.g. 48/27 for 1×2×2 bricks) is paid from the MXU's ~200×
    headroom over the sparse op's arithmetic; for stride-2 downsamples the
    overhead is exactly 1 (windows tile the hull).
    """
    ndim = len(brick_shape)
    ksize = weight.shape[1:-1]
    k_out = weight.shape[0]
    c = weight.shape[-1]
    kv = int(np.prod(ksize))
    bvol = int(np.prod(brick_shape))
    if stride is None:
        stride = (1,) * ndim
    hull = _hull_dims(brick_shape, ksize, stride, dilation)
    hvol = int(np.prod(hull))

    slots = C.kernel_offsets(brick_shape)  # [bvol, ndim]
    taps = C.kernel_offsets(ksize)  # [kv, ndim]
    dil = np.asarray([int(d) for d in dilation])
    st = np.asarray([int(s) for s in stride])
    # hull position of (slot, tap): stride·s + t·d
    hpos = st * slots[:, None, :] + taps[None, :, :] * dil  # [bvol, kv, ndim]
    hflat = np.zeros((bvol, kv), np.int64)
    for a in range(ndim):
        hflat = hflat * hull[a] + hpos[..., a]
    s_idx = np.broadcast_to(np.arange(bvol)[:, None], (bvol, kv))

    w_taps = jnp.transpose(
        weight.reshape(k_out, kv, c), (1, 2, 0)
    )  # [kv, C, K]
    w_exp = jnp.zeros((hvol, c, bvol, k_out), w_taps.dtype)
    t_idx = np.broadcast_to(np.arange(kv)[None, :], (bvol, kv))
    w_exp = w_exp.at[hflat.reshape(-1), :, s_idx.reshape(-1), :].set(
        w_taps[t_idx.reshape(-1)]
    )
    return w_exp.reshape(hvol * c, bvol * k_out)


def brick_subm_conv(
    features: jax.Array,
    active: jax.Array,
    meta: BrickMeta,
    weight: jax.Array,  # KRSC [K, *ksize, C]
    dilation: Sequence[int],
    fp32_accum: bool = True,
    strategy: str = "gemm",
) -> jax.Array:
    """Submanifold conv on a brick-packed tensor → ``[NB·bvol, K]``.

    Parity: same math as ``indice_conv`` over a subm rulebook
    (``spconv/pytorch/ops.py:indice_conv``); inactive slots hold zeros on
    input and are re-masked on output, so computing the dense conv over
    every slot is exact.

    ``strategy``: "gemm" (default) = halo + one expanded hull→brick GEMM;
    "conv" = halo + ``lax.conv_general_dilated`` (reference formulation,
    slower on TPU — kept for comparison/tuning).
    """
    ndim = len(meta.brick_shape)
    ksize = weight.shape[1:-1]
    assert all(k % 2 == 1 for k in ksize)
    pad = [(k // 2) * int(d) for k, d in zip(ksize, dilation)]
    c = features.shape[1]
    k_out = weight.shape[0]
    x = features.reshape(meta.nb, *meta.brick_shape, c)
    x = _halo(x, meta, pad)
    # f32 inputs must not be silently truncated to bf16 multiplies (this
    # platform's default precision does); bf16 inputs use the native MXU
    # path with f32 accumulation via preferred_element_type.
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    if strategy == "gemm":
        w_exp = _expand_weight(weight, meta.brick_shape, dilation)
        hvol = int(np.prod(x.shape[1:-1]))
        out = jnp.dot(
            x.reshape(meta.nb, hvol * c),
            w_exp.astype(x.dtype),
            precision=precision,
            preferred_element_type=jnp.float32 if fp32_accum else None,
        ).astype(features.dtype)
        out = out.reshape(meta.num_slots, k_out)
    else:
        w = jnp.moveaxis(weight, 0, -1)  # [*ksize, C, K]
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1,) * ndim,
            padding="VALID",
            rhs_dilation=tuple(int(d) for d in dilation),
            dimension_numbers=_conv_dn(ndim),
            precision=precision,
            preferred_element_type=jnp.float32 if fp32_accum else None,
        ).astype(features.dtype)
        out = out.reshape(meta.num_slots, k_out)
    return jnp.where(active[:, None], out, 0)


def brick_downsample_conv(
    x: SparseConvTensor,
    meta: BrickMeta,
    weight: jax.Array,  # KRSC [K, *ksize, C]
    bias: Optional[jax.Array],
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
    fp32_accum: bool = True,
    nb_bound: Optional[int] = None,
) -> SparseConvTensor:
    """Regular (strided) sparse conv on a brick-packed tensor.

    Output brick ``B`` covers output sites ``[B·bs, (B+1)·bs)`` on the
    downsampled grid; its input hull ``[s·B·bs − p, … + hulldim)`` is
    assembled from the ≤3^ndim input bricks covering it (found by one
    sort-join), then contracted with the stride-expanded GEMM matrix —
    for stride 2 the windows tile the hull exactly, so the GEMM does
    *zero* wasted FLOPs.  Output-site activity (the reference's
    "any input in the window" rule, ``indices.py:177-203``) comes from
    the same hull assembly applied to the occupancy mask.

    Parity: SparseConvolution with subm=False (``spconv/pytorch/conv.py``),
    ``get_conv_output_size`` sizing, bounded output table.
    """
    ndim = x.ndim
    ksize = tuple(int(k) for k in weight.shape[1:-1])
    stride = tuple(int(s) for s in stride)
    padding = tuple(int(p) for p in padding)
    dilation = tuple(int(d) for d in dilation)
    bs = meta.brick_shape
    c = x.features.shape[1]
    k_out = weight.shape[0]
    out_spatial = C.get_conv_output_size(
        x.spatial_shape, ksize, stride, padding, dilation
    )
    if any(s <= 0 for s in out_spatial):
        raise ValueError(
            f"output spatial shape {out_spatial} reached zero; "
            f"input {x.spatial_shape}"
        )
    out_grid = tuple(-(-int(o) // b) for o, b in zip(out_spatial, bs))
    if nb_bound is None:
        if all(s == 1 for s in stride):
            # stride-1 regular conv dilates the active set — the output
            # brick footprint grows (cf. _resolve_out_bound's ratio ≥ 2)
            nb_bound = min(
                4 * meta.nb, int(np.prod(out_grid)) * x.batch_size
            )
        else:
            nb_bound = meta.nb

    # ---- candidate output bricks --------------------------------------
    # input brick B_in feeds output sites o with s·o − p + t·d ∈ its span;
    # enumerate the ≤J consecutive output bricks per axis on device.
    bc = meta.brick_coords  # [NB_in, ndim+1]
    bvalid = bc[:, 0] >= 0
    cand_axes = []
    cand_hi = []
    J = []
    for a in range(ndim):
        # o range fed by this input brick:
        #   o_min(B) = ceil((B·bs + p − (k−1)·d) / s)      (clamped ≥ 0)
        #   o_max(B) = floor(((B+1)·bs − 1 + p) / s)       (clamped < out)
        lo_num = bc[:, 1 + a] * bs[a] + padding[a] \
            - (ksize[a] - 1) * dilation[a]
        o_min = jnp.maximum(-((-lo_num) // stride[a]), 0)
        o_max = ((bc[:, 1 + a] + 1) * bs[a] - 1 + padding[a]) // stride[a]
        o_max = jnp.minimum(o_max, out_spatial[a] - 1)
        base = o_min // bs[a]
        # static candidate count per axis
        width = (bs[a] - 1 + (ksize[a] - 1) * dilation[a]) // stride[a] + 1
        J.append(width // bs[a] + 2)
        cand_axes.append(base)
        cand_hi.append(o_max // bs[a])
    combos = C.kernel_offsets(tuple(J))  # [prod(J), ndim] offsets
    ncand = combos.shape[0]
    cand = jnp.stack(
        [cand_axes[a][None, :] + combos[:, a][:, None] for a in range(ndim)],
        axis=-1,
    )  # [ncand, NB_in, ndim]
    hi = jnp.stack(cand_hi, axis=-1)[None, :, :]  # [1, NB_in, ndim]
    out_grid_arr = jnp.asarray(out_grid, jnp.int32)
    cvalid = (
        jnp.all((cand >= 0) & (cand < out_grid_arr) & (cand <= hi), axis=-1)
        & bvalid
    )
    bcol = jnp.broadcast_to(bc[None, :, :1], (ncand, meta.nb, 1))
    pseudo = jnp.concatenate([bcol, cand], axis=-1).reshape(
        ncand * meta.nb, ndim + 1
    )
    out_meta, _ = _dedup_coords_to_meta(
        pseudo, cvalid.reshape(-1), out_grid, tuple(out_spatial),
        x.batch_size, bs, nb_bound,
    )

    # ---- hull assembly from input bricks ------------------------------
    hull = _hull_dims(bs, ksize, stride, dilation)
    axis_pieces = [
        _axis_pieces(bs[a], hull[a], padding[a]) for a in range(ndim)
    ]
    pieces = [[]]
    for a in range(ndim):
        pieces = [p + [ap] for p in pieces for ap in axis_pieces[a]]
    # probe input brick coords: s·B_out + e per axis
    st_arr = jnp.asarray(stride, jnp.int32)
    ovalid = out_meta.brick_coords[:, 0] >= 0
    in_keys, in_sent = C.linearize(
        meta.brick_coords, meta.grid, x.batch_size,
        meta.brick_coords[:, 0] >= 0,
    )
    probe_coords = []
    probe_valid = []
    in_grid_arr = jnp.asarray(meta.grid, jnp.int32)
    for combo in pieces:
        e = jnp.asarray([pc[0] for pc in combo], jnp.int32)
        pcoord = out_meta.brick_coords[:, 1:] * st_arr + e[None, :]
        pv = jnp.all((pcoord >= 0) & (pcoord < in_grid_arr), axis=-1) & ovalid
        probe_coords.append(
            jnp.concatenate([out_meta.brick_coords[:, :1], pcoord], axis=-1)
        )
        probe_valid.append(pv)
    npieces = len(pieces)
    probes = jnp.stack(probe_coords).reshape(npieces * nb_bound, ndim + 1)
    pvalid = jnp.stack(probe_valid).reshape(-1)
    pkeys, _ = C.linearize(probes, meta.grid, x.batch_size, pvalid)
    ids = _join_lookup(in_keys, pkeys, in_sent).reshape(npieces, nb_bound)
    ids = jnp.where(jnp.stack(probe_valid), ids, -1)
    ids_clamped = jnp.where(ids >= 0, ids, meta.nb)

    x2 = x.features.reshape(meta.nb, meta.bvol * c)
    x2z = jnp.concatenate(
        [x2, jnp.zeros((1, meta.bvol * c), x2.dtype)], axis=0
    )
    h = _assemble_hull(x2z, ids_clamped, pieces, axis_pieces, bs, c)
    hvol = int(np.prod(hull))

    precision = (
        jax.lax.Precision.HIGHEST if x.features.dtype == jnp.float32 else None
    )
    w_exp = _expand_weight(weight, bs, dilation, stride)
    out = jnp.dot(
        h.reshape(nb_bound, hvol * c),
        w_exp.astype(h.dtype),
        precision=precision,
        preferred_element_type=jnp.float32 if fp32_accum else None,
    )

    # ---- output-site activity (any active input in the window) --------
    act_in = (x.indices[:, 0] >= 0).reshape(meta.nb, meta.bvol)
    act2z = jnp.concatenate(
        [act_in.astype(jnp.float32), jnp.zeros((1, meta.bvol))], axis=0
    )
    ha = _assemble_hull(act2z, ids_clamped, pieces, axis_pieces, bs, 1)
    ones_w = jnp.ones((1, *ksize, 1), jnp.float32)
    w_occ = _expand_weight(ones_w, bs, dilation, stride)
    occ = jnp.dot(ha.reshape(nb_bound, hvol), w_occ,
                  precision=jax.lax.Precision.HIGHEST)
    active = (occ > 0.5).reshape(out_meta.num_slots)
    # grid-edge: output coords past out_spatial never exist
    out_inds = out_meta.slot_indices(active)
    in_range = jnp.all(
        (out_inds[:, 1:] < jnp.asarray(out_spatial, jnp.int32)), axis=-1
    )
    active = active & in_range
    out_inds = jnp.where(active[:, None], out_inds, -1)

    out_feat = out.reshape(out_meta.num_slots, k_out)
    if bias is not None:
        out_feat = out_feat + bias.astype(out_feat.dtype)
    out_feat = jnp.where(active[:, None], out_feat, 0).astype(
        x.features.dtype
    )

    res = SparseConvTensor(
        out_feat, out_inds, tuple(out_spatial), x.batch_size,
        num_voxels=jnp.sum(active.astype(jnp.int32)),
        benchmark=x.benchmark,
    )
    res.indice_dict[brick_key(bs, out_spatial)] = out_meta
    return res


def brick_pool(
    x: SparseConvTensor,
    meta: BrickMeta,
    mode: str = "max",
    out_brick_shape: Optional[Sequence[int]] = None,
    nb_bound: Optional[int] = None,
) -> SparseConvTensor:
    """2×…×2 stride-2 max/avg pool on a brick-packed tensor.

    The window tiling never crosses brick borders (brick dims are even),
    so pooling is brick-local; the pooled sites are then repacked into
    bricks on the half-resolution grid.  Parity: SparseMaxPool/AvgPool
    with kernel=stride=2 (``spconv/pytorch/pool.py``) — reduction over
    *active* sites only, output site active iff any input in its window is.
    """
    ndim = x.ndim
    c = x.features.shape[1]
    bs = meta.brick_shape
    assert all(b % 2 == 0 for b in bs), (
        f"brick_pool needs even brick dims (2×2×2 windows must not "
        f"cross brick borders), got {bs}"
    )
    win = (2,) * ndim
    active = x.indices[:, 0] >= 0
    a = active.reshape(meta.nb, *bs, 1)
    if mode == "max":
        f = jnp.where(active[:, None], x.features.astype(jnp.float32),
                      -jnp.inf)
        f = f.reshape(meta.nb, *bs, c)
        pooled = jax.lax.reduce_window(
            f, -jnp.inf, jax.lax.max,
            (1, *win, 1), (1, *win, 1), "VALID",
        )
        cnt = None
    else:
        f = x.features.astype(jnp.float32).reshape(meta.nb, *bs, c)
        pooled = jax.lax.reduce_window(
            f, 0.0, jax.lax.add, (1, *win, 1), (1, *win, 1), "VALID",
        )
        cnt = jax.lax.reduce_window(
            a.astype(jnp.float32), 0.0, jax.lax.add,
            (1, *win, 1), (1, *win, 1), "VALID",
        )
        pooled = pooled / jnp.maximum(cnt, 1.0)
    pact = jax.lax.reduce_window(
        a.astype(jnp.int32), 0, jax.lax.max, (1, *win, 1), (1, *win, 1),
        "VALID",
    ).astype(bool)
    pooled = jnp.where(pact, pooled, 0).astype(x.features.dtype)

    sub = tuple(b // w for b, w in zip(bs, win))  # pooled sites per brick
    svol = int(np.prod(sub))
    pooled = pooled.reshape(meta.nb * svol, c)
    pact = pact.reshape(meta.nb * svol)

    # pooled site coords: brick_coord·(bs/2) + local offset on the half
    # grid.  Output spatial matches the reference's VALID pool sizing
    # (floor((s-2)/2)+1); windows that would start past the last full
    # window (odd input size) produce no output site, so mask them.
    new_spatial = C.get_conv_output_size(
        x.spatial_shape, win, win, (0,) * ndim, (1,) * ndim
    )
    offs = jnp.asarray(C.kernel_offsets(sub))  # [svol, ndim]
    bshape_arr = jnp.asarray(bs, jnp.int32)
    win_arr = jnp.asarray(win, jnp.int32)
    origin = (meta.brick_coords[:, None, 1:] * bshape_arr) // win_arr
    xyz = origin + offs[None, :, :]
    in_range = jnp.all(xyz < jnp.asarray(new_spatial, jnp.int32), axis=-1)
    b = jnp.broadcast_to(
        meta.brick_coords[:, None, :1], (meta.nb, svol, 1)
    )
    inds = jnp.concatenate([b, xyz], axis=-1).reshape(meta.nb * svol, ndim + 1)
    pact = pact & in_range.reshape(meta.nb * svol)
    pooled = jnp.where(pact[:, None], pooled, 0)
    inds = jnp.where(pact[:, None], inds, -1).astype(jnp.int32)

    mid = SparseConvTensor(
        pooled, inds, new_spatial, x.batch_size,
        num_voxels=jnp.sum(pact.astype(jnp.int32)),
        benchmark=x.benchmark,
    )
    return pack_tensor(
        mid,
        brick_shape=out_brick_shape or meta.brick_shape,
        nb_bound=nb_bound,
    )
