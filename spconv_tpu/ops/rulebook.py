"""Rulebook (indice-pair) generation — sort-based, static-shape, TPU-native.

The reference builds rulebooks with GPU hash tables + atomics and reads
dynamic output counts back to the host (``spconv/csrc/sparse/indices.py``,
``spconv/pytorch/ops.py:150-330``).  Neither pattern maps to XLA: we need
static shapes and no host syncs.  This module re-derives the same
input↔output pair structure with sorts, segmented dedup and conflict-free
scatters — all bounded buffers + validity masks (the reference's own
``num_out_act_bound`` deployment mode, ``ops.py:264-266``, made the
default and only mode).

Pair layout (matches the reference's implicit-gemm records,
``spconv/pytorch/core.py:81-112``):

* ``pair_fwd[kv, N_out]`` — input row feeding output ``o`` via offset ``k``.
* ``pair_bwd[kv, N_in]``  — output row fed by input ``i`` via offset ``k``.

Both are −1 where no pair exists.  For a fixed ``k`` the map ``o → i`` is
injective, so every scatter below is conflict-free.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import IndiceData
from . import coords as C

__all__ = [
    "build_subm_rulebook",
    "build_conv_rulebook",
    "build_pool2_rulebook",
    "get_indice_pairs",
]


def _join_lookup(
    table_keys: jax.Array, queries: jax.Array, sentinel,
    max_dup: Optional[int] = None,
) -> jax.Array:
    """Batch table lookup by sort-join: for each query key, the row index in
    ``table_keys`` holding an equal key, or −1.

    TPU-native replacement for the reference's GPU hash probe
    (``csrc/hash/core.py`` LinearHashTableSplit.lookup).  A binary-search
    (``jnp.searchsorted``) formulation is ~30× slower on TPU (16 ms per
    127k-query probe), and element-wise int32 gathers/scatters run at only
    ~140/215 M elem/s (tools/probe_sort2.py) — so the join touches memory
    ONLY through sorts (≈0.7 G elem/s) and elementwise shifts:

    * ONE stable sort of [table ‖ queries] with the source index riding as
      payload; within an equal-key run the (unique) table entry sorts
      first (its source index is smallest),
    * pointer-doubling propagation of the run-leading table row through
      shifted compares (``log2(max_dup)`` elementwise passes — a sorted
      array lets one compare test a whole span),
    * ONE unstable sort keyed by the source index to restore query order
      (replacing an 8 ms scatter with a 2 ms sort at 1.8M elements).

    ``table_keys`` must hold unique keys except the sentinel; sentinel
    queries never match.  ``max_dup`` bounds the number of queries sharing
    one key (+1); default = full log passes (always correct).
    """
    t = table_keys.shape[0]
    q = queries.shape[0]
    m = t + q
    allk = jnp.concatenate([table_keys, queries], axis=0)
    src = jnp.arange(m, dtype=jnp.int32)
    sk, src_s = C.sort_with_payload(allk, src)
    val = jnp.where(src_s < t, src_s, -1)
    limit = int(max_dup) if max_dup is not None else m
    s = 1
    while s < limit:
        eq = C.keys_equal_shift(sk, s)
        shifted = jnp.concatenate(
            [jnp.full((s,), -1, jnp.int32), val[:-s]]
        )
        val = jnp.maximum(val, jnp.where(eq, shifted, -1))
        s *= 2
    val = jnp.where(C.is_sentinel(sk, sentinel), -1, val)
    _, res = jax.lax.sort((src_s, val), num_keys=1, is_stable=False)
    return res[t:]


@partial(jax.jit, static_argnames=("spatial_shape", "batch_size", "ksize", "dilation"))
def build_subm_rulebook(
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    ksize: Tuple[int, ...],
    dilation: Tuple[int, ...],
) -> IndiceData:
    """Submanifold rulebook: output sites == input sites.

    ONE sort-join answers every non-center neighbor probe, and because the
    probe source index rides the sort as payload, the join's unsort
    delivers ``pair_fwd`` directly in dense ``[kv-1, N]`` layout — the
    build contains no element scatters at all (an earlier mirror-scatter
    formulation spent 8 ms+ in XLA scatters; see tools/probe_sort2.py).
    The reference instead hash-probes with offset-mirror writes
    (``indices.py:757-804``); the mirror symmetry survives here as
    ``pair_bwd = pair_fwd[::-1]``.
    """
    ksize = tuple(int(k) for k in ksize)
    dilation = tuple(int(d) for d in dilation)
    assert all(k % 2 == 1 for k in ksize), "subm requires odd kernel size"
    n = indices.shape[0]
    ndim = indices.shape[1] - 1
    kv = int(np.prod(ksize))
    center = kv // 2

    valid = indices[:, 0] >= 0
    keys, sent = C.linearize(indices, spatial_shape, batch_size, valid)

    iota = jnp.arange(n, dtype=jnp.int32)
    identity = jnp.where(valid, iota, -1)

    offs = C.kernel_offsets(ksize)  # [kv, ndim] numpy
    centers = np.array([k // 2 for k in ksize])
    disp = (offs - centers) * np.array(dilation)  # displacement per offset
    shape_arr = jnp.asarray([int(s) for s in spatial_shape], dtype=jnp.int32)

    # batch ALL non-center neighbor queries into one sort-join; probe
    # order == offset order, so the reshape below is pair_fwd's layout
    ks = [k for k in range(kv) if k != center]
    d = jnp.asarray(disp[np.asarray(ks)], dtype=jnp.int32)  # [kv-1, ndim]
    ncoord = indices[None, :, 1:] + d[:, None, :]  # [kv-1, N, ndim]
    in_bounds = (
        jnp.all((ncoord >= 0) & (ncoord < shape_arr), axis=-1) & valid[None, :]
    )  # [kv-1, N]
    bcol = jnp.broadcast_to(indices[None, :, :1], (kv - 1, n, 1))
    nfull = jnp.concatenate([bcol, ncoord], axis=-1).reshape(
        (kv - 1) * n, ndim + 1
    )
    nkeys, _ = C.linearize(
        nfull, spatial_shape, batch_size, in_bounds.reshape(-1)
    )
    # max_dup: each table key is probed at most once per offset
    src_all = _join_lookup(keys, nkeys, sent, max_dup=kv).reshape(kv - 1, n)

    pair_fwd = jnp.concatenate(
        [src_all[:center], identity[None, :], src_all[center:]], axis=0
    )
    # subm: input i feeds output at coord(i) - d_k = coord(i) + d_{kv-1-k}
    pair_bwd = pair_fwd[::-1]
    num = jnp.sum(valid.astype(jnp.int32))
    return IndiceData(
        pair_fwd=pair_fwd,
        pair_bwd=pair_bwd,
        out_indices=indices,
        indices=indices,
        num_out=num,
        is_subm=True,
        spatial_shape=tuple(spatial_shape),
        out_spatial_shape=tuple(spatial_shape),
        ksize=ksize,
        stride=(1,) * ndim,
        padding=C.subm_padding(ksize, dilation),
        dilation=dilation,
        transposed=False,
    )


@partial(
    jax.jit,
    static_argnames=(
        "spatial_shape",
        "batch_size",
        "ksize",
        "stride",
        "padding",
        "dilation",
        "out_padding",
        "transposed",
        "out_bound",
    ),
)
def build_conv_rulebook(
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    ksize: Tuple[int, ...],
    stride: Tuple[int, ...],
    padding: Tuple[int, ...],
    dilation: Tuple[int, ...],
    out_padding: Tuple[int, ...] = None,
    transposed: bool = False,
    out_bound: Optional[int] = None,
) -> IndiceData:
    """Regular / transposed sparse conv rulebook.

    Replaces the reference's stage1 (candidate emission, atomics) +
    ``torch.unique`` (host sync) + stage2 (hash build/probe) pipeline
    (``ops.py:240-330``) with one sort + segmented dedup; output-position
    assignment falls out of the sort for free, so no lookup pass is needed.

    ``out_bound`` is the static output-site budget (reference:
    ``num_out_act_bound``); defaults to ``N_in`` which is the right size
    for strided downsampling layers.  Overflowing sites are dropped
    deterministically (smallest linearized coords kept).
    """
    ksize = tuple(int(k) for k in ksize)
    n = indices.shape[0]
    ndim = indices.shape[1] - 1
    kv = int(np.prod(ksize))
    if out_padding is None:
        out_padding = (0,) * ndim
    if transposed:
        out_shape = C.get_deconv_output_size(
            spatial_shape, ksize, stride, padding, dilation, out_padding
        )
    else:
        out_shape = C.get_conv_output_size(
            spatial_shape, ksize, stride, padding, dilation
        )
    if any(x <= 0 for x in out_shape):
        raise ValueError(
            f"output spatial shape {out_shape} reached zero; input {spatial_shape}"
        )
    if out_bound is None:
        out_bound = n

    out_coords, valid = C.out_coords_all_offsets(
        indices, ksize, stride, padding, dilation, out_shape, batch_size, transposed
    )  # [kv, N, ndim+1], [kv, N]
    cand_keys, sentinel = C.linearize(
        out_coords.reshape(kv * n, ndim + 1), out_shape, batch_size,
        valid.reshape(kv * n),
    )

    sk, order = C.sort_with_ids(cand_keys)
    not_sent = ~C.is_sentinel(sk, sentinel)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # pos of each cand's key
    num_out_total = jnp.sum(is_first.astype(jnp.int32))

    # out position per flat candidate — unsort by a second sort (an int32
    # scatter at kv·N elements costs ~8 ms/1.8M; the sort ~2 ms)
    _, out_pos_flat = jax.lax.sort((order, uniq_pos), num_keys=1,
                                   is_stable=False)
    out_pos = out_pos_flat.reshape(kv, n)
    pair_valid = valid & (out_pos < out_bound)
    pair_bwd = jnp.where(pair_valid, out_pos, -1)

    # pair_fwd via conflict-free scatter: pair_fwd[k, out_pos] = i
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (kv, n))
    scatter_pos = jnp.where(pair_valid, out_pos, out_bound)
    pair_fwd = jnp.full((kv, out_bound), -1, dtype=jnp.int32)
    pair_fwd = pair_fwd.at[
        jnp.broadcast_to(jnp.arange(kv, dtype=jnp.int32)[:, None], (kv, n)),
        scatter_pos,
    ].set(jnp.where(pair_valid, iota, -1), mode="drop")

    # unique output keys → coordinates (buffer is sorted ascending)
    uniq_scatter = jnp.where(is_first & (uniq_pos < out_bound), uniq_pos, out_bound)
    out_keys = C.full_sentinel(out_bound, sentinel).astype(sk.dtype)
    out_keys = out_keys.at[uniq_scatter].set(sk, mode="drop")
    out_valid = ~C.is_sentinel(out_keys, sentinel)
    out_indices = C.delinearize(out_keys, out_shape, out_valid)

    num_out = jnp.minimum(num_out_total, out_bound)
    return IndiceData(
        pair_fwd=pair_fwd,
        pair_bwd=pair_bwd,
        out_indices=out_indices,
        indices=indices,
        num_out=num_out,
        num_out_total=num_out_total,
        is_subm=False,
        spatial_shape=tuple(spatial_shape),
        out_spatial_shape=tuple(int(s) for s in out_shape),
        ksize=ksize,
        stride=tuple(int(s) for s in stride),
        padding=tuple(int(p) for p in padding),
        dilation=tuple(int(d) for d in dilation),
        transposed=transposed,
    )


@partial(
    jax.jit,
    static_argnames=("spatial_shape", "batch_size", "out_bound"),
)
def build_pool2_rulebook(
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    out_bound: Optional[int] = None,
) -> IndiceData:
    """Fast rulebook for the kernel-2 / stride-2 / pad-0 pool.

    Every input feeds exactly one window (``o = i // 2``), so the pair
    structure falls out of ONE sort of N keys instead of the generic
    builder's 2^ndim·N candidate sort (measured ~19 ms → ~3 ms per pool
    at stage-0 sizes).  ``pair_fwd`` slots are group-rank order, not
    geometric offsets — valid for max/avg pooling, whose reduction is
    offset-agnostic (the reference's IndiceMaxPool likewise never uses
    the offset identity, ``csrc/sparse/maxpool.py``).
    """
    n = indices.shape[0]
    ndim = indices.shape[1] - 1
    kv = 2 ** ndim
    out_shape = C.get_conv_output_size(
        spatial_shape, (2,) * ndim, (2,) * ndim, (0,) * ndim, (1,) * ndim
    )
    if out_bound is None:
        out_bound = n
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

    pos = jnp.arange(n, dtype=jnp.int32)
    group_start = jax.lax.cummax(jnp.where(is_first, pos, 0))
    rank = pos - group_start  # < kv by construction (≤ 2^ndim per window)

    in_row = order  # original row of each sorted element
    pvalid = not_sent & (uniq_pos < out_bound)
    pair_fwd = jnp.full((kv, out_bound), -1, jnp.int32)
    pair_fwd = pair_fwd.at[
        jnp.where(pvalid, rank, kv), jnp.where(pvalid, uniq_pos, out_bound)
    ].set(in_row.astype(jnp.int32), mode="drop")

    # pair_bwd row 0: the output position fed by each input (rank-agnostic)
    outpos_of = jnp.full((n,), -1, jnp.int32).at[order].set(
        jnp.where(pvalid, uniq_pos, -1)
    )
    pair_bwd = jnp.full((kv, n), -1, jnp.int32).at[0].set(outpos_of)

    uniq_scatter = jnp.where(is_first & (uniq_pos < out_bound), uniq_pos,
                             out_bound)
    out_keys = C.full_sentinel(out_bound, sentinel).astype(
        sk.dtype if sk.ndim == 1 else jnp.int32
    )
    out_keys = out_keys.at[uniq_scatter].set(sk, mode="drop")
    out_valid = ~C.is_sentinel(out_keys, sentinel)
    out_indices = C.delinearize(out_keys, out_shape, out_valid)

    return IndiceData(
        pair_fwd=pair_fwd,
        pair_bwd=pair_bwd,
        out_indices=out_indices,
        indices=indices,
        num_out=jnp.minimum(num_out_total, out_bound),
        num_out_total=num_out_total,
        is_subm=False,
        spatial_shape=tuple(spatial_shape),
        out_spatial_shape=tuple(int(s) for s in out_shape),
        ksize=(2,) * ndim,
        stride=(2,) * ndim,
        padding=(0,) * ndim,
        dilation=(1,) * ndim,
        transposed=False,
    )


@partial(
    jax.jit,
    static_argnames=("spatial_shape", "batch_size", "out_bound"),
)
def build_pool2_outputs(
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    out_bound: Optional[int] = None,
):
    """Output-site discovery alone for the 2/2/0 pool (the sorted-key
    pool kernel joins pairs in-kernel, so only ``out_indices``/keys and
    the count are needed — the pair scatters of
    :func:`build_pool2_rulebook` are skipped).

    Returns ``(out_indices [out_bound, ndim+1], out_keys [out_bound]
    int32 sorted sentinel-padded, num_out, out_shape)``.
    """
    n = indices.shape[0]
    ndim = indices.shape[1] - 1
    out_shape = C.get_conv_output_size(
        spatial_shape, (2,) * ndim, (2,) * ndim, (0,) * ndim, (1,) * ndim
    )
    if out_bound is None:
        out_bound = n
    oshape_arr = jnp.asarray(out_shape, jnp.int32)
    oc = indices[:, 1:] // 2
    valid = (indices[:, 0] >= 0) & jnp.all(oc < oshape_arr, axis=-1)
    out_c = jnp.concatenate([indices[:, :1], oc], axis=-1)
    keys, sentinel = C.linearize(out_c, out_shape, batch_size, valid)

    sk = jnp.sort(keys)
    not_sent = ~C.is_sentinel(sk, sentinel)
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out_total = jnp.sum(is_first.astype(jnp.int32))

    uniq_scatter = jnp.where(is_first & (uniq_pos < out_bound), uniq_pos,
                             out_bound)
    out_keys = C.full_sentinel(out_bound, sentinel).astype(
        sk.dtype if sk.ndim == 1 else jnp.int32
    )
    out_keys = out_keys.at[uniq_scatter].set(sk, mode="drop")
    out_valid = ~C.is_sentinel(out_keys, sentinel)
    out_indices = C.delinearize(out_keys, out_shape, out_valid)
    # NOTE: out_shape is static python math — callers recompute it via
    # C.get_conv_output_size (a jitted fn cannot return static tuples)
    return (out_indices, out_keys, jnp.minimum(num_out_total, out_bound),
            num_out_total)




@partial(
    jax.jit,
    static_argnames=("spatial_shape", "batch_size", "ksize", "stride",
                     "padding", "dilation", "out_bound"),
)
def build_conv_outputs(
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    ksize: Tuple[int, ...],
    stride: Tuple[int, ...],
    padding: Tuple[int, ...],
    dilation: Tuple[int, ...],
    out_bound: Optional[int] = None,
):
    """Output-site discovery alone for a regular conv (stage-1 + dedup of
    the reference pipeline, ``ops.py:240-330`` — no pair joins; the
    sorted-key kernel joins in-pass).

    Candidates are enumerated per OUTPUT range, not per filter offset:
    each input reaches at most ``prod(floor((k-1)*d/s) + 1)`` outputs
    (8 for the k3/s2 downsample vs kv=27 offsets), which shrinks the
    candidate sort ~3× vs the generic rulebook's stage-1.

    Returns ``(out_indices, out_keys sorted sentinel-padded, num_out)``.
    """
    ksize = tuple(int(k) for k in ksize)
    n = indices.shape[0]
    ndim = indices.shape[1] - 1
    out_shape = C.get_conv_output_size(
        spatial_shape, ksize, stride, padding, dilation
    )
    if any(x <= 0 for x in out_shape):
        raise ValueError(
            f"output spatial shape {out_shape} reached zero; "
            f"input {spatial_shape}"
        )
    if out_bound is None:
        out_bound = n

    ncands = [
        int(((k - 1) * d) // st) + 1
        for k, st, d in zip(ksize, stride, dilation)
    ]
    in_valid = indices[:, 0] >= 0
    b = indices[:, 0].astype(jnp.int32)
    vol_out = 1
    for v in out_shape:
        vol_out *= int(v)
    sentinel = vol_out * int(batch_size)
    assert sentinel < 2**31, "use_pair_keys grids not supported here"

    cand_keys = []
    import itertools as _it

    for js in _it.product(*[range(m) for m in ncands]):
        ok = in_valid
        key = b
        for a in range(ndim):
            ia = indices[:, a + 1].astype(jnp.int32) + int(padding[a])
            o = ia // int(stride[a]) - int(js[a])
            rem = ia - o * int(stride[a])
            ok = (
                ok
                & (o >= 0)
                & (o < int(out_shape[a]))
                & (rem >= 0)
                & (rem <= (ksize[a] - 1) * int(dilation[a]))
                & (rem % int(dilation[a]) == 0)
            )
            key = key * int(out_shape[a]) + o
        cand_keys.append(jnp.where(ok, key, jnp.int32(sentinel)))
    ck = jnp.concatenate(cand_keys)

    sk = jnp.sort(ck)
    not_sent = sk != sentinel
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out_total = jnp.sum(is_first.astype(jnp.int32))
    uniq_scatter = jnp.where(is_first & (uniq_pos < out_bound), uniq_pos,
                             out_bound)
    out_keys = C.full_sentinel(out_bound, sentinel).astype(sk.dtype)
    out_keys = out_keys.at[uniq_scatter].set(sk, mode="drop")
    out_valid = out_keys != sentinel
    out_indices = C.delinearize(out_keys, out_shape, out_valid)
    return (out_indices, out_keys, jnp.minimum(num_out_total, out_bound),
            num_out_total)


@partial(
    jax.jit,
    static_argnames=("spatial_shape", "batch_size", "ksize", "stride",
                     "padding", "dilation", "out_padding", "out_bound"),
)
def build_deconv_outputs(
    indices: jax.Array,
    *,
    spatial_shape: Tuple[int, ...],
    batch_size: int,
    ksize: Tuple[int, ...],
    stride: Tuple[int, ...],
    padding: Tuple[int, ...],
    dilation: Tuple[int, ...],
    out_padding: Tuple[int, ...],
    out_bound: Optional[int] = None,
):
    """Output-site discovery for a transposed conv: candidates
    ``o = i·s + k·d − p`` per offset, sort + dedup (no pair joins — the
    sorted-key kernel joins in-pass via the divide probe map).
    Returns ``(out_indices, out_keys sorted sentinel-padded, num_out)``.
    """
    ksize = tuple(int(k) for k in ksize)
    n = indices.shape[0]
    ndim = indices.shape[1] - 1
    out_shape = C.get_deconv_output_size(
        spatial_shape, ksize, stride, padding, dilation, out_padding
    )
    if out_bound is None:
        out_bound = n * int(np.prod([int(v) for v in stride]))
    in_valid = indices[:, 0] >= 0
    b = indices[:, 0].astype(jnp.int32)
    vol_out = 1
    for v in out_shape:
        vol_out *= int(v)
    sentinel = vol_out * int(batch_size)
    assert sentinel < 2**31, "use_pair_keys grids not supported here"

    import itertools as _it

    cand_keys = []
    for js in _it.product(*[range(k) for k in ksize]):
        ok = in_valid
        key = b
        for a in range(ndim):
            o = (indices[:, a + 1].astype(jnp.int32) * int(stride[a])
                 + int(js[a]) * int(dilation[a]) - int(padding[a]))
            ok = ok & (o >= 0) & (o < int(out_shape[a]))
            key = key * int(out_shape[a]) + o
        cand_keys.append(jnp.where(ok, key, jnp.int32(sentinel)))
    ck = jnp.concatenate(cand_keys)

    sk = jnp.sort(ck)
    not_sent = sk != sentinel
    is_first = jnp.concatenate([not_sent[:1], C.adj_differ(sk) & not_sent[1:]])
    uniq_pos = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    num_out_total = jnp.sum(is_first.astype(jnp.int32))
    uniq_scatter = jnp.where(is_first & (uniq_pos < out_bound), uniq_pos,
                             out_bound)
    out_keys = C.full_sentinel(out_bound, sentinel).astype(sk.dtype)
    out_keys = out_keys.at[uniq_scatter].set(sk, mode="drop")
    out_valid = out_keys != sentinel
    out_indices = C.delinearize(out_keys, out_shape, out_valid)
    return (out_indices, out_keys, jnp.minimum(num_out_total, out_bound),
            num_out_total)


def get_indice_pairs(
    indices: jax.Array,
    batch_size: int,
    spatial_shape: Sequence[int],
    ksize: Sequence[int],
    stride: Sequence[int],
    padding: Sequence[int],
    dilation: Sequence[int],
    out_padding: Sequence[int] = None,
    subm: bool = False,
    transpose: bool = False,
    out_bound: Optional[int] = None,
) -> IndiceData:
    """Unified entry point (parity: ``spconv/pytorch/ops.py:get_indice_pairs``
    + ``get_indice_pairs_implicit_gemm`` — one rulebook serves both compute
    algorithms here)."""
    ndim = indices.shape[1] - 1
    spatial_shape = tuple(int(s) for s in spatial_shape)
    if subm:
        return build_subm_rulebook(
            indices,
            spatial_shape=spatial_shape,
            batch_size=batch_size,
            ksize=tuple(ksize),
            dilation=tuple(dilation),
        )
    return build_conv_rulebook(
        indices,
        spatial_shape=spatial_shape,
        batch_size=batch_size,
        ksize=tuple(ksize),
        stride=tuple(stride),
        padding=tuple(padding),
        dilation=tuple(dilation),
        out_padding=tuple(out_padding) if out_padding is not None else (0,) * ndim,
        transposed=transpose,
        out_bound=out_bound,
    )
