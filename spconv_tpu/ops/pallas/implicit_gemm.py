"""Pallas masked implicit-GEMM for sparse convolution.

TPU re-design of the reference's CUTLASS-style masked implicit GEMM
(``ConvAlgo.MaskImplicitGemm``: the GEMM mainloop iterates filter offsets
with per-tile masks so absent offsets are skipped —
``spconv/pytorch/ops.py:1450-1664``, kernels in cumm).

Structure per output tile (TILE rows of the key-sorted output):

* the rulebook's ``pair_fwd[k]`` is a **monotone** partial map (input and
  output rows are both key-sorted and the offset shift preserves key
  order), so the input rows feeding a tile lie in a narrow contiguous
  window per offset;
* for each present offset (per-tile presence mask — spconv's mask trick):
  DMA the window ``features[ws[k,t] : ws[k,t]+W]`` HBM→VMEM (contiguous,
  streams at full bandwidth, unlike XLA's row-gather), then materialize
  the gather as a one-hot × window **MXU matmul** (Mosaic has no dynamic
  VMEM gather; the one-hot contraction is exact in bf16), accumulate
  ``@ W[k]`` in fp32;
* pairs falling outside the static window W are counted at plan time;
  the caller falls back to the XLA gather path via ``lax.cond`` when any
  exist (rare: W is calibrated per layer; zero on the benchmark scan).

The (ws, rel, present) plan depends only on the rulebook, so it is built
once per layer and cached with it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_igemm_plan", "igemm_tile_matmul", "igemm_tile_matmul_packed", "implicit_gemm", "IGemmPlan"]


class IGemmPlan(NamedTuple):
    ws: jax.Array        # [kv, n_tiles] int32 — per (offset, tile) window start
    rel: jax.Array       # [n_tiles, kv, TILE] int32 — pair − ws, W where absent
    present: jax.Array   # [kv, n_tiles] int32 — 1 if offset has any pair in tile
    overflow: jax.Array  # scalar int32 — pairs outside the window (→ fallback)
    tile: int
    window: int


def build_igemm_plan(pair_fwd: jax.Array, n_in: int, tile: int = 256,
                     window: int = 512, align: int = 16) -> IGemmPlan:
    """Plan construction (pure XLA, cheap int ops; cached per rulebook)."""
    kv, n_out = pair_fwd.shape
    assert n_out % tile == 0, (n_out, tile)
    n_tiles = n_out // tile
    pf = pair_fwd.reshape(kv, n_tiles, tile)
    valid = pf >= 0
    big = jnp.int32(np.iinfo(np.int32).max)
    ws = jnp.min(jnp.where(valid, pf, big), axis=2)  # [kv, n_tiles]
    present = jnp.any(valid, axis=2)
    ws = jnp.where(present, ws, 0)
    # DMA slice starts must be aligned to the sublane tiling (16 rows for
    # bf16; 32 when 2-row packing halves the row space)
    ws = (ws // align) * align
    ws = jnp.clip(ws, 0, max(n_in + 1 - window, 0))
    rel = pf - ws[:, :, None]
    in_win = valid & (rel >= 0) & (rel < window)
    rel = jnp.where(in_win, rel, window)  # window ⇒ no one-hot match ⇒ 0
    overflow = jnp.sum((valid & ~in_win).astype(jnp.int32))
    return IGemmPlan(
        ws=ws.astype(jnp.int32),
        rel=jnp.transpose(rel, (1, 0, 2)).astype(jnp.int32),
        present=present.astype(jnp.int32),
        overflow=overflow,
        tile=tile,
        window=window,
    )


def _igemm_kernel(kv: int, tile: int, window: int, c: int, k_ch: int,
                  acc_dtype,
                  # refs:
                  ws_ref, present_ref,  # scalar-prefetch [kv, n_tiles]
                  rel_ref,              # [1, kv, tile] VMEM block
                  feat_hbm,             # [n_in+pad, c] ANY/HBM
                  w_ref,                # [kv, c, k_ch] VMEM
                  out_ref,              # [1, tile, k_ch] VMEM block
                  win_ref, acc_ref, sem):
    t = pl.program_id(0)
    acc_ref[:] = jnp.zeros((tile, k_ch), acc_dtype)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)

    for k in range(kv):
        @pl.when(present_ref[k, t] == 1)
        def _():
            start = pl.multiple_of(ws_ref[k, t], 16)
            cp = pltpu.make_async_copy(
                feat_hbm.at[pl.ds(start, window), :],
                win_ref,
                sem,
            )
            cp.start()
            rel = rel_ref[0, k, :]  # [tile]
            onehot = (iota_w == rel[:, None]).astype(jnp.bfloat16)
            cp.wait()
            g = jnp.dot(onehot, win_ref[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.dot(
                g.astype(jnp.bfloat16), w_ref[k].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(acc_dtype)

    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


def _igemm_kernel_packed(kv: int, tile: int, window: int, c: int, k_ch: int,
                         pack: int, acc_dtype,
                         ws_ref, present_ref, rel_ref, feat_hbm, w_ref,
                         out_ref, win_ref, acc_ref, sems):
    """Row-packed variant for 128 % c == 0: features are reshaped to
    [N/pack, 128] with ``pack`` consecutive rows side by side; the one-hot
    works in packed-row space (window/pack wide) and the in-packed-row
    slot selects the lane slice — cutting DMA, one-hot build and
    gather-matmul FLOPs by ``pack``× vs channel padding.

    All present offsets' window DMAs are issued up front into per-offset
    buffers so the DMA latencies overlap with compute."""
    t = pl.program_id(0)
    wp = window // pack
    acc_ref[:] = jnp.zeros((tile, k_ch), acc_dtype)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tile, wp), 1)

    def dma(k):
        start = pl.multiple_of(ws_ref[k, t] // pack, 16)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(start, wp), :], win_ref.at[k], sems.at[k])

    for k in range(kv):
        @pl.when(present_ref[k, t] == 1)
        def _():
            dma(k).start()

    for k in range(kv):
        @pl.when(present_ref[k, t] == 1)
        def _():
            rel = rel_ref[0, k, :]  # [tile]; window sentinel ⇒ no match
            onehot = (iota_w == (rel // pack)[:, None]).astype(jnp.bfloat16)
            slot = (rel % pack)[:, None]  # [tile, 1]
            dma(k).wait()
            g2 = jnp.dot(onehot, win_ref[k].astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)  # [tile, 128]
            g = g2[:, :c] * (slot == 0)
            for p in range(1, pack):
                g = g + g2[:, p * c:(p + 1) * c] * (slot == p)
            acc_ref[:] += jnp.dot(
                g.astype(jnp.bfloat16), w_ref[k].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(acc_dtype)

    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "window", "interpret"))
def igemm_tile_matmul(features: jax.Array, weight_kv: jax.Array,
                      plan: IGemmPlan, *, tile: int, window: int,
                      interpret: bool = False) -> jax.Array:
    """out[o] = Σ_k features[pair_fwd[k, o]] @ W[k] via the Pallas kernel.

    ``features`` must already carry the trailing zero row (index n_in).
    """
    kv, c, k_ch = weight_kv.shape
    n_tiles = plan.rel.shape[0]
    n_out = n_tiles * tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # ws, present
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, kv, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k_ch), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window, c), features.dtype),
            pltpu.VMEM((tile, k_ch), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _igemm_kernel, kv, tile, window, c, k_ch, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, k_ch), features.dtype),
        interpret=interpret,
    )(plan.ws, plan.present, plan.rel, features, weight_kv)
    return out.reshape(n_out, k_ch)


def _igemm_kernel_batched(kv: int, tile: int, window: int, c: int, k_ch: int,
                          pack: int, acc_dtype,
                          ws_ref, present_ref, rel_ref, feat_hbm, w_ref,
                          out_ref, win_ref, sems):
    """Batched variant: one batched dot over all kv offsets per tile
    instead of kv small matmuls (small-N matmuls engage a fraction of the
    MXUs and are issue-rate bound — see DESIGN_NOTES.md).  Absent offsets
    contribute zero automatically (their rel is the window sentinel, so
    their one-hot rows are all-zero)."""
    t = pl.program_id(0)
    wp = window // pack

    def dma(k):
        start = pl.multiple_of(ws_ref[k, t] // pack, 16)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(start, wp), :], win_ref.at[k], sems.at[k])

    for k in range(kv):
        @pl.when(present_ref[k, t] == 1)
        def _():
            dma(k).start()

    rel = rel_ref[0]  # [kv, tile]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (kv, tile, wp), 2)
    onehot = (iota_w == (rel // pack)[:, :, None]).astype(jnp.bfloat16)
    slot = (rel % pack)[:, :, None]  # [kv, tile, 1]

    for k in range(kv):
        @pl.when(present_ref[k, t] == 1)
        def _():
            dma(k).wait()

    g2 = jax.lax.dot_general(
        onehot, win_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,  # Mosaic requires 32-bit acc
    ).astype(jnp.bfloat16)  # [kv, tile, 128]
    g = g2[:, :, :c] * (slot == 0)
    for p in range(1, pack):
        g = g + g2[:, :, p * c:(p + 1) * c] * (slot == p)
    acc = jax.lax.dot_general(
        g, w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [kv, tile, k_ch]
    out_ref[0] = jnp.sum(acc, axis=0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile", "window", "pack",
                                              "interpret"))
def igemm_tile_matmul_batched(features_packed: jax.Array,
                              weight_kv: jax.Array, plan: IGemmPlan, *,
                              tile: int, window: int, pack: int,
                              interpret: bool = False) -> jax.Array:
    """Batched-dot packed kernel entry."""
    kv, c, k_ch = weight_kv.shape
    assert c * pack == 128 and window % (16 * pack) == 0
    n_tiles = plan.rel.shape[0]
    n_out = n_tiles * tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, kv, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k_ch), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kv, window // pack, 128), features_packed.dtype),
            pltpu.SemaphoreType.DMA((kv,)),
        ],
    )
    kernel = functools.partial(
        _igemm_kernel_batched, kv, tile, window, c, k_ch, pack, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, k_ch),
                                       features_packed.dtype),
        interpret=interpret,
    )(plan.ws, plan.present, plan.rel, features_packed, weight_kv)
    return out.reshape(n_out, k_ch)


@functools.partial(jax.jit, static_argnames=("tile", "window", "pack",
                                              "interpret"))
def igemm_tile_matmul_packed(features_packed: jax.Array,
                             weight_kv: jax.Array, plan: IGemmPlan, *,
                             tile: int, window: int, pack: int,
                             interpret: bool = False) -> jax.Array:
    """Packed kernel entry: ``features_packed`` is [N/pack, pack*c]."""
    kv, c, k_ch = weight_kv.shape
    assert c * pack == 128 and window % (16 * pack) == 0
    n_tiles = plan.rel.shape[0]
    n_out = n_tiles * tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, kv, tile), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, k_ch), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kv, window // pack, 128), features_packed.dtype),
            pltpu.VMEM((tile, k_ch), jnp.float32),
            pltpu.SemaphoreType.DMA((kv,)),
        ],
    )
    kernel = functools.partial(
        _igemm_kernel_packed, kv, tile, window, c, k_ch, pack, jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile, k_ch),
                                       features_packed.dtype),
        interpret=interpret,
    )(plan.ws, plan.present, plan.rel, features_packed, weight_kv)
    return out.reshape(n_out, k_ch)


def implicit_gemm(features: jax.Array, weight_kv: jax.Array,
                  pair_fwd: jax.Array, *, tile: int = 256, window: int = 512,
                  interpret: bool = False, batched: bool = False,
                  fallback: bool = True) -> jax.Array:
    """High-level entry: plan + kernel, with a ``lax.cond`` fall back to the
    XLA gather path when any pair overflows the static window (parity
    role: the reference re-runs with Native algo when igemm can't apply).
    """
    from ..gather_gemm import gather_mm

    n_in, c = features.shape
    kv, n_out = pair_fwd.shape
    pad_out = -(-n_out // tile) * tile
    if pad_out != n_out:
        pair_fwd = jnp.concatenate(
            [pair_fwd, jnp.full((kv, pad_out - n_out), -1, pair_fwd.dtype)],
            axis=1)
    # zero row at index n_in, then pad rows so every window DMA is in
    # bounds and aligned; when 128 % c == 0 use the row-packed kernel
    # (cuts DMA/one-hot/matmul by pack=128/c), else pad channels to the
    # 128-lane tile
    pack = 128 // c if (128 % c == 0 and c <= 128) else 0
    packed = pack >= 1 and window % (16 * pack) == 0
    align = 16 * pack if packed else 16
    n_pad = max(window, -(-(n_in + 1) // align) * align)
    plan = build_igemm_plan(pair_fwd, n_pad - 1, tile=tile, window=window,
                            align=align)
    if packed:
        featz = jnp.zeros((n_pad, c), features.dtype)
        featz = jax.lax.dynamic_update_slice(featz, features, (0, 0))
        featp = featz.reshape(n_pad // pack, 128)

        def fast(_):
            f = (igemm_tile_matmul_batched if batched
                 else igemm_tile_matmul_packed)
            return f(featp, weight_kv, plan, tile=tile, window=window,
                     pack=pack, interpret=interpret)
    else:
        c_pad = -(-c // 128) * 128
        featz = jnp.zeros((n_pad, c_pad), features.dtype)
        featz = jax.lax.dynamic_update_slice(featz, features, (0, 0))
        if c_pad != c:
            weight_pad = jnp.concatenate(
                [weight_kv,
                 jnp.zeros((kv, c_pad - c, weight_kv.shape[2]),
                           weight_kv.dtype)], axis=1)
        else:
            weight_pad = weight_kv

        def fast(_):
            return igemm_tile_matmul(featz, weight_pad, plan, tile=tile,
                                     window=window, interpret=interpret)

    if fallback:
        def slow(_):
            out = gather_mm(features, weight_kv, pair_fwd, None,
                            jnp.float32, out_dtype=features.dtype)
            return out

        out = jax.lax.cond(plan.overflow == 0, fast, slow, operand=None)
    else:
        out = fast(None)
    return out[:n_out]
