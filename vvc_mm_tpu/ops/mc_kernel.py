"""Pallas TPU kernel v2: position-based subblock MC at VPU speed.

Why this exists (measured on TPU v5e, this round): XLA lowers every
per-subblock patch read to a gather whose cost is ~1.45 us per slice
DESCRIPTOR regardless of slice size — 131k subblocks cost ~190 ms per
frame-candidate no matter how the gather is phrased (advanced indexing,
vmapped dynamic_slice, lax.gather with big slice_sizes: all ~200 ms).
The MM search runs hundreds of candidate evaluations per frame, so the
XLA formulation is the whole encoder's bottleneck (reference hot spot:
InterPrediction.cpp:683-860 xPredInterBlkMM; SURVEY.md §3.3 "#1 Pallas
kernel target").

Design (the round-1 Mosaic blockers and their fixes):
  * whole padded reference lives in VMEM (int32 2K ERP plane ~10 MB);
    per-subblock reads are VECTOR LOADS, not DMA descriptors.
  * dynamic loads must be 8-sublane / 128-lane aligned -> load an aligned
    (24, 256) superpatch at (8*(y//8), 128*(x//128)) and rotate it into
    place with pltpu.roll (dynamic rotate is supported); the (11, 11)
    patch is then a static slice.
  * stores must be lane-aligned -> per-subblock 4x4 results are rolled
    into a (8, 128) accumulator register and flushed to the output row
    every 32 subblocks at 128-aligned lane offsets.
  * per-subblock scalars (aligned base, rotate amounts, filter phases)
    are precomputed by the caller and streamed through SMEM row blocks;
    the 16x8 filter table is read coefficient-by-coefficient from SMEM.

Numerics are bit-identical to common/interp.py (same shift/round/clip),
asserted by tests/test_mc_kernel.py in interpret mode and on hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import interp
from ..common.typedefs import NTAPS_LUMA, NTAPS_CHROMA

SUP_H, SUP_W = 24, 256         # aligned superpatch (sublanes, lanes)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_ref(ref_padded: jnp.ndarray):
    """Pad the reference so the kernel's aligned superpatch loads stay
    in-bounds AND 8/128-aligned: height to a multiple of 8 (>= 24), width
    to a multiple of 128 (>= 256).  The pad is never part of a result —
    after the rolls only the original (11, 11) window survives."""
    hp0, wp0 = ref_padded.shape
    hp = max(_round_up(hp0, 8), SUP_H)
    wp = max(_round_up(wp0, 128), SUP_W)
    if (hp, wp) != (hp0, wp0):
        ref_padded = jnp.pad(ref_padded, ((0, hp - hp0), (0, wp - wp0)))
    return ref_padded


def _prep_luma_scalars(orig_shape, padded_shape, positions, margin):
    """Host/XLA-side: aligned bases + rotate amounts + phases, flattened.
    Clips match the XLA path (mm/mc.py) on the ORIGINAL plane shape ->
    bit-identical; the aligned base + rotate amounts satisfy dy <= 13,
    dx <= 245 so the (11, 11) window always fits the (24, 256) superpatch."""
    hp0, wp0 = orig_shape
    hp, wp = padded_shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    yi = (pos[:, 1] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    xi = jnp.clip(xi, 0, wp0 - (4 + NTAPS_LUMA - 1))
    yi = jnp.clip(yi, 0, hp0 - (4 + NTAPS_LUMA - 1))
    ys = jnp.minimum((yi // 8) * 8, hp - SUP_H)
    xs = jnp.minimum((xi // 128) * 128, wp - SUP_W)
    dy = (yi - ys).astype(jnp.int32)
    dx = (xi - xs).astype(jnp.int32)
    fx = (pos[:, 0] & 15).astype(jnp.int32)
    fy = (pos[:, 1] & 15).astype(jnp.int32)
    return (ys.astype(jnp.int32), xs.astype(jnp.int32), dy, dx, fx, fy)


def _luma_filter_patch(patch, cx, cy, shift1, offs1):
    """(11, 11) int32 patch + coefficient lists -> (4, 4) internal-precision
    values (bit-identical to interp._separable_filter)."""
    hsum = patch[:, 0:4] * cx[0]
    for t in range(1, NTAPS_LUMA):
        hsum = hsum + patch[:, t:t + 4] * cx[t]
    if shift1 > 0:
        hsum = (hsum + offs1) >> shift1
    vsum = hsum[0:4, :] * cy[0]
    for t in range(1, NTAPS_LUMA):
        vsum = vsum + hsum[t:t + 4, :] * cy[t]
    return vsum >> 6


def _mc_luma_kernel(nsx: int, bit_depth: int, rows_per_step: int):
    shift1 = bit_depth - 8
    offs1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    fin_shift = interp.IF_INTERNAL_PREC - bit_depth
    fin_offs = 1 << (fin_shift - 1)
    maxv = (1 << bit_depth) - 1
    n_tiles = nsx // 32

    def kernel(ys_ref, xs_ref, dy_ref, dx_ref, fx_ref, fy_ref, filt_ref,
               ref_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        for r in range(rows_per_step):          # static subblock row in step
            def tile_body(tile, _):
                def sb_body(ci, acc):
                    c = tile * 32 + ci
                    ys = pl.multiple_of(ys_ref[r * nsx + c], 8)
                    xs = pl.multiple_of(xs_ref[r * nsx + c], 128)
                    dy = dy_ref[r * nsx + c]
                    dx = dx_ref[r * nsx + c]
                    sp = ref_ref[pl.ds(ys, SUP_H), pl.ds(xs, SUP_W)]
                    sp = pltpu.roll(sp, SUP_H - dy, 0)
                    sp = pltpu.roll(sp, SUP_W - dx, 1)
                    patch = sp[0:11, 0:11]
                    fxv = fx_ref[r * nsx + c]
                    fyv = fy_ref[r * nsx + c]
                    cx = [filt_ref[fxv, t] for t in range(NTAPS_LUMA)]
                    cy = [filt_ref[fyv, t] for t in range(NTAPS_LUMA)]
                    val = _luma_filter_patch(patch, cx, cy, shift1, offs1)
                    pix = jnp.clip((val + fin_offs) >> fin_shift, 0, maxv)
                    pix8 = jnp.pad(pix, ((0, 4), (0, 124)))
                    pix8 = jnp.where((row < 4) & (lane < 4), pix8, 0)
                    return acc + pltpu.roll(pix8, 4 * ci, 1)

                acc = jax.lax.fori_loop(
                    0, 32, sb_body, jnp.zeros((8, 128), jnp.int32))
                out_ref[pl.ds(4 * r, 4),
                        pl.ds(pl.multiple_of(tile * 128, 128), 128)] = \
                    acc[0:4, :]
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


def _rows_per_step(nsy: int, nsx: int, base: int, strict: bool
                   ) -> int | None:
    rows_per_step = base
    while (rows_per_step * nsx) % 1024 != 0 \
            and rows_per_step * 2 <= nsy and nsy % (rows_per_step * 2) == 0:
        rows_per_step *= 2
    if strict and (rows_per_step * nsx) % 1024 != 0:
        return None
    return rows_per_step


def sad_rows_per_step(nsy: int, nsx: int, k: int, strict: bool = True
                      ) -> int | None:
    """Subblock rows per grid step for the multi-candidate SAD kernel
    (SMEM blocks hold k candidate streams per row; the output band block
    needs rows_per_step % 8 == 0), or None when the constraints cannot
    be met — fall back to per-candidate MC + XLA reduction."""
    if nsx % 32 != 0 or nsy % 2 != 0:
        return None
    if not strict:
        return min(2, nsy)      # interpret mode: no layout constraint
    rows_per_step = 8
    while ((rows_per_step * k * nsx) % 1024 != 0
           and rows_per_step * 2 <= nsy
           and nsy % (rows_per_step * 2) == 0):
        rows_per_step *= 2
    if (nsy % rows_per_step != 0
            or (rows_per_step * k * nsx) % 1024 != 0):
        return None
    return rows_per_step


def luma_rows_per_step(nsy: int, nsx: int, strict: bool = True
                       ) -> int | None:
    """Subblock rows per grid step for the luma kernels, or None when the
    SMEM scalar blocks cannot be 1024-aligned for this shape (the caller
    must then use the XLA gather path — a misaligned block reproduces the
    Mosaic SMEM layout mismatch on real TPU).  strict=False returns the
    best-effort value for interpret mode, which has no layout constraint."""
    if nsx % 32 != 0 or nsy % 2 != 0:
        return None
    return _rows_per_step(nsy, nsx, 2, strict)


@functools.partial(jax.jit,
                   static_argnames=("margin", "bit_depth", "interpret"))
def mc_luma_positions(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                      margin: int, bit_depth: int = 8,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for common.mm.mc.mc_luma_positions."""
    nsy, nsx, _ = positions.shape
    orig_shape = ref_padded.shape
    ref_padded = _pad_ref(ref_padded.astype(jnp.int32))
    # SMEM scalar blocks must match XLA's int32 tiling (1024 elements) —
    # grow rows_per_step until rows_per_step*nsx is 1024-aligned (e.g.
    # the column-subsampled search positions have nsx 256 -> 4 rows)
    rows_per_step = luma_rows_per_step(nsy, nsx, strict=not interpret)
    assert rows_per_step is not None, (nsy, nsx)
    scal = _prep_luma_scalars(orig_shape, ref_padded.shape, positions,
                              margin)
    scal = [s.reshape(-1) for s in scal]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsy // rows_per_step,),
        in_specs=[pl.BlockSpec((rows_per_step * nsx,), lambda j: (j,),
                               memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM),     # filter table
           pl.BlockSpec(memory_space=pltpu.VMEM)],    # whole ref plane
        out_specs=pl.BlockSpec((rows_per_step * 4, nsx * 4),
                               lambda j: (j, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mc_luma_kernel(nsx, bit_depth, rows_per_step),
        out_shape=jax.ShapeDtypeStruct((nsy * 4, nsx * 4), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scal, jnp.asarray(interp.LUMA_FILTER), ref_padded)


def _sad_luma_kernel_multi(nsx: int, bit_depth: int, rows_per_step: int,
                           n_cands: int):
    """Fused multi-candidate predict+|diff| kernel: for each of n_cands
    candidate position fields, build the 32-subblock prediction band
    exactly like _mc_luma_kernel (aligned accumulator), subtract the
    SHARED aligned orig band, and store per-lane column sums.  The
    4-lane fold to per-subblock SADs happens in XLA (cheap reduce over a
    (n_cands, nsy, nsx*4) array).  No prediction writeback, K fewer orig
    round-trips and no separate per-candidate diff/reduce passes — the
    model-search inner loop (reference hot spot: InterSearch.cpp:4937
    xMotionEstimation / InterPrediction.cpp:683 xPredInterBlkMM)."""
    shift1 = bit_depth - 8
    offs1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    fin_shift = interp.IF_INTERNAL_PREC - bit_depth
    fin_offs = 1 << (fin_shift - 1)
    maxv = (1 << bit_depth) - 1
    n_tiles = nsx // 32

    def kernel(ys_ref, xs_ref, dy_ref, dx_ref, fx_ref, fy_ref, filt_ref,
               ref_ref, orig_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        for r in range(rows_per_step):          # static subblock row in step
            def tile_body(tile, _):
                ob = orig_ref[pl.ds(4 * r, 4),
                              pl.ds(pl.multiple_of(tile * 128, 128), 128)]

                for k in range(n_cands):        # static candidate index
                    def sb_body(ci, acc):
                        c = tile * 32 + ci
                        # SMEM layout per step: [r][candidate][c]
                        o = (r * n_cands + k) * nsx + c
                        ys = pl.multiple_of(ys_ref[o], 8)
                        xs = pl.multiple_of(xs_ref[o], 128)
                        sp = ref_ref[pl.ds(ys, SUP_H), pl.ds(xs, SUP_W)]
                        sp = pltpu.roll(sp, SUP_H - dy_ref[o], 0)
                        sp = pltpu.roll(sp, SUP_W - dx_ref[o], 1)
                        patch = sp[0:11, 0:11]
                        fxv = fx_ref[o]
                        fyv = fy_ref[o]
                        cx = [filt_ref[fxv, t] for t in range(NTAPS_LUMA)]
                        cy = [filt_ref[fyv, t] for t in range(NTAPS_LUMA)]
                        val = _luma_filter_patch(patch, cx, cy, shift1,
                                                 offs1)
                        pix = jnp.clip((val + fin_offs) >> fin_shift, 0,
                                       maxv)
                        pix8 = jnp.pad(pix, ((0, 4), (0, 124)))
                        pix8 = jnp.where((row < 4) & (lane < 4), pix8, 0)
                        return acc + pltpu.roll(pix8, 4 * ci, 1)

                    acc = jax.lax.fori_loop(
                        0, 32, sb_body, jnp.zeros((8, 128), jnp.int32))
                    d = jnp.abs(acc[0:4, :] - ob)
                    colsum = jnp.sum(d, axis=0, keepdims=True)
                    out_ref[k, pl.ds(r, 1),
                            pl.ds(pl.multiple_of(tile * 128, 128), 128)] \
                        = colsum
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("margin", "bit_depth", "interpret"))
def sad_luma_positions_multi(ref_padded: jnp.ndarray, orig: jnp.ndarray,
                             positions: jnp.ndarray, margin: int,
                             bit_depth: int = 8, interpret: bool = False
                             ) -> jnp.ndarray:
    """Multi-candidate fused SAD: positions (K, nsy, nsx, 2) candidate
    fields over the same subblock grid; orig is the (nsy*4, nsx*4)
    (possibly search-subsampled) original plane.  Returns (K, nsy, nsx)
    int32 per-subblock SADs, bit-identical to predicting each field with
    mc_luma_positions and reducing |orig - pred| per 4x4 subblock."""
    k, nsy, nsx, _ = positions.shape
    orig_shape = ref_padded.shape
    ref_padded = _pad_ref(ref_padded.astype(jnp.int32))
    rows_per_step = sad_rows_per_step(nsy, nsx, k, strict=not interpret)
    assert rows_per_step is not None, (k, nsy, nsx)
    scal = _prep_luma_scalars(orig_shape, ref_padded.shape, positions,
                              margin)
    # layout: candidate-major per grid step — (K, nsy, nsx) sliced along
    # nsy so each step sees its rows for ALL candidates
    scal = [s.reshape(k, nsy, nsx).swapaxes(0, 1)
             .reshape(nsy, k * nsx).reshape(-1) for s in scal]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsy // rows_per_step,),
        in_specs=[pl.BlockSpec((rows_per_step * k * nsx,),
                               lambda j: (j,),
                               memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec((rows_per_step * 4, nsx * 4), lambda j: (j, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, rows_per_step, nsx * 4),
                               lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
    )
    bands = pl.pallas_call(
        _sad_luma_kernel_multi(nsx, bit_depth, rows_per_step, k),
        out_shape=jax.ShapeDtypeStruct((k, nsy, nsx * 4), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scal, jnp.asarray(interp.LUMA_FILTER), ref_padded,
      orig.astype(jnp.int32))
    return bands.reshape(k, nsy, nsx, 4).sum(axis=-1)


def sad_luma_positions(ref_padded: jnp.ndarray, orig: jnp.ndarray,
                       positions: jnp.ndarray, margin: int,
                       bit_depth: int = 8, interpret: bool = False
                       ) -> jnp.ndarray:
    """Single-candidate fused SAD (multi-candidate kernel with K=1).
    Returns (nsy, nsx) int32."""
    return sad_luma_positions_multi(ref_padded, orig, positions[None],
                                    margin, bit_depth, interpret)[0]


# ---------------------------------------------------------------------------
# Block-translational decision-SAD kernel: ONE patch per (candidate,
# BLOCK) instead of one per 4x4 subblock.  The model search ranks
# candidates by the SAD of each block's first 4-pixel row band sampled
# at the block-center's reprojected displacement (exact 8-tap
# interpolation; the GEOMETRY is approximated as locally translational,
# which cancels between neighboring candidates of a refinement step).
# Cuts the dominant per-patch costs (superpatch load, two dynamic rolls,
# scalar streams) by the number of subblocks per block.  NON-NORMATIVE:
# merge-field SADs and all reconstruction paths keep the exact
# per-subblock reprojection.
# ---------------------------------------------------------------------------


def _prep_block_scalars(orig_shape, padded_shape, positions, margin,
                        s: int):
    """Aligned bases + rotate amounts + phases for (11, s+7) patches."""
    hp0, wp0 = orig_shape
    hp, wp = padded_shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    yi = (pos[:, 1] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    xi = jnp.clip(xi, 0, wp0 - (s + NTAPS_LUMA - 1))
    yi = jnp.clip(yi, 0, hp0 - (4 + NTAPS_LUMA - 1))
    ys = jnp.minimum((yi // 8) * 8, hp - SUP_H)
    xs = jnp.minimum((xi // 128) * 128, wp - SUP_W)
    dy = (yi - ys).astype(jnp.int32)
    dx = (xi - xs).astype(jnp.int32)
    fx = (pos[:, 0] & 15).astype(jnp.int32)
    fy = (pos[:, 1] & 15).astype(jnp.int32)
    return (ys.astype(jnp.int32), xs.astype(jnp.int32), dy, dx, fx, fy)


def _sad_block_kernel_multi(nbx: int, s: int, bit_depth: int,
                            rows_per_step: int, n_cands: int):
    shift1 = bit_depth - 8
    offs1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    fin_shift = interp.IF_INTERNAL_PREC - bit_depth
    fin_offs = 1 << (fin_shift - 1)
    maxv = (1 << bit_depth) - 1
    bpt = 128 // s                 # blocks per 128-lane tile
    n_tiles = nbx // bpt

    def kernel(ys_ref, xs_ref, dy_ref, dx_ref, fx_ref, fy_ref, filt_ref,
               ref_ref, orig_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        for r in range(rows_per_step):      # static block row in step
            def tile_body(tile, _):
                ob = orig_ref[pl.ds(4 * r, 4),
                              pl.ds(pl.multiple_of(tile * 128, 128), 128)]

                for k in range(n_cands):
                    def blk_body(ci, acc):
                        c = tile * bpt + ci
                        o = (r * n_cands + k) * nbx + c
                        ys = pl.multiple_of(ys_ref[o], 8)
                        xs = pl.multiple_of(xs_ref[o], 128)
                        sp = ref_ref[pl.ds(ys, SUP_H), pl.ds(xs, SUP_W)]
                        sp = pltpu.roll(sp, SUP_H - dy_ref[o], 0)
                        sp = pltpu.roll(sp, SUP_W - dx_ref[o], 1)
                        patch = sp[0:11, 0:s + NTAPS_LUMA - 1]
                        fxv = fx_ref[o]
                        fyv = fy_ref[o]
                        cx = [filt_ref[fxv, t] for t in range(NTAPS_LUMA)]
                        cy = [filt_ref[fyv, t] for t in range(NTAPS_LUMA)]
                        hsum = patch[:, 0:s] * cx[0]
                        for t in range(1, NTAPS_LUMA):
                            hsum = hsum + patch[:, t:t + s] * cx[t]
                        if shift1 > 0:
                            hsum = (hsum + offs1) >> shift1
                        vsum = hsum[0:4, :] * cy[0]
                        for t in range(1, NTAPS_LUMA):
                            vsum = vsum + hsum[t:t + 4, :] * cy[t]
                        val = vsum >> 6
                        pix = jnp.clip((val + fin_offs) >> fin_shift, 0,
                                       maxv)
                        pix8 = jnp.pad(pix, ((0, 4), (0, 128 - s)))
                        pix8 = jnp.where((row < 4) & (lane < s), pix8, 0)
                        return acc + pltpu.roll(pix8, s * ci, 1)

                    acc = jax.lax.fori_loop(
                        0, bpt, blk_body, jnp.zeros((8, 128), jnp.int32))
                    d = jnp.abs(acc[0:4, :] - ob)
                    colsum = jnp.sum(d, axis=0, keepdims=True)
                    out_ref[k, pl.ds(r, 1),
                            pl.ds(pl.multiple_of(tile * 128, 128), 128)] \
                        = colsum
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


def _mc_block_kernel_multi(nbx: int, s: int, bit_depth: int,
                           rows_per_step: int, n_cands: int):
    """Band-MC variant of _sad_block_kernel_multi: writes each block's
    predicted 4-row band instead of its SAD (for decision stages that
    need pixels, e.g. the B-slice uni/bi combine)."""
    shift1 = bit_depth - 8
    offs1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    fin_shift = interp.IF_INTERNAL_PREC - bit_depth
    fin_offs = 1 << (fin_shift - 1)
    maxv = (1 << bit_depth) - 1
    bpt = 128 // s
    n_tiles = nbx // bpt

    def kernel(ys_ref, xs_ref, dy_ref, dx_ref, fx_ref, fy_ref, filt_ref,
               ref_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        for r in range(rows_per_step):
            def tile_body(tile, _):
                for k in range(n_cands):
                    def blk_body(ci, acc):
                        c = tile * bpt + ci
                        o = (r * n_cands + k) * nbx + c
                        ys = pl.multiple_of(ys_ref[o], 8)
                        xs = pl.multiple_of(xs_ref[o], 128)
                        sp = ref_ref[pl.ds(ys, SUP_H), pl.ds(xs, SUP_W)]
                        sp = pltpu.roll(sp, SUP_H - dy_ref[o], 0)
                        sp = pltpu.roll(sp, SUP_W - dx_ref[o], 1)
                        patch = sp[0:11, 0:s + NTAPS_LUMA - 1]
                        fxv = fx_ref[o]
                        fyv = fy_ref[o]
                        cx = [filt_ref[fxv, t] for t in range(NTAPS_LUMA)]
                        cy = [filt_ref[fyv, t] for t in range(NTAPS_LUMA)]
                        hsum = patch[:, 0:s] * cx[0]
                        for t in range(1, NTAPS_LUMA):
                            hsum = hsum + patch[:, t:t + s] * cx[t]
                        if shift1 > 0:
                            hsum = (hsum + offs1) >> shift1
                        vsum = hsum[0:4, :] * cy[0]
                        for t in range(1, NTAPS_LUMA):
                            vsum = vsum + hsum[t:t + 4, :] * cy[t]
                        val = vsum >> 6
                        pix = jnp.clip((val + fin_offs) >> fin_shift, 0,
                                       maxv)
                        pix8 = jnp.pad(pix, ((0, 4), (0, 128 - s)))
                        pix8 = jnp.where((row < 4) & (lane < s), pix8, 0)
                        return acc + pltpu.roll(pix8, s * ci, 1)

                    acc = jax.lax.fori_loop(
                        0, bpt, blk_body, jnp.zeros((8, 128), jnp.int32))
                    out_ref[k, pl.ds(4 * r, 4),
                            pl.ds(pl.multiple_of(tile * 128, 128), 128)] \
                        = acc[0:4, :]
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("margin", "s", "bit_depth",
                                    "interpret"))
def mc_block_positions_multi(ref_padded: jnp.ndarray,
                             positions: jnp.ndarray, margin: int, s: int,
                             bit_depth: int = 8, interpret: bool = False
                             ) -> jnp.ndarray:
    """Block-translational band MC for K candidate fields: returns each
    block's predicted first 4-pixel row band, (K, nby*4, nbx*s) int32."""
    k, nby, nbx, _ = positions.shape
    orig_shape = ref_padded.shape
    ref_padded = _pad_ref(ref_padded.astype(jnp.int32))
    rows_per_step = block_rows_per_step(nby, nbx, k, s,
                                        strict=not interpret)
    assert rows_per_step is not None, (k, nby, nbx, s)
    scal = _prep_block_scalars(orig_shape, ref_padded.shape, positions,
                               margin, s)
    scal = [x.reshape(k, nby, nbx).swapaxes(0, 1)
             .reshape(nby, k * nbx).reshape(-1) for x in scal]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nby // rows_per_step,),
        in_specs=[pl.BlockSpec((rows_per_step * k * nbx,),
                               lambda j: (j,),
                               memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, rows_per_step * 4, nbx * s),
                               lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mc_block_kernel_multi(nbx, s, bit_depth, rows_per_step, k),
        out_shape=jax.ShapeDtypeStruct((k, nby * 4, nbx * s), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scal, jnp.asarray(interp.LUMA_FILTER), ref_padded)


def block_rows_per_step(nby: int, nbx: int, k: int, s: int,
                        strict: bool = True) -> int | None:
    """Block rows per grid step for the block-SAD kernel, or None when
    the layout constraints cannot be met (fall back to XLA)."""
    # s <= 64: the (11, s+7) patch must fit the superpatch after the
    # lane roll (dx <= 127, dx + s + 7 <= 256)
    if s > 64 or 128 % s != 0 or nbx % (128 // s) != 0 or nbx * s < 128:
        return None
    if not strict:
        return min(2, nby)
    rows_per_step = 8
    while ((rows_per_step * k * nbx) % 1024 != 0
           and rows_per_step * 2 <= nby
           and nby % (rows_per_step * 2) == 0):
        rows_per_step *= 2
    if (nby % rows_per_step != 0
            or (rows_per_step * k * nbx) % 1024 != 0):
        return None
    return rows_per_step


@functools.partial(jax.jit,
                   static_argnames=("margin", "s", "bit_depth",
                                    "interpret"))
def sad_block_positions_multi(ref_padded: jnp.ndarray, orig_bands:
                              jnp.ndarray, positions: jnp.ndarray,
                              margin: int, s: int, bit_depth: int = 8,
                              interpret: bool = False) -> jnp.ndarray:
    """Block-translational decision SAD for K candidate fields.
    positions (K, nby, nbx, 2) = per-block top-left sample positions;
    orig_bands (nby*4, nbx*s) = each block's first 4-pixel row band.
    Returns (K, nby, nbx) int32 band SADs."""
    k, nby, nbx, _ = positions.shape
    orig_shape = ref_padded.shape
    ref_padded = _pad_ref(ref_padded.astype(jnp.int32))
    rows_per_step = block_rows_per_step(nby, nbx, k, s,
                                        strict=not interpret)
    assert rows_per_step is not None, (k, nby, nbx, s)
    scal = _prep_block_scalars(orig_shape, ref_padded.shape, positions,
                               margin, s)
    scal = [x.reshape(k, nby, nbx).swapaxes(0, 1)
             .reshape(nby, k * nbx).reshape(-1) for x in scal]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nby // rows_per_step,),
        in_specs=[pl.BlockSpec((rows_per_step * k * nbx,),
                               lambda j: (j,),
                               memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec((rows_per_step * 4, nbx * s), lambda j: (j, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, rows_per_step, nbx * s),
                               lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
    )
    bands = pl.pallas_call(
        _sad_block_kernel_multi(nbx, s, bit_depth, rows_per_step, k),
        out_shape=jax.ShapeDtypeStruct((k, nby, nbx * s), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scal, jnp.asarray(interp.LUMA_FILTER), ref_padded,
      orig_bands.astype(jnp.int32))
    return bands.reshape(k, nby, nbx, s).sum(axis=-1)


# ---------------------------------------------------------------------------
# Bilinear decision-SAD kernel: 2-tap interpolation for the model-search
# inner loop.  NON-NORMATIVE — it only ranks candidates; the selected
# (model, mv) is motion-compensated with the exact 8-tap path.  The
# reference uses the same trick for its decision-stage interpolation
# (2-tap bilinear DMVR stage, InterpolationFilter.h:59-68) and
# subsampled ME SADs (RdCost subShift).  Dropping the 8-tap filter
# removes the 16 per-subblock SMEM coefficient reads and shrinks the
# patch to 5x5, which is where the search kernel's cycles go.
# ---------------------------------------------------------------------------
SUP_HB = 16                    # bilinear superpatch rows (dy<=7 + 5 + pad)


def _prep_bilin_scalars(orig_shape, padded_shape, positions, margin):
    """Aligned bases + rotate amounts + phases for the bilinear kernel
    (patch 5x5: floor position, no filter-tap offset)."""
    hp0, wp0 = orig_shape
    hp, wp = padded_shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin
    yi = (pos[:, 1] >> 4) + margin
    xi = jnp.clip(xi, 0, wp0 - 5)
    yi = jnp.clip(yi, 0, hp0 - 5)
    ys = jnp.minimum((yi // 8) * 8, hp - SUP_HB)
    xs = jnp.minimum((xi // 128) * 128, wp - SUP_W)
    dy = (yi - ys).astype(jnp.int32)
    dx = (xi - xs).astype(jnp.int32)
    fx = (pos[:, 0] & 15).astype(jnp.int32)
    fy = (pos[:, 1] & 15).astype(jnp.int32)
    return (ys.astype(jnp.int32), xs.astype(jnp.int32), dy, dx, fx, fy)


def _sad_bilin_kernel_multi(nsx: int, rows_per_step: int, n_cands: int):
    n_tiles = nsx // 32

    def kernel(ys_ref, xs_ref, dy_ref, dx_ref, fx_ref, fy_ref,
               ref_ref, orig_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        for r in range(rows_per_step):
            def tile_body(tile, _):
                ob = orig_ref[pl.ds(4 * r, 4),
                              pl.ds(pl.multiple_of(tile * 128, 128), 128)]

                for k in range(n_cands):
                    def sb_body(ci, acc):
                        c = tile * 32 + ci
                        o = (r * n_cands + k) * nsx + c
                        ys = pl.multiple_of(ys_ref[o], 8)
                        xs = pl.multiple_of(xs_ref[o], 128)
                        sp = ref_ref[pl.ds(ys, SUP_HB), pl.ds(xs, SUP_W)]
                        sp = pltpu.roll(sp, SUP_HB - dy_ref[o], 0)
                        sp = pltpu.roll(sp, SUP_W - dx_ref[o], 1)
                        patch = sp[0:5, 0:5]
                        fxv = fx_ref[o]
                        fyv = fy_ref[o]
                        h = (patch[:, 0:4] * (16 - fxv)
                             + patch[:, 1:5] * fxv + 8) >> 4
                        pix = (h[0:4, :] * (16 - fyv)
                               + h[1:5, :] * fyv + 8) >> 4
                        pix8 = jnp.pad(pix, ((0, 4), (0, 124)))
                        pix8 = jnp.where((row < 4) & (lane < 4), pix8, 0)
                        return acc + pltpu.roll(pix8, 4 * ci, 1)

                    acc = jax.lax.fori_loop(
                        0, 32, sb_body, jnp.zeros((8, 128), jnp.int32))
                    d = jnp.abs(acc[0:4, :] - ob)
                    colsum = jnp.sum(d, axis=0, keepdims=True)
                    out_ref[k, pl.ds(r, 1),
                            pl.ds(pl.multiple_of(tile * 128, 128), 128)] \
                        = colsum
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("margin", "interpret"))
def sad_bilinear_positions_multi(ref_padded: jnp.ndarray,
                                 orig: jnp.ndarray,
                                 positions: jnp.ndarray, margin: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """Decision-only bilinear SAD for K candidate position fields.
    positions (K, nsy, nsx, 2); orig (nsy*4, nsx*4).  Returns
    (K, nsy, nsx) int32 — bit-identical to the XLA mirror
    (common.mm.mc.sad_bilinear_positions_xla)."""
    k, nsy, nsx, _ = positions.shape
    orig_shape = ref_padded.shape
    ref_padded = _pad_ref(ref_padded.astype(jnp.int32))
    rows_per_step = sad_rows_per_step(nsy, nsx, k, strict=not interpret)
    assert rows_per_step is not None, (k, nsy, nsx)
    scal = _prep_bilin_scalars(orig_shape, ref_padded.shape, positions,
                               margin)
    scal = [s.reshape(k, nsy, nsx).swapaxes(0, 1)
             .reshape(nsy, k * nsx).reshape(-1) for s in scal]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsy // rows_per_step,),
        in_specs=[pl.BlockSpec((rows_per_step * k * nsx,),
                               lambda j: (j,),
                               memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec((rows_per_step * 4, nsx * 4), lambda j: (j, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((k, rows_per_step, nsx * 4),
                               lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
    )
    bands = pl.pallas_call(
        _sad_bilin_kernel_multi(nsx, rows_per_step, k),
        out_shape=jax.ShapeDtypeStruct((k, nsy, nsx * 4), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scal, ref_padded, orig.astype(jnp.int32))
    return bands.reshape(k, nsy, nsx, 4).sum(axis=-1)


# ---------------------------------------------------------------------------
# Chroma kernel: 2x2 subblocks, 4-tap, 1/32-pel (reference chroma MC path)
# ---------------------------------------------------------------------------
SUP_HC = 16


def _prep_chroma_scalars(orig_shape, padded_shape, positions, margin):
    hp0, wp0 = orig_shape
    hp, wp = padded_shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 5) + margin - (NTAPS_CHROMA // 2 - 1)
    yi = (pos[:, 1] >> 5) + margin - (NTAPS_CHROMA // 2 - 1)
    xi = jnp.clip(xi, 0, wp0 - (2 + NTAPS_CHROMA - 1))
    yi = jnp.clip(yi, 0, hp0 - (2 + NTAPS_CHROMA - 1))
    ys = jnp.minimum((yi // 8) * 8, hp - SUP_HC)
    xs = jnp.minimum((xi // 128) * 128, wp - SUP_W)
    dy = (yi - ys).astype(jnp.int32)
    dx = (xi - xs).astype(jnp.int32)
    fx = (pos[:, 0] & 31).astype(jnp.int32)
    fy = (pos[:, 1] & 31).astype(jnp.int32)
    return (ys.astype(jnp.int32), xs.astype(jnp.int32), dy, dx, fx, fy)


def _mc_chroma_kernel(nsx: int, bit_depth: int, rows_per_step: int,
                      tile_w: int):
    shift1 = bit_depth - 8
    offs1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    fin_shift = interp.IF_INTERNAL_PREC - bit_depth
    fin_offs = 1 << (fin_shift - 1)
    maxv = (1 << bit_depth) - 1
    n_tiles = nsx // tile_w

    def kernel(ys_ref, xs_ref, dy_ref, dx_ref, fx_ref, fy_ref, filt_ref,
               ref_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        for r in range(rows_per_step):
            def tile_body(tile, _):
                def sb_body(ci, acc):
                    c = tile * tile_w + ci
                    ys = pl.multiple_of(ys_ref[r * nsx + c], 8)
                    xs = pl.multiple_of(xs_ref[r * nsx + c], 128)
                    sp = ref_ref[pl.ds(ys, SUP_HC), pl.ds(xs, SUP_W)]
                    sp = pltpu.roll(sp, SUP_HC - dy_ref[r * nsx + c], 0)
                    sp = pltpu.roll(sp, SUP_W - dx_ref[r * nsx + c], 1)
                    patch = sp[0:5, 0:5]
                    fxv = fx_ref[r * nsx + c]
                    fyv = fy_ref[r * nsx + c]
                    cx = [filt_ref[fxv, t] for t in range(NTAPS_CHROMA)]
                    cy = [filt_ref[fyv, t] for t in range(NTAPS_CHROMA)]
                    hsum = patch[:, 0:2] * cx[0]
                    for t in range(1, NTAPS_CHROMA):
                        hsum = hsum + patch[:, t:t + 2] * cx[t]
                    if shift1 > 0:
                        hsum = (hsum + offs1) >> shift1
                    vsum = hsum[0:2, :] * cy[0]
                    for t in range(1, NTAPS_CHROMA):
                        vsum = vsum + hsum[t:t + 2, :] * cy[t]
                    val = vsum >> 6
                    pix = jnp.clip((val + fin_offs) >> fin_shift, 0, maxv)
                    pix8 = jnp.pad(pix, ((0, 6), (0, 126)))
                    pix8 = jnp.where((row < 2) & (lane < 2), pix8, 0)
                    return acc + pltpu.roll(pix8, 2 * ci, 1)

                acc = jax.lax.fori_loop(
                    0, tile_w, sb_body, jnp.zeros((8, 128), jnp.int32))
                out_ref[pl.ds(2 * r, 2),
                        pl.ds(pl.multiple_of(tile * 2 * tile_w,
                                             2 * tile_w), 2 * tile_w)] = \
                    acc[0:2, 0:2 * tile_w]
                return 0

            jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


def chroma_rows_per_step(nsy: int, nsx: int, strict: bool = True
                         ) -> int | None:
    """Subblock rows per grid step for the chroma kernel, or None when the
    SMEM scalar blocks cannot be 1024-aligned for this shape (fall back to
    the XLA gather path)."""
    if (nsx % 64 != 0 and nsx > 64) or nsy % 4 != 0:
        return None
    return _rows_per_step(nsy, nsx, 4, strict)


@functools.partial(jax.jit,
                   static_argnames=("margin", "bit_depth", "interpret"))
def mc_chroma_positions(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                        margin: int, bit_depth: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for common.mm.mc.mc_chroma_positions (the shared
    luma position tensor reinterpreted at 1/32-pel chroma precision)."""
    nsy, nsx, _ = positions.shape
    tile_w = 64 if nsx % 64 == 0 else nsx
    assert tile_w <= 64 and nsy % 4 == 0
    orig_shape = ref_padded.shape
    ref_padded = _pad_ref(ref_padded.astype(jnp.int32))
    rows_per_step = chroma_rows_per_step(nsy, nsx, strict=not interpret)
    assert rows_per_step is not None, (nsy, nsx)
    scal = _prep_chroma_scalars(orig_shape, ref_padded.shape, positions,
                                margin)
    scal = [s.reshape(-1) for s in scal]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsy // rows_per_step,),
        in_specs=[pl.BlockSpec((rows_per_step * nsx,), lambda j: (j,),
                               memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM),
           pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_per_step * 2, nsx * 2),
                               lambda j: (j, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mc_chroma_kernel(nsx, bit_depth, rows_per_step, tile_w),
        out_shape=jax.ShapeDtypeStruct((nsy * 2, nsx * 2), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scal, jnp.asarray(interp.CHROMA_FILTER), ref_padded)
