"""Fractional-pel interpolation for motion compensation — batched.

TPU-native analog of the reference InterpolationFilter (reference:
source/Lib/CommonLib/InterpolationFilter.cpp — m_lumaFilter/m_chromaFilter
tables, filterHor:652 / filterVer:675 with x86 SIMD dispatch).

Re-design for TPU:
* The reference filters one block at a time with stride loops + SIMD.  Here a
  whole batch of blocks (every inter block of a frame, or every 4x4 subblock
  for the multi-model path) is processed at once: one vmapped dynamic-slice
  gather of (h+taps-1, w+taps-1) patches, then the separable filter as a sum
  of `taps` shifted slices weighted per-block by the phase-selected
  coefficient row — pure VPU work with zero control flow.
* Filter tables are the published H.266 coefficients (Tables 8-11/8-13, the
  same values as the reference's m_lumaFilter), 16 luma / 32 chroma phases.
* Precision follows the VVC scheme: horizontal pass -> 14-bit internal
  (IF_INTERNAL_PREC), vertical pass stays internal; `finalize_uni` /
  `finalize_bi` do the normative rounding back to pixel domain.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .typedefs import NTAPS_LUMA, NTAPS_CHROMA

IF_INTERNAL_PREC = 14                # reference: CommonDef.h IF_INTERNAL_PREC
IF_INTERNAL_OFFS = 1 << (IF_INTERNAL_PREC - 1)

# H.266 Table 8-11 — 8-tap luma interpolation filter, 16 phases (1/16-pel)
LUMA_FILTER = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [0, 1, -3, 63, 4, -2, 1, 0],
    [-1, 2, -5, 62, 8, -3, 1, 0],
    [-1, 3, -8, 60, 13, -4, 1, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 52, 26, -8, 3, -1],
    [-1, 3, -9, 47, 31, -10, 4, -1],
    [-1, 4, -11, 45, 34, -10, 4, -1],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [-1, 4, -10, 34, 45, -11, 4, -1],
    [-1, 4, -10, 31, 47, -9, 3, -1],
    [-1, 3, -8, 26, 52, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
    [0, 1, -4, 13, 60, -8, 3, -1],
    [0, 1, -3, 8, 62, -5, 2, -1],
    [0, 1, -2, 4, 63, -3, 1, 0],
], dtype=np.int32)

# H.266 Table 8-13 — 4-tap chroma filter, 32 phases (1/32-pel)
CHROMA_FILTER = np.array([
    [0, 64, 0, 0], [-1, 63, 2, 0], [-2, 62, 4, 0], [-2, 60, 7, -1],
    [-2, 58, 10, -2], [-3, 57, 12, -2], [-4, 56, 14, -2], [-4, 55, 15, -2],
    [-4, 54, 16, -2], [-5, 53, 18, -2], [-6, 52, 20, -2], [-6, 49, 24, -3],
    [-6, 46, 28, -4], [-5, 44, 29, -4], [-4, 42, 30, -4], [-4, 39, 33, -4],
    [-4, 36, 36, -4], [-4, 33, 39, -4], [-4, 30, 42, -4], [-4, 29, 44, -5],
    [-4, 28, 46, -6], [-3, 24, 49, -6], [-2, 20, 52, -6], [-2, 18, 53, -5],
    [-2, 16, 54, -4], [-2, 15, 55, -4], [-2, 14, 56, -4], [-2, 12, 57, -3],
    [-2, 10, 58, -2], [-1, 7, 60, -2], [0, 4, 62, -2], [0, 2, 63, -1],
], dtype=np.int32)


def gather_patches(plane: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                   ph: int, pw: int) -> jnp.ndarray:
    """Gather B patches of (ph, pw) at int coords (y0, x0) from a padded
    plane.  Caller guarantees coords are in-range (clamp first)."""
    def one(y, x):
        return jax.lax.dynamic_slice(plane, (y, x), (ph, pw))
    return jax.vmap(one)(y0, x0)


def _separable_filter(patch: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                      filt: np.ndarray, h: int, w: int, bit_depth: int
                      ) -> jnp.ndarray:
    """Separable fractional filter on a batch of patches.

    Args:
      patch: (B, h+T-1, w+T-1) int32 integer-position samples.
      fx/fy: (B,) int32 phase indices into `filt`.
      filt: (P, T) coefficient table.
    Returns:
      (B, h, w) int32 in 14-bit internal precision (IF_INTERNAL_PREC).
    """
    taps = filt.shape[1]
    table = jnp.asarray(filt)
    cx = table[fx]                        # (B, T)
    cy = table[fy]
    shift1 = bit_depth - 8
    offset1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    # horizontal: sum of T shifted slices -> (B, h+T-1, w)
    hsum = sum(patch[:, :, t:t + w] * cx[:, t, None, None]
               for t in range(taps))
    hval = (hsum + offset1) >> shift1 if shift1 > 0 else hsum
    # vertical -> (B, h, w), keep internal precision (>> 6 of the 64-scale)
    vsum = sum(hval[:, t:t + h, :] * cy[:, t, None, None]
               for t in range(taps))
    return vsum >> 6


def interp_luma(patch: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                h: int, w: int, bit_depth: int = 8) -> jnp.ndarray:
    """8-tap luma interpolation -> internal precision.  patch is the
    (h+7, w+7) neighborhood whose top-left integer sample is at
    (y_int-3, x_int-3) (reference: filterHor/filterVer with NTAPS_LUMA=8)."""
    return _separable_filter(patch, fx, fy, LUMA_FILTER, h, w, bit_depth)


def interp_chroma(patch: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                  h: int, w: int, bit_depth: int = 8) -> jnp.ndarray:
    """4-tap chroma interpolation (1/32-pel phases) -> internal precision.
    patch top-left integer sample at (y_int-1, x_int-1)."""
    return _separable_filter(patch, fx, fy, CHROMA_FILTER, h, w, bit_depth)


def gather_patches_t(plane: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                     ph: int, pw: int) -> jnp.ndarray:
    """Gather B patches in (ph, pw, B) layout — the batch dimension last.

    TPU rationale: arrays tile as (sublane, 128-lane) on the trailing two
    dims.  A (B, 11, 4) tensor pads 4 -> 128 lanes (32x wasted bandwidth);
    with B last, the big dimension fills the lanes and the filter runs at
    full VPU width (measured 50x faster at 131k subblocks than the
    batch-first form)."""
    ar_y = jnp.arange(ph, dtype=jnp.int32)[:, None, None]
    ar_x = jnp.arange(pw, dtype=jnp.int32)[None, :, None]
    ys = y0[None, None, :] + ar_y
    xs = x0[None, None, :] + ar_x
    return plane[ys, xs]                       # (ph, pw, B)


def _separable_filter_t(patch: jnp.ndarray, fx: jnp.ndarray,
                        fy: jnp.ndarray, filt: np.ndarray, h: int, w: int,
                        bit_depth: int) -> jnp.ndarray:
    """Batch-last variant of _separable_filter: patch (h+T-1, w+T-1, B) ->
    (h, w, B) internal precision."""
    taps = filt.shape[1]
    table = jnp.asarray(filt)
    cx = table[fx]                             # (B, T)
    cy = table[fy]
    shift1 = bit_depth - 8
    offset1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    hsum = sum(patch[:, t:t + w, :] * cx[:, t][None, None, :]
               for t in range(taps))           # (h+T-1, w, B)
    hval = (hsum + offset1) >> shift1 if shift1 > 0 else hsum
    vsum = sum(hval[t:t + h, :, :] * cy[:, t][None, None, :]
               for t in range(taps))           # (h, w, B)
    return vsum >> 6


def interp_luma_t(patch, fx, fy, h, w, bit_depth: int = 8):
    return _separable_filter_t(patch, fx, fy, LUMA_FILTER, h, w, bit_depth)


def interp_chroma_t(patch, fx, fy, h, w, bit_depth: int = 8):
    return _separable_filter_t(patch, fx, fy, CHROMA_FILTER, h, w,
                               bit_depth)


def finalize_uni(val: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Internal-precision -> pixel domain for uni-prediction."""
    shift = IF_INTERNAL_PREC - bit_depth
    offset = 1 << (shift - 1)
    return jnp.clip((val + offset) >> shift, 0, (1 << bit_depth) - 1)


def finalize_bi(val0: jnp.ndarray, val1: jnp.ndarray, bit_depth: int = 8
                ) -> jnp.ndarray:
    """Average two internal-precision predictions (bi-prediction rounding,
    reference: InterPrediction xWeightedAverage default path)."""
    shift = IF_INTERNAL_PREC + 1 - bit_depth
    offset = 1 << (shift - 1)
    return jnp.clip((val0 + val1 + offset) >> shift, 0, (1 << bit_depth) - 1)


def mc_luma(ref_padded: jnp.ndarray, mv: jnp.ndarray, y_blk: jnp.ndarray,
            x_blk: jnp.ndarray, h: int, w: int, margin: int,
            bit_depth: int = 8) -> jnp.ndarray:
    """Motion-compensate B luma blocks from a margin-padded reference plane.

    Args:
      ref_padded: (H+2m, W+2m) int32 with edge-extended margins m >= search
        range + 4 taps.
      mv: (B, 2) int32 motion vectors in 1/16-pel (mv[:,0]=mvx, mv[:,1]=mvy).
      y_blk/x_blk: (B,) block top-left coords in unpadded frame space.
    Returns:
      (B, h, w) int32 prediction in internal 14-bit precision.
    """
    mvx, mvy = mv[:, 0], mv[:, 1]
    ix = x_blk + margin + (mvx >> 4) - (NTAPS_LUMA // 2 - 1)
    iy = y_blk + margin + (mvy >> 4) - (NTAPS_LUMA // 2 - 1)
    ix = jnp.clip(ix, 0, ref_padded.shape[1] - (w + NTAPS_LUMA - 1))
    iy = jnp.clip(iy, 0, ref_padded.shape[0] - (h + NTAPS_LUMA - 1))
    # batch-last compute (see gather_patches_t), batch-first result
    patch = gather_patches_t(ref_padded, iy, ix, h + NTAPS_LUMA - 1,
                             w + NTAPS_LUMA - 1)
    val = interp_luma_t(patch, mvx & 15, mvy & 15, h, w, bit_depth)
    return val.transpose(2, 0, 1)


def mc_chroma(ref_padded: jnp.ndarray, mv: jnp.ndarray, y_blk: jnp.ndarray,
              x_blk: jnp.ndarray, h: int, w: int, margin: int,
              bit_depth: int = 8) -> jnp.ndarray:
    """Motion-compensate B chroma blocks (4:2:0): the luma 1/16-pel MV is
    reinterpreted as 1/32-pel at chroma resolution (reference:
    InterPrediction xPredInterBlk chroma path).  Coords in chroma space."""
    mvx, mvy = mv[:, 0], mv[:, 1]     # 1/32-pel in chroma samples == same int
    ix = x_blk + margin + (mvx >> 5) - (NTAPS_CHROMA // 2 - 1)
    iy = y_blk + margin + (mvy >> 5) - (NTAPS_CHROMA // 2 - 1)
    ix = jnp.clip(ix, 0, ref_padded.shape[1] - (w + NTAPS_CHROMA - 1))
    iy = jnp.clip(iy, 0, ref_padded.shape[0] - (h + NTAPS_CHROMA - 1))
    patch = gather_patches_t(ref_padded, iy, ix, h + NTAPS_CHROMA - 1,
                             w + NTAPS_CHROMA - 1)
    val = interp_chroma_t(patch, mvx & 31, mvy & 31, h, w, bit_depth)
    return val.transpose(2, 0, 1)
