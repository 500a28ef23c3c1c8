"""BDOF — bi-directional optical flow refinement of bi-prediction.

TPU-native analog of the reference BDOF (reference:
source/Lib/CommonLib/InterPrediction.cpp — xCalcBIOPar/applyBiOptFlow
region around :928; per-4x4-subblock flow (vx, vy) from the two internal
predictions' gradients, correction added before the bi average; luma only;
nearest-neighbor border padding per block,
InterPrediction.cpp:858 xNearestNeighborPaddingForBDOF).

Normative and signaling-free: both sides derive the same correction from
the two motion-compensated internal-precision predictions, so encoder and
decoder share this exact function (the bit-exactness oracle covers it).

Design: the reference runs a scalar loop per subblock; here every 4x4
subblock of every bi block in the frame is one lane of a batched
gradient/reduction pipeline — pure VPU, integer-deterministic.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import interp


def _grad(p: jnp.ndarray):
    """Central-difference gradients with edge padding, per block.
    p: (B, s, s) internal precision."""
    px = jnp.pad(p, ((0, 0), (0, 0), (1, 1)), mode="edge")
    py = jnp.pad(p, ((0, 0), (1, 1), (0, 0)), mode="edge")
    gx = (px[:, :, 2:] - px[:, :, :-2]) >> 4
    gy = (py[:, 2:, :] - py[:, :-2, :]) >> 4
    return gx, gy


def _to_sub(x: jnp.ndarray, s: int):
    """(B, s, s) -> (B * (s/4)^2, 4, 4) subblock batch."""
    b = x.shape[0]
    n = s // 4
    return (x.reshape(b, n, 4, n, 4).transpose(0, 1, 3, 2, 4)
            .reshape(b * n * n, 4, 4))


def _from_sub(x: jnp.ndarray, b: int, s: int):
    n = s // 4
    return (x.reshape(b, n, n, 4, 4).transpose(0, 1, 3, 2, 4)
            .reshape(b, s, s))


def bdof_bi(int0: jnp.ndarray, int1: jnp.ndarray, bit_depth: int
            ) -> jnp.ndarray:
    """BDOF-refined bi-prediction of block-batched internal predictions.

    Args:
      int0/int1: (B, s, s) int32 internal (14-bit) L0/L1 predictions.
    Returns (B, s, s) pixel-domain bi prediction with per-4x4 flow.
    """
    b, s, _ = int0.shape
    gx0, gy0 = _grad(int0)
    gx1, gy1 = _grad(int1)
    d = (int0 >> 4) - (int1 >> 4)            # reduced-precision difference
    gxs = _to_sub((gx0 + gx1) >> 1, s)
    gys = _to_sub((gy0 + gy1) >> 1, s)
    ds = _to_sub(d, s)
    # simplified VVC normal equations with sign/abs sums (integer)
    s1 = jnp.sum(jnp.abs(gxs), axis=(1, 2))
    s3 = jnp.sum(jnp.where(gxs > 0, ds, jnp.where(gxs < 0, -ds, 0)),
                 axis=(1, 2))
    vx = jnp.where(s1 > 0, jnp.clip((s3 << 3) // jnp.maximum(s1, 1),
                                    -32, 32), 0)
    s5 = jnp.sum(jnp.abs(gys), axis=(1, 2))
    # remove the vx-explained part before solving vy (vx is s3/s1 in 1/8
    # units, so its d-contribution is (vx * gxs) >> 3)
    rem = ds - ((vx[:, None, None] * gxs) >> 3)
    s6 = jnp.sum(jnp.where(gys > 0, rem, jnp.where(gys < 0, -rem, 0)),
                 axis=(1, 2))
    vy = jnp.where(s5 > 0, jnp.clip((s6 << 3) // jnp.maximum(s5, 1),
                                    -32, 32), 0)
    # correction in the internal P0+P1 sum domain.  Scales (any bit depth):
    # vx = -8*delta (delta = true half-displacement, px), dgx =
    # (f'0-f'1)*2^(11-bd) = -2*delta*f''*2^(11-bd).  The average's error is
    # +delta^2 f''/2; adding half the first-order flow term cancels it to
    # second order (the same /2 as the reference's b-term): corr_sum =
    # delta*(f'0-f'1)/4 * 2^(15-bd) = -(vx*dgx) >> 1.
    dgx = _to_sub(gx0 - gx1, s)
    dgy = _to_sub(gy0 - gy1, s)
    corr = -((vx[:, None, None] * dgx + vy[:, None, None] * dgy) >> 1)
    corr = _from_sub(corr, b, s)
    shift = interp.IF_INTERNAL_PREC + 1 - bit_depth
    off = 1 << (shift - 1)
    return jnp.clip((int0 + int1 + corr + off) >> shift, 0,
                    (1 << bit_depth) - 1)


def combine_bi_bdof(int0, int1, dirs, nby, nbx, bit_depth: int):
    """Drop-in replacement for inter_frame._combine_bi with BDOF applied to
    the bi-predicted (dirs == 2) luma blocks."""
    d = dirs.reshape(-1)[:, None, None]
    uni0 = interp.finalize_uni(int0, bit_depth)
    uni1 = interp.finalize_uni(int1, bit_depth)
    bi = bdof_bi(int0, int1, bit_depth)
    sel = jnp.where(d == 2, bi, jnp.where(d == 1, uni1, uni0))
    from .inter_frame import _from_blocks
    return _from_blocks(sel, nby, nbx)
