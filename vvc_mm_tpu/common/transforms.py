"""Batched integer transforms (DCT-II / DST-VII / DCT-VIII) for TPU.

TPU-native re-design of the reference's TrQuant / TrQuant_EMT
(reference: source/Lib/CommonLib/TrQuant.cpp:723 xT, :799 xIT;
TrQuant_EMT.cpp:51-659 fastForwardDCT2_B2..B64 butterflies).

Instead of per-size hand-written butterflies, every transform is a pair of
int32 matrix multiplies over a *batch* of blocks — this is exactly what the
MXU wants: (B, H, W) x (W, W) and (H, H) x (B, H, W) contractions with
preferred_element_type=int32.  XLA tiles these onto the systolic array; no
Pallas needed for the transforms themselves.

Fixed-point scheme (matches VVC scaling so the quantizer design carries over):
  forward:  shift1 = log2(W) + bitDepth - 9 (after horizontal pass)
            shift2 = log2(H) + 6            (after vertical pass)
  inverse:  shift1 = 7 (clip to 16 bit), shift2 = 20 - bitDepth
  => coeff = orthonormal2D(X) * 2^(15 - bitDepth - (log2W+log2H)/2)
  For odd log2W+log2H the extra sqrt(2) is carried in the coefficient domain
  and compensated in quant/dequant (see quant.py), as in VVC.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import rom

MAX_COEFF = (1 << 15) - 1
MIN_COEFF = -(1 << 15)


def _rshift_round(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    if shift <= 0:
        return x << (-shift)
    return (x + (1 << (shift - 1))) >> shift


def _clip16(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, MIN_COEFF, MAX_COEFF)


@functools.partial(jax.jit, static_argnames=("tr_h", "tr_v", "bit_depth"))
def forward_transform(resid: jnp.ndarray, tr_h: int = rom.DCT2,
                      tr_v: int = rom.DCT2, bit_depth: int = 8) -> jnp.ndarray:
    """Forward 2-D transform of a batch of residual blocks.

    Args:
      resid: (B, H, W) int32 residuals in [-(2^bd-1), 2^bd-1].
      tr_h / tr_v: rom.DCT2 / rom.DST7 / rom.DCT8 per direction (MTS,
        reference: TrQuant.cpp:619 getTrTypes).
    Returns:
      (B, H, W) int32 coefficients, clipped to 16-bit dynamic range.
    """
    _, h, w = resid.shape
    log2w, log2h = w.bit_length() - 1, h.bit_length() - 1
    th = jnp.asarray(rom.tr_matrix(tr_h, w), dtype=jnp.int32)
    tv = jnp.asarray(rom.tr_matrix(tr_v, h), dtype=jnp.int32)
    shift1 = log2w + bit_depth - 9
    shift2 = log2h + 6
    # horizontal: contract W with rows of th -> (B, H, W)
    tmp = jnp.einsum("bhw,kw->bhk", resid, th,
                     preferred_element_type=jnp.int32)
    tmp = _clip16(_rshift_round(tmp, shift1))
    # vertical: contract H with rows of tv -> (B, H, W)
    out = jnp.einsum("bhk,lh->blk", tmp, tv,
                     preferred_element_type=jnp.int32)
    return _clip16(_rshift_round(out, shift2))


@functools.partial(jax.jit, static_argnames=("tr_h", "tr_v", "bit_depth"))
def inverse_transform(coeff: jnp.ndarray, tr_h: int = rom.DCT2,
                      tr_v: int = rom.DCT2, bit_depth: int = 8) -> jnp.ndarray:
    """Inverse 2-D transform (normative path, reference: TrQuant.cpp:799 xIT).

    Args:
      coeff: (B, H, W) int32 dequantized coefficients.
    Returns:
      (B, H, W) int32 residuals.
    """
    _, h, w = coeff.shape
    th = jnp.asarray(rom.tr_matrix(tr_h, w), dtype=jnp.int32)
    tv = jnp.asarray(rom.tr_matrix(tr_v, h), dtype=jnp.int32)
    shift1 = 7
    shift2 = 20 - bit_depth
    # vertical inverse: sum_k coeff[k][x] * tv[k][y]
    tmp = jnp.einsum("blk,lh->bhk", coeff, tv,
                     preferred_element_type=jnp.int32)
    tmp = _clip16(_rshift_round(tmp, shift1))
    # horizontal inverse: sum_k tmp[y][k] * th[k][x]
    out = jnp.einsum("bhk,kw->bhw", tmp, th,
                     preferred_element_type=jnp.int32)
    return _clip16(_rshift_round(out, shift2))


def transform_shift(log2w: int, log2h: int, bit_depth: int) -> tuple[int, bool]:
    """VVC transformShift and the odd-size flag.

    Returns (tShift, is_odd) where the true coefficient scale is
    2^tShift * sqrt(2)^is_odd relative to the orthonormal transform
    (reference: Quant.cpp; CommonDef.h MAX_TR_DYNAMIC_RANGE=15)."""
    s = log2w + log2h
    t = 15 - bit_depth - ((s + 1) // 2)
    return t, (s & 1) == 1


def dst7_allowed(log2size: int) -> bool:
    """DST7/DCT8 only defined for 4..32 in VVC (reference: TrQuant.cpp MTS)."""
    return 2 <= log2size <= 5
