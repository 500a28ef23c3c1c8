"""Batched scalar quantization / dequantization (RDOQ & DepQuant live in
encoder/; the scalar core here is shared by both encoder and decoder).

TPU-native analog of the reference Quant (reference:
source/Lib/CommonLib/Quant.cpp:928 quant, :356 dequant).  Everything operates
on (B, H, W) int32 coefficient batches; per-sample ops vectorize on the VPU.

Scale scheme (see transforms.py): the forward transform emits
  coeff = Y * 2^tShift * sqrt(2)^odd          (Y = orthonormal-domain value)
with tShift = 15 - bitDepth - ceil((log2W+log2H)/2).  Quantization divides by
qStep(QP) = 2^((QP-4)/6) in the *pixel* domain:
  level   = round(|coeff| * qScale[QP%6] * (181/256)^odd  >> (14 + QP//6 + tShift))
  coeff'  = clip16(level * iScale[QP%6] << QP//6  * (2*181/256)^odd >> dqShift)
  dqShift = bitDepth + ceil((log2W+log2H)/2) - 9   (= 6 - tShift)
The 181/256 pair carries the sqrt(2) of odd-sized blocks exactly as VVC does.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import rom
from .transforms import transform_shift, _clip16, _rshift_round


DEFAULT_WEIGHT = 16      # flat scaling factor (reference: Quant.cpp m=16)


@functools.lru_cache(maxsize=None)
def scaling_weights(base8x8: tuple, h: int, w: int):
    """Per-coefficient quant weights for an (h, w) block from the signaled
    8x8 base matrix, nearest-upsampled / decimated (reference:
    ScalingList derivation in Quant.cpp xSetScalingListDec — larger blocks
    replicate, smaller blocks subsample the 8x8 list)."""
    import numpy as np
    base = np.asarray(base8x8, dtype=np.int32).reshape(8, 8)
    ys = (np.arange(h) * 8 // h).clip(0, 7)
    xs = (np.arange(w) * 8 // w).clip(0, 7)
    return np.clip(base[np.ix_(ys, xs)], 1, 255)


@functools.partial(jax.jit, static_argnames=("qp", "log2w", "log2h",
                                             "bit_depth", "intra",
                                             "scaling"))
def quantize(coeff: jnp.ndarray, qp: int, log2w: int, log2h: int,
             bit_depth: int = 8, intra: bool = True,
             scaling: tuple | None = None) -> jnp.ndarray:
    """Scalar quantization with VVC dead-zone offsets.

    Args:
      coeff: (B, H, W) int32 transform coefficients.
      intra: selects the dead-zone rounding offset (171/512 intra, 85/512
        inter — reference: Quant.cpp offset derivation).
    Returns:
      (B, H, W) int32 levels.
    """
    t_shift, odd = transform_shift(log2w, log2h, bit_depth)
    q_bits = rom.QUANT_SHIFT + qp // 6 + t_shift
    q_scale = int(rom.QUANT_SCALES[qp % 6])
    sign = jnp.sign(coeff)
    mag = jnp.abs(coeff)
    if odd:
        mag = (mag * 181 + 128) >> 8
    if scaling is not None:
        w = jnp.asarray(scaling_weights(scaling, 1 << log2h, 1 << log2w))
        mag = (mag * 16 + (w >> 1)) // w
    offset = (171 if intra else 85) << (q_bits - 9)
    level = (mag * q_scale + offset) >> q_bits
    level = jnp.clip(level, 0, (1 << 15) - 1)
    return (sign * level).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("qp", "log2w", "log2h",
                                             "bit_depth", "intra"))
def quantize_rdoq(coeff: jnp.ndarray, qp: int, log2w: int, log2h: int,
                  bit_depth: int = 8, intra: bool = True) -> jnp.ndarray:
    """Rate-distortion-optimized scalar quantization, batched (RDOQ-lite;
    reference: QuantRDOQ.cpp — the per-coefficient level decision of the
    full RDOQ, without its context-chained go-rice state).

    For every coefficient the candidate levels {dead-zone level, level-1,
    0} compete on D + lambda*R with the exact dequantizer distortion (in
    the coefficient domain, which is orthonormal up to the global
    transform scale) and the same level-rate model the RD searches use
    (2*log2(l+1)+1 bits per significant level, a fraction of a bit for a
    zero inside the coded region).  Candidates never exceed the dead-zone
    level, so RDOQ monotonically trades bits for distortion like the
    reference's level-decision loop (QuantRDOQ::xGetCodedLevel considers
    maxLevel and maxLevel-1).  Encoder-only — any level choice decodes
    normatively."""
    t_shift, odd = transform_shift(log2w, log2h, bit_depth)
    sign = jnp.sign(coeff)
    mag = jnp.abs(coeff)
    if odd:
        mag = (mag * 181 + 128) >> 8
    q_bits = rom.QUANT_SHIFT + qp // 6 + t_shift
    q_scale = int(rom.QUANT_SCALES[qp % 6])
    offset = (171 if intra else 85) << (q_bits - 9)
    l_dz = (mag * q_scale + offset) >> q_bits           # dead-zone level
    # exact reconstruction magnitudes via the normative dequant of the
    # candidate levels (coefficient-domain SSD is rate-scale exact)
    def rec_mag(lev):
        d = dequantize(sign * lev, qp, log2w, log2h, bit_depth)
        return jnp.abs(d)
    lam = lambda_from_qp(qp, intra=intra)
    # distortion in the pixel domain: coeff domain carries 2^t_shift
    scale2 = float(2.0 ** (-2 * t_shift))
    cands = []
    for lev in (l_dz, jnp.maximum(l_dz - 1, 0), jnp.zeros_like(l_dz)):
        d = (mag - rec_mag(lev)).astype(jnp.float32)
        dist = d * d * jnp.float32(scale2)
        # significant-coefficient overhead (+2 bits) models the sig-flag
        # and amortized last-position cost the reference's RDOQ accounts
        # through its context chain (QuantRDOQ xRateDistOptQuant) — this
        # is what makes trailing isolated levels worth zeroing
        rate = jnp.where(lev > 0,
                         2.0 * jnp.log2(lev.astype(jnp.float32) + 1.0)
                         + 3.0, 0.1)
        cands.append((lev, dist + jnp.float32(lam) * rate))
    cost = jnp.stack([c[1] for c in cands])
    pick = jnp.argmin(cost, axis=0)
    level = jnp.take_along_axis(jnp.stack([c[0] for c in cands]),
                                pick[None], axis=0)[0]
    level = jnp.clip(level, 0, (1 << 15) - 1)
    return (sign * level).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("qp", "log2w", "log2h",
                                             "bit_depth", "scaling"))
def dequantize(level: jnp.ndarray, qp: int, log2w: int, log2h: int,
               bit_depth: int = 8,
               scaling: tuple | None = None) -> jnp.ndarray:
    """Inverse quantization (normative; reference: Quant.cpp:356 dequant).

    With a scaling list, the signaled weight (flat default 16) is folded
    into the level with rounding before the standard scale — normative
    for this codec and mirrored exactly by the encoder-side quantize."""
    t_shift, odd = transform_shift(log2w, log2h, bit_depth)
    dq_shift = 6 - t_shift
    i_scale = int(rom.INV_QUANT_SCALES[qp % 6]) << (qp // 6)
    if scaling is not None:
        wgt = jnp.asarray(scaling_weights(scaling, 1 << log2h, 1 << log2w))
        level = _rshift_round(level * wgt, 4)
    c = level * i_scale
    if odd:
        # *2*181/256 == sqrt(2) to undo the forward-side 181/256
        c = _clip16(_rshift_round(c * 181, 8 + dq_shift - 1))
    else:
        c = _clip16(_rshift_round(c, dq_shift))
    return c.astype(jnp.int32)


def ts_qp(qp: int) -> int:
    """Transform-skip QP clamp (reference: Quant.cpp QpParam with
    sps_min_qp_prime_ts — qStep >= 1 so TS can be lossless at QP 4)."""
    return max(qp, 4)


@functools.partial(jax.jit, static_argnames=("qp", "intra"))
def quantize_ts(resid: jnp.ndarray, qp: int, intra: bool = True
                ) -> jnp.ndarray:
    """Pixel-domain quantization for transform-skip blocks.

    No transform shift: levels approximate resid / qStep(QP) directly
    (reference: Quant.cpp:928 with useTransformSkip -> transformShift 0).
    At the clamped minimum QP 4 (qStep == 1) this is exact, which is the
    lossless coding path (VVC's transquant-bypass successor)."""
    qp = ts_qp(qp)
    q_bits = rom.QUANT_SHIFT + qp // 6
    q_scale = int(rom.QUANT_SCALES[qp % 6])
    sign = jnp.sign(resid)
    offset = (171 if intra else 85) << (q_bits - 9)
    level = (jnp.abs(resid) * q_scale + offset) >> q_bits
    level = jnp.clip(level, 0, (1 << 15) - 1)
    return (sign * level).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("qp",))
def dequantize_ts(level: jnp.ndarray, qp: int) -> jnp.ndarray:
    """Pixel-domain dequantization for transform-skip blocks: resid =
    level * qStep(QP), exact inverse of quantize_ts at QP 4."""
    qp = ts_qp(qp)
    i_scale = int(rom.INV_QUANT_SCALES[qp % 6]) << (qp // 6)
    return _clip16(_rshift_round(level * i_scale, 6)).astype(jnp.int32)


def qstep(qp: int) -> float:
    """Pixel-domain quantizer step size 2^((qp-4)/6)."""
    return 2.0 ** ((qp - 4) / 6.0)


def lambda_from_qp(qp: int, intra: bool = True) -> float:
    """RD lambda (reference: EncSlice.cpp:107 setUpLambda — 0.57*2^((qp-12)/3)
    with slice-type dependent weighting)."""
    alpha = 0.57 if intra else 0.68
    return alpha * (2.0 ** ((qp - 12) / 3.0))
