"""LMCS — luma mapping (reshaper).

TPU-native analog of the reference's Reshape/EncReshape (reference:
source/Lib/CommonLib/Reshape.{cpp,h} — 16-segment piecewise-linear forward
and inverse luma mapping LUTs, Reshape.h:54+; estimation in
EncoderLib/EncReshape.cpp).

Design: the reference maps predictions and residuals per-CU inside the
loop; here the whole pipeline runs *in the mapped domain* — the input is
forward-mapped once per frame (one gather), every coding stage (ME, MC,
transforms, loop filters, the decoded-picture hash) operates on mapped
samples, and the inverse map is applied only at output/display time.  The
DPB therefore stores mapped reconstructions, keeping prediction and
reconstruction self-consistent with zero per-CU overhead.  Chroma residual
scaling is not modeled (luma-only reshaper).

The 16 codeword counts are signaled in the SPS (reference: LMCS APS,
aps_params_type=LMCS); both sides rebuild the same integer LUTs.
"""
from __future__ import annotations

import numpy as np

N_SEGMENTS = 16


def estimate_codewords(y: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    """Allocate mapped codewords per segment from the luma histogram
    (EncReshape analog: more codewords where the signal lives).

    Returns (16,) int32 summing to the full range (1 << bit_depth)."""
    rng = 1 << bit_depth
    seg = rng // N_SEGMENTS
    hist, _ = np.histogram(y.reshape(-1), bins=N_SEGMENTS, range=(0, rng))
    w = np.sqrt(hist.astype(np.float64) + 1.0)
    cw = np.maximum(1, np.round(w / w.sum() * rng)).astype(np.int64)
    # exact-sum fixup on the largest bin (always >= the mean, so it stays
    # positive); deterministic on both sides via the signaled values anyway
    cw[int(np.argmax(cw))] += rng - cw.sum()
    return cw.astype(np.int32)


def build_fwd_lut(cw: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    """Forward mapping LUT org -> mapped (monotone, integer, shared)."""
    rng = 1 << bit_depth
    seg = rng // N_SEGMENTS
    lut = np.zeros(rng, dtype=np.int32)
    pivot = 0
    for i in range(N_SEGMENTS):
        xs = np.arange(seg, dtype=np.int64)
        lut[i * seg:(i + 1) * seg] = pivot + (
            (xs * int(cw[i]) + seg // 2) // seg)
        pivot += int(cw[i])
    return np.clip(lut, 0, rng - 1)


def build_inv_lut(cw: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    """Inverse mapping LUT mapped -> org (piecewise-linear inverse with the
    same integer arithmetic on both sides)."""
    rng = 1 << bit_depth
    seg = rng // N_SEGMENTS
    lut = np.zeros(rng, dtype=np.int32)
    pivot = 0
    for i in range(N_SEGMENTS):
        c = int(cw[i])
        ms = np.arange(pivot, pivot + c, dtype=np.int64)
        lut[pivot:pivot + c] = i * seg + ((ms - pivot) * seg + c // 2) // c
        pivot += c
    if pivot < rng:                      # clamp tail (cw sums to rng)
        lut[pivot:] = rng - 1
    return np.clip(lut, 0, rng - 1)
