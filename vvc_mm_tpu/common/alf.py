"""Adaptive Loop Filter — classification, Wiener estimation, application.

TPU-native analog of the reference AdaptiveLoopFilter /
EncAdaptiveLoopFilter (reference: source/Lib/CommonLib/
AdaptiveLoopFilter.cpp — ALFProcess:402, deriveClassification with
gradient-based 25-class partition, 7x7 diamond luma filter with SIMD hooks
:65-68; EncoderLib/EncAdaptiveLoopFilter.cpp — per-class correlation
statistics + Wiener solve + RD on/off).

Re-design for TPU:
* Classification (direction x activity -> 25 classes) is pure elementwise
  gradient math + 4x4 box sums — one fused pass over the frame.
* The filter is DC-preserving by construction: out = center +
  (sum_i c_i * f_i + 64) >> 7 over 12 symmetric-difference features
  f_i = p_i + p_mirror_i - 2*center on the 7x7 diamond, so no coefficient
  normalization constraint is needed (reference carries the same
  invariant via the fixed center coefficient).
* Encoder statistics are one einsum per frame: per-class 12x12
  autocorrelation + cross vector, batched over all classes via one-hot
  masks; the 25 tiny Wiener solves run on host.
* Per-64x64-region on/off decided by exact SSD comparison + lambda*1 bit.

Luma only this round (the reference's 5x5 chroma ALF rides the same
machinery).  Shared `apply_alf` keeps encoder/decoder bit-exact: the
filter itself is integer (int32 features x int coeffs >> 7).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 25
NUM_COEFF = 12            # symmetric diamond pairs (center excluded)
COEFF_SHIFT = 7
REGION = 64

# 7x7 diamond symmetric pair offsets (upper half; mirror is implied)
# (reference: AdaptiveLoopFilter.cpp filter7x7Blk tap layout)
DIAMOND_PAIRS = [
    (-3, 0),
    (-2, -1), (-2, 0), (-2, 1),
    (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
    (0, -3), (0, -2), (0, -1),
]
assert len(DIAMOND_PAIRS) == NUM_COEFF


def _shift2(p: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift with edge clamp (frame-border padding like the reference's
    virtual boundary handling, simplified)."""
    h, w = p.shape
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return p[ys][:, xs]


def features(recon: jnp.ndarray) -> jnp.ndarray:
    """(12, H, W) symmetric-difference features of the 7x7 diamond."""
    f = []
    for (dy, dx) in DIAMOND_PAIRS:
        f.append(_shift2(recon, dy, dx) + _shift2(recon, -dy, -dx)
                 - 2 * recon)
    return jnp.stack(f).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def classify(recon: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Per-4x4-block class in 0..24 from gradient direction x activity
    (reference: deriveClassification — 5 direction classes x 5 activity
    levels)."""
    h, w = recon.shape
    c = recon
    gv = jnp.abs(2 * c - _shift2(c, -1, 0) - _shift2(c, 1, 0))
    gh = jnp.abs(2 * c - _shift2(c, 0, -1) - _shift2(c, 0, 1))
    gd0 = jnp.abs(2 * c - _shift2(c, -1, -1) - _shift2(c, 1, 1))
    gd1 = jnp.abs(2 * c - _shift2(c, -1, 1) - _shift2(c, 1, -1))

    def block4(x):
        return x.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3))
    sv, sh_, s0, s1 = block4(gv), block4(gh), block4(gd0), block4(gd1)
    hv_max = jnp.maximum(sv, sh_)
    hv_min = jnp.minimum(sv, sh_)
    d_max = jnp.maximum(s0, s1)
    d_min = jnp.minimum(s0, s1)
    # direction class (simplified VVC decision tree)
    hv_strong = hv_max > 2 * hv_min
    d_strong = d_max > 2 * d_min
    main_hv = hv_max * d_min >= d_max * hv_min
    dir_cls = jnp.where(
        main_hv,
        jnp.where(hv_strong, jnp.where(sv > sh_, 1, 2), 0),
        jnp.where(d_strong, jnp.where(s0 > s1, 3, 4), 0))
    act = sv + sh_
    shift = bit_depth - 2
    aq = jnp.clip(act >> shift, 0, 15)
    act_cls = jnp.select([aq == 0, aq == 1, aq <= 3, aq <= 7], [0, 1, 2, 3],
                         4)
    return (5 * dir_cls + act_cls).astype(jnp.int32)


def _class_map(cls4: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(cls4, 4, axis=0), 4, axis=1)


@jax.jit
def gather_stats(recon: jnp.ndarray, orig: jnp.ndarray,
                 cls4: jnp.ndarray):
    """Per-class Wiener statistics: (25, 12, 12) autocorrelation and
    (25, 12) cross-correlation, one einsum each."""
    f = features(recon).astype(jnp.float32)                 # (12, H, W)
    d = (orig - recon).astype(jnp.float32)
    cmap = _class_map(cls4)
    onehot = (cmap[None] == jnp.arange(NUM_CLASSES)[:, None, None]
              ).astype(jnp.float32)                          # (25, H, W)
    a = jnp.einsum("khw,ihw,jhw->kij", onehot, f, f)
    b = jnp.einsum("khw,ihw,hw->ki", onehot, f, d)
    return a, b


def solve_coeffs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Host-side regularized Wiener solve + fixed-point quantization
    (reference: EncAdaptiveLoopFilter deriveCoeff)."""
    coeffs = np.zeros((NUM_CLASSES, NUM_COEFF), dtype=np.int32)
    for k in range(NUM_CLASSES):
        ak = a[k] + np.eye(NUM_COEFF) * (1.0 + a[k].trace() * 1e-4)
        try:
            c = np.linalg.solve(ak, b[k])
        except np.linalg.LinAlgError:
            continue
        coeffs[k] = np.clip(np.round(c * (1 << COEFF_SHIFT)), -1024, 1023)
    return coeffs


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def filter_frame(recon: jnp.ndarray, cls4: jnp.ndarray,
                 coeffs: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Apply the per-class filters everywhere (region gating by caller)."""
    f = features(recon)                                     # (12, H, W)
    cmap = _class_map(cls4)                                 # (H, W)
    ctab = coeffs[cmap]                                     # (H, W, 12)
    acc = jnp.einsum("ihw,hwi->hw", f, ctab)
    out = recon + ((acc + (1 << (COEFF_SHIFT - 1))) >> COEFF_SHIFT)
    return jnp.clip(out, 0, (1 << bit_depth) - 1)


def _region_sums_np(x: jnp.ndarray, gy: int, gx: int) -> jnp.ndarray:
    h, w = x.shape
    ph, pw = gy * REGION, gx * REGION
    if (ph, pw) != (h, w):
        x = jnp.pad(x, ((0, ph - h), (0, pw - w)))
    return x.reshape(gy, REGION, gx, REGION).sum(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def region_decide(orig: jnp.ndarray, recon: jnp.ndarray,
                  filtered: jnp.ndarray, lam: float, bit_depth: int = 8):
    """Per-64x64-region on/off by SSD (reference: ALF CTU enable flags)."""
    h, w = orig.shape
    gy, gx = -(-h // REGION), -(-w // REGION)
    d_off = (orig - recon) ** 2
    d_on = (orig - filtered) ** 2
    sse_off = _region_sums_np(d_off, gy, gx)
    sse_on = _region_sums_np(d_on, gy, gx)
    return (sse_on + lam < sse_off)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def apply_alf(recon: jnp.ndarray, cls4: jnp.ndarray, coeffs: jnp.ndarray,
              enable: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Shared enc/dec application with per-region gating."""
    h, w = recon.shape
    filtered = filter_frame(recon, cls4, coeffs, bit_depth)
    en = jnp.repeat(jnp.repeat(enable, REGION, 0), REGION, 1)[:h, :w]
    return jnp.where(en, filtered, recon)


def estimate_alf(orig: jnp.ndarray, recon: jnp.ndarray, lam: float,
                 bit_depth: int = 8):
    """Full encoder flow: classify -> stats -> solve -> region decision.
    Returns (coeffs (25,12) int32, enable (gy,gx) bool, cls4)."""
    cls4 = classify(recon, bit_depth)
    a, b = gather_stats(recon, orig, cls4)
    coeffs = solve_coeffs(np.asarray(a), np.asarray(b))
    filtered = filter_frame(recon, cls4, jnp.asarray(coeffs), bit_depth)
    enable = region_decide(orig, recon, filtered, lam, bit_depth)
    return coeffs, np.asarray(enable), cls4


# ---------------------------------------------------------------------------
# Chroma ALF: 5x5 diamond, one filter per plane (reference:
# AdaptiveLoopFilter.cpp filter5x5Blk — chroma uses the 5x5 diamond without
# classification)
# ---------------------------------------------------------------------------
NUM_COEFF_C = 6
DIAMOND_PAIRS_C = [(-2, 0), (-1, -1), (-1, 0), (-1, 1), (0, -2), (0, -1)]
assert len(DIAMOND_PAIRS_C) == NUM_COEFF_C


def _features_c(recon: jnp.ndarray) -> jnp.ndarray:
    f = [(_shift2(recon, dy, dx) + _shift2(recon, -dy, -dx) - 2 * recon)
         for (dy, dx) in DIAMOND_PAIRS_C]
    return jnp.stack(f).astype(jnp.int32)


@jax.jit
def _stats_c(recon: jnp.ndarray, orig: jnp.ndarray):
    f = _features_c(recon).astype(jnp.float32)
    d = (orig - recon).astype(jnp.float32)
    a = jnp.einsum("ihw,jhw->ij", f, f)
    b = jnp.einsum("ihw,hw->i", f, d)
    return a, b


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def filter_chroma(recon: jnp.ndarray, coeffs: jnp.ndarray,
                  bit_depth: int = 8) -> jnp.ndarray:
    f = _features_c(recon)
    acc = jnp.einsum("ihw,i->hw", f, coeffs)
    out = recon + ((acc + (1 << (COEFF_SHIFT - 1))) >> COEFF_SHIFT)
    return jnp.clip(out, 0, (1 << bit_depth) - 1)


def estimate_alf_chroma(orig: jnp.ndarray, recon: jnp.ndarray, lam: float,
                        bit_depth: int = 8):
    """Returns (coeffs (6,) int32, enable (gy,gx) bool) or (None, None) when
    the filter does not pay for itself."""
    a, b = _stats_c(recon, orig)
    a = np.asarray(a) + np.eye(NUM_COEFF_C) * (1.0 + float(a.trace()) * 1e-4)
    try:
        c = np.linalg.solve(a, np.asarray(b))
    except np.linalg.LinAlgError:
        return None, None
    coeffs = np.clip(np.round(c * (1 << COEFF_SHIFT)), -1024, 1023
                     ).astype(np.int32)
    if not coeffs.any():
        return None, None
    filtered = filter_chroma(recon, jnp.asarray(coeffs), bit_depth)
    enable = np.asarray(region_decide(orig, recon, filtered, lam, bit_depth))
    if not enable.any():
        return None, None
    return coeffs, enable


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def apply_alf_chroma(recon: jnp.ndarray, coeffs: jnp.ndarray,
                     enable: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    h, w = recon.shape
    filtered = filter_chroma(recon, coeffs, bit_depth)
    en = jnp.repeat(jnp.repeat(enable, REGION, 0), REGION, 1)[:h, :w]
    return jnp.where(en, filtered, recon)


# ---------------------------------------------------------------------------
# CC-ALF: cross-component filter — a correction for each chroma plane
# derived from co-located luma high-frequency content (reference:
# AdaptiveLoopFilter.cpp applyCcAlfFilter — 3x4 diamond on luma, 7 signaled
# coefficients, output added to the chroma sample)
# ---------------------------------------------------------------------------
NUM_COEFF_CC = 7
# luma offsets relative to the co-located sample (dy, dx); features are
# differences to the co-located luma sample, keeping the filter DC-free as
# the reference's constraint sum(c)=0 does
CCALF_TAPS = [(-1, 0), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1), (2, 0)]
assert len(CCALF_TAPS) == NUM_COEFF_CC


def _ccalf_features(luma: jnp.ndarray, ch: int, cw: int) -> jnp.ndarray:
    """(7, ch, cw) luma difference features at chroma resolution (4:2:0
    co-located sample at (2y, 2x))."""
    c0 = luma[::2, ::2][:ch, :cw]
    f = []
    for (dy, dx) in CCALF_TAPS:
        f.append(_shift2(luma, dy, dx)[::2, ::2][:ch, :cw] - c0)
    return jnp.stack(f).astype(jnp.int32)


@jax.jit
def _ccalf_stats(luma: jnp.ndarray, orig_c: jnp.ndarray,
                 recon_c: jnp.ndarray):
    ch, cw = recon_c.shape
    f = _ccalf_features(luma, ch, cw).astype(jnp.float32)
    d = (orig_c - recon_c).astype(jnp.float32)
    a = jnp.einsum("ihw,jhw->ij", f, f)
    b = jnp.einsum("ihw,hw->i", f, d)
    return a, b


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def apply_ccalf(recon_c: jnp.ndarray, luma: jnp.ndarray,
                coeffs: jnp.ndarray, enable: jnp.ndarray,
                bit_depth: int = 8) -> jnp.ndarray:
    ch, cw = recon_c.shape
    f = _ccalf_features(luma, ch, cw)
    acc = jnp.einsum("ihw,i->hw", f, coeffs)
    out = jnp.clip(recon_c + ((acc + (1 << (COEFF_SHIFT - 1)))
                              >> COEFF_SHIFT), 0, (1 << bit_depth) - 1)
    en = jnp.repeat(jnp.repeat(enable, REGION, 0), REGION, 1)[:ch, :cw]
    return jnp.where(en, out, recon_c)


def estimate_ccalf(luma: jnp.ndarray, orig_c: jnp.ndarray,
                   recon_c: jnp.ndarray, lam: float, bit_depth: int = 8):
    """Returns (coeffs (7,) int32, enable) or (None, None)."""
    a, b = _ccalf_stats(luma, orig_c, recon_c)
    a = np.asarray(a) + np.eye(NUM_COEFF_CC) * (1.0 + float(a.trace())
                                                * 1e-4)
    try:
        c = np.linalg.solve(a, np.asarray(b))
    except np.linalg.LinAlgError:
        return None, None
    # reference signals CC-ALF coefficients as powers of two in {-64..64};
    # quantize to the nearest signed power of two for the same bit cost
    cq = np.round(c * (1 << COEFF_SHIFT))
    mag = np.abs(cq)
    p2 = np.where(mag >= 1, 2.0 ** np.round(np.log2(np.maximum(mag, 1))), 0)
    coeffs = (np.sign(cq) * np.clip(p2, 0, 64)).astype(np.int32)
    if not coeffs.any():
        return None, None
    ch, cw = recon_c.shape
    f = _ccalf_features(luma, ch, cw)
    acc = jnp.einsum("ihw,i->hw", f, jnp.asarray(coeffs))
    filtered = jnp.clip(recon_c + ((acc + (1 << (COEFF_SHIFT - 1)))
                                   >> COEFF_SHIFT), 0, (1 << bit_depth) - 1)
    enable = np.asarray(region_decide(orig_c, recon_c, filtered, lam,
                                      bit_depth))
    if not enable.any():
        return None, None
    return coeffs, enable
