"""Sample Adaptive Offset — frame-batched estimation and application.

TPU-native analog of the reference SampleAdaptiveOffset /
EncSampleAdaptiveOffset (reference: source/Lib/CommonLib/
SampleAdaptiveOffset.cpp — SAOProcess:613, offsetCTU:544; EncoderLib/
EncSampleAdaptiveOffset.cpp — per-CTU statistics + RD type decision).

Re-design: statistics for ALL regions and ALL edge-offset directions are
computed in one pass of elementwise compares + segment-sum reshapes (the
reference loops per CTU per class).  Per-region decisions are an argmin
over the stacked (type, direction) cost tensor.  Offsets follow the HEVC
scheme: 4 edge categories (valley/edge/edge/peak) with sign-constrained
offsets, or 4-consecutive-band band offset; offsets clipped to +-7 at
8-bit.  Round-1 scope: luma only (chroma SAO follows the same machinery).

Both encoder (estimate+apply) and decoder (apply) share `apply_sao`, so
reconstructions stay bit-exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

REGION = 64            # SAO region = CTU size
N_TYPES = 6            # 0 off, 1 band, 2..5 edge (0/90/135/45 degrees)
MAX_OFFSET = 7         # 8-bit offset clip (reference: offset range)

_EO_DIRS = {2: ((0, -1), (0, 1)),      # horizontal
            3: ((-1, 0), (1, 0)),      # vertical
            4: ((-1, -1), (1, 1)),     # 135 diagonal
            5: ((-1, 1), (1, -1))}     # 45 diagonal


def _shift(p: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    return jnp.roll(p, (-dy, -dx), axis=(0, 1))


def eo_category(plane: jnp.ndarray, sao_type: int) -> jnp.ndarray:
    """Edge-offset category map 0..4 (reference: offsetCTU sign logic):
    1 valley, 2 concave edge, 0 none, 3 convex edge, 4 peak."""
    (dy0, dx0), (dy1, dx1) = _EO_DIRS[sao_type]
    n0 = _shift(plane, dy0, dx0)
    n1 = _shift(plane, dy1, dx1)
    s = jnp.sign(plane - n0) + jnp.sign(plane - n1)
    cat = jnp.select([s == -2, s == -1, s == 1, s == 2],
                     [1, 2, 3, 4], 0).astype(jnp.int32)
    # invalidate frame-border pixels whose neighbors wrap
    h, w = plane.shape
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    valid = jnp.ones_like(cat, dtype=bool)
    for (dy, dx) in ((dy0, dx0), (dy1, dx1)):
        if dy:
            valid &= (yy + dy >= 0) & (yy + dy < h)
        if dx:
            valid &= (xx + dx >= 0) & (xx + dx < w)
    return jnp.where(valid, cat, 0)


def band_index(plane: jnp.ndarray, bit_depth: int) -> jnp.ndarray:
    return (plane >> (bit_depth - 5)).astype(jnp.int32)   # 32 bands


def _region_sums(x: jnp.ndarray, gy: int, gx: int) -> jnp.ndarray:
    """(H, W) -> (gy, gx) region sums (REGION-aligned, padded frames)."""
    h, w = x.shape
    return x.reshape(gy, h // gy, gx, w // gx).sum(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def estimate_sao(orig: jnp.ndarray, recon: jnp.ndarray, lam: float,
                 bit_depth: int = 8):
    """Choose per-region SAO params.

    Returns (types (gy,gx) int32, offsets (gy,gx,4) int32, band_pos
    (gy,gx) int32).  Regions are ceil-divided; the frame is processed in
    REGION-sized tiles (frame dims must be multiples of 8; tail tiles are
    handled by padding with neutral samples)."""
    h, w = orig.shape
    gy = -(-h // REGION)
    gx = -(-w // REGION)
    ph, pw = gy * REGION, gx * REGION
    if (ph, pw) != (h, w):
        # pad to region multiples with equal orig/recon (no contribution)
        pad = ((0, ph - h), (0, pw - w))
        orig = jnp.pad(orig, pad, mode="edge")
        recon = jnp.pad(recon, pad, mode="edge")
    diff = (orig - recon).astype(jnp.int32)

    costs = []
    all_offsets = []
    all_bandpos = []
    # type 0: off
    costs.append(jnp.zeros((gy, gx), dtype=jnp.float32))
    all_offsets.append(jnp.zeros((gy, gx, 4), dtype=jnp.int32))
    all_bandpos.append(jnp.zeros((gy, gx), dtype=jnp.int32))

    def best_offsets(cat, ncat, start_cat, sign_constraint):
        """Per-region per-category optimal offsets and SSD gain."""
        offs = []
        gain = jnp.zeros((gy, gx), dtype=jnp.float32)
        for c in range(start_cat, start_cat + ncat):
            m = (cat == c).astype(jnp.int32)
            cnt = _region_sums(m, gy, gx)
            sd = _region_sums(diff * m, gy, gx)
            o = jnp.round(sd / jnp.maximum(cnt, 1)).astype(jnp.int32)
            o = jnp.clip(o, -MAX_OFFSET, MAX_OFFSET)
            if sign_constraint == "pos":
                o = jnp.maximum(o, 0)
            elif sign_constraint == "neg":
                o = jnp.minimum(o, 0)
            # SSD delta of adding offset o: sum((d-o)^2 - d^2) = n*o^2-2*o*sd
            g = (cnt * o * o - 2 * o * sd).astype(jnp.float32)
            # never accept an offset that increases distortion
            o = jnp.where(g > 0, 0, o)
            g = jnp.minimum(g, 0.0)
            offs.append(o)
            gain = gain + g
        return jnp.stack(offs, axis=-1), gain

    # band offset: 32 bands -> per-band offsets, pick best 4-consecutive run
    bidx = band_index(recon, bit_depth)
    band_off = []
    band_gain = []
    for b in range(32):
        m = (bidx == b).astype(jnp.int32)
        cnt = _region_sums(m, gy, gx)
        sd = _region_sums(diff * m, gy, gx)
        o = jnp.clip(jnp.round(sd / jnp.maximum(cnt, 1)).astype(jnp.int32),
                     -MAX_OFFSET, MAX_OFFSET)
        g = (cnt * o * o - 2 * o * sd).astype(jnp.float32)
        o = jnp.where(g > 0, 0, o)
        band_off.append(o)
        band_gain.append(jnp.minimum(g, 0.0))
    band_off = jnp.stack(band_off, axis=-1)        # (gy, gx, 32)
    band_gain = jnp.stack(band_gain, axis=-1)
    # best starting band of a 4-run
    runs = jnp.stack([band_gain[..., s:s + 4].sum(-1) for s in range(29)],
                     axis=-1)                       # (gy, gx, 29)
    best_start = jnp.argmin(runs, axis=-1).astype(jnp.int32)
    bo_gain = jnp.min(runs, axis=-1)
    bo_offsets = jnp.take_along_axis(
        band_off,
        best_start[..., None] + jnp.arange(4)[None, None, :], axis=-1)
    bits_bo = 4 * 4 + 5 + 3
    costs.append(bo_gain + lam * bits_bo)
    all_offsets.append(bo_offsets)
    all_bandpos.append(best_start)

    for t in (2, 3, 4, 5):
        cat = eo_category(recon, t)
        offs, gain = best_offsets(cat, 4, 1, None)
        # EO sign constraints (valley/concave >= 0, convex/peak <= 0)
        offs = offs.at[..., 0].set(jnp.maximum(offs[..., 0], 0))
        offs = offs.at[..., 1].set(jnp.maximum(offs[..., 1], 0))
        offs = offs.at[..., 2].set(jnp.minimum(offs[..., 2], 0))
        offs = offs.at[..., 3].set(jnp.minimum(offs[..., 3], 0))
        bits_eo = 4 * 4 + 3
        costs.append(gain + lam * bits_eo)
        all_offsets.append(offs)
        all_bandpos.append(jnp.zeros((gy, gx), dtype=jnp.int32))

    cost = jnp.stack(costs)                         # (6, gy, gx)
    types = jnp.argmin(cost, axis=0).astype(jnp.int32)
    offsets = jnp.take_along_axis(
        jnp.stack(all_offsets), types[None, ..., None], axis=0)[0]
    band_pos = jnp.take_along_axis(
        jnp.stack(all_bandpos), types[None], axis=0)[0]
    return types, offsets, band_pos


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def apply_sao(recon: jnp.ndarray, types: jnp.ndarray, offsets: jnp.ndarray,
              band_pos: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    """Apply per-region SAO params (shared encoder/decoder path)."""
    h, w = recon.shape
    gy, gx = types.shape
    ph, pw = gy * REGION, gx * REGION
    rpad = jnp.pad(recon, ((0, ph - h), (0, pw - w)), mode="edge") \
        if (ph, pw) != (h, w) else recon

    def upsample(a):
        return jnp.repeat(jnp.repeat(a, REGION, axis=0), REGION, axis=1)

    t_map = upsample(types)[:h, :w]
    bp_map = upsample(band_pos)[:h, :w]
    off_maps = [upsample(offsets[..., c])[:h, :w] for c in range(4)]

    out = recon
    # band offset
    bidx = band_index(recon, bit_depth)
    rel = (bidx - bp_map) % 32
    bo = jnp.select([rel == 0, rel == 1, rel == 2, rel == 3],
                    off_maps, 0)
    out = out + jnp.where(t_map == 1, bo, 0)
    # edge offsets
    for t in (2, 3, 4, 5):
        cat = eo_category(recon, t)
        eo = jnp.select([cat == 1, cat == 2, cat == 3, cat == 4],
                        off_maps, 0)
        out = out + jnp.where(t_map == t, eo, 0)
    return jnp.clip(out, 0, (1 << bit_depth) - 1)
