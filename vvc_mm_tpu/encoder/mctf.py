"""GOP-based motion-compensated temporal pre-filter (MCTF).

TPU-native analog of the reference encoder's temporal filter (reference:
source/Lib/EncoderLib/EncTemporalFilter.cpp — filter entry :288, motion
estimation :577, bilateral combine :662).  The reference filters each
RA-anchor source picture with up to four past + four future *original*
frames: per-16x16 hierarchical ME aligns each neighbor, then a per-pixel
bilateral weight (Gaussian in the intensity difference, scaled by the
per-block ME error and the temporal distance) blends the aligned neighbors
into the source before the encoder ever sees it.

TPU re-design: the reference runs a serial per-block ME and a scalar
per-pixel loop; here each neighbor alignment is one batched hierarchical
search (encoder/me.py) + one full-frame MC gather, and the bilateral
combine is a single fused elementwise pass over a (N, H, W) stack — VPU
work with no host round-trips inside the frame.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..common import inter_frame, quant
from . import me as me_mod

# Per-neighbor strength by temporal distance, mirroring the shape of the
# reference's refStrengths tables (EncTemporalFilter.cpp:95-101): nearer
# originals contribute more.
_DIST_STRENGTH = {1: 0.85, 2: 0.60, 3: 0.42, 4: 0.33}
_BLOCK = 16


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def _bilateral_combine(orig, preds, block_err, strengths, sigma_sq,
                       bit_depth: int):
    """Blend aligned neighbor predictions into the original plane.

    Args:
      orig: (H, W) int32 original plane.
      preds: (N, H, W) int32 motion-aligned neighbor planes.
      block_err: (N, H, W) float32 per-pixel broadcast of the per-block
        mean ME error (drives down weights where alignment failed).
      strengths: (N,) float32 per-neighbor strength.
      sigma_sq: scalar float32 intensity variance (QP-adaptive).
    Returns (H, W) int32 filtered plane.
    """
    o = orig.astype(jnp.float32)
    p = preds.astype(jnp.float32)
    diff_sq = (p - o[None]) ** 2
    # error-adaptive sharpening of sigma: well-predicted blocks trust the
    # neighbor over a wider intensity range (reference: per-block error
    # terms in EncTemporalFilter.cpp:662+ xFilterLuma weights)
    err_factor = jnp.clip(1.8 - block_err / 64.0, 0.3, 1.8)
    w = (strengths[:, None, None] * err_factor
         * jnp.exp(-diff_sq / (2.0 * sigma_sq * err_factor)))
    num = o + jnp.sum(w * p, axis=0)
    den = 1.0 + jnp.sum(w, axis=0)
    out = num / den
    return jnp.clip(jnp.round(out), 0, (1 << bit_depth) - 1
                    ).astype(orig.dtype)


def _align_neighbor(orig_y, nb_planes, bit_depth: int, search_range: int):
    """ME + MC one neighbor original onto the target frame.  Returns
    (pred_y, pred_u, pred_v, per-block mean abs error grid)."""
    margin = inter_frame.MC_MARGIN
    refp = inter_frame.pad_ref(jnp.asarray(nb_planes[0]), margin)
    mv_int, _ = me_mod.hierarchical_search(orig_y, refp, _BLOCK,
                                           search_range, margin, 0)
    mvs, sad = me_mod.fractional_refine(orig_y, refp, mv_int, _BLOCK, margin,
                                        bit_depth)
    py, pu, pv = inter_frame.mc_predict(
        jnp.asarray(nb_planes[0]), jnp.asarray(nb_planes[1]),
        jnp.asarray(nb_planes[2]), mvs, _BLOCK, bit_depth, False)
    err = sad.astype(jnp.float32) / float(_BLOCK * _BLOCK)
    return py, pu, pv, err


def filter_frame(frames, poc: int, qp: int, bit_depth: int = 8,
                 strength: float = 0.95, max_refs: int = 4,
                 search_range: int = 16):
    """Filter frames[poc] with up to `max_refs` originals on each side.

    reference: EncTemporalFilter::filter (EncTemporalFilter.cpp:288) —
    strength 0.95 for every-8th-POC anchors, 1.5 for every-16th.
    Returns new [y, u, v] numpy planes (originals untouched).
    """
    h, w = frames[poc][0].shape
    if h % (4 * _BLOCK) or w % (4 * _BLOCK):
        return frames[poc]       # hierarchical ME needs /64 dims; skip
    orig_y = jnp.asarray(frames[poc][0])
    preds = {0: [], 1: [], 2: []}
    errs, strengths = [], []
    for d in range(-max_refs, max_refs + 1):
        if d == 0 or not (0 <= poc + d < len(frames)):
            continue
        py, pu, pv, err = _align_neighbor(orig_y, frames[poc + d],
                                          bit_depth, search_range)
        preds[0].append(py)
        preds[1].append(pu)
        preds[2].append(pv)
        errs.append(err)
        strengths.append(strength * _DIST_STRENGTH[abs(d)])
    if not errs:
        return frames[poc]
    sw = jnp.asarray(strengths, dtype=jnp.float32)
    err_grid = jnp.stack(errs)                       # (N, nby, nbx)
    # QP-adaptive sigma (reference: EncTemporalFilter sigma from QP): more
    # smoothing headroom at higher QP where coding noise dominates
    sigma = 2.0 + 0.35 * max(qp - 10, 0)
    sigma_sq = jnp.float32(sigma * sigma * (1 << (2 * (bit_depth - 8))))
    out = []
    for ci, plane in enumerate(frames[poc]):
        sub = 1 if ci == 0 else 2
        be = jnp.repeat(jnp.repeat(err_grid, _BLOCK // sub, axis=1),
                        _BLOCK // sub, axis=2)
        filt = _bilateral_combine(jnp.asarray(plane), jnp.stack(preds[ci]),
                                  be, sw, sigma_sq, bit_depth)
        out.append(np.asarray(filt))
    return out


def prefilter_sequence(frames, qp: int, bit_depth: int = 8,
                       period: int = 8) -> list:
    """Apply MCTF to every `period`-th frame (the RA anchors), doubling the
    strength at 2x the period (reference: EncTemporalFilter.cpp filter-
    strength map {8: 0.95, 16: 1.5} set up by EncApp).  Non-anchor frames
    pass through untouched; all ME runs against *original* neighbors."""
    orig = list(frames)
    out = list(frames)
    for poc in range(0, len(orig), period):
        s = 1.5 if (2 * period > 0 and poc % (2 * period) == 0) else 0.95
        out[poc] = filter_frame(orig, poc, qp, bit_depth, strength=s)
    return out
