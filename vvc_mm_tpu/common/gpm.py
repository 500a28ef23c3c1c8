"""Geometric partitioning mode (GPM) and combined inter/intra (CIIP).

TPU-native analog of the reference GEO and CIIP prediction (reference:
source/Lib/CommonLib/InterPrediction.cpp — motionCompensationGeo /
weightedGeoBlk; CIIP blend in DecCu.cpp / EncCu.cpp xCheckRDCostMerge2Nx2N
CIIP branch; GEO tables g_geoParams in Rom.cpp).

TPU-first redesign (not a port):
  * The reference derives 64 GEO split modes from an angle/offset table and
    blends the two uni predictions with a 0..8 ramp mask computed per
    sample.  Here the masks are a *static* (NUM_GPM_MODES, s, s) weight
    tensor baked at trace time; the per-block blend is one gather + fused
    multiply-add over the whole frame — no per-CU control flow.
  * CIIP in the reference blends merge-inter prediction with planar intra
    built from reconstructed neighbours, which would serialize the frame.
    Instead the planar signal is built from the *inter-predicted* frame —
    available everywhere before residual add on both encoder and decoder,
    so the frame stays one batched step and recon stays bit-exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NUM_GPM_MODES = 16          # reference uses 64 angle/offset pairs
_RAMP = 2.0                 # blend ramp half-width in samples


@functools.lru_cache(maxsize=None)
def gpm_weights(s: int) -> np.ndarray:
    """(NUM_GPM_MODES, s, s) int32 weights in 0..8 for the P0 side.

    Mode k splits the block along the line through the centre with normal
    at angle 2*pi*k/NUM_GPM_MODES; the complementary split is k + N/2
    (reference analog: g_geoParams angle+distance table, Rom.cpp)."""
    yy, xx = np.meshgrid(np.arange(s, dtype=np.float64),
                         np.arange(s, dtype=np.float64), indexing="ij")
    cy = cx = (s - 1) / 2.0
    out = np.zeros((NUM_GPM_MODES, s, s), dtype=np.int32)
    for k in range(NUM_GPM_MODES):
        th = 2.0 * np.pi * k / NUM_GPM_MODES
        d = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
        w = np.clip(np.round(4.0 + d * (4.0 / _RAMP)), 0, 8)
        out[k] = w.astype(np.int32)
    return out


def gpm_blend(p0: jnp.ndarray, p1: jnp.ndarray, modes: jnp.ndarray
              ) -> jnp.ndarray:
    """Blend two pixel-domain uni predictions (B, s, s) with per-block GPM
    masks selected by `modes` (B,) int32: (w*p0 + (8-w)*p1 + 4) >> 3."""
    s = p0.shape[-1]
    wt = jnp.asarray(gpm_weights(s))[modes]            # (B, s, s)
    return (wt * p0 + (8 - wt) * p1 + 4) >> 3


def gpm_blend_chroma(p0: jnp.ndarray, p1: jnp.ndarray, modes: jnp.ndarray
                     ) -> jnp.ndarray:
    """Chroma blend: the luma mask subsampled 2x (reference: GEO chroma
    weights are the collocated luma weights)."""
    sc = p0.shape[-1]
    wt = jnp.asarray(gpm_weights(2 * sc)[:, ::2, ::2])[modes]
    return (wt * p0 + (8 - wt) * p1 + 4) >> 3


def gpm_search(orig_blocks: jnp.ndarray, p0: jnp.ndarray, p1: jnp.ndarray
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pick the best GPM mode per block by SAD over all modes at once.

    Args: orig/p0/p1 (B, s, s) pixel domain.  Returns (modes (B,),
    sad (B,)).  One broadcasted abs-diff tensor (B, M, s, s) — batched
    mode decision instead of the reference's per-CU candidate loop
    (EncCu.cpp xCheckRDCostMergeGeo2Nx2N)."""
    s = orig_blocks.shape[-1]
    wt = jnp.asarray(gpm_weights(s))[None]             # (1, M, s, s)
    blend = (wt * p0[:, None] + (8 - wt) * p1[:, None] + 4) >> 3
    sad = jnp.sum(jnp.abs(blend - orig_blocks[:, None]), axis=(2, 3))
    mode = jnp.argmin(sad, axis=1).astype(jnp.int32)
    return mode, jnp.min(sad, axis=1)


def _planar(top: jnp.ndarray, left: jnp.ndarray, s: int) -> jnp.ndarray:
    """Batched planar prediction from (B, s+1) top / left neighbour rows
    (index s = above-right / below-left sample; reference:
    IntraPrediction.cpp:295 xPredIntraPlanar)."""
    log2s = s.bit_length() - 1
    xs = jnp.arange(s, dtype=jnp.int32)
    tr = top[:, s][:, None, None]
    bl = left[:, s][:, None, None]
    t = top[:, None, :s]                               # (B, 1, s)
    l = left[:, :s, None]                              # (B, s, 1)
    hor = (s - 1 - xs)[None, None, :] * l + (xs + 1)[None, None, :] * tr
    ver = (s - 1 - xs)[None, :, None] * t + (xs + 1)[None, :, None] * bl
    return (hor + ver + s) >> (log2s + 1)


def ciip_from_pred(pred_plane: jnp.ndarray, s: int) -> jnp.ndarray:
    """CIIP candidate for every block of the frame: planar intra whose
    neighbours come from the inter-predicted plane, averaged with the
    inter prediction itself — (inter + planar + 1) >> 1 (reference: CIIP
    weight 2/2 mid case).  Returns (B, s, s) blocks in raster order."""
    h, w = pred_plane.shape
    nby, nbx = h // s, w // s
    pad = jnp.pad(pred_plane, ((1, s), (1, s)), mode="edge")
    idx = jnp.arange(nby * nbx, dtype=jnp.int32)
    y0 = (idx // nbx) * s
    x0 = (idx % nbx) * s

    def one(y, x):
        top = jax.lax.dynamic_slice(pad, (y, x + 1), (1, s + 1))[0]
        left = jax.lax.dynamic_slice(pad, (y + 1, x), (s + 1, 1))[:, 0]
        return top, left
    top, left = jax.vmap(one)(y0, x0)
    planar = _planar(top, left, s)
    blocks = (pred_plane.reshape(nby, s, nbx, s).transpose(0, 2, 1, 3)
              .reshape(-1, s, s))
    return (blocks + planar + 1) >> 1
