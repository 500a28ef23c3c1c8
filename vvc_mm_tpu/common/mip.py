"""MIP — matrix-based intra prediction, batched for the MXU.

TPU-native analog of the reference MatrixIntraPrediction (reference:
source/Lib/CommonLib/MatrixIntraPrediction.{cpp,h} + MipData.h): predict a
block as  clip( mean + (W_k @ (reduced_boundary - mean)) >> 6 )  followed by
a fixed linear upsample — i.e. VVC's three MIP stages (boundary reduction,
matrix product, linear interpolation).

The reference ships NN-trained weight matrices; this framework derives its
matrix family *deterministically* (no copied data): mode k is a directional
inverse-distance smoother with anisotropy angle k*pi/8 — a soft, averaged
directional predictor that complements the sharp angular modes on smooth /
noisy gradients.  Weights are 6-bit-quantized integers, so encoder and
decoder agree bit-exactly, and the whole mode family evaluates as one
einsum over every wavefront block at once (MXU work, zero control flow).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

N_MIP_MODES = 8
RED_BDRY = 4          # reduced boundary samples per side (VVC: 2 or 4)
SHIFT = 6             # weight fixed-point (VVC MIP: 6-bit weights)


@functools.lru_cache(maxsize=None)
def _matrices(red: int) -> np.ndarray:
    """(modes, red*red, 2*RED_BDRY) int32 weight matrices (6-bit fixed pt).

    Two families (both deterministic; the reference's trained MipData.h
    matrices mix the same two behaviors — smoothing and extrapolation):
      modes 0-3: anisotropic inverse-distance smoothers at 4 angles —
        positive interpolating weights (soft directional predictors);
      modes 4-7: least-squares *plane extrapolators* — pixel (y,x) =
        a + b*y + c*x fitted to the boundary (full / y-only / x-only /
        half-blended), whose weights go negative, so ramps extrapolate
        exactly where the smoothers would regress to the mean.
    """
    n = 2 * RED_BDRY
    out = np.zeros((N_MIP_MODES, red * red, n), np.float64)
    # boundary sample coordinates in block units (top at y=-0.5, left x=-0.5)
    bx = (np.arange(RED_BDRY) + 0.5) * (red / RED_BDRY)
    bpos = np.concatenate([
        np.stack([np.full(RED_BDRY, -0.5), bx], 1),          # top (y, x)
        np.stack([bx, np.full(RED_BDRY, -0.5)], 1),          # left
    ])                                                        # (n, 2)
    yy, xx = np.mgrid[0:red, 0:red]
    ppos = np.stack([yy.ravel() + 0.5, xx.ravel() + 0.5], 1)  # (red², 2)
    for k in range(4):
        th = k * np.pi / 4
        c, s = np.cos(th), np.sin(th)
        d = ppos[:, None, :] - bpos[None, :, :]               # (red², n, 2)
        along = d[..., 0] * s + d[..., 1] * c                 # stretched
        across = -d[..., 0] * c + d[..., 1] * s
        dist = np.sqrt(0.1 * along ** 2 + 5.0 * across ** 2)
        w = np.exp(-dist / (0.5 * red))
        w /= w.sum(1, keepdims=True)
        out[k] = w
    # plane extrapolators: pinv maps boundary -> (a, b, c)
    A = np.stack([np.ones(n), bpos[:, 0], bpos[:, 1]], 1)     # (n, 3)
    pinv = np.linalg.pinv(A)                                  # (3, n)
    basis = np.stack([np.ones(red * red), ppos[:, 0], ppos[:, 1]], 1)
    full = basis @ pinv                                       # (red², n)
    ysel = basis @ (np.diag([1.0, 1.0, 0.0]) @ pinv)
    xsel = basis @ (np.diag([1.0, 0.0, 1.0]) @ pinv)
    out[4] = full
    out[5] = ysel
    out[6] = xsel
    out[7] = 0.5 * full + 0.5 * out[0]
    return np.round(out * (1 << SHIFT)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _upsampler(s: int, red: int) -> np.ndarray:
    """(s*s, red*red) int32 bilinear upsample matrix, rows sum 64."""
    f = s / red
    w = np.zeros((s * s, red * red), np.float64)
    for y in range(s):
        for x in range(s):
            gy = min(max((y + 0.5) / f - 0.5, 0.0), red - 1.0)
            gx = min(max((x + 0.5) / f - 0.5, 0.0), red - 1.0)
            y0, x0 = int(gy), int(gx)
            y1, x1 = min(y0 + 1, red - 1), min(x0 + 1, red - 1)
            fy, fx = gy - y0, gx - x0
            w[y * s + x, y0 * red + x0] += (1 - fy) * (1 - fx)
            w[y * s + x, y0 * red + x1] += (1 - fy) * fx
            w[y * s + x, y1 * red + x0] += fy * (1 - fx)
            w[y * s + x, y1 * red + x1] += fy * fx
    return np.round(w * (1 << SHIFT)).astype(np.int32)


def _reduce_boundary(cref: jnp.ndarray, s: int) -> jnp.ndarray:
    """cref layout per intra.py: [left reversed (2s), corner, top (2s)].
    Returns (B, 2*RED_BDRY) int32 [top_reduced, left_reduced]."""
    top = cref[:, 2 * s + 1: 3 * s + 1]          # nearest s top samples
    left = cref[:, :2 * s][:, ::-1][:, :s]       # nearest s left samples
    g = s // RED_BDRY
    topr = top.reshape(-1, RED_BDRY, g).sum(2)
    leftr = left.reshape(-1, RED_BDRY, g).sum(2)
    return jnp.concatenate([(topr + g // 2) // g,
                            (leftr + g // 2) // g], 1).astype(jnp.int32)


def predict_mip_all(cref: jnp.ndarray, s: int, bit_depth: int = 8
                    ) -> jnp.ndarray:
    """All MIP modes for a batch of blocks: (B, 4s+1) refs -> (B, M, s, s).

    One einsum evaluates every mode of every block (reference evaluates one
    (block, mode) at a time, MatrixIntraPrediction.cpp predBlk)."""
    red = min(s, 8)
    W = jnp.asarray(_matrices(red))              # (M, red², n)
    U = jnp.asarray(_upsampler(s, red))          # (s², red²)
    bdry = _reduce_boundary(cref, s)             # (B, n)
    mean = (bdry.sum(1, keepdims=True) + RED_BDRY) >> (RED_BDRY.bit_length())
    centered = bdry - mean
    r = jnp.einsum("mrn,bn->bmr", W, centered,
                   preferred_element_type=jnp.int32)
    r = (r + (1 << (SHIFT - 1))) >> SHIFT        # (B, M, red²)
    up = jnp.einsum("sr,bmr->bms", U, r,
                    preferred_element_type=jnp.int32)
    up = (up + (1 << (SHIFT - 1))) >> SHIFT
    p = up + mean[:, :, None]
    b, m = p.shape[0], p.shape[1]
    return jnp.clip(p, 0, (1 << bit_depth) - 1).reshape(b, m, s, s)


def predict_mip_mode(cref: jnp.ndarray, mip_mode: jnp.ndarray, s: int,
                     bit_depth: int = 8) -> jnp.ndarray:
    """Single signaled MIP mode per block (decoder path): (B,) modes."""
    allp = predict_mip_all(cref, s, bit_depth)
    return jnp.take_along_axis(
        allp, mip_mode[:, None, None, None], axis=1)[:, 0]
