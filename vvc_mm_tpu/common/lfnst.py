"""LFNST — low-frequency non-separable secondary transform, batched.

TPU-native analog of the reference's LFNST (reference:
source/Lib/CommonLib/TrQuant.cpp:238 fwdLfnstNxN / :262 invLfnstNxN +
RomLFNST.cpp trained kernel tables): after the primary separable transform,
the top-left (low-frequency) 4x4 coefficients of an intra block pass
through a non-separable 16x16 transform chosen by intra-mode class and a
signaled index (0 = off, 1..2 = kernel candidates).

Kernel derivation (no copied tables): the kernels are KLTs of a
first-order Gauss-Markov residual field oriented along the mode-class
direction — the standard analytical approximation of trained secondary
transforms.  Computed once in numpy (eigh of a directional graph
Laplacian), quantized to 7-bit fixed point, shared bit-exactly by encoder
and decoder (the *quantized* matrix pair (K, K^T) is the normative
transform; orthogonality is only approximate, which costs RD, not
correctness).

Everything applies as one batched einsum over all blocks of a wavefront
(the reference does one 16-sample butterfly per block at a time).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

N_LFNST_CAND = 2      # signaled index 0 (off) / 1 / 2
SHIFT = 7             # kernel fixed-point bits
REG = 4               # transform region: top-left 4x4


@functools.lru_cache(maxsize=None)
def _kernels() -> np.ndarray:
    """(4 classes, 2 cands, 16, 16) int32 orthonormal-ish kernels.

    Class c in {0: planar/DC, 1: horizontal-ish, 2: vertical-ish, 3: MIP}.
    Candidate k rotates the model correlation (rho) to give two distinct
    bases per class.
    """
    out = np.zeros((4, N_LFNST_CAND, REG * REG, REG * REG))
    angles = {0: 45.0, 1: 0.0, 2: 90.0, 3: 45.0}
    for c in range(4):
        th = np.deg2rad(angles[c])
        dy, dx = np.sin(th), np.cos(th)
        for k in range(N_LFNST_CAND):
            rho_a = 0.95 - 0.2 * k          # along-direction correlation
            rho_b = 0.5 + 0.2 * k           # across
            yy, xx = np.mgrid[0:REG, 0:REG]
            p = np.stack([yy.ravel(), xx.ravel()], 1).astype(np.float64)
            d = p[:, None, :] - p[None, :, :]
            along = d[:, :, 0] * dy + d[:, :, 1] * dx
            across = -d[:, :, 0] * dx + d[:, :, 1] * dy
            cov = (rho_a ** np.abs(along)) * (rho_b ** np.abs(across))
            w, v = np.linalg.eigh(cov)
            # order basis vectors by decreasing eigenvalue (energy compaction
            # first), rows = basis functions
            out[c, k] = v[:, ::-1].T
    return np.round(out * (1 << SHIFT)).astype(np.int32)


def kernels_jnp() -> jnp.ndarray:
    return jnp.asarray(_kernels())       # (4, 2, 16, 16)


def mode_class(mode: jnp.ndarray) -> jnp.ndarray:
    """Intra mode -> kernel class (reference: TrQuant lfnstIdx mode
    mapping).  67+ (MIP) -> class 3."""
    cls = jnp.where(mode < 2, 0,
          jnp.where(mode <= 34, 1,
          jnp.where(mode <= 66, 2, 3)))
    return cls.astype(jnp.int32)


def _region_vec(coeff: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, 16) top-left 4x4 raster vector."""
    return coeff[:, :REG, :REG].reshape(coeff.shape[0], REG * REG)


def _region_put(coeff: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    b = coeff.shape[0]
    return coeff.at[:, :REG, :REG].set(vec.reshape(b, REG, REG))


def forward(coeff: jnp.ndarray, cls: jnp.ndarray, idx: int) -> jnp.ndarray:
    """Apply candidate `idx` (1-based) forward LFNST per block class."""
    K = kernels_jnp()[cls, idx - 1]               # (B, 16, 16)
    x = _region_vec(coeff)
    y = jnp.einsum("bij,bj->bi", K, x, preferred_element_type=jnp.int32)
    y = (y + (1 << (SHIFT - 1))) >> SHIFT
    return _region_put(coeff, y)


def inverse(coeff: jnp.ndarray, cls: jnp.ndarray, idx: int) -> jnp.ndarray:
    """Transpose kernel (normative inverse; exact inverse up to the 7-bit
    quantization, shared enc/dec)."""
    K = kernels_jnp()[cls, idx - 1]
    y = _region_vec(coeff)
    x = jnp.einsum("bji,bj->bi", K, y, preferred_element_type=jnp.int32)
    x = (x + (1 << (SHIFT - 1))) >> SHIFT
    return _region_put(coeff, x)
