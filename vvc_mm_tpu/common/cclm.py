"""CCLM — cross-component linear-model chroma prediction, batched.

TPU-native analog of the reference's chroma-from-luma path (reference:
source/Lib/CommonLib/IntraPrediction.cpp:267 predIntraChromaLM /
xGetLumaRecPixels + CCLM parameter derivation): chroma is predicted from
the *reconstructed, downsampled* luma of the same block through a linear
model c = (a * l >> K) + b whose parameters come from the block's
reconstructed neighbor border.

TPU re-design: all blocks of a wavefront derive their models at once —
the min/max pair selection is one argsort over the (short, static-length)
border vector per block; the model apply is elementwise VPU work.  All
math is int32 (floor divisions), so encoder and decoder agree bit-exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

K = 16  # fixed-point shift of the model slope


def downsample_luma(blocks: jnp.ndarray) -> jnp.ndarray:
    """(B, s, s) reconstructed luma -> (B, s/2, s/2) chroma-grid luma by
    2x2 averaging (the reference's 6-tap downsample simplified to the
    type-2 4:2:0 co-located average; self-consistent enc/dec)."""
    b, s, _ = blocks.shape
    sc = s // 2
    r = blocks.reshape(b, sc, 2, sc, 2)
    return (r.sum(axis=(2, 4)) + 2) >> 2


def cclm_params(border_l: jnp.ndarray, border_c: jnp.ndarray
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Derive (a, b) per block from border sample pairs.

    Args:
      border_l / border_c: (B, N) int32 downsampled-luma / chroma neighbor
        pairs (top row then left column).
    Returns:
      a, b: (B,) int32; prediction is clip((l * a >> K) + b).

    VVC-style 4-point min/max: average the two smallest / two largest luma
    samples (and their chroma partners) before the slope division
    (reference: IntraPrediction.cpp CCLM xGetLMParameters)."""
    order = jnp.argsort(border_l, axis=1)
    lo = order[:, :2]
    hi = order[:, -2:]
    l_min = (jnp.take_along_axis(border_l, lo, 1).sum(1) + 1) >> 1
    l_max = (jnp.take_along_axis(border_l, hi, 1).sum(1) + 1) >> 1
    c_min = (jnp.take_along_axis(border_c, lo, 1).sum(1) + 1) >> 1
    c_max = (jnp.take_along_axis(border_c, hi, 1).sum(1) + 1) >> 1
    diff = l_max - l_min
    num = (c_max - c_min) << K
    a = jnp.where(diff > 0, num // jnp.maximum(diff, 1), 0).astype(jnp.int32)
    b = (c_min - ((a * l_min) >> K)).astype(jnp.int32)
    return a, b


def cclm_predict(dsl: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                 bit_depth: int = 8) -> jnp.ndarray:
    """Apply the per-block linear model: (B, sc, sc) -> (B, sc, sc)."""
    p = ((dsl * a[:, None, None]) >> K) + b[:, None, None]
    return jnp.clip(p, 0, (1 << bit_depth) - 1).astype(jnp.int32)
