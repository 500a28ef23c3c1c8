"""Batched motion estimation — full-search integer + fractional refinement.

TPU-native re-design of the reference InterSearch motion estimation
(reference: source/Lib/EncoderLib/InterSearch.cpp — xMotionEstimation:4937
TZ search + fractional refinement).  The TZ pattern search is serial,
divergent control flow; on TPU an *exhaustive* integer search is cheaper:
every displacement of the (2R+1)^2 window is a full-frame shift-and-SAD,
reduced per block with one reshape — all candidates for all blocks at once
on the VPU, then an argmin.  Fractional refinement then evaluates the 8
half/quarter/sixteenth-pel neighbors per block through the real MC filters
(shared with the decoder path), also batched.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..common import interp


def _block_sums(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Sum (H, W) -> (H/s, W/s) over s x s tiles."""
    h, w = x.shape
    return x.reshape(h // s, s, w // s, s).sum(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("block_size", "search_range",
                                             "margin", "lambda_bits_x16"))
def integer_search(orig: jnp.ndarray, ref_padded: jnp.ndarray,
                   block_size: int, search_range: int, margin: int = 0,
                   lambda_bits_x16: int = 0):
    """Exhaustive integer-pel search for every block of a frame.

    Args:
      orig: (H, W) int32 original luma.
      ref_padded: (H + 2*margin, W + 2*margin) int32 reference with
        edge-extended margin >= search_range.
      lambda_bits_x16: MV-cost weight (lambda * bits-per-mv-step, x16 fixed
        point) applied to |mv| as a cheap rate proxy (reference: RdCost
        m_motionLambda * mvBits).
    Returns:
      (mv_int, sad): (nby, nbx, 2) int32 integer MVs (x, y) and their SADs.
    """
    h, w = orig.shape
    r = search_range
    s = block_size
    nby, nbx = h // s, w // s
    m = margin if margin else r

    disp = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    disp_np = np.array(disp, dtype=np.int32)

    def sad_of(d):
        dy, dx = d
        shifted = jax.lax.dynamic_slice(ref_padded, (m + dy, m + dx), (h, w))
        return _block_sums(jnp.abs(orig - shifted), s)

    # scan over displacements keeps the compiled program small; each step is
    # a full-frame shift + blockwise SAD reduction (VPU-bound)
    def step(_, d):
        return None, sad_of(d)
    _, sads = jax.lax.scan(step, None, jnp.asarray(disp_np))  # (D, nby, nbx)

    if lambda_bits_x16:
        cost_np = (np.abs(disp_np[:, 0]) + np.abs(disp_np[:, 1]))
        mv_cost = (jnp.asarray(cost_np) * lambda_bits_x16) >> 4
        total = sads + mv_cost[:, None, None]
    else:
        total = sads
    best = jnp.argmin(total, axis=0)                          # (nby, nbx)
    dtab = jnp.asarray(disp_np)
    mv_int = jnp.stack([dtab[best, 1], dtab[best, 0]], axis=-1)  # (..., [x,y])
    sad = jnp.take_along_axis(sads.reshape(len(disp), -1),
                              best.reshape(1, -1), axis=0).reshape(nby, nbx)
    return mv_int, sad


@functools.partial(jax.jit, static_argnames=("block_size", "margin",
                                             "bit_depth"))
def fractional_refine(orig: jnp.ndarray, ref_padded: jnp.ndarray,
                      mv_int: jnp.ndarray, block_size: int, margin: int,
                      bit_depth: int = 8):
    """Refine integer MVs to 1/16-pel: three nested diamond steps (half ->
    quarter -> sixteenth), each evaluating the 8 neighbors through the real
    8-tap MC filter (reference: InterSearch xPatternSearchFracDIF, extended
    to 1/16 because MM reprojection rounds to 1/16-pel).

    Args:
      mv_int: (nby, nbx, 2) integer-pel MVs (x, y).
    Returns:
      (nby, nbx, 2) int32 MVs in 1/16-pel units.
    """
    s = block_size
    h, w = orig.shape
    nby, nbx = h // s, w // s
    nb = nby * nbx
    ys = (jnp.arange(nb, dtype=jnp.int32) // nbx) * s
    xs = (jnp.arange(nb, dtype=jnp.int32) % nbx) * s
    ob = orig.reshape(nby, s, nbx, s).transpose(0, 2, 1, 3).reshape(nb, s, s)

    mv = (mv_int.reshape(nb, 2) * 16).astype(jnp.int32)

    def eval_mv(mv_c):
        pred = interp.mc_luma(ref_padded, mv_c, ys, xs, s, s, margin,
                              bit_depth)
        pix = interp.finalize_uni(pred, bit_depth)
        return jnp.sum(jnp.abs(pix - ob), axis=(1, 2))

    base_cost = eval_mv(mv)
    neigh = np.array([(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
                      (-1, 1), (0, 1), (1, 1)], dtype=np.int32)
    for step_pel in (8, 4, 2, 1):
        for k in range(8):
            d = jnp.asarray(neigh[k] * step_pel)
            cost = eval_mv(mv + d[None, :])
            better = cost < base_cost
            mv = jnp.where(better[:, None], mv + d[None, :], mv)
            base_cost = jnp.minimum(cost, base_cost)
    return mv.reshape(nby, nbx, 2), base_cost.reshape(nby, nbx)
