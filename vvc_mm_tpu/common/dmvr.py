"""DMVR — decoder-side motion vector refinement by bilateral matching.

TPU-native analog of the reference DMVR (reference:
source/Lib/CommonLib/InterPrediction.cpp:2241 xProcessDMVR — for each
bi-predicted block, a +-2-pel search around the signaled MV pair minimizes
SAD(P0(mv0 + d), P1(mv1 - d)); the mirrored offset assumes linear motion
across the two references; the refined pair then drives the final MC).

Normative and signaling-free: encoder reconstruction and decoder run this
identical integer search, so it is covered by the decoded-picture-hash
oracle.  The reference refines one block at a time with early exits; here
all bi blocks of the frame evaluate all 25 mirrored offsets as one batched
gather + SAD reduction (ties resolve to the earliest offset in a fixed
scan with (0,0) first — zero bias like the reference's center preference).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import interp

DMVR_RANGE = 2


@functools.partial(jax.jit, static_argnames=("block_size", "margin"))
def dmvr_refine(ref0_pad: jnp.ndarray, ref1_pad: jnp.ndarray,
                mv0: jnp.ndarray, mv1: jnp.ndarray, dirs: jnp.ndarray,
                block_size: int, margin: int):
    """Refine bi-predicted blocks' MV pairs by +-2-pel bilateral matching.

    Args:
      ref0_pad/ref1_pad: margin-padded reference luma planes.
      mv0/mv1: (nby, nbx, 2) signaled 1/16-pel MVs.
      dirs: (nby, nbx) 0=L0, 1=L1, 2=BI — only BI blocks refine.
    Returns (mv0', mv1') with the mirrored integer offset applied.
    """
    s = block_size
    r = DMVR_RANGE
    nby, nbx = dirs.shape
    nb = nby * nbx
    ys = (jnp.arange(nb, dtype=jnp.int32) // nbx) * s
    xs = (jnp.arange(nb, dtype=jnp.int32) % nbx) * s
    m0 = mv0.reshape(nb, 2)
    m1 = mv1.reshape(nb, 2)

    def patches(ref, mv):
        # cost search runs on nearest-integer samples (the reference uses
        # 2-tap bilinear at reduced precision; nearest is our deterministic
        # low-cost equivalent — the final MC still uses the 8-tap filters)
        bx = xs + margin + ((mv[:, 0] + 8) >> 4) - r
        by = ys + margin + ((mv[:, 1] + 8) >> 4) - r
        bx = jnp.clip(bx, 0, ref.shape[1] - (s + 2 * r))
        by = jnp.clip(by, 0, ref.shape[0] - (s + 2 * r))
        return interp.gather_patches(ref, by, bx, s + 2 * r, s + 2 * r)

    p0 = patches(ref0_pad, m0)
    p1 = patches(ref1_pad, m1)

    offsets = [(0, 0)] + [(dy, dx)
                          for dy in range(-r, r + 1)
                          for dx in range(-r, r + 1) if (dy, dx) != (0, 0)]
    best_cost = jnp.full((nb,), 1 << 30, dtype=jnp.int32)
    best = jnp.zeros((nb, 2), dtype=jnp.int32)
    for dy, dx in offsets:
        c0 = p0[:, r + dy:r + dy + s, r + dx:r + dx + s]
        c1 = p1[:, r - dy:r - dy + s, r - dx:r - dx + s]
        sad = jnp.sum(jnp.abs(c0 - c1), axis=(1, 2)).astype(jnp.int32)
        better = sad < best_cost
        best_cost = jnp.where(better, sad, best_cost)
        d = jnp.asarray([dx, dy], dtype=jnp.int32)
        best = jnp.where(better[:, None], d[None, :], best)

    bi = (dirs.reshape(nb) == 2)[:, None]
    d16 = best * 16
    mv0r = jnp.where(bi, m0 + d16, m0).reshape(nby, nbx, 2)
    mv1r = jnp.where(bi, m1 - d16, m1).reshape(nby, nbx, 2)
    return mv0r, mv1r
