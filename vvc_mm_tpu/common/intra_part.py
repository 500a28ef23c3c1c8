"""Two-level intra partitioning: 16x16 superblocks vs 8x8 quads.

TPU-native analog of one level of the reference's QTMT intra recursion
(reference: EncCu.cpp:499 xCompressCU intra split decision; CABAC
split_cu_flag).  The wavefront runs over 16x16 SUPERBLOCKS (d = 2*i + j
on the superblock grid); each step evaluates, closed-loop and batched
across the whole wavefront:

  * the 16x16 whole-block intra coding (all 67 modes, SATD+bits mode
    pick, transform/quant/recon), and
  * the four 8x8 sub-blocks in z-order — sequential sub-steps so each
    sub-block predicts from the true reconstruction of its causal
    neighbors, exactly like the fixed-8x8 wavefront does,

then picks per superblock by SSD + lambda*(level-rate + mode bits +
split flag) and scatters the winning reconstruction.  Encoder and
decoder share the reconstruction math (the decoder runs the same scan
with parsed split/modes/levels), so recon is bit-exact by construction.

Scope: base toolset (DST7/DCT2 implicit-MTS TQ, 3-entry MPM, derived
chroma) — the optional intra tools (MIP/CCLM/LFNST/...) stay on the
fixed-grid path (common/wavefront.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import intra, quant
from .rdcost import satd as satd_fn
from .wavefront import (MARGIN, _gather_blocks, _gather_cref, _mpm3,
                        _pad_to_buffer, _rate_est, _scatter_blocks,
                        _tq_reconstruct, wavefront_coords)

SB = 16          # superblock size
SUB = 8          # split sub-block size
_QUADS = ((0, 0), (0, 1), (1, 0), (1, 1))     # z-order (dy, dx)


def _mode_bits(modes_grid, mpm):
    return jnp.where(modes_grid[None, :] == mpm[:, 0:1], 2.0,
                     jnp.where(modes_grid[None, :] == mpm[:, 1:2], 3.0,
                               jnp.where(modes_grid[None, :] == mpm[:, 2:3],
                                         3.0, 7.0)))


@functools.partial(jax.jit, static_argnames=("qp", "bit_depth"))
def encode_intra_frame_part(orig_y, orig_u, orig_v, qp: int,
                            bit_depth: int = 8):
    """Closed-loop two-level intra encode.  Returns (outs, recon) where
    outs = (split, mode16, modes8, lev16_y, lev16_u, lev16_v, lev8_y,
    lev8_u, lev8_v) as per-step scan tensors."""
    h, w = orig_y.shape
    nsy, nsx = h // SB, w // SB
    sc16, sc8 = SB // 2, SUB // 2
    lam = quant.lambda_from_qp(qp, intra=True)
    lam_satd = math.sqrt(lam)
    mid = 1 << (bit_depth - 1)
    maxv = (1 << bit_depth) - 1

    coords_np, valid_np = wavefront_coords(nsy, nsx)
    coords = jnp.asarray(coords_np)
    valid = jnp.asarray(valid_np)

    oy = _pad_to_buffer(orig_y, mid)
    ou = _pad_to_buffer(orig_u, mid)
    ov = _pad_to_buffer(orig_v, mid)
    ry = jnp.full_like(oy, mid)
    ru = jnp.full_like(ou, mid)
    rv = jnp.full_like(ov, mid)
    # mode map on the 8x8 sub-grid (for MPM), 1-padded like wavefront.py
    mode_map = jnp.full((2 * nsy + 1, 2 * nsx + 1), -1, dtype=jnp.int32)

    modes_grid = jnp.arange(67, dtype=jnp.int32)

    def mpm_at(mode_map, cy, cx):
        """MPM from 8-grid neighbors left (cy, cx-1), above (cy-1, cx) —
        map is 1-padded so raw indices address (cy-1+1, cx+1) etc."""
        lm = mode_map[1 + cy, cx]
        am = mode_map[cy, 1 + cx]
        return _mpm3(lm, am), lm, am

    def code_block(ry_buf, o_buf, mode_map, y0, x0, cy, cx, s):
        """Decide + TQ one luma block batch at size s.  Returns
        (mode, lev, rec, ssd, bits)."""
        cref = _gather_cref(ry_buf, y0, x0, s)
        pall = intra.predict_all_modes(cref, s, s)
        ob = _gather_blocks(o_buf, y0, x0, s)
        dist = satd_fn(pall, ob[:, None]).astype(jnp.float32)
        mpm, _, _ = mpm_at(mode_map, cy, cx)
        bits = _mode_bits(modes_grid, mpm)
        mode = jnp.argmin(dist + lam_satd * bits, axis=1).astype(jnp.int32)
        pred = jnp.take_along_axis(pall, mode[:, None, None, None],
                                   axis=1)[:, 0]
        lev, rec = _tq_reconstruct(pred, ob - pred, None, qp, s, bit_depth,
                                   True)
        ssd = ((rec - ob) ** 2).sum((1, 2)).astype(jnp.float32)
        mbits = jnp.take_along_axis(bits, mode[:, None], 1)[:, 0]
        return mode, lev, rec, ssd, _rate_est(lev) + mbits

    def chroma_block(r_buf, o_buf, nb_mode, y0c, x0c, s):
        cref = _gather_cref(r_buf, y0c, x0c, s)
        pred = intra.predict_mode(cref, nb_mode, s, s)
        ob = _gather_blocks(o_buf, y0c, x0c, s)
        lev, rec = _tq_reconstruct(pred, ob - pred, None, qp, s, bit_depth,
                                   True, luma=False)
        ssd = ((rec - ob) ** 2).sum((1, 2)).astype(jnp.float32)
        return lev, rec, ssd, _rate_est(lev)

    def step(state, xs):
        ry, ru, rv, mode_map = state
        cds, vld = xs
        sy, sx = cds[:, 0], cds[:, 1]
        dead_y = ry.shape[0] - SB - 4
        dead_x = ry.shape[1] - SB - 4
        y0 = jnp.where(vld, MARGIN + sy * SB, dead_y)
        x0 = jnp.where(vld, MARGIN + sx * SB, dead_x)
        y0c = jnp.where(vld, MARGIN + sy * sc16, ru.shape[0] - sc16 - 4)
        x0c = jnp.where(vld, MARGIN + sx * sc16, ru.shape[1] - sc16 - 4)
        cy16, cx16 = 2 * sy, 2 * sx

        # ---- 16x16 whole-block candidate ----
        (mode16, lev16_y, rec16_y, ssd16,
         rbits16) = code_block(ry, oy, mode_map, y0, x0, cy16, cx16, SB)
        nb16 = mode16
        lev16_u, rec16_u, ssd16u, rb16u = chroma_block(ru, ou, nb16, y0c,
                                                       x0c, sc16)
        lev16_v, rec16_v, ssd16v, rb16v = chroma_block(rv, ov, nb16, y0c,
                                                       x0c, sc16)
        cost16 = (ssd16 + ssd16u + ssd16v
                  + lam * (rbits16 + rb16u + rb16v + 1.0))

        # ---- four 8x8 sub-blocks, z-order sub-steps ----
        ry8, ru8, rv8 = ry, ru, rv
        map8 = mode_map
        modes8, levs8_y, levs8_u, levs8_v = [], [], [], []
        recs8_y, recs8_u, recs8_v = [], [], []
        cost8 = jnp.zeros_like(cost16)
        for (qy, qx) in _QUADS:
            y0s = y0 + qy * SUB
            x0s = x0 + qx * SUB
            y0sc = y0c + qy * sc8
            x0sc = x0c + qx * sc8
            cy, cx = cy16 + qy, cx16 + qx
            (m8, l8, r8, ssd8, rb8) = code_block(ry8, oy, map8, y0s, x0s,
                                                 cy, cx, SUB)
            l8u, r8u, s8u, rb8u = chroma_block(ru8, ou, m8, y0sc, x0sc, sc8)
            l8v, r8v, s8v, rb8v = chroma_block(rv8, ov, m8, y0sc, x0sc, sc8)
            cost8 = cost8 + ssd8 + s8u + s8v + lam * (rb8 + rb8u + rb8v)
            ry8 = _scatter_blocks(ry8, y0s, x0s, r8)
            ru8 = _scatter_blocks(ru8, y0sc, x0sc, r8u)
            rv8 = _scatter_blocks(rv8, y0sc, x0sc, r8v)
            my = jnp.where(vld, 1 + cy, 0)
            mx = jnp.where(vld, 1 + cx, 0)
            map8 = map8.at[my, mx].set(jnp.where(vld, m8, map8[my, mx]))
            modes8.append(m8)
            levs8_y.append(l8)
            levs8_u.append(l8u)
            levs8_v.append(l8v)
            recs8_y.append(r8)
            recs8_u.append(r8u)
            recs8_v.append(r8v)
        cost8 = cost8 + lam * 1.0                 # split flag

        split = (cost8 < cost16).astype(jnp.int32)

        # ---- final reconstruction per superblock ----
        def assemble(quads, s):
            top = jnp.concatenate([quads[0], quads[1]], axis=2)
            bot = jnp.concatenate([quads[2], quads[3]], axis=2)
            return jnp.concatenate([top, bot], axis=1)     # (B, 2s, 2s)

        rec_y = jnp.where(split[:, None, None] == 1,
                          assemble(recs8_y, SUB), rec16_y)
        rec_u = jnp.where(split[:, None, None] == 1,
                          assemble(recs8_u, sc8), rec16_u)
        rec_v = jnp.where(split[:, None, None] == 1,
                          assemble(recs8_v, sc8), rec16_v)
        ry = _scatter_blocks(ry, y0, x0, rec_y)
        ru = _scatter_blocks(ru, y0c, x0c, rec_u)
        rv = _scatter_blocks(rv, y0c, x0c, rec_v)
        # mode map: split -> the four 8-modes; whole -> mode16 in all cells
        new_map = mode_map
        for k, (qy, qx) in enumerate(_QUADS):
            cell = jnp.where(split == 1, modes8[k], mode16)
            my = jnp.where(vld, 1 + cy16 + qy, 0)
            mx = jnp.where(vld, 1 + cx16 + qx, 0)
            new_map = new_map.at[my, mx].set(
                jnp.where(vld, cell, new_map[my, mx]))
        outs = (split, mode16, jnp.stack(modes8, 1),
                lev16_y, lev16_u, lev16_v,
                jnp.stack(levs8_y, 1), jnp.stack(levs8_u, 1),
                jnp.stack(levs8_v, 1))
        return (ry, ru, rv, new_map), outs

    (ry, ru, rv, _), outs = jax.lax.scan(
        step, (ry, ru, rv, mode_map), (coords, valid))
    recon = dict(
        y=jax.lax.dynamic_slice(ry, (MARGIN, MARGIN), (h, w)),
        u=jax.lax.dynamic_slice(ru, (MARGIN, MARGIN), (h // 2, w // 2)),
        v=jax.lax.dynamic_slice(rv, (MARGIN, MARGIN), (h // 2, w // 2)))
    return outs, recon


@functools.partial(jax.jit, static_argnames=("qp", "height", "width",
                                             "bit_depth"))
def decode_intra_frame_part(split_steps, mode16_steps, modes8_steps,
                            l16y, l16u, l16v, l8y, l8u, l8v, qp: int,
                            height: int, width: int, bit_depth: int = 8):
    """Decoder scan: identical reconstruction from parsed decisions."""
    h, w = height, width
    nsy, nsx = h // SB, w // SB
    sc16, sc8 = SB // 2, SUB // 2
    mid = 1 << (bit_depth - 1)
    coords_np, valid_np = wavefront_coords(nsy, nsx)
    coords = jnp.asarray(coords_np)
    valid = jnp.asarray(valid_np)

    ry = jnp.full((h + 2 * MARGIN, w + 2 * MARGIN), mid, dtype=jnp.int32)
    ru = jnp.full((h // 2 + 2 * MARGIN, w // 2 + 2 * MARGIN), mid,
                  dtype=jnp.int32)
    rv = jnp.full_like(ru, mid)

    def rec_block(ry_buf, y0, x0, mode, lev, s, luma=True):
        cref = _gather_cref(ry_buf, y0, x0, s)
        pred = intra.predict_mode(cref, mode, s, s)
        _, rec = _tq_reconstruct(pred, None, lev, qp, s, bit_depth, True,
                                 luma=luma)
        return rec

    def step(state, xs):
        ry, ru, rv = state
        (cds, vld, split, mode16, modes8, v16y, v16u, v16v, v8y, v8u,
         v8v) = xs
        sy, sx = cds[:, 0], cds[:, 1]
        y0 = jnp.where(vld, MARGIN + sy * SB, ry.shape[0] - SB - 4)
        x0 = jnp.where(vld, MARGIN + sx * SB, ry.shape[1] - SB - 4)
        y0c = jnp.where(vld, MARGIN + sy * sc16, ru.shape[0] - sc16 - 4)
        x0c = jnp.where(vld, MARGIN + sx * sc16, ru.shape[1] - sc16 - 4)

        rec16_y = rec_block(ry, y0, x0, mode16, v16y, SB)
        rec16_u = rec_block(ru, y0c, x0c, mode16, v16u, sc16, luma=False)
        rec16_v = rec_block(rv, y0c, x0c, mode16, v16v, sc16, luma=False)

        ry8, ru8, rv8 = ry, ru, rv
        recs8_y, recs8_u, recs8_v = [], [], []
        for k, (qy, qx) in enumerate(_QUADS):
            y0s = y0 + qy * SUB
            x0s = x0 + qx * SUB
            y0sc = y0c + qy * sc8
            x0sc = x0c + qx * sc8
            m8 = modes8[:, k]
            r8 = rec_block(ry8, y0s, x0s, m8, v8y[:, k], SUB)
            r8u = rec_block(ru8, y0sc, x0sc, m8, v8u[:, k], sc8,
                            luma=False)
            r8v = rec_block(rv8, y0sc, x0sc, m8, v8v[:, k], sc8,
                            luma=False)
            ry8 = _scatter_blocks(ry8, y0s, x0s, r8)
            ru8 = _scatter_blocks(ru8, y0sc, x0sc, r8u)
            rv8 = _scatter_blocks(rv8, y0sc, x0sc, r8v)
            recs8_y.append(r8)
            recs8_u.append(r8u)
            recs8_v.append(r8v)

        def assemble(quads):
            top = jnp.concatenate([quads[0], quads[1]], axis=2)
            bot = jnp.concatenate([quads[2], quads[3]], axis=2)
            return jnp.concatenate([top, bot], axis=1)

        rec_y = jnp.where(split[:, None, None] == 1, assemble(recs8_y),
                          rec16_y)
        rec_u = jnp.where(split[:, None, None] == 1, assemble(recs8_u),
                          rec16_u)
        rec_v = jnp.where(split[:, None, None] == 1, assemble(recs8_v),
                          rec16_v)
        ry = _scatter_blocks(ry, y0, x0, rec_y)
        ru = _scatter_blocks(ru, y0c, x0c, rec_u)
        rv = _scatter_blocks(rv, y0c, x0c, rec_v)
        return (ry, ru, rv), None

    (ry, ru, rv), _ = jax.lax.scan(
        step, (ry, ru, rv),
        (coords, valid, split_steps, mode16_steps, modes8_steps,
         l16y, l16u, l16v, l8y, l8u, l8v))
    return dict(
        y=jax.lax.dynamic_slice(ry, (MARGIN, MARGIN), (h, w)),
        u=jax.lax.dynamic_slice(ru, (MARGIN, MARGIN), (h // 2, w // 2)),
        v=jax.lax.dynamic_slice(rv, (MARGIN, MARGIN), (h // 2, w // 2)))
