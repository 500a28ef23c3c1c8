"""Wavefront-batched intra frame codec (the TPU answer to per-CU recursion).

The reference encodes CTUs in raster order with a recursive, stateful RD
search (reference: EncSlice.cpp:1669 encodeCtus -> EncCu.cpp:499 xCompressCU),
and the decoder reconstructs in the same order (DecSlice.cpp:74).  Intra
prediction makes block (i,j) depend on reconstructed neighbors
(i-1,j), (i,j-1), (i-1,j+1) — which admits an *anti-diagonal wavefront*
d = 2i + j where every block on a wavefront is independent.

TPU-first architecture (this module):
  * one `lax.scan` over wavefronts; each step processes a fixed-size masked
    batch of blocks: gather refs -> predict all 67 modes -> SATD+lambda*bits
    decision -> transform/quant/dequant/inverse -> scatter reconstruction.
  * encoder and decoder share the reconstruction math (decoder runs the same
    scan with decisions replaced by parsed modes/levels), so encoder recon ==
    decoder recon bit-exactly by construction — the decoded-picture-hash
    oracle of the reference (DecLib.cpp:868 calcAndPrintHashStatus) holds by
    design, and is verified in tests/test_intra_codec.py.
  * mode decision is closed-loop (true reconstructed references) — the
    quality-relevant property of VTM's search — while staying batched.

Round-1 scope: uniform SxS luma blocks (S/2 chroma), DCT2 only.  QTMT
partitioning slots in as a pre-pass decision lattice (see SURVEY.md §7
"batch-of-blocks"), planned next.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import cclm, depquant, intra, lfnst, mip, quant, transforms
from .rdcost import satd as satd_fn

MARGIN = 64            # intra buffer margin (>= 2*S + slack)

# Intra block copy: block-aligned BV candidates (in block units), all causal
# under the wavefront order d = 2*by + bx (every candidate block has
# 2*dy + dx < 0, i.e. lies on an earlier anti-diagonal).  reference: IBC /
# IbcHashMap hash-ME over the reconstructed area (Hash.cpp, InterSearch IBC
# search); here a fixed candidate set evaluated batched, closed-loop.
IBC_BVS: tuple[tuple[int, int], ...] = (
    (0, -1), (0, -2), (0, -3), (0, -4),
    (-1, 0), (-1, -1), (-1, 1), (-1, -2),
    (-2, 0), (-2, 1), (-2, -1), (-2, 2))
IBC_BASE = 128         # block modes >= IBC_BASE are IBC (mode - base = BV idx)


@functools.lru_cache(maxsize=None)
def wavefront_coords(nby: int, nbx: int) -> tuple[np.ndarray, np.ndarray]:
    """Static wavefront schedule.

    Returns (coords, valid): coords (steps, bmax, 2) int32 block indices,
    valid (steps, bmax) bool.  Wavefront d = 2*by + bx."""
    dmax = 2 * (nby - 1) + (nbx - 1)
    rows = []
    for d in range(dmax + 1):
        blocks = [(by, d - 2 * by) for by in range(nby)
                  if 0 <= d - 2 * by < nbx]
        rows.append(blocks)
    bmax = max(len(r) for r in rows)
    coords = np.zeros((len(rows), bmax, 2), dtype=np.int32)
    valid = np.zeros((len(rows), bmax), dtype=bool)
    for i, r in enumerate(rows):
        for k, (by, bx) in enumerate(r):
            coords[i, k] = (by, bx)
            valid[i, k] = True
    return coords, valid


def _pad_to_buffer(plane: jnp.ndarray, fill: int) -> jnp.ndarray:
    h, w = plane.shape
    buf = jnp.full((h + 2 * MARGIN, w + 2 * MARGIN), fill, dtype=jnp.int32)
    return jax.lax.dynamic_update_slice(buf, plane.astype(jnp.int32),
                                        (MARGIN, MARGIN))


def _gather_cref(recon: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                 s: int) -> jnp.ndarray:
    """Combined intra reference vectors for a batch of blocks at padded-buffer
    coords (y0, x0).  Layout per intra.py: [left rev, corner, top]."""
    ln = 2 * s  # side length h+w

    def one(y, x):
        top = jax.lax.dynamic_slice(recon, (y - 1, x - 1), (1, ln + 1))[0]
        left = jax.lax.dynamic_slice(recon, (y, x - 1), (ln, 1))[:, 0]
        return jnp.concatenate([left[::-1], top])
    return jax.vmap(one)(y0, x0)


def _gather_blocks(buf: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                   s: int) -> jnp.ndarray:
    def one(y, x):
        return jax.lax.dynamic_slice(buf, (y, x), (s, s))
    return jax.vmap(one)(y0, x0)


def _gather_rect(buf: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                 h: int, w: int) -> jnp.ndarray:
    def one(y, x):
        return jax.lax.dynamic_slice(buf, (y, x), (h, w))
    return jax.vmap(one)(y0, x0)


def _cclm_luma_ctx(ry: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                   s: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Downsampled luma block + downsampled luma border (top|left) for the
    CCLM model (reference: IntraPrediction.cpp xGetLumaRecPixels)."""
    lblk = _gather_blocks(ry, y0, x0, s)
    dsl = cclm.downsample_luma(lblk)
    top2 = _gather_rect(ry, y0 - 2, x0, 2, s)          # (B, 2, s)
    left2 = _gather_rect(ry, y0, x0 - 2, s, 2)         # (B, s, 2)
    dsl_top = (top2[:, 0, 0::2] + top2[:, 0, 1::2]
               + top2[:, 1, 0::2] + top2[:, 1, 1::2] + 2) >> 2
    dsl_left = (left2[:, 0::2, 0] + left2[:, 1::2, 0]
                + left2[:, 0::2, 1] + left2[:, 1::2, 1] + 2) >> 2
    return dsl, jnp.concatenate([dsl_top, dsl_left], 1)


def _cclm_pred(plane_r: jnp.ndarray, y0c: jnp.ndarray, x0c: jnp.ndarray,
               sc: int, dsl: jnp.ndarray, border_l: jnp.ndarray,
               bit_depth: int) -> jnp.ndarray:
    ctop = _gather_rect(plane_r, y0c - 1, x0c, 1, sc)[:, 0, :]
    cleft = _gather_rect(plane_r, y0c, x0c - 1, sc, 1)[:, :, 0]
    border_c = jnp.concatenate([ctop, cleft], 1)
    a, b = cclm.cclm_params(border_l, border_c)
    return cclm.cclm_predict(dsl, a, b, bit_depth)


def _scatter_blocks(buf: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                    blocks: jnp.ndarray) -> jnp.ndarray:
    s = blocks.shape[-1]
    ar = jnp.arange(s, dtype=jnp.int32)
    ys = y0[:, None, None] + ar[None, :, None]
    xs = x0[:, None, None] + ar[None, None, :]
    return buf.at[ys, xs].set(blocks)


def _mpm3(left: jnp.ndarray, above: jnp.ndarray) -> jnp.ndarray:
    """Vectorized 3-entry MPM list (B,) x2 -> (B, 3).  Simplified HEVC-style
    derivation (the reference uses VVC 6-MPM, UnitTools getIntraMPMs);
    self-consistent between encoder decision and entropy coding."""
    l = jnp.where(left < 0, 0, left)
    a = jnp.where(above < 0, 0, above)
    eq = l == a
    ang = l >= 2
    prev = 2 + ((l - 2 + 64) % 65)
    nxt = 2 + ((l - 2 + 1) % 65)
    # distinct third mode for the l != a case
    def pick(c0, c1, c2, c3, c4):
        t = jnp.where((l != c3) & (a != c3), c3, c4)
        t = jnp.where((l != c2) & (a != c2), c2, t)
        t = jnp.where((l != c1) & (a != c1), c1, t)
        return jnp.where((l != c0) & (a != c0), c0, t)
    third = pick(0, 1, 50, 18, 2)
    m0 = jnp.where(eq & ang, l, jnp.where(eq, 0, l))
    m1 = jnp.where(eq & ang, prev, jnp.where(eq, 1, a))
    m2 = jnp.where(eq & ang, nxt, jnp.where(eq, 50, third))
    return jnp.stack([m0, m1, m2], axis=1).astype(jnp.int32)


def mpm3_host(left: int, above: int) -> list[int]:
    """Host mirror of _mpm3 for the entropy coder (must match exactly)."""
    l = max(left, 0)
    a = max(above, 0)
    if l == a:
        if l < 2:
            return [0, 1, 50]
        return [l, 2 + ((l - 2 + 64) % 65), 2 + ((l - 2 + 1) % 65)]
    for c in (0, 1, 50, 18, 2):
        if c != l and c != a:
            return [l, a, c]
    raise AssertionError


def _tq_reconstruct(pred: jnp.ndarray, resid: jnp.ndarray | None,
                    levels: jnp.ndarray | None, qp: int, s: int,
                    bit_depth: int, intra_slice: bool, luma: bool = True,
                    dep: bool = False, rdoq: bool = False
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared transform/quant/reconstruct: encoder passes resid (levels
    computed), decoder passes levels.  Returns (levels, recon_block).

    Implicit MTS: small luma intra blocks (4..16) use DST-7 in both
    directions (reference: TrQuant.cpp:619 getTrTypes implicit-MTS rule —
    DST7 matches the intra residual's growing-from-the-reference shape).

    dep=True switches to dependent quantization (trellis encoder + state-
    machine dequant, common/depquant.py; reference: DepQuant.cpp)."""
    log2s = s.bit_length() - 1
    tr = (transforms.rom.DST7 if (intra_slice and luma and 4 <= s <= 16)
          else transforms.rom.DCT2)
    if levels is None:
        coeff = transforms.forward_transform(resid, tr, tr,
                                             bit_depth=bit_depth)
        if dep:
            levels = depquant.quantize_dep(coeff, qp, log2s, log2s,
                                           bit_depth)
        elif rdoq:
            # rate-aware level decision (RDOQ-lite, encoder-only;
            # reference: QuantRDOQ.cpp)
            levels = quant.quantize_rdoq(coeff, qp, log2s, log2s,
                                         bit_depth, intra=intra_slice)
        else:
            levels = quant.quantize(coeff, qp, log2s, log2s, bit_depth,
                                    intra=intra_slice)
    if dep:
        dq = depquant.dequantize_dep(levels, qp, log2s, log2s, bit_depth)
    else:
        dq = quant.dequantize(levels, qp, log2s, log2s, bit_depth)
    r = transforms.inverse_transform(dq, tr, tr, bit_depth=bit_depth)
    maxv = (1 << bit_depth) - 1
    recon = jnp.clip(pred + r, 0, maxv)
    return levels, recon


def _quant_pair(coeff, levels, qp, log2s, bit_depth, intra_slice, dep,
                rdoq=False):
    """quantize (if levels is None) + dequantize with or without DQ/RDOQ."""
    if levels is None:
        if dep:
            levels = depquant.quantize_dep(coeff, qp, log2s, log2s,
                                           bit_depth)
        elif rdoq:
            levels = quant.quantize_rdoq(coeff, qp, log2s, log2s,
                                         bit_depth, intra=intra_slice)
        else:
            levels = quant.quantize(coeff, qp, log2s, log2s, bit_depth,
                                    intra=intra_slice)
    if dep:
        dq = depquant.dequantize_dep(levels, qp, log2s, log2s, bit_depth)
    else:
        dq = quant.dequantize(levels, qp, log2s, log2s, bit_depth)
    return levels, dq


def _rate_est(lev: jnp.ndarray) -> jnp.ndarray:
    """Cheap bits estimate of a level tensor (encoder decision only)."""
    a = jnp.abs(lev).astype(jnp.float32)
    return jnp.where(lev != 0, 2.0 + 2.0 * jnp.log2(a + 1.0),
                     0.3).sum((-2, -1))


def _tq_lfnst_encode(pred: jnp.ndarray, resid: jnp.ndarray,
                     mode: jnp.ndarray, qp: int, s: int, bit_depth: int,
                     dep: bool):
    """Luma TQ with per-block LFNST index RD choice (reference: IntraSearch
    LFNST loop; TrQuant.cpp:238/262).  Returns (levels, recon, lfnst_idx)."""
    log2s = s.bit_length() - 1
    tr = transforms.rom.DST7 if 4 <= s <= 16 else transforms.rom.DCT2
    coeff = transforms.forward_transform(resid, tr, tr, bit_depth=bit_depth)
    cls = lfnst.mode_class(mode)
    lam = quant.lambda_from_qp(qp, intra=True)
    maxv = (1 << bit_depth) - 1
    levs, recs, costs = [], [], []
    for idx in range(lfnst.N_LFNST_CAND + 1):
        c = lfnst.forward(coeff, cls, idx) if idx > 0 else coeff
        lev, dq = _quant_pair(c, None, qp, log2s, bit_depth, True, dep)
        d2 = lfnst.inverse(dq, cls, idx) if idx > 0 else dq
        r = transforms.inverse_transform(d2, tr, tr, bit_depth=bit_depth)
        rec = jnp.clip(pred + r, 0, maxv)
        ssd = ((rec - (pred + resid)) ** 2).sum((1, 2)).astype(jnp.float32)
        bits = _rate_est(lev) + (2.0 if idx > 0 else 1.0)
        levs.append(lev)
        recs.append(rec)
        costs.append(ssd + lam * bits)
    cost = jnp.stack(costs, 1)                          # (B, 3)
    pick = jnp.argmin(cost, 1).astype(jnp.int32)
    lev = jnp.take_along_axis(jnp.stack(levs, 1),
                              pick[:, None, None, None], 1)[:, 0]
    rec = jnp.take_along_axis(jnp.stack(recs, 1),
                              pick[:, None, None, None], 1)[:, 0]
    # cbf==0 -> the index is not signaled; recon is pred either way
    cbf = (lev != 0).any((1, 2))
    pick = jnp.where(cbf, pick, 0)
    return lev, rec, pick


def _tq_lfnst_decode(pred: jnp.ndarray, levels: jnp.ndarray,
                     mode: jnp.ndarray, idx: jnp.ndarray, qp: int, s: int,
                     bit_depth: int, dep: bool) -> jnp.ndarray:
    """Decoder-side luma reconstruction with per-block LFNST index."""
    log2s = s.bit_length() - 1
    tr = transforms.rom.DST7 if 4 <= s <= 16 else transforms.rom.DCT2
    cls = lfnst.mode_class(mode)
    _, dq = _quant_pair(None, levels, qp, log2s, bit_depth, True, dep)
    d2 = dq
    for k in range(1, lfnst.N_LFNST_CAND + 1):
        dk = lfnst.inverse(dq, cls, k)
        d2 = jnp.where((idx == k)[:, None, None], dk, d2)
    r = transforms.inverse_transform(d2, tr, tr, bit_depth=bit_depth)
    return jnp.clip(pred + r, 0, (1 << bit_depth) - 1)


# Explicit MTS transform pairs, indexed by tu_mts_idx (reference:
# TrQuant.cpp:619 getTrTypes — MTS_DCT2_DCT2, MTS_DST7_DST7, MTS_DCT8_DST7,
# MTS_DST7_DCT8, MTS_DCT8_DCT8; DST7/DCT8 kernels in RomTr.cpp)
MTS_PAIRS = ((transforms.rom.DCT2, transforms.rom.DCT2),
             (transforms.rom.DST7, transforms.rom.DST7),
             (transforms.rom.DCT8, transforms.rom.DST7),
             (transforms.rom.DST7, transforms.rom.DCT8),
             (transforms.rom.DCT8, transforms.rom.DCT8))


def _tq_mts_encode(pred: jnp.ndarray, resid: jnp.ndarray,
                   mode: jnp.ndarray, qp: int, s: int, bit_depth: int,
                   dep: bool, use_lfnst: bool):
    """Luma TQ with explicit-MTS (and optional LFNST) per-block RD choice:
    the five transform pairs — plus the LFNST candidates on the DCT2 path,
    since LFNST only combines with mts_idx 0 (reference: IntraSearch MTS
    loop, TrQuant getTrTypes; LFNST-implies-DCT2 rule).  Returns
    (levels, recon, lfnst_idx, mts_idx)."""
    log2s = s.bit_length() - 1
    lam = quant.lambda_from_qp(qp, intra=True)
    maxv = (1 << bit_depth) - 1
    zero = jnp.zeros(pred.shape[0], jnp.int32)
    target = pred + resid
    cands = []      # (lev, rec, lfnst_idx, mts_idx, cost)
    coeff_dct2 = None
    for m, (th, tv) in enumerate(MTS_PAIRS):
        coeff = transforms.forward_transform(resid, th, tv,
                                             bit_depth=bit_depth)
        if m == 0:
            coeff_dct2 = coeff
        lev, dq = _quant_pair(coeff, None, qp, log2s, bit_depth, True, dep)
        r = transforms.inverse_transform(dq, th, tv, bit_depth=bit_depth)
        rec = jnp.clip(pred + r, 0, maxv)
        ssd = ((rec - target) ** 2).sum((1, 2)).astype(jnp.float32)
        bits = _rate_est(lev) + (1.0 if m == 0 else 1.0 + m)
        cands.append((lev, rec, zero, jnp.full_like(zero, m),
                      ssd + lam * bits))
    if use_lfnst:
        cls = lfnst.mode_class(mode)
        for k in range(1, lfnst.N_LFNST_CAND + 1):
            c = lfnst.forward(coeff_dct2, cls, k)
            lev, dq = _quant_pair(c, None, qp, log2s, bit_depth, True, dep)
            d2 = lfnst.inverse(dq, cls, k)
            r = transforms.inverse_transform(d2, bit_depth=bit_depth)
            rec = jnp.clip(pred + r, 0, maxv)
            ssd = ((rec - target) ** 2).sum((1, 2)).astype(jnp.float32)
            bits = _rate_est(lev) + 3.0
            cands.append((lev, rec, jnp.full_like(zero, k), zero,
                          ssd + lam * bits))
    cost = jnp.stack([c[4] for c in cands], 1)
    pick = jnp.argmin(cost, 1).astype(jnp.int32)

    def sel(i, nd):
        st = jnp.stack([c[i] for c in cands], 1)
        idx = pick.reshape((-1,) + (1,) * nd)
        return jnp.take_along_axis(st, idx, 1)[:, 0]
    lev = sel(0, 3)
    rec = sel(1, 3)
    lfnst_idx = sel(2, 1)
    mts_idx = sel(3, 1)
    cbf = (lev != 0).any((1, 2))
    return (lev, rec, jnp.where(cbf, lfnst_idx, 0),
            jnp.where(cbf, mts_idx, 0))


def _tq_mts_decode(pred: jnp.ndarray, levels: jnp.ndarray,
                   mode: jnp.ndarray, mts_idx: jnp.ndarray,
                   lfnst_idx: jnp.ndarray, qp: int, s: int, bit_depth: int,
                   dep: bool, use_lfnst: bool) -> jnp.ndarray:
    """Decoder-side luma reconstruction under explicit MTS (+LFNST)."""
    log2s = s.bit_length() - 1
    _, dq = _quant_pair(None, levels, qp, log2s, bit_depth, True, dep)
    d2 = dq
    if use_lfnst:
        cls = lfnst.mode_class(mode)
        for k in range(1, lfnst.N_LFNST_CAND + 1):
            dk = lfnst.inverse(dq, cls, k)
            d2 = jnp.where((lfnst_idx == k)[:, None, None], dk, d2)
    r = jnp.zeros_like(pred)
    for m, (th, tv) in enumerate(MTS_PAIRS):
        rm = transforms.inverse_transform(d2, th, tv, bit_depth=bit_depth)
        r = jnp.where((mts_idx == m)[:, None, None], rm, r)
    return jnp.clip(pred + r, 0, (1 << bit_depth) - 1)


def _bdpcm_diff(q: jnp.ndarray, horizontal: bool) -> jnp.ndarray:
    """Quantized-residual DPCM: coded value = q - left/above q (reference:
    BDPCM, CABACReader residual_codingTS + Quant BDPCM path)."""
    ax = 2 if horizontal else 1
    prev = jnp.roll(q, 1, axis=ax)
    if horizontal:
        prev = prev.at[:, :, 0].set(0)
    else:
        prev = prev.at[:, 0, :].set(0)
    return q - prev


def _bdpcm_cumsum(d: jnp.ndarray, horizontal: bool) -> jnp.ndarray:
    return jnp.cumsum(d, axis=2 if horizontal else 1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_size", "qp", "bit_depth",
                                             "dep_quant", "use_cclm",
                                             "use_mip", "use_lfnst",
                                             "use_mrl", "use_ts",
                                             "use_bdpcm", "lossless",
                                             "use_ibc", "use_mts",
                                             "use_rdoq"))
def encode_intra_frame(orig_y: jnp.ndarray, orig_u: jnp.ndarray,
                       orig_v: jnp.ndarray, qp: int, block_size: int = 8,
                       bit_depth: int = 8, dep_quant: bool = False,
                       use_cclm: bool = False, use_mip: bool = False,
                       use_lfnst: bool = False, use_mrl: bool = False,
                       use_ts: bool = False, use_bdpcm: bool = False,
                       lossless: bool = False, use_ibc: bool = False,
                       use_mts: bool = False, use_rdoq: bool = False):
    """Closed-loop wavefront intra encode of one frame.

    Returns dict with per-block modes (nby, nbx), levels for Y/U/V, and the
    reconstructed planes (exact decoder output)."""
    s = block_size
    sc = s // 2
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    lam = quant.lambda_from_qp(qp, intra=True)
    lam_satd = math.sqrt(lam)
    mid = 1 << (bit_depth - 1)

    coords_np, valid_np = wavefront_coords(nby, nbx)
    coords = jnp.asarray(coords_np)
    valid = jnp.asarray(valid_np)

    oy = _pad_to_buffer(orig_y, mid)
    ou = _pad_to_buffer(orig_u, mid)
    ov = _pad_to_buffer(orig_v, mid)
    ry = jnp.full_like(oy, mid)
    ru = jnp.full_like(ou, mid)
    rv = jnp.full_like(ov, mid)
    mode_map = jnp.full((nby + 1, nbx + 1), -1, dtype=jnp.int32)

    n_modes = 67 + (mip.N_MIP_MODES if use_mip else 0)
    modes_grid = jnp.arange(n_modes, dtype=jnp.int32)

    def step(state, xs):
        ry, ru, rv, mode_map = state
        cds, vld = xs
        by, bx = cds[:, 0], cds[:, 1]
        # masked blocks go to the dead zone in the far margin corner
        dead_y = ry.shape[0] - s - 4
        dead_x = ry.shape[1] - s - 4
        y0 = jnp.where(vld, MARGIN + by * s, dead_y)
        x0 = jnp.where(vld, MARGIN + bx * s, dead_x)
        y0c = jnp.where(vld, MARGIN + by * sc, ru.shape[0] - sc - 4)
        x0c = jnp.where(vld, MARGIN + bx * sc, ru.shape[1] - sc - 4)

        # ---- luma decision ----
        cref = _gather_cref(ry, y0, x0, s)
        pall = intra.predict_all_modes(cref, s, s)          # (B,67,s,s)
        if use_mip:
            # matrix modes join the candidate tensor (indices 67..)
            pall = jnp.concatenate(
                [pall, mip.predict_mip_all(cref, s, bit_depth)], 1)
        ob = _gather_blocks(oy, y0, x0, s)
        dist = satd_fn(pall, ob[:, None]).astype(jnp.float32)  # (B,modes)
        lm = mode_map[1 + by, bx]       # left neighbor (by, bx-1) -> idx bx
        am = mode_map[by, 1 + bx]       # above neighbor
        mpm = _mpm3(lm, am)                                  # (B,3)
        bits = jnp.where(modes_grid[None, :] == mpm[:, 0:1], 2.0,
                 jnp.where(modes_grid[None, :] == mpm[:, 1:2], 3.0,
                   jnp.where(modes_grid[None, :] == mpm[:, 2:3], 3.0, 7.0)))
        if use_mip:
            # mip_flag(1) + fixed 3-bit mode index
            bits = jnp.where(modes_grid[None, :] >= 67, 5.0, bits)
        cost = dist + lam_satd * bits
        mode = jnp.argmin(cost, axis=1).astype(jnp.int32)
        pred = jnp.take_along_axis(pall, mode[:, None, None, None],
                                   axis=1)[:, 0]
        if use_mrl:
            # multi-reference line: re-evaluate the chosen angular mode on
            # reference ring 1 (reference: MRL, IntraPrediction MRL refs +
            # MultiRefLineIdx syntax); MIP stays on ring 0
            cref1 = _gather_cref(ry, y0 - 1, x0 - 1, s)
            nb0 = jnp.where(mode >= 67, 0, mode)
            pred1 = intra.predict_mode(cref1, nb0, s, s)
            best = jnp.take_along_axis(cost, mode[:, None], 1)[:, 0]
            d1 = satd_fn(pred1[:, None], ob[:, None])[:, 0] \
                .astype(jnp.float32)
            cost1 = d1 + lam_satd * 1.0 + best * 0  # +1 bit for mrl flag
            mrl = ((cost1 < best) & (mode < 67)).astype(jnp.int32)
            pred = jnp.where(mrl[:, None, None] > 0, pred1, pred)
        else:
            mrl = jnp.zeros(y0.shape, jnp.int32)
        if use_ibc:
            # batched BV candidate evaluation over the causal region
            pstack = jnp.stack(
                [_gather_blocks(ry, y0 + dy * s, x0 + dx * s, s)
                 for dy, dx in IBC_BVS], 1)            # (B, K, s, s)
            d_ibc = satd_fn(pstack, ob[:, None]).astype(jnp.float32)
            ok = jnp.stack(
                [(by + dy >= 0) & (bx + dx >= 0) & (bx + dx < nbx)
                 for dy, dx in IBC_BVS], 1)
            d_ibc = jnp.where(ok, d_ibc, jnp.float32(1e18))
            kbv = jnp.argmin(d_ibc, 1).astype(jnp.int32)
            # ibc pays flag + 4-bit BV index vs ~1-bit flag on intra
            cost_ibc = jnp.min(d_ibc, 1) + lam_satd * 5.0
            d_cur = satd_fn(pred[:, None], ob[:, None])[:, 0] \
                .astype(jnp.float32)
            is_ibc = cost_ibc < d_cur
            pred = jnp.where(
                is_ibc[:, None, None],
                jnp.take_along_axis(pstack, kbv[:, None, None, None],
                                    1)[:, 0], pred)
            mode = jnp.where(is_ibc, IBC_BASE + kbv, mode)
            if use_mrl:
                mrl = jnp.where(is_ibc, 0, mrl)
        else:
            is_ibc = jnp.zeros(y0.shape, bool)
            kbv = jnp.zeros(y0.shape, jnp.int32)
        maxv = (1 << bit_depth) - 1
        if lossless:
            # all-transform-skip at qStep 1: exact residual pass-through
            # (reference: the lossless coding path — TS + min QP prime TS)
            lev_y = quant.quantize_ts(ob - pred, qp, intra=True)
            rec = jnp.clip(pred + quant.dequantize_ts(lev_y, qp), 0, maxv)
            lfnst_idx = jnp.zeros(y0.shape, jnp.int32)
            mtsm = jnp.zeros(y0.shape, jnp.int32)
            tsm = jnp.ones(y0.shape, jnp.int32)
        else:
            if use_mts:
                lev_y, rec, lfnst_idx, mtsm = _tq_mts_encode(
                    pred, ob - pred, mode, qp, s, bit_depth, dep_quant,
                    use_lfnst)
            elif use_lfnst:
                lev_y, rec, lfnst_idx = _tq_lfnst_encode(
                    pred, ob - pred, mode, qp, s, bit_depth, dep_quant)
                mtsm = jnp.zeros(y0.shape, jnp.int32)
            else:
                lev_y, rec = _tq_reconstruct(pred, ob - pred, None, qp, s,
                                             bit_depth, True, dep=dep_quant,
                                             rdoq=use_rdoq)
                lfnst_idx = jnp.zeros(y0.shape, jnp.int32)
                mtsm = jnp.zeros(y0.shape, jnp.int32)
            tsm = jnp.zeros(y0.shape, jnp.int32)
            if use_ts:
                # per-block RD over {regular, transform-skip, BDPCM-H/V}
                # (reference: transform_skip_flag + intra_bdpcm_luma_flag,
                # TrQuant.cpp transformSkip path)
                lam = quant.lambda_from_qp(qp, intra=True)
                ssd0 = ((rec - ob) ** 2).sum((1, 2)).astype(jnp.float32)
                cands = [(lev_y, rec, lfnst_idx, mtsm, mode,
                          ssd0 + lam * (_rate_est(lev_y) + 1.0))]
                zero = jnp.zeros(y0.shape, jnp.int32)
                lev1 = quant.quantize_ts(ob - pred, qp, intra=True)
                rec1 = jnp.clip(pred + quant.dequantize_ts(lev1, qp),
                                0, maxv)
                ssd1 = ((rec1 - ob) ** 2).sum((1, 2)).astype(jnp.float32)
                cands.append((lev1, rec1, zero, zero, mode,
                              ssd1 + lam * (_rate_est(lev1) + 2.0)))
                if use_bdpcm:
                    for hor, bmode in ((True, 18), (False, 50)):
                        predb = pall[:, bmode]
                        qb = quant.quantize_ts(ob - predb, qp, intra=True)
                        recb = jnp.clip(
                            predb + quant.dequantize_ts(qb, qp), 0, maxv)
                        db = _bdpcm_diff(qb, hor)
                        ssdb = ((recb - ob) ** 2).sum((1, 2)) \
                            .astype(jnp.float32)
                        # BDPCM block's signaled mode becomes HOR/VER
                        cands.append((db, recb, zero, zero,
                                      jnp.full_like(mode, bmode),
                                      ssdb + lam * (_rate_est(db) + 3.0)))
                cost = jnp.stack([c[5] for c in cands], 1)
                pick = jnp.argmin(cost, 1).astype(jnp.int32)
                tsm = pick

                def sel(i):
                    st = jnp.stack([c[i] for c in cands], 1)
                    idx = pick.reshape((-1,) + (1,) * (st.ndim - 1))
                    return jnp.take_along_axis(st, idx, 1)[:, 0]
                lev_y, rec, lfnst_idx, mtsm, mode = (sel(0), sel(1), sel(2),
                                                     sel(3), sel(4))
                if use_mrl:
                    mrl = jnp.where(tsm > 0, 0, mrl)
        if use_ibc:
            # re-derive from the *final* mode (a BDPCM pick may have
            # replaced an IBC choice) so chroma matches the decoder, which
            # only sees the signaled mode
            is_ibc = mode >= IBC_BASE
            kbv = jnp.clip(mode - IBC_BASE, 0, len(IBC_BVS) - 1)
        ry = _scatter_blocks(ry, y0, x0, rec)
        # invalid lanes target the never-read pad cell (0,0) so scatter
        # duplicates stay deterministic
        my = jnp.where(vld, 1 + by, 0)
        mx = jnp.where(vld, 1 + bx, 0)
        # MIP blocks act as planar (0) for neighbor MPM / derived chroma
        # (reference: UnitTools getIntraDirLuma MIP -> PLANAR mapping)
        nb_mode = jnp.where(mode >= 67, 0, mode)
        mode_map = mode_map.at[my, mx].set(
            jnp.where(vld, nb_mode, mode_map[my, mx]))

        # ---- chroma: derived luma mode vs CCLM (RD pick, 1 signaled bit) --
        if use_cclm:
            dsl, border_l = _cclm_luma_ctx(ry, y0, x0, s)
        preds, obcs = [], []
        for plane_o, plane_r in ((ou, ru), (ov, rv)):
            crefc = _gather_cref(plane_r, y0c, x0c, sc)
            predc = intra.predict_mode(crefc, nb_mode, sc, sc)
            if use_ibc:
                # chroma rides the luma BV (block-aligned -> chroma offset
                # is bv * sc exactly)
                cstack = jnp.stack(
                    [_gather_blocks(plane_r, y0c + dy * sc, x0c + dx * sc,
                                    sc) for dy, dx in IBC_BVS], 1)
                cpatch = jnp.take_along_axis(
                    cstack, kbv[:, None, None, None], 1)[:, 0]
                predc = jnp.where(is_ibc[:, None, None], cpatch, predc)
            obc = _gather_blocks(plane_o, y0c, x0c, sc)
            predlm = (_cclm_pred(plane_r, y0c, x0c, sc, dsl, border_l,
                                 bit_depth) if use_cclm else predc)
            if use_cclm and use_ibc:
                predlm = jnp.where(is_ibc[:, None, None], predc, predlm)
            preds.append((predc, predlm))
            obcs.append(obc)
        if use_cclm:
            ssd_d = sum(((o - p[0]) ** 2).sum((1, 2))
                        for o, p in zip(obcs, preds))
            ssd_l = sum(((o - p[1]) ** 2).sum((1, 2))
                        for o, p in zip(obcs, preds))
            lm_flag = (ssd_l < ssd_d).astype(jnp.int32)
            if use_ibc:
                lm_flag = jnp.where(is_ibc, 0, lm_flag)
        else:
            lm_flag = jnp.zeros(y0.shape, jnp.int32)
        lev_c = []
        ru_new, rv_new = ru, rv
        for i, ((predc, predlm), obc) in enumerate(zip(preds, obcs)):
            predsel = jnp.where(lm_flag[:, None, None] > 0, predlm, predc)
            if lossless:
                lc = quant.quantize_ts(obc - predsel, qp, intra=True)
                recc = jnp.clip(predsel + quant.dequantize_ts(lc, qp),
                                0, maxv)
            else:
                lc, recc = _tq_reconstruct(predsel, obc - predsel, None, qp,
                                           sc, bit_depth, True, luma=False,
                                           dep=dep_quant, rdoq=use_rdoq)
            lev_c.append(lc)
            if i == 0:
                ru_new = _scatter_blocks(ru, y0c, x0c, recc)
            else:
                rv_new = _scatter_blocks(rv, y0c, x0c, recc)
        return ((ry, ru_new, rv_new, mode_map),
                (mode, lm_flag, lfnst_idx, mrl, tsm, mtsm, lev_y, lev_c[0],
                 lev_c[1]))

    (ry, ru, rv, _), outs = jax.lax.scan(
        step, (ry, ru, rv, mode_map), (coords, valid))
    recon = dict(
        y=jax.lax.dynamic_slice(ry, (MARGIN, MARGIN), (h, w)),
        u=jax.lax.dynamic_slice(ru, (MARGIN, MARGIN), (h // 2, w // 2)),
        v=jax.lax.dynamic_slice(rv, (MARGIN, MARGIN), (h // 2, w // 2)))
    return outs, recon


@functools.partial(jax.jit, static_argnames=("block_size", "qp", "bit_depth",
                                             "height", "width", "dep_quant",
                                             "use_cclm", "use_mip",
                                             "use_lfnst", "use_mrl",
                                             "use_ts", "lossless",
                                             "use_ibc", "use_mts"))
def decode_intra_frame(modes_steps: jnp.ndarray, lev_y: jnp.ndarray,
                       lev_u: jnp.ndarray, lev_v: jnp.ndarray,
                       qp: int, height: int, width: int, block_size: int = 8,
                       bit_depth: int = 8, dep_quant: bool = False,
                       use_cclm: bool = False,
                       cclm_steps: jnp.ndarray | None = None,
                       use_mip: bool = False, use_lfnst: bool = False,
                       lfnst_steps: jnp.ndarray | None = None,
                       use_mrl: bool = False,
                       mrl_steps: jnp.ndarray | None = None,
                       use_ts: bool = False,
                       ts_steps: jnp.ndarray | None = None,
                       lossless: bool = False, use_ibc: bool = False,
                       use_mts: bool = False,
                       mts_steps: jnp.ndarray | None = None):
    """Wavefront intra decode: same scan as the encoder with parsed
    modes/levels; identical reconstruction math -> bit-exact recon."""
    s = block_size
    sc = s // 2
    h, w = height, width
    nby, nbx = h // s, w // s
    mid = 1 << (bit_depth - 1)
    coords_np, valid_np = wavefront_coords(nby, nbx)
    coords = jnp.asarray(coords_np)
    valid = jnp.asarray(valid_np)

    ry = jnp.full((h + 2 * MARGIN, w + 2 * MARGIN), mid, dtype=jnp.int32)
    ru = jnp.full((h // 2 + 2 * MARGIN, w // 2 + 2 * MARGIN), mid,
                  dtype=jnp.int32)
    rv = jnp.full_like(ru, mid)

    if cclm_steps is None:
        cclm_steps = jnp.zeros(modes_steps.shape, jnp.int32)
    if lfnst_steps is None:
        lfnst_steps = jnp.zeros(modes_steps.shape, jnp.int32)
    if mrl_steps is None:
        mrl_steps = jnp.zeros(modes_steps.shape, jnp.int32)
    if ts_steps is None:
        ts_steps = jnp.zeros(modes_steps.shape, jnp.int32)
    if mts_steps is None:
        mts_steps = jnp.zeros(modes_steps.shape, jnp.int32)

    def step(state, xs):
        ry, ru, rv = state
        cds, vld, mode, lmflag, lfidx, mrl, tsm, mtsm, ly, lu, lv = xs
        by, bx = cds[:, 0], cds[:, 1]
        y0 = jnp.where(vld, MARGIN + by * s, ry.shape[0] - s - 4)
        x0 = jnp.where(vld, MARGIN + bx * s, ry.shape[1] - s - 4)
        y0c = jnp.where(vld, MARGIN + by * sc, ru.shape[0] - sc - 4)
        x0c = jnp.where(vld, MARGIN + bx * sc, ru.shape[1] - sc - 4)

        cref = _gather_cref(ry, y0, x0, s)
        nb_mode = jnp.where(mode >= 67, 0, mode)
        pred = intra.predict_mode(cref, nb_mode, s, s)
        if use_mrl:
            cref1 = _gather_cref(ry, y0 - 1, x0 - 1, s)
            pred1 = intra.predict_mode(cref1, nb_mode, s, s)
            pred = jnp.where(mrl[:, None, None] > 0, pred1, pred)
        if use_mip:
            pmip = mip.predict_mip_mode(
                cref, jnp.clip(mode - 67, 0, mip.N_MIP_MODES - 1), s,
                bit_depth)
            pred = jnp.where(((mode >= 67) & (mode < IBC_BASE))
                             [:, None, None], pmip, pred)
        if use_ibc:
            is_ibc = mode >= IBC_BASE
            kbv = jnp.clip(mode - IBC_BASE, 0, len(IBC_BVS) - 1)
            pstack = jnp.stack(
                [_gather_blocks(ry, y0 + dy * s, x0 + dx * s, s)
                 for dy, dx in IBC_BVS], 1)
            pred = jnp.where(
                is_ibc[:, None, None],
                jnp.take_along_axis(pstack, kbv[:, None, None, None],
                                    1)[:, 0], pred)
        maxv = (1 << bit_depth) - 1
        if lossless:
            rec = jnp.clip(pred + quant.dequantize_ts(ly, qp), 0, maxv)
        else:
            if use_mts:
                rec = _tq_mts_decode(pred, ly, mode, mtsm, lfidx, qp, s,
                                     bit_depth, dep_quant, use_lfnst)
            elif use_lfnst:
                rec = _tq_lfnst_decode(pred, ly, mode, lfidx, qp, s,
                                       bit_depth, dep_quant)
            else:
                _, rec = _tq_reconstruct(pred, None, ly, qp, s, bit_depth,
                                         True, dep=dep_quant)
            if use_ts:
                # tsm 1: plain transform skip; 2/3: BDPCM H/V (levels hold
                # the DPCM diffs -> cumsum, then pixel-domain dequant)
                rec1 = jnp.clip(pred + quant.dequantize_ts(ly, qp), 0, maxv)
                qh = _bdpcm_cumsum(ly, True)
                qv = _bdpcm_cumsum(ly, False)
                rec2 = jnp.clip(pred + quant.dequantize_ts(qh, qp), 0, maxv)
                rec3 = jnp.clip(pred + quant.dequantize_ts(qv, qp), 0, maxv)
                sel = tsm[:, None, None]
                rec = jnp.where(sel == 1, rec1,
                                jnp.where(sel == 2, rec2,
                                          jnp.where(sel == 3, rec3, rec)))
        ry = _scatter_blocks(ry, y0, x0, rec)

        if use_cclm:
            dsl, border_l = _cclm_luma_ctx(ry, y0, x0, s)
        for lev, which in ((lu, "u"), (lv, "v")):
            buf = ru if which == "u" else rv
            crefc = _gather_cref(buf, y0c, x0c, sc)
            predc = intra.predict_mode(crefc, nb_mode, sc, sc)
            if use_cclm:
                predlm = _cclm_pred(buf, y0c, x0c, sc, dsl, border_l,
                                    bit_depth)
                predc = jnp.where(lmflag[:, None, None] > 0, predlm, predc)
            if use_ibc:
                cstack = jnp.stack(
                    [_gather_blocks(buf, y0c + dy * sc, x0c + dx * sc, sc)
                     for dy, dx in IBC_BVS], 1)
                cpatch = jnp.take_along_axis(
                    cstack, kbv[:, None, None, None], 1)[:, 0]
                predc = jnp.where(is_ibc[:, None, None], cpatch, predc)
            if lossless:
                recc = jnp.clip(predc + quant.dequantize_ts(lev, qp),
                                0, maxv)
            else:
                _, recc = _tq_reconstruct(predc, None, lev, qp, sc,
                                          bit_depth, True, luma=False,
                                          dep=dep_quant)
            if which == "u":
                ru = _scatter_blocks(ru, y0c, x0c, recc)
            else:
                rv = _scatter_blocks(rv, y0c, x0c, recc)
        return (ry, ru, rv), None

    (ry, ru, rv), _ = jax.lax.scan(
        step, (ry, ru, rv),
        (coords, valid, modes_steps, cclm_steps, lfnst_steps, mrl_steps,
         ts_steps, mts_steps, lev_y, lev_u, lev_v))
    return dict(
        y=jax.lax.dynamic_slice(ry, (MARGIN, MARGIN), (h, w)),
        u=jax.lax.dynamic_slice(ru, (MARGIN, MARGIN), (h // 2, w // 2)),
        v=jax.lax.dynamic_slice(rv, (MARGIN, MARGIN), (h // 2, w // 2)))


def steps_to_grid(outs_steps: np.ndarray, coords: np.ndarray,
                  valid: np.ndarray) -> np.ndarray:
    """Reorder per-step scan outputs (steps, bmax, ...) into a (nby, nbx, ...)
    grid on the host (vectorized scatter)."""
    nby = coords[..., 0].max() + 1
    nbx = coords[..., 1].max() + 1
    out = np.zeros((nby, nbx) + outs_steps.shape[2:], outs_steps.dtype)
    v = valid.reshape(-1)
    by = coords[..., 0].reshape(-1)[v]
    bx = coords[..., 1].reshape(-1)[v]
    out[by, bx] = outs_steps.reshape((-1,) + outs_steps.shape[2:])[v]
    return out


def grid_to_steps(grid: np.ndarray, coords: np.ndarray,
                  valid: np.ndarray) -> np.ndarray:
    """Inverse of steps_to_grid (host, vectorized gather)."""
    out = np.zeros(coords.shape[:2] + grid.shape[2:], grid.dtype)
    v = valid.reshape(-1)
    by = coords[..., 0].reshape(-1)[v]
    bx = coords[..., 1].reshape(-1)[v]
    flat = out.reshape((-1,) + grid.shape[2:])
    flat[v] = grid[by, bx]
    return flat.reshape(out.shape)
