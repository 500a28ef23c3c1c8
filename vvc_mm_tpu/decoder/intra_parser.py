"""Intra slice entropy decoding — exact inverse of encoder/intra_coder.py.

TPU-native analog of the reference CABACReader intra path (reference:
source/Lib/DecoderLib/CABACReader.cpp — coding_tree_unit:138,
intra_luma_pred_mode, residual_coding).
"""
from __future__ import annotations

import numpy as np

from ..common.cabac import BinDecoder
from ..utils.native import coeffs_decode, make_decoder
from ..common.contexts import ctx_id
from ..common.residual_coding import decode_coeffs
from ..common.wavefront import IBC_BASE, mpm3_host


def decode_intra_mode(dec: BinDecoder, left: int, above: int) -> int:
    mpm = mpm3_host(left, above)
    if dec.decode_bin(ctx_id("IntraLumaMpmFlag")):
        if dec.decode_bin_ep():
            return mpm[1 + dec.decode_bin_ep()]
        return mpm[0]
    rem = sorted(m for m in range(67) if m not in mpm)
    return rem[dec.decode_bins_ep(6)]


def _lbl(dec, name: str) -> None:
    lab = getattr(dec, "label", None)
    if lab is not None:
        lab(name)


def _nb(m: int) -> int:
    """MIP neighbors act as planar for MPM (UnitTools getIntraDirLuma)."""
    return 0 if m >= 67 else m


def decode_intra_slice(data: bytes, nby: int, nbx: int, s: int, stats=None,
                       cclm: bool = False, mip: bool = False,
                       lfnst: bool = False, mrl: bool = False,
                       ts: bool = False, bdpcm: bool = False,
                       ibc: bool = False, mts: bool = False):
    """Returns (modes, cclm_flags, lfnst_idx, lev_y, lev_u, lev_v) dense
    grids.  With `stats` (utils.trace.BitStats) the Python spec coder runs
    with per-syntax accounting (DecoderAnalyserApp analog)."""
    if stats is not None:
        from ..utils.trace import StatsBinDecoder
        dec = StatsBinDecoder(data, stats)
    else:
        dec = make_decoder(data)
    grids = _alloc_grids(nby, nbx, s)
    _decode_intra_rows(dec, grids, s, cclm, mip, lfnst, 0, nby, mrl, ts,
                       bdpcm, ibc, mts)
    return grids


def decode_intra_slice_part(data: bytes, nsy: int, nsx: int, stats=None):
    """Exact inverse of encoder.intra_coder.encode_intra_slice_part.
    Returns (split, mode16, modes8, l16y, l16u, l16v, l8y, l8u, l8v)."""
    from ..common.intra_part import _QUADS, SB, SUB
    if stats is not None:
        from ..utils.trace import StatsBinDecoder
        dec = StatsBinDecoder(data, stats)
    else:
        dec = make_decoder(data)
    sc16, sc8 = SB // 2, SUB // 2
    split = np.zeros((nsy, nsx), dtype=np.int32)
    mode16 = np.zeros((nsy, nsx), dtype=np.int32)
    modes8 = np.zeros((nsy, nsx, 4), dtype=np.int32)
    l16y = np.zeros((nsy, nsx, SB, SB), dtype=np.int32)
    l16u = np.zeros((nsy, nsx, sc16, sc16), dtype=np.int32)
    l16v = np.zeros((nsy, nsx, sc16, sc16), dtype=np.int32)
    l8y = np.zeros((nsy, nsx, 4, SUB, SUB), dtype=np.int32)
    l8u = np.zeros((nsy, nsx, 4, sc8, sc8), dtype=np.int32)
    l8v = np.zeros((nsy, nsx, 4, sc8, sc8), dtype=np.int32)
    cell = np.full((2 * nsy, 2 * nsx), -1, dtype=np.int32)

    def parse_one(cy, cx, ly, lu, lv, sizes):
        left = int(cell[cy, cx - 1]) if cx > 0 else -1
        above = int(cell[cy - 1, cx]) if cy > 0 else -1
        _lbl(dec, "intra_mode")
        mode = decode_intra_mode(dec, left, above)
        for lev, sz, cid in ((ly, sizes[0], 0), (lu, sizes[1], 4),
                             (lv, sizes[1], 5)):
            _lbl(dec, "cbf")
            if dec.decode_bin(ctx_id("QtCbf", cid)):
                _lbl(dec, "residual")
                lev[...] = coeffs_decode(dec, sz, sz, chroma=(cid != 0))
        return mode

    for sy in range(nsy):
        for sx in range(nsx):
            _lbl(dec, "split_flag")
            sp = dec.decode_bin(ctx_id("SplitFlag", 0))
            split[sy, sx] = sp
            if sp:
                for k, (qy, qx) in enumerate(_QUADS):
                    cy, cx = 2 * sy + qy, 2 * sx + qx
                    m = parse_one(cy, cx, l8y[sy, sx, k], l8u[sy, sx, k],
                                  l8v[sy, sx, k], (SUB, sc8))
                    modes8[sy, sx, k] = m
                    cell[cy, cx] = m
            else:
                m = parse_one(2 * sy, 2 * sx, l16y[sy, sx], l16u[sy, sx],
                              l16v[sy, sx], (SB, sc16))
                mode16[sy, sx] = m
                cell[2 * sy:2 * sy + 2, 2 * sx:2 * sx + 2] = m
    return split, mode16, modes8, l16y, l16u, l16v, l8y, l8u, l8v


def decode_intra_slice_wpp(data: bytes, nby: int, nbx: int, s: int,
                           stats=None, cclm: bool = False, mip: bool = False,
                           lfnst: bool = False, mrl: bool = False,
                           ts: bool = False, bdpcm: bool = False,
                           ibc: bool = False, mts: bool = False):
    """Entry-point substream variant (mirrors
    encoder/intra_coder.py encode_intra_slice_wpp: u16 count, u32 lengths,
    independent per-row-group CABAC streams with fresh contexts)."""
    n = int.from_bytes(data[:2], "big")
    lens = [int.from_bytes(data[2 + 4 * i: 6 + 4 * i], "big")
            for i in range(n)]
    off = 2 + 4 * n
    bounds = [round(i * nby / n) for i in range(n + 1)]
    grids = _alloc_grids(nby, nbx, s)
    for i in range(n):
        sub = data[off:off + lens[i]]
        off += lens[i]
        if stats is not None:
            from ..utils.trace import StatsBinDecoder
            dec = StatsBinDecoder(sub, stats)
        else:
            dec = make_decoder(sub)
        _decode_intra_rows(dec, grids, s, cclm, mip, lfnst,
                           bounds[i], bounds[i + 1], mrl, ts, bdpcm, ibc,
                           mts)
    return grids


def _alloc_grids(nby: int, nbx: int, s: int):
    sc = s // 2
    return (np.zeros((nby, nbx), dtype=np.int32),
            np.zeros((nby, nbx), dtype=np.int32),
            np.zeros((nby, nbx), dtype=np.int32),
            np.zeros((nby, nbx), dtype=np.int32),
            np.zeros((nby, nbx), dtype=np.int32),
            np.zeros((nby, nbx), dtype=np.int32),
            np.zeros((nby, nbx, s, s), dtype=np.int32),
            np.zeros((nby, nbx, sc, sc), dtype=np.int32),
            np.zeros((nby, nbx, sc, sc), dtype=np.int32))


def _decode_intra_rows(dec, grids, s: int, cclm: bool, mip: bool,
                       lfnst: bool, r0: int, r1: int, mrl: bool = False,
                       ts: bool = False, bdpcm: bool = False,
                       ibc: bool = False, mts: bool = False) -> None:
    modes, lm, lf, mr, tsg, mtsg, lev_y, lev_u, lev_v = grids
    nby, nbx = modes.shape
    sc = s // 2
    for by in range(r0, r1):
        for bx in range(nbx):
            left = _nb(int(modes[by, bx - 1])) if bx > 0 else -1
            above = _nb(int(modes[by - 1, bx])) if by > 0 else -1
            _lbl(dec, "intra_mode")
            is_ibc = False
            if ibc:
                _lbl(dec, "ibc_flag")
                is_ibc = bool(dec.decode_bin(ctx_id("IbcFlag", 0)))
                if is_ibc:
                    modes[by, bx] = IBC_BASE + dec.decode_bins_ep(4)
            is_mip = False
            if not is_ibc:
                if mip:
                    _lbl(dec, "mip_flag")
                    is_mip = bool(dec.decode_bin(ctx_id("MipFlag")))
                if is_mip:
                    modes[by, bx] = 67 + dec.decode_bins_ep(3)
                else:
                    modes[by, bx] = decode_intra_mode(dec, left, above)
                    if mrl:
                        _lbl(dec, "mrl_idx")
                        mr[by, bx] = dec.decode_bin(
                            ctx_id("MultiRefLineIdx"))
            if cclm and not is_ibc:
                _lbl(dec, "cclm_flag")
                lm[by, bx] = dec.decode_bin(ctx_id("IntraChromaPredMode"))
            if ts:
                _lbl(dec, "transform_skip_flag")
                if dec.decode_bin(ctx_id("TransformSkipFlag", 0)):
                    tsg[by, bx] = 1
                    if bdpcm and dec.decode_bin(ctx_id("BDPCMFlag", 0)):
                        tsg[by, bx] = \
                            2 + dec.decode_bin(ctx_id("BDPCMFlag", 1))
            for comp, lev, size in (("y", lev_y, s), ("u", lev_u, sc),
                                    ("v", lev_v, sc)):
                cbf_ctx = ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])
                _lbl(dec, "cbf")
                cbf = bool(dec.decode_bin(cbf_ctx))
                if cbf:
                    _lbl(dec, "residual_" + comp)
                    lev[by, bx] = coeffs_decode(dec, size, size,
                                                chroma=(comp != "y"))
                if comp == "y" and lfnst and cbf and tsg[by, bx] == 0:
                    _lbl(dec, "lfnst_idx")
                    if dec.decode_bin(ctx_id("LFNSTIdx", 0)):
                        lf[by, bx] = 1 + dec.decode_bin(ctx_id("LFNSTIdx", 1))
                if comp == "y" and mts and cbf and tsg[by, bx] == 0 \
                        and (not lfnst or lf[by, bx] == 0):
                    _lbl(dec, "mts_idx")
                    m = 0
                    for k in range(4):
                        if not dec.decode_bin(ctx_id("MtsIdx", k)):
                            break
                        m += 1
                    mtsg[by, bx] = m
