"""Intra slice entropy encoding: block modes + residual levels -> CABAC.

TPU-native analog of the reference CABACWriter intra path (reference:
source/Lib/EncoderLib/CABACWriter.cpp — coding_tree_unit:148, intra_luma_pred_mode,
cbf + residual_coding).  Consumes the dense tensors produced by the
wavefront encode scan; strictly host-side.
"""
from __future__ import annotations

import numpy as np

from ..common.cabac import BinEncoder
from ..utils.native import coeffs_encode, make_encoder
from ..common.contexts import ctx_id
from ..common.residual_coding import encode_coeffs
from ..common.wavefront import IBC_BASE, mpm3_host


def encode_intra_mode(enc: BinEncoder, mode: int, left: int, above: int
                      ) -> None:
    mpm = mpm3_host(left, above)
    if mode in mpm:
        enc.encode_bin(1, ctx_id("IntraLumaMpmFlag"))
        idx = mpm.index(mode)
        enc.encode_bin_ep(int(idx > 0))
        if idx > 0:
            enc.encode_bin_ep(idx - 1)
    else:
        enc.encode_bin(0, ctx_id("IntraLumaMpmFlag"))
        rem = sorted(m for m in range(67) if m not in mpm)
        enc.encode_bins_ep(rem.index(mode), 6)


def _nb(m: int) -> int:
    """Neighbor mode for MPM purposes: MIP/IBC act as planar (reference:
    UnitTools getIntraDirLuma MIP->PLANAR mapping)."""
    return 0 if m >= 67 else m


def encode_intra_slice(modes: np.ndarray, lev_y: np.ndarray,
                       lev_u: np.ndarray, lev_v: np.ndarray,
                       cclm: np.ndarray | None = None,
                       mip: bool = False,
                       lfnst: np.ndarray | None = None,
                       mrl: np.ndarray | None = None,
                       ts: np.ndarray | None = None,
                       bdpcm: bool = False, ibc: bool = False,
                       mts: np.ndarray | None = None) -> bytes:
    """modes (nby, nbx); lev_* (nby, nbx, s, s).  Raster block order.
    cclm: optional (nby, nbx) chroma-LM flags (SPS-gated; reference:
    CABACWriter intra_chroma_pred_mode LM branch).  mip: SPS MIP enable —
    writes intra_mip_flag + 3-bit mode (CABACWriter mip_flag).
    ts: optional (nby, nbx) transform-skip mode grid (0 regular, 1 TS,
    2/3 BDPCM H/V — reference: transform_skip_flag +
    intra_bdpcm_luma_flag)."""
    enc = make_encoder()
    _encode_intra_rows(enc, modes, lev_y, lev_u, lev_v, cclm, mip, lfnst,
                       0, modes.shape[0], mrl, ts, bdpcm, ibc, mts)
    return enc.finish()


def _encode_intra_rows(enc, modes, lev_y, lev_u, lev_v, cclm, mip, lfnst,
                       r0: int, r1: int, mrl=None, ts=None,
                       bdpcm: bool = False, ibc: bool = False,
                       mts=None) -> None:
    """Code block rows [r0, r1) into `enc` (one substream's worth)."""
    nby, nbx = modes.shape
    for by in range(r0, r1):
        for bx in range(nbx):
            left = _nb(int(modes[by, bx - 1])) if bx > 0 else -1
            above = _nb(int(modes[by - 1, bx])) if by > 0 else -1
            mode = int(modes[by, bx])
            is_ibc = mode >= IBC_BASE
            if ibc:
                # pred_mode_ibc_flag + 4-bit BV index (reference:
                # CABACReader pred_mode + IBC merge/BV syntax)
                enc.encode_bin(int(is_ibc), ctx_id("IbcFlag", 0))
                if is_ibc:
                    enc.encode_bins_ep(mode - IBC_BASE, 4)
            if not is_ibc:
                if mip:
                    enc.encode_bin(int(mode >= 67), ctx_id("MipFlag"))
                if mode >= 67:
                    enc.encode_bins_ep(mode - 67, 3)
                else:
                    encode_intra_mode(enc, mode, left, above)
                    if mrl is not None:
                        enc.encode_bin(int(mrl[by, bx] != 0),
                                       ctx_id("MultiRefLineIdx"))
            if cclm is not None and not is_ibc:
                enc.encode_bin(int(cclm[by, bx] != 0),
                               ctx_id("IntraChromaPredMode"))
            tsm = int(ts[by, bx]) if ts is not None else 0
            if ts is not None:
                enc.encode_bin(int(tsm > 0), ctx_id("TransformSkipFlag", 0))
                if tsm > 0 and bdpcm:
                    enc.encode_bin(int(tsm >= 2), ctx_id("BDPCMFlag", 0))
                    if tsm >= 2:
                        enc.encode_bin(int(tsm == 3), ctx_id("BDPCMFlag", 1))
            for comp, lev in (("y", lev_y), ("u", lev_u), ("v", lev_v)):
                blk = lev[by, bx]
                cbf = bool(np.any(blk != 0))
                cbf_ctx = ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])
                enc.encode_bin(int(cbf), cbf_ctx)
                if cbf:
                    coeffs_encode(enc, blk, chroma=(comp != "y"))
                if comp == "y" and lfnst is not None and cbf and tsm == 0:
                    # lfnst_idx: truncated unary, 2 contexts (reference:
                    # CABACWriter residual_lfnst_mode)
                    idx = int(lfnst[by, bx])
                    enc.encode_bin(int(idx > 0), ctx_id("LFNSTIdx", 0))
                    if idx > 0:
                        enc.encode_bin(int(idx > 1), ctx_id("LFNSTIdx", 1))
                if comp == "y" and mts is not None and cbf and tsm == 0 \
                        and (lfnst is None or int(lfnst[by, bx]) == 0):
                    # tu_mts_idx: truncated unary over 4 contexts
                    # (reference: CABACWriter mts_idx; only on the DCT2/
                    # no-LFNST, non-TS path)
                    m = int(mts[by, bx])
                    for k in range(4):
                        enc.encode_bin(int(m > k), ctx_id("MtsIdx", k))
                        if m <= k:
                            break


def encode_intra_slice_part(split: np.ndarray, mode16: np.ndarray,
                            modes8: np.ndarray, l16y: np.ndarray,
                            l16u: np.ndarray, l16v: np.ndarray,
                            l8y: np.ndarray, l8u: np.ndarray,
                            l8v: np.ndarray) -> bytes:
    """Two-level intra slice: per 16x16 superblock a split_cu_flag, then
    one mode+residual set (whole) or four in z-order (split) (reference:
    CABACWriter split_cu_flag + intra_luma_pred_mode; common/intra_part.py
    is the reconstruction mirror)."""
    from ..common.intra_part import _QUADS
    enc = make_encoder()
    nsy, nsx = split.shape
    # final mode per 8x8 cell (MPM source, mirrors the scan's mode map)
    cell = np.full((2 * nsy, 2 * nsx), -1, dtype=np.int32)

    def code_one(mode, cy, cx, ly, lu, lv):
        left = int(cell[cy, cx - 1]) if cx > 0 else -1
        above = int(cell[cy - 1, cx]) if cy > 0 else -1
        encode_intra_mode(enc, int(mode), left, above)
        for comp, lev in (("y", ly), ("u", lu), ("v", lv)):
            cbf = bool(np.any(lev != 0))
            enc.encode_bin(int(cbf),
                           ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp]))
            if cbf:
                coeffs_encode(enc, lev, chroma=(comp != "y"))

    for sy in range(nsy):
        for sx in range(nsx):
            sp = int(split[sy, sx])
            enc.encode_bin(sp, ctx_id("SplitFlag", 0))
            if sp:
                for k, (qy, qx) in enumerate(_QUADS):
                    cy, cx = 2 * sy + qy, 2 * sx + qx
                    code_one(modes8[sy, sx, k], cy, cx,
                             l8y[sy, sx, k], l8u[sy, sx, k],
                             l8v[sy, sx, k])
                    cell[cy, cx] = int(modes8[sy, sx, k])
            else:
                code_one(mode16[sy, sx], 2 * sy, 2 * sx,
                         l16y[sy, sx], l16u[sy, sx], l16v[sy, sx])
                cell[2 * sy:2 * sy + 2, 2 * sx:2 * sx + 2] = \
                    int(mode16[sy, sx])
    return enc.finish()


def encode_intra_slice_wpp(modes: np.ndarray, lev_y: np.ndarray,
                           lev_u: np.ndarray, lev_v: np.ndarray,
                           cclm: np.ndarray | None = None,
                           mip: bool = False,
                           lfnst: np.ndarray | None = None,
                           mrl: np.ndarray | None = None,
                           ts: np.ndarray | None = None,
                           bdpcm: bool = False, ibc: bool = False,
                           mts: np.ndarray | None = None,
                           num_substreams: int = 4) -> bytes:
    """Wavefront/tile-style entropy substreams with entry points.

    The reference's WPP splits the slice into one CABAC substream per CTU
    row, restarted (with context inheritance) at each row, and records
    entry-point offsets in the slice header (reference: EncSlice.cpp:
    2024-2113 per-substream termination; VLC entry_point_offset syntax).
    Here: the block rows are split into `num_substreams` groups, each an
    independently decodable arithmetic stream with fresh contexts (the
    tile-style restart — trades a little context adaptation for full
    decode parallelism), encoded concurrently on host threads (the C
    coder runs outside the GIL via ctypes).

    Payload: uvlc-free simple framing — u16 count, u32 lengths, streams.
    """
    import concurrent.futures as cf

    nby = modes.shape[0]
    n = max(1, min(num_substreams, nby))
    bounds = [round(i * nby / n) for i in range(n + 1)]

    def one(i: int) -> bytes:
        enc = make_encoder()
        _encode_intra_rows(enc, modes, lev_y, lev_u, lev_v, cclm, mip,
                           lfnst, bounds[i], bounds[i + 1], mrl, ts, bdpcm,
                           ibc, mts)
        return enc.finish()

    with cf.ThreadPoolExecutor(max_workers=min(n, 8)) as ex:
        subs = list(ex.map(one, range(n)))
    out = bytearray()
    out += len(subs).to_bytes(2, "big")
    for s in subs:
        out += len(s).to_bytes(4, "big")
    for s in subs:
        out += s
    return bytes(out)
