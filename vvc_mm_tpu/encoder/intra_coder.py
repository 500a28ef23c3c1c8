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
from ..common.wavefront import mpm3_host


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
    """Neighbor mode for MPM purposes: MIP acts as planar (reference:
    UnitTools getIntraDirLuma MIP->PLANAR mapping)."""
    return 0 if m >= 67 else m


def encode_intra_slice(modes: np.ndarray, lev_y: np.ndarray,
                       lev_u: np.ndarray, lev_v: np.ndarray,
                       cclm: np.ndarray | None = None,
                       mip: bool = False,
                       lfnst: np.ndarray | None = None) -> bytes:
    """modes (nby, nbx); lev_* (nby, nbx, s, s).  Raster block order.
    cclm: optional (nby, nbx) chroma-LM flags (SPS-gated; reference:
    CABACWriter intra_chroma_pred_mode LM branch).  mip: SPS MIP enable —
    writes intra_mip_flag + 3-bit mode (CABACWriter mip_flag)."""
    enc = make_encoder()
    nby, nbx = modes.shape
    for by in range(nby):
        for bx in range(nbx):
            left = _nb(int(modes[by, bx - 1])) if bx > 0 else -1
            above = _nb(int(modes[by - 1, bx])) if by > 0 else -1
            mode = int(modes[by, bx])
            if mip:
                enc.encode_bin(int(mode >= 67), ctx_id("MipFlag"))
            if mode >= 67:
                enc.encode_bins_ep(mode - 67, 3)
            else:
                encode_intra_mode(enc, mode, left, above)
            if cclm is not None:
                enc.encode_bin(int(cclm[by, bx] != 0),
                               ctx_id("IntraChromaPredMode"))
            for comp, lev in (("y", lev_y), ("u", lev_u), ("v", lev_v)):
                blk = lev[by, bx]
                cbf = bool(np.any(blk != 0))
                cbf_ctx = ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])
                enc.encode_bin(int(cbf), cbf_ctx)
                if cbf:
                    coeffs_encode(enc, blk, chroma=(comp != "y"))
                if comp == "y" and lfnst is not None and cbf:
                    # lfnst_idx: truncated unary, 2 contexts (reference:
                    # CABACWriter residual_lfnst_mode)
                    idx = int(lfnst[by, bx])
                    enc.encode_bin(int(idx > 0), ctx_id("LFNSTIdx", 0))
                    if idx > 0:
                        enc.encode_bin(int(idx > 1), ctx_id("LFNSTIdx", 1))
    return enc.finish()
