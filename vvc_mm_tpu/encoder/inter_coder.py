"""P-slice entropy encoding: skip flags, MVDs, residuals -> CABAC.

TPU-native analog of the reference CABACWriter inter path (reference:
source/Lib/EncoderLib/CABACWriter.cpp — cu_skip_flag, mvd_coding:1575,
cbf + residual_coding).  Host-side; consumes dense tensors from the
batched P-frame encode.

MV prediction: component-wise median of (left, above, above-right) decoded
MVs, unavailable -> 0 (simplified AMVP; the reference's full MM-aware
candidate list, UnitTools.cpp:2172 fillMvpCand, lands with the MM layer).
Encoder and decoder share `mvp_median` exactly.
"""
from __future__ import annotations

import numpy as np

from ..common.cabac import BinEncoder
from ..common.contexts import ctx_id
from ..common.residual_coding import encode_coeffs


def mvp_median(mvs: np.ndarray, by: int, bx: int) -> np.ndarray:
    """Median MV predictor from decoded neighbors (host, shared enc/dec)."""
    nby, nbx = mvs.shape[:2]
    cand = []
    if bx > 0:
        cand.append(mvs[by, bx - 1])
    if by > 0:
        cand.append(mvs[by - 1, bx])
    if by > 0 and bx + 1 < nbx:
        cand.append(mvs[by - 1, bx + 1])
    elif by > 0 and bx > 0:
        cand.append(mvs[by - 1, bx - 1])
    if not cand:
        return np.zeros(2, dtype=np.int64)
    c = np.stack(cand)
    if len(cand) == 1:
        return c[0]
    if len(cand) == 2:
        return (c[0] + c[1] + 1) >> 1          # rounding average of two
    return np.median(c, axis=0).astype(np.int64)


def encode_mvd_comp(enc: BinEncoder, v: int, ctx_base: str = "Mvd") -> None:
    """VVC mvd_coding per component: gt0(ctx), gt1(ctx), EG1 remainder,
    sign (reference: CABACWriter.cpp mvd_coding)."""
    a = abs(v)
    enc.encode_bin(int(a > 0), ctx_id(ctx_base, 0))
    if a > 0:
        enc.encode_bin(int(a > 1), ctx_id(ctx_base, 1))
        if a > 1:
            enc.encode_eg(a - 2, 1)
        enc.encode_bin_ep(int(v < 0))


def encode_p_slice(mvs: np.ndarray, lev_y: np.ndarray, lev_u: np.ndarray,
                   lev_v: np.ndarray) -> bytes:
    """mvs (nby, nbx, 2) 1/16-pel; lev_* (nby, nbx, s, s).  Raster order."""
    enc = BinEncoder()
    nby, nbx = mvs.shape[:2]
    mvs = mvs.astype(np.int64)
    for by in range(nby):
        for bx in range(nbx):
            mv = mvs[by, bx]
            pred = mvp_median(mvs, by, bx)
            mvd = mv - pred
            levels = (lev_y[by, bx], lev_u[by, bx], lev_v[by, bx])
            no_resid = all(not np.any(l != 0) for l in levels)
            skip = no_resid and mvd[0] == 0 and mvd[1] == 0
            enc.encode_bin(int(skip), ctx_id("SkipFlag"))
            if skip:
                continue
            encode_mvd_comp(enc, int(mvd[0]))
            encode_mvd_comp(enc, int(mvd[1]))
            for comp, lev in (("y", levels[0]), ("u", levels[1]),
                              ("v", levels[2])):
                cbf = bool(np.any(lev != 0))
                enc.encode_bin(int(cbf),
                               ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp]))
                if cbf:
                    encode_coeffs(enc, lev, chroma=(comp != "y"))
    return enc.finish()
