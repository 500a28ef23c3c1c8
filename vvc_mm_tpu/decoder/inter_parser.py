"""P-slice entropy decoding — exact inverse of encoder/inter_coder.py.

TPU-native analog of the reference CABACReader inter path (reference:
source/Lib/DecoderLib/CABACReader.cpp — cu_skip_flag, mvd_coding,
residual_coding).
"""
from __future__ import annotations

import numpy as np

from ..common.cabac import BinDecoder
from ..utils import trace as trace_mod
from ..utils.native import coeffs_decode, make_decoder
from ..common.contexts import ctx_id
from ..common.residual_coding import decode_coeffs
from ..encoder.inter_coder import (HmvpList, _mm_mvp, amvp_list,
                                   inherited_model, merge_candidates,
                                   mvp_median, mvp_median_same_model,
                                   mvp_unit_grid, MERGE_MAX)


def _lbl(dec, name: str) -> None:
    lab = getattr(dec, "label", None)
    if lab is not None:
        lab(name)


def _make(data: bytes, stats):
    if stats is not None:
        from ..utils.trace import StatsBinDecoder
        return StatsBinDecoder(data, stats)
    return make_decoder(data)


def decode_mvd_comp(dec: BinDecoder, ctx_base: str = "Mvd") -> int:
    if not dec.decode_bin(ctx_id(ctx_base, 0)):
        return 0
    a = 1
    if dec.decode_bin(ctx_id(ctx_base, 1)):
        a = 2 + dec.decode_eg(1)
    return -a if dec.decode_bin_ep() else a


def decode_merge_idx(dec: BinDecoder, n: int = MERGE_MAX) -> int:
    """Inverse of encoder.inter_coder.encode_merge_idx (reference:
    CABACReader::merge_idx — first bin context, rest bypass TU)."""
    if n <= 1 or not dec.decode_bin(ctx_id("MergeIdx")):
        return 0
    idx = 1
    while idx < n - 1 and dec.decode_bin_ep():
        idx += 1
    return idx


def decode_motion_model(dec: BinDecoder, n_active: int) -> int:
    """Inverse of encoder.inter_coder.encode_motion_model (reference:
    CABACReader.cpp:2300 unary over the active-model list)."""
    idx = 0
    while idx < n_active - 1 and dec.decode_bin(
            ctx_id("MotionModel", min(idx, 10))):
        idx += 1
    return idx


def decode_p_slice_mm(data: bytes, nby: int, nbx: int, s: int,
                      active_models: list[int], conv=None, epipole=None,
                      stats=None, use_merge: bool = False,
                      mer_blocks_log2: int = 0
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                 np.ndarray, np.ndarray]:
    """Returns (model_idx, mvs (nby,nbx,2), lev_y, lev_u, lev_v)."""
    from ..encoder.inter_coder import merge_candidates_mm
    dec = _make(data, stats)
    sc = s // 2
    model_idx = np.zeros((nby, nbx), dtype=np.int32)
    models_sel = np.zeros((nby, nbx), dtype=np.int32)
    mvs = np.zeros((nby, nbx, 2), dtype=np.int64)
    lev_y = np.zeros((nby, nbx, s, s), dtype=np.int32)
    lev_u = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    lev_v = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    model_to_idx = {m: i for i, m in enumerate(active_models)}
    for by in range(nby):
        for bx in range(nbx):
            if use_merge:
                mcands = merge_candidates_mm(
                    model_idx, mvs, by, bx,
                    mer_blocks_log2=mer_blocks_log2)

                def apply_cand(c):
                    ci, cmv = c
                    model_idx[by, bx] = ci
                    models_sel[by, bx] = active_models[ci]
                    mvs[by, bx] = cmv

                _lbl(dec, "skip_flag")
                if dec.decode_bin(ctx_id("SkipFlag")):
                    _lbl(dec, "merge_idx")
                    apply_cand(mcands[decode_merge_idx(dec)])
                    continue
                _lbl(dec, "merge_flag")
                if dec.decode_bin(ctx_id("MergeFlag")):
                    _lbl(dec, "merge_idx")
                    apply_cand(mcands[decode_merge_idx(dec)])
                    for comp, lev, size in (("y", lev_y, s),
                                            ("u", lev_u, sc),
                                            ("v", lev_v, sc)):
                        _lbl(dec, "cbf")
                        if dec.decode_bin(
                                ctx_id("QtCbf",
                                       {"y": 0, "u": 4, "v": 5}[comp])):
                            _lbl(dec, "residual_" + comp)
                            lev[by, bx] = coeffs_decode(
                                dec, size, size, chroma=(comp != "y"))
                    continue
            elif (_lbl(dec, "skip_flag")
                  or dec.decode_bin(ctx_id("SkipFlag"))):
                model = inherited_model(models_sel, by, bx)
                models_sel[by, bx] = model
                model_idx[by, bx] = model_to_idx[model]
                mvs[by, bx] = _mm_mvp(mvs, models_sel, by, bx, model, s,
                                      conv, epipole)
                continue
            _lbl(dec, "motion_model")
            midx = decode_motion_model(dec, len(active_models))
            model = active_models[midx]
            model_idx[by, bx] = midx
            models_sel[by, bx] = model
            if trace_mod.TRACE is not None:
                trace_mod.TRACE.log("motion_model", by=by, bx=bx,
                                    model=model)
            _lbl(dec, "mvd")
            mvd = np.array([decode_mvd_comp(dec), decode_mvd_comp(dec)],
                           dtype=np.int64)
            if trace_mod.TRACE is not None:
                trace_mod.TRACE.log("mvd", by=by, bx=bx, x=int(mvd[0]),
                                    y=int(mvd[1]))
            pred = _mm_mvp(mvs, models_sel, by, bx, model, s, conv, epipole)
            mvs[by, bx] = pred + mvd
            for comp, lev, size in (("y", lev_y, s), ("u", lev_u, sc),
                                    ("v", lev_v, sc)):
                _lbl(dec, "cbf")
                if dec.decode_bin(
                        ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])):
                    _lbl(dec, "residual_" + comp)
                    lev[by, bx] = coeffs_decode(dec, size, size,
                                                chroma=(comp != "y"))
    return model_idx, mvs, lev_y, lev_u, lev_v


def decode_p_slice_affine(data: bytes, nby: int, nbx: int, s: int,
                          stats=None):
    """Exact inverse of encoder.inter_coder.encode_p_slice_affine.
    Returns (mvs, aff, dmv, lev_y, lev_u, lev_v)."""
    dec = _make(data, stats)
    sc = s // 2
    mvs = np.zeros((nby, nbx, 2), dtype=np.int64)
    aff = np.zeros((nby, nbx), dtype=bool)
    dmv = np.zeros((nby, nbx, 2), dtype=np.int64)
    lev_y = np.zeros((nby, nbx, s, s), dtype=np.int32)
    lev_u = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    lev_v = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    for by in range(nby):
        for bx in range(nbx):
            pred = mvp_median(mvs, by, bx)
            _lbl(dec, "skip_flag")
            if dec.decode_bin(ctx_id("SkipFlag")):
                mvs[by, bx] = pred
                continue
            _lbl(dec, "affine_flag")
            a = bool(dec.decode_bin(ctx_id("AffineFlag", 0)))
            aff[by, bx] = a
            _lbl(dec, "mvd")
            mvd = np.array([decode_mvd_comp(dec), decode_mvd_comp(dec)],
                           dtype=np.int64)
            mvs[by, bx] = pred + mvd
            if a:
                dmv[by, bx] = [decode_mvd_comp(dec), decode_mvd_comp(dec)]
            for comp, lev, size in (("y", lev_y, s), ("u", lev_u, sc),
                                    ("v", lev_v, sc)):
                _lbl(dec, "cbf")
                if dec.decode_bin(
                        ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])):
                    _lbl(dec, "residual_" + comp)
                    lev[by, bx] = coeffs_decode(dec, size, size,
                                                chroma=(comp != "y"))
    return mvs, aff, dmv, lev_y, lev_u, lev_v


def decode_p_slice_qt(data: bytes, h: int, w: int, top: int, depth: int,
                      stats=None, use_merge: bool = False):
    """Exact inverse of encoder.inter_coder.encode_p_slice_qt.  Returns
    (mv_unit (nuy,nux,2), levels [per size (ly,lu,lv)], has_resid_unit,
    leaf_id_unit) matching qtree.encode_p_frame_qt's resolved outputs."""
    dec = _make(data, stats)
    u = top >> depth
    nuy, nux = h // u, w // u
    nty, ntx = h // top, w // top
    sizes = [top >> d for d in range(depth + 1)]
    levels = []
    for s in sizes:
        ny, nx = h // s, w // s
        levels.append((np.zeros((ny, nx, s, s), dtype=np.int32),
                       np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32),
                       np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32)))
    coded = np.zeros((nuy, nux, 2), dtype=np.int64)
    avail = np.zeros((nuy, nux), dtype=bool)
    has_resid = np.zeros((nuy, nux), dtype=bool)
    leaf_id = np.zeros((nuy, nux), dtype=np.int32)

    from ..encoder.inter_coder import merge_candidates_unit

    def parse_leaf(d, by, bx):
        s = sizes[d]
        k = s // u
        uy, ux = by * k, bx * k
        pred = mvp_unit_grid(coded, avail, uy, ux, k)
        if use_merge:
            cands = merge_candidates_unit(coded, avail, uy, ux, k)
            _lbl(dec, "skip_flag")
            skip = bool(dec.decode_bin(ctx_id("SkipFlag")))
            mrg = skip
            if not skip:
                _lbl(dec, "merge_flag")
                mrg = bool(dec.decode_bin(ctx_id("MergeFlag")))
            if mrg:
                _lbl(dec, "merge_idx")
                mv = np.asarray(cands[decode_merge_idx(dec)], np.int64)
            else:
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec),
                                decode_mvd_comp(dec)], dtype=np.int64)
                mv = pred + mvd
            if not skip:
                hr = False
                for ci, lev in enumerate(levels[d]):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                        _lbl(dec, "residual_" + "yuv"[ci])
                        sz = s if ci == 0 else s // 2
                        lev[by, bx] = coeffs_decode(dec, sz, sz,
                                                    chroma=(ci != 0))
                        hr = True
                has_resid[uy:uy + k, ux:ux + k] = hr
        else:
            _lbl(dec, "skip_flag")
            if dec.decode_bin(ctx_id("SkipFlag")):
                mv = pred
            else:
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec),
                                decode_mvd_comp(dec)], dtype=np.int64)
                mv = pred + mvd
                hr = False
                for ci, lev in enumerate(levels[d]):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                        _lbl(dec, "residual_" + "yuv"[ci])
                        sz = s if ci == 0 else s // 2
                        lev[by, bx] = coeffs_decode(dec, sz, sz,
                                                    chroma=(ci != 0))
                        hr = True
                has_resid[uy:uy + k, ux:ux + k] = hr
        coded[uy:uy + k, ux:ux + k] = mv
        avail[uy:uy + k, ux:ux + k] = True
        leaf_id[uy:uy + k, ux:ux + k] = uy * nux + ux

    def parse_node(d, by, bx):
        if d < depth:
            _lbl(dec, "split_flag")
            if dec.decode_bin(ctx_id("SplitFlag", min(d, 8))):
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    parse_node(d + 1, 2 * by + dy, 2 * bx + dx)
                return
        parse_leaf(d, by, bx)

    for by in range(nty):
        for bx in range(ntx):
            parse_node(0, by, bx)
    return coded, levels, has_resid, leaf_id


def decode_b_slice_qt(data: bytes, h: int, w: int, top: int, depth: int,
                      stats=None, use_merge: bool = False):
    """Exact inverse of encoder.inter_coder.encode_b_slice_qt.  Returns
    (mv0_unit, mv1_unit, dirs_unit, levels, has_resid_unit, leaf_id_unit).
    """
    from ..encoder.inter_coder import merge_candidates_unit_b
    dec = _make(data, stats)
    u = top >> depth
    nuy, nux = h // u, w // u
    nty, ntx = h // top, w // top
    sizes = [top >> d for d in range(depth + 1)]
    levels = []
    for s in sizes:
        ny, nx = h // s, w // s
        levels.append((np.zeros((ny, nx, s, s), dtype=np.int32),
                       np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32),
                       np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32)))
    coded0 = np.zeros((nuy, nux, 2), dtype=np.int64)
    coded1 = np.zeros((nuy, nux, 2), dtype=np.int64)
    dirs_u = np.zeros((nuy, nux), dtype=np.int32)
    avail = np.zeros((nuy, nux), dtype=bool)
    has_resid = np.zeros((nuy, nux), dtype=bool)
    leaf_id = np.zeros((nuy, nux), dtype=np.int32)

    def parse_leaf(d, by, bx):
        s = sizes[d]
        k = s // u
        uy, ux = by * k, bx * k
        pred0 = mvp_unit_grid(coded0, avail, uy, ux, k)
        pred1 = mvp_unit_grid(coded1, avail, uy, ux, k)
        d_pred = (int(dirs_u[uy, ux - 1]) if ux > 0 and avail[uy, ux - 1]
                  else int(dirs_u[uy - 1, ux])
                  if uy > 0 and avail[uy - 1, ux] else 0)
        if use_merge:
            cands = merge_candidates_unit_b(coded0, coded1, dirs_u, avail,
                                            uy, ux, k)
            _lbl(dec, "skip_flag")
            skip = bool(dec.decode_bin(ctx_id("SkipFlag")))
            mrg = skip
            if not skip:
                _lbl(dec, "merge_flag")
                mrg = bool(dec.decode_bin(ctx_id("MergeFlag")))
            if mrg:
                _lbl(dec, "merge_idx")
                dv, m0, m1 = cands[decode_merge_idx(dec)]
                mv0 = np.asarray(m0, np.int64)
                mv1 = np.asarray(m1, np.int64)
            else:
                if dec.decode_bin(ctx_id("InterDir", 0)):
                    dv = 2
                else:
                    dv = dec.decode_bin(ctx_id("InterDir", 1))
                mv0, mv1 = pred0, pred1
                if dv != 1:
                    mv0 = pred0 + np.array([decode_mvd_comp(dec),
                                            decode_mvd_comp(dec)],
                                           dtype=np.int64)
                if dv != 0:
                    mv1 = pred1 + np.array([decode_mvd_comp(dec),
                                            decode_mvd_comp(dec)],
                                           dtype=np.int64)
            if not skip:
                hr = False
                for ci in range(3):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                        _lbl(dec, "residual_" + "yuv"[ci])
                        sz = s if ci == 0 else s // 2
                        levels[d][ci][by, bx] = coeffs_decode(
                            dec, sz, sz, chroma=(ci != 0))
                        hr = True
                has_resid[uy:uy + k, ux:ux + k] = hr
        elif (_lbl(dec, "skip_flag")
                or dec.decode_bin(ctx_id("SkipFlag"))):
            dv, mv0, mv1 = d_pred, pred0, pred1
        else:
            if dec.decode_bin(ctx_id("InterDir", 0)):
                dv = 2
            else:
                dv = dec.decode_bin(ctx_id("InterDir", 1))
            if dv != 1:
                mv0 = pred0 + np.array([decode_mvd_comp(dec),
                                        decode_mvd_comp(dec)],
                                       dtype=np.int64)
            else:
                mv0 = pred0
            if dv != 0:
                mv1 = pred1 + np.array([decode_mvd_comp(dec),
                                        decode_mvd_comp(dec)],
                                       dtype=np.int64)
            else:
                mv1 = pred1
            hr = False
            for ci, lev in enumerate(levels[d]):
                _lbl(dec, "cbf")
                if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                    sz = s if ci == 0 else s // 2
                    lev[by, bx] = coeffs_decode(dec, sz, sz,
                                                chroma=(ci != 0))
                    hr = True
            has_resid[uy:uy + k, ux:ux + k] = hr
        coded0[uy:uy + k, ux:ux + k] = mv0
        coded1[uy:uy + k, ux:ux + k] = mv1
        dirs_u[uy:uy + k, ux:ux + k] = dv
        avail[uy:uy + k, ux:ux + k] = True
        leaf_id[uy:uy + k, ux:ux + k] = uy * nux + ux

    def parse_node(d, by, bx):
        if d < depth:
            _lbl(dec, "split_flag")
            if dec.decode_bin(ctx_id("SplitFlag", min(d, 8))):
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    parse_node(d + 1, 2 * by + dy, 2 * bx + dx)
                return
        parse_leaf(d, by, bx)

    for by in range(nty):
        for bx in range(ntx):
            parse_node(0, by, bx)
    return coded0, coded1, dirs_u, levels, has_resid, leaf_id


def decode_b_slice(data: bytes, nby: int, nbx: int, s: int, stats=None,
                   use_gpm: bool = False, use_ciip: bool = False,
                   use_merge: bool = False, mer_blocks_log2: int = 0,
                   rows: tuple | None = None, state=None
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray]:
    """Exact inverse of encoder.inter_coder.encode_b_slice.  Returns
    (mv0, mv1, dirs, lev_y, lev_u, lev_v, gpm_modes)."""
    from ..encoder.inter_coder import merge_candidates_b
    dec = _make(data, stats)
    sc = s // 2
    if state is None:
        mv0 = np.zeros((nby, nbx, 2), dtype=np.int64)
        mv1 = np.zeros((nby, nbx, 2), dtype=np.int64)
        dirs = np.zeros((nby, nbx), dtype=np.int32)
        gpm_modes = np.zeros((nby, nbx), dtype=np.int32)
        lev_y = np.zeros((nby, nbx, s, s), dtype=np.int32)
        lev_u = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
        lev_v = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    else:
        mv0, mv1, dirs, gpm_modes, lev_y, lev_u, lev_v = state
    r0, r1 = rows if rows is not None else (0, nby)
    for by in range(r0, r1):
        for bx in range(nbx):
            pred0 = mvp_median(mv0, by, bx)
            pred1 = mvp_median(mv1, by, bx)
            d_pred = (int(dirs[by, bx - 1]) if bx > 0
                      else int(dirs[by - 1, bx]) if by > 0 else 0)
            d_pred = min(d_pred, 2)
            if use_merge:
                mcands = merge_candidates_b(
                    dirs, mv0, mv1, by, bx,
                    mer_blocks_log2=mer_blocks_log2)

                def apply_cand(c):
                    cd, c0, c1 = c
                    dirs[by, bx] = cd
                    mv0[by, bx] = c0
                    mv1[by, bx] = c1
                    # entropy convention: unused list takes its MVP
                    if cd == 0:
                        mv1[by, bx] = pred1
                    elif cd == 1:
                        mv0[by, bx] = pred0

                _lbl(dec, "skip_flag")
                if dec.decode_bin(ctx_id("SkipFlag")):
                    _lbl(dec, "merge_idx")
                    apply_cand(mcands[decode_merge_idx(dec)])
                    continue
                _lbl(dec, "merge_flag")
                if dec.decode_bin(ctx_id("MergeFlag")):
                    _lbl(dec, "merge_idx")
                    apply_cand(mcands[decode_merge_idx(dec)])
                    for comp, lev, size in (("y", lev_y, s),
                                            ("u", lev_u, sc),
                                            ("v", lev_v, sc)):
                        _lbl(dec, "cbf")
                        if dec.decode_bin(
                                ctx_id("QtCbf",
                                       {"y": 0, "u": 4, "v": 5}[comp])):
                            _lbl(dec, "residual_" + comp)
                            lev[by, bx] = coeffs_decode(
                                dec, size, size, chroma=(comp != "y"))
                    continue
            elif (_lbl(dec, "skip_flag")
                  or dec.decode_bin(ctx_id("SkipFlag"))):
                dirs[by, bx] = d_pred
                mv0[by, bx] = pred0
                mv1[by, bx] = pred1
                continue
            if dec.decode_bin(ctx_id("InterDir", 0)):
                d = 2
                if use_gpm and use_ciip:
                    _lbl(dec, "geo_flag")
                    if dec.decode_bin(ctx_id("GeoFlag")):
                        d = 4 if dec.decode_bin(ctx_id("CiipFlag")) else 3
                elif use_gpm:
                    _lbl(dec, "geo_flag")
                    if dec.decode_bin(ctx_id("GeoFlag")):
                        d = 3
                elif use_ciip:
                    _lbl(dec, "ciip_flag")
                    if dec.decode_bin(ctx_id("CiipFlag")):
                        d = 4
                if d == 3:
                    _lbl(dec, "gpm_mode")
                    g = 0
                    for _ in range(4):
                        g = (g << 1) | dec.decode_bin_ep()
                    gpm_modes[by, bx] = g
            else:
                d = dec.decode_bin(ctx_id("InterDir", 1))
            dirs[by, bx] = d
            smvd = False
            if d == 2:
                _lbl(dec, "smvd_flag")
                smvd = bool(dec.decode_bin(ctx_id("SmvdFlag")))
            if d != 1:
                mvd = np.asarray([decode_mvd_comp(dec),
                                  decode_mvd_comp(dec)], dtype=np.int64)
                mv0[by, bx] = pred0 + mvd
            else:
                mvd = np.zeros(2, np.int64)
                mv0[by, bx] = pred0
            if d != 0:
                if smvd:
                    # sym_mvd: mvd1 = -mvd0 (reference: smvd_mode)
                    mv1[by, bx] = pred1 - mvd
                else:
                    mvd1 = [decode_mvd_comp(dec), decode_mvd_comp(dec)]
                    mv1[by, bx] = pred1 + np.asarray(mvd1)
            else:
                mv1[by, bx] = pred1
            for comp, lev, size in (("y", lev_y, s), ("u", lev_u, sc),
                                    ("v", lev_v, sc)):
                _lbl(dec, "cbf")
                if dec.decode_bin(
                        ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])):
                    _lbl(dec, "residual_" + comp)
                    lev[by, bx] = coeffs_decode(dec, size, size,
                                                chroma=(comp != "y"))
    return mv0, mv1, dirs, lev_y, lev_u, lev_v, gpm_modes


def decode_p_slice(data: bytes, nby: int, nbx: int, s: int, stats=None,
                   col_mvs: np.ndarray | None = None,
                   use_tmvp: bool = False, use_amvr: bool = False,
                   use_merge: bool = False, mer_blocks_log2: int = 0,
                   rows: tuple | None = None, state=None
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray]:
    """Returns (mvs (nby,nbx,2) 1/16-pel, lev_y, lev_u, lev_v).  With
    use_tmvp, mirrors the encoder's AMVP list (spatial/TMVP/HMVP/zero) and
    parses the mvp index (encoder/inter_coder.py encode_p_slice).  With
    use_amvr, parses the per-block AMVR precision and scales the MVD
    (reference: CABACReader amvr_mode/imv).  With use_merge, skip means
    merge+no-residual and non-skip blocks carry a merge_flag; merge blocks
    take candidate merge_idx of the shared list (reference: CABACReader
    merge_data / merge_idx)."""
    from ..common.inter_frame import AMVR_SHIFTS, round_mv_amvr
    dec = _make(data, stats)
    sc = s // 2
    if state is None:
        mvs = np.zeros((nby, nbx, 2), dtype=np.int64)
        lev_y = np.zeros((nby, nbx, s, s), dtype=np.int32)
        lev_u = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
        lev_v = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    else:
        mvs, lev_y, lev_u, lev_v = state
    hist = HmvpList() if use_tmvp else None
    r0, r1 = rows if rows is not None else (0, nby)
    for by in range(r0, r1):
        for bx in range(nbx):
            col = (col_mvs[by, bx]
                   if (use_tmvp and col_mvs is not None) else None)
            if use_merge:
                mcands = merge_candidates(mvs, by, bx, col, hist,
                                          mer_blocks_log2=mer_blocks_log2)
                _lbl(dec, "skip_flag")
                if dec.decode_bin(ctx_id("SkipFlag")):
                    _lbl(dec, "merge_idx")
                    mvs[by, bx] = mcands[decode_merge_idx(dec)]
                    if hist is not None:
                        hist.push(mvs[by, bx])
                    continue
                _lbl(dec, "merge_flag")
                if dec.decode_bin(ctx_id("MergeFlag")):
                    _lbl(dec, "merge_idx")
                    mvs[by, bx] = mcands[decode_merge_idx(dec)]
                    for comp, lev, size in (("y", lev_y, s), ("u", lev_u, sc),
                                            ("v", lev_v, sc)):
                        _lbl(dec, "cbf")
                        if dec.decode_bin(
                                ctx_id("QtCbf",
                                       {"y": 0, "u": 4, "v": 5}[comp])):
                            _lbl(dec, "residual_" + comp)
                            lev[by, bx] = coeffs_decode(dec, size, size,
                                                        chroma=(comp != "y"))
                    if hist is not None:
                        hist.push(mvs[by, bx])
                    continue
            if use_tmvp:
                cands = amvp_list(mvs, by, bx, col, hist)
            else:
                cands = [mvp_median(mvs, by, bx)]
            if (not use_merge
                    and (_lbl(dec, "skip_flag")
                         or dec.decode_bin(ctx_id("SkipFlag")))):
                mvs[by, bx] = cands[0]
            else:
                idx = 0
                if use_tmvp:
                    _lbl(dec, "mvp_idx")
                    idx = dec.decode_bin(ctx_id("MvpIdx"))
                sh = 0
                if use_amvr:
                    _lbl(dec, "amvr_mode")
                    m = 0
                    if dec.decode_bin(ctx_id("Amvr", 0)):
                        m = 1 + dec.decode_bin(ctx_id("Amvr", 1))
                    sh = AMVR_SHIFTS[m]
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec), decode_mvd_comp(dec)],
                               dtype=np.int64)
                if use_amvr:
                    mvs[by, bx] = (round_mv_amvr(cands[idx], sh)
                                   + (mvd << sh))
                else:
                    mvs[by, bx] = cands[idx] + mvd
                for comp, lev, size in (("y", lev_y, s), ("u", lev_u, sc),
                                        ("v", lev_v, sc)):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(
                            ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])):
                        _lbl(dec, "residual_" + comp)
                        lev[by, bx] = coeffs_decode(dec, size, size,
                                                    chroma=(comp != "y"))
            if hist is not None:
                hist.push(mvs[by, bx])
    return mvs, lev_y, lev_u, lev_v


def decode_p_slice_2ref(data: bytes, nby: int, nbx: int, s: int,
                        stats=None, col_mvs: np.ndarray | None = None,
                        use_tmvp: bool = False, use_amvr: bool = False,
                        mer_blocks_log2: int = 0):
    """Exact inverse of encoder.inter_coder.encode_p_slice_2ref.  Returns
    (ref_idx, mvs, lev_y, lev_u, lev_v)."""
    from ..common.inter_frame import AMVR_SHIFTS, round_mv_amvr
    from ..encoder.inter_coder import merge_candidates_ref
    dec = _make(data, stats)
    sc = s // 2
    ref_idx = np.zeros((nby, nbx), dtype=np.int32)
    mvs = np.zeros((nby, nbx, 2), dtype=np.int64)
    lev_y = np.zeros((nby, nbx, s, s), dtype=np.int32)
    lev_u = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    lev_v = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    hist = HmvpList() if use_tmvp else None
    for by in range(nby):
        for bx in range(nbx):
            col = (col_mvs[by, bx]
                   if (use_tmvp and col_mvs is not None) else None)
            mcands = merge_candidates_ref(ref_idx, mvs, by, bx, col, hist,
                                          mer_blocks_log2=mer_blocks_log2)
            _lbl(dec, "skip_flag")
            skip = bool(dec.decode_bin(ctx_id("SkipFlag")))
            mrg = skip
            if not skip:
                _lbl(dec, "merge_flag")
                mrg = bool(dec.decode_bin(ctx_id("MergeFlag")))
            if mrg:
                _lbl(dec, "merge_idx")
                r, mv = mcands[decode_merge_idx(dec)]
                ref_idx[by, bx] = r
                mvs[by, bx] = mv
            else:
                _lbl(dec, "ref_idx")
                ref_idx[by, bx] = dec.decode_bin(ctx_id("RefPic", 0))
                if use_tmvp:
                    cands = amvp_list(mvs, by, bx, col, hist)
                    _lbl(dec, "mvp_idx")
                    idx = dec.decode_bin(ctx_id("MvpIdx"))
                else:
                    cands = [mvp_median(mvs, by, bx)]
                    idx = 0
                sh = 0
                if use_amvr:
                    _lbl(dec, "amvr_mode")
                    m = 0
                    if dec.decode_bin(ctx_id("Amvr", 0)):
                        m = 1 + dec.decode_bin(ctx_id("Amvr", 1))
                    sh = AMVR_SHIFTS[m]
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec), decode_mvd_comp(dec)],
                               dtype=np.int64)
                if use_amvr:
                    mvs[by, bx] = (round_mv_amvr(cands[idx], sh)
                                   + (mvd << sh))
                else:
                    mvs[by, bx] = cands[idx] + mvd
            if not skip:
                for comp, lev, size in (("y", lev_y, s), ("u", lev_u, sc),
                                        ("v", lev_v, sc)):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(
                            ctx_id("QtCbf", {"y": 0, "u": 4, "v": 5}[comp])):
                        _lbl(dec, "residual_" + comp)
                        lev[by, bx] = coeffs_decode(dec, size, size,
                                                    chroma=(comp != "y"))
            if hist is not None:
                hist.push(mvs[by, bx])
    return ref_idx, mvs, lev_y, lev_u, lev_v


# ---------------------------------------------------------------- MTT

def _parse_split_syntax(dec, d, s, u):
    """Inverse of encoder._code_split_syntax.  Returns the split code."""
    from ..common import mtt as mtt_mod
    _lbl(dec, "split_flag")
    if not dec.decode_bin(ctx_id("SplitFlag", min(d, 8))):
        return mtt_mod.LEAF
    _lbl(dec, "split_qt_flag")
    if dec.decode_bin(ctx_id("QtSplitFlag", min(d, 2))):
        return mtt_mod.QUAD
    bt_ok = mtt_mod.bt_allowed(s, u)
    tt_ok = mtt_mod.tt_allowed(s, u)
    if bt_ok and tt_ok:
        _lbl(dec, "mtt_binary_flag")
        bt = bool(dec.decode_bin(ctx_id("BtFlag", min(d, 2))))
    else:
        bt = bt_ok
    _lbl(dec, "mtt_vertical_flag")
    vert = bool(dec.decode_bin(ctx_id("MttVert", min(d, 2))))
    if bt:
        return mtt_mod.BTV if vert else mtt_mod.BTH
    return mtt_mod.TTV if vert else mtt_mod.TTH


def _alloc_mtt_levels(h, w, top, depth):
    """Level grids for every shape of the lattice (zeros; filled while
    parsing).  Returns (sq_levels list, rect_levels dict, shapes)."""
    from ..common import mtt as mtt_mod
    sizes = [top >> d for d in range(depth + 1)]
    sq = []
    for s in sizes:
        ny, nx = h // s, w // s
        sq.append((np.zeros((ny, nx, s, s), dtype=np.int32),
                   np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32),
                   np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32)))
    shapes = mtt_mod.rect_shapes(top, depth)
    rect = {}
    for (kind, d, sy, sx, y_off, x_off) in shapes:
        gy = (h - 2 * y_off) // sy
        gx = (w - 2 * x_off) // sx
        rect[(kind, d)] = (
            np.zeros((gy, gx, sy, sx), dtype=np.int32),
            np.zeros((gy, gx, sy // 2, sx // 2), dtype=np.int32),
            np.zeros((gy, gx, sy // 2, sx // 2), dtype=np.int32))
    return sq, rect, shapes


def decode_p_slice_mtt(data: bytes, h: int, w: int, top: int, depth: int,
                       stats=None, use_merge: bool = False):
    """Exact inverse of encoder.inter_coder.encode_p_slice_mtt.  Returns
    (mv_unit, sq_levels, rect_levels, has_resid_unit, leaf_id_unit)."""
    from ..common import mtt as mtt_mod
    from ..encoder.inter_coder import mtt_child_entries, mvp_unit_grid_rect
    dec = _make(data, stats)
    u = top >> depth
    nuy, nux = h // u, w // u
    nty, ntx = h // top, w // top
    sq_levels, rect_levels, shapes = _alloc_mtt_levels(h, w, top, depth)
    shapes_d = {(i[0], i[1]): i for i in shapes}
    coded = np.zeros((nuy, nux, 2), dtype=np.int64)
    avail = np.zeros((nuy, nux), dtype=bool)
    has_resid = np.zeros((nuy, nux), dtype=bool)
    leaf_id = np.zeros((nuy, nux), dtype=np.int32)

    from ..encoder.inter_coder import merge_candidates_unit

    def parse_leaf_span(levs, uy, ux, ky, kx, sy, sx):
        pred = mvp_unit_grid_rect(coded, avail, uy, ux, kx)
        skip = False
        if use_merge:
            cands = merge_candidates_unit(coded, avail, uy, ux, kx)
            _lbl(dec, "skip_flag")
            skip = bool(dec.decode_bin(ctx_id("SkipFlag")))
            mrg = skip
            if not skip:
                _lbl(dec, "merge_flag")
                mrg = bool(dec.decode_bin(ctx_id("MergeFlag")))
            if mrg:
                _lbl(dec, "merge_idx")
                mv = np.asarray(cands[decode_merge_idx(dec)], np.int64)
            else:
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec),
                                decode_mvd_comp(dec)], dtype=np.int64)
                mv = pred + mvd
            if not skip:
                hr = False
                for ci in range(3):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                        _lbl(dec, "residual_" + "yuv"[ci])
                        zy = sy if ci == 0 else sy // 2
                        zx = sx if ci == 0 else sx // 2
                        levs[ci][...] = coeffs_decode(dec, zy, zx,
                                                      chroma=(ci != 0))
                        hr = True
                has_resid[uy:uy + ky, ux:ux + kx] = hr
        else:
            _lbl(dec, "skip_flag")
            if dec.decode_bin(ctx_id("SkipFlag")):
                mv = pred
            else:
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec),
                                decode_mvd_comp(dec)], dtype=np.int64)
                mv = pred + mvd
                hr = False
                for ci in range(3):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                        _lbl(dec, "residual_" + "yuv"[ci])
                        zy = sy if ci == 0 else sy // 2
                        zx = sx if ci == 0 else sx // 2
                        levs[ci][...] = coeffs_decode(dec, zy, zx,
                                                      chroma=(ci != 0))
                        hr = True
                has_resid[uy:uy + ky, ux:ux + kx] = hr
        coded[uy:uy + ky, ux:ux + kx] = mv
        avail[uy:uy + ky, ux:ux + kx] = True
        leaf_id[uy:uy + ky, ux:ux + kx] = uy * nux + ux

    def parse_node(d, by, bx):
        s = top >> d
        if d < depth:
            code = _parse_split_syntax(dec, d, s, u)
            if code == mtt_mod.QUAD:
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    parse_node(d + 1, 2 * by + dy, 2 * bx + dx)
                return
            if code != mtt_mod.LEAF:
                for (kind, gy, gx) in mtt_child_entries(code, by, bx):
                    info = shapes_d[(kind, d)]
                    _, _, sy, sx, y_off, x_off = info
                    uy = (gy * sy + y_off) // u
                    ux = (gx * sx + x_off) // u
                    levs = tuple(rect_levels[(kind, d)][c][gy, gx]
                                 for c in range(3))
                    parse_leaf_span(levs, uy, ux, sy // u, sx // u, sy, sx)
                return
        k = s // u
        levs = tuple(sq_levels[d][c][by, bx] for c in range(3))
        parse_leaf_span(levs, by * k, bx * k, k, k, s, s)

    for by in range(nty):
        for bx in range(ntx):
            parse_node(0, by, bx)
    return coded, sq_levels, rect_levels, has_resid, leaf_id


def decode_b_slice_mtt(data: bytes, h: int, w: int, top: int, depth: int,
                       stats=None, use_merge: bool = False):
    """Exact inverse of encoder.inter_coder.encode_b_slice_mtt.  Returns
    (mv0_unit, mv1_unit, dirs_unit, sq_levels, rect_levels,
    has_resid_unit, leaf_id_unit)."""
    from ..common import mtt as mtt_mod
    from ..encoder.inter_coder import mtt_child_entries, mvp_unit_grid_rect
    dec = _make(data, stats)
    u = top >> depth
    nuy, nux = h // u, w // u
    nty, ntx = h // top, w // top
    sq_levels, rect_levels, shapes = _alloc_mtt_levels(h, w, top, depth)
    shapes_d = {(i[0], i[1]): i for i in shapes}
    coded0 = np.zeros((nuy, nux, 2), dtype=np.int64)
    coded1 = np.zeros((nuy, nux, 2), dtype=np.int64)
    dirs_u = np.zeros((nuy, nux), dtype=np.int32)
    avail = np.zeros((nuy, nux), dtype=bool)
    has_resid = np.zeros((nuy, nux), dtype=bool)
    leaf_id = np.zeros((nuy, nux), dtype=np.int32)

    from ..encoder.inter_coder import merge_candidates_unit_b

    def parse_leaf_span(levs, uy, ux, ky, kx, sy, sx):
        pred0 = mvp_unit_grid_rect(coded0, avail, uy, ux, kx)
        pred1 = mvp_unit_grid_rect(coded1, avail, uy, ux, kx)
        d_pred = (int(dirs_u[uy, ux - 1]) if ux > 0 and avail[uy, ux - 1]
                  else int(dirs_u[uy - 1, ux])
                  if uy > 0 and avail[uy - 1, ux] else 0)
        if use_merge:
            cands = merge_candidates_unit_b(coded0, coded1, dirs_u, avail,
                                            uy, ux, kx)
            _lbl(dec, "skip_flag")
            skip = bool(dec.decode_bin(ctx_id("SkipFlag")))
            mrg = skip
            if not skip:
                _lbl(dec, "merge_flag")
                mrg = bool(dec.decode_bin(ctx_id("MergeFlag")))
            if mrg:
                _lbl(dec, "merge_idx")
                dv, m0, m1 = cands[decode_merge_idx(dec)]
                mv0 = np.asarray(m0, np.int64)
                mv1 = np.asarray(m1, np.int64)
            else:
                if dec.decode_bin(ctx_id("InterDir", 0)):
                    dv = 2
                else:
                    dv = dec.decode_bin(ctx_id("InterDir", 1))
                mv0, mv1 = pred0, pred1
                if dv != 1:
                    mv0 = pred0 + np.array([decode_mvd_comp(dec),
                                            decode_mvd_comp(dec)],
                                           dtype=np.int64)
                if dv != 0:
                    mv1 = pred1 + np.array([decode_mvd_comp(dec),
                                            decode_mvd_comp(dec)],
                                           dtype=np.int64)
            if not skip:
                hr = False
                for ci in range(3):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                        _lbl(dec, "residual_" + "yuv"[ci])
                        zy = sy if ci == 0 else sy // 2
                        zx = sx if ci == 0 else sx // 2
                        levs[ci][...] = coeffs_decode(dec, zy, zx,
                                                      chroma=(ci != 0))
                        hr = True
                has_resid[uy:uy + ky, ux:ux + kx] = hr
            coded0[uy:uy + ky, ux:ux + kx] = mv0
            coded1[uy:uy + ky, ux:ux + kx] = mv1
            dirs_u[uy:uy + ky, ux:ux + kx] = dv
            avail[uy:uy + ky, ux:ux + kx] = True
            leaf_id[uy:uy + ky, ux:ux + kx] = uy * nux + ux
            return
        _lbl(dec, "skip_flag")
        if dec.decode_bin(ctx_id("SkipFlag")):
            dv, mv0, mv1 = d_pred, pred0, pred1
        else:
            if dec.decode_bin(ctx_id("InterDir", 0)):
                dv = 2
            else:
                dv = dec.decode_bin(ctx_id("InterDir", 1))
            mv0, mv1 = pred0, pred1
            if dv != 1:
                mv0 = pred0 + np.array([decode_mvd_comp(dec),
                                        decode_mvd_comp(dec)],
                                       dtype=np.int64)
            if dv != 0:
                mv1 = pred1 + np.array([decode_mvd_comp(dec),
                                        decode_mvd_comp(dec)],
                                       dtype=np.int64)
            hr = False
            for ci in range(3):
                _lbl(dec, "cbf")
                if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                    _lbl(dec, "residual_" + "yuv"[ci])
                    zy = sy if ci == 0 else sy // 2
                    zx = sx if ci == 0 else sx // 2
                    levs[ci][...] = coeffs_decode(dec, zy, zx,
                                                  chroma=(ci != 0))
                    hr = True
            has_resid[uy:uy + ky, ux:ux + kx] = hr
        coded0[uy:uy + ky, ux:ux + kx] = mv0
        coded1[uy:uy + ky, ux:ux + kx] = mv1
        dirs_u[uy:uy + ky, ux:ux + kx] = dv
        avail[uy:uy + ky, ux:ux + kx] = True
        leaf_id[uy:uy + ky, ux:ux + kx] = uy * nux + ux

    def parse_node(d, by, bx):
        s = top >> d
        if d < depth:
            code = _parse_split_syntax(dec, d, s, u)
            if code == mtt_mod.QUAD:
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    parse_node(d + 1, 2 * by + dy, 2 * bx + dx)
                return
            if code != mtt_mod.LEAF:
                for (kind, gy, gx) in mtt_child_entries(code, by, bx):
                    info = shapes_d[(kind, d)]
                    _, _, sy, sx, y_off, x_off = info
                    uy = (gy * sy + y_off) // u
                    ux = (gx * sx + x_off) // u
                    levs = tuple(rect_levels[(kind, d)][c][gy, gx]
                                 for c in range(3))
                    parse_leaf_span(levs, uy, ux, sy // u, sx // u, sy, sx)
                return
        k = s // u
        levs = tuple(sq_levels[d][c][by, bx] for c in range(3))
        parse_leaf_span(levs, by * k, bx * k, k, k, s, s)

    for by in range(nty):
        for bx in range(ntx):
            parse_node(0, by, bx)
    return (coded0, coded1, dirs_u, sq_levels, rect_levels, has_resid,
            leaf_id)


def decode_p_slice_qt_mm(data: bytes, h: int, w: int, top: int,
                         depth: int, n_active: int, stats=None):
    """Exact inverse of encoder.inter_coder.encode_p_slice_qt_mm (the
    merge-aware leaf syntax: skip(=merge+no-residual) / merge /
    motion_model+mvd, then cbf+coeffs; candidates on the causal unit
    grid via merge_candidates_qt_mm).  Returns (midx_unit, mv_unit,
    levels [per size (ly,lu,lv)], has_resid_unit, leaf_id_unit)."""
    from ..encoder.inter_coder import (merge_candidates_qt_mm,
                                       mvp_unit_grid_mm)
    dec = _make(data, stats)
    u = top >> depth
    nuy, nux = h // u, w // u
    nty, ntx = h // top, w // top
    sizes = [top >> d for d in range(depth + 1)]
    levels = []
    for s in sizes:
        ny, nx = h // s, w // s
        levels.append((np.zeros((ny, nx, s, s), dtype=np.int32),
                       np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32),
                       np.zeros((ny, nx, s // 2, s // 2), dtype=np.int32)))
    coded = np.zeros((nuy, nux, 2), dtype=np.int64)
    models_u = np.zeros((nuy, nux), dtype=np.int32)
    avail = np.zeros((nuy, nux), dtype=bool)
    has_resid = np.zeros((nuy, nux), dtype=bool)
    leaf_id = np.zeros((nuy, nux), dtype=np.int32)

    def parse_resid(d, by, bx, s):
        hr = False
        for ci, lev in enumerate(levels[d]):
            _lbl(dec, "cbf")
            if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                _lbl(dec, "residual_" + "yuv"[ci])
                sz = s if ci == 0 else s // 2
                lev[by, bx] = coeffs_decode(dec, sz, sz,
                                            chroma=(ci != 0))
                hr = True
        return hr

    def parse_leaf(d, by, bx):
        s = sizes[d]
        k = s // u
        uy, ux = by * k, bx * k
        hr = False
        _lbl(dec, "skip_flag")
        if dec.decode_bin(ctx_id("SkipFlag")):
            cands = merge_candidates_qt_mm(models_u, coded, avail, uy, ux,
                                           k)
            _lbl(dec, "merge_idx")
            midx, mv = cands[decode_merge_idx(dec)]
            mv = np.asarray(mv, dtype=np.int64)
        else:
            _lbl(dec, "merge_flag")
            if dec.decode_bin(ctx_id("MergeFlag")):
                cands = merge_candidates_qt_mm(models_u, coded, avail, uy,
                                               ux, k)
                _lbl(dec, "merge_idx")
                midx, mv = cands[decode_merge_idx(dec)]
                mv = np.asarray(mv, dtype=np.int64)
            else:
                _lbl(dec, "motion_model")
                midx = decode_motion_model(dec, n_active)
                pred = mvp_unit_grid_mm(coded, models_u, avail, uy, ux, k,
                                        midx)
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec),
                                decode_mvd_comp(dec)], dtype=np.int64)
                mv = pred + mvd
            hr = parse_resid(d, by, bx, s)
        has_resid[uy:uy + k, ux:ux + k] = hr
        coded[uy:uy + k, ux:ux + k] = mv
        models_u[uy:uy + k, ux:ux + k] = midx
        avail[uy:uy + k, ux:ux + k] = True
        leaf_id[uy:uy + k, ux:ux + k] = uy * nux + ux

    def parse_node(d, by, bx):
        if d < depth:
            _lbl(dec, "split_flag")
            if dec.decode_bin(ctx_id("SplitFlag", min(d, 8))):
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    parse_node(d + 1, 2 * by + dy, 2 * bx + dx)
                return
        parse_leaf(d, by, bx)

    for by in range(nty):
        for bx in range(ntx):
            parse_node(0, by, bx)
    return models_u, coded, levels, has_resid, leaf_id


def decode_b_slice_mm(data: bytes, nby: int, nbx: int, s: int,
                      active_models: list[int], conv=None, epipole0=None,
                      epipole1=None, stats=None, use_merge: bool = False,
                      mer_blocks_log2: int = 0):
    """Exact inverse of encoder.inter_coder.encode_b_slice_mm.  Returns
    (model_idx0, model_idx1, mv0, mv1, dirs, lev_y, lev_u, lev_v) — mv
    grids carry the selected model's MV per block."""
    from ..encoder.inter_coder import (_mm_mvp, inherited_model,
                                       merge_candidates_b_mm)
    dec = _make(data, stats)
    sc = s // 2
    n_active = len(active_models)
    midx0 = np.zeros((nby, nbx), dtype=np.int32)
    midx1 = np.zeros((nby, nbx), dtype=np.int32)
    models0 = np.zeros((nby, nbx), dtype=np.int32)
    models1 = np.zeros((nby, nbx), dtype=np.int32)
    mv0 = np.zeros((nby, nbx, 2), dtype=np.int64)
    mv1 = np.zeros((nby, nbx, 2), dtype=np.int64)
    dirs = np.zeros((nby, nbx), dtype=np.int32)
    lev_y = np.zeros((nby, nbx, s, s), dtype=np.int32)
    lev_u = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    lev_v = np.zeros((nby, nbx, sc, sc), dtype=np.int32)
    model_to_idx = {m: i for i, m in enumerate(active_models)}
    if use_merge:
        for by in range(nby):
            for bx in range(nbx):
                mcands = merge_candidates_b_mm(
                    dirs, midx0, mv0, midx1, mv1, by, bx,
                    mer_blocks_log2=mer_blocks_log2)

                def apply_cand(c):
                    d, (i0, m0), (i1, m1) = c
                    dirs[by, bx] = d
                    midx0[by, bx] = i0
                    models0[by, bx] = active_models[i0]
                    mv0[by, bx] = m0
                    midx1[by, bx] = i1
                    models1[by, bx] = active_models[i1]
                    mv1[by, bx] = m1
                    _unused_override(d)

                def _unused_override(d):
                    # unused lists take the inherited model + its MVP
                    # (select_merge_b_mm / encode_b_slice_mm convention)
                    if d == 1:
                        inh0 = inherited_model(models0, by, bx)
                        models0[by, bx] = inh0
                        midx0[by, bx] = model_to_idx[inh0]
                        mv0[by, bx] = _mm_mvp(mv0, models0, by, bx, inh0,
                                              s, conv, epipole0)
                    if d == 0:
                        inh1 = inherited_model(models1, by, bx)
                        models1[by, bx] = inh1
                        midx1[by, bx] = model_to_idx[inh1]
                        mv1[by, bx] = _mm_mvp(mv1, models1, by, bx, inh1,
                                              s, conv, epipole1)

                _lbl(dec, "skip_flag")
                skip = bool(dec.decode_bin(ctx_id("SkipFlag")))
                mrg = skip
                if not skip:
                    _lbl(dec, "merge_flag")
                    mrg = bool(dec.decode_bin(ctx_id("MergeFlag")))
                if mrg:
                    _lbl(dec, "merge_idx")
                    apply_cand(mcands[decode_merge_idx(dec)])
                    if skip:
                        continue
                else:
                    if dec.decode_bin(ctx_id("InterDir", 0)):
                        d = 2
                    else:
                        d = dec.decode_bin(ctx_id("InterDir", 1))
                    dirs[by, bx] = d
                    if d != 1:
                        _lbl(dec, "motion_model")
                        mi = decode_motion_model(dec, n_active)
                        midx0[by, bx] = mi
                        models0[by, bx] = active_models[mi]
                        _lbl(dec, "mvd")
                        mvd = np.array([decode_mvd_comp(dec),
                                        decode_mvd_comp(dec)], np.int64)
                        p = _mm_mvp(mv0, models0, by, bx,
                                    active_models[mi], s, conv, epipole0)
                        mv0[by, bx] = p + mvd
                    if d != 0:
                        _lbl(dec, "motion_model")
                        mi = decode_motion_model(dec, n_active)
                        midx1[by, bx] = mi
                        models1[by, bx] = active_models[mi]
                        _lbl(dec, "mvd")
                        mvd = np.array([decode_mvd_comp(dec),
                                        decode_mvd_comp(dec)], np.int64)
                        p = _mm_mvp(mv1, models1, by, bx,
                                    active_models[mi], s, conv, epipole1)
                        mv1[by, bx] = p + mvd
                    _unused_override(d)
                for ci, (lev, size) in enumerate(((lev_y, s), (lev_u, sc),
                                                 (lev_v, sc))):
                    _lbl(dec, "cbf")
                    if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                        _lbl(dec, "residual_" + "yuv"[ci])
                        lev[by, bx] = coeffs_decode(dec, size, size,
                                                    chroma=(ci != 0))
        return midx0, midx1, mv0, mv1, dirs, lev_y, lev_u, lev_v
    for by in range(nby):
        for bx in range(nbx):
            d_pred = (int(dirs[by, bx - 1]) if bx > 0
                      else int(dirs[by - 1, bx]) if by > 0 else 0)
            inh0 = inherited_model(models0, by, bx)
            inh1 = inherited_model(models1, by, bx)
            _lbl(dec, "skip_flag")
            if dec.decode_bin(ctx_id("SkipFlag")):
                d = d_pred
                dirs[by, bx] = d
                models0[by, bx] = inh0
                midx0[by, bx] = model_to_idx[inh0]
                mv0[by, bx] = _mm_mvp(mv0, models0, by, bx, inh0, s,
                                      conv, epipole0)
                models1[by, bx] = inh1
                midx1[by, bx] = model_to_idx[inh1]
                mv1[by, bx] = _mm_mvp(mv1, models1, by, bx, inh1, s,
                                      conv, epipole1)
                continue
            if dec.decode_bin(ctx_id("InterDir", 0)):
                d = 2
            else:
                d = dec.decode_bin(ctx_id("InterDir", 1))
            dirs[by, bx] = d
            if d != 1:
                _lbl(dec, "motion_model")
                mi = decode_motion_model(dec, n_active)
                midx0[by, bx] = mi
                models0[by, bx] = active_models[mi]
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec),
                                decode_mvd_comp(dec)], dtype=np.int64)
                p = _mm_mvp(mv0, models0, by, bx, active_models[mi], s,
                            conv, epipole0)
                mv0[by, bx] = p + mvd
            if d != 0:
                _lbl(dec, "motion_model")
                mi = decode_motion_model(dec, n_active)
                midx1[by, bx] = mi
                models1[by, bx] = active_models[mi]
                _lbl(dec, "mvd")
                mvd = np.array([decode_mvd_comp(dec),
                                decode_mvd_comp(dec)], dtype=np.int64)
                p = _mm_mvp(mv1, models1, by, bx, active_models[mi], s,
                            conv, epipole1)
                mv1[by, bx] = p + mvd
            for ci, (lev, size) in enumerate(((lev_y, s), (lev_u, sc),
                                             (lev_v, sc))):
                _lbl(dec, "cbf")
                if dec.decode_bin(ctx_id("QtCbf", (0, 4, 5)[ci])):
                    _lbl(dec, "residual_" + "yuv"[ci])
                    lev[by, bx] = coeffs_decode(dec, size, size,
                                                chroma=(ci != 0))
            # unused-list entries: inherited model + its MVP (mirrors the
            # encoder's grid evolution)
            if d == 1:
                models0[by, bx] = inh0
                midx0[by, bx] = model_to_idx[inh0]
                mv0[by, bx] = _mm_mvp(mv0, models0, by, bx, inh0, s,
                                      conv, epipole0)
            if d == 0:
                models1[by, bx] = inh1
                midx1[by, bx] = model_to_idx[inh1]
                mv1[by, bx] = _mm_mvp(mv1, models1, by, bx, inh1, s,
                                      conv, epipole1)
    return midx0, midx1, mv0, mv1, dirs, lev_y, lev_u, lev_v


def _parse_wpp_frame(data: bytes):
    """Inverse of encoder framing: u16 count, u32 lengths, streams."""
    n = int.from_bytes(data[0:2], "big")
    lens = [int.from_bytes(data[2 + 4 * i:6 + 4 * i], "big")
            for i in range(n)]
    off = 2 + 4 * n
    subs = []
    for ln in lens:
        subs.append(data[off:off + ln])
        off += ln
    return subs


def decode_p_slice_wpp(data: bytes, nby: int, nbx: int, s: int,
                       stats=None, col_mvs=None, use_tmvp=False,
                       use_amvr=False, use_merge=False,
                       mer_blocks_log2: int = 0):
    """Inter WPP parse: one independently decodable substream per row
    group (fresh contexts + HMVP), shared syntax-level grid evolution."""
    subs = _parse_wpp_frame(data)
    n = len(subs)
    bounds = [round(i * nby / n) for i in range(n + 1)]
    sc = s // 2
    state = (np.zeros((nby, nbx, 2), np.int64),
             np.zeros((nby, nbx, s, s), np.int32),
             np.zeros((nby, nbx, sc, sc), np.int32),
             np.zeros((nby, nbx, sc, sc), np.int32))
    for i, sub in enumerate(subs):
        decode_p_slice(sub, nby, nbx, s, stats=stats, col_mvs=col_mvs,
                       use_tmvp=use_tmvp, use_amvr=use_amvr,
                       use_merge=use_merge,
                       mer_blocks_log2=mer_blocks_log2,
                       rows=(bounds[i], bounds[i + 1]), state=state)
    return state


def decode_b_slice_wpp(data: bytes, nby: int, nbx: int, s: int,
                       stats=None, use_gpm=False, use_ciip=False,
                       use_merge=False, mer_blocks_log2: int = 0):
    """Inter WPP parse for B slices."""
    subs = _parse_wpp_frame(data)
    n = len(subs)
    bounds = [round(i * nby / n) for i in range(n + 1)]
    sc = s // 2
    state = (np.zeros((nby, nbx, 2), np.int64),
             np.zeros((nby, nbx, 2), np.int64),
             np.zeros((nby, nbx), np.int32),
             np.zeros((nby, nbx), np.int32),
             np.zeros((nby, nbx, s, s), np.int32),
             np.zeros((nby, nbx, sc, sc), np.int32),
             np.zeros((nby, nbx, sc, sc), np.int32))
    for i, sub in enumerate(subs):
        decode_b_slice(sub, nby, nbx, s, stats=stats, use_gpm=use_gpm,
                       use_ciip=use_ciip, use_merge=use_merge,
                       mer_blocks_log2=mer_blocks_log2,
                       rows=(bounds[i], bounds[i + 1]), state=state)
    return state
