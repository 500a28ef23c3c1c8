"""Batched P-frame codec: motion compensation + residual reconstruction.

TPU-native analog of the reference inter path (reference:
source/Lib/CommonLib/InterPrediction.cpp — motionCompensation:1681,
xPredInterBlk:928; EncoderLib/InterSearch.cpp predInterSearch:2695;
DecoderLib/DecCu.cpp reconstruction).

Architecture: unlike intra, inter blocks of a frame have *no* mutual
dependency (prediction reads only the reference picture), so the whole
frame is one batched step — gather all block patches, filter, transform,
reconstruct; no wavefront needed.  Encoder and decoder share
`reconstruct_p_frame` (same math -> bit-exact recon, the decoded-picture-
hash oracle of SURVEY.md §4.1).

Round-1 scope: uniform SxS luma blocks, one reference (low-delay P),
per-block skip.  B-frames/bi-prediction ride the same machinery with a
second MC pass + finalize_bi.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import interp, quant, transforms
from ..encoder import me as me_mod

MC_MARGIN = 80     # ref padding: search range + filter taps + slack


def pad_ref(plane: jnp.ndarray, margin: int = MC_MARGIN,
            wrap_around: bool = False) -> jnp.ndarray:
    """Edge-extend a reconstructed plane for MC.  With `wrap_around`, the
    horizontal padding wraps (ERP 360 content; reference: Picture.cpp:94
    PIC_RECON_WRAP + Mv.cpp:113 wrapClipMv)."""
    if wrap_around:
        w = plane.shape[1]
        xs = jnp.mod(jnp.arange(-margin, w + margin), w)
        p = plane[:, xs]      # modular gather: correct even for margin > W
    else:
        p = jnp.pad(plane, ((0, 0), (margin, margin)), mode="edge")
    return jnp.pad(p, ((margin, margin), (0, 0)), mode="edge")


def _to_blocks(plane: jnp.ndarray, s: int) -> jnp.ndarray:
    h, w = plane.shape
    return (plane.reshape(h // s, s, w // s, s).transpose(0, 2, 1, 3)
            .reshape(-1, s, s))


def _from_blocks(blocks: jnp.ndarray, nby: int, nbx: int) -> jnp.ndarray:
    s = blocks.shape[-1]
    return (blocks.reshape(nby, nbx, s, s).transpose(0, 2, 1, 3)
            .reshape(nby * s, nbx * s))


def _block_coords(nby: int, nbx: int, s: int):
    idx = jnp.arange(nby * nbx, dtype=jnp.int32)
    return (idx // nbx) * s, (idx % nbx) * s


def mc_predict(ref_y: jnp.ndarray, ref_u: jnp.ndarray, ref_v: jnp.ndarray,
               mvs: jnp.ndarray, s: int, bit_depth: int,
               wrap_around: bool = False):
    """Motion-compensated prediction of the full frame from padded refs.

    Args:
      ref_*: unpadded reconstructed reference planes.
      mvs: (nby, nbx, 2) 1/16-pel MVs.
    Returns (pred_y, pred_u, pred_v) pixel-domain planes."""
    h, w = ref_y.shape
    nby, nbx = h // s, w // s
    sc = s // 2
    mv = mvs.reshape(-1, 2)
    ry = pad_ref(ref_y, MC_MARGIN, wrap_around)
    ru = pad_ref(ref_u, MC_MARGIN // 2, wrap_around)
    rv = pad_ref(ref_v, MC_MARGIN // 2, wrap_around)

    yb, xb = _block_coords(nby, nbx, s)
    py = interp.finalize_uni(
        interp.mc_luma(ry, mv, yb, xb, s, s, MC_MARGIN, bit_depth), bit_depth)
    ybc, xbc = _block_coords(nby, nbx, sc)
    pu = interp.finalize_uni(
        interp.mc_chroma(ru, mv, ybc, xbc, sc, sc, MC_MARGIN // 2, bit_depth),
        bit_depth)
    pv = interp.finalize_uni(
        interp.mc_chroma(rv, mv, ybc, xbc, sc, sc, MC_MARGIN // 2, bit_depth),
        bit_depth)
    return (_from_blocks(py, nby, nbx), _from_blocks(pu, nby, nbx),
            _from_blocks(pv, nby, nbx))


AMVR_SHIFTS = (2, 4, 6)    # 1/16-pel grid shifts: quarter-, full-, 4-pel
                           # (reference: IMV modes 0/1/2, TypeDef.h IMV_FPEL
                           # /IMV_4PEL; EncCu.cpp:775-782 IMV mode loop)


def mcts_clamp_mvs(mvs: jnp.ndarray, block_size: int, width: int,
                   height: int, tile_cols: int, tile_rows: int
                   ) -> jnp.ndarray:
    """Motion-constrained tile sets: clamp every block's MV so the full
    interpolation support (8-tap: 3 left / 4 right of the integer sample)
    stays inside the block's own tile (reference: MCTS.{cpp,h} —
    MCTSInfo::clipMvToArea; SURVEY.md §2.8 maps MCTS to shard-local motion
    so tiles stay independently decodable/extractable).

    Encoder-side only — the decoder needs no change (signaled MVs simply
    satisfy the constraint).  Bounds are rounded inward to the 4-pel grid
    (multiples of 64 in 1/16-pel units) so a later AMVR rounding can never
    push a clamped MV back out of the tile."""
    s = block_size
    nby, nbx = height // s, width // s
    tw, th = width // tile_cols, height // tile_rows
    bx = jnp.arange(nbx, dtype=jnp.int32) * s
    by = jnp.arange(nby, dtype=jnp.int32) * s
    tx0 = (bx // tw) * tw
    ty0 = (by // th) * th
    # support: [pos - 3, pos + s + 4) must stay in [t0, t0 + extent)
    def bounds(b, t0, extent):
        lo = (t0 - b + 3) * 16
        hi = (t0 + extent - s - 4 - b) * 16
        lo = ((lo + 63) // 64) * 64      # round inward to the 4-pel grid
        hi = (hi // 64) * 64
        return lo, jnp.maximum(hi, lo)
    lo_x, hi_x = bounds(bx, tx0, tw)
    lo_y, hi_y = bounds(by, ty0, th)
    mx = jnp.clip(mvs[..., 0], lo_x[None, :], hi_x[None, :])
    my = jnp.clip(mvs[..., 1], lo_y[:, None], hi_y[:, None])
    return jnp.stack([mx, my], axis=-1)


def round_mv_amvr(mv, shift: int):
    """Round a 1/16-pel MV (int array/scalar) to the AMVR grid — round
    half away from zero, shared enc/dec (reference: Mv::roundToAmvrSignalPrec
    via roundAffinePrecInternal2Amvr)."""
    if shift == 0:
        return mv
    off = 1 << (shift - 1)
    neg = (mv < 0)
    if isinstance(mv, np.ndarray) or np.isscalar(mv):
        return ((mv + off - neg) >> shift) << shift
    return ((mv + off - neg.astype(mv.dtype)) >> shift) << shift


@functools.partial(jax.jit, static_argnames=("block_size", "bit_depth",
                                             "lam_bits_x16"))
def amvr_decide(orig_y: jnp.ndarray, ref_y_padded: jnp.ndarray,
                mvs: jnp.ndarray, block_size: int, bit_depth: int,
                lam_bits_x16: int):
    """Per-block adaptive-MV-resolution decision (reference: the EncCu
    IMV mode loop, EncCu.cpp:775-782 / xCheckRDCostInterIMV:4346 —
    re-designed as one batched pass: the three candidate roundings of
    every block's MV are motion-compensated and SAD-scored at once, and
    an argmin over SAD + lambda*mvd-bits picks the per-block mode).

    Returns (imv (nby,nbx) int32 in {0,1,2}, mvs_rounded (nby,nbx,2))."""
    s = block_size
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    yb, xb = _block_coords(nby, nbx, s)
    ob = _to_blocks(orig_y, s)
    cands, costs = [], []
    for m, sh in enumerate(AMVR_SHIFTS):
        mvr = round_mv_amvr(mvs.astype(jnp.int32), sh)
        pred = interp.finalize_uni(
            interp.mc_luma(ref_y_padded, mvr.reshape(-1, 2), yb, xb, s, s,
                           MC_MARGIN, bit_depth), bit_depth)
        sad = jnp.sum(jnp.abs(pred - ob), axis=(1, 2)).reshape(nby, nbx)
        # rate proxy: EG-ish bit length of each mvd component at the
        # signaled precision + the imv flag bins
        mag = jnp.abs(mvr >> sh)
        bits = (2 * jnp.log2(1.0 + mag.astype(jnp.float32)).sum(-1)
                + 2.0 + (1 if m == 0 else 2))
        costs.append(sad + ((bits * lam_bits_x16).astype(jnp.int32) >> 4))
        cands.append(mvr)
    imv = jnp.argmin(jnp.stack(costs), axis=0).astype(jnp.int32)
    mv_sel = jnp.take_along_axis(
        jnp.stack(cands), imv[None, :, :, None].astype(jnp.int32),
        axis=0)[0]
    return imv, mv_sel


def _residual_pass(orig: jnp.ndarray, pred: jnp.ndarray, s: int, qp: int,
                   bit_depth: int, scaling: tuple | None = None):
    """Transform/quant the residual and reconstruct — returns (levels,
    recon_plane).  `scaling`: optional 8x8 scaling-list tuple
    (quant.scaling_weights)."""
    h, w = orig.shape
    nby, nbx = h // s, w // s
    log2s = s.bit_length() - 1
    ob = _to_blocks(orig, s)
    pb = _to_blocks(pred, s)
    coeff = transforms.forward_transform(ob - pb, bit_depth=bit_depth)
    levels = quant.quantize(coeff, qp, log2s, log2s, bit_depth, intra=False,
                            scaling=scaling)
    dq = quant.dequantize(levels, qp, log2s, log2s, bit_depth,
                          scaling=scaling)
    r = transforms.inverse_transform(dq, bit_depth=bit_depth)
    rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
    return (levels.reshape(nby, nbx, s, s),
            _from_blocks(rec, nby, nbx))


def _mc_planes_internal(ref_y, ref_u, ref_v, mvs, s: int, bit_depth: int,
                        wrap_around: bool):
    """Uni-prediction of all planes kept in 14-bit internal precision
    (for bi-prediction averaging, reference: xWeightedAverage)."""
    h, w = ref_y.shape
    nby, nbx = h // s, w // s
    sc = s // 2
    mv = mvs.reshape(-1, 2)
    ry = pad_ref(ref_y, MC_MARGIN, wrap_around)
    ru = pad_ref(ref_u, MC_MARGIN // 2, wrap_around)
    rv = pad_ref(ref_v, MC_MARGIN // 2, wrap_around)
    yb, xb = _block_coords(nby, nbx, s)
    py = interp.mc_luma(ry, mv, yb, xb, s, s, MC_MARGIN, bit_depth)
    ybc, xbc = _block_coords(nby, nbx, sc)
    pu = interp.mc_chroma(ru, mv, ybc, xbc, sc, sc, MC_MARGIN // 2,
                          bit_depth)
    pv = interp.mc_chroma(rv, mv, ybc, xbc, sc, sc, MC_MARGIN // 2,
                          bit_depth)
    return py, pu, pv          # block-batched (B, s, s) internal precision


def _luma_combine(int0, int1, dirs, nby, nbx, bit_depth, bdof: bool):
    """Luma uni/bi combine, optionally BDOF-refined (luma only, reference:
    BDOF applies to luma bi blocks; common/bdof.py)."""
    if bdof:
        from .bdof import combine_bi_bdof
        return combine_bi_bdof(int0, int1, dirs, nby, nbx, bit_depth)
    return _combine_bi(int0, int1, dirs, nby, nbx, bit_depth)


def _pred_planes_ext(i0, i1, dirs, gpm_modes, nby, nbx, bit_depth,
                     bdof: bool, use_gpm: bool, use_ciip: bool,
                     wp0=None, wp1=None):
    """All-plane prediction combine incl. GPM / CIIP block modes.

    dirs: 0=L0, 1=L1, 2=BI, 3=GPM (per-block mask in gpm_modes), 4=CIIP
    (bi inter + planar-from-prediction; reference: GEO weightedGeoBlk and
    the CIIP blend, InterPrediction.cpp / DecCu.cpp).  GPM/CIIP overlay the
    base uni/bi combine, so with both tools off this is exactly the
    round-1 path."""
    from . import gpm as gpm_mod
    d = dirs.reshape(-1)[:, None, None]
    # CIIP's inter component is the bi average
    d_base = jnp.where(dirs == 4, 2, dirs) if use_ciip else dirs
    if wp0 is not None:
        # weighted B prediction (BDOF/GPM/CIIP are mutually exclusive
        # with explicit WP in this codec; the caller gates them)
        pred_y = _combine_bi(i0[0], i1[0], d_base, nby, nbx, bit_depth,
                             wp0, wp1, 0)
        pred_u = _combine_bi(i0[1], i1[1], d_base, nby, nbx, bit_depth,
                             wp0, wp1, 1)
        pred_v = _combine_bi(i0[2], i1[2], d_base, nby, nbx, bit_depth,
                             wp0, wp1, 2)
        return pred_y, pred_u, pred_v
    pred_y = _luma_combine(i0[0], i1[0], d_base, nby, nbx, bit_depth, bdof)
    pred_u = _combine_bi(i0[1], i1[1], d_base, nby, nbx, bit_depth)
    pred_v = _combine_bi(i0[2], i1[2], d_base, nby, nbx, bit_depth)
    if use_gpm:
        g = gpm_modes.reshape(-1)
        by = gpm_mod.gpm_blend(interp.finalize_uni(i0[0], bit_depth),
                               interp.finalize_uni(i1[0], bit_depth), g)
        bu = gpm_mod.gpm_blend_chroma(
            interp.finalize_uni(i0[1], bit_depth),
            interp.finalize_uni(i1[1], bit_depth), g)
        bv = gpm_mod.gpm_blend_chroma(
            interp.finalize_uni(i0[2], bit_depth),
            interp.finalize_uni(i1[2], bit_depth), g)
        s = by.shape[-1]
        sc = s // 2
        pred_y = _from_blocks(
            jnp.where(d == 3, by, _to_blocks(pred_y, s)), nby, nbx)
        pred_u = _from_blocks(
            jnp.where(d == 3, bu, _to_blocks(pred_u, sc)), nby, nbx)
        pred_v = _from_blocks(
            jnp.where(d == 3, bv, _to_blocks(pred_v, sc)), nby, nbx)
    if use_ciip:
        s = pred_y.shape[0] // nby
        sc = s // 2
        cy = gpm_mod.ciip_from_pred(pred_y, s)
        cu = gpm_mod.ciip_from_pred(pred_u, sc)
        cv = gpm_mod.ciip_from_pred(pred_v, sc)
        pred_y = _from_blocks(
            jnp.where(d == 4, cy, _to_blocks(pred_y, s)), nby, nbx)
        pred_u = _from_blocks(
            jnp.where(d == 4, cu, _to_blocks(pred_u, sc)), nby, nbx)
        pred_v = _from_blocks(
            jnp.where(d == 4, cv, _to_blocks(pred_v, sc)), nby, nbx)
    return pred_y, pred_u, pred_v


def _combine_bi(int0, int1, dirs, nby, nbx, bit_depth, wp0=None,
                wp1=None, plane=0):
    """Per-block uni/bi finalize: dirs (nby, nbx) 0=L0, 1=L1, 2=BI.

    With per-list explicit weights wp0/wp1 ((3, 2) int (w, o) per plane,
    log2Wd 6 — reference: WeightPrediction.cpp xWeightedPredictionBi),
    uni blocks apply their list's weight and bi blocks combine as
    ((p0*w0 + p1*w1 + 64) >> 7) + ((o0 + o1 + 1) >> 1), shared
    bit-exactly by encoder and decoder."""
    d = dirs.reshape(-1)[:, None, None]
    uni0 = interp.finalize_uni(int0, bit_depth)
    uni1 = interp.finalize_uni(int1, bit_depth)
    if wp0 is not None:
        maxv = (1 << bit_depth) - 1
        w0, o0 = wp0[plane, 0], wp0[plane, 1]
        w1, o1 = wp1[plane, 0], wp1[plane, 1]
        bi = jnp.clip(((uni0 * w0 + uni1 * w1 + 64) >> 7)
                      + ((o0 + o1 + 1) >> 1), 0, maxv)
        uni0 = apply_wp(uni0, w0, o0, bit_depth)
        uni1 = apply_wp(uni1, w1, o1, bit_depth)
    else:
        bi = interp.finalize_bi(int0, int1, bit_depth)
    sel = jnp.where(d == 2, bi, jnp.where(d == 1, uni1, uni0))
    return _from_blocks(sel, nby, nbx)


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "wrap_around", "bdof",
                                             "dmvr", "gpm", "ciip"))
def bpred_and_residual(orig_y, orig_u, orig_v, ref0, ref1, mv0, mv1, dirs,
                       qp: int, block_size: int, bit_depth: int,
                       wrap_around: bool, bdof: bool = False,
                       dmvr: bool = False, gpm_modes=None,
                       gpm: bool = False, ciip: bool = False,
                       wp0=None, wp1=None):
    """Shared B prediction+residual path (encoder passes orig; decoder uses
    reconstruct_b_frame below)."""
    s = block_size
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    if gpm_modes is None:
        gpm_modes = jnp.zeros((nby, nbx), dtype=jnp.int32)
    if dmvr:
        from .dmvr import dmvr_refine
        mv0, mv1 = dmvr_refine(pad_ref(ref0[0], MC_MARGIN, wrap_around),
                               pad_ref(ref1[0], MC_MARGIN, wrap_around),
                               mv0, mv1, dirs, s, MC_MARGIN)
    i0 = _mc_planes_internal(*ref0, mv0, s, bit_depth, wrap_around)
    i1 = _mc_planes_internal(*ref1, mv1, s, bit_depth, wrap_around)
    pred_y, pred_u, pred_v = _pred_planes_ext(
        i0, i1, dirs, gpm_modes, nby, nbx, bit_depth, bdof, gpm, ciip,
        wp0, wp1)
    lev_y, rec_y = _residual_pass(orig_y, pred_y, s, qp, bit_depth)
    lev_u, rec_u = _residual_pass(orig_u, pred_u, s // 2, qp, bit_depth)
    lev_v, rec_v = _residual_pass(orig_v, pred_v, s // 2, qp, bit_depth)
    return lev_y, lev_u, lev_v, dict(y=rec_y, u=rec_u, v=rec_v)


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "search_range", "wrap_around",
                                             "gpm", "ciip"))
def search_b_frame(orig_y, ref0_y, ref1_y, qp: int, block_size: int,
                   bit_depth: int, search_range: int, wrap_around: bool,
                   gpm: bool = False, ciip: bool = False):
    """Per-list ME + per-block prediction-direction decision (reference:
    InterSearch::predInterSearch uni L0/L1 + bi iteration; round-1 bi uses
    the uni-best MVs without iterative refinement).  With gpm/ciip the
    decision extends to dirs 3 (GPM, mask by batched SAD over all masks)
    and 4 (CIIP).  Returns (mv0, mv1, dirs, gpm_modes)."""
    from ..encoder import me as me_mod
    s = block_size
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    lam = quant.lambda_from_qp(qp, intra=False)
    lam16 = int(lam ** 0.5 * 16)

    mvs = []
    sads = []
    preds = []
    for ref in (ref0_y, ref1_y):
        refp = pad_ref(ref, MC_MARGIN, wrap_around)
        mv_i, _ = me_mod.hierarchical_search(orig_y, refp, s, search_range,
                                             MC_MARGIN, lam16)
        mv, sad = me_mod.fractional_refine(orig_y, refp, mv_i, s, MC_MARGIN,
                                           bit_depth)
        mvs.append(mv)
        yb, xb = _block_coords(nby, nbx, s)
        pred = interp.mc_luma(refp, mv.reshape(-1, 2), yb, xb, s, s,
                              MC_MARGIN, bit_depth)
        preds.append(pred)
        sads.append(sad)
    ob = _to_blocks(orig_y, s)
    bi_pix = interp.finalize_bi(preds[0], preds[1], bit_depth)
    sad_bi = jnp.sum(jnp.abs(bi_pix - ob), axis=(1, 2)).reshape(nby, nbx)
    # direction decision: bi costs two mvds
    mv_bits = int(lam ** 0.5 * 8)
    cost0 = sads[0]
    cost1 = sads[1]
    cost_bi = sad_bi + mv_bits
    costs = [cost0, cost1, cost_bi]
    gpm_modes = jnp.zeros((nby, nbx), dtype=jnp.int32)
    if gpm or ciip:
        from . import gpm as gpm_mod
        big = jnp.int32(1 << 30)
        u0 = interp.finalize_uni(preds[0], bit_depth)
        u1 = interp.finalize_uni(preds[1], bit_depth)
        if gpm:
            gmode, gsad = gpm_mod.gpm_search(ob, u0, u1)
            gpm_modes = gmode.reshape(nby, nbx)
            # GPM pays two mvds + the 4-bit mask index
            costs.append(gsad.reshape(nby, nbx) + mv_bits
                         + (mv_bits >> 1))
        else:
            costs.append(jnp.full((nby, nbx), big))
        if ciip:
            cblk = gpm_mod.ciip_from_pred(
                _from_blocks(bi_pix, nby, nbx), s)
            csad = jnp.sum(jnp.abs(cblk - ob), axis=(1, 2))
            costs.append(csad.reshape(nby, nbx) + mv_bits)
        else:
            costs.append(jnp.full((nby, nbx), big))
    dirs = jnp.argmin(jnp.stack(costs), axis=0).astype(jnp.int32)
    return mvs[0], mvs[1], dirs, gpm_modes


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "wrap_around", "bdof",
                                             "dmvr", "gpm", "ciip",
                                             "scaling"))
def reconstruct_b_frame(mv0, mv1, dirs, lev_y, lev_u, lev_v,
                        ref0, ref1, qp: int, block_size: int,
                        bit_depth: int = 8, wrap_around: bool = False,
                        bdof: bool = False, dmvr: bool = False,
                        gpm_modes=None, gpm: bool = False,
                        ciip: bool = False, scaling: tuple | None = None,
                        wp0=None, wp1=None):
    """Decoder-side B reconstruction (shared with encoder recon)."""
    s = block_size
    sc = s // 2
    h, w = ref0[0].shape
    nby, nbx = h // s, w // s
    if gpm_modes is None:
        gpm_modes = jnp.zeros((nby, nbx), dtype=jnp.int32)
    if dmvr:
        from .dmvr import dmvr_refine
        mv0, mv1 = dmvr_refine(pad_ref(ref0[0], MC_MARGIN, wrap_around),
                               pad_ref(ref1[0], MC_MARGIN, wrap_around),
                               mv0, mv1, dirs, s, MC_MARGIN)
    i0 = _mc_planes_internal(*ref0, mv0, s, bit_depth, wrap_around)
    i1 = _mc_planes_internal(*ref1, mv1, s, bit_depth, wrap_around)
    pred_y, pred_u, pred_v = _pred_planes_ext(
        i0, i1, dirs, gpm_modes, nby, nbx, bit_depth, bdof, gpm, ciip,
        wp0, wp1)

    def rec_plane(pred, lev, size):
        log2s = size.bit_length() - 1
        pb = _to_blocks(pred, size)
        dq = quant.dequantize(lev.reshape(-1, size, size), qp, log2s, log2s,
                              bit_depth, scaling=scaling)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
        return _from_blocks(rec, nby, nbx)

    return dict(y=rec_plane(pred_y, lev_y, s),
                u=rec_plane(pred_u, lev_u, sc),
                v=rec_plane(pred_v, lev_v, sc))


def mcts_clamp(mvs: jnp.ndarray, s: int, w: int, h: int,
               tiles: tuple[int, int]) -> jnp.ndarray:
    """Motion-constrained tile sets: clamp every block's MV so its MC read
    window (8-tap support included) stays inside the block's own tile
    (reference: MCTS.{cpp,h} — MV restriction enabling tile-parallel
    decode/extraction; the TPU analog keeps cross-chip reference reads
    shard-local, SURVEY.md §2.8).

    mvs: (nby, nbx, 2) 1/16-pel (x, y).  tiles: (cols, rows)."""
    ncx, ncy = tiles
    tw, th = w // ncx, h // ncy
    nby, nbx = mvs.shape[:2]
    bx = jnp.arange(nbx, dtype=jnp.int32) * s
    by = jnp.arange(nby, dtype=jnp.int32) * s
    tx0 = (bx // tw) * tw
    ty0 = (by // th) * th
    # filter support: 3/4 luma taps + chroma 4-tap at half res -> 4/5
    lo_x = (tx0 - bx + 4) * 16
    hi_x = (tx0 + tw - bx - s - 5) * 16
    lo_y = (ty0 - by + 4) * 16
    hi_y = (ty0 + th - by - s - 5) * 16
    mvx = jnp.clip(mvs[..., 0], lo_x[None, :], jnp.maximum(hi_x, lo_x)[None, :])
    mvy = jnp.clip(mvs[..., 1], lo_y[:, None], jnp.maximum(hi_y, lo_y)[:, None])
    return jnp.stack([mvx, mvy], -1)


def apply_wp(plane: jnp.ndarray, w, o, bit_depth: int) -> jnp.ndarray:
    """Explicit weighted prediction, log2Wd = 6 (reference:
    WeightPrediction.cpp — pred' = clip(((pred*w + 32) >> 6) + o))."""
    return jnp.clip(((plane * w + 32) >> 6) + o, 0, (1 << bit_depth) - 1)


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "search_range", "wrap_around",
                                             "scaling", "amvr", "mcts"))
def encode_p_frame(orig_y, orig_u, orig_v, ref_y, ref_u, ref_v, qp: int,
                   block_size: int = 16, bit_depth: int = 8,
                   search_range: int = 24, wrap_around: bool = False,
                   wp: jnp.ndarray | None = None,
                   scaling: tuple | None = None, amvr: bool = False,
                   mcts: tuple | None = None):
    """Full-frame P encode: batched ME -> MC -> residual -> recon.

    Returns (mvs (nby,nbx,2) 1/16-pel, levels y/u/v, recon dict); with
    `amvr`, returns (mvs, imv, levels..., recon) — mvs already rounded to
    each block's signaled precision."""
    s = block_size
    lam = quant.lambda_from_qp(qp, intra=False)
    lam_bits_x16 = int(lam ** 0.5 * 16)

    ry_pad = pad_ref(ref_y, MC_MARGIN, wrap_around)
    mv_int, _ = me_mod.hierarchical_search(orig_y, ry_pad, s, search_range,
                                           MC_MARGIN, lam_bits_x16)
    mvs, _ = me_mod.fractional_refine(orig_y, ry_pad, mv_int, s, MC_MARGIN,
                                      bit_depth)
    if mcts:
        h, w = orig_y.shape
        mvs = mcts_clamp_mvs(mvs, s, w, h, mcts[0], mcts[1])
    imv = None
    if amvr:
        imv, mvs = amvr_decide(orig_y, ry_pad, mvs, s, bit_depth,
                               lam_bits_x16)
    pred_y, pred_u, pred_v = mc_predict(ref_y, ref_u, ref_v, mvs, s,
                                        bit_depth, wrap_around)
    if wp is not None:
        pred_y = apply_wp(pred_y, wp[0, 0], wp[0, 1], bit_depth)
        pred_u = apply_wp(pred_u, wp[1, 0], wp[1, 1], bit_depth)
        pred_v = apply_wp(pred_v, wp[2, 0], wp[2, 1], bit_depth)
    lev_y, rec_y = _residual_pass(orig_y, pred_y, s, qp, bit_depth, scaling)
    lev_u, rec_u = _residual_pass(orig_u, pred_u, s // 2, qp, bit_depth,
                                  scaling)
    lev_v, rec_v = _residual_pass(orig_v, pred_v, s // 2, qp, bit_depth,
                                  scaling)
    if amvr:
        return (mvs, imv, lev_y, lev_u, lev_v,
                dict(y=rec_y, u=rec_u, v=rec_v))
    return (mvs, lev_y, lev_u, lev_v,
            dict(y=rec_y, u=rec_u, v=rec_v))


# ------------------------------------------------------- merge/skip search
#
# Merge mode needs the encoder to (a) know the SAD of candidate MVs it did
# not itself search and (b) recompute the residual after blocks snap to a
# candidate.  The batched design splits the former single-program P encode
# into two device programs around one host selection pass:
#   search_p_frame: ME + per-block SADs of the merge-candidate *fields*
#                   (neighbor-shifted ME field, zero, TMVP) — one jit.
#   <host>        : encoder/inter_coder.select_merge_p walks the frame in
#                   coding order, derives the decoder-mirrored candidate
#                   lists and snaps blocks to merge candidates by RD cost.
#   finish_p_frame: prediction/residual/recon from the FINAL MV field.
# (reference: merge candidates UnitTools.cpp:1059 getInterMergeCandidates;
# the EncCu merge RD loop xCheckRDCostMerge2Nx2N.)

N_CAND_FIELDS = 5     # left, above, above-right, zero, TMVP


def _shift_mv_field(mvs: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[by, bx] = mvs[by + dy, bx + dx]; out-of-range entries 0."""
    nby, nbx = mvs.shape[:2]
    p = jnp.pad(mvs, ((1, 1), (1, 1), (0, 0)))
    return jax.lax.dynamic_slice(p, (1 + dy, 1 + dx, 0), (nby, nbx, 2))


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "search_range", "wrap_around",
                                             "amvr", "mcts"))
def search_p_frame(orig_y, ref_y, col_mvs, qp: int, block_size: int,
                   bit_depth: int, search_range: int, wrap_around: bool,
                   amvr: bool = False, mcts: tuple | None = None):
    """Merge-aware P search: hierarchical ME + fractional refine (+AMVR
    rounding/MCTS clamp), then ONE batched MC+SAD pass per candidate field.

    col_mvs: (nby, nbx, 2) TMVP co-located field (zeros when absent).
    Returns (mvs, imv, sad_me, cand_mvs (K,nby,nbx,2), cand_sads (K,...))."""
    s = block_size
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    lam = quant.lambda_from_qp(qp, intra=False)
    lam_bits_x16 = int(lam ** 0.5 * 16)

    ry_pad = pad_ref(ref_y, MC_MARGIN, wrap_around)
    mv_int, _ = me_mod.hierarchical_search(orig_y, ry_pad, s, search_range,
                                           MC_MARGIN, lam_bits_x16)
    mvs, sad_me = me_mod.fractional_refine(orig_y, ry_pad, mv_int, s,
                                           MC_MARGIN, bit_depth)
    if mcts:
        mvs = mcts_clamp_mvs(mvs, s, w, h, mcts[0], mcts[1])
    imv = jnp.zeros((nby, nbx), dtype=jnp.int32)
    if amvr:
        imv, mvs = amvr_decide(orig_y, ry_pad, mvs, s, bit_depth,
                               lam_bits_x16)
        # post-rounding SAD so merge-vs-AMVP costs compare like for like
        sad_me = _field_sad(orig_y, ry_pad, mvs, s, bit_depth)
    cand_fields = [
        _shift_mv_field(mvs, 0, -1),       # left neighbor's MV
        _shift_mv_field(mvs, -1, 0),       # above
        _shift_mv_field(mvs, -1, 1),       # above-right
        jnp.zeros_like(mvs),               # zero MV
        col_mvs.astype(mvs.dtype),         # TMVP co-located
    ]
    cand_mvs = jnp.stack(cand_fields)
    cand_sads = jnp.stack([_field_sad(orig_y, ry_pad, f, s, bit_depth)
                           for f in cand_fields])
    return mvs, imv, sad_me, cand_mvs, cand_sads


def _field_sad(orig_y, ref_y_padded, mvs, s: int, bit_depth: int):
    """Per-block SAD of one MV field (batched MC + reduce)."""
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    yb, xb = _block_coords(nby, nbx, s)
    pred = interp.finalize_uni(
        interp.mc_luma(ref_y_padded, mvs.reshape(-1, 2), yb, xb, s, s,
                       MC_MARGIN, bit_depth), bit_depth)
    ob = _to_blocks(orig_y, s)
    return jnp.sum(jnp.abs(pred - ob), axis=(1, 2)).reshape(nby, nbx)


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "search_range", "wrap_around",
                                             "amvr", "mcts"))
def search_p_frame_2ref(orig_y, ref0_y, ref1_y, col_mvs, qp: int,
                        block_size: int, bit_depth: int, search_range: int,
                        wrap_around: bool, amvr: bool = False,
                        mcts: tuple | None = None):
    """Two-reference merge-aware P search: per-ref ME, per-block ref_idx
    decision, then candidate-field SADs where each candidate carries its
    (ref_idx, mv) and its SAD gathers from ITS reference (reference:
    the per-ref ME loop InterSearch.cpp:4937 + ref_idx RD; DPB holds up
    to 16 refs — this batched design takes two, the CTC's effective
    active-ref count for low delay).

    Returns (ref_idx, mvs, imv, sad_sel, cand_ref (K,..), cand_mvs,
    cand_sads)."""
    s = block_size
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    lam = quant.lambda_from_qp(qp, intra=False)
    lam_bits_x16 = int(lam ** 0.5 * 16)

    pads, mvs_r, sads_r, imvs_r = [], [], [], []
    for ry in (ref0_y, ref1_y):
        ry_pad = pad_ref(ry, MC_MARGIN, wrap_around)
        pads.append(ry_pad)
        mv_int, _ = me_mod.hierarchical_search(orig_y, ry_pad, s,
                                               search_range, MC_MARGIN,
                                               lam_bits_x16)
        mvs, sad = me_mod.fractional_refine(orig_y, ry_pad, mv_int, s,
                                            MC_MARGIN, bit_depth)
        if mcts:
            mvs = mcts_clamp_mvs(mvs, s, w, h, mcts[0], mcts[1])
        imv = jnp.zeros((nby, nbx), dtype=jnp.int32)
        if amvr:
            imv, mvs = amvr_decide(orig_y, ry_pad, mvs, s, bit_depth,
                                   lam_bits_x16)
            sad = _field_sad(orig_y, ry_pad, mvs, s, bit_depth)
        mvs_r.append(mvs)
        sads_r.append(sad)
        imvs_r.append(imv)
    # ref decision: the second ref pays one more context bin
    ref_pen = lam_bits_x16 >> 4
    ref_idx = (sads_r[1] + ref_pen < sads_r[0]).astype(jnp.int32)
    rsel = ref_idx[..., None]
    mv_sel = jnp.where(rsel == 1, mvs_r[1], mvs_r[0])
    imv_sel = jnp.where(ref_idx == 1, imvs_r[1], imvs_r[0])
    sad_sel = jnp.where(ref_idx == 1, sads_r[1], sads_r[0])

    def field_sad_ref(rf, mf):
        s0 = _field_sad(orig_y, pads[0], mf, s, bit_depth)
        s1 = _field_sad(orig_y, pads[1], mf, s, bit_depth)
        return jnp.where(rf == 1, s1, s0)

    cand_ref, cand_mvs, cand_sads = [], [], []
    for (dy, dx) in ((0, -1), (-1, 0), (-1, 1)):
        cr = _shift_i_field(ref_idx, dy, dx)
        cm = _shift_mv_field(mv_sel, dy, dx)
        cand_ref.append(cr)
        cand_mvs.append(cm)
        cand_sads.append(field_sad_ref(cr, cm))
    z = jnp.zeros_like(ref_idx)
    cand_ref.append(z)
    cand_mvs.append(jnp.zeros_like(mv_sel))
    cand_sads.append(_field_sad(orig_y, pads[0],
                                jnp.zeros_like(mv_sel), s, bit_depth))
    cand_ref.append(z)          # TMVP candidate rides ref 0
    cand_mvs.append(col_mvs.astype(mv_sel.dtype))
    cand_sads.append(_field_sad(orig_y, pads[0],
                                col_mvs.astype(mv_sel.dtype), s,
                                bit_depth))
    return (ref_idx, mv_sel, imv_sel, sad_sel, jnp.stack(cand_ref),
            jnp.stack(cand_mvs), jnp.stack(cand_sads))


def _mc_predict_2ref(ref0, ref1, ref_idx, mvs, s: int, bit_depth: int,
                     wrap_around: bool):
    """Per-block two-reference MC: both refs motion-compensated, the
    block's ref_idx selects (the gather stays batched on the MXU; a
    data-dependent single-ref gather would defeat XLA tiling)."""
    p0 = mc_predict(ref0[0], ref0[1], ref0[2], mvs, s, bit_depth,
                    wrap_around)
    p1 = mc_predict(ref1[0], ref1[1], ref1[2], mvs, s, bit_depth,
                    wrap_around)
    out = []
    for i, sub in enumerate((1, 2, 2)):
        k = s // sub
        r = jnp.repeat(jnp.repeat(ref_idx, k, 0), k, 1)
        out.append(jnp.where(r == 1, p1[i], p0[i]))
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "wrap_around", "scaling"))
def finish_p_frame_2ref(orig_y, orig_u, orig_v, ref0, ref1, ref_idx, mvs,
                        qp: int, block_size: int, bit_depth: int,
                        wrap_around: bool, wp: jnp.ndarray | None = None,
                        scaling: tuple | None = None):
    """Residual/levels/recon from FINAL (ref_idx, mv) fields."""
    s = block_size
    pred_y, pred_u, pred_v = _mc_predict_2ref(ref0, ref1, ref_idx, mvs, s,
                                              bit_depth, wrap_around)
    if wp is not None:
        pred_y = apply_wp(pred_y, wp[0, 0], wp[0, 1], bit_depth)
        pred_u = apply_wp(pred_u, wp[1, 0], wp[1, 1], bit_depth)
        pred_v = apply_wp(pred_v, wp[2, 0], wp[2, 1], bit_depth)
    lev_y, rec_y = _residual_pass(orig_y, pred_y, s, qp, bit_depth, scaling)
    lev_u, rec_u = _residual_pass(orig_u, pred_u, s // 2, qp, bit_depth,
                                  scaling)
    lev_v, rec_v = _residual_pass(orig_v, pred_v, s // 2, qp, bit_depth,
                                  scaling)
    return lev_y, lev_u, lev_v, dict(y=rec_y, u=rec_u, v=rec_v)


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "wrap_around", "scaling"))
def reconstruct_p_frame_2ref(ref_idx, mvs, lev_y, lev_u, lev_v, ref0, ref1,
                             qp: int, block_size: int = 16,
                             bit_depth: int = 8, wrap_around: bool = False,
                             wp: jnp.ndarray | None = None,
                             scaling: tuple | None = None):
    """Decoder-side two-reference P reconstruction (shared math with
    finish_p_frame_2ref -> bit-exact)."""
    s = block_size
    sc = s // 2
    h, w = ref0[0].shape
    nby, nbx = h // s, w // s
    pred_y, pred_u, pred_v = _mc_predict_2ref(ref0, ref1, ref_idx, mvs, s,
                                              bit_depth, wrap_around)
    if wp is not None:
        pred_y = apply_wp(pred_y, wp[0, 0], wp[0, 1], bit_depth)
        pred_u = apply_wp(pred_u, wp[1, 0], wp[1, 1], bit_depth)
        pred_v = apply_wp(pred_v, wp[2, 0], wp[2, 1], bit_depth)

    def rec_plane(pred, lev, size):
        log2s = size.bit_length() - 1
        pb = _to_blocks(pred, size)
        dq = quant.dequantize(lev.reshape(-1, size, size), qp, log2s, log2s,
                              bit_depth, scaling=scaling)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
        return _from_blocks(rec, nby, nbx)

    return dict(y=rec_plane(pred_y, lev_y, s),
                u=rec_plane(pred_u, lev_u, sc),
                v=rec_plane(pred_v, lev_v, sc))


def _shift_i_field(f: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[by, bx] = f[by + dy, bx + dx]; out-of-range entries 0."""
    nby, nbx = f.shape
    p = jnp.pad(f, ((1, 1), (1, 1)))
    return jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (nby, nbx))


def _b_field_sad(orig_y, r0p, r1p, mv0f, mv1f, dirsf, s: int,
                 bit_depth: int):
    """Per-block SAD of one whole-motion B field (dirs 0/1/2)."""
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    yb, xb = _block_coords(nby, nbx, s)
    p0 = interp.mc_luma(r0p, mv0f.reshape(-1, 2), yb, xb, s, s, MC_MARGIN,
                        bit_depth)
    p1 = interp.mc_luma(r1p, mv1f.reshape(-1, 2), yb, xb, s, s, MC_MARGIN,
                        bit_depth)
    pred = _combine_bi(p0, p1, dirsf, nby, nbx, bit_depth)
    diff = jnp.abs(pred - orig_y)
    return diff.reshape(nby, s, nbx, s).sum(axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "search_range", "wrap_around",
                                             "gpm", "ciip"))
def search_b_frame_merge(orig_y, ref0_y, ref1_y, qp: int, block_size: int,
                         bit_depth: int, search_range: int,
                         wrap_around: bool, gpm: bool = False,
                         ciip: bool = False):
    """Merge-aware B search: the per-list ME + direction decision of
    search_b_frame, plus per-block SADs of the whole-motion merge
    candidate fields (neighbor shifts of (mv0, mv1, dirs) and zero-bi).
    Candidate dirs from GPM/CIIP neighbors collapse to BI — a merge
    candidate carries motion, not the mask/intra sub-state (reference:
    GEO neighbors contribute their stored bi motion to merge lists).

    Returns (mv0, mv1, dirs, gpm_modes, sad_sel,
             cand_mv0/mv1 (K,nby,nbx,2), cand_dirs (K,..), cand_sads)."""
    s = block_size
    mv0, mv1, dirs, gpm_modes = search_b_frame(
        orig_y, ref0_y, ref1_y, qp, s, bit_depth, search_range,
        wrap_around, gpm, ciip)
    r0p = pad_ref(ref0_y, MC_MARGIN, wrap_around)
    r1p = pad_ref(ref1_y, MC_MARGIN, wrap_around)
    d_base = jnp.minimum(dirs, 2)
    sad_sel = _b_field_sad(orig_y, r0p, r1p, mv0, mv1, d_base, s, bit_depth)
    cand_mv0, cand_mv1, cand_dirs, cand_sads = [], [], [], []
    for (dy, dx) in ((0, -1), (-1, 0), (-1, 1)):
        c0 = _shift_mv_field(mv0, dy, dx)
        c1 = _shift_mv_field(mv1, dy, dx)
        cd = jnp.minimum(_shift_i_field(dirs, dy, dx), 2)
        cand_mv0.append(c0)
        cand_mv1.append(c1)
        cand_dirs.append(cd)
        cand_sads.append(_b_field_sad(orig_y, r0p, r1p, c0, c1, cd, s,
                                      bit_depth))
    # zero-MV bi candidate
    z = jnp.zeros_like(mv0)
    zd = jnp.full_like(dirs, 2)
    cand_mv0.append(z)
    cand_mv1.append(z)
    cand_dirs.append(zd)
    cand_sads.append(_b_field_sad(orig_y, r0p, r1p, z, z, zd, s,
                                  bit_depth))
    return (mv0, mv1, dirs, gpm_modes, sad_sel, jnp.stack(cand_mv0),
            jnp.stack(cand_mv1), jnp.stack(cand_dirs),
            jnp.stack(cand_sads))


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "wrap_around", "scaling"))
def finish_p_frame(orig_y, orig_u, orig_v, ref_y, ref_u, ref_v, mvs,
                   qp: int, block_size: int, bit_depth: int,
                   wrap_around: bool, wp: jnp.ndarray | None = None,
                   scaling: tuple | None = None):
    """Residual/levels/recon from a FINAL MV field (the merge pipeline's
    second device program; the math is encode_p_frame minus the ME)."""
    s = block_size
    pred_y, pred_u, pred_v = mc_predict(ref_y, ref_u, ref_v, mvs, s,
                                        bit_depth, wrap_around)
    if wp is not None:
        pred_y = apply_wp(pred_y, wp[0, 0], wp[0, 1], bit_depth)
        pred_u = apply_wp(pred_u, wp[1, 0], wp[1, 1], bit_depth)
        pred_v = apply_wp(pred_v, wp[2, 0], wp[2, 1], bit_depth)
    lev_y, rec_y = _residual_pass(orig_y, pred_y, s, qp, bit_depth, scaling)
    lev_u, rec_u = _residual_pass(orig_u, pred_u, s // 2, qp, bit_depth,
                                  scaling)
    lev_v, rec_v = _residual_pass(orig_v, pred_v, s // 2, qp, bit_depth,
                                  scaling)
    return lev_y, lev_u, lev_v, dict(y=rec_y, u=rec_u, v=rec_v)


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "wrap_around", "scaling"))
def reconstruct_p_frame(mvs, lev_y, lev_u, lev_v, ref_y, ref_u, ref_v,
                        qp: int, block_size: int = 16, bit_depth: int = 8,
                        wrap_around: bool = False,
                        wp: jnp.ndarray | None = None,
                        scaling: tuple | None = None):
    """Decoder-side P reconstruction — also the encoder's recon path when
    levels are already decided (shared math -> bit-exactness)."""
    s = block_size
    sc = s // 2
    h, w = ref_y.shape
    nby, nbx = h // s, w // s
    pred_y, pred_u, pred_v = mc_predict(ref_y, ref_u, ref_v, mvs, s,
                                        bit_depth, wrap_around)
    if wp is not None:
        pred_y = apply_wp(pred_y, wp[0, 0], wp[0, 1], bit_depth)
        pred_u = apply_wp(pred_u, wp[1, 0], wp[1, 1], bit_depth)
        pred_v = apply_wp(pred_v, wp[2, 0], wp[2, 1], bit_depth)

    def rec_plane(pred, lev, size):
        log2s = size.bit_length() - 1
        pb = _to_blocks(pred, size)
        dq = quant.dequantize(lev.reshape(-1, size, size), qp, log2s, log2s,
                              bit_depth, scaling=scaling)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
        return _from_blocks(rec, nby, nbx)

    return dict(y=rec_plane(pred_y, lev_y, s),
                u=rec_plane(pred_u, lev_u, sc),
                v=rec_plane(pred_v, lev_v, sc))
