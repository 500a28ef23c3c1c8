"""Multi-model P-frame codec: per-block model search + mixed-model MC.

TPU-native analog of the reference's per-model inter coding loop (reference:
source/Lib/EncoderLib/EncCu.cpp:775-798 — the mode loop drives
xCheckRDCostInter once per active motion model; InterSearch.cpp:2695
predInterSearch(cu, partitioner, motionModel); decoder side DecCu.cpp +
InterPrediction.cpp:520-528 model dispatch).

Re-design: instead of a serial per-CU per-model RD loop, every model's
motion search runs *frame-batched* (diamond refinement where each step
reprojects + motion-compensates ALL blocks at once), then one argmin
selects the per-block model.  Reconstruction merges per-subblock target
positions across models with masks and runs ONE position-based MC pass —
mixed-model frames cost one gather, not one pass per model.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import interp, quant, transforms
from ..inter_frame import (MC_MARGIN, _block_coords, _from_blocks,
                           _residual_pass, _to_blocks, pad_ref)
from ..typedefs import MotionModelID as M
from . import mc as mm_mc
from .reprojection import MVReprojection, SUBBLK


def _block_sad(diff_abs: jnp.ndarray, s: int) -> jnp.ndarray:
    h, w = diff_abs.shape
    return diff_abs.reshape(h // s, s, w // s, s).sum(axis=(1, 3))


SAD_ROW_STEP = 4     # search-time SAD subsampling: keep 1-of-4 4-px row
                     # bands (reference: RdCost subShift; non-normative —
                     # only steers the model/MV choice, never the
                     # signaled reconstruction)
SAD_COL_STEP = 2     # and 1-of-2 4-px column bands in the model-search
                     # evals (the MC gather is the search's dominant cost;
                     # halving the evaluated columns halves it)


def _subsample_rows(plane: jnp.ndarray, row_step: int,
                    col_step: int = 1) -> jnp.ndarray:
    """Keep every row_step-th 4-pixel row band (and every col_step-th
    4-pixel column band) of a frame."""
    h, w = plane.shape
    x = plane.reshape(h // 4, 4, w)[::row_step]
    if col_step > 1:
        x = x.reshape(-1, 4, w // 4, 4)[:, :, ::col_step]
        return x.reshape(-1, (w // 4 // col_step) * 4)
    return x.reshape(-1, w)


def _block_sad_sub(diff_abs: jnp.ndarray, s: int, row_step: int,
                   col_step: int = 1) -> jnp.ndarray:
    """Per-block SAD from a row/column-subsampled |diff| plane: each
    block keeps s//4//row_step of its 4-px row bands (and s//4//col_step
    column bands); scaled back to full-SAD range."""
    h, w = diff_abs.shape
    rows_per_block = (s // 4 // row_step) * 4
    cols_per_block = (s // 4 // col_step) * 4
    return (diff_abs.reshape(h // rows_per_block, rows_per_block,
                             w // cols_per_block, cols_per_block
                             ).sum(axis=(1, 3)) * (row_step * col_step))


def make_eval_fn(reproj: MVReprojection, model_id: int, block_size: int,
                 bit_depth: int, epipole=None):
    """Jitted (orig, ref_padded, mvs) -> (pred, sad-per-block) for one
    model.  Model id and geometry are closure-static."""
    if model_id in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT, M.MPA_TOP_BOTTOM):
        reproj.mpa_cache(model_id)    # warm eagerly — a first computation
        # inside the jit trace would store tracers in the cache

    @jax.jit
    def eval_mvs(orig, ref_padded, mvs):
        if model_id == M.CLASSIC:
            pos = mm_mc.classic_positions(reproj.offset, reproj.width,
                                          reproj.height, mvs, block_size)
        else:
            pos = reproj.reproject_frame(model_id, mvs, block_size, epipole)
        pred = mm_mc.mc_luma_positions(ref_padded, pos, MC_MARGIN, bit_depth)
        sad = _block_sad(jnp.abs(orig - pred), block_size)
        return pred, sad

    return eval_mvs


_DIAMOND = np.array([(0, 0), (-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0),
                     (-1, 1), (0, 1), (1, 1)], dtype=np.int32)


def make_eval_multi(reproj: MVReprojection, model_id: int, block_size: int,
                    bit_depth: int, epipole=None):
    """Jitted (orig, ref_padded, mv_cands (K,nby,nbx,2)) -> (K,nby,nbx)
    SADs — all K candidates of a refinement step in ONE launch.  Cached on
    the reproj object per (model, block size, epipole) so repeated frames
    reuse the traced function instead of rebuilding a jit closure (a
    retrace costs ~1 s/frame/model at 2K)."""
    ep_key = (None if epipole is None else
              tuple(np.asarray(epipole, dtype=np.float64).round(12)))
    key = (_geom_key(reproj), model_id, block_size, bit_depth, ep_key)
    if key in _EVAL_CACHE:
        return _EVAL_CACHE[key]
    fn = _make_eval_multi_uncached(reproj, model_id, block_size, bit_depth,
                                   epipole)
    _EVAL_CACHE[key] = fn
    return fn


_EVAL_CACHE: dict = {}


def _geom_key(reproj: MVReprojection):
    """Geometry identity of an MVReprojection — jitted search/merge
    closures are shared across encoder/decoder instances with the same
    geometry (a fresh EncLib must not retrace ~1 s/model/frame)."""
    return (reproj.proj, reproj.width, reproj.height, reproj.offset,
            reproj.ged_flavor)


def _sad_fields_bilin(ref_padded, orig_sub, pos_k, block_size: int,
                      row_step: int, col_step: int = 1,
                      exact: bool = False, bit_depth: int = 8
                      ) -> jnp.ndarray:
    """Per-BLOCK decision SADs for K candidate position fields through
    the 2-tap bilinear kernel (non-normative, ranks candidates only —
    the reference's decision stages use the same bilinear shortcut,
    InterpolationFilter.h:59-68).  pos_k (K, nsy_sub, nsx_sub, 2) over
    the row/col-subsampled subblock grid; returns (K, nby, nbx) scaled
    back to full-SAD range.

    exact=True uses the fused 8-tap SAD kernel instead — for RD-critical
    field SADs (merge candidates vs selection) where bilinear's blur
    bias would favor integer-position candidates over fractional ones."""
    if exact:
        sads = mm_mc.sad_positions_multi(ref_padded, orig_sub, pos_k,
                                         MC_MARGIN, bit_depth)
    else:
        sads = mm_mc.sad_bilinear_positions(ref_padded, orig_sub, pos_k,
                                            MC_MARGIN)
    k, ny, nx = sads.shape
    rows_pb = block_size // 4 // row_step
    cols_pb = block_size // 4 // col_step
    return (sads.reshape(k, ny // rows_pb, rows_pb, nx // cols_pb,
                         cols_pb).sum(axis=(2, 4))
            * (row_step * col_step))


# Search-eval mode: "block" ranks diamond candidates by the
# block-translational decision SAD (one patch per block — fast, slightly
# approximate geometry, good when blocks subtend small angles, i.e. real
# frame sizes); "subblock" keeps the exact per-subblock reprojection in
# the diamonds (used below a minimum frame height where a block spans a
# large latitude range and the translational approximation misranks).
BLOCK_EVAL_MIN_HEIGHT = 512


def _make_eval_multi_uncached(reproj: MVReprojection, model_id: int,
                              block_size: int, bit_depth: int, epipole=None):
    s = block_size
    if reproj.height < BLOCK_EVAL_MIN_HEIGHT:
        return _make_eval_subblock(reproj, model_id, s, bit_depth, epipole)

    @jax.jit
    def eval_cands(orig, ref_padded, mv_cands):
        # block-translational decision SAD (see
        # MVReprojection.reproject_block_centers): each block's first
        # 4-pixel row band, sampled at the block-center's reprojected
        # displacement with the exact 8-tap filter — one patch per
        # (candidate, BLOCK) instead of per 4x4 subblock, which removes
        # the per-subblock superpatch-load/roll/scalar-stream overhead
        # that dominates the search kernel
        h, w = orig.shape
        bands = orig.reshape(h // s, s, w)[:, 0:4].reshape(-1, w)
        pos_k = jnp.stack([
            reproj.reproject_block_centers(model_id, mv_cands[k], s,
                                           epipole)
            for k in range(mv_cands.shape[0])])
        sads = mm_mc.sad_block_positions(ref_padded, bands, pos_k,
                                         MC_MARGIN, s, bit_depth)
        return sads * (s // 4)            # scale to full-block SAD range

    return eval_cands


def _merged_center_positions(reproj: MVReprojection,
                             active_models: list[int], s: int,
                             epipoles: dict | None, idx_f, stack_f
                             ) -> jnp.ndarray:
    """Block-translational analog of _merged_positions: per-block center
    reprojection of each model, selected by idx_f -> (nby, nbx, 2)."""
    pos_all = jnp.stack([
        reproj.reproject_block_centers(m, stack_f[i], s,
                                       (epipoles or {}).get(m))
        for i, m in enumerate(active_models)])
    return jnp.take_along_axis(
        pos_all, idx_f[None, :, :, None].astype(jnp.int32), axis=0)[0]


def _block_bands(plane: jnp.ndarray, s: int) -> jnp.ndarray:
    """Each block row's first 4-pixel band, stacked: (nby*4, W)."""
    h, w = plane.shape
    return plane.reshape(h // s, s, w)[:, 0:4].reshape(-1, w)


def _sad_fields_block(reproj: MVReprojection, active_models: list[int],
                      ref_padded, orig_bands, s: int,
                      epipoles: dict | None, fields, bit_depth: int
                      ) -> jnp.ndarray:
    """Block-translational field SADs: ONE fused kernel launch for all
    (idx_f, stack_f) fields; scaled to full-block SAD range."""
    pos_k = jnp.stack([
        _merged_center_positions(reproj, active_models, s, epipoles, i, st)
        for i, st in fields])
    return mm_mc.sad_block_positions(ref_padded, orig_bands, pos_k,
                                     MC_MARGIN, s, bit_depth) * (s // 4)


def _band_sad_blocks(bands: jnp.ndarray, orig_bands: jnp.ndarray,
                     s: int) -> jnp.ndarray:
    """Per-block SAD from predicted/original band planes (nby*4, nbx*s),
    scaled to full-block range."""
    d = jnp.abs(bands - orig_bands)
    hb, w = d.shape
    return d.reshape(hb // 4, 4, w // s, s).sum(axis=(1, 3)) * (s // 4)


def _make_eval_subblock(reproj: MVReprojection, model_id: int,
                        block_size: int, bit_depth: int, epipole=None):
    """Exact per-subblock diamond eval (fused multi-candidate 8-tap SAD
    kernel on the row/col-subsampled subblock grid)."""
    if model_id in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT, M.MPA_TOP_BOTTOM):
        reproj.mpa_cache(model_id)
    row_step = SAD_ROW_STEP if block_size // 4 >= SAD_ROW_STEP else 1
    col_step = SAD_COL_STEP if block_size // 4 >= 2 * SAD_COL_STEP else 1

    @jax.jit
    def eval_cands(orig, ref_padded, mv_cands):
        orig_sub = _subsample_rows(orig, row_step, col_step)

        def one_pos(mvs):
            if model_id == M.CLASSIC:
                pos = mm_mc.classic_positions(reproj.offset, reproj.width,
                                              reproj.height, mvs,
                                              block_size, row_step)
            else:
                pos = reproj.reproject_frame(model_id, mvs, block_size,
                                             epipole, row_step)
            if col_step > 1:
                pos = pos[:, ::col_step]
            return pos
        pos_k = jnp.stack([one_pos(mv_cands[k])
                           for k in range(mv_cands.shape[0])])
        return _sad_fields_bilin(ref_padded, orig_sub, pos_k, block_size,
                                 row_step, col_step, exact=True,
                                 bit_depth=bit_depth)

    return eval_cands


def diamond_search(eval_multi, orig, ref_padded, mv_init: jnp.ndarray,
                   steps=(64, 32, 16, 8, 4, 2)) -> tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """Batched diamond refinement in 1/16-pel units (steps 64..16 are
    integer-pel, below is fractional).  All blocks refine simultaneously;
    each step evaluates the 8 neighbors of every block in one launch (the
    center's SAD is carried from the previous step)."""
    mv = mv_init.astype(jnp.int32)
    best = None
    plus = np.array([(0, -1), (-1, 0), (1, 0), (0, 1)], dtype=np.int32)
    plus_c = np.array([(0, 0), (0, -1), (-1, 0), (1, 0), (0, 1)],
                      dtype=np.int32)
    for i, step in enumerate(steps):
        if best is None:
            # first step: center + plus (5 evals; the full 9-point square
            # buys <0.1% SAD for +80% evals at this stage)
            cands = mv[None] + jnp.asarray(plus_c * step)[:, None, None, :]
            sads = eval_multi(orig, ref_padded, cands)   # (5, nby, nbx)
        else:
            # refinement steps use the 4-point plus pattern (the TZ small
            # diamond) — half the evaluations of the full square
            cands = mv[None] + jnp.asarray(
                plus * step)[:, None, None, :]
            sads = eval_multi(orig, ref_padded, cands)   # (4, nby, nbx)
            cands = jnp.concatenate([mv[None], cands])
            sads = jnp.concatenate([best[None], sads])
        k = jnp.argmin(sads, axis=0)                     # (nby, nbx)
        mv = jnp.take_along_axis(
            cands, k[None, ..., None].astype(jnp.int32), axis=0)[0]
        best = jnp.min(sads, axis=0)
    return mv, best


def search_models(reproj: MVReprojection, active_models: list[int],
                  orig_y: jnp.ndarray, ref_y: jnp.ndarray,
                  classic_mv: jnp.ndarray, classic_sad: jnp.ndarray,
                  block_size: int, bit_depth: int, lam_bits: float,
                  epipoles: dict | None = None, wrap_around: bool = False,
                  steps=(64, 32, 16, 8, 4),  # stops at quarter-pel (VTM-like)
                  seed_stack=None):
    """Search every active non-classic model and pick the per-block best
    model by SAD + lambda*bits(model index).  Diamonds seed from zero MV
    (the natural origin in each model's own domain) or, when seed_stack
    (n_models, nby, nbx, 2) is given, from the previous frame's per-model
    MV field — the temporal predictor lets the refinement start near the
    optimum with fewer steps (the reference's ME also seeds from
    neighbouring/temporal predictors, InterSearch::xSetSearchRange).

    Returns (model_idx_grid (nby, nbx) int32 index into active_models,
             mvs_per_model dict, sad_per_model dict)."""
    refp = pad_ref(ref_y, MC_MARGIN, wrap_around)
    mvs = {M.CLASSIC: classic_mv}
    # re-evaluate the classic candidate through the same bilinear
    # decision-SAD path the model diamonds use, so the per-block model
    # argmin compares one interpolation domain (classic_sad comes from
    # the exact-filter fractional refine)
    ev_cl = make_eval_multi(reproj, M.CLASSIC, block_size, bit_depth)
    sads = {M.CLASSIC: ev_cl(orig_y, refp, classic_mv[None])[0]}
    for i, model_id in enumerate(active_models):
        if model_id == M.CLASSIC:
            continue
        ep = (epipoles or {}).get(model_id)
        ev = make_eval_multi(reproj, model_id, block_size, bit_depth, ep)
        mv0 = (jnp.zeros_like(classic_mv) if seed_stack is None
               else seed_stack[i].astype(jnp.int32))
        mv, sad = diamond_search(ev, orig_y, refp, mv0, steps)
        mvs[model_id] = mv
        sads[model_id] = sad
    # model cost: unary index bins (reference: CABACReader.cpp:2300 unary
    # over the active-model list)
    costs = []
    for i, model_id in enumerate(active_models):
        bits = i + 1 if i < len(active_models) - 1 else i
        costs.append(sads[model_id] + int(lam_bits * bits))
    idx = jnp.argmin(jnp.stack(costs), axis=0).astype(jnp.int32)
    return idx, mvs, sads


def merged_positions(reproj: MVReprojection, active_models: list[int],
                     model_idx: jnp.ndarray, mvs_stack: jnp.ndarray,
                     block_size: int, epipoles: dict | None = None
                     ) -> jnp.ndarray:
    """Jit-cached wrapper around _merged_positions (one compiled program
    per (model set, block size, epipole) instead of eager per-op
    dispatch)."""
    ep_key = tuple(
        (m, tuple(np.asarray(e, dtype=np.float64).round(12)))
        for m, e in sorted((epipoles or {}).items()))
    key = (_geom_key(reproj), tuple(active_models), block_size, ep_key)
    if key not in _MERGED_CACHE:
        for m in active_models:
            if m in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT, M.MPA_TOP_BOTTOM):
                reproj.mpa_cache(m)      # warm outside the trace
        _MERGED_CACHE[key] = jax.jit(functools.partial(
            _merged_positions, reproj, list(active_models), block_size,
            epipoles))
    return _MERGED_CACHE[key](model_idx, mvs_stack)


_MERGED_CACHE: dict = {}


def _merged_positions(reproj: MVReprojection, active_models: list[int],
                      block_size: int, epipoles: dict | None,
                      model_idx: jnp.ndarray, mvs_stack: jnp.ndarray,
                      row_step: int | None = None) -> jnp.ndarray:
    """Merge per-subblock target positions across models.

    Args:
      model_idx: (nby, nbx) int32 index into active_models per block.
      mvs_stack: (n_models, nby, nbx, 2) MV of each model for each block.
      row_step: optional subblock-row subsampling (search-time SADs).
    Returns (nsy, nsx, 2) int32 positions."""
    row_step = 1 if row_step is None else row_step
    pos_all = []
    for i, model_id in enumerate(active_models):
        if model_id == M.CLASSIC:
            pos = mm_mc.classic_positions(reproj.offset, reproj.width,
                                          reproj.height, mvs_stack[i],
                                          block_size, row_step)
        else:
            ep = (epipoles or {}).get(model_id)
            pos = reproj.reproject_frame(model_id, mvs_stack[i], block_size,
                                         ep, row_step)
        pos_all.append(pos)
    pos_all = jnp.stack(pos_all)                     # (n, nsy, nsx, 2)
    rep = block_size // SUBBLK
    idx_sb = jnp.repeat(jnp.repeat(model_idx, rep, 0), rep, 1)
    if row_step > 1:
        idx_sb = idx_sb[::row_step]
    return jnp.take_along_axis(
        pos_all, idx_sb[None, :, :, None].astype(jnp.int32), axis=0
    )[0]


def predict_from_positions(positions: jnp.ndarray, ref_y, ref_u, ref_v,
                           bit_depth: int, wrap_around: bool = False):
    """One unified MC pass for all models: luma + chroma planes from the
    merged per-subblock position tensor."""
    ry = pad_ref(ref_y, MC_MARGIN, wrap_around)
    ru = pad_ref(ref_u, MC_MARGIN // 2, wrap_around)
    rv = pad_ref(ref_v, MC_MARGIN // 2, wrap_around)
    pred_y = mm_mc.mc_luma_positions(ry, positions, MC_MARGIN, bit_depth)
    # chroma: 2x2 subblocks; position tensor reinterpreted at 1/32 chroma
    pred_u = mm_mc.mc_chroma_positions(ru, positions, MC_MARGIN // 2,
                                       bit_depth)
    pred_v = mm_mc.mc_chroma_positions(rv, positions, MC_MARGIN // 2,
                                       bit_depth)
    return pred_y, pred_u, pred_v


def reconstruct_p_frame_mm(reproj: MVReprojection, active_models: list[int],
                           model_idx: jnp.ndarray, mvs_stack: jnp.ndarray,
                           lev_y, lev_u, lev_v, ref_y, ref_u, ref_v,
                           qp: int, block_size: int, bit_depth: int = 8,
                           epipoles: dict | None = None,
                           wrap_around: bool = False):
    """Shared decoder/encoder reconstruction for multi-model P frames."""
    s = block_size
    sc = s // 2
    h, w = ref_y.shape
    nby, nbx = h // s, w // s
    positions = merged_positions(reproj, active_models, model_idx, mvs_stack,
                                 s, epipoles)
    pred_y, pred_u, pred_v = predict_from_positions(
        positions, ref_y, ref_u, ref_v, bit_depth, wrap_around)

    def rec_plane(pred, lev, size):
        log2s = size.bit_length() - 1
        pb = _to_blocks(pred, size)
        dq = quant.dequantize(lev.reshape(-1, size, size), qp, log2s, log2s,
                              bit_depth)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
        return _from_blocks(rec, nby, nbx)

    return dict(y=rec_plane(pred_y, lev_y, s),
                u=rec_plane(pred_u, lev_u, sc),
                v=rec_plane(pred_v, lev_v, sc))


def encode_p_frame_mm(reproj: MVReprojection, active_models: list[int],
                      orig_y, orig_u, orig_v, ref_y, ref_u, ref_v,
                      qp: int, block_size: int = 16, bit_depth: int = 8,
                      search_range: int = 24,
                      epipoles: dict | None = None,
                      wrap_around: bool = False):
    """Full multi-model P encode.  Returns (model_idx, mvs_stack, levels,
    recon)."""
    from ...encoder import me as me_mod
    s = block_size
    lam = quant.lambda_from_qp(qp, intra=False)
    lam_bits = lam ** 0.5 * 4.0

    refp = pad_ref(ref_y, MC_MARGIN, wrap_around)
    mv_int, _ = me_mod.hierarchical_search(orig_y, refp, s, search_range,
                                           MC_MARGIN, int(lam ** 0.5 * 16))
    classic_mv, classic_sad = me_mod.fractional_refine(
        orig_y, refp, mv_int, s, MC_MARGIN, bit_depth)

    model_idx, mvs, sads = search_models(
        reproj, active_models, orig_y, ref_y, classic_mv, classic_sad,
        s, bit_depth, lam_bits, epipoles, wrap_around)
    mvs_stack = jnp.stack([mvs[m] for m in active_models])

    # residual + recon via the shared path (bit-exact with the decoder)
    positions = merged_positions(reproj, active_models, model_idx, mvs_stack,
                                 s, epipoles)
    pred_y, pred_u, pred_v = predict_from_positions(
        positions, ref_y, ref_u, ref_v, bit_depth, wrap_around)
    lev_y, _ = _residual_pass(orig_y, pred_y, s, qp, bit_depth)
    lev_u, _ = _residual_pass(orig_u, pred_u, s // 2, qp, bit_depth)
    lev_v, _ = _residual_pass(orig_v, pred_v, s // 2, qp, bit_depth)
    recon = reconstruct_p_frame_mm(
        reproj, active_models, model_idx, mvs_stack, lev_y, lev_u, lev_v,
        ref_y, ref_u, ref_v, qp, s, bit_depth, epipoles, wrap_around)
    return model_idx, mvs_stack, lev_y, lev_u, lev_v, recon


# ---------------------------------------------------- fused frame programs
#
# The TPU sits behind a network tunnel (~10-50 ms per dispatch round trip;
# utils/xfer.py).  The eager formulation above issues hundreds of small
# launches per frame (per-model diamond steps, argmins, merges), each paying
# tunnel latency.  These wrappers trace the WHOLE per-frame search — classic
# hierarchical ME + fractional refine + every model's diamond refinement +
# the model argmin (+ the uni/bi decision for B) — as ONE jit program, and
# the residual/recon tail as one more.
#
# Bit-exactness note: the float32 reprojection that produces the normative
# per-subblock POSITIONS stays in the shared `merged_positions` program
# (same compiled program on encoder and decoder, so identical float
# behavior); the fused programs only (a) pick MVs/models — any float drift
# there can only change a *decision*, never break decode — and (b) run
# integer-exact math (MC filters, transform/quant, deblock) downstream of
# the positions tensor, which XLA cannot change.


def _warm_models(reproj: MVReprojection, active_models) -> None:
    for m in active_models:
        if m in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT, M.MPA_TOP_BOTTOM):
            reproj.mpa_cache(m)


def _eps_key(epipoles) -> tuple:
    return tuple((m, tuple(np.asarray(e, dtype=np.float64).round(12)))
                 for m, e in sorted((epipoles or {}).items()))


_FUSED_CACHE: dict = {}


P_SEED_STEPS = (32, 16, 8, 4)   # temporally-seeded P-anchor model search
B_SEED_STEPS = (8, 4)           # temporally-seeded B model search


def search_p_mm(reproj: MVReprojection, active_models: list[int],
                orig_y, ref_y, qp: int, block_size: int, bit_depth: int,
                search_range: int, epipoles: dict | None = None,
                wrap_around: bool = False, seed=None):
    """One-jit P-frame motion/model search.  Returns (model_idx (nby,nbx),
    mvs_stack (n_models,nby,nbx,2)).  With `seed` (the previous frame's
    per-model MV stack), diamonds start from the temporal predictor and
    run the reduced step ladder."""
    key = ("psearch", _geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, search_range, wrap_around,
           _eps_key(epipoles), seed is not None)
    if key not in _FUSED_CACHE:
        from ...encoder import me as me_mod
        _warm_models(reproj, active_models)
        s = block_size
        lam = quant.lambda_from_qp(qp, intra=False)
        lam_bits = lam ** 0.5 * 4.0
        lam16 = int(lam ** 0.5 * 16)
        seeded = seed is not None
        steps = P_SEED_STEPS if seeded else (64, 32, 16, 8, 4)

        @jax.jit
        def fn(oy, ry, sd):
            refp = pad_ref(ry, MC_MARGIN, wrap_around)
            mv_int, _ = me_mod.hierarchical_search(oy, refp, s,
                                                   search_range, MC_MARGIN,
                                                   lam16)
            cmv, csad = me_mod.fractional_refine(oy, refp, mv_int, s,
                                                 MC_MARGIN, bit_depth)
            idx, mvs, _ = search_models(
                reproj, active_models, oy, ry, cmv, csad, s, bit_depth,
                lam_bits, epipoles, wrap_around, steps,
                sd if seeded else None)
            return idx, jnp.stack([mvs[m] for m in active_models])

        _FUSED_CACHE[key] = fn
    if seed is None:
        # dummy, unused when unseeded — keeps the jit arity uniform
        h, w = orig_y.shape
        seed = jnp.zeros((len(active_models), h // block_size,
                          w // block_size, 2), jnp.int32)
    return _FUSED_CACHE[key](orig_y, ref_y, seed)


def search_p_mm_merge(reproj: MVReprojection, active_models: list[int],
                      orig_y, ref_y, qp: int, block_size: int,
                      bit_depth: int, search_range: int,
                      epipoles: dict | None = None,
                      wrap_around: bool = False, seed=None):
    """One-jit P-frame MM search with merge-candidate SADs: the
    search_p_mm program plus, for each candidate field (neighbor shifts
    of the selected (model, mv) grid and zero-CLASSIC), a reprojection +
    MC + SAD pass.  Candidates applied at the CURRENT block's location go
    through the reprojection there — a neighbor's (model, mv) produces
    different target positions at this block (reference: merge candidates
    carry their motion model, UnitTools.cpp:872-885).

    Returns (model_idx, mvs_stack, sad_sel, cand_idx (K,nby,nbx),
    cand_mv (K,nby,nbx,2), cand_sads (K,nby,nbx))."""
    key = ("psearch_merge", _geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, search_range, wrap_around,
           _eps_key(epipoles), seed is not None)
    if key not in _FUSED_CACHE:
        from ...encoder import me as me_mod
        _warm_models(reproj, active_models)
        s = block_size
        lam = quant.lambda_from_qp(qp, intra=False)
        lam_bits = lam ** 0.5 * 4.0
        lam16 = int(lam ** 0.5 * 16)
        seeded = seed is not None
        p_steps = P_SEED_STEPS if seeded else (64, 32, 16, 8, 4)

        def shift2(f, dy, dx):
            nby, nbx = f.shape[:2]
            pad = ((1, 1), (1, 1)) + ((0, 0),) * (f.ndim - 2)
            p = jnp.pad(f, pad)
            start = (1 + dy, 1 + dx) + (0,) * (f.ndim - 2)
            return jax.lax.dynamic_slice(p, start, f.shape)

        @jax.jit
        def fn(oy, ry, sd):
            refp = pad_ref(ry, MC_MARGIN, wrap_around)
            mv_int, _ = me_mod.hierarchical_search(oy, refp, s,
                                                   search_range, MC_MARGIN,
                                                   lam16)
            cmv, csad = me_mod.fractional_refine(oy, refp, mv_int, s,
                                                 MC_MARGIN, bit_depth)
            idx, mvs, _ = search_models(
                reproj, active_models, oy, ry, cmv, csad, s, bit_depth,
                lam_bits, epipoles, wrap_around, p_steps,
                sd if seeded else None)
            stack = jnp.stack([mvs[m] for m in active_models])

            mv_sel = jnp.take_along_axis(
                stack, idx[None, :, :, None].astype(jnp.int32), axis=0)[0]
            fields = [(idx, stack)]
            cand_idx, cand_mv = [], []
            for (dy, dx) in ((0, -1), (-1, 0), (-1, 1)):
                idx_s = shift2(idx, dy, dx)
                stack_s = jnp.stack([shift2(stack[i], dy, dx)
                                     for i in range(stack.shape[0])])
                cand_idx.append(idx_s)
                cand_mv.append(shift2(mv_sel, dy, dx))
                fields.append((idx_s, stack_s))
            # zero-CLASSIC candidate (active_models[0] is CLASSIC)
            zi = jnp.zeros_like(idx)
            zs = jnp.zeros_like(stack)
            cand_idx.append(zi)
            cand_mv.append(jnp.zeros_like(mv_sel))
            fields.append((zi, zs))
            if reproj.height >= BLOCK_EVAL_MIN_HEIGHT:
                # block-translational field SADs: one fused launch, no
                # per-field full-grid reprojections (same decision
                # domain as the diamond evals)
                all_sads = _sad_fields_block(
                    reproj, active_models, refp, _block_bands(oy, s), s,
                    epipoles, fields, bit_depth)
            else:
                row_step = SAD_ROW_STEP if s // 4 >= SAD_ROW_STEP else 1
                oy_sub = _subsample_rows(oy, row_step)
                pos_fields = [
                    _merged_positions(reproj, active_models, s, epipoles,
                                      i, st, row_step)
                    for i, st in fields]
                all_sads = _sad_fields_bilin(refp, oy_sub,
                                             jnp.stack(pos_fields), s,
                                             row_step, exact=True,
                                             bit_depth=bit_depth)
            sad_sel = all_sads[0]
            cand_sads = all_sads[1:]
            return (idx, stack, sad_sel, jnp.stack(cand_idx),
                    jnp.stack(cand_mv), cand_sads)

        _FUSED_CACHE[key] = fn
    if seed is None:
        h, w = orig_y.shape
        seed = jnp.zeros((len(active_models), h // block_size,
                          w // block_size, 2), jnp.int32)
    return _FUSED_CACHE[key](orig_y, ref_y, seed)


def search_qt_parent_mm(reproj: MVReprojection, active_models: list[int],
                        orig_y, ref_y, idx_child, mv_child, idx_own,
                        mv_own, qp: int, block_size: int, bit_depth: int,
                        epipoles: dict | None = None,
                        wrap_around: bool = False):
    """Parent-level MM evaluation for the quadtree lattice — ONE jit
    program (reference: the QTMT recursion reuses child information
    through EncModeCtrl caching, EncCu.cpp:499).

    Candidates for each parent block are the four child-quadrant
    selections, zero-CLASSIC AND this size's own flat-search selection
    (idx_own/mv_own from search_p_mm — without it, a noisy child level
    degrades every ancestor and the tree can lose to the flat grid); the
    best becomes this level's selection and three neighbor shifts of it
    are evaluated for merge.

    idx_child/mv_child: (2*nby, 2*nbx[, 2]) child-level selected grids.
    Returns (idx, mv_sel, sad_sel, cand_idx (9,nby,nbx),
    cand_mv (9,nby,nbx,2), cand_sads (9,nby,nbx)) — candidate fields are
    [3 neighbor shifts, zero, 4 child quadrants, own-search]."""
    key = ("qtparent", _geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, wrap_around, _eps_key(epipoles))
    if key not in _FUSED_CACHE:
        _warm_models(reproj, active_models)
        s = block_size
        n = len(active_models)

        def shift2(f, dy, dx):
            pad = ((1, 1), (1, 1)) + ((0, 0),) * (f.ndim - 2)
            p = jnp.pad(f, pad)
            start = (1 + dy, 1 + dx) + (0,) * (f.ndim - 2)
            return jax.lax.dynamic_slice(p, start, f.shape)

        @jax.jit
        def fn(oy, ry, idx_c, mv_c, idx_o, mv_o):
            refp = pad_ref(ry, MC_MARGIN, wrap_around)
            use_block = reproj.height >= BLOCK_EVAL_MIN_HEIGHT
            row_step = SAD_ROW_STEP if s // 4 >= SAD_ROW_STEP else 1
            oy_sub = _subsample_rows(oy, row_step)
            bands = _block_bands(oy, s)

            def to_stack(idx_f, mv_f):
                onehot = (idx_f[None]
                          == jnp.arange(n, dtype=jnp.int32)[:, None, None])
                return jnp.where(onehot[..., None], mv_f[None],
                                 jnp.zeros_like(mv_f)[None])

            def field_sads(pairs):
                fields = [(i, to_stack(i, m)) for i, m in pairs]
                if use_block:
                    return _sad_fields_block(reproj, active_models, refp,
                                             bands, s, epipoles, fields,
                                             bit_depth)
                pos = [_merged_positions(reproj, active_models, s,
                                         epipoles, i, st, row_step)
                       for i, st in fields]
                return _sad_fields_bilin(refp, oy_sub, jnp.stack(pos), s,
                                         row_step, exact=True,
                                         bit_depth=bit_depth)

            quads = [(idx_c[dy::2, dx::2], mv_c[dy::2, dx::2])
                     for dy in (0, 1) for dx in (0, 1)]
            zi = jnp.zeros_like(quads[0][0])
            zm = jnp.zeros_like(quads[0][1])
            own = quads + [(zi, zm), (idx_o, mv_o)]
            own_sads = field_sads(own)
            k = jnp.argmin(own_sads, axis=0)
            idx = jnp.take_along_axis(
                jnp.stack([i for i, _ in own]),
                k[None].astype(jnp.int32), axis=0)[0]
            mv_sel = jnp.take_along_axis(
                jnp.stack([m for _, m in own]),
                k[None, ..., None].astype(jnp.int32), axis=0)[0]
            sad_sel = jnp.min(own_sads, axis=0)
            cand_idx, cand_mv, shifted = [], [], []
            for (dy, dx) in ((0, -1), (-1, 0), (-1, 1)):
                i_s = shift2(idx, dy, dx)
                m_s = shift2(mv_sel, dy, dx)
                cand_idx.append(i_s)
                cand_mv.append(m_s)
                shifted.append((i_s, m_s))
            shift_sads = field_sads(shifted)
            cand_sads = [shift_sads[i] for i in range(3)]
            for (i_q, m_q), sd in zip(own, own_sads):
                cand_idx.append(i_q)
                cand_mv.append(m_q)
                cand_sads.append(sd)
            return (idx, mv_sel, sad_sel, jnp.stack(cand_idx),
                    jnp.stack(cand_mv), jnp.stack(cand_sads))

        _FUSED_CACHE[key] = fn
    return _FUSED_CACHE[key](orig_y, ref_y, idx_child, mv_child, idx_own,
                             mv_own)


def search_b_mm(reproj: MVReprojection, active_models: list[int],
                orig_y, ref0_y, ref1_y, qp: int, block_size: int,
                bit_depth: int, search_range: int, epipoles0=None,
                epipoles1=None, wrap_around: bool = False,
                small_range: bool = True, seed=None):
    """One-jit B-frame per-list model search + uni/bi decision.  Returns
    (idx0, idx1, stack0, stack1, dirs)."""
    key = ("bsearch", _geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, search_range, wrap_around, small_range,
           _eps_key(epipoles0), _eps_key(epipoles1), seed is not None)
    if key not in _FUSED_CACHE:
        from ...encoder import me as me_mod
        _warm_models(reproj, active_models)
        s = block_size
        lam = quant.lambda_from_qp(qp, intra=False)
        lam_bits = lam ** 0.5 * 4.0
        lam16 = int(lam ** 0.5 * 16)
        mv_bits = int(lam ** 0.5 * 8)
        seeded = seed is not None
        # models stop at quarter-pel (VTM-like search precision); a
        # temporal seed shrinks the ladder further
        steps = (B_SEED_STEPS if seeded else (16, 8, 4)) if small_range \
            else (64, 32, 16, 8, 4)

        @jax.jit
        def fn(oy, r0y, r1y, sd):
            per_list = []
            for ry, eps in ((r0y, epipoles0), (r1y, epipoles1)):
                refp = pad_ref(ry, MC_MARGIN, wrap_around)
                mv_int, _ = me_mod.hierarchical_search(
                    oy, refp, s, search_range, MC_MARGIN, lam16)
                cmv, csad = me_mod.fractional_refine(oy, refp, mv_int, s,
                                                     MC_MARGIN, bit_depth)
                idx, mvs, sads = search_models(
                    reproj, active_models, oy, ry, cmv, csad, s, bit_depth,
                    lam_bits, eps, wrap_around, steps,
                    sd if seeded else None)
                stack = jnp.stack([mvs[m] for m in active_models])
                best = jnp.min(jnp.stack([sads[m] for m in active_models]),
                               axis=0)
                per_list.append((idx, stack, best))
            idx0, stack0, sad0 = per_list[0]
            idx1, stack1, sad1 = per_list[1]
            r0p = pad_ref(r0y, MC_MARGIN, wrap_around)
            r1p = pad_ref(r1y, MC_MARGIN, wrap_around)
            if reproj.height >= BLOCK_EVAL_MIN_HEIGHT:
                # bi decision on block-translational bands (decision-only;
                # the normative prediction runs full-res per subblock in
                # the finish program)
                ob = _block_bands(oy, s)
                c0 = _merged_center_positions(reproj, active_models, s,
                                              epipoles0, idx0, stack0)
                c1 = _merged_center_positions(reproj, active_models, s,
                                              epipoles1, idx1, stack1)
                b0 = mm_mc.mc_block_positions(r0p, c0[None], MC_MARGIN, s,
                                              bit_depth)[0]
                b1 = mm_mc.mc_block_positions(r1p, c1[None], MC_MARGIN, s,
                                              bit_depth)[0]
                sad_bi = _band_sad_blocks((b0 + b1 + 1) >> 1, ob,
                                          s) + mv_bits
                u0 = _band_sad_blocks(b0, ob, s)
                u1 = _band_sad_blocks(b1, ob, s)
                dirs = jnp.argmin(jnp.stack([u0, u1, sad_bi]), axis=0
                                  ).astype(jnp.int32)
                return idx0, idx1, stack0, stack1, dirs
            # bi decision on row-subsampled MC
            row_step = SAD_ROW_STEP if s // 4 >= SAD_ROW_STEP else 1
            oy_sub = _subsample_rows(oy, row_step)
            pos0 = _merged_positions(reproj, active_models, s, epipoles0,
                                     idx0, stack0, row_step)
            pos1 = _merged_positions(reproj, active_models, s, epipoles1,
                                     idx1, stack1, row_step)
            p0 = mm_mc.mc_luma_positions(r0p, pos0, MC_MARGIN, bit_depth)
            p1 = mm_mc.mc_luma_positions(r1p, pos1, MC_MARGIN, bit_depth)
            bi = (p0 + p1 + 1) >> 1
            sad_bi = _block_sad_sub(jnp.abs(oy_sub - bi), s,
                                    row_step) + mv_bits
            dirs = jnp.argmin(jnp.stack([sad0, sad1, sad_bi]), axis=0
                              ).astype(jnp.int32)
            return idx0, idx1, stack0, stack1, dirs

        _FUSED_CACHE[key] = fn
    if seed is None:
        h, w = orig_y.shape
        seed = jnp.zeros((len(active_models), h // block_size,
                          w // block_size, 2), jnp.int32)
    return _FUSED_CACHE[key](orig_y, ref0_y, ref1_y, seed)


def search_b_mm_merge(reproj: MVReprojection, active_models: list[int],
                      orig_y, ref0_y, ref1_y, qp: int, block_size: int,
                      bit_depth: int, search_range: int, epipoles0=None,
                      epipoles1=None, wrap_around: bool = False,
                      small_range: bool = True, seed=None):
    """search_b_mm plus whole-motion merge-candidate SADs: for each
    neighbor shift of the selected per-list (model, mv) grids and dirs,
    one positions+MC+combine+SAD pass per list (candidates applied at
    the current block go through the reprojection there).  Returns
    (idx0, idx1, stack0, stack1, dirs, sad_sel,
     cand_idx0/idx1 (K,..), cand_mv0/mv1 (K,..,2), cand_dirs, cand_sads).
    """
    key = ("bsearch_merge", _geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, search_range, wrap_around, small_range,
           _eps_key(epipoles0), _eps_key(epipoles1), seed is not None)
    if key not in _FUSED_CACHE:
        from ...encoder import me as me_mod
        _warm_models(reproj, active_models)
        s = block_size
        lam = quant.lambda_from_qp(qp, intra=False)
        lam_bits = lam ** 0.5 * 4.0
        lam16 = int(lam ** 0.5 * 16)
        mv_bits = int(lam ** 0.5 * 8)
        seeded = seed is not None
        # models stop at quarter-pel (VTM-like search precision); a
        # temporal seed shrinks the ladder further
        steps = (B_SEED_STEPS if seeded else (16, 8, 4)) if small_range \
            else (64, 32, 16, 8, 4)

        def shift2(f, dy, dx):
            pad = ((1, 1), (1, 1)) + ((0, 0),) * (f.ndim - 2)
            p = jnp.pad(f, pad)
            start = (1 + dy, 1 + dx) + (0,) * (f.ndim - 2)
            return jax.lax.dynamic_slice(p, start, f.shape)

        @jax.jit
        def fn(oy, r0y, r1y, sd):
            per_list = []
            for ry, eps in ((r0y, epipoles0), (r1y, epipoles1)):
                refp = pad_ref(ry, MC_MARGIN, wrap_around)
                mv_int, _ = me_mod.hierarchical_search(
                    oy, refp, s, search_range, MC_MARGIN, lam16)
                cmv, csad = me_mod.fractional_refine(oy, refp, mv_int, s,
                                                     MC_MARGIN, bit_depth)
                idx, mvs, sads = search_models(
                    reproj, active_models, oy, ry, cmv, csad, s, bit_depth,
                    lam_bits, eps, wrap_around, steps,
                    sd if seeded else None)
                stack = jnp.stack([mvs[m] for m in active_models])
                best = jnp.min(jnp.stack([sads[m] for m in active_models]),
                               axis=0)
                per_list.append((idx, stack, best))
            idx0, stack0, sad0 = per_list[0]
            idx1, stack1, sad1 = per_list[1]
            r0p = pad_ref(r0y, MC_MARGIN, wrap_around)
            r1p = pad_ref(r1y, MC_MARGIN, wrap_around)

            mv_sel0 = jnp.take_along_axis(
                stack0, idx0[None, :, :, None].astype(jnp.int32), 0)[0]
            mv_sel1 = jnp.take_along_axis(
                stack1, idx1[None, :, :, None].astype(jnp.int32), 0)[0]
            if reproj.height >= BLOCK_EVAL_MIN_HEIGHT:
                # block-translational bands: per list ONE multi-candidate
                # band-MC launch for (selection + 3 neighbor shifts)
                ob = _block_bands(oy, s)

                def list_bands(eps, idx_f, stack_f):
                    fields = [(idx_f, stack_f)]
                    for (dy, dx) in ((0, -1), (-1, 0), (-1, 1)):
                        fields.append(
                            (shift2(idx_f, dy, dx),
                             jnp.stack([shift2(stack_f[i], dy, dx)
                                        for i in range(stack_f.shape[0])
                                        ])))
                    pos = jnp.stack([
                        _merged_center_positions(reproj, active_models,
                                                 s, eps, i, st)
                        for i, st in fields])
                    return pos

                b0 = mm_mc.mc_block_positions(
                    r0p, list_bands(epipoles0, idx0, stack0), MC_MARGIN,
                    s, bit_depth)
                b1 = mm_mc.mc_block_positions(
                    r1p, list_bands(epipoles1, idx1, stack1), MC_MARGIN,
                    s, bit_depth)
                sad_bi = _band_sad_blocks((b0[0] + b1[0] + 1) >> 1, ob,
                                          s) + mv_bits
                dirs = jnp.argmin(jnp.stack(
                    [_band_sad_blocks(b0[0], ob, s),
                     _band_sad_blocks(b1[0], ob, s), sad_bi]),
                    axis=0).astype(jnp.int32)

                def sel_band(p0x, p1x, d):
                    dd = jnp.repeat(jnp.repeat(d, 4, 0), s, 1)
                    avg = (p0x + p1x + 1) >> 1
                    return jnp.where(dd == 0, p0x,
                                     jnp.where(dd == 1, p1x, avg))

                sad_sel = _band_sad_blocks(
                    sel_band(b0[0], b1[0], dirs), ob, s)
                ci0, ci1, cm0, cm1, cd, cs = [], [], [], [], [], []
                for j, (dy, dx) in enumerate(((0, -1), (-1, 0), (-1, 1))):
                    ds = shift2(dirs, dy, dx)
                    cs.append(_band_sad_blocks(
                        sel_band(b0[j + 1], b1[j + 1], ds), ob, s))
                    ci0.append(shift2(idx0, dy, dx))
                    ci1.append(shift2(idx1, dy, dx))
                    cm0.append(shift2(mv_sel0, dy, dx))
                    cm1.append(shift2(mv_sel1, dy, dx))
                    cd.append(ds)
                return (idx0, idx1, stack0, stack1, dirs, sad_sel,
                        jnp.stack(ci0), jnp.stack(ci1), jnp.stack(cm0),
                        jnp.stack(cm1), jnp.stack(cd), jnp.stack(cs))

            row_step = SAD_ROW_STEP if s // 4 >= SAD_ROW_STEP else 1
            oy_sub = _subsample_rows(oy, row_step)

            def field_pred(rp, eps, idx_f, stack_f, step=1):
                pos = _merged_positions(reproj, active_models, s, eps,
                                        idx_f, stack_f,
                                        step if step > 1 else None)
                return mm_mc.mc_luma_positions(rp, pos, MC_MARGIN,
                                               bit_depth)

            # decision-only: bi choice + selected-SAD on subsampled MC
            p0 = field_pred(r0p, epipoles0, idx0, stack0, row_step)
            p1 = field_pred(r1p, epipoles1, idx1, stack1, row_step)
            bi = (p0 + p1 + 1) >> 1
            sad_bi = _block_sad_sub(jnp.abs(oy_sub - bi), s,
                                    row_step) + mv_bits
            dirs = jnp.argmin(jnp.stack(
                [_block_sad_sub(jnp.abs(oy_sub - p0), s, row_step),
                 _block_sad_sub(jnp.abs(oy_sub - p1), s, row_step),
                 sad_bi]), axis=0).astype(jnp.int32)

            def sel_d(p0x, p1x, d, sub=1):
                ky = s if sub == 1 else (s // 4 // sub) * 4
                dd = jnp.repeat(jnp.repeat(d, ky, 0), s, 1)
                avg = (p0x + p1x + 1) >> 1
                return jnp.where(dd == 0, p0x, jnp.where(dd == 1, p1x, avg))

            sad_sel = _block_sad_sub(
                jnp.abs(oy_sub - sel_d(p0, p1, dirs, row_step)), s,
                row_step)
            mv_sel0 = jnp.take_along_axis(
                stack0, idx0[None, :, :, None].astype(jnp.int32), 0)[0]
            mv_sel1 = jnp.take_along_axis(
                stack1, idx1[None, :, :, None].astype(jnp.int32), 0)[0]
            ci0, ci1, cm0, cm1, cd, cs = [], [], [], [], [], []
            for (dy, dx) in ((0, -1), (-1, 0), (-1, 1)):
                i0s = shift2(idx0, dy, dx)
                i1s = shift2(idx1, dy, dx)
                s0s = jnp.stack([shift2(stack0[i], dy, dx)
                                 for i in range(stack0.shape[0])])
                s1s = jnp.stack([shift2(stack1[i], dy, dx)
                                 for i in range(stack1.shape[0])])
                ds = shift2(dirs, dy, dx)
                pp0 = field_pred(r0p, epipoles0, i0s, s0s, row_step)
                pp1 = field_pred(r1p, epipoles1, i1s, s1s, row_step)
                cs.append(_block_sad_sub(
                    jnp.abs(oy_sub - sel_d(pp0, pp1, ds, row_step)), s,
                    row_step))
                ci0.append(i0s)
                ci1.append(i1s)
                cm0.append(shift2(mv_sel0, dy, dx))
                cm1.append(shift2(mv_sel1, dy, dx))
                cd.append(ds)
            return (idx0, idx1, stack0, stack1, dirs, sad_sel,
                    jnp.stack(ci0), jnp.stack(ci1), jnp.stack(cm0),
                    jnp.stack(cm1), jnp.stack(cd), jnp.stack(cs))

        _FUSED_CACHE[key] = fn
    if seed is None:
        h, w = orig_y.shape
        seed = jnp.zeros((len(active_models), h // block_size,
                          w // block_size, 2), jnp.int32)
    return _FUSED_CACHE[key](orig_y, ref0_y, ref1_y, seed)


def _rec_plane(pred, lev, size, qp, bit_depth, nby, nbx):
    log2s = size.bit_length() - 1
    pb = _to_blocks(pred, size)
    dq = quant.dequantize(lev.reshape(-1, size, size), qp, log2s, log2s,
                          bit_depth)
    r = transforms.inverse_transform(dq, bit_depth=bit_depth)
    rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
    return _from_blocks(rec, nby, nbx)


def enc_finish_p_mm_fused(reproj, active_models, model_idx, mvs_stack,
                          orig, ref, qp: int, block_size: int,
                          bit_depth: int, epipoles=None,
                          wrap_around: bool = False,
                          deblocking: bool = True):
    """enc_finish_p_mm with the merged-positions computation fused into
    the same program (one device dispatch instead of two — the tunnel
    round-trip per dispatch is a measurable frame cost)."""
    key = ("pfinfuse", _geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, wrap_around, deblocking,
           _eps_key(epipoles), orig[0].shape)
    if key not in _FUSED_CACHE:
        _warm_models(reproj, active_models)

        @jax.jit
        def fn(model_idx, mvs_stack, oy, ou, ov, ry, ru, rv):
            positions = _merged_positions(reproj, active_models,
                                          block_size, epipoles,
                                          model_idx, mvs_stack)
            return _p_finish_body(model_idx, mvs_stack, positions, oy,
                                  ou, ov, ry, ru, rv, qp, block_size,
                                  bit_depth, wrap_around, deblocking)

        _FUSED_CACHE[key] = fn
    ly, lu, lv, ry2, ru2, rv2 = _FUSED_CACHE[key](
        model_idx, mvs_stack, orig[0], orig[1], orig[2], ref[0], ref[1],
        ref[2])
    return ly, lu, lv, dict(y=ry2, u=ru2, v=rv2)


def _p_finish_body(model_idx, mvs_stack, positions, oy, ou, ov, ry, ru,
                   rv, qp, block_size, bit_depth, wrap_around,
                   deblocking):
    from .. import deblock as deblock_mod
    s = block_size
    h, w = oy.shape
    nby, nbx = h // s, w // s
    pred_y, pred_u, pred_v = predict_from_positions(
        positions, ry, ru, rv, bit_depth, wrap_around)
    lev_y, _ = _residual_pass(oy, pred_y, s, qp, bit_depth)
    lev_u, _ = _residual_pass(ou, pred_u, s // 2, qp, bit_depth)
    lev_v, _ = _residual_pass(ov, pred_v, s // 2, qp, bit_depth)
    rec_y = _rec_plane(pred_y, lev_y, s, qp, bit_depth, nby, nbx)
    rec_u = _rec_plane(pred_u, lev_u, s // 2, qp, bit_depth, nby, nbx)
    rec_v = _rec_plane(pred_v, lev_v, s // 2, qp, bit_depth, nby, nbx)
    if deblocking:
        sel = jnp.take_along_axis(
            mvs_stack, model_idx[None, :, :, None].astype(jnp.int32),
            axis=0)[0]
        has_resid = (jnp.any(lev_y != 0, axis=(2, 3))
                     | jnp.any(lev_u != 0, axis=(2, 3))
                     | jnp.any(lev_v != 0, axis=(2, 3)))
        bs_v, bs_h = deblock_mod.boundary_strengths_inter(
            sel.astype(jnp.int32), has_resid)
        rec_y, rec_u, rec_v = deblock_mod.deblock_frame(
            rec_y, rec_u, rec_v, bs_v, bs_h, s, qp, bit_depth)
    return lev_y, lev_u, lev_v, rec_y, rec_u, rec_v


def enc_finish_p_mm(model_idx, mvs_stack, positions, orig_y, orig_u, orig_v,
                    ref_y, ref_u, ref_v, qp: int, block_size: int,
                    bit_depth: int, wrap_around: bool = False,
                    deblocking: bool = True):
    """One-jit encoder tail for MM P frames: positions -> prediction ->
    residual/levels -> reconstruction -> deblock.  Everything here is
    integer math downstream of the shared `positions` tensor, so the
    encoder reconstruction is bit-exact with the decoder's (which runs the
    same integer ops in its own program).  Returns (lev_y, lev_u, lev_v,
    rec dict post-deblock)."""
    key = ("pfinish", qp, block_size, bit_depth, wrap_around, deblocking,
           orig_y.shape, mvs_stack.shape[0])
    if key not in _FUSED_CACHE:
        from .. import deblock as deblock_mod
        s = block_size

        @jax.jit
        def fn(model_idx, mvs_stack, positions, oy, ou, ov, ry, ru, rv):
            h, w = oy.shape
            nby, nbx = h // s, w // s
            pred_y, pred_u, pred_v = predict_from_positions(
                positions, ry, ru, rv, bit_depth, wrap_around)
            lev_y, _ = _residual_pass(oy, pred_y, s, qp, bit_depth)
            lev_u, _ = _residual_pass(ou, pred_u, s // 2, qp, bit_depth)
            lev_v, _ = _residual_pass(ov, pred_v, s // 2, qp, bit_depth)
            rec_y = _rec_plane(pred_y, lev_y, s, qp, bit_depth, nby, nbx)
            rec_u = _rec_plane(pred_u, lev_u, s // 2, qp, bit_depth, nby,
                               nbx)
            rec_v = _rec_plane(pred_v, lev_v, s // 2, qp, bit_depth, nby,
                               nbx)
            if deblocking:
                sel = jnp.take_along_axis(
                    mvs_stack, model_idx[None, :, :, None].astype(jnp.int32),
                    axis=0)[0]
                has_resid = (jnp.any(lev_y != 0, axis=(2, 3))
                             | jnp.any(lev_u != 0, axis=(2, 3))
                             | jnp.any(lev_v != 0, axis=(2, 3)))
                bs_v, bs_h = deblock_mod.boundary_strengths_inter(
                    sel.astype(jnp.int32), has_resid)
                rec_y, rec_u, rec_v = deblock_mod.deblock_frame(
                    rec_y, rec_u, rec_v, bs_v, bs_h, s, qp, bit_depth)
            return lev_y, lev_u, lev_v, rec_y, rec_u, rec_v

        _FUSED_CACHE[key] = fn
    ly, lu, lv, ry2, ru2, rv2 = _FUSED_CACHE[key](
        model_idx, mvs_stack, positions, orig_y, orig_u, orig_v,
        ref_y, ref_u, ref_v)
    return ly, lu, lv, dict(y=ry2, u=ru2, v=rv2)


def enc_finish_b_mm_fused(reproj, active_models, idx0, idx1, stack0,
                          stack1, rstack0, rstack1, dirs, orig, ref0,
                          ref1, qp: int, block_size: int, bit_depth: int,
                          epipoles0=None, epipoles1=None,
                          wrap_around: bool = False,
                          deblocking: bool = True):
    """enc_finish_b_mm with both per-list merged-positions computations
    fused into the same program (one device dispatch instead of three).
    rstack0/rstack1 are the (possibly DMVR-refined) stacks that drive
    the PREDICTION; stack0/stack1 stay the signaled ones (deblock MV
    field)."""
    key = ("bfinfuse", _geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, wrap_around, deblocking,
           _eps_key(epipoles0), _eps_key(epipoles1), orig[0].shape)
    if key not in _FUSED_CACHE:
        _warm_models(reproj, active_models)

        @jax.jit
        def fn(idx0, idx1, stack0, stack1, rstack0, rstack1, dirs,
               oy, ou, ov, r0y, r0u, r0v, r1y, r1u, r1v):
            pos0 = _merged_positions(reproj, active_models, block_size,
                                     epipoles0, idx0, rstack0)
            pos1 = _merged_positions(reproj, active_models, block_size,
                                     epipoles1, idx1, rstack1)
            return _b_finish_body(idx0, idx1, stack0, stack1, dirs, pos0,
                                  pos1, oy, ou, ov, r0y, r0u, r0v, r1y,
                                  r1u, r1v, qp, block_size, bit_depth,
                                  wrap_around, deblocking)

        _FUSED_CACHE[key] = fn
    ly, lu, lv, ry2, ru2, rv2 = _FUSED_CACHE[key](
        idx0, idx1, stack0, stack1, rstack0, rstack1, dirs, orig[0],
        orig[1], orig[2], ref0[0], ref0[1], ref0[2], ref1[0], ref1[1],
        ref1[2])
    return ly, lu, lv, dict(y=ry2, u=ru2, v=rv2)


def _b_finish_body(idx0, idx1, stack0, stack1, dirs, pos0, pos1, oy, ou,
                   ov, r0y, r0u, r0v, r1y, r1u, r1v, qp, block_size,
                   bit_depth, wrap_around, deblocking):
    from .. import deblock as deblock_mod
    s = block_size
    h, w = oy.shape
    nby, nbx = h // s, w // s
    p0 = predict_from_positions(pos0, r0y, r0u, r0v, bit_depth,
                                wrap_around)
    p1 = predict_from_positions(pos1, r1y, r1u, r1v, bit_depth,
                                wrap_around)
    py = _bi_combine_px(p0[0], p1[0], dirs, s, 1, bit_depth)
    pu = _bi_combine_px(p0[1], p1[1], dirs, s, 2, bit_depth)
    pv = _bi_combine_px(p0[2], p1[2], dirs, s, 2, bit_depth)
    lev_y, _ = _residual_pass(oy, py, s, qp, bit_depth)
    lev_u, _ = _residual_pass(ou, pu, s // 2, qp, bit_depth)
    lev_v, _ = _residual_pass(ov, pv, s // 2, qp, bit_depth)
    rec_y = _rec_plane(py, lev_y, s, qp, bit_depth, nby, nbx)
    rec_u = _rec_plane(pu, lev_u, s // 2, qp, bit_depth, nby, nbx)
    rec_v = _rec_plane(pv, lev_v, s // 2, qp, bit_depth, nby, nbx)
    if deblocking:
        sel0 = jnp.take_along_axis(
            stack0, idx0[None, :, :, None].astype(jnp.int32), axis=0)[0]
        sel1 = jnp.take_along_axis(
            stack1, idx1[None, :, :, None].astype(jnp.int32), axis=0)[0]
        sel = jnp.where(dirs[..., None] == 1, sel1, sel0)
        has_resid = (jnp.any(lev_y != 0, axis=(2, 3))
                     | jnp.any(lev_u != 0, axis=(2, 3))
                     | jnp.any(lev_v != 0, axis=(2, 3)))
        bs_v, bs_h = deblock_mod.boundary_strengths_inter(
            sel.astype(jnp.int32), has_resid)
        rec_y, rec_u, rec_v = deblock_mod.deblock_frame(
            rec_y, rec_u, rec_v, bs_v, bs_h, s, qp, bit_depth)
    return lev_y, lev_u, lev_v, rec_y, rec_u, rec_v


def enc_finish_b_mm(idx0, idx1, stack0, stack1, dirs, pos0, pos1,
                    orig_y, orig_u, orig_v, ref0, ref1, qp: int,
                    block_size: int, bit_depth: int,
                    wrap_around: bool = False, deblocking: bool = True):
    """One-jit encoder tail for MM B frames (integer math downstream of
    the two shared per-list position tensors): bi combine -> residual ->
    recon -> deblock.  Returns (lev_y, lev_u, lev_v, rec dict)."""
    key = ("bfinish", qp, block_size, bit_depth, wrap_around, deblocking,
           orig_y.shape, stack0.shape[0])
    if key not in _FUSED_CACHE:
        from .. import deblock as deblock_mod
        s = block_size

        @jax.jit
        def fn(idx0, idx1, stack0, stack1, dirs, pos0, pos1,
               oy, ou, ov, r0y, r0u, r0v, r1y, r1u, r1v):
            h, w = oy.shape
            nby, nbx = h // s, w // s
            p0 = predict_from_positions(pos0, r0y, r0u, r0v, bit_depth,
                                        wrap_around)
            p1 = predict_from_positions(pos1, r1y, r1u, r1v, bit_depth,
                                        wrap_around)
            py = _bi_combine_px(p0[0], p1[0], dirs, s, 1, bit_depth)
            pu = _bi_combine_px(p0[1], p1[1], dirs, s, 2, bit_depth)
            pv = _bi_combine_px(p0[2], p1[2], dirs, s, 2, bit_depth)
            lev_y, _ = _residual_pass(oy, py, s, qp, bit_depth)
            lev_u, _ = _residual_pass(ou, pu, s // 2, qp, bit_depth)
            lev_v, _ = _residual_pass(ov, pv, s // 2, qp, bit_depth)
            rec_y = _rec_plane(py, lev_y, s, qp, bit_depth, nby, nbx)
            rec_u = _rec_plane(pu, lev_u, s // 2, qp, bit_depth, nby, nbx)
            rec_v = _rec_plane(pv, lev_v, s // 2, qp, bit_depth, nby, nbx)
            if deblocking:
                sel0 = jnp.take_along_axis(
                    stack0, idx0[None, :, :, None].astype(jnp.int32),
                    axis=0)[0]
                sel1 = jnp.take_along_axis(
                    stack1, idx1[None, :, :, None].astype(jnp.int32),
                    axis=0)[0]
                sel = jnp.where(dirs[..., None] == 1, sel1, sel0)
                has_resid = (jnp.any(lev_y != 0, axis=(2, 3))
                             | jnp.any(lev_u != 0, axis=(2, 3))
                             | jnp.any(lev_v != 0, axis=(2, 3)))
                bs_v, bs_h = deblock_mod.boundary_strengths_inter(
                    sel.astype(jnp.int32), has_resid)
                rec_y, rec_u, rec_v = deblock_mod.deblock_frame(
                    rec_y, rec_u, rec_v, bs_v, bs_h, s, qp, bit_depth)
            return lev_y, lev_u, lev_v, rec_y, rec_u, rec_v

        _FUSED_CACHE[key] = fn
    ly, lu, lv, ry2, ru2, rv2 = _FUSED_CACHE[key](
        idx0, idx1, stack0, stack1, dirs, pos0, pos1, orig_y, orig_u,
        orig_v, ref0[0], ref0[1], ref0[2], ref1[0], ref1[1], ref1[2])
    return ly, lu, lv, dict(y=ry2, u=ru2, v=rv2)


# ------------------------------------------------------------- B frames


def _bi_combine_px(p0, p1, dirs, block_size, sub, bit_depth):
    """Per-block uni/bi select of two pixel-domain MM predictions.
    dirs (nby, nbx); planes (H, W) at `sub`-sampled resolution (1 luma,
    2 chroma).  MM bi-prediction averages the two model predictions in the
    pixel domain (normative for this codec; reference analog:
    xWeightedAverage after the two xPredInterBlkMM passes)."""
    s = block_size // sub
    d = jnp.repeat(jnp.repeat(dirs, s, 0), s, 1)
    avg = (p0 + p1 + 1) >> 1
    return jnp.where(d == 0, p0, jnp.where(d == 1, p1, avg))


def make_eval_bilateral(reproj: MVReprojection, model0: int, model1: int,
                        block_size: int, bit_depth: int, ep0=None,
                        ep1=None):
    """Jitted bilateral cost: (orig-free) SAD between the two list
    predictions under mirrored candidate offsets — the projected-DMVR
    matching function (reference: InterPrediction.cpp:2442
    xProcessDMVRProjected; offsets applied in each model's own MV domain
    and taken through the reprojection)."""
    ep_key = tuple(
        None if e is None else tuple(np.asarray(e, np.float64).round(12))
        for e in (ep0, ep1))
    key = ("bilat", _geom_key(reproj), model0, model1, block_size,
           bit_depth, ep_key)
    if key in _EVAL_CACHE:
        return _EVAL_CACHE[key]
    for m in (model0, model1):
        if m in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT, M.MPA_TOP_BOTTOM):
            reproj.mpa_cache(m)

    row_step = SAD_ROW_STEP if block_size // 4 >= SAD_ROW_STEP else 1

    def pos_of(model_id, mvs, ep):
        if model_id == M.CLASSIC:
            return mm_mc.classic_positions(reproj.offset, reproj.width,
                                           reproj.height, mvs, block_size,
                                           row_step)
        return reproj.reproject_frame(model_id, mvs, block_size, ep,
                                      row_step)

    @jax.jit
    def eval_cands(ref0_padded, ref1_padded, mv0, mv1, offsets):
        def one(k):
            d = offsets[k][None, None, :]
            p0 = mm_mc.mc_luma_positions(
                ref0_padded, pos_of(model0, mv0 + d, ep0), MC_MARGIN,
                bit_depth)
            p1 = mm_mc.mc_luma_positions(
                ref1_padded, pos_of(model1, mv1 - d, ep1), MC_MARGIN,
                bit_depth)
            return _block_sad_sub(jnp.abs(p0 - p1), block_size, row_step)
        return jnp.stack([one(k) for k in range(offsets.shape[0])])

    _EVAL_CACHE[key] = eval_cands
    return eval_cands


_DMVR_OFFS = np.array([(0, 0), (-4, 0), (4, 0), (0, -4), (0, 4)],
                      dtype=np.int32)     # quarter-pel plus pattern


def projected_dmvr(reproj: MVReprojection, active_models: list[int],
                   model_idx0, model_idx1, mvs0_stack, mvs1_stack, dirs,
                   ref0_y, ref1_y, block_size: int, bit_depth: int,
                   epipoles0=None, epipoles1=None, wrap_around=False):
    """Signaling-free bilateral refinement of bi-predicted MM blocks
    (projected DMVR).  Both encoder and decoder run this identically on
    the signaled MVs; returns refined (mvs0_stack, mvs1_stack) where only
    each block's SELECTED model entry is updated, and only where
    dirs == 2."""
    r0 = pad_ref(ref0_y, MC_MARGIN, wrap_around)
    r1 = pad_ref(ref1_y, MC_MARGIN, wrap_around)
    offs = jnp.asarray(_DMVR_OFFS)
    n_active = len(active_models)
    out0, out1 = mvs0_stack, mvs1_stack
    for i0 in range(n_active):
        for i1 in range(n_active):
            sel = (dirs == 2) & (model_idx0 == i0) & (model_idx1 == i1)
            # trace-time pruning is impossible (sel is traced) — restrict
            # pair evaluation to pairs of the SAME model plus the classic
            # cross pairs to bound the pass count
            m0, m1 = active_models[i0], active_models[i1]
            if i0 != i1 and M.CLASSIC not in (m0, m1):
                continue
            ev = make_eval_bilateral(
                reproj, m0, m1, block_size, bit_depth,
                (epipoles0 or {}).get(m0), (epipoles1 or {}).get(m1))
            sads = ev(r0, r1, mvs0_stack[i0], mvs1_stack[i1], offs)
            k = jnp.argmin(sads, axis=0)
            d = jnp.take_along_axis(
                offs[:, None, None, :],
                k[None, :, :, None].astype(jnp.int32), axis=0)[0]
            upd0 = jnp.where(sel[..., None], mvs0_stack[i0] + d,
                             out0[i0])
            upd1 = jnp.where(sel[..., None], mvs1_stack[i1] - d,
                             out1[i1])
            out0 = out0.at[i0].set(upd0)
            out1 = out1.at[i1].set(upd1)
    return out0, out1


def predict_b_mm(reproj, active_models, model_idx0, model_idx1, mvs0_stack,
                 mvs1_stack, dirs, ref0, ref1, block_size, bit_depth,
                 epipoles0=None, epipoles1=None, wrap_around=False,
                 dmvr=False):
    """Mixed-model bi-prediction: per-list merged positions -> two MC
    passes -> per-block uni/bi combine.  With dmvr, bi blocks first go
    through the projected-DMVR bilateral refinement (shared enc/dec)."""
    if dmvr:
        mvs0_stack, mvs1_stack = projected_dmvr(
            reproj, active_models, model_idx0, model_idx1, mvs0_stack,
            mvs1_stack, dirs, ref0[0], ref1[0], block_size, bit_depth,
            epipoles0, epipoles1, wrap_around)
    pos0 = merged_positions(reproj, active_models, model_idx0, mvs0_stack,
                            block_size, epipoles0)
    pos1 = merged_positions(reproj, active_models, model_idx1, mvs1_stack,
                            block_size, epipoles1)
    p0 = predict_from_positions(pos0, *ref0, bit_depth, wrap_around)
    p1 = predict_from_positions(pos1, *ref1, bit_depth, wrap_around)
    py = _bi_combine_px(p0[0], p1[0], dirs, block_size, 1, bit_depth)
    pu = _bi_combine_px(p0[1], p1[1], dirs, block_size, 2, bit_depth)
    pv = _bi_combine_px(p0[2], p1[2], dirs, block_size, 2, bit_depth)
    return py, pu, pv


def reconstruct_b_frame_mm(reproj, active_models, model_idx0, model_idx1,
                           mvs0_stack, mvs1_stack, dirs, lev_y, lev_u,
                           lev_v, ref0, ref1, qp, block_size,
                           bit_depth=8, epipoles0=None, epipoles1=None,
                           wrap_around=False, dmvr=False):
    """Shared enc/dec reconstruction for multi-model B frames."""
    s = block_size
    sc = s // 2
    h, w = ref0[0].shape
    nby, nbx = h // s, w // s
    py, pu, pv = predict_b_mm(
        reproj, active_models, model_idx0, model_idx1, mvs0_stack,
        mvs1_stack, dirs, ref0, ref1, s, bit_depth, epipoles0, epipoles1,
        wrap_around, dmvr)

    def rec_plane(pred, lev, size):
        log2s = size.bit_length() - 1
        pb = _to_blocks(pred, size)
        dq = quant.dequantize(lev.reshape(-1, size, size), qp, log2s,
                              log2s, bit_depth)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
        return _from_blocks(rec, nby, nbx)

    return dict(y=rec_plane(py, lev_y, s),
                u=rec_plane(pu, lev_u, sc),
                v=rec_plane(pv, lev_v, sc))


def encode_b_frame_mm(reproj: MVReprojection, active_models: list[int],
                      orig_y, orig_u, orig_v, ref0, ref1, qp: int,
                      block_size: int = 16, bit_depth: int = 8,
                      search_range: int = 24, epipoles0=None,
                      epipoles1=None, wrap_around: bool = False,
                      dmvr: bool = False, small_range: bool = True):
    """Multi-model B encode: per-list model search + uni/bi decision.
    Returns (model_idx0, model_idx1, mvs0_stack, mvs1_stack, dirs,
    lev_y, lev_u, lev_v, recon)."""
    from ...encoder import me as me_mod
    s = block_size
    lam = quant.lambda_from_qp(qp, intra=False)
    lam_bits = lam ** 0.5 * 4.0
    mv_bits = int(lam ** 0.5 * 8)

    # distance-scaled model search: B-pyramid references are 1-4 frames
    # away, so the model diamonds start at a quarter of the P-anchor step
    # (the reference's ME also scales its search to the reference
    # distance); the classic hierarchical stage keeps the full range
    steps = (16, 8, 4) if small_range else (64, 32, 16, 8, 4)  # models stop at quarter-pel (VTM-like search precision)
    per_list = []
    for ref, eps in ((ref0, epipoles0), (ref1, epipoles1)):
        refp = pad_ref(ref[0], MC_MARGIN, wrap_around)
        mv_int, _ = me_mod.hierarchical_search(
            orig_y, refp, s, search_range, MC_MARGIN,
            int(lam ** 0.5 * 16))
        cmv, csad = me_mod.fractional_refine(orig_y, refp, mv_int, s,
                                             MC_MARGIN, bit_depth)
        idx, mvs, sads = search_models(
            reproj, active_models, orig_y, ref[0], cmv, csad, s,
            bit_depth, lam_bits, eps, wrap_around, steps)
        stack = jnp.stack([mvs[m] for m in active_models])
        best_sad = jnp.min(jnp.stack([sads[m] for m in active_models]),
                           axis=0)
        per_list.append((idx, stack, best_sad))
    idx0, stack0, sad0 = per_list[0]
    idx1, stack1, sad1 = per_list[1]

    # bi cost: SAD of the averaged best-model predictions
    pos0 = merged_positions(reproj, active_models, idx0, stack0, s,
                            epipoles0)
    pos1 = merged_positions(reproj, active_models, idx1, stack1, s,
                            epipoles1)
    r0p = pad_ref(ref0[0], MC_MARGIN, wrap_around)
    r1p = pad_ref(ref1[0], MC_MARGIN, wrap_around)
    p0 = mm_mc.mc_luma_positions(r0p, pos0, MC_MARGIN, bit_depth)
    p1 = mm_mc.mc_luma_positions(r1p, pos1, MC_MARGIN, bit_depth)
    bi = (p0 + p1 + 1) >> 1
    sad_bi = _block_sad(jnp.abs(orig_y - bi), s) + mv_bits
    dirs = jnp.argmin(jnp.stack([sad0, sad1, sad_bi]), axis=0
                      ).astype(jnp.int32)

    py, pu, pv = predict_b_mm(
        reproj, active_models, idx0, idx1, stack0, stack1, dirs,
        tuple(ref0), tuple(ref1), s, bit_depth, epipoles0, epipoles1,
        wrap_around, dmvr)
    lev_y, _ = _residual_pass(orig_y, py, s, qp, bit_depth)
    lev_u, _ = _residual_pass(orig_u, pu, s // 2, qp, bit_depth)
    lev_v, _ = _residual_pass(orig_v, pv, s // 2, qp, bit_depth)
    recon = reconstruct_b_frame_mm(
        reproj, active_models, idx0, idx1, stack0, stack1, dirs, lev_y,
        lev_u, lev_v, tuple(ref0), tuple(ref1), qp, s, bit_depth,
        epipoles0, epipoles1, wrap_around, dmvr)
    return (idx0, idx1, stack0, stack1, dirs, lev_y, lev_u, lev_v, recon)
