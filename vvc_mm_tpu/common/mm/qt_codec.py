"""Multi-model motion inside the quadtree lattice (MM x partitioning).

The reference runs its per-model inter checks INSIDE the QTMT recursion
(reference: EncCu.cpp:775-798 — the mode loop at every evaluated CU), so
model choice happens per CU at every size.  The TPU composition: the
batched quadtree lattice (common/qtree.py) evaluates every node size at
once, and at EACH size the per-block model search runs frame-batched
(mm/frame_codec.search_models).  The split tree resolves bottom-up as
usual; the winning (model, MV) pairs resolve to the UNIT grid, and —
because MM target positions depend only on (subblock center, MV, model),
not on the partition — ONE merged-positions MC pass reconstructs the
mixed-size, mixed-model frame bit-exactly at unit granularity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import quant
from ..inter_frame import MC_MARGIN, _residual_pass, pad_ref
from ..qtree import (_coeff_bits_est, _field_to_unit, _mask_and_locate,
                     _mv_bits_est, _resolve_tree, _up2, node_sizes)
from . import frame_codec as fc
from . import mc as mm_mc
from .reprojection import MVReprojection, SUBBLK


def reconstruct_qt_mm(reproj: MVReprojection, active_models: list[int],
                      midx_unit, mv_unit, levels, ref_y, ref_u, ref_v,
                      qp: int, top: int, depth: int, bit_depth: int,
                      epipoles: dict | None = None,
                      wrap_around: bool = False, _positions=None,
                      _preds=None):
    """Shared enc/dec reconstruction: unit-granularity merged positions ->
    one MC pass -> per-size residual sum.  midx_unit (nuy, nux) model
    index, mv_unit (nuy, nux, 2) the selected model's MV per unit.
    _positions/_preds: encoder-internal reuse (enc_finish_qt_mm already
    computed them inside the same jit program)."""
    u = top >> depth
    assert u >= SUBBLK
    if _preds is not None:
        pred_y, pred_u, pred_v = _preds
    else:
        n = len(active_models)
        # stack with each unit's MV in its selected model's layer
        onehot = midx_unit[None] == jnp.arange(n, dtype=jnp.int32)[:, None,
                                                                   None]
        stack = jnp.where(onehot[..., None], mv_unit[None],
                          jnp.zeros_like(mv_unit)[None])
        positions = (_positions if _positions is not None
                     else fc.merged_positions(reproj, active_models,
                                              midx_unit, stack, u,
                                              epipoles))
        pred_y, pred_u, pred_v = fc.predict_from_positions(
            positions, ref_y, ref_u, ref_v, bit_depth, wrap_around)

    from .. import transforms
    from ..inter_frame import _from_blocks

    def resid_plane(idx, size_list, hh, ww):
        total = jnp.zeros((hh, ww), dtype=jnp.int32)
        for trio, s in zip(levels, size_list):
            lev = trio[idx]
            log2s = s.bit_length() - 1
            dq = quant.dequantize(lev.reshape(-1, s, s), qp, log2s, log2s,
                                  bit_depth)
            r = transforms.inverse_transform(dq, bit_depth=bit_depth)
            total = total + _from_blocks(r, hh // s, ww // s)
        return total

    sizes = node_sizes(top, depth)
    h, w = ref_y.shape
    mx = (1 << bit_depth) - 1
    return dict(
        y=jnp.clip(pred_y + resid_plane(0, sizes, h, w), 0, mx),
        u=jnp.clip(pred_u + resid_plane(1, [s // 2 for s in sizes],
                                        h // 2, w // 2), 0, mx),
        v=jnp.clip(pred_v + resid_plane(2, [s // 2 for s in sizes],
                                        h // 2, w // 2), 0, mx))


_QT_MM_CACHE: dict = {}


def search_qt_mm(reproj: MVReprojection, active_models: list[int],
                 orig_y, ref_y, qp: int, top: int, depth: int,
                 bit_depth: int, search_range: int,
                 epipoles: dict | None = None, wrap_around: bool = False,
                 seed=None):
    """Per-size merge-aware MM search for the quadtree lattice.

    The UNIT size runs the full flat-path search program
    (frame_codec.search_p_mm_merge — identical decisions to the fixed
    grid, so the tree's worst case is the grid plus split bins); each
    parent size is evaluated from its children's selections
    (search_qt_parent_mm), the batched analog of the QTMT recursion's
    information reuse (reference: EncCu.cpp:499 xCompressCU).

    Returns (per_size list ordered [top .. unit] of device tuples
    (idx, mv_sel, sad_sel, cand_idx, cand_mv, cand_sads), unit_stack)
    — unit_stack is the per-model MV stack for temporal seeding."""
    sizes = node_sizes(top, depth)
    u = sizes[-1]
    idx, stack, sad, cidx, cmv, csad = fc.search_p_mm_merge(
        reproj, active_models, orig_y, ref_y, qp, u, bit_depth,
        search_range, epipoles, wrap_around, seed=seed)
    mv_sel = jnp.take_along_axis(
        stack, idx[None, :, :, None].astype(jnp.int32), axis=0)[0]
    per = {u: (idx, mv_sel, sad, cidx, cmv, csad)}
    idx_c, mv_c = idx, mv_sel
    for s in reversed(sizes[:-1]):
        # this size's own flat search — without it a noisy child level
        # would degrade every ancestor and the tree could lose to the
        # fixed grid
        oidx, ostack = fc.search_p_mm(reproj, active_models, orig_y,
                                      ref_y, qp, s, bit_depth,
                                      search_range, epipoles, wrap_around)
        omv = jnp.take_along_axis(
            ostack, oidx[None, :, :, None].astype(jnp.int32), axis=0)[0]
        out = fc.search_qt_parent_mm(reproj, active_models, orig_y, ref_y,
                                     idx_c, mv_c, oidx, omv, qp, s,
                                     bit_depth, epipoles, wrap_around)
        per[s] = out
        idx_c, mv_c = out[0], out[1]
    return [per[s] for s in sizes], stack


def qt_rd_stats(reproj: MVReprojection, active_models: list[int],
                midx, mv_sel, orig_y, orig_u, orig_v, ref_y, ref_u,
                ref_v, qp: int, block_size: int, bit_depth: int,
                epipoles: dict | None = None, wrap_around: bool = False):
    """Per-block RD statistics for one tree level's selection: full-frame
    prediction from (model, mv) grids, residual transform/quant at this
    block size, per-block SSD of the reconstruction and a coefficient-bit
    estimate.  The split resolve compares levels in the SSD + lambda*bits
    domain the reference's xCheckModeSplit uses (EncCu.cpp:1118), not raw
    SAD — raw SAD over-splits because finer prediction always fits better
    while its residual-bit savings don't cover the extra motion syntax.
    Returns (ssd (nby,nbx) f32, coeff_bits (nby,nbx) f32)."""
    key = ("qtrd", fc._geom_key(reproj), tuple(active_models), qp,
           block_size, bit_depth, wrap_around, fc._eps_key(epipoles))
    if key not in _QT_MM_CACHE:
        fc._warm_models(reproj, active_models)
        s = block_size
        n = len(active_models)

        @jax.jit
        def fn(idx, mvs, oy, ou, ov, ry, ru, rv):
            onehot = (idx[None]
                      == jnp.arange(n, dtype=jnp.int32)[:, None, None])
            stack = jnp.where(onehot[..., None], mvs[None],
                              jnp.zeros_like(mvs)[None])
            pos = fc._merged_positions(reproj, active_models, s, epipoles,
                                       idx, stack)
            pred_y, pred_u, pred_v = fc.predict_from_positions(
                pos, ry, ru, rv, bit_depth, wrap_around)
            ly, rec_y = _residual_pass(oy, pred_y, s, qp, bit_depth)
            lu, rec_u = _residual_pass(ou, pred_u, s // 2, qp, bit_depth)
            lv, rec_v = _residual_pass(ov, pred_v, s // 2, qp, bit_depth)

            def bsum(x, size):
                hh, ww = x.shape
                return x.reshape(hh // size, size, ww // size, size
                                 ).sum(axis=(1, 3))
            ssd = (bsum((oy - rec_y) ** 2, s)
                   + bsum((ou - rec_u) ** 2, s // 2)
                   + bsum((ov - rec_v) ** 2, s // 2)).astype(jnp.int32)
            cbits = (_coeff_bits_est(ly) + _coeff_bits_est(lu)
                     + _coeff_bits_est(lv)).astype(jnp.int32)
            return ssd, cbits

        _QT_MM_CACHE[key] = fn
    return _QT_MM_CACHE[key](midx, mv_sel, orig_y, orig_u, orig_v,
                             ref_y, ref_u, ref_v)


def enc_finish_qt_mm(reproj: MVReprojection, active_models: list[int],
                     midx_unit, mv_unit, leaf_masks, orig_y, orig_u,
                     orig_v, ref_y, ref_u, ref_v, qp: int, top: int,
                     depth: int, bit_depth: int,
                     epipoles: dict | None = None,
                     wrap_around: bool = False):
    """Encoder tail for the merge-aware MM quadtree: ONE unit-granularity
    MC pass from the FINAL (post-merge-selection) grids, then per-size
    residual transforms masked to the resolved leaves (MM positions
    depend only on (subblock center, MV, model), so unit-granularity MC
    of a merged leaf is bit-identical to leaf-granularity MC).

    Returns (levels [per size (ly, lu, lv)], recon dict,
    has_resid_unit, leaf_id_unit)."""
    key = ("qtfinish", fc._geom_key(reproj), tuple(active_models), qp,
           top, depth, bit_depth, wrap_around, fc._eps_key(epipoles))
    if key not in _QT_MM_CACHE:
        fc._warm_models(reproj, active_models)
        sizes = node_sizes(top, depth)
        u = sizes[-1]
        n = len(active_models)

        @jax.jit
        def fn(midx_u, mv_u, leaf, oy, ou, ov, ry, ru, rv):
            onehot = (midx_u[None]
                      == jnp.arange(n, dtype=jnp.int32)[:, None, None])
            stack = jnp.where(onehot[..., None], mv_u[None],
                              jnp.zeros_like(mv_u)[None])
            positions = fc.merged_positions(reproj, active_models, midx_u,
                                            stack, u, epipoles)
            pred_y, pred_u, pred_v = fc.predict_from_positions(
                positions, ry, ru, rv, bit_depth, wrap_around)
            levels = []
            for d, s in enumerate(sizes):
                ly, _ = _residual_pass(oy, pred_y, s, qp, bit_depth)
                lu, _ = _residual_pass(ou, pred_u, s // 2, qp, bit_depth)
                lv, _ = _residual_pass(ov, pred_v, s // 2, qp, bit_depth)
                lm = leaf[d][:, :, None, None]
                levels.append((ly * lm, lu * lm, lv * lm))
            recon = reconstruct_qt_mm(
                reproj, active_models, midx_u, mv_u, levels, ry, ru, rv,
                qp, top, depth, bit_depth, epipoles, wrap_around,
                _positions=positions,
                _preds=(pred_y, pred_u, pred_v))
            # unit-granularity deblock inputs
            nuy, nux = midx_u.shape
            has_resid_unit = jnp.zeros((nuy, nux), dtype=bool)
            leaf_id_unit = jnp.zeros((nuy, nux), dtype=jnp.int32)
            for d, s in enumerate(sizes):
                f = s // u
                hr = jnp.zeros(leaf[d].shape, dtype=bool)
                for lev in levels[d]:
                    hr = hr | jnp.any(lev != 0, axis=(2, 3))
                lm_u = _up2(leaf[d], f)
                has_resid_unit = has_resid_unit | (lm_u & _up2(hr, f))
                by = jnp.arange(leaf[d].shape[0], dtype=jnp.int32
                                )[:, None] * f
                bx = jnp.arange(leaf[d].shape[1], dtype=jnp.int32
                                )[None, :] * f
                leaf_id_unit = jnp.where(lm_u, _up2(by * nux + bx, f),
                                         leaf_id_unit)
            return levels, recon, has_resid_unit, leaf_id_unit

        _QT_MM_CACHE[key] = fn
    return _QT_MM_CACHE[key](midx_unit, mv_unit, leaf_masks, orig_y,
                             orig_u, orig_v, ref_y, ref_u, ref_v)
