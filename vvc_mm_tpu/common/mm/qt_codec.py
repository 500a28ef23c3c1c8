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
                      wrap_around: bool = False):
    """Shared enc/dec reconstruction: unit-granularity merged positions ->
    one MC pass -> per-size residual sum.  midx_unit (nuy, nux) model
    index, mv_unit (nuy, nux, 2) the selected model's MV per unit."""
    u = top >> depth
    assert u >= SUBBLK
    n = len(active_models)
    # stack with each unit's MV in its selected model's layer
    onehot = midx_unit[None] == jnp.arange(n, dtype=jnp.int32)[:, None,
                                                               None]
    stack = jnp.where(onehot[..., None], mv_unit[None],
                      jnp.zeros_like(mv_unit)[None])
    positions = fc.merged_positions(reproj, active_models, midx_unit,
                                    stack, u, epipoles)
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


def encode_p_frame_qt_mm(reproj: MVReprojection, active_models: list[int],
                         orig_y, orig_u, orig_v, ref_y, ref_u, ref_v,
                         qp: int, top: int, depth: int, bit_depth: int,
                         search_range: int, epipoles: dict | None = None,
                         wrap_around: bool = False):
    """Batched MM quadtree P encode (one fused jit program).  Returns a
    dict with splits / per-size midx + mv grids / masked levels /
    unit-resolved grids / recon."""
    key = ("qtmm", fc._geom_key(reproj), tuple(active_models), qp, top,
           depth, bit_depth, search_range, wrap_around,
           fc._eps_key(epipoles))
    if key not in _QT_MM_CACHE:
        from ...encoder import me as me_mod
        fc._warm_models(reproj, active_models)
        sizes = node_sizes(top, depth)
        u = sizes[-1]
        lam = quant.lambda_from_qp(qp, intra=False)
        lam16 = int(lam ** 0.5 * 16)
        lam_bits = lam ** 0.5 * 4.0

        @jax.jit
        def fn(oy, ou, ov, ry, ru, rv):
            refp = pad_ref(ry, MC_MARGIN, wrap_around)
            per_midx, per_mv, per_lev, per_cost = [], [], [], []
            for s in sizes:
                mv_int, _ = me_mod.hierarchical_search(
                    oy, refp, s, search_range, MC_MARGIN, lam16)
                cmv, csad = me_mod.fractional_refine(oy, refp, mv_int, s,
                                                     MC_MARGIN, bit_depth)
                idx, mvs, _ = fc.search_models(
                    reproj, active_models, oy, ry, cmv, csad, s,
                    bit_depth, lam_bits, epipoles, wrap_around)
                stack = jnp.stack([mvs[m] for m in active_models])
                mv_sel = jnp.take_along_axis(
                    stack, idx[None, :, :, None].astype(jnp.int32),
                    axis=0)[0]
                pos = fc._merged_positions(reproj, active_models, s,
                                           epipoles, idx, stack)
                pred_y, pred_u, pred_v = fc.predict_from_positions(
                    pos, ry, ru, rv, bit_depth, wrap_around)
                ly, rec_y = _residual_pass(oy, pred_y, s, qp, bit_depth)
                lu, rec_u = _residual_pass(ou, pred_u, s // 2, qp,
                                           bit_depth)
                lv, rec_v = _residual_pass(ov, pred_v, s // 2, qp,
                                           bit_depth)

                def bsum(x, size):
                    hh, ww = x.shape
                    return x.reshape(hh // size, size, ww // size, size
                                     ).sum(axis=(1, 3))
                ssd = (bsum((oy - rec_y) ** 2, s)
                       + bsum((ou - rec_u) ** 2, s // 2)
                       + bsum((ov - rec_v) ** 2, s // 2)
                       ).astype(jnp.float32)
                bits = (_coeff_bits_est(ly) + _coeff_bits_est(lu)
                        + _coeff_bits_est(lv) + 6.0
                        + idx.astype(jnp.float32) + 1.0)   # model unary
                bits = bits + _mv_bits_est(mv_sel,
                                           jnp.zeros_like(mv_sel))
                per_midx.append(idx)
                per_mv.append(mv_sel)
                per_lev.append((ly, lu, lv))
                per_cost.append(ssd + jnp.float32(lam) * bits)

            splits, leaf = _resolve_tree(per_cost, lam, depth)
            masked_levels, has_resid_unit, leaf_id_unit = _mask_and_locate(
                per_lev, leaf, sizes, u)
            midx_unit = _field_to_unit(per_midx, leaf, sizes, u)
            mv_unit = _field_to_unit(per_mv, leaf, sizes, u)
            recon = reconstruct_qt_mm(
                reproj, active_models, midx_unit, mv_unit, masked_levels,
                ry, ru, rv, qp, top, depth, bit_depth, epipoles,
                wrap_around)
            return dict(splits=splits, midx=per_midx, mvs=per_mv,
                        levels=masked_levels, leaf=leaf,
                        midx_unit=midx_unit, mv_unit=mv_unit, recon=recon,
                        has_resid_unit=has_resid_unit,
                        leaf_id_unit=leaf_id_unit)

        _QT_MM_CACHE[key] = fn
    return _QT_MM_CACHE[key](orig_y, orig_u, orig_v, ref_y, ref_u, ref_v)
