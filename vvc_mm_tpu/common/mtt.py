"""Multi-type-tree (QT + BT + TT) inter partitioning — the full QTMT
lattice.

Reference: UnitPartitioner.h:56-64 (CU_QUAD_SPLIT, CU_HORZ_SPLIT,
CU_VERT_SPLIT, CU_TRIH_SPLIT, CU_TRIV_SPLIT) driven by EncCu::xCompressCU
(EncCu.cpp:499) / xCheckModeSplit (EncCu.cpp:1118).  The reference's
recursion is serial and data-dependent; here every node of the split
lattice is evaluated for all CTUs at once (common/qtree.py doc) and the
tree is resolved by a batched bottom-up argmin over SIX candidates per
square node: leaf, quad split, horizontal/vertical binary split
(rectangular halves), horizontal/vertical ternary split (1/4-1/2-1/4
stripes).

Lattice restrictions (vs the reference's arbitrary nesting): binary and
ternary children are terminal leaves, and a split kind is only offered
when its stripes stay unit-aligned (BT needs s/2 >= unit, TT needs
s/4 >= unit).  Ternary middle stripes sit at a s/4 offset from the node
grid; they are evaluated on a s/4-shifted crop of the frame so every
batched pass still runs on an aligned grid.

Reconstruction stays single-pass: the winning tree is resolved to a
unit-granularity MV field driving ONE motion-compensation pass, and the
per-shape residual grids (zeroed off-leaf) are inverse-transformed and
summed — bit-identical to leaf-granularity coding because separable MC is
position-invariant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import interp, quant, transforms
from .inter_frame import MC_MARGIN, pad_ref
from .qtree import (_coeff_bits_est, _mv_bits_est, _sum2x2, _up2,
                    node_sizes)
from ..encoder import me as me_mod

# split codes per square node (stored in the `codes` grids)
LEAF, QUAD, BTH, BTV, TTH, TTV = 0, 1, 2, 3, 4, 5


def _up(x: jnp.ndarray, fy: int, fx: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, fy, axis=0), fx, axis=1)


def bt_allowed(s: int, u: int) -> bool:
    return s // 2 >= u


def tt_allowed(s: int, u: int) -> bool:
    return s // 4 >= u


def rect_shapes(top: int, depth: int):
    """Canonical rectangular-entry list [(kind, d, sy, sx, y_off, x_off)]
    shared by encoder, decoder, and the reconstruction level layout."""
    sizes = node_sizes(top, depth)
    u = sizes[-1]
    out = []
    for d in range(depth):
        s = sizes[d]
        if bt_allowed(s, u):
            out.append(("bth", d, s // 2, s, 0, 0))
            out.append(("btv", d, s, s // 2, 0, 0))
        if tt_allowed(s, u):
            out.append(("tth_o", d, s // 4, s, 0, 0))
            out.append(("tth_m", d, s // 2, s, s // 4, 0))
            out.append(("ttv_o", d, s, s // 4, 0, 0))
            out.append(("ttv_m", d, s, s // 2, 0, s // 4))
    return out


# ------------------------------------------------------------------ MC


def _mc_rect(ry_pad, ru_pad, rv_pad, mvs, ys, xs, sy, sx, bit_depth):
    """Uni prediction of rect blocks at explicit pixel coords (ys, xs)."""
    mv = mvs.reshape(-1, 2)
    py = interp.finalize_uni(
        interp.mc_luma(ry_pad, mv, ys, xs, sy, sx, MC_MARGIN, bit_depth),
        bit_depth)
    pu = interp.finalize_uni(
        interp.mc_chroma(ru_pad, mv, ys // 2, xs // 2, sy // 2, sx // 2,
                         MC_MARGIN // 2, bit_depth), bit_depth)
    pv = interp.finalize_uni(
        interp.mc_chroma(rv_pad, mv, ys // 2, xs // 2, sy // 2, sx // 2,
                         MC_MARGIN // 2, bit_depth), bit_depth)
    return py, pu, pv              # block-batched (B, sy, sx) pixel domain


def _to_rect_blocks(plane, sy, sx):
    h, w = plane.shape
    nby, nbx = h // sy, w // sx
    return plane.reshape(nby, sy, nbx, sx).transpose(0, 2, 1, 3
                                                     ).reshape(-1, sy, sx)


def _from_rect_blocks(blocks, nby, nbx):
    _, sy, sx = blocks.shape
    return blocks.reshape(nby, nbx, sy, sx).transpose(0, 2, 1, 3
                                                      ).reshape(nby * sy,
                                                                nbx * sx)


def _residual_rect(ob, pb, sy, sx, qp, bit_depth):
    """Transform/quant/reconstruct rect blocks.  Returns (levels, rec)."""
    lw, lh = sx.bit_length() - 1, sy.bit_length() - 1
    coeff = transforms.forward_transform(ob - pb, bit_depth=bit_depth)
    levels = quant.quantize(coeff, qp, lw, lh, bit_depth, intra=False)
    dq = quant.dequantize(levels, qp, lw, lh, bit_depth)
    r = transforms.inverse_transform(dq, bit_depth=bit_depth)
    rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
    return levels, rec


def _crop(plane, y_off, x_off, div=1):
    """Crop y_off/x_off (luma pixels) off both ends; div=2 for chroma."""
    yo, xo = y_off // div, x_off // div
    h, w = plane.shape
    return plane[yo:h - yo if yo else h, xo:w - xo if xo else w]


# ------------------------------------------------- rect pass evaluation


def _eval_rect_pass(orig, refs_pad, sy, sx, y_off, x_off, qp, bit_depth,
                    search_range, lam, lam16, parent_mv, dual=None):
    """One rectangular evaluation pass over the (possibly offset-cropped)
    frame.  Returns dict(mv=..., [mv1=, dirs=,] lev=(ly,lu,lv), cost=).

    `dual`: None for P; (refs1_pad, mv_bits) for B — per-list ME + uni/bi
    decision per rect block.
    """
    oy = _crop(orig[0], y_off, x_off)
    ou = _crop(orig[1], y_off, x_off, 2)
    ov = _crop(orig[2], y_off, x_off, 2)
    h, w = oy.shape
    nby, nbx = h // sy, w // sx
    idx = jnp.arange(nby * nbx, dtype=jnp.int32)
    # block coords in the UNCROPPED frame
    ys = (idx // nbx) * sy + y_off
    xs = (idx % nbx) * sx + x_off
    oyc = _crop(orig[0], y_off, x_off)

    ref_sets = [refs_pad] if dual is None else [refs_pad, dual[0]]
    mvs, preds_y = [], []
    for rp in ref_sets:
        ry_crop = (rp[0][y_off:rp[0].shape[0] - y_off if y_off else
                         rp[0].shape[0],
                         x_off:rp[0].shape[1] - x_off if x_off else
                         rp[0].shape[1]])
        mv_i, _ = me_mod.hierarchical_search_rect(
            oyc, ry_crop, sy, sx, search_range, MC_MARGIN, lam16)
        mv, _ = me_mod.fractional_refine_rect(
            oyc, ry_crop, mv_i, sy, sx, MC_MARGIN, bit_depth)
        mvs.append(mv)
        preds_y.append(interp.mc_luma(rp[0], mv.reshape(-1, 2), ys, xs,
                                      sy, sx, MC_MARGIN, bit_depth))
    ob = _to_rect_blocks(oy, sy, sx)
    oub = _to_rect_blocks(ou, sy // 2, sx // 2)
    ovb = _to_rect_blocks(ov, sy // 2, sx // 2)

    if dual is None:
        dirs = None
        py, pu, pv = _mc_rect(refs_pad[0], refs_pad[1], refs_pad[2],
                              mvs[0], ys, xs, sy, sx, bit_depth)
    else:
        mv_bits = dual[1]
        u0 = interp.finalize_uni(preds_y[0], bit_depth)
        u1 = interp.finalize_uni(preds_y[1], bit_depth)
        bi = interp.finalize_bi(preds_y[0], preds_y[1], bit_depth)
        sad0 = jnp.sum(jnp.abs(u0 - ob), axis=(1, 2))
        sad1 = jnp.sum(jnp.abs(u1 - ob), axis=(1, 2))
        sadb = jnp.sum(jnp.abs(bi - ob), axis=(1, 2)) + mv_bits
        dirs = jnp.argmin(jnp.stack([sad0, sad1, sadb]), axis=0
                          ).astype(jnp.int32).reshape(nby, nbx)
        db = dirs.reshape(-1)

        def internal(rp, mv):
            iy = interp.mc_luma(rp[0], mv.reshape(-1, 2), ys, xs, sy, sx,
                                MC_MARGIN, bit_depth)
            iu = interp.mc_chroma(rp[1], mv.reshape(-1, 2), ys // 2,
                                  xs // 2, sy // 2, sx // 2,
                                  MC_MARGIN // 2, bit_depth)
            iv = interp.mc_chroma(rp[2], mv.reshape(-1, 2), ys // 2,
                                  xs // 2, sy // 2, sx // 2,
                                  MC_MARGIN // 2, bit_depth)
            return iy, iu, iv
        i0 = internal(refs_pad, mvs[0])
        i1 = internal(dual[0], mvs[1])

        def combine(a, b):
            # uni/bi select at internal precision (matches _combine_bi /
            # the shared reconstruction path exactly)
            sel = jnp.where(db[:, None, None] == 0,
                            interp.finalize_uni(a, bit_depth),
                            jnp.where(db[:, None, None] == 1,
                                      interp.finalize_uni(b, bit_depth),
                                      interp.finalize_bi(a, b, bit_depth)))
            return sel
        py, pu, pv = (combine(i0[0], i1[0]), combine(i0[1], i1[1]),
                      combine(i0[2], i1[2]))

    ly, rec_y = _residual_rect(ob, py, sy, sx, qp, bit_depth)
    lu, rec_u = _residual_rect(oub, pu, sy // 2, sx // 2, qp, bit_depth)
    lv, rec_v = _residual_rect(ovb, pv, sy // 2, sx // 2, qp, bit_depth)
    ssd = (jnp.sum((ob - rec_y) ** 2, axis=(1, 2))
           + jnp.sum((oub - rec_u) ** 2, axis=(1, 2))
           + jnp.sum((ovb - rec_v) ** 2, axis=(1, 2))
           ).reshape(nby, nbx).astype(jnp.float32)
    lyg = ly.reshape(nby, nbx, sy, sx)
    lug = lu.reshape(nby, nbx, sy // 2, sx // 2)
    lvg = lv.reshape(nby, nbx, sy // 2, sx // 2)
    bits = (_coeff_bits_est(lyg) + _coeff_bits_est(lug)
            + _coeff_bits_est(lvg) + 6.0)
    if parent_mv is not None:
        # map each rect block to its covering parent-node MV (offset-aware)
        ph, pw = orig[0].shape
        psy = ph // parent_mv.shape[0]
        psx = pw // parent_mv.shape[1]
        py_idx = (jnp.arange(nby) * sy + y_off) // psy
        px_idx = (jnp.arange(nbx) * sx + x_off) // psx
        pg = parent_mv[py_idx][:, px_idx]
        bits = bits + _mv_bits_est(mvs[0], pg)
        if dual is not None:
            bits = bits + jnp.where(dirs != 0,
                                    _mv_bits_est(mvs[1], pg), 0.0)
    cost = ssd + jnp.float32(lam) * bits
    out = dict(mv=mvs[0], lev=(lyg, lug, lvg), cost=cost)
    if dual is not None:
        out["mv1"] = mvs[1]
        out["dirs"] = dirs
    return out


# ----------------------------------------------------------- resolve


def _node_agg(rc, kind, nby, nbx):
    """Aggregate a rect-grid cost onto the square node grid."""
    if kind in ("bth",):
        return rc.reshape(nby, 2, nbx).sum(axis=1)
    if kind in ("btv",):
        return rc.reshape(nby, nbx, 2).sum(axis=2)
    if kind == "tth_o":                     # rows 4i and 4i+3
        r = rc.reshape(nby, 4, nbx)
        return r[:, 0] + r[:, 3]
    if kind == "tth_m":                     # mid grid (2*nby-1, nbx), row 2i
        return rc[0::2][:nby]
    if kind == "ttv_o":
        r = rc.reshape(nby, nbx, 4)
        return r[:, :, 0] + r[:, :, 3]
    if kind == "ttv_m":
        return rc[:, 0::2][:, :nbx]
    raise ValueError(kind)


def resolve_mtt(per_cost, rect, top: int, depth: int, lam: float):
    """Bottom-up argmin over {leaf, quad, bth, btv, tth, ttv} per node.

    per_cost: square-leaf costs per level; rect: {(kind, d): cost grid}.
    Returns (codes per level, alive masks per level)."""
    sizes = node_sizes(top, depth)
    u = sizes[-1]
    best = per_cost[depth]
    codes = [None] * depth
    for d in range(depth - 1, -1, -1):
        s = sizes[d]
        nby, nbx = per_cost[d].shape
        lamf = jnp.float32(lam)
        opts = [per_cost[d] + lamf,                       # leaf: split=0
                _sum2x2(best) + 2 * lamf]                 # quad: 2 bins
        kinds = [LEAF, QUAD]
        if bt_allowed(s, u):
            opts.append(_node_agg(rect[("bth", d)]["cost"], "bth",
                                  nby, nbx) + 4 * lamf)
            kinds.append(BTH)
            opts.append(_node_agg(rect[("btv", d)]["cost"], "btv",
                                  nby, nbx) + 4 * lamf)
            kinds.append(BTV)
        if tt_allowed(s, u):
            tth = (_node_agg(rect[("tth_o", d)]["cost"], "tth_o", nby, nbx)
                   + _node_agg(rect[("tth_m", d)]["cost"], "tth_m",
                               nby, nbx))
            opts.append(tth + 4 * lamf)
            kinds.append(TTH)
            ttv = (_node_agg(rect[("ttv_o", d)]["cost"], "ttv_o", nby, nbx)
                   + _node_agg(rect[("ttv_m", d)]["cost"], "ttv_m",
                               nby, nbx))
            opts.append(ttv + 4 * lamf)
            kinds.append(TTV)
        stack = jnp.stack(opts)
        sel = jnp.argmin(stack, axis=0)
        codes[d] = jnp.asarray(np.asarray(kinds, np.int32))[sel]
        best = jnp.min(stack, axis=0)
    alive = [jnp.ones(per_cost[0].shape, dtype=bool)]
    for d in range(depth):
        alive.append(_up2(alive[d] & (codes[d] == QUAD)))
    return codes, alive


def _rect_leaf_mask(code, alive, kind, nby, nbx):
    """Expand a node-level 'this node split as KIND' mask onto the rect
    grid of that kind."""
    m = alive & code
    if kind == "bth":
        return jnp.repeat(m, 2, axis=0)
    if kind == "btv":
        return jnp.repeat(m, 2, axis=1)
    if kind == "tth_o":
        r = jnp.zeros((nby, 4, nbx), dtype=bool)
        r = r.at[:, 0].set(m).at[:, 3].set(m)
        return r.reshape(nby * 4, nbx)
    if kind == "tth_m":
        r = jnp.zeros((2 * nby - 1, nbx), dtype=bool)
        return r.at[0::2].set(m)
    if kind == "ttv_o":
        r = jnp.zeros((nby, nbx, 4), dtype=bool)
        r = r.at[:, :, 0].set(m).at[:, :, 3].set(m)
        return r.reshape(nby, nbx * 4)
    if kind == "ttv_m":
        r = jnp.zeros((nby, 2 * nbx - 1), dtype=bool)
        return r.at[:, 0::2].set(m)
    raise ValueError(kind)


def _paint_unit(field, kind_info, u, nuy, nux):
    """Expand a rect-grid field (leading dims (gy, gx), trailing dims kept)
    onto the (nuy, nux) unit grid at the shape's offsets; uncovered cells
    are zero/False."""
    _, _, sy, sx, y_off, x_off = kind_info
    up = _up(field, sy // u, sx // u)
    oy, ox = y_off // u, x_off // u
    pad = [(oy, nuy - oy - up.shape[0]), (ox, nux - ox - up.shape[1])]
    pad += [(0, 0)] * (field.ndim - 2)
    return jnp.pad(up, pad)


def _resolve_fields_mtt(sq_fields, sq_leaf, rect_fields, rect_masks,
                        shapes, sizes, u):
    """Resolve per-shape fields (squares + rects) to the unit grid.
    Painting order is irrelevant: leaves never overlap."""
    from .qtree import _field_to_unit
    out = _field_to_unit(sq_fields, sq_leaf, sizes, u)
    nuy, nux = out.shape[:2]
    extra = out.ndim - 2
    for info in shapes:
        key = (info[0], info[1])
        mfull = _paint_unit(rect_masks[key], info, u, nuy, nux)
        f = _paint_unit(rect_fields[key], info, u, nuy, nux)
        mfull = mfull.reshape(mfull.shape + (1,) * extra)
        out = jnp.where(mfull, f, out)
    return out


def _mask_levels_mtt(sq_lev, sq_leaf, rect, rect_masks, shapes, sizes, u,
                     nuy, nux):
    """Zero levels off-leaf (squares + rects); build unit-granularity
    has-residual and leaf-id grids for deblocking."""
    from .qtree import _mask_and_locate
    masked_sq, has_resid_unit, leaf_id_unit = _mask_and_locate(
        sq_lev, sq_leaf, sizes, u)
    masked_rect = {}
    for info in shapes:
        key = (info[0], info[1])
        m = rect_masks[key]
        ml = tuple(lev * m[:, :, None, None] for lev in rect[key]["lev"])
        masked_rect[key] = ml
        hr = jnp.zeros(m.shape, dtype=bool)
        for lev in ml:
            hr = hr | jnp.any(lev != 0, axis=(2, 3))
        mfull = _paint_unit(m, info, u, nuy, nux)
        has_resid_unit = has_resid_unit | _paint_unit(hr, info, u, nuy,
                                                      nux)
        gy, gx = m.shape
        _, _, sy, sx, y_off, x_off = info
        by = (jnp.arange(gy, dtype=jnp.int32)[:, None] * (sy // u)
              + y_off // u)
        bx = (jnp.arange(gx, dtype=jnp.int32)[None, :] * (sx // u)
              + x_off // u)
        ids = _paint_unit(by * nux + bx, info, u, nuy, nux)
        leaf_id_unit = jnp.where(mfull, ids, leaf_id_unit)
    return masked_sq, masked_rect, has_resid_unit, leaf_id_unit


def _resid_sum_plane(sq_levels, rect_levels, shapes, comp, qp, div,
                     bit_depth, h, w):
    """Sum of inverse-transformed residual planes over every shape grid.
    comp: 0/1/2 selecting the plane inside each levels tuple; div: 1 luma,
    2 chroma."""
    total = jnp.zeros((h // div, w // div), dtype=jnp.int32)
    for lev in sq_levels:
        g = lev[comp]
        gy, gx, sy, sx = g.shape
        lw, lh = sx.bit_length() - 1, sy.bit_length() - 1
        dq = quant.dequantize(g.reshape(-1, sy, sx), qp, lw, lh, bit_depth)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        total = total + _from_rect_blocks(r, gy, gx)
    for info in shapes:
        key = (info[0], info[1])
        g = rect_levels[key][comp]
        gy, gx, sy, sx = g.shape
        lw, lh = sx.bit_length() - 1, sy.bit_length() - 1
        dq = quant.dequantize(g.reshape(-1, sy, sx), qp, lw, lh, bit_depth)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        plane = _from_rect_blocks(r, gy, gx)
        yo, xo = info[4] // div, info[5] // div
        plane = jnp.pad(plane, ((yo, h // div - yo - plane.shape[0]),
                                (xo, w // div - xo - plane.shape[1])))
        total = total + plane
    return total


@functools.partial(jax.jit, static_argnames=("qp", "top", "depth",
                                             "bit_depth", "wrap_around"))
def reconstruct_mtt(mv_unit, sq_levels, rect_levels, ref_y, ref_u, ref_v,
                    qp: int, top: int, depth: int, bit_depth: int,
                    wrap_around: bool):
    """Shared enc/dec reconstruction: unit-grid MC + residual sum over all
    shape grids (P slices).  rect_levels: dict keyed like rect_shapes."""
    from .inter_frame import mc_predict
    u = top >> depth
    h, w = ref_y.shape
    shapes = rect_shapes(top, depth)
    pred_y, pred_u, pred_v = mc_predict(ref_y, ref_u, ref_v, mv_unit, u,
                                        bit_depth, wrap_around)
    maxv = (1 << bit_depth) - 1
    ry = jnp.clip(pred_y + _resid_sum_plane(sq_levels, rect_levels, shapes,
                                            0, qp, 1, bit_depth, h, w),
                  0, maxv)
    ru = jnp.clip(pred_u + _resid_sum_plane(sq_levels, rect_levels, shapes,
                                            1, qp, 2, bit_depth, h, w),
                  0, maxv)
    rv = jnp.clip(pred_v + _resid_sum_plane(sq_levels, rect_levels, shapes,
                                            2, qp, 2, bit_depth, h, w),
                  0, maxv)
    return dict(y=ry, u=ru, v=rv)


@functools.partial(jax.jit, static_argnames=("qp", "top", "depth",
                                             "bit_depth", "wrap_around"))
def reconstruct_mtt_b(mv0_unit, mv1_unit, dirs_unit, sq_levels,
                      rect_levels, ref0, ref1, qp: int, top: int,
                      depth: int, bit_depth: int, wrap_around: bool):
    """B-slice reconstruction: per-unit uni/bi combine + residual sum."""
    from .inter_frame import _combine_bi, _mc_planes_internal
    u = top >> depth
    h, w = ref0[0].shape
    nuy, nux = h // u, w // u
    shapes = rect_shapes(top, depth)
    i0 = _mc_planes_internal(*ref0, mv0_unit, u, bit_depth, wrap_around)
    i1 = _mc_planes_internal(*ref1, mv1_unit, u, bit_depth, wrap_around)
    pred_y = _combine_bi(i0[0], i1[0], dirs_unit, nuy, nux, bit_depth)
    pred_u = _combine_bi(i0[1], i1[1], dirs_unit, nuy, nux, bit_depth)
    pred_v = _combine_bi(i0[2], i1[2], dirs_unit, nuy, nux, bit_depth)
    maxv = (1 << bit_depth) - 1
    ry = jnp.clip(pred_y + _resid_sum_plane(sq_levels, rect_levels, shapes,
                                            0, qp, 1, bit_depth, h, w),
                  0, maxv)
    ru = jnp.clip(pred_u + _resid_sum_plane(sq_levels, rect_levels, shapes,
                                            1, qp, 2, bit_depth, h, w),
                  0, maxv)
    rv = jnp.clip(pred_v + _resid_sum_plane(sq_levels, rect_levels, shapes,
                                            2, qp, 2, bit_depth, h, w),
                  0, maxv)
    return dict(y=ry, u=ru, v=rv)


# ------------------------------------------------------------ drivers


def _square_pass_costs(orig, refs_pad, refs1_pad, sizes, qp, bit_depth,
                       search_range, lam, lam16, mv_bits, dual: bool):
    """Square-leaf evaluation per level (mirrors qtree's per-size loop).
    Returns per-level dicts with mv [mv1 dirs] lev cost."""
    out = []
    parent = None
    for s in sizes:
        d = _eval_rect_pass(orig, refs_pad, s, s, 0, 0, qp, bit_depth,
                            search_range, lam, lam16, parent,
                            dual=(refs1_pad, mv_bits) if dual else None)
        out.append(d)
        parent = d["mv"]
    return out


def _rect_passes(orig, refs_pad, refs1_pad, shapes, sq, qp, bit_depth,
                 search_range, lam, lam16, mv_bits, dual: bool):
    rect = {}
    for info in shapes:
        kind, d, sy, sx, y_off, x_off = info
        rect[(kind, d)] = _eval_rect_pass(
            orig, refs_pad, sy, sx, y_off, x_off, qp, bit_depth,
            search_range, lam, lam16, sq[d]["mv"],
            dual=(refs1_pad, mv_bits) if dual else None)
    return rect


def encode_p_frame_mtt(orig_y, orig_u, orig_v, ref_y, ref_u, ref_v,
                       qp: int, top: int = 32, depth: int = 2,
                       bit_depth: int = 8, search_range: int = 24,
                       wrap_around: bool = False):
    """Batched MTT P encode.  Returns a dict with codes / square + rect
    mv & levels / resolved unit fields / recon / deblock inputs."""
    sizes = node_sizes(top, depth)
    u = sizes[-1]
    shapes = rect_shapes(top, depth)
    lam = quant.lambda_from_qp(qp, intra=False)
    lam16 = int(lam ** 0.5 * 16)
    orig = (orig_y, orig_u, orig_v)
    refs_pad = (pad_ref(ref_y, MC_MARGIN, wrap_around),
                pad_ref(ref_u, MC_MARGIN // 2, wrap_around),
                pad_ref(ref_v, MC_MARGIN // 2, wrap_around))
    sq = _square_pass_costs(orig, refs_pad, None, sizes, qp, bit_depth,
                            search_range, lam, lam16, 0, False)
    rect = _rect_passes(orig, refs_pad, None, shapes, sq, qp, bit_depth,
                        search_range, lam, lam16, 0, False)
    per_cost = [d["cost"] for d in sq]
    codes, alive = resolve_mtt(per_cost, rect, top, depth, lam)
    sq_leaf = [alive[d] & (codes[d] == LEAF) for d in range(depth)]
    sq_leaf.append(alive[depth])
    rect_masks = {}
    for info in shapes:
        kind, d = info[0], info[1]
        code_val = {"bth": BTH, "btv": BTV, "tth_o": TTH, "tth_m": TTH,
                    "ttv_o": TTV, "ttv_m": TTV}[kind]
        nby, nbx = codes[d].shape
        rect_masks[(kind, d)] = _rect_leaf_mask(codes[d] == code_val,
                                                alive[d], kind, nby, nbx)
    nuy, nux = orig_y.shape[0] // u, orig_y.shape[1] // u
    sq_lev = [d["lev"] for d in sq]
    masked_sq, masked_rect, has_resid_unit, leaf_id_unit = \
        _mask_levels_mtt(sq_lev, sq_leaf, rect, rect_masks, shapes, sizes,
                         u, nuy, nux)
    mv_unit = _resolve_fields_mtt([d["mv"] for d in sq], sq_leaf,
                                  {k: v["mv"] for k, v in rect.items()},
                                  rect_masks, shapes, sizes, u)
    recon = reconstruct_mtt(mv_unit, masked_sq, masked_rect, ref_y, ref_u,
                            ref_v, qp, top, depth, bit_depth, wrap_around)
    return dict(codes=codes, sq_mv=[d["mv"] for d in sq],
                sq_levels=masked_sq,
                rect_mv={k: v["mv"] for k, v in rect.items()},
                rect_levels=masked_rect, rect_masks=rect_masks,
                mv_unit=mv_unit, recon=recon,
                has_resid_unit=has_resid_unit, leaf_id_unit=leaf_id_unit)


def encode_b_frame_mtt(orig_y, orig_u, orig_v, ref0, ref1, qp: int,
                       top: int = 32, depth: int = 2, bit_depth: int = 8,
                       search_range: int = 24, wrap_around: bool = False):
    """Batched MTT B encode: per-list ME + uni/bi decision at every shape
    of the lattice."""
    sizes = node_sizes(top, depth)
    u = sizes[-1]
    shapes = rect_shapes(top, depth)
    lam = quant.lambda_from_qp(qp, intra=False)
    lam16 = int(lam ** 0.5 * 16)
    mv_bits = int(lam ** 0.5 * 8)
    orig = (orig_y, orig_u, orig_v)
    r0_pad = (pad_ref(ref0[0], MC_MARGIN, wrap_around),
              pad_ref(ref0[1], MC_MARGIN // 2, wrap_around),
              pad_ref(ref0[2], MC_MARGIN // 2, wrap_around))
    r1_pad = (pad_ref(ref1[0], MC_MARGIN, wrap_around),
              pad_ref(ref1[1], MC_MARGIN // 2, wrap_around),
              pad_ref(ref1[2], MC_MARGIN // 2, wrap_around))
    sq = _square_pass_costs(orig, r0_pad, r1_pad, sizes, qp, bit_depth,
                            search_range, lam, lam16, mv_bits, True)
    rect = _rect_passes(orig, r0_pad, r1_pad, shapes, sq, qp, bit_depth,
                        search_range, lam, lam16, mv_bits, True)
    per_cost = [d["cost"] for d in sq]
    codes, alive = resolve_mtt(per_cost, rect, top, depth, lam)
    sq_leaf = [alive[d] & (codes[d] == LEAF) for d in range(depth)]
    sq_leaf.append(alive[depth])
    rect_masks = {}
    for info in shapes:
        kind, d = info[0], info[1]
        code_val = {"bth": BTH, "btv": BTV, "tth_o": TTH, "tth_m": TTH,
                    "ttv_o": TTV, "ttv_v": TTV, "ttv_m": TTV}[kind]
        nby, nbx = codes[d].shape
        rect_masks[(kind, d)] = _rect_leaf_mask(codes[d] == code_val,
                                                alive[d], kind, nby, nbx)
    nuy, nux = orig_y.shape[0] // u, orig_y.shape[1] // u
    sq_lev = [d["lev"] for d in sq]
    masked_sq, masked_rect, has_resid_unit, leaf_id_unit = \
        _mask_levels_mtt(sq_lev, sq_leaf, rect, rect_masks, shapes, sizes,
                         u, nuy, nux)
    mkmv = lambda key2: (
        [d[key2] for d in sq],
        {k: v[key2] for k, v in rect.items()})
    sqf, rectf = mkmv("mv")
    mv0_unit = _resolve_fields_mtt(sqf, sq_leaf, rectf, rect_masks,
                                   shapes, sizes, u)
    sqf, rectf = mkmv("mv1")
    mv1_unit = _resolve_fields_mtt(sqf, sq_leaf, rectf, rect_masks,
                                   shapes, sizes, u)
    sqf, rectf = mkmv("dirs")
    dirs_unit = _resolve_fields_mtt(sqf, sq_leaf, rectf, rect_masks,
                                    shapes, sizes, u)
    recon = reconstruct_mtt_b(mv0_unit, mv1_unit, dirs_unit, masked_sq,
                              masked_rect, tuple(ref0), tuple(ref1), qp,
                              top, depth, bit_depth, wrap_around)
    return dict(codes=codes, sq_mv0=[d["mv"] for d in sq],
                sq_mv1=[d["mv1"] for d in sq],
                sq_dirs=[d["dirs"] for d in sq],
                sq_levels=masked_sq,
                rect_mv0={k: v["mv"] for k, v in rect.items()},
                rect_mv1={k: v["mv1"] for k, v in rect.items()},
                rect_dirs={k: v["dirs"] for k, v in rect.items()},
                rect_levels=masked_rect, rect_masks=rect_masks,
                mv0_unit=mv0_unit, mv1_unit=mv1_unit, dirs_unit=dirs_unit,
                recon=recon, has_resid_unit=has_resid_unit,
                leaf_id_unit=leaf_id_unit)
