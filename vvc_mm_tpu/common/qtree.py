"""Quadtree inter partitioning — the TPU answer to VTM's QTMT.

Reference: the QTBT partitioner (source/Lib/CommonLib/UnitPartitioner.h:56-64
CU_QUAD_SPLIT et al.) driven by the recursive per-CU RD search
(EncCu.cpp:499 xCompressCU, :1118 xCheckModeSplit).  That control flow is
serial and data-dependent; the TPU re-design evaluates *every node of the
split lattice for all CTUs at once*:

  1. one batched ME + residual pass per node size (top, top/2, ... unit),
  2. per-block RD costs as tensors (SSD + lambda * bit estimates),
  3. a bottom-up min-reduction resolves the split tree (argmin over the
     fixed lattice — no recursion, no divergence),
  4. the chosen tree is *resolved to the unit grid*: a per-unit MV field
     drives ONE motion-compensation pass (separable MC is position-
     invariant, so unit-granularity MC of a merged leaf is bit-identical
     to leaf-granularity MC), while residuals stay per-leaf-size (the
     transform size is what the tree actually changes).

Quad split only (no BT/TT yet): three dyadic sizes already recover most of
the partitioning gain at a fraction of the lattice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import interp, quant, transforms
from .inter_frame import (MC_MARGIN, _block_coords, _from_blocks,
                          _residual_pass, _to_blocks, mc_predict, pad_ref)
from ..encoder import me as me_mod


def node_sizes(top: int, depth: int) -> list[int]:
    return [top >> d for d in range(depth + 1)]


def _up2(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """Nearest-neighbor upsample of the leading two axes by f."""
    return jnp.repeat(jnp.repeat(x, f, axis=0), f, axis=1)


def _sum2x2(x: jnp.ndarray) -> jnp.ndarray:
    h, w = x.shape
    return x.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))


def _coeff_bits_est(lev: jnp.ndarray) -> jnp.ndarray:
    """Per-block coefficient bit estimate (RdCost analog for mode decision;
    the real rate comes from the CABAC pass).  lev: (nby, nbx, s, s)."""
    a = jnp.abs(lev).astype(jnp.float32)
    bits = jnp.where(a > 0, 2.0 * jnp.ceil(jnp.log2(a + 1.0)) + 1.0, 0.0)
    return bits.sum(axis=(2, 3))


def _mv_bits_est(mv: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """EG1-ish bit estimate of an MVD given a predictor grid."""
    d = jnp.abs(mv - pred).astype(jnp.float32).sum(axis=-1)
    return 2.0 * jnp.log2(d + 1.0) + 2.0


@functools.partial(jax.jit, static_argnames=("qp", "top", "depth",
                                             "bit_depth", "wrap_around"))
def reconstruct_qt(mv_unit, levels, ref_y, ref_u, ref_v, qp: int, top: int,
                   depth: int, bit_depth: int, wrap_around: bool):
    """Shared encoder/decoder reconstruction: one unit-granularity MC pass
    + the sum of per-size inverse transforms (non-leaf nodes carry all-zero
    levels, so their residual contribution is exactly zero).

    Args:
      mv_unit: (H/u, W/u, 2) resolved 1/16-pel MV field, u = top >> depth.
      levels: list over sizes [top .. u] of (lev_y, lev_u, lev_v) grids.
    Returns recon dict(y=, u=, v=).
    """
    u = top >> depth
    h, w = ref_y.shape
    pred_y, pred_u, pred_v = mc_predict(ref_y, ref_u, ref_v, mv_unit, u,
                                        bit_depth, wrap_around)

    def resid_plane(lev_list, size_list, hh, ww):
        total = jnp.zeros((hh, ww), dtype=jnp.int32)
        for lev, s in zip(lev_list, size_list):
            log2s = s.bit_length() - 1
            dq = quant.dequantize(lev.reshape(-1, s, s), qp, log2s, log2s,
                                  bit_depth)
            r = transforms.inverse_transform(dq, bit_depth=bit_depth)
            total = total + _from_blocks(r, hh // s, ww // s)
        return total

    sizes = node_sizes(top, depth)
    ry = resid_plane([l[0] for l in levels], sizes, h, w)
    ru = resid_plane([l[1] for l in levels], [s // 2 for s in sizes],
                     h // 2, w // 2)
    rv = resid_plane([l[2] for l in levels], [s // 2 for s in sizes],
                     h // 2, w // 2)
    mx = (1 << bit_depth) - 1
    return dict(y=jnp.clip(pred_y + ry, 0, mx),
                u=jnp.clip(pred_u + ru, 0, mx),
                v=jnp.clip(pred_v + rv, 0, mx))


@functools.partial(jax.jit, static_argnames=("qp", "top", "depth",
                                             "bit_depth", "search_range",
                                             "wrap_around"))
def encode_p_frame_qt(orig_y, orig_u, orig_v, ref_y, ref_u, ref_v, qp: int,
                      top: int = 32, depth: int = 2, bit_depth: int = 8,
                      search_range: int = 24, wrap_around: bool = False):
    """Batched quadtree P encode.  Returns a dict with:
      splits: list of depth bool grids (split decision per node level),
      mvs: list of depth+1 per-size MV grids (1/16-pel),
      levels: list of per-size (lev_y, lev_u, lev_v), zeroed off-leaf,
      leaf: list of per-size bool leaf masks,
      mv_unit: resolved (H/u, W/u, 2) field, recon dict,
      has_resid_unit / leaf_id_unit: deblock inputs at unit granularity.
    """
    sizes = node_sizes(top, depth)
    u = sizes[-1]
    lam = quant.lambda_from_qp(qp, intra=False)
    lam16 = int(lam ** 0.5 * 16)
    ry_pad = pad_ref(ref_y, MC_MARGIN, wrap_around)

    per_mv, per_lev, per_cost = [], [], []
    parent_mv = None
    for s in sizes:
        mv_int, _ = me_mod.hierarchical_search(orig_y, ry_pad, s,
                                               search_range, MC_MARGIN,
                                               lam16)
        mv, _ = me_mod.fractional_refine(orig_y, ry_pad, mv_int, s,
                                         MC_MARGIN, bit_depth)
        py, pu, pv = mc_predict(ref_y, ref_u, ref_v, mv, s, bit_depth,
                                wrap_around)
        ly, rec_y = _residual_pass(orig_y, py, s, qp, bit_depth)
        lu, rec_u = _residual_pass(orig_u, pu, s // 2, qp, bit_depth)
        lv, rec_v = _residual_pass(orig_v, pv, s // 2, qp, bit_depth)

        def bsum(x, size):
            hh, ww = x.shape
            return x.reshape(hh // size, size, ww // size, size
                             ).sum(axis=(1, 3))
        ssd = (bsum((orig_y - rec_y) ** 2, s)
               + bsum((orig_u - rec_u) ** 2, s // 2)
               + bsum((orig_v - rec_v) ** 2, s // 2)).astype(jnp.float32)
        bits = (_coeff_bits_est(ly) + _coeff_bits_est(lu)
                + _coeff_bits_est(lv) + 6.0)          # ~skip/cbf/hdr bins
        pred_grid = (jnp.zeros_like(mv) if parent_mv is None
                     else _up2(parent_mv))
        bits = bits + _mv_bits_est(mv, pred_grid)
        per_mv.append(mv)
        per_lev.append((ly, lu, lv))
        per_cost.append(ssd + jnp.float32(lam) * bits)
        parent_mv = mv

    # bottom-up tree resolve: min(cost of keeping the node, cost of its
    # four children) — the batched analog of EncCu::xCheckModeSplit
    splits = [None] * depth
    best = per_cost[depth]
    for d in range(depth - 1, -1, -1):
        agg = _sum2x2(best) + jnp.float32(lam)        # +1 split-flag bit
        splits[d] = agg < per_cost[d]
        best = jnp.where(splits[d], agg, per_cost[d])

    # top-down leaf masks
    leaf = []
    alive = jnp.ones(per_cost[0].shape, dtype=bool)
    for d in range(depth):
        sp = splits[d] & alive
        splits[d] = sp
        leaf.append(alive & ~sp)
        alive = _up2(sp)
    leaf.append(alive)

    # resolve to the unit grid
    mv_unit = per_mv[depth]
    has_resid_unit = jnp.zeros(per_cost[depth].shape, dtype=bool)
    leaf_id_unit = jnp.zeros(per_cost[depth].shape, dtype=jnp.int32)
    nux = per_cost[depth].shape[1]
    masked_levels = []
    for d, s in enumerate(sizes):
        f = s // u
        lmask = leaf[d]
        ml = tuple(lev * lmask[:, :, None, None] for lev in per_lev[d])
        masked_levels.append(ml)
        hr = (jnp.any(ml[0] != 0, axis=(2, 3))
              | jnp.any(ml[1] != 0, axis=(2, 3))
              | jnp.any(ml[2] != 0, axis=(2, 3)))
        lm_u = _up2(lmask, f)
        has_resid_unit = has_resid_unit | (lm_u & _up2(hr, f))
        if d < depth:
            mv_unit = jnp.where(lm_u[:, :, None], _up2(per_mv[d], f),
                                mv_unit)
        nby = per_cost[d].shape[0]
        by = jnp.arange(nby, dtype=jnp.int32)[:, None] * f
        bx = jnp.arange(per_cost[d].shape[1], dtype=jnp.int32)[None, :] * f
        tl_id = by * nux + bx
        leaf_id_unit = jnp.where(lm_u, _up2(tl_id, f), leaf_id_unit)

    recon = reconstruct_qt(mv_unit, masked_levels, ref_y, ref_u, ref_v, qp,
                           top, depth, bit_depth, wrap_around)
    return dict(splits=splits, mvs=per_mv, levels=masked_levels, leaf=leaf,
                mv_unit=mv_unit, recon=recon,
                has_resid_unit=has_resid_unit, leaf_id_unit=leaf_id_unit)


def qt_boundary_strengths(mv_unit, has_resid_unit, leaf_id_unit):
    """Deblock boundary strengths on the unit grid, masked to actual leaf
    boundaries (no edges interior to a transform block — reference:
    deblocking runs on CU/TU edges only, DeblockingFilter.cpp xDeblockCU)."""
    from . import deblock
    bs_v, bs_h = deblock.boundary_strengths_inter(
        jnp.asarray(mv_unit, dtype=jnp.int32), has_resid_unit)
    edge_v = leaf_id_unit[:, 1:] != leaf_id_unit[:, :-1]
    edge_h = leaf_id_unit[1:] != leaf_id_unit[:-1]
    return bs_v * edge_v, bs_h * edge_h
