"""MVReprojection — per-4x4-subblock motion reprojection, frame-batched.

TPU-native re-design of the reference MVReprojection (reference:
source/Lib/CommonLib/MVReprojection.cpp — fillCache:69-73 full-frame 4x4
subblock-center grid with offset MMOffset4x4 in {0..3, 4->1.5};
reprojectMotionVectorSubblocks:81 returns per-subblock *absolute* target
positions in fixed point; NaN -> identity fallback :158-161; chroma rescale
:164-167; round to 1/16-pel :170-173).

Key TPU insight vs the reference's per-block calls: the subblock-center grid
and all model math are elementwise, so we reproject EVERY subblock of the
frame in one shot per (model, MV-field) — per-block MVs and block centers
are broadcast to their subblocks.  Mixed-model frames merge per-subblock
positions with masks, after which ONE gather/interp MC pass handles all
models (including CLASSIC) uniformly.

Chroma note (4:2:0): the reference recomputes the grid in luma-scaled
coordinates at the same spatial points, divides by 2 and rounds at 1/32
chroma precision — numerically identical to the luma 1/16 fixed result
(round(x/2*32) == round(x*16)).  So one int32 position tensor serves both:
luma interprets it as (1/16, luma samples), chroma as (1/32, chroma
samples) — mirroring InterPrediction.cpp:683 xPredInterBlkMM's shiftHor =
MV_FRACTIONAL_BITS + componentScale.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import models
from ..typedefs import MotionModelID as M
from ...lib360.projection import ERP

SUBBLK = 4       # luma subblock size (reference: MVReprojection 4x4)


class ReprojectionLUT:
    """2-D grid LUT caching a plane -> projection reprojection map
    (reference: ReprojectionLUT.h:10-35 — instantiated over
    [-1393, 1393] x [-1364, 1364] in the MPA constructor,
    MotionPlaneAdaptiveMotionModel.cpp:10-24; the reference currently
    bypasses it in favour of the direct path, and so does our batched
    pipeline — the class is provided for parity and for host-side scalar
    queries where a full jit dispatch would cost a tunnel round trip).

    Samples `fn` (vectorized (x, y) -> (u, v)) on a step-strided grid and
    answers queries with bilinear interpolation."""

    def __init__(self, fn, x_range, y_range, step: float = 1.0):
        self.x0, x1 = x_range
        self.y0, y1 = y_range
        self.step = float(step)
        xs = np.arange(self.x0, x1 + step, step, dtype=np.float64)
        ys = np.arange(self.y0, y1 + step, step, dtype=np.float64)
        gx, gy = np.meshgrid(xs, ys)
        u, v = fn(gx, gy)
        self.u = np.asarray(u, np.float64)
        self.v = np.asarray(v, np.float64)

    def __call__(self, x, y):
        fx = (np.asarray(x, np.float64) - self.x0) / self.step
        fy = (np.asarray(y, np.float64) - self.y0) / self.step
        ix = np.clip(fx.astype(int), 0, self.u.shape[1] - 2)
        iy = np.clip(fy.astype(int), 0, self.u.shape[0] - 2)
        ax = np.clip(fx - ix, 0.0, 1.0)
        ay = np.clip(fy - iy, 0.0, 1.0)

        def bil(t):
            return ((1 - ay) * ((1 - ax) * t[iy, ix] + ax * t[iy, ix + 1])
                    + ay * ((1 - ax) * t[iy + 1, ix]
                            + ax * t[iy + 1, ix + 1]))
        return bil(self.u), bil(self.v)


def offset4x4_value(code: int) -> float:
    """reference: MVReprojection.cpp:10 — code 4 means 1.5."""
    return 1.5 if code == 4 else float(code)


class MVReprojection:
    """Per-frame-geometry reprojection state (caches the subblock grid and
    per-model frame caches)."""

    def __init__(self, proj: ERP, width: int, height: int,
                 offset4x4_code: int = 1, ged_flavor: int = 1) -> None:
        self.proj = proj
        self.width = width
        self.height = height
        self.offset = offset4x4_value(offset4x4_code)
        self.angle_res = math.pi / height
        self.ged_flavor = ged_flavor
        nsx, nsy = width // SUBBLK, height // SUBBLK
        gx = (np.arange(nsx, dtype=np.float32) * SUBBLK + self.offset)
        gy = (np.arange(nsy, dtype=np.float32) * SUBBLK + self.offset)
        self.grid_x = jnp.asarray(np.broadcast_to(gx[None, :], (nsy, nsx)))
        self.grid_y = jnp.asarray(np.broadcast_to(gy[:, None], (nsy, nsx)))
        self._mpa_cache: dict[int, tuple] = {}
        self._ged_rot: dict[tuple, np.ndarray] = {}

    # -- caches ------------------------------------------------------------
    def mpa_cache(self, plane: int):
        """Full-frame perspective-plane cache (reference:
        MotionPlaneAdaptiveMotionModel.cpp:106 fillCache)."""
        if plane not in self._mpa_cache:
            self._mpa_cache[plane] = models.mpa_to_perspective(
                self.proj, plane, self.grid_x, self.grid_y)
        return self._mpa_cache[plane]

    def ged_rot(self, epipole) -> np.ndarray:
        key = tuple(np.round(np.asarray(epipole, dtype=np.float64), 9))
        if key not in self._ged_rot:
            self._ged_rot[key] = models.ged_rotation_matrix(epipole)
        return self._ged_rot[key]

    # -- the engine --------------------------------------------------------
    def _subblock_mv_center(self, mvs: jnp.ndarray, block_size: int,
                            row_step: int = 1):
        """Broadcast per-block (nby, nbx, 2) 1/16-pel MVs and block centers
        to the subblock grid -> per-subblock float mv/center arrays.
        row_step > 1 keeps only every row_step-th subblock row (subsampled
        SAD during search, the reference's RdCost subShift analog)."""
        rep = block_size // SUBBLK
        mvf = mvs.astype(jnp.float32) / 16.0
        mv_x = jnp.repeat(jnp.repeat(mvf[..., 0], rep, 0),
                          rep, 1)[::row_step]
        mv_y = jnp.repeat(jnp.repeat(mvf[..., 1], rep, 0),
                          rep, 1)[::row_step]
        nby, nbx = mvs.shape[:2]
        cx = (np.arange(nbx, dtype=np.float32) * block_size
              + (block_size - 1) / 2.0)
        cy = (np.arange(nby, dtype=np.float32) * block_size
              + (block_size - 1) / 2.0)
        cx = jnp.repeat(jnp.asarray(cx)[None, :], nby, 0)
        cy = jnp.repeat(jnp.asarray(cy)[:, None], nbx, 1)
        c_x = jnp.repeat(jnp.repeat(cx, rep, 0), rep, 1)[::row_step]
        c_y = jnp.repeat(jnp.repeat(cy, rep, 0), rep, 1)[::row_step]
        return mv_x, mv_y, c_x, c_y

    def reproject_frame(self, model_id: int, mvs: jnp.ndarray,
                        block_size: int, epipole=None,
                        row_step: int = 1) -> jnp.ndarray:
        """Model every subblock of the frame under `model_id`.

        Args:
          mvs: (nby, nbx, 2) int 1/16-pel motion vectors.
          epipole: (3,) for GEODESIC_CAMPOSE.
          row_step: keep every row_step-th subblock row only (search-time
            subsampled SAD; normative paths use 1).
        Returns:
          (nsy, nsx, 2) int32 absolute subblock target positions, 1/16-pel
          luma fixed point (see module docstring for chroma reuse).
        """
        mv_x, mv_y, c_x, c_y = self._subblock_mv_center(mvs, block_size,
                                                        row_step)
        gx, gy = self.grid_x[::row_step], self.grid_y[::row_step]
        p = self.proj
        if model_id == M.CLASSIC:
            ox, oy = models.translational_motion(gx, gy, mv_x, mv_y)
        elif model_id in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT,
                          M.MPA_TOP_BOTTOM):
            cache = tuple(c[::row_step] for c in self.mpa_cache(model_id))
            ox, oy = models.mpa_motion(p, model_id, gx, gy, mv_x, mv_y,
                                       pers_cache=cache)
        elif model_id == M.THREE_D_TRANSLATIONAL:
            ox, oy = models.t3d_motion(p, gx, gy, mv_x, mv_y, c_x, c_y)
        elif model_id == M.TANGENTIAL:
            ox, oy = models.tan_motion(p, self.angle_res, gx, gy, mv_x, mv_y,
                                       c_x, c_y)
        elif model_id == M.ROTATIONAL:
            ox, oy = models.rot_motion(p, self.angle_res, gx, gy, mv_x, mv_y,
                                       c_x, c_y)
        elif model_id in (M.GEODESIC_CAMPOSE, M.GEODESIC_AXIS_X,
                          M.GEODESIC_AXIS_Y, M.GEODESIC_AXIS_Z):
            if model_id != M.GEODESIC_CAMPOSE:
                epipole = models.GEDA_EPIPOLES[M(model_id)]
            assert epipole is not None, "GED_CAMPOSE needs an epipole"
            rot = self.ged_rot(epipole)
            ox, oy = models.ged_motion(p, self.angle_res, rot,
                                       self.ged_flavor, gx, gy, mv_x, mv_y,
                                       c_x, c_y)
        else:
            raise ValueError(f"unknown model {model_id}")
        # NaN -> no motion (reference: MVReprojection.cpp:158-161)
        bad = jnp.isnan(ox) | jnp.isnan(oy)
        ox = jnp.where(bad, gx, ox) - self.offset
        oy = jnp.where(bad, gy, oy) - self.offset
        fx = jnp.round(ox * 16.0).astype(jnp.int32)
        fy = jnp.round(oy * 16.0).astype(jnp.int32)
        return jnp.stack([fx, fy], axis=-1)

    def mv_in_desired_model(self, pos_xy, mv_orig_16th, model_orig: int,
                            model_desired: int, center_cand_xy,
                            center_cur_xy, epipole_orig=None,
                            epipole_des=None):
        """MM-MVP candidate conversion, batched over candidates (reference:
        MVReprojection.cpp:168 motionVectorInDesiredMotionModel — forward-map
        the candidate MV at `pos`, then closed-form inverse in the desired
        model).  All positional args are arrays broadcastable to (B,).

        Returns (B, 2) int32 1/16-pel MVs (0 where NaN/invalid)."""
        px = jnp.asarray(pos_xy[..., 0], dtype=jnp.float32)
        py = jnp.asarray(pos_xy[..., 1], dtype=jnp.float32)
        mvf = jnp.asarray(mv_orig_16th, dtype=jnp.float32) / 16.0
        ccx = jnp.asarray(center_cand_xy[..., 0], dtype=jnp.float32)
        ccy = jnp.asarray(center_cand_xy[..., 1], dtype=jnp.float32)
        kcx = jnp.asarray(center_cur_xy[..., 0], dtype=jnp.float32)
        kcy = jnp.asarray(center_cur_xy[..., 1], dtype=jnp.float32)
        sx, sy = self._model_motion_pointwise(model_orig, px, py,
                                              mvf[..., 0], mvf[..., 1],
                                              ccx, ccy, epipole_orig)
        mx, my = self._mv_for_shift(model_desired, px, py, sx, sy, kcx, kcy,
                                    epipole_des)
        bad = jnp.isnan(mx) | jnp.isnan(my)
        zero = (mvf[..., 0] == 0) & (mvf[..., 1] == 0)
        out_x = jnp.where(bad | zero, 0, jnp.round(mx * 16.0))
        out_y = jnp.where(bad | zero, 0, jnp.round(my * 16.0))
        return jnp.stack([out_x, out_y], -1).astype(jnp.int32)

    def reproject_block_centers(self, model_id: int, mvs: jnp.ndarray,
                                block_size: int, epipole=None
                                ) -> jnp.ndarray:
        """Block-translational search approximation: model the motion of
        each BLOCK CENTER only and return the 1/16-pel position of the
        block's top-left sample under that uniform displacement.

        Decision-only (ranks search candidates; the reference's ME also
        ranks on simplified costs, RdCost subShift) — normative paths use
        the full per-subblock reprojection (reproject_frame).  Within a
        block the model-induced deformation is nearly constant across
        neighboring candidates of a refinement step, so the ranking error
        largely cancels.

        mvs (nby, nbx, 2) int 1/16-pel -> (nby, nbx, 2) int32 positions."""
        nby, nbx = mvs.shape[:2]
        s = block_size
        cx = (jnp.arange(nbx, dtype=jnp.float32) * s + (s - 1) / 2.0)
        cy = (jnp.arange(nby, dtype=jnp.float32) * s + (s - 1) / 2.0)
        cx = jnp.broadcast_to(cx[None, :], (nby, nbx))
        cy = jnp.broadcast_to(cy[:, None], (nby, nbx))
        mvf = mvs.astype(jnp.float32) / 16.0
        ox, oy = self._model_motion_pointwise(model_id, cx, cy,
                                              mvf[..., 0], mvf[..., 1],
                                              cx, cy, epipole)
        bad = jnp.isnan(ox) | jnp.isnan(oy)
        ox = jnp.where(bad, cx, ox)
        oy = jnp.where(bad, cy, oy)
        half = (s - 1) / 2.0
        fx = jnp.round((ox - half) * 16.0).astype(jnp.int32)
        fy = jnp.round((oy - half) * 16.0).astype(jnp.int32)
        return jnp.stack([fx, fy], axis=-1)

    def _model_motion_pointwise(self, model_id, px, py, mvx, mvy, cx, cy,
                                epipole):
        p = self.proj
        if model_id == M.CLASSIC:
            return models.translational_motion(px, py, mvx, mvy)
        if model_id in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT,
                        M.MPA_TOP_BOTTOM):
            return models.mpa_motion(p, model_id, px, py, mvx, mvy)
        if model_id == M.THREE_D_TRANSLATIONAL:
            return models.t3d_motion(p, px, py, mvx, mvy, cx, cy)
        if model_id == M.TANGENTIAL:
            return models.tan_motion(p, self.angle_res, px, py, mvx, mvy,
                                     cx, cy)
        if model_id == M.ROTATIONAL:
            return models.rot_motion(p, self.angle_res, px, py, mvx, mvy,
                                     cx, cy)
        if model_id != M.GEODESIC_CAMPOSE:
            epipole = models.GEDA_EPIPOLES[M(model_id)]
        rot = self.ged_rot(epipole)
        return models.ged_motion(p, self.angle_res, rot, self.ged_flavor,
                                 px, py, mvx, mvy, cx, cy)

    def _mv_for_shift(self, model_id, px, py, sx, sy, cx, cy, epipole):
        p = self.proj
        if model_id == M.CLASSIC:
            return models.translational_mv_for_shift(px, py, sx, sy)
        if model_id in (M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT,
                        M.MPA_TOP_BOTTOM):
            return models.mpa_mv_for_shift(p, model_id, px, py, sx, sy)
        if model_id == M.THREE_D_TRANSLATIONAL:
            return models.t3d_mv_for_shift(p, px, py, sx, sy, cx, cy)
        if model_id == M.TANGENTIAL:
            return models.tan_mv_for_shift(p, self.angle_res, px, py, sx, sy,
                                           cx, cy)
        if model_id == M.ROTATIONAL:
            return models.rot_mv_for_shift(p, self.angle_res, px, py, sx, sy,
                                           cx, cy)
        if model_id != M.GEODESIC_CAMPOSE:
            epipole = models.GEDA_EPIPOLES[M(model_id)]
        rot = self.ged_rot(epipole)
        return models.ged_mv_for_shift(p, self.angle_res, rot,
                                       self.ged_flavor, px, py, sx, sy,
                                       cx, cy)
