"""4-parameter affine motion: subblock MC + batched gradient search.

TPU-native analog of the reference's affine tools (reference:
source/Lib/CommonLib/InterPrediction.cpp:1143 xPredAffineBlk — per-4x4
subblock MVs from control-point MVs; EncoderLib affine ME seeded by
AffineGradientSearch.{cpp,h} — per-block least-squares on spatial
gradients; affine is CLASSIC-only, disabled under MM models,
InterSearch.cpp:2783).

Parameterization (zoom+rotation, VVC 4-param equivalent):
  mv(x, y) = mv0 + ( d.x * x - d.y * y,  d.y * x + d.x * y ) / s
with block-local pixel coords (x, y), block size s, mv0 the top-left
control-point MV (1/16-pel) and d = mv_TR - mv_TL (1/16-pel across the
block width) — the two signaled quantities.

The TPU design evaluates the affine field for *all* blocks at once:
per-4x4 subblock MVs become absolute positions consumed by the unified
position-based MC (common/mm/mc.py — the same kernel that serves the MM
models), and the encoder-side parameter search is one batched 4x4
normal-equation solve per block (jnp.linalg.solve over the block axis)
instead of the reference's per-CU iterative loop.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import interp, quant
from .inter_frame import MC_MARGIN, _to_blocks, pad_ref
from .mm import mc as mm_mc


def _round_shift(v: jnp.ndarray, sh: int) -> jnp.ndarray:
    return (v + (1 << (sh - 1))) >> sh


def affine_positions(mv0: jnp.ndarray, dmv: jnp.ndarray, block_size: int,
                     width: int, height: int) -> jnp.ndarray:
    """Per-4x4-subblock absolute 1/16-pel positions of the affine field.

    Args:
      mv0: (nby, nbx, 2) top-left CPMV, 1/16-pel.
      dmv: (nby, nbx, 2) mv_TR - mv_TL, 1/16-pel over the block width.
    Returns (H/4, W/4, 2) int32 subblock-origin positions (mm/mc.py form).
    """
    s = block_size
    log2s = s.bit_length() - 1
    nsy, nsx = height // 4, width // 4
    rep = s // 4
    mx = jnp.repeat(jnp.repeat(mv0[..., 0], rep, 0), rep, 1).astype(jnp.int32)
    my = jnp.repeat(jnp.repeat(mv0[..., 1], rep, 0), rep, 1).astype(jnp.int32)
    dx = jnp.repeat(jnp.repeat(dmv[..., 0], rep, 0), rep, 1).astype(jnp.int32)
    dy = jnp.repeat(jnp.repeat(dmv[..., 1], rep, 0), rep, 1).astype(jnp.int32)
    # subblock-center offsets inside the block, in pixels
    cx = (jnp.arange(nsx, dtype=jnp.int32) % rep) * 4 + 2
    cy = (jnp.arange(nsy, dtype=jnp.int32) % rep) * 4 + 2
    cx = jnp.broadcast_to(cx[None, :], (nsy, nsx))
    cy = jnp.broadcast_to(cy[:, None], (nsy, nsx))
    sub_mvx = mx + _round_shift(dx * cx - dy * cy, log2s)
    sub_mvy = my + _round_shift(dy * cx + dx * cy, log2s)
    base_x = (jnp.arange(nsx, dtype=jnp.int32) * 64)[None, :]
    base_y = (jnp.arange(nsy, dtype=jnp.int32) * 64)[:, None]
    return jnp.stack([base_x + sub_mvx, base_y + sub_mvy], -1)


def mixed_positions(mvs: jnp.ndarray, mv0_aff: jnp.ndarray,
                    dmv: jnp.ndarray, aff_flag: jnp.ndarray,
                    block_size: int, width: int, height: int) -> jnp.ndarray:
    """Resolve a mixed translational/affine frame to one position grid —
    a single unified MC pass serves both (like the MM mixed-model merge)."""
    rep = block_size // 4
    trans = mm_mc.classic_positions(0.0, width, height, mvs, block_size)
    aff = affine_positions(mv0_aff, dmv, block_size, width, height)
    f = jnp.repeat(jnp.repeat(aff_flag, rep, 0), rep, 1)
    return jnp.where(f[..., None], aff, trans).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_size", "bit_depth",
                                             "wrap_around"))
def mc_predict_positions(ref_y, ref_u, ref_v, positions, block_size: int,
                         bit_depth: int, wrap_around: bool):
    """Full-frame MC of all planes from a subblock position grid."""
    ry = pad_ref(ref_y, MC_MARGIN, wrap_around)
    ru = pad_ref(ref_u, MC_MARGIN // 2, wrap_around)
    rv = pad_ref(ref_v, MC_MARGIN // 2, wrap_around)
    py = mm_mc.mc_luma_positions(ry, positions, MC_MARGIN, bit_depth)
    # chroma: each 4x4 luma subblock is one 2x2 chroma subblock — the same
    # position tensor reinterpreted at 1/32-pel (mm/mc.py chroma contract)
    pu = mm_mc.mc_chroma_positions(ru, positions, MC_MARGIN // 2, bit_depth)
    pv = mm_mc.mc_chroma_positions(rv, positions, MC_MARGIN // 2, bit_depth)
    return py, pu, pv


@functools.partial(jax.jit, static_argnames=("block_size", "bit_depth",
                                             "wrap_around", "iters"))
def affine_search(orig_y, ref_y, mv_trans, block_size: int,
                  bit_depth: int = 8, wrap_around: bool = False,
                  iters: int = 2):
    """Batched affine parameter search seeded from translational MVs.

    For every block simultaneously: predict with the current affine field,
    linearize the photometric error around it (optical-flow normal
    equations with an affine basis), solve the per-block 4x4 system, and
    round the refined parameters to the signaled integer form (reference:
    AffineGradientSearch.cpp — same math, one CU at a time).

    Returns (mv0 (nby,nbx,2), dmv (nby,nbx,2), sad (nby,nbx)) int32/1/16pel.
    """
    s = block_size
    h, w = orig_y.shape
    nby, nbx = h // s, w // s
    ry = pad_ref(ref_y, MC_MARGIN, wrap_around)
    ob = _to_blocks(orig_y, s).astype(jnp.float32)

    # float state: u, v (1/16-pel at block origin), d (1/16-pel over width)
    u = mv_trans[..., 0].astype(jnp.float32)
    v = mv_trans[..., 1].astype(jnp.float32)
    dx = jnp.zeros((nby, nbx), jnp.float32)
    dy = jnp.zeros((nby, nbx), jnp.float32)

    xs = jnp.arange(s, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (s, s))
    py_ = jnp.broadcast_to(xs[:, None], (s, s))

    def quantized(u, v, dx, dy):
        mv0 = jnp.stack([jnp.round(u), jnp.round(v)], -1).astype(jnp.int32)
        d = jnp.stack([jnp.round(dx), jnp.round(dy)], -1).astype(jnp.int32)
        return mv0, d

    def predict(u, v, dx, dy):
        mv0, d = quantized(u, v, dx, dy)
        pos = affine_positions(mv0, d, s, w, h)
        return mm_mc.mc_luma_positions(ry, pos, MC_MARGIN, bit_depth)

    for _ in range(iters):
        pred = predict(u, v, dx, dy)
        gx_p = (jnp.pad(pred, ((0, 0), (0, 1)), mode="edge")[:, 1:]
                - jnp.pad(pred, ((0, 0), (1, 0)), mode="edge")[:, :-1]
                ).astype(jnp.float32) / 2.0
        gy_p = (jnp.pad(pred, ((0, 1), (0, 0)), mode="edge")[1:]
                - jnp.pad(pred, ((1, 0), (0, 0)), mode="edge")[:-1]
                ).astype(jnp.float32) / 2.0
        r = ob - _to_blocks(pred, s).astype(jnp.float32)
        gx = _to_blocks(gx_p, s).astype(jnp.float32)
        gy = _to_blocks(gy_p, s).astype(jnp.float32)
        # basis: dmv_pix(x,y) = (du + (ddx*x - ddy*y)/s,
        #                        dv + (ddy*x + ddx*y)/s), in pixels/16
        f1 = gx / 16.0
        f2 = gy / 16.0
        f3 = (gx * px + gy * py_) / (16.0 * s)
        f4 = (-gx * py_ + gy * px) / (16.0 * s)
        F = jnp.stack([f1, f2, f3, f4], axis=1)         # (B, 4, s, s)
        A = jnp.einsum("bihw,bjhw->bij", F, F)
        A = A + 0.1 * jnp.eye(4, dtype=jnp.float32)[None]
        b = jnp.einsum("bihw,bhw->bi", F, r)
        p = jnp.linalg.solve(A, b[..., None])[..., 0]   # (B, 4)
        p = jnp.clip(p, -64.0, 64.0)
        u = u + p[:, 0].reshape(nby, nbx)
        v = v + p[:, 1].reshape(nby, nbx)
        dx = jnp.clip(dx + p[:, 2].reshape(nby, nbx), -128, 128)
        dy = jnp.clip(dy + p[:, 3].reshape(nby, nbx), -128, 128)

    mv0, d = quantized(u, v, dx, dy)
    pred = predict(u, v, dx, dy)
    sad = jnp.abs(_to_blocks(pred, s).astype(jnp.float32) - ob
                  ).sum(axis=(1, 2)).reshape(nby, nbx).astype(jnp.int32)
    return mv0, d, sad


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "wrap_around"))
def reconstruct_p_frame_affine(mv_grid, aff_flag, dmv, lev_y, lev_u, lev_v,
                               ref_y, ref_u, ref_v, qp: int,
                               block_size: int, bit_depth: int = 8,
                               wrap_around: bool = False):
    """Shared encoder/decoder P reconstruction with per-block affine flags:
    mv_grid holds the translational MV (flag off) or the affine TL CPMV
    (flag on); dmv is only read where the flag is set."""
    from . import transforms
    from .inter_frame import _from_blocks
    s = block_size
    h, w = ref_y.shape
    nby, nbx = h // s, w // s
    pos = mixed_positions(mv_grid, mv_grid, dmv, aff_flag, s, w, h)
    pred_y, pred_u, pred_v = mc_predict_positions(
        ref_y, ref_u, ref_v, pos, s, bit_depth, wrap_around)

    def rec_plane(pred, lev, size):
        log2s = size.bit_length() - 1
        pb = _to_blocks(pred, size)
        dq = quant.dequantize(lev.reshape(-1, size, size), qp, log2s, log2s,
                              bit_depth)
        r = transforms.inverse_transform(dq, bit_depth=bit_depth)
        rec = jnp.clip(pb + r, 0, (1 << bit_depth) - 1)
        return _from_blocks(rec, nby, nbx)

    return dict(y=rec_plane(pred_y, lev_y, s),
                u=rec_plane(pred_u, lev_u, s // 2),
                v=rec_plane(pred_v, lev_v, s // 2))


@functools.partial(jax.jit, static_argnames=("qp", "block_size", "bit_depth",
                                             "search_range", "wrap_around"))
def encode_p_frame_affine(orig_y, orig_u, orig_v, ref_y, ref_u, ref_v,
                          qp: int, block_size: int = 16, bit_depth: int = 8,
                          search_range: int = 24,
                          wrap_around: bool = False):
    """P encode with per-block translational/affine decision (reference:
    EncCu affine vs normal inter RD checks, EncCu.cpp:4147/3328).

    Returns (mv_grid, aff_flag, dmv, lev_y, lev_u, lev_v, recon)."""
    from . import transforms
    from .inter_frame import _residual_pass
    from ..encoder import me as me_mod
    s = block_size
    h, w = orig_y.shape
    lam = quant.lambda_from_qp(qp, intra=False)
    lam16 = int(lam ** 0.5 * 16)

    ry_pad = pad_ref(ref_y, MC_MARGIN, wrap_around)
    mv_int, _ = me_mod.hierarchical_search(orig_y, ry_pad, s, search_range,
                                           MC_MARGIN, lam16)
    mv_t, sad_t = me_mod.fractional_refine(orig_y, ry_pad, mv_int, s,
                                           MC_MARGIN, bit_depth)
    mv0_a, dmv, sad_a = affine_search(orig_y, ref_y, mv_t, s, bit_depth,
                                      wrap_around)
    # rate penalty: the extra dmv components + the flag bit
    extra = (2.0 * jnp.log2(jnp.abs(dmv[..., 0]).astype(jnp.float32) + 1)
             + 2.0 * jnp.log2(jnp.abs(dmv[..., 1]).astype(jnp.float32) + 1)
             + 6.0)
    aff = (sad_a.astype(jnp.float32) + jnp.float32(lam) ** 0.5 * extra
           < sad_t.astype(jnp.float32))
    # degenerate affine (dmv == 0) is just translation — keep the flag off
    aff = aff & jnp.any(dmv != 0, axis=-1)
    mv_grid = jnp.where(aff[..., None], mv0_a, mv_t)
    dmv = jnp.where(aff[..., None], dmv, 0)

    pos = mixed_positions(mv_grid, mv_grid, dmv, aff, s, w, h)
    pred_y, pred_u, pred_v = mc_predict_positions(
        ref_y, ref_u, ref_v, pos, s, bit_depth, wrap_around)
    lev_y, _ = _residual_pass(orig_y, pred_y, s, qp, bit_depth)
    lev_u, _ = _residual_pass(orig_u, pred_u, s // 2, qp, bit_depth)
    lev_v, _ = _residual_pass(orig_v, pred_v, s // 2, qp, bit_depth)
    recon = reconstruct_p_frame_affine(
        mv_grid, aff, dmv, lev_y, lev_u, lev_v, ref_y, ref_u, ref_v, qp, s,
        bit_depth, wrap_around)
    return mv_grid, aff, dmv, lev_y, lev_u, lev_v, recon
