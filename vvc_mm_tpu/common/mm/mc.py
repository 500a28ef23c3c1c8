"""Position-based subblock motion compensation — the MM hot path.

TPU-native analog of the reference's xPredInterBlkMM inner loop (reference:
source/Lib/CommonLib/InterPrediction.cpp:683-860 — per-4x4-subblock
independent displacement: integer+fractional split, then 8-tap separable
filtering per subblock; SURVEY.md §3.3 marks this the #1 kernel target).

Design: every 4x4 luma (2x2 chroma) subblock of the frame has an absolute
1/16-pel target position (from mm.reprojection, or synthesized from classic
MVs).  One vmapped gather pulls each subblock's (4+7)x(4+7) neighborhood
from the padded reference; the separable 8-tap filter runs with
per-subblock phases — no control flow, pure VPU.  A fused Pallas kernel
(gather + filter in VMEM) is the planned optimization; this XLA version
establishes the numerics.

Out-of-range subblocks are clamped into the padded reference (the reference
zeroes subblocks beyond maxCU outside the picture, InterPrediction.cpp:788;
clamping is our self-consistent decoder/encoder-shared choice).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import interp
from ..typedefs import NTAPS_LUMA, NTAPS_CHROMA


def _assemble(blocks: jnp.ndarray, nsy: int, nsx: int, s: int) -> jnp.ndarray:
    return (blocks.reshape(nsy, nsx, s, s).transpose(0, 2, 1, 3)
            .reshape(nsy * s, nsx * s))


@functools.lru_cache(maxsize=1)
def _use_pallas() -> bool:
    """True on real TPU hardware (the Pallas kernel path); CPU test meshes
    use the XLA formulation, the kernel is covered by interpret-mode
    tests.  Measured on v5e: XLA gather costs ~1.45 us per subblock
    DESCRIPTOR (~190 ms/frame at 2K); the Pallas kernel is ~4.5x faster."""
    import jax as _jax
    try:
        dev = _jax.devices()[0]
        return "TPU" in getattr(dev, "device_kind", "")
    except Exception:
        return False


# The kernels keep the whole padded reference plane resident in VMEM
# (~16 MB/core on v5e); larger planes (e.g. 6144x3072) must take the XLA
# path until a VMEM-tiled double-buffered variant exists.
_VMEM_PLANE_BUDGET = 12 * 2 ** 20


def _plane_fits_vmem(ref_padded) -> bool:
    return 4 * ref_padded.shape[0] * ref_padded.shape[1] \
        <= _VMEM_PLANE_BUDGET


def mc_luma_positions(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                      margin: int, bit_depth: int = 8) -> jnp.ndarray:
    """Position-based luma MC — Pallas kernel on TPU, XLA gather elsewhere
    (bit-identical, tests/test_mc_kernel.py)."""
    if _use_pallas() and _plane_fits_vmem(ref_padded):
        from ...ops import mc_kernel
        if mc_kernel.luma_rows_per_step(positions.shape[0],
                                        positions.shape[1]) is not None:
            return mc_kernel.mc_luma_positions(ref_padded, positions,
                                               margin, bit_depth)
    return _mc_luma_positions_xla(ref_padded, positions, margin, bit_depth)


@functools.partial(jax.jit, static_argnames=("margin", "bit_depth"))
def _mc_luma_positions_xla(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                           margin: int, bit_depth: int = 8) -> jnp.ndarray:
    """MC the whole luma plane from per-4x4-subblock absolute positions.

    Args:
      ref_padded: (H+2m, W+2m) int32 padded reference.
      positions: (nsy, nsx, 2) int32 1/16-pel absolute target positions of
        each subblock's origin.
    Returns:
      (H, W) int32 pixel-domain prediction.
    """
    nsy, nsx, _ = positions.shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    yi = (pos[:, 1] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    xi = jnp.clip(xi, 0, ref_padded.shape[1] - (4 + NTAPS_LUMA - 1))
    yi = jnp.clip(yi, 0, ref_padded.shape[0] - (4 + NTAPS_LUMA - 1))
    # batch-last layout: (11, 11, B) keeps the 131k-subblock axis on the
    # 128-lane dimension (32x less padded traffic than (B, 11, 4) slices)
    patch = interp.gather_patches_t(ref_padded, yi, xi, 4 + NTAPS_LUMA - 1,
                                    4 + NTAPS_LUMA - 1)
    val = interp.interp_luma_t(patch, pos[:, 0] & 15, pos[:, 1] & 15, 4, 4,
                               bit_depth)
    pix = interp.finalize_uni(val, bit_depth)          # (4, 4, B)
    return _assemble(pix.transpose(2, 0, 1), nsy, nsx, 4)


@functools.partial(jax.jit, static_argnames=("margin",))
def sad_bilinear_positions_xla(ref_padded: jnp.ndarray, orig: jnp.ndarray,
                               positions: jnp.ndarray, margin: int
                               ) -> jnp.ndarray:
    """XLA mirror of ops.mc_kernel.sad_bilinear_positions_multi: per-4x4
    subblock decision SADs with 2-tap bilinear interpolation for K
    candidate fields (NON-NORMATIVE — ranks search candidates only; the
    reference's decision stages use the same 2-tap shortcut,
    InterpolationFilter.h:59-68 bilinear DMVR stage).  positions
    (K, nsy, nsx, 2), orig (nsy*4, nsx*4) -> (K, nsy, nsx) int32."""
    k, nsy, nsx, _ = positions.shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin
    yi = (pos[:, 1] >> 4) + margin
    xi = jnp.clip(xi, 0, ref_padded.shape[1] - 5)
    yi = jnp.clip(yi, 0, ref_padded.shape[0] - 5)
    patch = interp.gather_patches_t(ref_padded, yi, xi, 5, 5)  # (5,5,B)
    fx = (pos[:, 0] & 15).astype(jnp.int32)[None, None, :]
    fy = (pos[:, 1] & 15).astype(jnp.int32)[None, None, :]
    h = (patch[:, 0:4, :] * (16 - fx) + patch[:, 1:5, :] * fx + 8) >> 4
    pix = (h[0:4] * (16 - fy) + h[1:5] * fy + 8) >> 4          # (4,4,B)
    ob = orig.reshape(nsy, 4, nsx, 4).transpose(1, 3, 0, 2)
    ob = jnp.tile(ob.reshape(4, 4, nsy * nsx), (1, 1, k))
    return jnp.abs(pix - ob).sum(axis=(0, 1)).reshape(k, nsy, nsx)


def sad_bilinear_positions(ref_padded: jnp.ndarray, orig: jnp.ndarray,
                           positions: jnp.ndarray, margin: int
                           ) -> jnp.ndarray:
    """Multi-candidate bilinear decision SAD — Pallas kernel on TPU, XLA
    mirror elsewhere (bit-identical, tests/test_mc_kernel.py)."""
    if _use_pallas() and _plane_fits_vmem(ref_padded):
        from ...ops import mc_kernel
        if mc_kernel.sad_rows_per_step(positions.shape[1],
                                       positions.shape[2],
                                       positions.shape[0]) is not None:
            return mc_kernel.sad_bilinear_positions_multi(
                ref_padded, orig, positions, margin)
    return sad_bilinear_positions_xla(ref_padded, orig, positions, margin)


@functools.partial(jax.jit, static_argnames=("margin", "s", "bit_depth"))
def sad_block_positions_xla(ref_padded: jnp.ndarray,
                            orig_bands: jnp.ndarray,
                            positions: jnp.ndarray, margin: int, s: int,
                            bit_depth: int = 8) -> jnp.ndarray:
    """XLA mirror of ops.mc_kernel.sad_block_positions_multi: per-BLOCK
    decision SADs of each block's first 4-pixel row band sampled at the
    block-translational position (exact 8-tap interpolation).
    positions (K, nby, nbx, 2); orig_bands (nby*4, nbx*s)."""
    k, nby, nbx, _ = positions.shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    yi = (pos[:, 1] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    xi = jnp.clip(xi, 0, ref_padded.shape[1] - (s + NTAPS_LUMA - 1))
    yi = jnp.clip(yi, 0, ref_padded.shape[0] - (4 + NTAPS_LUMA - 1))
    patch = interp.gather_patches_t(ref_padded, yi, xi,
                                    4 + NTAPS_LUMA - 1,
                                    s + NTAPS_LUMA - 1)   # (11, s+7, B)
    val = interp.interp_luma_t(patch, pos[:, 0] & 15, pos[:, 1] & 15, 4,
                               s, bit_depth)
    pix = interp.finalize_uni(val, bit_depth)             # (4, s, B)
    ob = orig_bands.reshape(nby, 4, nbx, s).transpose(1, 3, 0, 2)
    ob = jnp.tile(ob.reshape(4, s, nby * nbx), (1, 1, k))
    return jnp.abs(pix - ob).sum(axis=(0, 1)).reshape(k, nby, nbx)


def sad_block_positions(ref_padded: jnp.ndarray, orig_bands: jnp.ndarray,
                        positions: jnp.ndarray, margin: int, s: int,
                        bit_depth: int = 8) -> jnp.ndarray:
    """Multi-candidate block-translational decision SAD — Pallas kernel
    on TPU, XLA mirror elsewhere (bit-identical)."""
    if _use_pallas() and _plane_fits_vmem(ref_padded):
        from ...ops import mc_kernel
        if mc_kernel.block_rows_per_step(positions.shape[1],
                                         positions.shape[2],
                                         positions.shape[0],
                                         s) is not None:
            return mc_kernel.sad_block_positions_multi(
                ref_padded, orig_bands, positions, margin, s, bit_depth)
    return sad_block_positions_xla(ref_padded, orig_bands, positions,
                                   margin, s, bit_depth)


@functools.partial(jax.jit, static_argnames=("margin", "s", "bit_depth"))
def mc_block_positions_xla(ref_padded: jnp.ndarray,
                           positions: jnp.ndarray, margin: int, s: int,
                           bit_depth: int = 8) -> jnp.ndarray:
    """XLA mirror of ops.mc_kernel.mc_block_positions_multi: each block's
    predicted first 4-pixel row band at the block-translational position.
    positions (K, nby, nbx, 2) -> (K, nby*4, nbx*s) int32."""
    k, nby, nbx, _ = positions.shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    yi = (pos[:, 1] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    xi = jnp.clip(xi, 0, ref_padded.shape[1] - (s + NTAPS_LUMA - 1))
    yi = jnp.clip(yi, 0, ref_padded.shape[0] - (4 + NTAPS_LUMA - 1))
    patch = interp.gather_patches_t(ref_padded, yi, xi,
                                    4 + NTAPS_LUMA - 1,
                                    s + NTAPS_LUMA - 1)
    val = interp.interp_luma_t(patch, pos[:, 0] & 15, pos[:, 1] & 15, 4,
                               s, bit_depth)
    pix = interp.finalize_uni(val, bit_depth)          # (4, s, B)
    pix = pix.transpose(2, 0, 1).reshape(k, nby, nbx, 4, s)
    return pix.transpose(0, 1, 3, 2, 4).reshape(k, nby * 4, nbx * s)


def mc_block_positions(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                       margin: int, s: int, bit_depth: int = 8
                       ) -> jnp.ndarray:
    """Multi-candidate block-translational band MC — Pallas kernel on
    TPU, XLA mirror elsewhere (bit-identical)."""
    if _use_pallas() and _plane_fits_vmem(ref_padded):
        from ...ops import mc_kernel
        if mc_kernel.block_rows_per_step(positions.shape[1],
                                         positions.shape[2],
                                         positions.shape[0],
                                         s) is not None:
            return mc_kernel.mc_block_positions_multi(
                ref_padded, positions, margin, s, bit_depth)
    return mc_block_positions_xla(ref_padded, positions, margin, s,
                                  bit_depth)


def sad_positions_multi(ref_padded: jnp.ndarray, orig: jnp.ndarray,
                        positions: jnp.ndarray, margin: int,
                        bit_depth: int = 8) -> jnp.ndarray:
    """Multi-candidate EXACT (8-tap) per-subblock SAD — the fused Pallas
    kernel on TPU, per-candidate XLA predict+reduce elsewhere.  Used for
    RD-critical field SADs (merge candidates, selection) where the
    bilinear shortcut's blur bias would misrank integer-position
    candidates against fractional ones."""
    if _use_pallas() and _plane_fits_vmem(ref_padded):
        from ...ops import mc_kernel
        if mc_kernel.sad_rows_per_step(positions.shape[1],
                                       positions.shape[2],
                                       positions.shape[0]) is not None:
            return mc_kernel.sad_luma_positions_multi(
                ref_padded, orig, positions, margin, bit_depth)
    outs = []
    for i in range(positions.shape[0]):
        pred = _mc_luma_positions_xla(ref_padded, positions[i], margin,
                                      bit_depth)
        d = jnp.abs(orig - pred)
        h, w = d.shape
        outs.append(d.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3)))
    return jnp.stack(outs)


def mc_chroma_positions(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                        margin: int, bit_depth: int = 8) -> jnp.ndarray:
    """Position-based chroma MC — Pallas kernel on TPU, XLA elsewhere."""
    if _use_pallas() and _plane_fits_vmem(ref_padded):
        from ...ops import mc_kernel
        if mc_kernel.chroma_rows_per_step(positions.shape[0],
                                          positions.shape[1]) is not None:
            return mc_kernel.mc_chroma_positions(ref_padded, positions,
                                                 margin, bit_depth)
    return _mc_chroma_positions_xla(ref_padded, positions, margin,
                                    bit_depth)


@functools.partial(jax.jit, static_argnames=("margin", "bit_depth"))
def _mc_chroma_positions_xla(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                             margin: int, bit_depth: int = 8) -> jnp.ndarray:
    """Chroma (4:2:0) variant: same position tensor, interpreted at 1/32-pel
    chroma precision over 2x2 subblocks (see reprojection.py chroma note)."""
    nsy, nsx, _ = positions.shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 5) + margin - (NTAPS_CHROMA // 2 - 1)
    yi = (pos[:, 1] >> 5) + margin - (NTAPS_CHROMA // 2 - 1)
    xi = jnp.clip(xi, 0, ref_padded.shape[1] - (2 + NTAPS_CHROMA - 1))
    yi = jnp.clip(yi, 0, ref_padded.shape[0] - (2 + NTAPS_CHROMA - 1))
    patch = interp.gather_patches_t(ref_padded, yi, xi,
                                    2 + NTAPS_CHROMA - 1,
                                    2 + NTAPS_CHROMA - 1)
    val = interp.interp_chroma_t(patch, pos[:, 0] & 31, pos[:, 1] & 31, 2, 2,
                                 bit_depth)
    pix = interp.finalize_uni(val, bit_depth)          # (2, 2, B)
    return _assemble(pix.transpose(2, 0, 1), nsy, nsx, 2)


def classic_positions(grid_offset: float, width: int, height: int,
                      mvs: jnp.ndarray, block_size: int,
                      row_step: int = 1) -> jnp.ndarray:
    """Per-subblock absolute positions for CLASSIC translation — lets the
    unified position-based MC handle mixed classic/MM frames in one pass.

    Equivalent to reprojection.reproject_frame(CLASSIC, ...) but exact
    integer math (no float round-trip)."""
    nsx, nsy = width // 4, height // 4
    rep = block_size // 4
    gx = jnp.arange(nsx, dtype=jnp.int32) * (4 * 16)
    gy = jnp.arange(0, nsy, row_step, dtype=jnp.int32) * (4 * 16)
    base_x = jnp.broadcast_to(gx[None, :], (gy.shape[0], nsx))
    base_y = jnp.broadcast_to(gy[:, None], (gy.shape[0], nsx))
    mv_x = jnp.repeat(jnp.repeat(mvs[..., 0], rep, 0), rep, 1)[::row_step]
    mv_y = jnp.repeat(jnp.repeat(mvs[..., 1], rep, 0), rep, 1)[::row_step]
    return jnp.stack([base_x + mv_x, base_y + mv_y], -1).astype(jnp.int32)
