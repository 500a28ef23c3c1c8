"""Pallas TPU kernel: fused position-based subblock motion compensation.

The MM hot path (SURVEY.md §3.3 "#1 Pallas-kernel target"; reference:
InterPrediction.cpp:683-860 xPredInterBlkMM per-4x4 loop) is a gather of an
11x11 neighborhood per 4x4 subblock followed by a separable 8-tap filter
with per-subblock phases.  The XLA formulation (common/mm/mc.py)
materializes the gathered patch tensor ((11, 11, B) int32 ~ 63 MB at 2K
ERP) through HBM twice; this kernel keeps the *entire padded reference
plane resident in VMEM* (int32 2048x1024+margins ~ 9 MB < 16 MB) and
streams subblocks through registers — the patch tensor never exists.

Layout:
  * grid = (nsy,): one subblock row per step; the output block is the
    (4, W) pixel row band, written in place.
  * subblock coords / fractional phases arrive via scalar prefetch (SMEM),
    so the kernel's dynamic slices are ordinary VMEM reads.
  * the filter table is a (16, 8) VMEM input; per-subblock rows are read
    with a dynamic index.

Numerics match common/interp.py bit-exactly (same shift/round/clip
sequence), verified in tests/test_mc_pallas.py via interpret mode.

Status after measuring on real hardware (TPU v5e, 2026-08-18):
  * the XLA path runs the full-frame luma MC (131k subblocks, 2048x1024)
    in 0.042 ms/frame — i.e. at HBM speed-of-light for the ~16 MB the op
    must move; XLA lowers the batch-last advanced-indexing gather to the
    native VMEM dynamic-gather unit and fuses the separable filter, so the
    patch tensor never materializes in HBM after all.
  * Mosaic (Pallas TPU) rejects the scatter-shaped inner loop: dynamic
    vector loads must be 8-sublane/128-lane aligned, value-level
    dynamic_slice is not lowered, and per-subblock 4-lane stores violate
    lane alignment.  An aligned-superpatch + pltpu.roll variant clears the
    loads but not the stores.
  * conclusion: the XLA formulation in common/mm/mc.py IS the production
    kernel for this op on TPU; this module stays as the executable spec
    (interpret mode) and the record of the experiment.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..common import interp
from ..common.typedefs import NTAPS_LUMA, NTAPS_CHROMA

_PATCH_L = 4 + NTAPS_LUMA - 1      # 11
_PATCH_C = 2 + NTAPS_CHROMA - 1    # 5


def _mc_kernel_luma(nsx: int, bit_depth: int):
    shift1 = bit_depth - 8
    offs1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    fin_shift = interp.IF_INTERNAL_PREC - bit_depth
    fin_offs = 1 << (fin_shift - 1)
    maxv = (1 << bit_depth) - 1

    def kernel(yi_ref, xi_ref, fx_ref, fy_ref, ref_ref, filt_ref, out_ref):
        j = pl.program_id(0)

        # TPU blocks want >=8 sublanes: each step owns 2 subblock rows
        def body(k, _):
            r, c = k // nsx, k % nsx
            idx = (2 * j + r) * nsx + c
            y = yi_ref[idx]
            x = xi_ref[idx]
            patch = ref_ref[pl.ds(y, _PATCH_L), pl.ds(x, _PATCH_L)]
            cx = filt_ref[fx_ref[idx], :]                   # (8,)
            cy = filt_ref[fy_ref[idx], :]
            hsum = sum(patch[:, t:t + 4] * cx[t]
                       for t in range(NTAPS_LUMA))          # (11, 4)
            hval = (hsum + offs1) >> shift1 if shift1 > 0 else hsum
            vsum = sum(hval[t:t + 4, :] * cy[t]
                       for t in range(NTAPS_LUMA))          # (4, 4)
            val = vsum >> 6
            pix = jnp.clip((val + fin_offs) >> fin_shift, 0, maxv)
            out_ref[pl.ds(r * 4, 4), pl.ds(c * 4, 4)] = pix
            return 0

        jax.lax.fori_loop(0, 2 * nsx, body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("margin", "bit_depth", "interpret"))
def mc_luma_positions(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                      margin: int, bit_depth: int = 8,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas twin of mm.mc.mc_luma_positions (bit-identical)."""
    nsy, nsx, _ = positions.shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    yi = (pos[:, 1] >> 4) + margin - (NTAPS_LUMA // 2 - 1)
    xi = jnp.clip(xi, 0, ref_padded.shape[1] - _PATCH_L).astype(jnp.int32)
    yi = jnp.clip(yi, 0, ref_padded.shape[0] - _PATCH_L).astype(jnp.int32)
    fx = (pos[:, 0] & 15).astype(jnp.int32)
    fy = (pos[:, 1] & 15).astype(jnp.int32)

    assert nsy % 2 == 0, "luma kernel processes 2 subblock rows per step"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsy // 2,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # whole ref plane
                  pl.BlockSpec(memory_space=pltpu.VMEM)],  # filter table
        out_specs=pl.BlockSpec((8, nsx * 4), lambda j, *_: (j, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mc_kernel_luma(nsx, bit_depth),
        out_shape=jax.ShapeDtypeStruct((nsy * 4, nsx * 4), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(yi, xi, fx, fy, ref_padded.astype(jnp.int32),
      jnp.asarray(interp.LUMA_FILTER))


def _mc_kernel_chroma(nsx: int, bit_depth: int):
    shift1 = bit_depth - 8
    offs1 = (1 << (shift1 - 1)) if shift1 > 0 else 0
    fin_shift = interp.IF_INTERNAL_PREC - bit_depth
    fin_offs = 1 << (fin_shift - 1)
    maxv = (1 << bit_depth) - 1

    def kernel(yi_ref, xi_ref, fx_ref, fy_ref, ref_ref, filt_ref, out_ref):
        j = pl.program_id(0)

        def body(k, _):
            r, c = k // nsx, k % nsx
            idx = (4 * j + r) * nsx + c
            y = yi_ref[idx]
            x = xi_ref[idx]
            patch = ref_ref[pl.ds(y, _PATCH_C), pl.ds(x, _PATCH_C)]
            cx = filt_ref[fx_ref[idx], :]                   # (4,)
            cy = filt_ref[fy_ref[idx], :]
            hsum = sum(patch[:, t:t + 2] * cx[t]
                       for t in range(NTAPS_CHROMA))        # (5, 2)
            hval = (hsum + offs1) >> shift1 if shift1 > 0 else hsum
            vsum = sum(hval[t:t + 2, :] * cy[t]
                       for t in range(NTAPS_CHROMA))        # (2, 2)
            val = vsum >> 6
            pix = jnp.clip((val + fin_offs) >> fin_shift, 0, maxv)
            out_ref[pl.ds(r * 2, 2), pl.ds(c * 2, 2)] = pix
            return 0

        jax.lax.fori_loop(0, 4 * nsx, body, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("margin", "bit_depth", "interpret"))
def mc_chroma_positions(ref_padded: jnp.ndarray, positions: jnp.ndarray,
                        margin: int, bit_depth: int = 8,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of mm.mc.mc_chroma_positions (1/32-pel, 2x2 subblocks)."""
    nsy, nsx, _ = positions.shape
    pos = positions.reshape(-1, 2)
    xi = (pos[:, 0] >> 5) + margin - (NTAPS_CHROMA // 2 - 1)
    yi = (pos[:, 1] >> 5) + margin - (NTAPS_CHROMA // 2 - 1)
    xi = jnp.clip(xi, 0, ref_padded.shape[1] - _PATCH_C).astype(jnp.int32)
    yi = jnp.clip(yi, 0, ref_padded.shape[0] - _PATCH_C).astype(jnp.int32)
    fx = (pos[:, 0] & 31).astype(jnp.int32)
    fy = (pos[:, 1] & 31).astype(jnp.int32)

    assert nsy % 4 == 0, "chroma kernel processes 4 subblock rows per step"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nsy // 4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, nsx * 2), lambda j, *_: (j, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mc_kernel_chroma(nsx, bit_depth),
        out_shape=jax.ShapeDtypeStruct((nsy * 2, nsx * 2), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(yi, xi, fx, fy, ref_padded.astype(jnp.int32),
      jnp.asarray(interp.CHROMA_FILTER))


def vmem_fits(ref_shape: tuple[int, int]) -> bool:
    """Capacity gate: whole plane + working set must fit ~16 MB VMEM."""
    return ref_shape[0] * ref_shape[1] * 4 <= 11 * 2 ** 20
