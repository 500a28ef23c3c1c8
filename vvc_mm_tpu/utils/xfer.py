"""Tunnel-aware device<->host transfer helpers.

The TPU in this deployment sits behind a network tunnel with ~10-50 ms
per-transfer latency and ~50 MB/s device-to-host bandwidth — three orders
of magnitude below PCIe.  Round trips and bytes, not FLOPs, dominate the
encoder wall clock (measured: a 2048x1024 frame's full device compute is
<5 ms while a single 8 MB pull is ~180 ms).  These helpers therefore

  1. pack many arrays into ONE flat narrow-dtype buffer on device and
     pull it in a single transfer, and
  2. compute reductions (SSE for PSNR) on device so only scalars cross.

The reference has no analog (host SIMD reads its own memory); this is the
TPU-native replacement for its zero-cost buffer access (reference:
source/Lib/CommonLib/Buffer.h PelBuf views).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pack_i16(arrs):
    return jnp.concatenate([a.astype(jnp.int16).reshape(-1) for a in arrs])


def pull_levels(*arrs) -> list[np.ndarray]:
    """Pull any number of int level grids in ONE int16 D2H transfer.

    Quantized transform levels always fit int16 (|level| < 2^15 by the
    coefficient range of the spec); host side re-widens to int32 for the
    entropy coder.
    """
    flat = np.asarray(_pack_i16(list(arrs)))
    out = []
    off = 0
    for a in arrs:
        n = int(np.prod(a.shape))
        out.append(flat[off:off + n].reshape(a.shape).astype(np.int32))
        off += n
    return out


@jax.jit
def _pack_i32(arrs):
    return jnp.concatenate([a.astype(jnp.int32).reshape(-1) for a in arrs])


def pull_i32(*arrs) -> list[np.ndarray]:
    """Pull arrays that may exceed int16 range (e.g. per-block SADs) in
    ONE int32 D2H transfer."""
    flat = np.asarray(_pack_i32(list(arrs)))
    out = []
    off = 0
    for a in arrs:
        n = int(np.prod(a.shape))
        out.append(flat[off:off + n].reshape(a.shape))
        off += n
    return out


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def _pack_recon_sse(ry, ru, rv, oy, ou, ov, bit_depth):
    dt = jnp.uint8 if bit_depth <= 8 else jnp.uint16
    packed = jnp.concatenate([p.astype(dt).reshape(-1)
                              for p in (ry, ru, rv)])
    sse = jnp.stack([
        jnp.sum(jnp.square((a - b).astype(jnp.float32)))
        for a, b in ((ry, oy), (ru, ou), (rv, ov))])
    return packed, sse


def finalize_recon(recon: dict, dev_orig, bit_depth: int
                   ) -> tuple[list[np.ndarray], tuple[float, float, float]]:
    """Pull the reconstruction (one narrow packed transfer) and its PSNRs
    (device-side SSE, scalar pull).  Returns ([y, u, v] int32 np arrays,
    (psnr_y, psnr_u, psnr_v))."""
    ry, ru, rv = recon["y"], recon["u"], recon["v"]
    packed, sse = _pack_recon_sse(ry, ru, rv, dev_orig[0], dev_orig[1],
                                  dev_orig[2], bit_depth)
    flat = np.asarray(packed)
    sse = np.asarray(sse)
    out = []
    off = 0
    for a in (ry, ru, rv):
        n = int(np.prod(a.shape))
        out.append(flat[off:off + n].reshape(a.shape).astype(np.int32))
        off += n
    maxv = (1 << bit_depth) - 1
    psnrs = tuple(
        999.99 if s == 0 else
        10.0 * np.log10(maxv * maxv * a.size / s)
        for s, a in zip(sse, (ry, ru, rv)))
    return out, psnrs


def upload_planes(planes, bit_depth: int):
    """H2D of one frame's planes as the narrowest dtype, widened to int32
    on device (uint8 upload is 4x fewer tunnel bytes than int32)."""
    dt = np.uint8 if bit_depth <= 8 else np.uint16
    return tuple(jnp.asarray(np.asarray(p, dtype=dt)).astype(jnp.int32)
                 for p in planes)
