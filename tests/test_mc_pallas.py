"""Pallas MC kernel vs the XLA reference path: bit-identical outputs.

Runs the kernel in interpret mode (tests are CPU-pinned); the real-TPU
dispatch is gated by mm.mc capacity checks.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from vvc_mm_tpu.common.mm import mc
from vvc_mm_tpu.ops import mc_pallas


def _setup(rng, h=32, w=64, margin=16):
    ref = rng.integers(0, 256, (h + 2 * margin, w + 2 * margin))
    nsy, nsx = h // 4, w // 4
    # absolute 1/16-pel positions with random fractional phases and
    # +-8px integer scatter (clamped by the kernels)
    base_x = (np.arange(nsx) * 64)[None, :].repeat(nsy, 0)
    base_y = (np.arange(nsy) * 64)[:, None].repeat(nsx, 1)
    jx = rng.integers(-128, 128, (nsy, nsx))
    jy = rng.integers(-128, 128, (nsy, nsx))
    pos = np.stack([base_x + jx, base_y + jy], -1).astype(np.int32)
    return jnp.asarray(ref.astype(np.int32)), jnp.asarray(pos), margin


def test_luma_kernel_bit_identical(rng):
    ref, pos, margin = _setup(rng)
    want = np.asarray(mc.mc_luma_positions(ref, pos, margin))
    got = np.asarray(mc_pallas.mc_luma_positions(ref, pos, margin,
                                                 interpret=True))
    np.testing.assert_array_equal(got, want)


def test_chroma_kernel_bit_identical(rng):
    margin = 8
    h, w = 16, 32
    ref = jnp.asarray(rng.integers(0, 256, (h + 2 * margin, w + 2 * margin))
                      .astype(np.int32))
    nsy, nsx = h // 2, w // 2
    base_x = (np.arange(nsx) * 64)[None, :].repeat(nsy, 0)
    base_y = (np.arange(nsy) * 64)[:, None].repeat(nsx, 1)
    pos = np.stack([base_x + rng.integers(-64, 64, (nsy, nsx)),
                    base_y + rng.integers(-64, 64, (nsy, nsx))],
                   -1).astype(np.int32)
    pos = jnp.asarray(pos)
    want = np.asarray(mc.mc_chroma_positions(ref, pos, margin))
    got = np.asarray(mc_pallas.mc_chroma_positions(ref, pos, margin,
                                                   interpret=True))
    np.testing.assert_array_equal(got, want)


def test_luma_kernel_10bit(rng):
    ref, pos, margin = _setup(rng)
    ref = ref * 4   # pretend 10-bit
    want = np.asarray(mc.mc_luma_positions(ref, pos, margin, bit_depth=10))
    got = np.asarray(mc_pallas.mc_luma_positions(ref, pos, margin,
                                                 bit_depth=10,
                                                 interpret=True))
    np.testing.assert_array_equal(got, want)


def test_vmem_gate():
    assert mc_pallas.vmem_fits((1088, 2112))          # 2K ERP padded
    assert not mc_pallas.vmem_fits((3200, 6272))      # 6K does not fit
