"""Pallas MC kernel v2 vs the XLA reference formulation — bit-identical."""
import numpy as np
import jax.numpy as jnp

from vvc_mm_tpu.common.mm import mc as mm_mc
from vvc_mm_tpu.ops import mc_kernel


def _setup(rng, h=64, w=128, m=40):
    ref = jnp.asarray(rng.integers(0, 255, (h + 2 * m, w + 2 * m),
                                   dtype=np.int32))
    nsy, nsx = h // 4, w // 4
    pos = np.stack([rng.integers(-m * 16, (w + m - 8) * 16, (nsy, nsx)),
                    rng.integers(-m * 16, (h + m - 8) * 16, (nsy, nsx))],
                   -1).astype(np.int32)
    return ref, jnp.asarray(pos), m


def test_mc_luma_kernel_bit_identical(rng):
    ref, pos, m = _setup(rng)
    want = np.asarray(mm_mc.mc_luma_positions(ref, pos, m, 8))
    got = np.asarray(mc_kernel.mc_luma_positions(ref, pos, m, 8,
                                                 interpret=True))
    assert np.array_equal(want, got)


def test_mc_luma_kernel_extreme_positions(rng):
    """Positions far outside the padded area clamp identically."""
    ref, _, m = _setup(rng)
    nsy, nsx = 16, 32
    pos = np.stack([rng.integers(-100000, 100000, (nsy, nsx)),
                    rng.integers(-100000, 100000, (nsy, nsx))],
                   -1).astype(np.int32)
    pos = jnp.asarray(pos)
    want = np.asarray(mm_mc.mc_luma_positions(ref, pos, m, 8))
    got = np.asarray(mc_kernel.mc_luma_positions(ref, pos, m, 8,
                                                 interpret=True))
    assert np.array_equal(want, got)


def test_sad_luma_kernel_matches_xla(rng):
    ref, pos, m = _setup(rng)
    h, w = 64, 128
    orig = jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.int32))
    pred = np.asarray(mm_mc.mc_luma_positions(ref, pos, m, 8))
    diff = np.abs(pred - np.asarray(orig))
    want = diff.reshape(h // 4, 4, w // 4, 4).sum((1, 3))
    got = np.asarray(mc_kernel.sad_luma_positions(ref, orig, pos, m, 8,
                                                  interpret=True))
    assert np.array_equal(want, got)


def test_mc_chroma_kernel_bit_identical(rng):
    ref, pos, m = _setup(rng)       # use as chroma plane: margin 40
    want = np.asarray(mm_mc.mc_chroma_positions(ref, pos, m, 8))
    got = np.asarray(mc_kernel.mc_chroma_positions(ref, pos, m, 8,
                                                   interpret=True))
    assert np.array_equal(want, got)


def test_mc_luma_kernel_subsampled_width(rng):
    """Column-subsampled search positions (nsx not 1024-aligned with 2
    rows/step): the adaptive rows_per_step keeps the SMEM blocks aligned
    and the output bit-identical (regression: Mosaic layout mismatch at
    nsx=256 on hardware)."""
    ref, pos, m = _setup(rng, h=64, w=256)
    sub = pos[:, ::2]                       # nsx 64 -> 32
    want = np.asarray(mm_mc._mc_luma_positions_xla(ref, sub, m, 8))
    got = np.asarray(mc_kernel.mc_luma_positions(ref, sub, m, 8,
                                                 interpret=True))
    assert np.array_equal(want, got)


def test_rows_per_step_alignment_gate():
    """Shapes whose SMEM scalar blocks cannot be 1024-aligned must be
    rejected in strict (hardware) mode so the dispatcher falls back to
    XLA, while interpret mode still gets a best-effort value (regression:
    Mosaic SMEM layout mismatch on real TPU for unalignable shapes)."""
    # 2048-wide frame: nsx=512 -> rows 2 aligns (1024)
    assert mc_kernel.luma_rows_per_step(256, 512) == 2
    # column-subsampled search: nsx=256 -> rows grow to 4
    assert mc_kernel.luma_rows_per_step(256, 256) == 4
    # small frame 128x64: nsx=32, nsy=16 -> cannot align
    assert mc_kernel.luma_rows_per_step(16, 32) is None
    assert mc_kernel.luma_rows_per_step(16, 32, strict=False) is not None
    # nsy not a power-of-two multiple blocks growth
    assert mc_kernel.luma_rows_per_step(6, 96) is None
    # chroma: nsx=512 -> 4*512=2048 already aligned
    assert mc_kernel.chroma_rows_per_step(256, 512) == 4
    # nsx=64: alignment needs 16 rows -> reachable only when nsy allows
    assert mc_kernel.chroma_rows_per_step(16, 64) == 16
    assert mc_kernel.chroma_rows_per_step(8, 64) is None
    assert mc_kernel.chroma_rows_per_step(8, 64, strict=False) is not None


def test_sad_multi_kernel_matches_xla(rng):
    """Multi-candidate fused SAD kernel vs per-candidate XLA predict +
    reduce — bit-identical for K=4 candidate fields."""
    ref, pos, m = _setup(rng, h=64, w=128)
    h, w = 64, 128
    orig = jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.int32))
    k = 4
    deltas = np.array([(0, 0), (64, 0), (0, -64), (-16, 16)], np.int32)
    posk = jnp.stack([pos + jnp.asarray(d) for d in deltas])
    got = np.asarray(mc_kernel.sad_luma_positions_multi(
        ref, orig, posk, m, 8, interpret=True))
    for i in range(k):
        pred = np.asarray(mm_mc._mc_luma_positions_xla(ref, posk[i], m, 8))
        want = np.abs(pred - np.asarray(orig)).reshape(
            h // 4, 4, w // 4, 4).sum((1, 3))
        assert np.array_equal(want, got[i]), i


def test_sad_bilinear_kernel_matches_xla_mirror(rng):
    """Pallas bilinear decision-SAD kernel vs its XLA mirror —
    bit-identical (encoder decisions must not depend on the backend)."""
    ref, pos, m = _setup(rng, h=64, w=128)
    h, w = 64, 128
    orig = jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.int32))
    posk = jnp.stack([pos, pos + 32, pos - 48])
    want = np.asarray(mm_mc.sad_bilinear_positions_xla(ref, orig, posk, m))
    got = np.asarray(mc_kernel.sad_bilinear_positions_multi(
        ref, orig, posk, m, interpret=True))
    assert np.array_equal(want, got)


def test_sad_block_kernel_matches_xla_mirror(rng):
    """Block-translational decision-SAD kernel vs its XLA mirror —
    bit-identical (encoder decisions must not depend on the backend)."""
    for s in (8, 16, 32):
        h, w, m = 64, 256, 40
        ref = jnp.asarray(rng.integers(0, 255, (h + 2*m, w + 2*m),
                                       dtype=np.int32))
        nby, nbx = h // s, w // s
        bands = jnp.asarray(rng.integers(0, 255, (nby*4, nbx*s),
                                         dtype=np.int32))
        pos = np.stack([rng.integers(-m*16, (w+m-s-8)*16, (3, nby, nbx)),
                        rng.integers(-m*16, (h+m-8)*16, (3, nby, nbx))],
                       -1).astype(np.int32)
        pos = jnp.asarray(pos)
        want = np.asarray(mm_mc.sad_block_positions_xla(
            ref, bands, pos, m, s, 8))
        got = np.asarray(mc_kernel.sad_block_positions_multi(
            ref, bands, pos, m, s, 8, interpret=True))
        assert np.array_equal(want, got), s
