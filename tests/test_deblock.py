"""Deblocking filter tests: smoothing behavior + in-loop bit-exactness."""
import numpy as np
import jax.numpy as jnp
import pytest

from vvc_mm_tpu.common import deblock
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_deblock_smooths_block_edge():
    """A hard step at a block boundary in smooth content must shrink."""
    h, w = 32, 64
    y = np.full((h, w), 100, dtype=np.int32)
    y[:, 32:] = 116                       # step at block edge x=32
    u = np.full((h // 2, w // 2), 128, dtype=np.int32)
    v = u.copy()
    bs_v, bs_h = deblock.boundary_strengths_intra(h // 8, w // 8)
    # use blocks of 8 -> vertical edges at 8,16,...; edge at 32 exists
    ry, _, _ = deblock.deblock_frame(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), bs_v, bs_h, 8, 37)
    ry = np.asarray(ry)
    step_before = abs(int(y[5, 32]) - int(y[5, 31]))
    step_after = abs(int(ry[5, 32]) - int(ry[5, 31]))
    assert step_after < step_before
    # far from edges nothing changes
    assert np.array_equal(ry[:, 36:44], y[:, 36:44])


def test_deblock_leaves_real_edges():
    """High beta-exceeding activity (texture) must not be filtered."""
    rng = np.random.default_rng(3)
    h, w = 32, 64
    y = rng.integers(0, 256, size=(h, w)).astype(np.int32)
    u = np.full((h // 2, w // 2), 128, dtype=np.int32)
    bs_v, bs_h = deblock.boundary_strengths_intra(h // 8, w // 8)
    ry, _, _ = deblock.deblock_frame(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(u), bs_v, bs_h, 8, 22)
    # at low QP on noisy content, d >= beta nearly everywhere -> few changes
    changed = np.mean(np.asarray(ry) != y)
    assert changed < 0.2


def test_bs_inter_rules():
    mvs = jnp.asarray(np.zeros((2, 3, 2), dtype=np.int32))
    mvs = mvs.at[0, 1, 0].set(9)          # > half-pel vs neighbors
    resid = jnp.asarray(np.zeros((2, 3), dtype=bool))
    bs_v, bs_h = deblock.boundary_strengths_inter(mvs, resid)
    assert np.asarray(bs_v)[0, 0] == 1 and np.asarray(bs_v)[0, 1] == 1
    assert np.asarray(bs_v)[1, 0] == 0
    assert np.asarray(bs_h)[0, 1] == 1


@pytest.mark.parametrize("gop", ["AI", "LDP"])
def test_roundtrip_with_deblocking(gop):
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(2.0, 1.0))
    cfg = EncCfg(width=64, height=32, qp=32, gop=gop, intra_period=0,
                 search_range=8, deblocking=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc


def test_deblocking_helps_at_high_qp():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    on = EncLib(EncCfg(width=64, height=32, qp=40, deblocking=True))
    on.encode_sequence(frames)
    off = EncLib(EncCfg(width=64, height=32, qp=40, deblocking=False))
    off.encode_sequence(frames)
    # deblocking shouldn't hurt PSNR much and usually helps subjective;
    # allow small tolerance either way but require it's applied (different)
    assert not np.array_equal(on.results[0].recon[0], off.results[0].recon[0])
    assert on.summary()["psnr_y"] > off.summary()["psnr_y"] - 0.3
