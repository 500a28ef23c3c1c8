"""Inter pipeline unit tests: interpolation, ME, P-frame roundtrip."""
import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from vvc_mm_tpu.common import inter_frame, interp
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder import me
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_filter_tables_sum_64():
    assert (interp.LUMA_FILTER.sum(axis=1) == 64).all()
    assert (interp.CHROMA_FILTER.sum(axis=1) == 64).all()
    # phase symmetry: filter[16-p] is filter[p] reversed
    for p in range(1, 16):
        assert (interp.LUMA_FILTER[16 - p] ==
                interp.LUMA_FILTER[p][::-1]).all(), p
    for p in range(1, 32):
        assert (interp.CHROMA_FILTER[32 - p] ==
                interp.CHROMA_FILTER[p][::-1]).all(), p


def test_mc_integer_mv_is_copy(rng):
    """Phase-0 MC must reproduce the reference samples exactly."""
    ref = rng.integers(0, 256, size=(64, 64)).astype(np.int32)
    refp = inter_frame.pad_ref(jnp.asarray(ref), 16)
    mv = jnp.asarray(np.array([[16 * 3, 16 * -2]], dtype=np.int32))  # (3,-2)
    y0 = jnp.asarray(np.array([8], dtype=np.int32))
    x0 = jnp.asarray(np.array([8], dtype=np.int32))
    out = interp.finalize_uni(interp.mc_luma(refp, mv, y0, x0, 8, 8, 16))
    expect = ref[8 - 2:16 - 2, 8 + 3:16 + 3]
    assert np.array_equal(np.asarray(out)[0], expect)


def test_mc_half_pel_matches_direct_filter(rng):
    """Half-pel MC equals a direct 8-tap convolution computed in numpy."""
    ref = rng.integers(0, 256, size=(48, 48)).astype(np.int32)
    refp = inter_frame.pad_ref(jnp.asarray(ref), 16)
    mv = jnp.asarray(np.array([[8, 0]], dtype=np.int32))   # +0.5 px in x
    y0 = jnp.asarray(np.array([16], dtype=np.int32))
    x0 = jnp.asarray(np.array([16], dtype=np.int32))
    out = np.asarray(interp.finalize_uni(
        interp.mc_luma(refp, mv, y0, x0, 4, 4, 16)))[0]
    f = interp.LUMA_FILTER[8]
    expect = np.zeros((4, 4), dtype=np.int64)
    for yy in range(4):
        for xx in range(4):
            acc = sum(int(f[t]) * int(ref[16 + yy, 16 + xx - 3 + t])
                      for t in range(8))
            # hor >>0 (8-bit), ver phase 0: *64 >> 6 == acc; uni finalize
            expect[yy, xx] = np.clip((acc + 32) >> 6, 0, 255)
    assert np.array_equal(out, expect)


def test_integer_search_finds_translation(rng):
    base = rng.integers(0, 256, size=(64, 96)).astype(np.int32)
    # smooth it so SAD has a clean basin
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) // 3
    ref = base
    orig = np.roll(np.roll(base, 2, axis=0), -3, axis=1)  # mv = (x=-3, y=+2)?
    # orig(y,x)=ref(y-2, x+3) -> block at orig needs mv=(+3? ) check both
    refp = inter_frame.pad_ref(jnp.asarray(ref), 16)
    mv, sad = me.integer_search(jnp.asarray(orig), refp, 16, 8, 16, 0)
    mv = np.asarray(mv)
    # interior blocks (away from roll wrap) must agree on one MV with SAD 0
    inner = mv[1:-1, 1:-1]
    assert (np.asarray(sad)[1:-1, 1:-1] == 0).all()
    assert (inner[..., 0] == inner[0, 0, 0]).all()
    assert abs(inner[0, 0, 0]) == 3 and abs(inner[0, 0, 1]) == 2


def test_fractional_refine_improves(rng):
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    f = synthetic_sequence(fmt, 2, motion=(2.0, 1.0))
    orig, ref = f[1][0], f[0][0]
    refp = inter_frame.pad_ref(jnp.asarray(ref), 32)
    mv_i, sad_i = me.integer_search(jnp.asarray(orig), refp, 16, 8, 32, 0)
    mv_f, cost_f = me.fractional_refine(jnp.asarray(orig), refp, mv_i, 16, 32)
    assert (np.asarray(cost_f) <= np.asarray(sad_i)).all()
    assert np.asarray(mv_f).shape == (4, 4, 2)


@pytest.fixture(scope="module")
def ldp_seq():
    fmt = VideoFormat(64, 48, 8, ChromaFormat.C420)
    return fmt, synthetic_sequence(fmt, 4, motion=(2.5, 1.0))


def test_ldp_roundtrip_bitexact(ldp_seq):
    fmt, frames = ldp_seq
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 intra_period=0, inter_block_size=16, search_range=8)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc


def test_ldp_beats_allintra_on_motion(ldp_seq):
    """Inter coding must cost far fewer bits than AI at same QP on
    translating content (sanity that ME/MC actually predicts)."""
    fmt, frames = ldp_seq
    ldp = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                        intra_period=0, search_range=8))
    ldp.encode_sequence(frames)
    ai = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="AI"))
    ai.encode_sequence(frames)
    ldp_p_bits = sum(r.bits for r in ldp.results[1:])
    ai_p_bits = sum(r.bits for r in ai.results[1:])
    assert ldp_p_bits < 0.75 * ai_p_bits, (ldp_p_bits, ai_p_bits)
    assert ldp.summary()["psnr_y"] > 30.0
