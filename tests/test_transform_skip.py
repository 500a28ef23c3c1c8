"""Transform skip, BDPCM, and the lossless coding path.

Reference parity targets: transform_skip_flag / intra_bdpcm_luma_flag
syntax and the TS quantization path (Quant.cpp transformSkip, QpParam
min-QP-prime-TS clamp); lossless = all-TS at qStep 1 — the reference's
lossless cfg operating point where decoder output equals the source.
"""
import numpy as np
import pytest

from vvc_mm_tpu.common import quant
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _roundtrip(cfg, frames):
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    dec.frames = dec.decode_bytes(stream)
    return enc, dec


def test_ts_quant_exact_at_qp4(rng):
    r = rng.integers(-255, 256, size=(4, 8, 8)).astype(np.int32)
    lev = quant.quantize_ts(r, 4)
    back = quant.dequantize_ts(lev, 4)
    np.testing.assert_array_equal(np.asarray(back), r)


def test_ts_quant_qp_clamp(rng):
    r = rng.integers(-255, 256, size=(2, 8, 8)).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(quant.quantize_ts(r, 0)),
                                  np.asarray(quant.quantize_ts(r, 4)))


@pytest.mark.parametrize("bdpcm", [False, True])
def test_transform_skip_roundtrip(rng, bdpcm):
    w, h = 64, 32
    fmt = VideoFormat(w, h, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 1)
    cfg = EncCfg(width=w, height=h, qp=30, intra_block_size=8,
                 transform_skip=True, bdpcm=bdpcm, deblocking=False,
                 sao=False, alf=False)
    enc, dec = _roundtrip(cfg, frames)
    # decoder output bit-exact with encoder reconstruction (the
    # decoded-picture-hash oracle)
    for p_enc, p_dec in zip(enc.results[0].recon, dec.frames[0].planes):
        np.testing.assert_array_equal(np.asarray(p_enc), p_dec)


def test_ts_actually_chosen_on_screen_content(rng):
    # hard-edged synthetic "screen content": TS/BDPCM should win on some
    # blocks (it exists to beat DCT on such residuals)
    w, h = 64, 64
    y = np.zeros((h, w), np.int32)
    y[::4, :] = 255
    y[:, ::7] = 128
    u = np.full((h // 2, w // 2), 64, np.int32)
    v = np.full((h // 2, w // 2), 192, np.int32)
    cfg = EncCfg(width=w, height=h, qp=27, intra_block_size=8,
                 transform_skip=True, bdpcm=True, deblocking=False,
                 sao=False, alf=False)
    enc, dec = _roundtrip(cfg, [[y, u, v]])
    for p_enc, p_dec in zip(enc.results[0].recon, dec.frames[0].planes):
        np.testing.assert_array_equal(np.asarray(p_enc), p_dec)


def test_lossless_roundtrip(rng):
    w, h = 64, 32
    fmt = VideoFormat(w, h, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=w, height=h, qp=37, intra_block_size=8,
                 lossless=True)
    enc, dec = _roundtrip(cfg, frames)
    for poc, planes in enumerate(frames):
        # decoder output == SOURCE exactly: the lossless contract
        for src, p_dec in zip(planes, dec.frames[poc].planes):
            np.testing.assert_array_equal(np.asarray(src), p_dec)
        assert enc.results[poc].psnr_y == float("inf") or \
            enc.results[poc].psnr_y > 99.0


def test_lossless_10bit(rng):
    w, h = 32, 32
    fmt = VideoFormat(w, h, 10, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 1)
    cfg = EncCfg(width=w, height=h, qp=30, bit_depth=10,
                 intra_block_size=8, lossless=True)
    enc, dec = _roundtrip(cfg, frames)
    for src, p_dec in zip(frames[0], dec.frames[0].planes):
        np.testing.assert_array_equal(np.asarray(src), p_dec)
