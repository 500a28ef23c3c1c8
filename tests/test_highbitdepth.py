"""10-bit coding path tests (reference: cfg/hbd feature dir)."""
import numpy as np
import pytest

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, YuvReader, YuvWriter, \
    synthetic_sequence


@pytest.fixture(scope="module")
def seq10():
    fmt = VideoFormat(64, 32, 10, ChromaFormat.C420)
    return fmt, synthetic_sequence(fmt, 3, motion=(2.0, 1.0))


@pytest.mark.parametrize("gop", ["AI", "LDP"])
def test_10bit_roundtrip_bitexact(seq10, gop):
    fmt, frames = seq10
    assert max(f[0].max() for f in frames) > 255    # actually 10-bit content
    cfg = EncCfg(width=64, height=32, bit_depth=10, qp=32, gop=gop,
                 intra_period=0, search_range=8)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert dec.sps.bit_depth == 10
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc
    assert enc.summary()["psnr_y"] > 30


def test_10bit_yuv_io_roundtrip(tmp_path, seq10):
    fmt, frames = seq10
    path = str(tmp_path / "ten.yuv")
    w = YuvWriter(path, fmt)
    for f in frames:
        w.write_frame(f)
    w.close()
    r = YuvReader(path, fmt)
    assert r.num_frames == len(frames)
    back = r.read_frame()
    for a, b in zip(back, frames[0]):
        assert np.array_equal(a, b)
