"""End-to-end all-intra codec test: encode -> decode -> bit-exact recon.

This is the framework's analog of the reference's decoded-picture-hash
oracle (SURVEY.md §4.1: encoder's internal reconstruction must equal the
decoder's output, DecLib.cpp:868)."""
import hashlib

import numpy as np
import pytest

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


@pytest.fixture(scope="module")
def small_seq():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    return fmt, synthetic_sequence(fmt, 2)


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


@pytest.mark.parametrize("qp", [27, 37])
def test_allintra_roundtrip_bitexact(small_seq, qp):
    fmt, frames = small_seq
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=qp,
                 intra_block_size=8, frames=len(frames))
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    assert len(stream) > 50

    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        # the conformance oracle: decoder output == encoder reconstruction
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_allintra_quality_reasonable(small_seq):
    fmt, frames = small_seq
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=27,
                 intra_block_size=8)
    enc = EncLib(cfg)
    enc.encode_sequence(frames)
    s = enc.summary()
    assert s["psnr_y"] > 33.0, s
    # and QP raises -> fewer bits
    enc2 = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=39,
                         intra_block_size=8))
    enc2.encode_sequence(frames)
    assert enc2.summary()["bits"] < s["bits"]
    assert enc2.summary()["psnr_y"] < s["psnr_y"]


def test_allintra_blocksize16(small_seq):
    fmt, frames = small_seq
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32,
                 intra_block_size=16)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames[:1])
    out = DecLib().decode_bytes(stream)
    assert _md5(out[0].planes) == _md5(enc.results[0].recon)
