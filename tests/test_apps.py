"""CLI apps tests: encoder/decoder/parcat through their main() entry."""
import os

import numpy as np
import pytest

from vvc_mm_tpu.apps import decoder_app, encoder_app, parcat
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, YuvReader, YuvWriter, \
    synthetic_sequence


@pytest.fixture
def yuv_file(tmp_path):
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(2.0, 1.0))
    path = str(tmp_path / "in.yuv")
    w = YuvWriter(path, fmt)
    for f in frames:
        w.write_frame(f)
    w.close()
    return path, fmt, frames


def test_encoder_decoder_cli_roundtrip(yuv_file, tmp_path, capsys):
    path, fmt, frames = yuv_file
    bs = str(tmp_path / "out.bin")
    rec = str(tmp_path / "rec.yuv")
    out = str(tmp_path / "dec.yuv")
    rc = encoder_app.main(["-i", path, "-b", bs, "-o", rec,
                           "-wdt", "64", "-hgt", "32", "-q", "32",
                           "--GOP=RA", "--GOPSize=4", "--SearchRange=8"])
    assert rc == 0
    log = capsys.readouterr().out
    assert "SUMMARY" in log and "POC    0" in log
    rc = decoder_app.main(["-b", bs, "-o", out])
    assert rc == 0
    assert "MD5:" in capsys.readouterr().out
    # decoder output YUV == encoder recon YUV byte-exact
    assert open(out, "rb").read() == open(rec, "rb").read()


def test_encoder_cli_cfg_file(yuv_file, tmp_path, capsys):
    path, fmt, frames = yuv_file
    cfg = tmp_path / "enc.cfg"
    cfg.write_text("QP : 35            # per-CTC style\n"
                   "GOP : LDP\n"
                   "SearchRange : 8\n")
    bs = str(tmp_path / "o.bin")
    rc = encoder_app.main(["-c", str(cfg), "-i", path, "-b", bs,
                           "-wdt", "64", "-hgt", "32", "-f", "2"])
    assert rc == 0
    assert "QP35" in capsys.readouterr().out.replace(" ", "")


def test_encoder_cli_errors(tmp_path):
    with pytest.raises(SystemExit):
        encoder_app.main([])                       # missing input
    with pytest.raises(SystemExit):
        encoder_app.main(["--NoSuchOption=1", "-i", "x", "-b", "y"])


def test_parcat_splice(yuv_file, tmp_path, capsys):
    path, fmt, frames = yuv_file
    # encode two chunks separately (frames 0-2, 3-4), then splice
    half = str(tmp_path / "h1.yuv")
    w = YuvWriter(half, fmt)
    for f in frames[:3]:
        w.write_frame(f)
    w.close()
    half2 = str(tmp_path / "h2.yuv")
    w = YuvWriter(half2, fmt)
    for f in frames[3:]:
        w.write_frame(f)
    w.close()
    b1, b2 = str(tmp_path / "c1.bin"), str(tmp_path / "c2.bin")
    for src, dst in ((half, b1), (half2, b2)):
        encoder_app.main(["-i", src, "-b", dst, "-wdt", "64", "-hgt", "32",
                          "-q", "32", "--GOP=LDP", "--SearchRange=8"])
    out = str(tmp_path / "spliced.bin")
    rc = parcat.main([out, b1, b2])
    assert rc == 0
    dec = DecLib()
    decoded = dec.decode_bytes(open(out, "rb").read())
    assert [f.poc for f in decoded] == [0, 1, 2, 3, 4]


def test_lost_picture_concealment(rng):
    """Drop a reference picture's NAL: the decoder conceals it from the
    nearest available picture instead of aborting (reference:
    DecLib.cpp:1000 xCreateLostPicture)."""
    import numpy as np
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.common.bitstream import (read_annexb, write_annexb,
                                             NAL_TRAIL)
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    fmt = VideoFormat(96, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 4, motion=(2.0, 1.0))
    enc = EncLib(EncCfg(width=96, height=64, qp=35, gop="LDP",
                        picture_hash_sei=False))
    bs = enc.encode_sequence(frames)
    nalus = read_annexb(bs)
    # drop the first P picture (poc 1)
    dropped = [n for i, n in enumerate(nalus)
               if not (n.nal_type == NAL_TRAIL
                       and i == next(j for j, m in enumerate(nalus)
                                     if m.nal_type == NAL_TRAIL))]
    dec = DecLib()
    out = dec.decode_bytes(write_annexb(dropped))
    assert dec.concealed == [1]
    assert len(out) == 3          # pocs 0, 2, 3 decoded
