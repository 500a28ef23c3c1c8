"""End-to-end multi-model 360 codec tests (the reference's headline
feature): encode/decode with MPA/ROT/GED active, bit-exact roundtrip."""
import numpy as np
import pytest

from vvc_mm_tpu.common.slice_ps import MMConfig
from vvc_mm_tpu.common.typedefs import ChromaFormat, ProjectionID
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

W, H = 64, 32      # tiny ERP frame (CPU tests); blocks 16x16 -> 2x4 grid


@pytest.fixture(scope="module")
def seq():
    fmt = VideoFormat(W, H, 8, ChromaFormat.C420)
    return synthetic_sequence(fmt, 3, motion=(2.0, 1.0))


def _roundtrip(cfg, frames):
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f"POC {f.poc} mismatch"
    return enc, stream


def test_mpa_roundtrip_bitexact(seq):
    mm = MMConfig(mpa=True, projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=W, height=H, qp=32, gop="LDP", intra_period=0,
                 search_range=8, wrap_around=True, mm=mm)
    enc, stream = _roundtrip(cfg, seq)
    assert enc.summary()["psnr_y"] > 28.0


def test_full_mm_roundtrip_bitexact(seq):
    """MPA + ROT + GED(campose) + 3DT + TAN + GEDA all active."""
    mm = MMConfig(mpa=True, rot=True, ged=True, t3d=True, tan=True,
                  geda=True, projection=ProjectionID.EQUIRECTANGULAR,
                  global_epipole=(0.0, 0.0, 1.0))
    cfg = EncCfg(width=W, height=H, qp=32, gop="LDP", intra_period=0,
                 search_range=8, wrap_around=True, mm=mm,
                 epipoles=[(-1, -1, 1.0, 0.0, 0.0)])
    enc, stream = _roundtrip(cfg, seq)
    # all 11 models active -> model list survives SPS roundtrip
    dec = DecLib()
    dec.decode_bytes(stream)
    assert dec.sps.mm.active_models() == mm.active_models()
    assert len(dec.sps.mm.active_models()) == 11


def test_mm_sps_syntax_roundtrip():
    from vvc_mm_tpu.common.bitstream import BitReader, BitWriter
    from vvc_mm_tpu.common.slice_ps import SPS
    mm = MMConfig(mpa=True, ged=True, mmmvp=True, mm_offset_4x4=4,
                  projection=ProjectionID.EQUIRECTANGULAR,
                  global_epipole=(0.25, -0.5, 1.0))
    sps = SPS(width=128, height=64, mm=mm)
    bw = BitWriter()
    sps.write(bw)
    sps2 = SPS.read(BitReader(bw.get_bytes()))
    assert sps2.mm.mpa and sps2.mm.ged and sps2.mm.mmmvp
    assert sps2.mm.mm_offset_4x4 == 4
    assert np.allclose(sps2.mm.global_epipole, (0.25, -0.5, 1.0), atol=1e-6)
    assert sps2.mm.active_models() == mm.active_models()


def test_mm_b_frames_ra_roundtrip(rng):
    """MM RA GOP where B frames also carry multi-model motion + per-list
    model syntax (reference: the mode loop runs per model for B slices
    too, EncCu.cpp:775-798); bit-exact decode."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ChromaFormat, ProjectionID
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    import hashlib

    def md5(planes):
        m = hashlib.md5()
        for p in planes:
            m.update(np.asarray(p).astype(np.uint8).tobytes())
        return m.hexdigest()

    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(2.0, 1.0))
    mm = MMConfig(mpa=True, rot=True,
                  projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=128, height=64, qp=34, gop="RA", gop_size=4,
                 search_range=8, wrap_around=True, mm=mm)
    enc = EncLib(cfg)
    data = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(data)
    assert len(out) == 5
    for f, r in zip(sorted(out, key=lambda x: x.poc), enc.results):
        assert md5(f.planes) == md5(r.recon), f.poc


def test_mm_b_projected_dmvr_roundtrip(rng):
    """Projected DMVR (reference: InterPrediction.cpp:2442
    xProcessDMVRProjected): signaling-free bilateral refinement of
    bi-predicted MM blocks — decoder must still be bit-exact."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ChromaFormat, ProjectionID
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    import hashlib

    def md5(planes):
        m = hashlib.md5()
        for p in planes:
            m.update(np.asarray(p).astype(np.uint8).tobytes())
        return m.hexdigest()

    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(3.0, 0.5))
    mm = MMConfig(mpa=True, projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=128, height=64, qp=32, gop="RA", gop_size=2,
                 search_range=8, wrap_around=True, mm=mm, dmvr=True)
    enc = EncLib(cfg)
    data = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(data)
    for f, r in zip(sorted(out, key=lambda x: x.poc), enc.results):
        assert md5(f.planes) == md5(r.recon), f.poc
