"""MM-MVP conversion tests: converter consistency + roundtrip with flag."""
import numpy as np
import pytest

from vvc_mm_tpu.common.mm.mvp_convert import MMVPConverter
from vvc_mm_tpu.common.slice_ps import MMConfig
from vvc_mm_tpu.common.typedefs import ChromaFormat, MotionModelID as M, \
    ProjectionID
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


@pytest.fixture(scope="module")
def conv():
    return MMVPConverter(128, 64)


def test_same_model_passthrough(conv):
    mv = np.asarray([33, -17])
    out = conv.convert((40, 20), mv, M.MPA_FRONT_BACK, M.MPA_FRONT_BACK,
                       (40, 20), (40, 20))
    assert np.array_equal(out, mv)


def test_zero_mv_passthrough(conv):
    out = conv.convert((40, 20), np.asarray([0, 0]), M.CLASSIC,
                       M.ROTATIONAL, (40, 20), (40, 20))
    assert np.array_equal(out, [0, 0])


@pytest.mark.parametrize("model", [M.MPA_FRONT_BACK, M.THREE_D_TRANSLATIONAL,
                                   M.TANGENTIAL, M.ROTATIONAL,
                                   M.GEODESIC_AXIS_Z])
def test_conversion_self_inverse(conv, model):
    """model -> CLASSIC -> model must approximately return the original MV
    (round-trip through the pixel-shift domain)."""
    mv = np.asarray([48, -32])      # 3, -2 px in 1/16
    pos, c = (64, 32), (64, 32)
    as_classic = conv.convert(pos, mv, model, M.CLASSIC, c, c)
    back = conv.convert(pos, as_classic, M.CLASSIC, model, c, c)
    assert np.abs(back - mv).max() <= 2, (model, as_classic, back)


def test_classic_conversion_is_pixel_shift(conv):
    """CLASSIC -> CLASSIC-equivalent models at the equator: MPA front/back
    at the ERP equator is near-identity scaling."""
    mv = np.asarray([32, 0])
    out = conv.convert((64, 32), mv, M.CLASSIC, M.MPA_FRONT_BACK,
                       (64, 32), (64, 32))
    assert abs(int(out[0])) > 0      # nonzero equivalent motion


def test_mmmvp_roundtrip_bitexact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(2.0, 1.0))
    mm = MMConfig(mpa=True, rot=True, mmmvp=True,
                  projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=64, height=32, qp=32, gop="LDP", intra_period=0,
                 search_range=8, wrap_around=True, mm=mm)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert dec.sps.mm.mmmvp
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc
