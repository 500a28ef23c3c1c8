"""Rate control tests: bitrate tracking + roundtrip with varying QP."""
import numpy as np
import pytest

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.encoder.rate_ctrl import RateControl
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_model_qp_monotonic():
    rc = RateControl(1000e3, 30, 640, 480)
    q_hi = rc.pick_qp("P")
    rc2 = RateControl(100e3, 30, 640, 480)
    q_lo = rc2.pick_qp("P")
    assert q_lo > q_hi          # lower bitrate -> higher QP


def test_model_adapts_to_overshoot():
    rc = RateControl(500e3, 30, 640, 480)
    q0 = rc.pick_qp("P")
    for _ in range(8):
        rc.update(int(rc.bits_per_frame * 4))    # massive overshoot
        q = rc.pick_qp("P")
    assert q > q0                                # QP must rise


@pytest.mark.parametrize("kbps", [60, 250])
def test_rc_hits_target_roughly(kbps):
    fmt = VideoFormat(96, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 10, motion=(2.0, 1.0))
    cfg = EncCfg(width=96, height=64, qp=32, gop="LDP", intra_period=0,
                 search_range=8, target_bitrate_kbps=kbps, frame_rate=30)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    total_bits = sum(r.bits for r in enc.results)
    achieved_kbps = total_bits * 30 / len(frames) / 1000
    # picture-level RC on 10 frames: within a factor ~2.5 of target
    assert kbps / 2.5 < achieved_kbps < kbps * 2.5, achieved_kbps
    # variable-QP stream must still roundtrip bit-exactly
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc


def test_rc_bitrates_ordered():
    fmt = VideoFormat(96, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 6, motion=(2.0, 1.0))
    totals = []
    for kbps in (60, 400):
        enc = EncLib(EncCfg(width=96, height=64, gop="LDP", intra_period=0,
                            search_range=8, target_bitrate_kbps=kbps,
                            frame_rate=30))
        enc.encode_sequence(frames)
        totals.append(sum(r.bits for r in enc.results))
    assert totals[0] < totals[1]


def test_hrd_ptl_signaled_in_sps():
    """Rate-controlled streams carry HRD timing/buffer params and every
    SPS carries profile_tier_level (reference: HRD.h,
    ProfileLevelTier.{cpp,h})."""
    from vvc_mm_tpu.common.bitstream import BitReader, BitWriter
    from vvc_mm_tpu.common.slice_ps import SPS
    from vvc_mm_tpu.encoder.enclib import EncCfg

    cfg = EncCfg(width=64, height=64, qp=32, target_bitrate_kbps=400,
                 frame_rate=30.0)
    sps = cfg.make_sps()
    bw = BitWriter()
    sps.write(bw)
    got = SPS.read(BitReader(bw.get_bytes()))
    assert got.ptl.profile_idc == 1 and got.ptl.level_idc == 51
    assert got.hrd is not None and got.hrd.bit_rate_kbps == 400
    assert got.hrd.cpb_size_kbits == 800
    assert got.log2_parallel_merge_level == 2
    # fixed-QP streams omit HRD
    assert EncCfg(width=64, height=64).make_sps().hrd is None
