"""Random-access hierarchical-B GOP tests."""
import numpy as np
import pytest

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_ra_coding_order_gop8():
    order = EncLib.ra_coding_order(9, 8)
    # anchor first, then dyadic bisection
    assert order[0] == (8, 0, -1, 0)
    assert (4, 0, 8, 1) in order
    assert (2, 0, 4, 2) in order and (6, 4, 8, 2) in order
    pocs = [o[0] for o in order]
    assert sorted(pocs) == list(range(1, 9))
    # every B's refs appear earlier in coding order (or are POC 0)
    coded = {0}
    for (poc, r0, r1, _) in order:
        assert r0 in coded and (r1 < 0 or r1 in coded), (poc, r0, r1)
        coded.add(poc)


def test_ra_partial_tail():
    order = EncLib.ra_coding_order(6, 8)    # frames 0..5, no full GOP
    assert order[0] == (5, 0, -1, 0)
    assert sorted(o[0] for o in order) == [1, 2, 3, 4, 5]


@pytest.fixture(scope="module")
def seq():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    return synthetic_sequence(fmt, 9, motion=(2.0, 0.5))


def test_ra_roundtrip_bitexact(seq):
    cfg = EncCfg(width=64, height=32, qp=32, gop="RA", gop_size=8,
                 search_range=8)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(seq)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(seq)
    assert [f.poc for f in out] == list(range(len(seq)))
    for f, res in zip(out, enc.results):
        assert res.poc == f.poc
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc


def test_ra_beats_ldp_on_bits(seq):
    """Hierarchical B with future refs should beat LDP at same QP."""
    # ctc_qp_offsets off: this test isolates the STRUCTURE (future refs)
    # at one QP; the CTC QP cascade is covered by its own test below
    ra = EncLib(EncCfg(width=64, height=32, qp=32, gop="RA", gop_size=8,
                       search_range=8, ctc_qp_offsets=False))
    ra.encode_sequence(seq)
    ldp = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP",
                        intra_period=0, search_range=8))
    ldp.encode_sequence(seq)
    ra_s, ldp_s = ra.summary(), ldp.summary()
    assert ra_s["psnr_y"] > ldp_s["psnr_y"] - 0.5
    assert ra_s["bits"] < ldp_s["bits"] * 1.1, (ra_s["bits"], ldp_s["bits"])


def test_ctc_qp_cascade_saves_rate_bd(seq):
    """The CTC temporal-layer QP cascade (I -3, anchors +1, B layers
    +1/+4/+5/+6; reference: encoder_randomaccess_vtm_gop16.cfg QPoffset
    column) must give a negative BD-rate vs flat QP (it trades leaf-B
    PSNR for bits, so equal-QP comparisons are meaningless — the curve
    must win)."""
    from vvc_mm_tpu.apps.bd_rate import bd_rate

    def ladder(offsets):
        rates, psnrs = [], []
        for qp in (28, 32, 36):
            e = EncLib(EncCfg(width=64, height=32, qp=qp, gop="RA",
                              gop_size=8, search_range=8,
                              ctc_qp_offsets=offsets))
            e.encode_sequence(seq)
            s = e.summary()
            rates.append(int(s["bits"]))
            psnrs.append(float(s["psnr_y"]))
        return rates, psnrs

    ra, pa = ladder(False)
    rt, pt = ladder(True)
    assert bd_rate(ra, pa, rt, pt) < 0.0


def test_gop16_roundtrip_bitexact(seq):
    """RA GOP16 with the QP cascade: full round trip (reference:
    cfg/encoder_randomaccess_vtm_gop16.cfg dyadic structure)."""
    import hashlib

    from vvc_mm_tpu.decoder.declib import DecLib

    def md5(ps):
        m = hashlib.md5()
        for p in ps:
            m.update(np.asarray(p).astype(np.uint8).tobytes())
        return m.hexdigest()

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 17, motion=(2.0, 1.0))
    enc = EncLib(EncCfg(width=64, height=32, qp=34, gop="RA",
                        gop_size=16, search_range=8))
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert md5(f.planes) == md5(res.recon), f.poc
