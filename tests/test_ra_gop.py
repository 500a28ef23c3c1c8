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
    ra = EncLib(EncCfg(width=64, height=32, qp=32, gop="RA", gop_size=8,
                       search_range=8))
    ra.encode_sequence(seq)
    ldp = EncLib(EncCfg(width=64, height=32, qp=32, gop="LDP",
                        intra_period=0, search_range=8))
    ldp.encode_sequence(seq)
    ra_s, ldp_s = ra.summary(), ldp.summary()
    assert ra_s["psnr_y"] > ldp_s["psnr_y"] - 0.5
    assert ra_s["bits"] < ldp_s["bits"] * 1.1, (ra_s["bits"], ldp_s["bits"])
