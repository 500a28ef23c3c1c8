"""TMVP + HMVP AMVP list: unit behavior + LDP codec round trip."""
import hashlib

import numpy as np

from vvc_mm_tpu.encoder.inter_coder import HmvpList, amvp_list
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_hmvp_fifo_dedup():
    h = HmvpList()
    for mv in [(1, 2), (3, 4), (1, 2), (5, 6)]:
        h.push(np.array(mv))
    # (1,2) moved to most-recent on re-push
    assert h.lut == [(3, 4), (1, 2), (5, 6)]
    for i in range(10):
        h.push(np.array((i, i)))
    assert len(h.lut) == 5


def test_amvp_list_order_and_dedup():
    mvs = np.zeros((4, 4, 2), np.int64)
    mvs[0, 0] = (8, 0)       # left neighbor of (0,1)
    h = HmvpList()
    h.push(np.array((16, 16)))
    cands = amvp_list(mvs, 0, 1, col_mv=np.array((8, 0)), hist=h)
    # spatial median (8,0); TMVP dup of it is skipped -> HMVP (16,16)
    assert list(cands[0]) == [8, 0]
    assert list(cands[1]) == [16, 16]


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_ldp_tmvp_roundtrip_bitexact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(3.0, 1.0))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, tmvp=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_tmvp_saves_bits_on_steady_motion():
    """Constant global motion: TMVP/HMVP candidates should not cost bits
    (and usually save) vs the spatial-median-only coder."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 6, motion=(5.0, 2.0))
    base = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=32,
                         gop="LDP", inter_block_size=16))
    base.encode_sequence(frames)
    t = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                      inter_block_size=16, tmvp=True))
    t.encode_sequence(frames)
    assert t.summary()["bits"] <= base.summary()["bits"] * 1.02
