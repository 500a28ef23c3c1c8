"""WPP entropy substreams: framing, parallel encode, bit-exact round trip."""
import hashlib

import numpy as np

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_wpp_roundtrip_bitexact():
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=30,
                 intra_block_size=8, wpp=True, num_substreams=4)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_wpp_same_recon_as_single_stream():
    """Substream split changes only the entropy framing, not the recon."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 1)
    a = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=30))
    a.encode_sequence(frames)
    b = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=30, wpp=True))
    b.encode_sequence(frames)
    assert _md5(a.results[0].recon) == _md5(b.results[0].recon)


def test_wpp_framing_parses_substreams():
    from vvc_mm_tpu.encoder.intra_coder import encode_intra_slice_wpp
    rng = np.random.default_rng(0)
    nby, nbx, s = 8, 4, 8
    modes = rng.integers(0, 67, (nby, nbx)).astype(np.int32)
    ly = np.zeros((nby, nbx, s, s), np.int32)
    lu = np.zeros((nby, nbx, 4, 4), np.int32)
    lv = np.zeros((nby, nbx, 4, 4), np.int32)
    ly[2, 1, 0, 0] = 5
    data = encode_intra_slice_wpp(modes, ly, lu, lv, num_substreams=4)
    n = int.from_bytes(data[:2], "big")
    assert n == 4
    lens = [int.from_bytes(data[2 + 4*i: 6 + 4*i], "big") for i in range(n)]
    assert sum(lens) == len(data) - 2 - 4 * n

    from vvc_mm_tpu.decoder.intra_parser import decode_intra_slice_wpp
    m2, _, _, _, _, _, ly2, lu2, lv2 = decode_intra_slice_wpp(data, nby,
                                                              nbx, s)
    np.testing.assert_array_equal(m2, modes)
    np.testing.assert_array_equal(ly2, ly)


def test_inter_wpp_roundtrip_bitexact():
    """Inter WPP: P and B slices coded as independently decodable entropy
    substreams (reference: EncSlice.cpp:2024-2113 per-substream
    termination; WPP HMVP reset per row)."""
    import hashlib

    import numpy as np

    from vvc_mm_tpu.common.typedefs import ChromaFormat
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

    def md5(ps):
        m = hashlib.md5()
        for p in ps:
            m.update(np.asarray(p).astype(np.uint8).tobytes())
        return m.hexdigest()

    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 6, motion=(3.0, 1.0))
    cfg = EncCfg(width=64, height=64, qp=32, gop="RA", gop_size=4,
                 inter_block_size=16, merge=True, tmvp=True, wpp=True,
                 num_substreams=2)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert md5(f.planes) == md5(res.recon), f.poc
