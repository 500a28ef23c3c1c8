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


def test_inter_wpp_merge_tmvp_adversarial_roundtrip():
    """Adversarial WPP+merge+TMVP: many block rows, several substreams,
    strong mixed motion — regression for the HMVP selection/syntax
    divergence (select_merge_p must reset the HMVP FIFO at the same
    substream boundaries as the entropy pass; reference: the per-CTU-row
    HMVP reset under WPP)."""
    rng = np.random.default_rng(7)
    fmt = VideoFormat(128, 128, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 6, motion=(5.0, 3.0))
    # inject block-level noise so HMVP entries vary across rows
    for f in frames:
        y = np.asarray(f[0])
        y[32:64, 48:96] = rng.integers(0, 256, size=(32, 48))
    cfg = EncCfg(width=128, height=128, qp=28, gop="LDP",
                 inter_block_size=16, merge=True, tmvp=True, wpp=True,
                 num_substreams=4)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_select_merge_p_hmvp_resets_match_decoder():
    """select_merge_p must derive merge candidates with the SAME per-
    substream HMVP resets as the entropy pass, or the decoder resolves a
    different MV at the signaled merge_idx.  Crafted scenario: under a
    2x2-block merge-estimation region, block (3,0) has no spatial
    candidates; its ME MV is reachable only through a frame-continuous
    HMVP entry that a per-substream decoder does not hold."""
    from vvc_mm_tpu.encoder.inter_coder import (HmvpList, merge_candidates,
                                                select_merge_p)

    nby, nbx, lam, mer = 4, 2, 8.0, 1
    mv_me = np.zeros((nby, nbx, 2), np.int64)
    mv_me[0, 0] = (8, 0)
    mv_me[0, 1] = (8, 4)
    mv_me[1, 0] = (4, 0)
    mv_me[1, 1] = (0, 4)
    mv_me[2, 0] = (0, 4)
    mv_me[2, 1] = (8, 4)    # merges to zero (cheap zero field below)
    mv_me[3, 0] = (8, 4)    # only reachable via continuous-hist entry
    mv_me[3, 1] = (12, 8)
    sad_me = np.full((nby, nbx), 10.0)
    sad_me[2, 1] = 500.0

    def shift(f, dy, dx):
        p = np.zeros((nby + 2, nbx + 2) + f.shape[2:], f.dtype)
        p[1:-1, 1:-1] = f
        return p[1 + dy:1 + dy + nby, 1 + dx:1 + dx + nbx]

    cand_mvs = np.stack([shift(mv_me, 0, -1), shift(mv_me, -1, 0),
                         shift(mv_me, -1, 1), np.zeros_like(mv_me)])
    cand_sads = np.full((4, nby, nbx), 10000.0)
    cand_sads[3, 2, 1] = 5.0

    starts = (2,)
    final, mflag, midx = select_merge_p(
        mv_me, sad_me, cand_mvs, cand_sads, None, lam, True,
        mer_blocks_log2=mer, substream_starts=starts)

    # decoder replay: per-substream HMVP, candidates from the evolving grid
    dec = mv_me.copy()
    hist = HmvpList()
    for by in range(nby):
        if by in starts:
            hist = HmvpList()
        for bx in range(nbx):
            if mflag[by, bx]:
                cands = merge_candidates(dec, by, bx, None, hist,
                                         mer_blocks_log2=mer)
                dec[by, bx] = np.asarray(cands[int(midx[by, bx])], np.int64)
            hist.push(dec[by, bx])
    assert mflag.any()
    assert np.array_equal(dec, final)
