"""Utility-app tests: SEI removal, stream merge, extraction, targeting
(reference: SEIRemovalApp, StreamMergeApp, BitstreamExtractorApp,
BitrateTargeting)."""
import numpy as np

from vvc_mm_tpu.apps.bitrate_targeting import fit_qp_for_target
from vvc_mm_tpu.apps.bitstream_extractor import extract
from vvc_mm_tpu.apps.sei_removal import remove_sei
from vvc_mm_tpu.apps.stream_merge import merge
from vvc_mm_tpu.common.bitstream import NAL_SEI, read_annexb
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def _stream(rng, n=5, h=32, w=32, qp=35, gop="RA"):
    wide = rng.integers(0, 256, size=(h + 8, w + 8)).astype(np.int32)
    frames = []
    for t in range(n):
        y = wide[t:t + h, t:t + w].astype(np.int32)
        u = (y[::2, ::2] // 2).astype(np.int32)
        frames.append([y, u, u.copy()])
    enc = EncLib(EncCfg(width=w, height=h, qp=qp, gop=gop, gop_size=4,
                        sao=False, alf=False))
    return enc.encode_sequence(frames), enc


def test_sei_removal(rng):
    stream, _ = _stream(rng)
    out = remove_sei(stream)
    assert not any(n.nal_type == NAL_SEI for n in read_annexb(out))
    # stream still decodes (no hashes to check anymore)
    dec = DecLib()
    assert len(dec.decode_bytes(out)) == 5
    assert not dec.hash_status
    # keep-hash variant preserves the picture hashes
    kept = remove_sei(stream, keep_hash=True)
    dec2 = DecLib()
    dec2.decode_bytes(kept)
    assert all(v == "OK" for v in dec2.hash_status.values())


def test_stream_merge_and_extract(rng):
    s0, enc0 = _stream(rng)
    s1, enc1 = _stream(rng, qp=30)
    merged = merge([s0, s1])
    layers = {n.layer_id for n in read_annexb(merged)}
    assert layers == {0, 1}
    # extraction inverts the merge bit-exactly
    assert extract(merged, layer=0) == s0
    assert extract(merged, layer=1) == s1


def test_temporal_extraction_decodes(rng):
    stream, enc = _stream(rng, n=5, gop="RA")
    sub = extract(stream, layer=0, max_tid=1)
    assert len(sub) < len(stream)
    dec = DecLib()
    out = dec.decode_bytes(sub)
    # tid<=1 keeps the IDR, the GOP anchors and the mid-GOP B frames
    assert 0 < len(out) < 5
    assert all(v == "OK" for v in dec.hash_status.values())
    # kept pictures are bit-exact with the full-stream reconstructions
    by_poc = {r.poc: r for r in enc.results}
    for d in out:
        for p, q in zip(by_poc[d.poc].recon, d.planes):
            np.testing.assert_array_equal(p, q)


def test_fit_qp_for_target():
    # synthetic log-linear rate curve: bits = e^(12 - 0.1*qp)
    import math
    trial = [(q, int(math.exp(12 - 0.1 * q))) for q in (27, 32, 37)]
    assert fit_qp_for_target(trial, math.exp(12 - 0.1 * 32)) == 32
    assert fit_qp_for_target(trial, math.exp(12 - 0.1 * 40)) == 40
    # clamping and degenerate slope
    assert 1 <= fit_qp_for_target(trial, 1e18) <= 51
    assert fit_qp_for_target([(27, 100), (32, 100), (37, 100)], 100) == 32
