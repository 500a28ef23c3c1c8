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


def test_convert_360_app(tmp_path, rng):
    import numpy as np
    from vvc_mm_tpu.apps import convert_360
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, YuvWriter, YuvReader
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    w, h = 96, 48
    fmt = VideoFormat(w, h, 8, ChromaFormat.C420)
    src = tmp_path / "in.yuv"
    wr = YuvWriter(str(src), fmt)
    for _ in range(2):
        wr.write_frame([rng.integers(0, 255, (h, w)).astype(np.uint8),
                        rng.integers(0, 255, (h//2, w//2)).astype(np.uint8),
                        rng.integers(0, 255, (h//2, w//2)).astype(np.uint8)])
    wr.close()
    dst = tmp_path / "out.yuv"
    rc = convert_360.main(["-i", str(src), "-o", str(dst),
                           "-wdt", str(w), "-hgt", str(h),
                           "--src", "erp", "--dst", "eac",
                           "-ow", "96", "-oh", "64",
                           "--method", "bilinear"])
    assert rc == 0
    rd = YuvReader(str(dst), VideoFormat(96, 64, 8, ChromaFormat.C420))
    f = rd.read_frame()
    assert f is not None and f[0].shape == (64, 96)
    rd.close()
    # viewport render path
    vp = tmp_path / "vp.yuv"
    rc = convert_360.main(["-i", str(src), "-o", str(vp),
                           "-wdt", str(w), "-hgt", str(h),
                           "-ow", "32", "-oh", "32",
                           "--viewport", "90,0,0", "--method", "bilinear"])
    assert rc == 0


def test_film_grain_sei_roundtrip(tmp_path, rng):
    import numpy as np
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.common.film_grain import apply_grain, analyze
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    fmt = VideoFormat(96, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    # add synthetic grain to the source so the analyzer finds some
    noisy = [[np.clip(f[0].astype(np.int64)
                      + rng.integers(-6, 7, f[0].shape), 0, 255
                      ).astype(f[0].dtype), f[1], f[2]] for f in frames]
    enc = EncLib(EncCfg(width=96, height=64, qp=37, film_grain=True))
    bs = enc.encode_sequence(noisy)
    dec = DecLib()
    out = dec.decode_bytes(bs)
    assert dec.film_grain is not None
    assert dec.film_grain.intervals_y
    g = apply_grain(out[0].planes, dec.film_grain, 0)
    assert g[0].shape == out[0].planes[0].shape
    assert not np.array_equal(g[0], out[0].planes[0])
    # determinism: same poc -> same grain
    g2 = apply_grain(out[0].planes, dec.film_grain, 0)
    assert np.array_equal(g[0], g2[0])
    # film grain app end-to-end
    from vvc_mm_tpu.apps import film_grain_app
    p = tmp_path / "in.bin"
    p.write_bytes(bs)
    rc = film_grain_app.main(["-b", str(p), "-o", str(tmp_path / "g.yuv")])
    assert rc == 0


def test_subpic_merge_and_composite(tmp_path, rng):
    import numpy as np
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.apps import subpic_merge
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    streams, recons = [], []
    for seed in (1, 2):
        fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
        frames = synthetic_sequence(fmt, 2, motion=(float(seed), 0.5))
        enc = EncLib(EncCfg(width=64, height=32, qp=35, gop="LDP"))
        streams.append(enc.encode_sequence(frames))
        recons.append(sorted(enc.results, key=lambda r: r.poc))
    merged = subpic_merge.merge(streams, cols=2)
    frames, (W, H) = subpic_merge.decode_merged(merged)
    assert (W, H) == (128, 32) and len(frames) == 2
    # each half must bit-exactly match its own stream's reconstruction
    for t in range(2):
        assert np.array_equal(frames[t][0][:, :64], recons[0][t].recon[0])
        assert np.array_equal(frames[t][0][:, 64:], recons[1][t].recon[0])
    # extractor recovers a single subpicture stream losslessly
    from vvc_mm_tpu.apps import bitstream_extractor
    from vvc_mm_tpu.common.bitstream import read_annexb, write_annexb
    sub0 = bitstream_extractor.extract(merged, layer=0, max_tid=7)
    nalus = [n for n in read_annexb(sub0)
             if not (n.payload and n.payload[0] == 20
                     and n.nal_type == 23)]
    from vvc_mm_tpu.decoder.declib import DecLib
    out0 = DecLib().decode_bytes(write_annexb(nalus))
    assert np.array_equal(out0[0].planes[0], recons[0][0].recon[0])
