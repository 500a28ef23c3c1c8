"""MCTF temporal pre-filter tests (reference: EncTemporalFilter.cpp)."""
import numpy as np

from vvc_mm_tpu.encoder import mctf


def _noisy_static_sequence(rng, n=5, h=64, w=64, noise=12):
    base_y = rng.integers(40, 200, size=(h, w)).astype(np.int32)
    base_u = rng.integers(60, 180, size=(h // 2, w // 2)).astype(np.int32)
    base_v = rng.integers(60, 180, size=(h // 2, w // 2)).astype(np.int32)
    frames = []
    for _ in range(n):
        frames.append([
            np.clip(p + rng.integers(-noise, noise + 1, size=p.shape), 0,
                    255).astype(np.int32)
            for p in (base_y, base_u, base_v)])
    return (base_y, base_u, base_v), frames


def test_mctf_denoises_static_content(rng):
    base, frames = _noisy_static_sequence(rng)
    filt = mctf.filter_frame(frames, poc=2, qp=32, max_refs=2)
    for bi, (b, before, after) in enumerate(zip(base, frames[2], filt)):
        mse_before = np.mean((before - b) ** 2.0)
        mse_after = np.mean((after - b) ** 2.0)
        assert mse_after < mse_before * 0.75, (bi, mse_before, mse_after)
        assert after.dtype == before.dtype
        assert after.min() >= 0 and after.max() <= 255


def test_mctf_tracks_motion(rng):
    # a translating pattern: the filter must align neighbors via ME, not
    # blur across the motion
    h, w = 64, 128
    wide = rng.integers(0, 255, size=(h, w + 32)).astype(np.int32)
    frames = []
    for t in range(5):
        y = wide[:, 4 * t:4 * t + w]
        u = (y[::2, ::2] // 2 + 30).astype(np.int32)
        v = (y[::2, ::2] // 3 + 40).astype(np.int32)
        frames.append([y.copy(), u, v])
    filt = mctf.filter_frame(frames, poc=2, qp=32, max_refs=2)
    # perfectly predictable motion + no noise -> output stays close to orig
    assert np.mean(np.abs(filt[0] - frames[2][0])) < 2.0


def test_mctf_edge_pocs_and_odd_sizes(rng):
    _, frames = _noisy_static_sequence(rng, n=3)
    out0 = mctf.filter_frame(frames, poc=0, qp=37)     # only future refs
    assert out0[0].shape == frames[0][0].shape
    # non-multiple-of-64 dims: pass-through, no crash
    small = [[p[:24, :24] for p in f[:1]] + [p[:12, :12] for p in f[1:]]
             for f in frames]
    assert mctf.filter_frame(small, poc=1, qp=32)[0].shape == (24, 24)


def test_prefilter_sequence_only_touches_anchors(rng):
    _, frames = _noisy_static_sequence(rng, n=9)
    out = mctf.prefilter_sequence(frames, qp=32, period=4)
    for poc in range(9):
        same = all(np.array_equal(a, b)
                   for a, b in zip(out[poc], frames[poc]))
        if poc % 4 == 0:
            assert not same, poc
        else:
            assert same, poc


def test_enclib_mctf_roundtrip(rng):
    # MCTF is an encoder-side pre-filter: the bitstream must still decode
    # bit-exactly against the encoder reconstruction
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib

    _, frames = _noisy_static_sequence(rng, n=5)
    cfg = EncCfg(width=64, height=64, qp=35, gop="RA", gop_size=4,
                 mctf=True, sao=False, alf=False)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert all(v == "OK" for v in dec.hash_status.values())
    assert len(out) == 5
    for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
        for p, q in zip(r.recon, d.planes):
            np.testing.assert_array_equal(p, q)
