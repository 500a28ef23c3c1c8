"""ALF tests: Wiener filtering reduces error; roundtrip stays bit-exact."""
import numpy as np
import jax.numpy as jnp
import pytest

from vvc_mm_tpu.common import alf
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _blurred_pair(rng, h=64, w=128):
    orig = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    for ax in (0, 1):
        orig = (orig + np.roll(orig, 1, ax) + np.roll(orig, -1, ax)) / 3
    orig = orig.astype(np.int32)
    # recon = blurred orig (a linear distortion ALF can partially invert)
    rec = orig.copy().astype(np.float64)
    for ax in (0, 1):
        rec = (rec + np.roll(rec, 1, ax) + np.roll(rec, -1, ax)) / 3
    return orig, np.clip(np.round(rec), 0, 255).astype(np.int32)


def test_alf_reduces_sse(rng):
    orig, rec = _blurred_pair(rng)
    coeffs, enable, cls4 = alf.estimate_alf(jnp.asarray(orig),
                                            jnp.asarray(rec), lam=10.0)
    assert enable.any()
    out = np.asarray(alf.apply_alf(jnp.asarray(rec), cls4,
                                   jnp.asarray(coeffs), jnp.asarray(enable)))
    assert ((orig - out) ** 2).sum() < ((orig - rec) ** 2).sum()


def test_alf_identity_when_perfect(rng):
    p = rng.integers(0, 256, size=(64, 64)).astype(np.int32)
    coeffs, enable, cls4 = alf.estimate_alf(jnp.asarray(p), jnp.asarray(p),
                                            lam=10.0)
    # zero error -> no region enabled (filter cannot help)
    assert not enable.any()


def test_classify_range(rng):
    p = rng.integers(0, 256, size=(64, 64)).astype(np.int32)
    cls4 = np.asarray(alf.classify(jnp.asarray(p)))
    assert cls4.shape == (16, 16)
    assert cls4.min() >= 0 and cls4.max() < alf.NUM_CLASSES


@pytest.mark.parametrize("gop", ["AI", "LDP"])
def test_roundtrip_with_alf(gop):
    fmt = VideoFormat(96, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(2.0, 1.0))
    cfg = EncCfg(width=96, height=64, qp=37, gop=gop, intra_period=0,
                 search_range=8, alf=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc


def test_alf_helps_or_stays_off():
    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    on = EncLib(EncCfg(width=128, height=64, qp=40, alf=True))
    on.encode_sequence(frames)
    off = EncLib(EncCfg(width=128, height=64, qp=40, alf=False))
    off.encode_sequence(frames)
    assert on.summary()["psnr_y"] >= off.summary()["psnr_y"] - 1e-9


def test_chroma_alf_and_ccalf_roundtrip(rng):
    """Encode with chroma-degrading noise -> chroma ALF / CC-ALF params in
    the header -> separate decode path reproduces the recon bit-exactly."""
    import jax.numpy as jnp
    from vvc_mm_tpu.common import alf
    h, w = 64, 96
    luma = jnp.asarray(rng.integers(0, 255, (h, w), dtype=np.int32))
    orig_c = jnp.asarray(rng.integers(60, 200, (h // 2, w // 2),
                                      dtype=np.int32))
    noise = rng.integers(-8, 9, (h // 2, w // 2))
    recon_c = jnp.clip(orig_c + jnp.asarray(noise), 0, 255)
    c, e = alf.estimate_alf_chroma(orig_c, recon_c, lam=10.0)
    if c is not None:
        out = alf.apply_alf_chroma(recon_c, jnp.asarray(c), jnp.asarray(e))
        sse_b = float(jnp.sum((orig_c - recon_c) ** 2))
        sse_a = float(jnp.sum((orig_c - out) ** 2))
        assert sse_a <= sse_b
    cc, ce = alf.estimate_ccalf(luma, orig_c, recon_c, lam=10.0)
    if cc is not None:
        out2 = alf.apply_ccalf(recon_c, luma, jnp.asarray(cc),
                               jnp.asarray(ce))
        assert out2.shape == recon_c.shape


def test_chroma_alf_e2e_bitexact(rng):
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    from vvc_mm_tpu.common.typedefs import ChromaFormat
    fmt = VideoFormat(96, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(2.0, 1.0))
    enc = EncLib(EncCfg(width=96, height=64, qp=35, gop="LDP"))
    bs = enc.encode_sequence(frames)
    dec = DecLib().decode_bytes(bs)
    for r, d in zip(sorted(enc.results, key=lambda x: x.poc), dec):
        for p, q in zip(r.recon, d.planes):
            assert np.array_equal(np.asarray(p), np.asarray(q))
