"""SAO tests: estimation improves PSNR, application is shared/bit-exact."""
import numpy as np
import jax.numpy as jnp
import pytest

from vvc_mm_tpu.common import sao
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_sao_reduces_sse(rng):
    orig = rng.integers(0, 256, size=(64, 128)).astype(np.int32)
    noise = rng.integers(-4, 5, size=orig.shape)
    recon = np.clip(orig + noise, 0, 255).astype(np.int32)
    types, offsets, band_pos = sao.estimate_sao(
        jnp.asarray(orig), jnp.asarray(recon), lam=1.0)
    out = np.asarray(sao.apply_sao(jnp.asarray(recon), types, offsets,
                                   band_pos))
    sse_before = ((orig - recon) ** 2).sum()
    sse_after = ((orig - out) ** 2).sum()
    assert sse_after <= sse_before
    assert out.min() >= 0 and out.max() <= 255


def test_sao_off_when_useless(rng):
    p = rng.integers(0, 256, size=(64, 64)).astype(np.int32)
    types, offsets, band_pos = sao.estimate_sao(
        jnp.asarray(p), jnp.asarray(p), lam=100.0)
    assert (np.asarray(types) == 0).all()
    out = np.asarray(sao.apply_sao(jnp.asarray(p), types, offsets, band_pos))
    assert np.array_equal(out, p)


def test_eo_category_structure():
    p = jnp.asarray(np.array([[10, 10, 10], [10, 5, 10], [10, 10, 10]],
                             dtype=np.int32))
    cat = np.asarray(sao.eo_category(p, 2))    # horizontal
    assert cat[1, 1] == 1                       # valley
    p2 = jnp.asarray(np.array([[10, 10, 10], [10, 20, 10], [10, 10, 10]],
                              dtype=np.int32))
    assert np.asarray(sao.eo_category(p2, 3))[1, 1] == 4   # vertical peak


@pytest.mark.parametrize("gop", ["AI", "LDP", "RA"])
def test_roundtrip_with_sao(gop):
    fmt = VideoFormat(96, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5 if gop == "RA" else 3,
                                motion=(2.0, 1.0))
    cfg = EncCfg(width=96, height=64, qp=37, gop=gop, gop_size=4,
                 intra_period=0, search_range=8, sao=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        for p, q in zip(f.planes, res.recon):
            assert np.array_equal(p, q), f.poc


def test_sao_gains_at_high_qp():
    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    on = EncLib(EncCfg(width=128, height=64, qp=42, sao=True))
    on.encode_sequence(frames)
    off = EncLib(EncCfg(width=128, height=64, qp=42, sao=False))
    off.encode_sequence(frames)
    assert on.summary()["psnr_y"] >= off.summary()["psnr_y"]
