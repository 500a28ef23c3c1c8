"""Dependent quantization: trellis encoder vs state-machine decoder.

Mirrors the reference's oracle (DepQuant.cpp trellis + Quant dequant DQ
path): the decoder-side dequantize_dep must reconstruct exactly what the
encoder's chosen trellis path implies, and the trellis must beat plain
scalar quantization in rate-distortion terms.
"""
import numpy as np
import pytest

from vvc_mm_tpu.common import depquant, quant, transforms


def _rand_coeffs(rng, b=8, s=8, scale=200):
    # low-frequency-heavy coefficients, like real transform output
    yy, xx = np.mgrid[0:s, 0:s]
    decay = 1.0 / (1.0 + 0.6 * (xx + yy))
    c = rng.normal(0, scale, (b, s, s)) * decay
    return c.astype(np.int32)


def test_roundtrip_half_step(rng):
    """Reconstruction error bounded by one half-step of the lattice."""
    qp = 27
    c = _rand_coeffs(rng)
    lev = depquant.quantize_dep(c, qp, 3, 3)
    rec = np.asarray(depquant.dequantize_dep(lev, qp, 3, 3))
    step = quant.qstep(qp)
    t_shift, _ = transforms.transform_shift(3, 3, 8)
    step_coeff = step * (1 << t_shift)
    err = np.abs(rec - c)
    # trellis may spend distortion to save rate on small coeffs; the bound
    # that must hold everywhere is one full step (zero-run choice)
    assert err.max() <= step_coeff * 1.05 + 1


def test_decoder_state_machine_matches_levels(rng):
    """Parity-driven state evolution: feeding the encoder's levels through
    the decoder twice is deterministic and integer-exact."""
    qp = 32
    c = _rand_coeffs(rng, b=4, s=4)
    lev = depquant.quantize_dep(c, qp, 2, 2)
    r1 = np.asarray(depquant.dequantize_dep(lev, qp, 2, 2))
    r2 = np.asarray(depquant.dequantize_dep(lev, qp, 2, 2))
    np.testing.assert_array_equal(r1, r2)
    assert r1.dtype == np.int32


def test_trellis_beats_scalar_rd(rng):
    """At equal QP the dependent quantizer should reduce distortion for a
    comparable (or lower) level mass — the half-step lattice advantage."""
    qp = 30
    c = _rand_coeffs(rng, b=16, s=8, scale=400)
    lev_d = depquant.quantize_dep(c, qp, 3, 3)
    rec_d = np.asarray(depquant.dequantize_dep(lev_d, qp, 3, 3))
    lev_s = quant.quantize(c, qp, 3, 3, intra=False)
    rec_s = np.asarray(quant.dequantize(lev_s, qp, 3, 3))
    d_dep = np.mean((rec_d - c).astype(np.int64) ** 2)
    d_scl = np.mean((rec_s - c).astype(np.int64) ** 2)
    rate_proxy_d = np.abs(lev_d).sum() + 2 * np.count_nonzero(lev_d)
    rate_proxy_s = np.abs(lev_s).sum() + 2 * np.count_nonzero(lev_s)
    # accept either strictly better distortion or a clear rate saving
    assert d_dep <= d_scl * 1.02 or rate_proxy_d < rate_proxy_s


def test_zero_block():
    z = np.zeros((2, 8, 8), np.int32)
    lev = depquant.quantize_dep(z, 27, 3, 3)
    np.testing.assert_array_equal(np.asarray(lev), 0)
    rec = depquant.dequantize_dep(lev, 27, 3, 3)
    np.testing.assert_array_equal(np.asarray(rec), 0)


@pytest.mark.parametrize("qp,s,log2s", [(22, 4, 2), (27, 8, 3), (37, 16, 4)])
def test_sizes_and_qps(rng, qp, s, log2s):
    c = _rand_coeffs(rng, b=3, s=s, scale=300)
    lev = depquant.quantize_dep(c, qp, log2s, log2s)
    rec = np.asarray(depquant.dequantize_dep(lev, qp, log2s, log2s))
    assert rec.shape == c.shape
    # signs preserved where level is nonzero
    nz = np.asarray(lev) != 0
    assert np.all(np.sign(rec[nz]) == np.sign(np.asarray(lev)[nz]))


def test_allintra_depquant_roundtrip_bitexact():
    """Full codec loop with --DepQuant: encode -> bitstream -> decode must be
    bit-exact (the SPS flag drives the decoder's state-machine dequant)."""
    import hashlib

    from vvc_mm_tpu.common.typedefs import ChromaFormat
    from vvc_mm_tpu.decoder.declib import DecLib
    from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=30,
                 intra_block_size=8, dep_quant=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)

    def md5(planes):
        m = hashlib.md5()
        for p in planes:
            m.update(np.asarray(p).astype(np.uint8).tobytes())
        return m.hexdigest()

    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert md5(f.planes) == md5(res.recon), f.poc
