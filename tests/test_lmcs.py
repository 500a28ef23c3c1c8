"""LMCS reshaper tests (reference: Reshape.{cpp,h}, EncReshape)."""
import numpy as np

from vvc_mm_tpu.common import reshape
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib


def test_lut_properties(rng):
    y = np.clip(rng.normal(100, 18, size=(64, 64)), 0, 255).astype(np.int32)
    cw = reshape.estimate_codewords(y)
    assert cw.sum() == 256 and (cw >= 1).all()
    fwd = reshape.build_fwd_lut(cw)
    inv = reshape.build_inv_lut(cw)
    assert (np.diff(fwd) >= 0).all() and (np.diff(inv) >= 0).all()
    # round trip through the piecewise-linear pair stays close
    xs = np.arange(256)
    err = np.abs(inv[fwd[xs]] - xs)
    assert err.max() <= 16 and err.mean() < 4
    # dense region gets expanded (slope > 1): more codewords than uniform
    assert cw[100 // 16] > 16


def test_lmcs_roundtrip_bitexact(rng):
    h, w = 64, 64
    frames = []
    base = np.clip(rng.normal(120, 15, size=(h + 8, w + 8)), 0,
                   255).astype(np.int32)
    for t in range(3):
        y = base[t:t + h, 2 * t:2 * t + w].astype(np.int32)
        u = (y[::2, ::2] // 2 + 40).astype(np.int32)
        frames.append([y, u, u.copy()])
    cfg = EncCfg(width=w, height=h, qp=34, gop="LDP", intra_period=0,
                 lmcs=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(stream)
    assert dec.sps.lmcs and len(dec.sps.lmcs_cw) == 16
    assert all(v == "OK" for v in dec.hash_status.values())
    # internal (mapped-domain) reconstructions match bit-exactly
    for r, d in zip(sorted(enc.results, key=lambda x: x.poc), out):
        for p, q in zip(r.recon, d.planes):
            np.testing.assert_array_equal(p, q)
    # display-domain outputs match between encoder and decoder too
    for r, d in zip(sorted(enc.results, key=lambda x: x.poc),
                    dec.output_frames()):
        assert r.recon_out is not None
        for p, q in zip(r.recon_out, d.planes):
            np.testing.assert_array_equal(p, q)
    # the display output is in the original domain (close to the source)
    for r, f in zip(sorted(enc.results, key=lambda x: x.poc), frames):
        assert np.mean(np.abs(r.recon_out[0] - f[0])) < 8.0
        assert r.psnr_y > 30.0
