"""Explicit MTS (multiple transform selection) roundtrip tests.

Reference: TrQuant.cpp:619 getTrTypes — the five explicit MTS transform
pairs (DCT2/DCT2, DST7/DST7, DCT8/DST7, DST7/DCT8, DCT8/DCT8) chosen per
TU with tu_mts_idx syntax; LFNST combines only with the DCT2 pair.  TPU
re-design: all five pairs (+LFNST candidates) are transformed/quantized
for every block of a wavefront step at once and one argmin picks per
block (common/wavefront.py _tq_mts_encode).
"""
from __future__ import annotations

import numpy as np

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _roundtrip(cfg, frames):
    enc = EncLib(cfg)
    bs = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(bs)
    assert len(out) == len(frames)
    for res in enc.results:
        df = next(f for f in out if f.poc == res.poc)
        for p_enc, p_dec in zip(res.recon, df.planes):
            np.testing.assert_array_equal(np.asarray(p_enc),
                                          np.asarray(p_dec))
    assert all(v == "OK" for v in dec.hash_status.values())
    return enc, dec


def test_mts_ai_roundtrip_bit_exact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=64, height=32, qp=30, gop="AI", mts=True,
                 alf=False, sao=False)
    enc, dec = _roundtrip(cfg, frames)
    assert dec.sps.mts


def test_mts_with_lfnst_roundtrip():
    """MTS + LFNST together: LFNST candidates ride the DCT2 pair only."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2)
    cfg = EncCfg(width=64, height=32, qp=28, gop="AI", mts=True, lfnst=True,
                 alf=False, sao=False)
    _roundtrip(cfg, frames)


def test_mts_selects_nondefault_pairs():
    """On structured content some blocks must pick a non-DCT2 pair, and
    the choice must never lose to always-DCT2 in total RD (sanity that the
    tool can only help)."""
    import jax.numpy as jnp

    from vvc_mm_tpu.common.wavefront import _tq_mts_encode
    rng = np.random.default_rng(11)
    s = 8
    # residuals ramping away from the top-left corner: DST7-shaped
    base = np.arange(s, dtype=np.int32)
    resid = (base[None, :, None] + base[None, None, :]) * 2 \
        + rng.integers(-2, 3, size=(64, s, s)).astype(np.int32)
    pred = jnp.full((64, s, s), 128, jnp.int32)
    mode = jnp.zeros(64, jnp.int32)
    lev, rec, lfi, mtsi = _tq_mts_encode(pred, jnp.asarray(resid), mode,
                                         32, s, 8, False, False)
    assert (np.asarray(mtsi) > 0).any()
