"""AMVR (adaptive MV resolution) roundtrip tests.

Reference: the EncCu IMV mode loop (EncCu.cpp:775-782,
xCheckRDCostInterIMV:4346) and the amvr_mode/imv CABAC syntax — per-block
quarter/full/4-pel MVD precision.  TPU re-design: one batched device pass
scores all three roundings of every block's MV at once
(common/inter_frame.py amvr_decide).
"""
from __future__ import annotations

import numpy as np

from vvc_mm_tpu.common.inter_frame import AMVR_SHIFTS, round_mv_amvr
from vvc_mm_tpu.common.slice_ps import SPS
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def test_round_mv_amvr():
    # half-away-from-zero rounding onto each grid, numpy and scalar agree
    v = np.array([-37, -8, -7, 0, 7, 8, 19, 40], dtype=np.int64)
    for sh in AMVR_SHIFTS:
        r = round_mv_amvr(v, sh)
        assert (r % (1 << sh) == 0).all()
        assert (np.abs(r - v) <= (1 << sh) // 2).all()
        for x in v:
            assert round_mv_amvr(int(x), sh) == r[list(v).index(x)]


def test_amvr_p_roundtrip_bit_exact():
    """LDP encode with AMVR on: decoder output must equal the encoder
    reconstruction, and large-motion content must actually pick coarse
    precisions somewhere (the tool is exercised, not just signaled)."""
    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(9.0, 4.0))
    cfg = EncCfg(width=128, height=64, qp=30, gop="LDP", intra_period=0,
                 search_range=16, amvr=True, alf=False)
    enc = EncLib(cfg)
    bs = enc.encode_sequence(frames)

    dec = DecLib()
    out = dec.decode_bytes(bs)
    assert dec.sps.amvr
    assert len(out) == 3
    for res in enc.results:
        df = next(f for f in out if f.poc == res.poc)
        for p_enc, p_dec in zip(res.recon, df.planes):
            np.testing.assert_array_equal(np.asarray(p_enc),
                                          np.asarray(p_dec))


def test_amvr_uses_coarse_modes():
    """The batched decision must choose full-/4-pel for blocks with large
    uniform motion (rate proxy beats the unchanged SAD)."""
    import jax.numpy as jnp

    from vvc_mm_tpu.common.inter_frame import (MC_MARGIN, amvr_decide,
                                               pad_ref)
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 256, size=(64, 128), dtype=np.int32)
    # orig = ref shifted by an integer displacement -> integer MV is exact
    orig = np.roll(ref, (-2, -12), axis=(0, 1))
    mvs = np.zeros((4, 8, 2), dtype=np.int32)
    mvs[..., 0] = 12 * 16   # full-pel x motion on the 1/16 grid
    mvs[..., 1] = 2 * 16
    refp = pad_ref(jnp.asarray(ref), MC_MARGIN, False)
    imv, mv_sel = amvr_decide(jnp.asarray(orig), refp, jnp.asarray(mvs),
                              16, 8, 64)
    imv = np.asarray(imv)
    mv_sel = np.asarray(mv_sel)
    assert (imv > 0).any()
    # every selected MV sits on its mode's grid
    for m, sh in enumerate(AMVR_SHIFTS):
        sel = imv == m
        if sel.any():
            assert (mv_sel[sel] % (1 << sh) == 0).all()
