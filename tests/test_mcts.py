"""Motion-constrained tile sets (reference: MCTS.{cpp,h}, temporal MCTS
SEI; SURVEY.md §2.8 — MCTS is the reference's shard-local-motion device,
mapped here to an encoder-side batched MV clamp + SEI signaling)."""
from __future__ import annotations

import numpy as np

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _mv_support_in_tile(mv, b, s, t0, extent):
    lo = b + (int(mv) >> 4) - 3
    hi = b + ((int(mv) + 15) >> 4) + s + 4
    return lo >= t0 and hi <= t0 + extent


def test_mcts_clamp_keeps_support_in_tile():
    import jax.numpy as jnp

    from vvc_mm_tpu.common.inter_frame import mcts_clamp_mvs
    rng = np.random.default_rng(3)
    nby, nbx, s = 8, 16, 16
    w, h = nbx * s, nby * s
    mvs = rng.integers(-40 * 16, 40 * 16, size=(nby, nbx, 2)).astype(np.int32)
    out = np.asarray(mcts_clamp_mvs(jnp.asarray(mvs), s, w, h, 2, 2))
    tw, th = w // 2, h // 2
    for by in range(nby):
        for bx in range(nbx):
            x, y = bx * s, by * s
            assert _mv_support_in_tile(out[by, bx, 0], x, s,
                                       (x // tw) * tw, tw)
            assert _mv_support_in_tile(out[by, bx, 1], y, s,
                                       (y // th) * th, th)
    # small MVs at blocks a full block away from every tile edge (where
    # the filter support cannot cross) survive untouched
    small = np.zeros((nby, nbx, 2), np.int32) + 8
    out2 = np.asarray(mcts_clamp_mvs(jnp.asarray(small), s, w, h, 2, 2))
    for rows in (slice(1, 3), slice(5, 7)):
        for cols in (slice(1, 7), slice(9, 15)):
            assert (out2[rows, cols] == 8).all()


def test_mcts_roundtrip_and_sei():
    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(6.0, 2.0))
    cfg = EncCfg(width=128, height=64, qp=32, gop="LDP", intra_period=0,
                 search_range=16, mcts_tiles=(2, 1), alf=False)
    enc = EncLib(cfg)
    bs = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(bs)
    assert dec.mcts_tiles == (2, 1)
    assert all(v == "OK" for v in dec.hash_status.values())
    for res in enc.results:
        df = next(f for f in out if f.poc == res.poc)
        for p_enc, p_dec in zip(res.recon, df.planes):
            np.testing.assert_array_equal(np.asarray(p_enc),
                                          np.asarray(p_dec))
