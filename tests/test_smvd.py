"""SMVD symmetric-MVD syntax: entropy round trip + size saving."""
import numpy as np

from vvc_mm_tpu.encoder.inter_coder import encode_b_slice
from vvc_mm_tpu.decoder.inter_parser import decode_b_slice


def _grids(rng, nby=4, nbx=4, s=16, mirror=True):
    mv0 = rng.integers(-64, 64, (nby, nbx, 2)).astype(np.int64)
    mv1 = -mv0 if mirror else rng.integers(-64, 64, (nby, nbx, 2)).astype(np.int64)
    dirs = np.full((nby, nbx), 2, np.int32)
    lev_y = np.zeros((nby, nbx, s, s), np.int32)
    lev_u = np.zeros((nby, nbx, s // 2, s // 2), np.int32)
    lev_v = np.zeros((nby, nbx, s // 2, s // 2), np.int32)
    lev_y[:, :, 0, 0] = rng.integers(1, 5, (nby, nbx))
    return mv0, mv1, dirs, lev_y, lev_u, lev_v


def test_bi_roundtrip_with_smvd(rng):
    mv0, mv1, dirs, ly, lu, lv = _grids(rng, mirror=True)
    data, c0, c1 = encode_b_slice(mv0, mv1, dirs, ly, lu, lv)
    m0, m1, d2, ly2, lu2, lv2, _ = decode_b_slice(data, 4, 4, 16)
    np.testing.assert_array_equal(m0, c0)
    np.testing.assert_array_equal(m1, c1)
    np.testing.assert_array_equal(d2, dirs)
    np.testing.assert_array_equal(ly2, ly)


def test_bi_roundtrip_without_mirror(rng):
    mv0, mv1, dirs, ly, lu, lv = _grids(rng, mirror=False)
    data, c0, c1 = encode_b_slice(mv0, mv1, dirs, ly, lu, lv)
    m0, m1, d2, *_ = decode_b_slice(data, 4, 4, 16)
    np.testing.assert_array_equal(m0, c0)
    np.testing.assert_array_equal(m1, c1)


def test_smvd_saves_bits_on_mirrored_motion(rng):
    g_mirror = _grids(rng, mirror=True)
    g_free = _grids(rng, mirror=False)
    d_mirror, *_ = encode_b_slice(*g_mirror)
    d_free, *_ = encode_b_slice(*g_free)
    # mirrored BI blocks send one mvd instead of two
    assert len(d_mirror) < len(d_free) * 0.85
