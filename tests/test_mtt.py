"""Multi-type-tree (QT+BT+TT) partitioning: lattice resolve, entropy
roundtrip, and end-to-end bit-exactness (reference:
UnitPartitioner.h:56-64 split types)."""
import hashlib

import numpy as np
import jax.numpy as jnp

from vvc_mm_tpu.common import mtt
from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_rect_shapes_catalog():
    shapes = mtt.rect_shapes(32, 2)
    kinds = {(k, d) for (k, d, *_rest) in shapes}
    # BT at 32 and 16; TT only at 32 (stripes must stay unit-aligned)
    assert ("bth", 0) in kinds and ("btv", 1) in kinds
    assert ("tth_m", 0) in kinds and ("tth_o", 0) in kinds
    assert ("tth_o", 1) not in kinds


def test_mtt_p_roundtrip_bitexact(rng):
    from vvc_mm_tpu.encoder.inter_coder import encode_p_slice_mtt
    from vvc_mm_tpu.decoder.inter_parser import decode_p_slice_mtt
    h = w = 64
    top, depth = 32, 2
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    refu = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    refv = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    # shifted ref + noise: should trigger a mix of split kinds
    orig = np.roll(ref, (2, 3), (0, 1)) + rng.integers(-5, 6, (h, w))
    orig = np.clip(orig, 0, 255).astype(np.int32)
    origu = np.clip(np.roll(refu, (1, 1), (0, 1)), 0, 255)
    origv = np.clip(np.roll(refv, (1, 1), (0, 1)), 0, 255)
    out = mtt.encode_p_frame_mtt(
        jnp.asarray(orig), jnp.asarray(origu), jnp.asarray(origv),
        jnp.asarray(ref), jnp.asarray(refu), jnp.asarray(refv),
        qp=32, top=top, depth=depth, bit_depth=8, search_range=8)
    shapes = mtt.rect_shapes(top, depth)
    codes = [np.asarray(c) for c in out["codes"]]
    sq_mv = [np.asarray(m).astype(np.int64) for m in out["sq_mv"]]
    sq_lev = [tuple(np.asarray(l) for l in trio)
              for trio in out["sq_levels"]]
    rect_mv = {k: np.asarray(v).astype(np.int64)
               for k, v in out["rect_mv"].items()}
    rect_lev = {k: tuple(np.asarray(l) for l in trio)
                for k, trio in out["rect_levels"].items()}
    payload = encode_p_slice_mtt(codes, sq_mv, sq_lev, rect_mv, rect_lev,
                                 top, depth)
    (mv_u, sq2, rect2, hr, lid) = decode_p_slice_mtt(payload, h, w, top,
                                                     depth)
    np.testing.assert_array_equal(mv_u, np.asarray(out["mv_unit"]))
    for d in range(depth + 1):
        for c in range(3):
            np.testing.assert_array_equal(sq2[d][c],
                                          np.asarray(out["sq_levels"][d][c]))
    for info in shapes:
        key = (info[0], info[1])
        for c in range(3):
            np.testing.assert_array_equal(
                rect2[key][c], np.asarray(out["rect_levels"][key][c]))
    # decoder-side reconstruction matches the encoder's
    rec2 = mtt.reconstruct_mtt(
        jnp.asarray(mv_u), [tuple(jnp.asarray(l) for l in t) for t in sq2],
        {k: tuple(jnp.asarray(l) for l in t) for k, t in rect2.items()},
        jnp.asarray(ref), jnp.asarray(refu), jnp.asarray(refv),
        32, top, depth, 8, False)
    for c in ("y", "u", "v"):
        np.testing.assert_array_equal(np.asarray(rec2[c]),
                                      np.asarray(out["recon"][c]))


def test_mtt_uses_rect_leaves(rng):
    """Content with a horizontal motion boundary inside nodes should pick
    at least one non-square split somewhere."""
    h = w = 64
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    orig = ref.copy()
    orig[:h // 2] = np.roll(ref[:h // 2], 5, 1)      # top half moves
    orig[h // 2:] = np.roll(ref[h // 2:], -4, 1)     # bottom half opposite
    u8 = np.full((h // 2, w // 2), 128, np.int32)
    out = mtt.encode_p_frame_mtt(
        jnp.asarray(orig), jnp.asarray(u8), jnp.asarray(u8),
        jnp.asarray(ref), jnp.asarray(u8), jnp.asarray(u8),
        qp=30, top=32, depth=2, bit_depth=8, search_range=8)
    codes = np.concatenate([np.asarray(c).ravel() for c in out["codes"]])
    assert (codes >= mtt.BTH).any()


def test_mtt_ldp_end_to_end(rng):
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(3.0, 1.0))
    cfg = EncCfg(width=64, height=64, qp=32, gop="LDP", intra_period=0,
                 inter_block_size=32, qt_depth=2, mtt=True, search_range=8)
    enc = EncLib(cfg)
    data = enc.encode_sequence(frames)
    dec = DecLib()
    out = dec.decode_bytes(data)
    assert len(out) == 3
    for f, r in zip(sorted(out, key=lambda x: x.poc), enc.results):
        assert _md5(f.planes) == _md5(r.recon), f.poc


def test_mtt_ra_gop_roundtrip_bitexact(rng):
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(2.0, 1.5))
    cfg = EncCfg(width=64, height=64, qp=34, gop="RA", gop_size=4,
                 inter_block_size=32, qt_depth=2, mtt=True, search_range=8)
    enc = EncLib(cfg)
    data = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(data)
    assert len(out) == 5
    for f, r in zip(sorted(out, key=lambda x: x.poc), enc.results):
        assert _md5(f.planes) == _md5(r.recon), f.poc
