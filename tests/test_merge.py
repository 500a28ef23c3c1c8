"""Merge/skip candidate machinery: list derivation units + codec round
trips (reference: UnitTools.cpp:1059 getInterMergeCandidates,
CABACWriter/Reader merge_flag / merge_idx / cu_skip_flag)."""
import hashlib

import numpy as np
import pytest

from vvc_mm_tpu.common.typedefs import ChromaFormat
from vvc_mm_tpu.decoder.declib import DecLib
from vvc_mm_tpu.encoder.enclib import EncCfg, EncLib
from vvc_mm_tpu.encoder.inter_coder import (HmvpList, MERGE_MAX,
                                            merge_candidates)
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _md5(planes):
    m = hashlib.md5()
    for p in planes:
        m.update(np.asarray(p).astype(np.uint8).tobytes())
    return m.hexdigest()


def test_merge_candidates_order_and_dedup():
    mvs = np.zeros((4, 4, 2), np.int64)
    mvs[1, 0] = (8, 4)      # left of (1,1)
    mvs[0, 1] = (8, 4)      # above (duplicate of left)
    mvs[0, 2] = (16, 0)     # above-right
    cands = merge_candidates(mvs, 1, 1)
    assert cands[0] == (8, 4)
    assert cands[1] == (16, 0)           # dup dropped
    assert cands[2] == (0, 0)            # above-left is zero grid entry
    # pairwise average of first two
    assert cands[3] == ((8 + 16 + 1) >> 1, (4 + 0 + 1) >> 1)
    assert len(cands) == MERGE_MAX


def test_merge_candidates_parallel_merge_level():
    """Neighbors inside the same merge-estimation region are excluded
    (reference: isDiffMER / sps_log2_parallel_merge_level)."""
    mvs = np.zeros((4, 4, 2), np.int64)
    mvs[1, 0] = (8, 4)      # left of (1,1) — same 2x2-block region
    mvs[0, 2] = (16, 0)     # above-right — different region
    cands = merge_candidates(mvs, 1, 1, mer_blocks_log2=1)
    # left (1,0), above (0,1) and above-left (0,0) share the region with
    # (1,1); only above-right (0,2) survives
    assert cands[0] == (0, 0) or cands[0] == (16, 0)
    assert (16, 0) in cands[:2]
    assert (8, 4) not in cands


def test_merge_candidates_tmvp_hmvp():
    mvs = np.zeros((2, 2, 2), np.int64)
    h = HmvpList()
    h.push(np.array((32, -16)))
    cands = merge_candidates(mvs, 0, 0, col_mv=np.array((4, 4)), hist=h)
    assert cands[0] == (4, 4)            # TMVP (no spatial at origin)
    assert cands[1] == (32, -16)         # HMVP
    assert cands[2] == ((4 + 32 + 1) >> 1, (4 - 16 + 1) >> 1)  # pairwise


def test_merge_p_roundtrip_bitexact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(3.0, 1.0))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, merge=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_merge_p_tmvp_amvr_roundtrip_bitexact():
    """Merge composed with the AMVP-side tools (TMVP/HMVP list + AMVR)."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(4.5, 1.5))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, merge=True, tmvp=True, amvr=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_merge_parallel_merge_level_roundtrip():
    """A 64-px merge-estimation region changes the candidate lists on both
    sides identically (the SPS bits are read, not dead)."""
    fmt = VideoFormat(64, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 4, motion=(3.0, 1.0))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, merge=True,
                 log2_parallel_merge_level=6)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_merge_ra_roundtrip_bitexact():
    """RA GOP (P anchors + hierarchical B) with whole-motion B merge."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 9, motion=(3.0, 1.0))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="RA",
                 gop_size=4, inter_block_size=16, merge=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_merge_b_gpm_ciip_roundtrip():
    """B merge composed with GPM/CIIP (those blocks never merge; their
    stored bi motion still feeds neighbors' candidate lists)."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(4.0, 2.0))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="RA",
                 gop_size=4, inter_block_size=16, merge=True, gpm=True,
                 ciip=True, dmvr=True, bdof=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_2ref_p_roundtrip_bitexact():
    """Two active references with per-block ref_idx (LDP: poc-1, poc-2;
    reference: per-ref ME loop InterSearch.cpp:4937 + ref_idx syntax)."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 6, motion=(3.0, 1.0))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, merge=True, max_num_ref=2)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_2ref_uses_second_reference():
    """Alternating-occlusion content: some blocks must pick ref_idx 1
    (the two-frames-back reference) and the stream stays decodeable."""
    import jax.numpy as jnp

    from vvc_mm_tpu.common import inter_frame
    from vvc_mm_tpu.utils import xfer

    rng = np.random.default_rng(3)
    h, w = 64, 64
    base = rng.integers(40, 200, size=(h, w)).astype(np.int32)
    flash = base.copy()
    flash[16:48, 16:48] = 30          # occluder present only in frame 1
    f0, f1, f2 = base, flash, base    # frame 2 matches frame 0, not 1
    dev = xfer.upload_planes([f2, f2[::2, ::2] // 2, f2[::2, ::2] // 2], 8)
    r0 = xfer.upload_planes([f1, f1[::2, ::2] // 2, f1[::2, ::2] // 2], 8)
    r1 = xfer.upload_planes([f0, f0[::2, ::2] // 2, f0[::2, ::2] // 2], 8)
    col = jnp.zeros((h // 16, w // 16, 2), jnp.int32)
    out = inter_frame.search_p_frame_2ref(dev[0], r0[0], r1[0], col, 32,
                                          16, 8, 8, False)
    ref_h = np.asarray(out[0])
    assert (ref_h == 1).any()         # occluded blocks prefer ref 1


def test_2ref_tmvp_amvr_roundtrip_bitexact():
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 6, motion=(4.0, 1.5))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, merge=True, max_num_ref=2,
                 tmvp=True, amvr=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_2ref_ra_anchor_roundtrip_bitexact():
    """RA: GOP-anchor P frames reference the previous TWO anchors."""
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 13, motion=(3.0, 1.0))
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="RA",
                 gop_size=4, inter_block_size=16, merge=True,
                 max_num_ref=2)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_merge_mm_p_roundtrip_bitexact():
    """MM P slices with merge: candidates carry (model, mv) — model
    inheritance through the merge list (reference: UnitTools.cpp:872-885)."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 4, motion=(3.0, 1.0))
    mm = MMConfig(mpa=True, rot=True,
                  projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, merge=True, mm=mm, wrap_around=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_merge_mm_ra_roundtrip_bitexact():
    """MM RA GOP: merge-coded P anchors + (non-merge) MM B slices in one
    stream decode bit-exactly."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(3.0, 1.0))
    mm = MMConfig(mpa=True, projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="RA",
                 gop_size=4, inter_block_size=16, merge=True, mm=mm,
                 wrap_around=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_merge_saves_bits_on_coherent_motion():
    """Global translation: neighbor MVs are perfect predictors, so merge
    coding must not lose to the AMVP-only coder and merge-coded blocks
    must dominate the frame (VERDICT round-4 acceptance check)."""
    import jax.numpy as jnp

    from vvc_mm_tpu.common import inter_frame, quant
    from vvc_mm_tpu.encoder.inter_coder import select_merge_p
    from vvc_mm_tpu.utils import xfer

    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 6, motion=(5.0, 2.0))
    base = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=32,
                         gop="LDP", inter_block_size=16, merge=False))
    base.encode_sequence(frames)
    m = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=32,
                      gop="LDP", inter_block_size=16, merge=True))
    m.encode_sequence(frames)
    sb, sm = base.summary(), m.summary()
    assert sm["bits"] <= sb["bits"]
    assert sm["psnr_y"] > sb["psnr_y"] - 0.15
    # merge-coded blocks dominate a coherent-motion P frame
    dev = xfer.upload_planes(frames[1], 8)
    rdev = xfer.upload_planes(frames[0], 8)
    col = jnp.zeros((fmt.height // 16, fmt.width // 16, 2), jnp.int32)
    out = inter_frame.search_p_frame(dev[0], rdev[0], col, 32, 16, 8, 24,
                                     False)
    mvs_h, _, sad_h, cmv_h, csad_h = xfer.pull_i32(*out)
    lam_sqrt = quant.lambda_from_qp(32, intra=False) ** 0.5
    _, mflag, _ = select_merge_p(mvs_h, sad_h, cmv_h, csad_h, None,
                                 lam_sqrt, False, 0)
    assert mflag.mean() > 0.5


def test_mm_qt_composition_roundtrip():
    """--MPA --QTDepth composition: per-node model choice inside the
    quadtree lattice (reference: EncCu.cpp:775-798 per-model loop in the
    QTMT recursion)."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 4, motion=(3.0, 1.0))
    mm = MMConfig(mpa=True, projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=32, gop="LDP",
                 inter_block_size=16, qt_depth=1, mm=mm, wrap_around=True)
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    assert len(out) == len(frames)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_mm_qt_tree_beats_fixed_grid():
    """The MM tree must not lose to the fixed MM grid in RD (bits at
    comparable PSNR) on ERP content."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID

    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 4, motion=(4.0, 1.5))
    mm = MMConfig(mpa=True, rot=True,
                  projection=ProjectionID.EQUIRECTANGULAR)
    flat = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=37,
                         gop="LDP", inter_block_size=16, mm=mm,
                         wrap_around=True))
    flat.encode_sequence(frames)
    tree = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=37,
                         gop="LDP", inter_block_size=16, qt_depth=1,
                         mm=mm, wrap_around=True))
    tree.encode_sequence(frames)
    sf, st = flat.summary(), tree.summary()
    # RD check: either fewer bits at >= similar PSNR, or better PSNR at
    # <= similar bits
    assert (st["bits"] <= sf["bits"] * 1.02
            and st["psnr_y"] >= sf["psnr_y"] - 0.1) or \
           (st["psnr_y"] >= sf["psnr_y"] and st["bits"] <= sf["bits"] * 1.1)


def test_full_mm_mmmvp_roundtrip():
    """The BASELINE.md config-4 toolset (MPA+GED+ROT+MMMVP, signaled
    epipole) — regression for the near-pole MVP-conversion overflow."""
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.common.typedefs import ProjectionID

    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 5, motion=(3.0, 1.0))
    mm = MMConfig(mpa=True, ged=True, rot=True, mmmvp=True,
                  projection=ProjectionID.EQUIRECTANGULAR)
    cfg = EncCfg(width=fmt.width, height=fmt.height, qp=37, gop="RA",
                 gop_size=4, mm=mm, wrap_around=True,
                 epipoles=[(1, 0, 0.0, 0.0, 1.0)])
    enc = EncLib(cfg)
    stream = enc.encode_sequence(frames)
    out = DecLib().decode_bytes(stream)
    for f, res in zip(out, enc.results):
        assert _md5(f.planes) == _md5(res.recon), f.poc


def test_classic_qt_tree_beats_fixed_grid():
    """The classic (non-MM) quadtree must not lose RD to the fixed grid
    (reference: EncCu.cpp:1118 xCheckModeSplit — an RD-correct tree can
    at worst tie the uniform grid)."""
    fmt = VideoFormat(128, 64, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 4, motion=(4.0, 1.5))
    flat = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=37,
                         gop="LDP", inter_block_size=16, merge=True))
    flat.encode_sequence(frames)
    tree = EncLib(EncCfg(width=fmt.width, height=fmt.height, qp=37,
                         gop="LDP", inter_block_size=16, qt_depth=1,
                         merge=True))
    tree.encode_sequence(frames)
    sf, st = flat.summary(), tree.summary()
    assert (st["bits"] <= sf["bits"] * 1.02
            and st["psnr_y"] >= sf["psnr_y"] - 0.1) or \
           (st["psnr_y"] >= sf["psnr_y"] and st["bits"] <= sf["bits"] * 1.1)
