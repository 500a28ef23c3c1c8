"""Multi-device sharding: sharded-vs-unsharded bit-exactness on the
8-device virtual CPU mesh (conftest forces it; SURVEY.md 2.8/2.9 —
frame-parallel intra, row-sharded P/B/MM inter)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vvc_mm_tpu.common import inter_frame, wavefront
from vvc_mm_tpu.common.typedefs import ChromaFormat, ProjectionID
from vvc_mm_tpu.parallel import sharding
from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence


def _mesh():
    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    return sharding.make_mesh(n)


def test_frame_parallel_intra_bitexact():
    mesh = _mesh()
    n = mesh.size
    fmt = VideoFormat(64, 32, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, n)
    with mesh:
        _, recon = sharding.encode_frames_sharded(frames, qp=32, mesh=mesh)
    for i, f in enumerate(frames):
        _, ref = wavefront.encode_intra_frame(
            jnp.asarray(f[0]), jnp.asarray(f[1]), jnp.asarray(f[2]), 32, 8,
            8)
        assert np.array_equal(np.asarray(recon["y"][i]),
                              np.asarray(ref["y"])), i
        assert np.array_equal(np.asarray(recon["u"][i]),
                              np.asarray(ref["u"]))


def test_row_sharded_p_bitexact():
    mesh = _mesh()
    n = mesh.size
    fmt = VideoFormat(64, 32 * n, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2, motion=(3.0, 1.0))
    with mesh:
        mvs, ly, lu, lv, recon = sharding.encode_p_frame_sharded(
            frames[1], frames[0], qp=32, mesh=mesh, search_range=8)
        jax.block_until_ready(recon["y"])
    ref = inter_frame.encode_p_frame(
        jnp.asarray(frames[1][0]), jnp.asarray(frames[1][1]),
        jnp.asarray(frames[1][2]), jnp.asarray(frames[0][0]),
        jnp.asarray(frames[0][1]), jnp.asarray(frames[0][2]), 32, 16, 8, 8,
        False)
    assert np.array_equal(np.asarray(recon["y"]), np.asarray(ref[4]["y"]))
    assert np.array_equal(np.asarray(mvs), np.asarray(ref[0]))


def test_row_sharded_b_bitexact():
    mesh = _mesh()
    n = mesh.size
    fmt = VideoFormat(64, 32 * n, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 3, motion=(3.0, 1.0))
    with mesh:
        mv0, mv1, dirs, levs, recon = sharding.encode_b_frame_sharded(
            frames[1], frames[0], frames[2], qp=32, mesh=mesh,
            search_range=8)
        jax.block_until_ready(recon["y"])
    r0 = tuple(jnp.asarray(p) for p in frames[0])
    r1 = tuple(jnp.asarray(p) for p in frames[2])
    oy, ou, ov = (jnp.asarray(p) for p in frames[1])
    emv0, emv1, edirs, egpm = inter_frame.search_b_frame(
        oy, r0[0], r1[0], 32, 16, 8, 8, False)
    ely, elu, elv, erecon = inter_frame.bpred_and_residual(
        oy, ou, ov, r0, r1, emv0, emv1, edirs, 32, 16, 8, False)
    assert np.array_equal(np.asarray(recon["y"]), np.asarray(erecon["y"]))
    assert np.array_equal(np.asarray(dirs), np.asarray(edirs))


def test_row_sharded_mm_p_bitexact():
    from vvc_mm_tpu.common.mm import frame_codec as mm_codec
    from vvc_mm_tpu.common.mm.reprojection import MVReprojection
    from vvc_mm_tpu.common.slice_ps import MMConfig
    from vvc_mm_tpu.lib360.projection import make_projection

    mesh = _mesh()
    n = mesh.size
    w, h = 64, 32 * n
    fmt = VideoFormat(w, h, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2, motion=(3.0, 1.0))
    mm = MMConfig(mpa=True, projection=ProjectionID.EQUIRECTANGULAR)
    proj = make_projection(int(mm.projection), w, h)
    reproj = MVReprojection(proj, w, h, mm.mm_offset_4x4, 1)
    active = mm.active_models()
    with mesh:
        midx, stack, levs, recon = sharding.encode_p_frame_mm_sharded(
            reproj, active, frames[1], frames[0], qp=32, mesh=mesh,
            search_range=8, wrap_around=True)
        jax.block_until_ready(recon["y"])
    # unsharded mirror
    oy, ou, ov = (jnp.asarray(p) for p in frames[1])
    ry, ru, rv = (jnp.asarray(p) for p in frames[0])
    emidx, estack = mm_codec.search_p_mm(reproj, active, oy, ry, 32, 16, 8,
                                         8, None, True)
    pos = mm_codec.merged_positions(reproj, active, emidx, estack, 16,
                                    None)
    ely, elu, elv, erecon = mm_codec.enc_finish_p_mm(
        emidx, estack, pos, oy, ou, ov, ry, ru, rv, 32, 16, 8, True, True)
    assert np.array_equal(np.asarray(recon["y"]), np.asarray(erecon["y"]))
    assert np.array_equal(np.asarray(midx), np.asarray(emidx))


def test_sharded_ref_halo_bit_exact():
    """Row-sharded reference with halo exchange (ppermute) must be
    BIT-EXACT with the unsharded encode — the 6K/multi-host memory
    scaling pattern (SURVEY.md §2.9 halo exchange)."""
    import jax.numpy as jnp

    from vvc_mm_tpu.common import inter_frame
    from vvc_mm_tpu.parallel.sharding import (encode_p_frame_sharded_ref,
                                              make_mesh)
    from vvc_mm_tpu.utils.yuv_io import VideoFormat, synthetic_sequence
    from vvc_mm_tpu.common.typedefs import ChromaFormat

    mesh = make_mesh(8)
    fmt = VideoFormat(64, 32 * 8, 8, ChromaFormat.C420)
    frames = synthetic_sequence(fmt, 2, motion=(3.0, 2.0))
    orig = [np.asarray(p) for p in frames[1]]
    ref = [np.asarray(p) for p in frames[0]]
    mvs, ly, lu, lv, rec = encode_p_frame_sharded_ref(
        orig, ref, qp=32, mesh=mesh, search_range=8, wrap_around=True)
    o = [jnp.asarray(p) for p in orig]
    r = [jnp.asarray(p) for p in ref]
    m2, y2, u2, v2, rec2 = inter_frame.encode_p_frame(
        *o, *r, 32, 16, 8, 8, True)
    np.testing.assert_array_equal(np.asarray(mvs), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(ly), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(lu), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(v2))
    for c in ("y", "u", "v"):
        np.testing.assert_array_equal(np.asarray(rec[c]),
                                      np.asarray(rec2[c]))
