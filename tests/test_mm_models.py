"""Motion-model geometry tests: projections, the five models, reprojection.

Invariants checked against the reference's definitions (reference:
Projection.cpp, MotionModels/*.cpp, MVReprojection.cpp — see docstrings in
vvc_mm_tpu/common/mm/)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from vvc_mm_tpu.common.mm import mc, models, reprojection
from vvc_mm_tpu.common.mm.epipole import EpipoleList
from vvc_mm_tpu.common.typedefs import MotionModelID as M
from vvc_mm_tpu.lib360.projection import ERP, Perspective

W, H = 128, 64


@pytest.fixture(scope="module")
def erp():
    return ERP(W, H)


@pytest.fixture(scope="module")
def reproj(erp):
    return reprojection.MVReprojection(erp, W, H, offset4x4_code=1)


def test_erp_roundtrip(erp):
    xs = jnp.asarray(np.linspace(1, W - 2, 13, dtype=np.float32))
    ys = jnp.asarray(np.linspace(1, H - 2, 13, dtype=np.float32))
    cx, cy, cz = erp.to_sphere(xs, ys)
    r = np.asarray(cx) ** 2 + np.asarray(cy) ** 2 + np.asarray(cz) ** 2
    assert np.allclose(r, 1.0, atol=1e-5)
    x2, y2 = erp.from_sphere(cx, cy, cz)
    assert np.allclose(np.asarray(x2), np.asarray(xs), atol=1e-3)
    assert np.allclose(np.asarray(y2), np.asarray(ys), atol=1e-3)


def test_perspective_roundtrip_with_vip():
    persp = Perspective(focal=50.0)
    # points on the sphere, both hemispheres
    phis = np.linspace(-3, 3, 11, dtype=np.float32)
    thetas = np.linspace(0.2, 2.9, 11, dtype=np.float32)
    from vvc_mm_tpu.lib360.projection import spherical_to_cartesian
    cx, cy, cz = spherical_to_cartesian(1.0, jnp.asarray(thetas),
                                        jnp.asarray(phis))
    px, py, vip = persp.from_sphere(cx, cy, cz)
    bx, by, bz = persp.to_sphere(px, py, vip)
    assert np.allclose(np.asarray(bx), np.asarray(cx), atol=1e-4)
    assert np.allclose(np.asarray(by), np.asarray(cy), atol=1e-4)
    assert np.allclose(np.asarray(bz), np.asarray(cz), atol=1e-4)


@pytest.mark.parametrize("model_id", [M.MPA_FRONT_BACK, M.MPA_LEFT_RIGHT,
                                      M.MPA_TOP_BOTTOM])
def test_mpa_zero_mv_identity(erp, model_id):
    gx = jnp.asarray(np.linspace(2, W - 3, 9, dtype=np.float32))
    gy = jnp.asarray(np.linspace(2, H - 3, 9, dtype=np.float32))
    ox, oy = models.mpa_motion(erp, model_id, gx, gy, 0.0, 0.0)
    assert np.allclose(np.asarray(ox), np.asarray(gx), atol=2e-3)
    assert np.allclose(np.asarray(oy), np.asarray(gy), atol=2e-3)


def test_ged_rotation_matrix_aligns_epipole():
    for e in ([1, 0, 0], [0, 1, 0], [0, 0, 1], [0.3, -0.5, 0.8]):
        r = models.ged_rotation_matrix(np.array(e, dtype=np.float64))
        en = np.asarray(e) / np.linalg.norm(e)
        pole = r @ en
        assert np.allclose(pole, [0, 0, 1], atol=1e-6), e


@pytest.mark.parametrize("model_id", [M.MPA_FRONT_BACK, M.THREE_D_TRANSLATIONAL,
                                      M.TANGENTIAL, M.ROTATIONAL,
                                      M.GEODESIC_AXIS_Z])
def test_mv_for_shift_inverts_model(reproj, model_id):
    """Forward-map a point with a known MV, then recover the MV via the
    closed-form inverse (the MM-MVP conversion primitive)."""
    erp = reproj.proj
    px = jnp.asarray([40.0, 70.0, 100.0], dtype=jnp.float32)
    py = jnp.asarray([20.0, 32.0, 40.0], dtype=jnp.float32)
    cx, cy = px, py            # conversion at the block center itself
    mvx, mvy = 3.0, -2.0
    sx, sy = reproj._model_motion_pointwise(model_id, px, py, mvx, mvy,
                                            cx, cy, None)
    rx, ry = reproj._mv_for_shift(model_id, px, py, sx, sy, cx, cy, None)
    assert np.allclose(np.asarray(rx), mvx, atol=0.05), model_id
    assert np.allclose(np.asarray(ry), mvy, atol=0.05), model_id


def test_reproject_classic_matches_integer_path(reproj):
    mvs = jnp.asarray(np.array(
        [[[16, -32], [8, 4], [0, 0], [5, 7]],
         [[0, 0], [-24, 40], [1, -1], [-3, 2]]], dtype=np.int32))
    fixed = reproj.reproject_frame(M.CLASSIC, mvs, block_size=32)
    exact = mc.classic_positions(reproj.offset, W, H, mvs, 32)
    assert np.array_equal(np.asarray(fixed), np.asarray(exact))


def test_reproject_mpa_zero_mv_is_identity_positions(reproj):
    mvs = jnp.zeros((H // 16, W // 16, 2), dtype=jnp.int32)
    fixed = np.asarray(reproj.reproject_frame(M.MPA_FRONT_BACK, mvs, 16))
    base = np.asarray(mc.classic_positions(reproj.offset, W, H,
                                           mvs, 16))
    # zero MV must stay within a rounding step of the identity grid
    assert np.abs(fixed - base).max() <= 1


def test_mm_mc_zero_motion_copies_reference(rng):
    ref = rng.integers(0, 256, size=(H, W)).astype(np.int32)
    from vvc_mm_tpu.common.inter_frame import pad_ref
    refp = pad_ref(jnp.asarray(ref), 32)
    mvs = jnp.zeros((H // 16, W // 16, 2), dtype=jnp.int32)
    pos = mc.classic_positions(1.0, W, H, mvs, 16)
    out = mc.mc_luma_positions(refp, pos, 32)
    assert np.array_equal(np.asarray(out), ref)


def test_mm_mc_matches_block_mc_on_translation(rng):
    """Position-based subblock MC must equal the block-level classic MC for
    a pure translation (same filters, same math)."""
    from vvc_mm_tpu.common import inter_frame
    ref = rng.integers(0, 256, size=(H, W)).astype(np.int32)
    refp = inter_frame.pad_ref(jnp.asarray(ref), inter_frame.MC_MARGIN)
    nby, nbx = H // 16, W // 16
    mvs = jnp.asarray(rng.integers(-40, 40, size=(nby, nbx, 2)),
                      dtype=jnp.int32)
    pos = mc.classic_positions(1.0, W, H, mvs, 16)
    out_pos = np.asarray(mc.mc_luma_positions(refp, pos,
                                              inter_frame.MC_MARGIN))
    pred_y, _, _ = inter_frame.mc_predict(
        jnp.asarray(ref), jnp.asarray(ref[::2, ::2].copy()),
        jnp.asarray(ref[::2, ::2].copy()), mvs, 16, 8)
    assert np.array_equal(out_pos, np.asarray(pred_y))


def test_epipole_list_fallbacks():
    el = EpipoleList(global_epipole=(0, 0, 1))
    assert np.allclose(el.find_epipole(5, 4), [0, 0, 1])
    el.set_epipole(5, 4, (1, 0, 0))
    assert np.allclose(el.find_epipole(5, 4), [1, 0, 0])
    assert np.allclose(el.find_epipole(5, 3), [1, 0, 0])   # per-POC fallback
    assert np.allclose(el.find_epipole(6, 5), [0, 0, 1])   # global
    el.set_epipole(8, 7, (0, 1, 0))
    pred = el.derive_predictor(6, 5)
    assert pred.shape == (3,)


def test_lookup_table_and_calibrated_projection():
    """LookupTable forward/inverse (reference: LookupTable.h) and the
    calibrated polynomial radial projection (reference: Projection.h:78
    CalibratedProjection) round-trip through the sphere."""
    import numpy as np
    from vvc_mm_tpu.lib360.projection import Calibrated, LookupTable

    lut = LookupTable(lambda t: 2.0 * t + 0.5 * t * t, (0.0, 2.0), 512)
    xs = np.linspace(0.1, 1.9, 7)
    np.testing.assert_allclose(np.asarray(lut.lookup(xs)),
                               2.0 * xs + 0.5 * xs * xs, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lut.inverse_lookup(lut.lookup(xs))), xs, atol=1e-3)

    proj = Calibrated((0.0, 300.0, 20.0), cx=200.0, cy=150.0)
    px = np.array([200.0, 260.0, 120.0, 300.0])
    py = np.array([150.0, 190.0, 100.0, 60.0])
    sx, sy, sz = proj.to_sphere(px, py)
    n = np.sqrt(np.asarray(sx) ** 2 + np.asarray(sy) ** 2
                + np.asarray(sz) ** 2)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    bx, by = proj.from_sphere(sx, sy, sz)
    np.testing.assert_allclose(np.asarray(bx), px, atol=0.1)
    np.testing.assert_allclose(np.asarray(by), py, atol=0.1)


def test_reprojection_lut_matches_direct():
    """ReprojectionLUT bilinear cache agrees with the direct map on and
    off grid points (reference: ReprojectionLUT.h)."""
    import numpy as np
    from vvc_mm_tpu.common.mm.reprojection import ReprojectionLUT

    def fn(x, y):
        return x * 0.5 + y * 0.25, y * 2.0 - x * 0.125

    lut = ReprojectionLUT(fn, (-16, 16), (-8, 8), step=1.0)
    xs = np.array([-15.0, -3.5, 0.0, 2.25, 15.5])
    ys = np.array([-7.0, 1.5, 0.0, -2.75, 7.5])
    u, v = lut(xs, ys)
    eu, ev = fn(xs, ys)
    np.testing.assert_allclose(u, eu, atol=1e-9)   # fn is bilinear-exact
    np.testing.assert_allclose(v, ev, atol=1e-9)
