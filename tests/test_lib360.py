"""360 metrics + geometry conversion tests."""
import numpy as np
import pytest

from vvc_mm_tpu.lib360 import geometry, metrics


def test_ws_psnr_identical_is_high(rng):
    p = rng.integers(0, 256, size=(64, 128)).astype(np.int32)
    assert float(metrics.ws_psnr(p, p)) > 90
    q = np.clip(p + rng.integers(-3, 4, size=p.shape), 0, 255)
    v = float(metrics.ws_psnr(p, q))
    assert 35 < v < 60


def test_ws_psnr_weights_poles_less(rng):
    """Equator-band noise must hurt WS-PSNR more than pole-band noise of
    the same magnitude (the whole point of WS weighting)."""
    p = rng.integers(0, 256, size=(64, 128)).astype(np.int32)
    eq = p.copy(); eq[30:34] = np.clip(eq[30:34] + 8, 0, 255)
    po = p.copy(); po[0:4] = np.clip(po[0:4] + 8, 0, 255)
    assert float(metrics.ws_psnr(p, eq)) < float(metrics.ws_psnr(p, po))


def test_s_psnr_and_cpp_reasonable(rng):
    p = rng.integers(0, 256, size=(64, 128)).astype(np.int32)
    q = np.clip(p + rng.integers(-2, 3, size=p.shape), 0, 255)
    m = metrics.metrics_360(p, q)
    assert 35 < m["s_psnr_nn"] < 65
    assert 35 < m["cpp_psnr"] < 65


def test_erp_cmp_roundtrip(rng):
    """ERP -> CMP -> ERP must come back close (smooth content)."""
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    p = (128 + 80 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.int32)
    cmp_img = geometry.geo_convert(p, "erp", "cmp", (64, 96), "lanczos2")
    assert cmp_img.shape == (64, 96)
    back = geometry.geo_convert(cmp_img, "cmp", "erp", (h, w), "lanczos2")
    # exclude pole rows (extreme ERP stretch)
    err = np.abs(back[8:-8].astype(np.int64) - p[8:-8])
    assert err.mean() < 6.0, err.mean()


def test_eac_differs_from_cmp(rng):
    h, w = 64, 128
    p = rng.integers(0, 256, size=(h, w)).astype(np.int32)
    a = geometry.geo_convert(p, "erp", "cmp", (64, 96), "bilinear")
    b = geometry.geo_convert(p, "erp", "eac", (64, 96), "bilinear")
    assert not np.array_equal(a, b)


def test_viewport_render(rng):
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    p = ((xx * 2) % 256).astype(np.int32)
    vp = geometry.render_viewport(p, 32, 32, fov_deg=90, yaw_deg=45)
    assert vp.shape == (32, 32)
    assert vp.min() >= 0 and vp.max() <= 255


def test_cmp_dirs_unit_norm():
    d = geometry.cmp_dirs(96, 64)
    n = np.linalg.norm(d, axis=-1)
    assert np.allclose(n, 1.0, atol=1e-6)


def test_new_geometry_inverses():
    """coords(dirs(w,h)) must reproduce the pixel grid (projection and
    inverse are mutually consistent) for every added format."""
    from vvc_mm_tpu.lib360 import geometry as g
    cases = {"eap": (64, 32), "cpp": (64, 32), "fisheye": (32, 32),
             "acp": (48, 32), "cmp": (48, 32), "eac": (48, 32)}
    for name, (w, h) in cases.items():
        dirs_fn, coords_fn = g.GEOMETRIES[name]
        dirs = dirs_fn(w, h)
        xy = coords_fn(dirs, w, h)
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        if name == "cpp":
            # skip the inactive area outside the parabola
            m = np.abs(xy[..., 0] - xx) < 1.0
            assert m.mean() > 0.6, name   # parabola covers ~2/3 of the frame
            err_y = np.abs(xy[..., 1] - yy)[m].max()
            assert err_y < 0.51, (name, err_y)
        elif name == "fisheye":
            # only the image circle r <= 1 is active
            u = 2.0 * (xx + 0.5) / w - 1.0
            v = 2.0 * (yy + 0.5) / h - 1.0
            m = u * u + v * v < 0.98
            err = np.abs(np.stack([xx, yy], -1) - xy)[m].max()
            assert err < 0.51, (name, err)
        else:
            err = np.abs(np.stack([xx, yy], -1) - xy).max()
            assert err < 0.51, (name, err)


def test_geo_convert_roundtrip_new_formats():
    """ERP -> fmt -> ERP keeps smooth content (energy preserved)."""
    from vvc_mm_tpu.lib360 import geometry as g
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    plane = (128 + 90 * np.sin(2 * np.pi * xx / w)
             * np.cos(np.pi * (yy + 0.5 - h / 2) / h)).astype(np.int32)
    for fmt, size in (("eap", (64, 128)), ("acp", (64, 96)),
                      ("cpp", (64, 128))):
        conv = g.geo_convert(plane, "erp", fmt, size, method="bilinear")
        back = g.geo_convert(conv, fmt, "erp", (h, w), method="bilinear")
        # interior rows (poles are lossy under any projection resample)
        a = plane[8:-8].astype(np.float64)
        b = back[8:-8].astype(np.float64)
        rmse = np.sqrt(((a - b) ** 2).mean())
        assert rmse < 12.0, (fmt, rmse)


def test_round2_geometry_inverses():
    """Inverse consistency for the round-2 formats (SSP/ECP/RSP/HEC/GCMP/
    AEP).  Disk/segmented formats are checked only on their active areas."""
    from vvc_mm_tpu.lib360 import geometry as g
    w, h = 48, 32
    for name in ("aep", "hec", "gcmp", "rsp", "ssp", "ecp"):
        dirs_fn, coords_fn = g.GEOMETRIES[name]
        dirs = dirs_fn(w, h)
        assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                           atol=1e-6), name
        xy = coords_fn(dirs, w, h)
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        err = np.abs(np.stack([xx, yy], -1) - xy)
        if name in ("ssp", "ecp"):
            # pole disks: the frame corners outside the disk are inactive;
            # restrict to pixels whose round trip stays in the same face
            f = w // 3
            fx, fy = xx // f, yy // f
            fx2 = np.clip(xy[..., 0].round(), 0, w - 1).astype(int) // f
            fy2 = np.clip(xy[..., 1].round(), 0, h - 1).astype(int) // f
            m = (fx == fx2) & (fy == fy2)
            assert m.mean() > 0.7, name
            assert err[m].max() < 0.75, (name, err[m].max())
        elif name == "rsp":
            # segment boundary pixels may resolve to the twin segment
            m = err[..., 0] < 1.0
            assert m.mean() > 0.85, name
            assert err[..., 1][m].max() < 0.75, name
        else:
            assert err.max() < 0.51, (name, err.max())


def test_round2_geo_convert_roundtrip():
    from vvc_mm_tpu.lib360 import geometry as g
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    plane = (128 + 90 * np.sin(2 * np.pi * xx / w)
             * np.cos(np.pi * (yy + 0.5 - h / 2) / h)).astype(np.int32)
    for fmt, size in (("aep", (64, 128)), ("hec", (64, 96)),
                      ("gcmp", (64, 96)), ("rsp", (64, 96)),
                      ("ssp", (64, 96)), ("ecp", (64, 96))):
        conv = g.geo_convert(plane, "erp", fmt, size, method="bilinear")
        back = g.geo_convert(conv, fmt, "erp", (h, w), method="bilinear")
        a = plane[10:-10].astype(np.float64)
        b = back[10:-10].astype(np.float64)
        rmse = np.sqrt(((a - b) ** 2).mean())
        assert rmse < 16.0, (fmt, rmse)


def test_s_psnr_i_and_viewport_and_msssim(rng):
    from vvc_mm_tpu.lib360 import metrics as mt
    h, w = 64, 128
    orig = rng.integers(0, 255, (h, w)).astype(np.int32)
    noisy = np.clip(orig + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.int32)
    ident = mt.s_psnr_i(orig, orig)
    assert float(ident) > 60
    v = float(mt.s_psnr_i(orig, noisy))
    assert 25 < v < 50
    vp_same = mt.viewport_psnr(orig, orig)
    vp_noisy = mt.viewport_psnr(orig, noisy)
    assert vp_same > vp_noisy > 20
    assert mt.ms_ssim(orig, orig) > 0.999
    smooth = np.clip(orig + 2, 0, 255)
    assert mt.ms_ssim(orig, smooth) > mt.ms_ssim(orig, noisy) > 0.3
    m = mt.metrics_360(orig, noisy, viewport=True)
    assert set(m) >= {"ws_psnr", "s_psnr_nn", "s_psnr_i", "cpp_psnr",
                      "viewport_psnr"}


def test_round3_geometry_inverses():
    """OHP / ISP / TSP inverse consistency (reference: TOctahedron /
    TIcosahedron / TTsp map2DTo3D <-> map3DTo2D)."""
    from vvc_mm_tpu.lib360 import geometry as g
    for name, (w, h) in (("ohp", (64, 16)), ("isp", (80, 32)),
                         ("tsp", (64, 32))):
        dirs_fn, coords_fn = g.GEOMETRIES[name]
        dirs = dirs_fn(w, h)
        assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0,
                           atol=1e-6), name
        xy = coords_fn(dirs, w, h)
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        err = np.abs(np.stack([xx, yy], -1) - xy)
        if name in ("ohp", "isp"):
            # triangle-pair diagonals: a pixel straddling the shared edge
            # may resolve to its twin; demand a large consistent majority
            m = err.max(-1) < 0.51
            assert m.mean() > 0.9, (name, m.mean())
        else:
            assert err.max() < 0.51, (name, err.max())


def test_round3_geo_convert_roundtrip():
    from vvc_mm_tpu.lib360 import geometry as g
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    plane = (128 + 90 * np.sin(2 * np.pi * xx / w)
             * np.cos(np.pi * (yy + 0.5 - h / 2) / h)).astype(np.int32)
    for fmt, size in (("ohp", (32, 128)), ("isp", (64, 160)),
                      ("tsp", (48, 96))):
        conv = g.geo_convert(plane, "erp", fmt, size, method="bilinear")
        back = g.geo_convert(conv, fmt, "erp", (h, w), method="bilinear")
        a = plane[10:-10].astype(np.float64)
        b = back[10:-10].astype(np.float64)
        rmse = np.sqrt(((a - b) ** 2).mean())
        assert rmse < 16.0, (fmt, rmse)


def test_hcmp_geometry_inverse():
    """HCMP hemisphere cubemap (reference: THCMP.cpp): pixel -> direction
    -> pixel is consistent over the active (front-hemisphere) region."""
    from vvc_mm_tpu.lib360 import geometry as g
    w, h = 48, 32
    dirs = g.hcmp_dirs(w, h)
    assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)
    assert dirs[..., 0].min() >= -1e-9          # hemisphere: x >= 0
    xy = g.hcmp_coords(dirs, w, h)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    err = np.abs(np.stack([xx, yy], -1) - xy).max(-1)
    active = dirs[..., 0] > 1e-6                 # skip clamped boundary
    assert (err[active] < 0.51).mean() > 0.9


def test_hcmp_erp_roundtrip():
    from vvc_mm_tpu.lib360 import geometry as g
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    plane = (128 + 90 * np.sin(2 * np.pi * xx / w)
             * np.cos(np.pi * (yy + 0.5 - h / 2) / h)).astype(np.int32)
    conv = g.geo_convert(plane, "erp", "hcmp", (32, 48), method="bilinear")
    back = g.geo_convert(conv, "hcmp", "erp", (h, w), method="bilinear")
    # compare only the front hemisphere (x >= 0 <-> |phi| < pi/2: the ERP
    # column band around the centre)
    d = g.erp_dirs(w, h)
    m = d[10:-10, :, 0] > 0.15
    a = plane[10:-10].astype(np.float64)[m]
    b = back[10:-10].astype(np.float64)[m]
    rmse = np.sqrt(((a - b) ** 2).mean())
    assert rmse < 20.0, rmse
