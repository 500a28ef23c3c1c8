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
