"""Bjontegaard harness math (apps/bd_rate.py)."""
import numpy as np
import pytest

from vvc_mm_tpu.apps.bd_rate import bd_psnr, bd_rate

pytestmark = pytest.mark.smoke


def test_bd_rate_known_shift():
    """A curve identical but shifted -10% in rate => BD-rate ~ -10%."""
    p = np.array([30.0, 33.0, 36.0, 39.0])
    r1 = np.array([1000.0, 2000.0, 4000.0, 8000.0])
    r2 = r1 * 0.9
    assert abs(bd_rate(r1, p, r2, p) - (-10.0)) < 0.2
    assert bd_rate(r1, p, r1, p) == pytest.approx(0.0, abs=1e-9)


def test_bd_psnr_known_shift():
    """A curve identical but +0.5 dB => BD-PSNR ~ +0.5."""
    r = np.array([1000.0, 2000.0, 4000.0, 8000.0])
    p1 = np.array([30.0, 33.0, 36.0, 39.0])
    p2 = p1 + 0.5
    assert abs(bd_psnr(r, p1, r, p2) - 0.5) < 0.05


def test_bd_rate_disjoint_ranges_nan():
    p1 = np.array([30.0, 31.0, 32.0])
    p2 = np.array([40.0, 41.0, 42.0])
    r = np.array([1000.0, 2000.0, 4000.0])
    assert np.isnan(bd_rate(r, p1, r, p2))
