"""Spherical quality metrics: WS-PSNR, S-PSNR-NN, CPP-PSNR — jitted.

TPU-native analog of the reference's 360Lib metric calculators (reference:
source/Lib/Lib360/TWSPSNRMetricCalc.{cpp,h} — WS-PSNR weights each ERP row
by cos(theta); TSPSNRMetricCalc — S-PSNR-NN samples a uniform sphere point
set with nearest-neighbor lookup; TCPPPSNRMetricCalc — PSNR in the
Craster parabolic projection domain; wired per-POC by TExt360EncGop,
EncGOP.cpp:4914 m_ext360.calculatePSNRs).

The reference reads its 655,362-point sphere file from
cfg-360Lib/360Lib/sphere_655362.txt (absent from the checkout,
.MISSING_LARGE_BLOBS); we generate an equivalent uniform sampling with a
Fibonacci lattice — metric values are comparable, not bit-identical to
360Lib's fixture.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _ws_weights(height: int) -> np.ndarray:
    """Per-row cos(theta) weights (reference: TWSPSNRMetricCalc ERP
    weights w(i) = cos((i + 0.5 - H/2) * pi / H))."""
    i = np.arange(height, dtype=np.float64)
    return np.cos((i + 0.5 - height / 2.0) * math.pi / height)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def ws_psnr(orig: jnp.ndarray, recon: jnp.ndarray, bit_depth: int = 8
            ) -> jnp.ndarray:
    """WS-PSNR of one ERP plane."""
    h, w = orig.shape
    wts = jnp.asarray(_ws_weights(h), dtype=jnp.float64)[:, None]
    d = (orig - recon).astype(jnp.float64)
    wse = jnp.sum(d * d * wts) / (jnp.sum(wts) * w)
    maxv = (1 << bit_depth) - 1
    return 10.0 * jnp.log10((maxv * maxv) / jnp.maximum(wse, 1e-10))


@functools.lru_cache(maxsize=None)
def fibonacci_sphere(n: int = 655362) -> np.ndarray:
    """Quasi-uniform sphere sampling (stand-in for sphere_655362.txt)."""
    i = np.arange(n, dtype=np.float64)
    golden = (1 + 5 ** 0.5) / 2
    z = 1 - 2 * (i + 0.5) / n
    theta = np.arccos(np.clip(z, -1, 1))
    phi = 2 * math.pi * i / golden
    return np.stack([theta, np.mod(phi + math.pi, 2 * math.pi) - math.pi],
                    axis=1)    # (n, 2): theta [0,pi], phi [-pi,pi]


@functools.lru_cache(maxsize=None)
def _sphere_to_erp_nn(n_points: int, width: int, height: int
                      ) -> np.ndarray:
    """Nearest-neighbor ERP sample indices for the sphere point set
    (reference: TSPSNRMetricCalc nearest-sample lookup)."""
    tp = fibonacci_sphere(n_points)
    # ERP mapping (reference Projection.cpp ERP): x = -phi/(2pi)*W, wrapped
    x = np.round(-tp[:, 1] / (2 * math.pi) * width - 0.5).astype(np.int64)
    y = np.round(tp[:, 0] / math.pi * height - 0.5).astype(np.int64)
    x = np.mod(x, width)
    y = np.clip(y, 0, height - 1)
    return y * width + x


@functools.partial(jax.jit, static_argnames=("bit_depth", "n_points"))
def s_psnr_nn(orig: jnp.ndarray, recon: jnp.ndarray, bit_depth: int = 8,
              n_points: int = 65536) -> jnp.ndarray:
    """S-PSNR-NN: PSNR over a uniform sphere sampling, nearest neighbor."""
    h, w = orig.shape
    idx = jnp.asarray(_sphere_to_erp_nn(n_points, w, h))
    d = (orig.reshape(-1)[idx] - recon.reshape(-1)[idx]).astype(jnp.float64)
    mse = jnp.mean(d * d)
    maxv = (1 << bit_depth) - 1
    return 10.0 * jnp.log10((maxv * maxv) / jnp.maximum(mse, 1e-10))


@functools.lru_cache(maxsize=None)
def _cpp_map(width: int, height: int) -> tuple[np.ndarray, np.ndarray]:
    """ERP -> Craster parabolic projection sample map + validity mask
    (reference: TCPPPSNRMetricCalc::sphToCart / createTable)."""
    xx, yy = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    x = (xx + 0.5) / width * 2 - 1            # [-1, 1]
    y = ((yy + 0.5) / height * 2 - 1)         # [-1, 1]
    # inverse Craster: lat from parabolic y, lon from x
    lat = 3 * np.arcsin(np.clip(y, -1, 1) / 2)  # actually 3*asin(y/3)? use
    lat = 3.0 * np.arcsin(np.clip(y / 2.0, -1, 1) * 2 / 3.0)
    valid = np.abs(lat) <= math.pi / 2
    lon = math.pi * x / (2 * np.cos(2 * lat / 3) - 1 + 1e-12)
    valid &= np.abs(lon) <= math.pi
    theta = math.pi / 2 - lat
    phi = -lon
    sx = np.mod(np.round(-phi / (2 * math.pi) * width - 0.5), width)
    sy = np.clip(np.round(theta / math.pi * height - 0.5), 0, height - 1)
    return (sy.astype(np.int64) * width + sx.astype(np.int64),
            valid)


@functools.partial(jax.jit, static_argnames=("bit_depth",))
def cpp_psnr(orig: jnp.ndarray, recon: jnp.ndarray, bit_depth: int = 8
             ) -> jnp.ndarray:
    """CPP-PSNR: PSNR in the equal-area Craster parabolic domain."""
    h, w = orig.shape
    idx, valid = _cpp_map(w, h)
    idx = jnp.asarray(idx)
    mask = jnp.asarray(valid).reshape(-1)
    d = (orig.reshape(-1)[idx.reshape(-1)]
         - recon.reshape(-1)[idx.reshape(-1)]).astype(jnp.float64)
    mse = jnp.sum(d * d * mask) / jnp.maximum(jnp.sum(mask), 1)
    maxv = (1 << bit_depth) - 1
    return 10.0 * jnp.log10((maxv * maxv) / jnp.maximum(mse, 1e-10))


@functools.lru_cache(maxsize=None)
def _sphere_to_erp_bilin(n_points: int, width: int, height: int):
    """Continuous ERP coordinates + bilinear weights for the sphere point
    set (reference: TSPSNRIMetricCalc — S-PSNR-I interpolates instead of
    snapping to the nearest sample)."""
    tp = fibonacci_sphere(n_points)
    x = -tp[:, 1] / (2 * math.pi) * width - 0.5
    y = tp[:, 0] / math.pi * height - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = (x - x0).astype(np.float32)
    fy = (y - y0).astype(np.float32)
    idx = []
    for dy in (0, 1):
        for dx in (0, 1):
            xi = np.mod(x0 + dx, width)
            yi = np.clip(y0 + dy, 0, height - 1)
            idx.append(yi * width + xi)
    return np.stack(idx), fx, fy


@functools.partial(jax.jit, static_argnames=("bit_depth", "n_points"))
def s_psnr_i(orig: jnp.ndarray, recon: jnp.ndarray, bit_depth: int = 8,
             n_points: int = 65536) -> jnp.ndarray:
    """S-PSNR-I: PSNR over a uniform sphere sampling with bilinear
    interpolation (reference: TSPSNRIMetricCalc.cpp)."""
    h, w = orig.shape
    idx_np, fx_np, fy_np = _sphere_to_erp_bilin(n_points, w, h)
    idx = jnp.asarray(idx_np)
    fx = jnp.asarray(fx_np)
    fy = jnp.asarray(fy_np)
    wts = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                     (1 - fx) * fy, fx * fy])

    def interp(plane):
        flat = plane.reshape(-1).astype(jnp.float32)
        return jnp.sum(flat[idx] * wts, axis=0)

    d = (interp(orig) - interp(recon)).astype(jnp.float64)
    mse = jnp.mean(d * d)
    maxv = (1 << bit_depth) - 1
    return 10.0 * jnp.log10((maxv * maxv) / jnp.maximum(mse, 1e-10))


# default dynamic-viewport trajectory (reference: TViewPortPSNR — the CTC
# uses two 75x75-degree viewports; yaw drifts over the sequence)
DEFAULT_VIEWPORTS = ((0.0, 0.0), (-90.0, 0.0))


def viewport_psnr(orig: np.ndarray, recon: np.ndarray, bit_depth: int = 8,
                  fov_deg: float = 75.0, size: tuple[int, int] = (128, 128),
                  viewports=DEFAULT_VIEWPORTS) -> float:
    """Viewport PSNR: render rectilinear viewports from both ERP planes and
    average their PSNR (reference: TViewPortPSNR.cpp)."""
    from .geometry import render_viewport
    from ..common.picture import psnr as plane_psnr
    vals = []
    for (yaw, pitch) in viewports:
        vo = render_viewport(orig, size[1], size[0], fov_deg, yaw, pitch,
                             method="bilinear")
        vr = render_viewport(recon, size[1], size[0], fov_deg, yaw, pitch,
                             method="bilinear")
        vals.append(plane_psnr(vo, vr, bit_depth))
    return float(np.mean(vals))


def _ssim(a: np.ndarray, b: np.ndarray, maxv: float):
    """Single-scale SSIM + contrast-structure (cs) with an 11x11 separable
    Gaussian window — numpy, float64."""
    from scipy.ndimage import convolve1d
    sigma, rad = 1.5, 5
    xs = np.arange(-rad, rad + 1, dtype=np.float64)
    k = np.exp(-(xs * xs) / (2 * sigma * sigma))
    k /= k.sum()

    def filt(x):
        return convolve1d(convolve1d(x, k, axis=0, mode="reflect"),
                          k, axis=1, mode="reflect")

    c1 = (0.01 * maxv) ** 2
    c2 = (0.03 * maxv) ** 2
    mu_a, mu_b = filt(a), filt(b)
    saa = filt(a * a) - mu_a * mu_a
    sbb = filt(b * b) - mu_b * mu_b
    sab = filt(a * b) - mu_a * mu_b
    cs = (2 * sab + c2) / (saa + sbb + c2)
    ssim = ((2 * mu_a * mu_b + c1) / (mu_a * mu_a + mu_b * mu_b + c1)) * cs
    return ssim.mean(), cs.mean()


MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(orig: np.ndarray, recon: np.ndarray, bit_depth: int = 8
            ) -> float:
    """MS-SSIM (5 dyadic scales, Wang et al. weights) — the reference
    encoder's optional quality metric (reference: EncGOP xCalculateAddPSNR
    MS-SSIM path, EncCfg m_bXCalculateMSSSIM)."""
    a = np.asarray(orig, dtype=np.float64)
    b = np.asarray(recon, dtype=np.float64)
    maxv = float((1 << bit_depth) - 1)
    vals = []
    for lvl in range(5):
        s, cs = _ssim(a, b, maxv)
        vals.append(s if lvl == 4 else cs)
        if lvl < 4:
            h2, w2 = (a.shape[0] // 2) * 2, (a.shape[1] // 2) * 2
            a = a[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            b = b[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
    vals = np.clip(np.asarray(vals), 1e-6, None)
    return float(np.prod(vals ** np.asarray(MS_SSIM_WEIGHTS)))


def metrics_360(orig: np.ndarray, recon: np.ndarray, bit_depth: int = 8,
                viewport: bool = False) -> dict:
    """All 360 metrics for one luma plane (reference: TExt360EncGop per-POC
    metric block, EncGOP.cpp:4960-5060)."""
    o = jnp.asarray(orig)
    r = jnp.asarray(recon)
    out = dict(ws_psnr=float(ws_psnr(o, r, bit_depth)),
               s_psnr_nn=float(s_psnr_nn(o, r, bit_depth)),
               s_psnr_i=float(s_psnr_i(o, r, bit_depth)),
               cpp_psnr=float(cpp_psnr(o, r, bit_depth)))
    if viewport:
        out["viewport_psnr"] = viewport_psnr(np.asarray(orig),
                                             np.asarray(recon), bit_depth)
    return out
