"""360 geometry conversion: ERP / cubemap / EAC / viewport resampling.

TPU-native analog of the reference's 360Lib TGeometry layer (reference:
source/Lib/Lib360/TGeometry.{cpp,h} — geoConvert resamples any geometry to
any other through the unit sphere with NN/bilinear/bicubic/Lanczos kernels
(cfg InterpolationMethodY); factory TGeometry::create:378; subclasses
TEquiRect, TCubeMap, TEquiAngularCubeMap, TViewPort et al).

Re-design: every geometry is a pair of pure maps
    dirs(width, height) -> unit-sphere direction per output pixel
    coords(dirs, width, height) -> continuous source pixel coords
Conversion precomputes the (dst -> src) coordinate field once per
(src_geo, dst_geo, size) on the host, then applies a jitted separable-free
bilinear / Lanczos gather on device — one conversion is a handful of
gathers, not the reference's per-pixel virtual calls.

Sphere convention matches lib360.projection (theta from +z, phi=atan2(y,x);
ERP x -> -phi).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

PI = math.pi


# ---------------------------------------------------------------------------
# direction fields
# ---------------------------------------------------------------------------
def erp_dirs(width: int, height: int) -> np.ndarray:
    """(H, W, 3) unit directions of ERP pixel centers."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    phi = -(xx + 0.5) / width * 2 * PI
    theta = (yy + 0.5) / height * PI
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], -1)


def erp_coords(dirs: np.ndarray, width: int, height: int) -> np.ndarray:
    """(..., 3) dirs -> (..., 2) continuous ERP (x, y)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    r = np.sqrt(x * x + y * y + z * z)
    theta = np.arccos(np.clip(z / r, -1, 1))
    phi = np.arctan2(y, x)
    phi = np.where(phi > 0, phi - 2 * PI, phi)
    return np.stack([-phi / (2 * PI) * width - 0.5,
                     theta / PI * height - 0.5], -1)


# Cubemap: 3x2 frame packing, face order per 360Lib CMP default
# (right, front, left on top row; bottom, back, top on bottom row —
# reference: TCubeMap face layout); face size = W/3 = H/2.
_CMP_FACES = {
    # face -> (axis permutation) mapping face-local (u, v) in [-1,1] to dir
    0: lambda u, v: ( np.ones_like(u), -u, -v),       # +x (front)
    1: lambda u, v: (-u, -np.ones_like(u), -v),       # -y (right)
    2: lambda u, v: (-np.ones_like(u),  u, -v),       # -x (back)
    3: lambda u, v: ( u,  np.ones_like(u), -v),       # +y (left)
    4: lambda u, v: ( v, -u,  np.ones_like(u)),       # +z (top)
    5: lambda u, v: (-v, -u, -np.ones_like(u)),       # -z (bottom)
}


def _cmp_face_uv(dirs: np.ndarray):
    """dirs -> (face, u, v) with u,v in [-1,1]."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where((ax >= ay) & (ax >= az), np.where(x > 0, 0, 2),
             np.where(ay >= az, np.where(y > 0, 3, 1),
                      np.where(z > 0, 4, 5)))
    eps = 1e-12
    u = np.zeros_like(x)
    v = np.zeros_like(x)
    m = face == 0
    u[m] = -y[m] / (ax[m] + eps); v[m] = -z[m] / (ax[m] + eps)
    m = face == 2
    u[m] = y[m] / (ax[m] + eps); v[m] = -z[m] / (ax[m] + eps)
    m = face == 3
    u[m] = x[m] / (ay[m] + eps); v[m] = -z[m] / (ay[m] + eps)
    m = face == 1
    u[m] = -x[m] / (ay[m] + eps); v[m] = -z[m] / (ay[m] + eps)
    m = face == 4
    u[m] = -y[m] / (az[m] + eps); v[m] = x[m] / (az[m] + eps)
    m = face == 5
    u[m] = -y[m] / (az[m] + eps); v[m] = -x[m] / (az[m] + eps)
    return face, u, v


def _cube_uv_warp(u, warp):
    """Cube-face coordinate warps (the generalized-cubemap family,
    reference: TEquiAngularCubeMap / TAdjustedCubeMap / TGeneralizedCubeMap):
      'eac': u' = 4/pi*atan(u); 'acp': JVET-F0025 polynomial
      u' = sgn(u)*(1.36|u| - 0.36u^2); True/'eac' and False/None supported
      for back compatibility."""
    if warp in (True, "eac"):
        return (4.0 / PI) * np.arctan(u)
    if warp == "acp":
        return np.sign(u) * (1.36 * np.abs(u) - 0.36 * u * u)
    return u


def _cube_uv_unwarp(u, warp):
    if warp in (True, "eac"):
        return np.tan(u * PI / 4.0)
    if warp == "acp":
        # invert 0.36 v^2 - 1.36 v + |u| = 0 on [0, 1]
        a = np.abs(u)
        v = (1.36 - np.sqrt(np.maximum(1.36 ** 2 - 4 * 0.36 * a, 0.0))) \
            / (2 * 0.36)
        return np.sign(u) * v
    return u


def cmp_dirs(width: int, height: int, eac=False) -> np.ndarray:
    f = width // 3
    assert width == 3 * f and height == 2 * f, "CMP expects 3x2 packing"
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    fx, fy = xx // f, yy // f
    face = fy * 3 + fx
    u = ((xx % f) + 0.5) / f * 2 - 1
    v = ((yy % f) + 0.5) / f * 2 - 1
    u = _cube_uv_unwarp(u, eac)
    v = _cube_uv_unwarp(v, eac)
    dirs = np.zeros((height, width, 3))
    for fid in range(6):
        m = face == fid
        dx, dy, dz = _CMP_FACES[fid](u[m], v[m])
        n = np.sqrt(dx * dx + dy * dy + dz * dz)
        dirs[m] = np.stack([dx / n, dy / n, dz / n], -1)
    return dirs


def cmp_coords(dirs: np.ndarray, width: int, height: int,
               eac=False) -> np.ndarray:
    f = width // 3
    face, u, v = _cmp_face_uv(dirs)
    u = _cube_uv_warp(u, eac)
    v = _cube_uv_warp(v, eac)
    px = (np.clip(u, -1, 1) + 1) / 2 * f - 0.5 + (face % 3) * f
    py = (np.clip(v, -1, 1) + 1) / 2 * f - 0.5 + (face // 3) * f
    return np.stack([px, py], -1)


def viewport_dirs(width: int, height: int, fov_deg: float,
                  yaw_deg: float, pitch_deg: float) -> np.ndarray:
    """Rectilinear viewport (reference: TViewPort / viewport PSNR)."""
    fov = math.radians(fov_deg)
    focal = (width / 2) / math.tan(fov / 2)
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    u = (xx + 0.5 - width / 2) / focal
    v = (yy + 0.5 - height / 2) / focal
    d = np.stack([np.ones_like(u), -u, -v], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    yaw, pitch = math.radians(yaw_deg), math.radians(pitch_deg)
    ry = np.array([[math.cos(pitch), 0, math.sin(pitch)], [0, 1, 0],
                   [-math.sin(pitch), 0, math.cos(pitch)]])
    rz = np.array([[math.cos(yaw), -math.sin(yaw), 0],
                   [math.sin(yaw), math.cos(yaw), 0], [0, 0, 1]])
    return d @ (rz @ ry).T


def eap_dirs(width: int, height: int) -> np.ndarray:
    """Equal-area (Lambert cylindrical) projection (reference: TEqualArea):
    x is longitude like ERP, y samples sin(latitude) uniformly."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    phi = -2.0 * PI * ((xx + 0.5) / width - 0.5)
    slat = 1.0 - 2.0 * (yy + 0.5) / height          # sin(lat) in (-1, 1)
    clat = np.sqrt(np.maximum(1.0 - slat * slat, 0.0))
    return np.stack([clat * np.cos(phi), clat * np.sin(phi), slat], -1)


def eap_coords(dirs: np.ndarray, width: int, height: int) -> np.ndarray:
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    n = np.sqrt(x * x + y * y + z * z) + 1e-12
    phi = np.arctan2(y, x)
    slat = z / n
    px = (0.5 - phi / (2.0 * PI)) * width - 0.5
    py = (1.0 - slat) / 2.0 * height - 0.5
    return np.stack([px, py], -1)


def cpp_dirs(width: int, height: int) -> np.ndarray:
    """Craster parabolic projection (reference: TCrastersParabolic — the
    CPP-PSNR domain, lib360/metrics.py shares the map)."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    ny = (2.0 * (yy + 0.5) / height - 1.0)          # in (-1, 1)
    # canonical CPP: y = 2 sin(lat/3), x = lon (2 cos(2lat/3) - 1); the
    # normalized frame maps y in [-1,1] <-> lat in [-pi/2, pi/2]
    lat = 3.0 * np.arcsin(np.clip(ny / 2.0, -1, 1))
    stretch = 2.0 * np.cos(2.0 * lat / 3.0) - 1.0
    nx = 2.0 * (xx + 0.5) / width - 1.0
    lon = np.where(stretch > 1e-6, nx * PI / np.maximum(stretch, 1e-6), 0.0)
    lon = np.clip(lon, -PI, PI)
    clat = np.cos(lat)
    return np.stack([clat * np.cos(-lon), clat * np.sin(-lon),
                     np.sin(lat)], -1)


def cpp_coords(dirs: np.ndarray, width: int, height: int) -> np.ndarray:
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    n = np.sqrt(x * x + y * y + z * z) + 1e-12
    lat = np.arcsin(np.clip(z / n, -1, 1))
    lon = -np.arctan2(y, x)
    nx = lon / PI * (2.0 * np.cos(2.0 * lat / 3.0) - 1.0)
    ny = 2.0 * np.sin(lat / 3.0)
    px = (nx + 1.0) / 2.0 * width - 0.5
    py = (ny + 1.0) / 2.0 * height - 0.5
    return np.stack([px, py], -1)


def fisheye_dirs(width: int, height: int, fov_deg: float = 180.0
                 ) -> np.ndarray:
    """Equisolid fisheye (reference: TFisheye; lib360/projection.py
    EquisolidProjection is the MM-extension twin): r = 2 f sin(theta/2)."""
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    u = (2.0 * (xx + 0.5) / width - 1.0)
    v = (2.0 * (yy + 0.5) / height - 1.0)
    r = np.sqrt(u * u + v * v)
    theta_max = np.deg2rad(fov_deg) / 2.0
    rmax = 2.0 * np.sin(theta_max / 2.0)
    theta = 2.0 * np.arcsin(np.clip(r * rmax / 2.0, -1, 1))
    psi = np.arctan2(v, u)
    st = np.sin(theta)
    # optical axis +x; image plane (y, z)
    return np.stack([np.cos(theta), -st * np.cos(psi), -st * np.sin(psi)],
                    -1)


def fisheye_coords(dirs: np.ndarray, width: int, height: int,
                   fov_deg: float = 180.0) -> np.ndarray:
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    n = np.sqrt(x * x + y * y + z * z) + 1e-12
    theta = np.arccos(np.clip(x / n, -1, 1))
    psi = np.arctan2(-z, -y)
    theta_max = np.deg2rad(fov_deg) / 2.0
    rmax = 2.0 * np.sin(theta_max / 2.0)
    r = 2.0 * np.sin(np.minimum(theta, theta_max) / 2.0) / rmax
    u = r * np.cos(psi)
    v = r * np.sin(psi)
    px = (u + 1.0) / 2.0 * width - 0.5
    py = (v + 1.0) / 2.0 * height - 0.5
    return np.stack([px, py], -1)


GEOMETRIES = {"erp": (erp_dirs, erp_coords),
              "cmp": (cmp_dirs, cmp_coords),
              "eac": (functools.partial(cmp_dirs, eac=True),
                      functools.partial(cmp_coords, eac=True)),
              # adjusted cubemap (ACP) via the generalized warp family
              "acp": (functools.partial(cmp_dirs, eac="acp"),
                      functools.partial(cmp_coords, eac="acp")),
              "eap": (eap_dirs, eap_coords),
              "cpp": (cpp_dirs, cpp_coords),
              "fisheye": (fisheye_dirs, fisheye_coords)}


@functools.lru_cache(maxsize=None)
def _conversion_map(src_geo: str, sw: int, sh: int, dst_geo: str,
                    dw: int, dh: int) -> np.ndarray:
    dirs = GEOMETRIES[dst_geo][0](dw, dh)
    return GEOMETRIES[src_geo][1](dirs, sw, sh).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _lanczos_lut(a: int, phases: int = 32) -> np.ndarray:
    """Per-phase Lanczos-a kernels (reference: TGeometry Lanczos filters)."""
    taps = 2 * a
    k = np.zeros((phases, taps))
    for p in range(phases):
        frac = p / phases
        xs = np.arange(-a + 1, a + 1) - frac
        w = np.sinc(xs) * np.sinc(xs / a)
        k[p] = w / w.sum()
    return k.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("method",))
def _resample(plane: jnp.ndarray, coords: jnp.ndarray, method: str = "bilinear"
              ) -> jnp.ndarray:
    """Sample `plane` at continuous coords (H', W', 2); x wraps (ERP),
    y clamps."""
    h, w = plane.shape
    x, y = coords[..., 0], coords[..., 1]
    if method == "nn":
        xi = jnp.mod(jnp.round(x).astype(jnp.int32), w)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
        return plane[yi, xi]
    if method == "bilinear":
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy))
                xi = jnp.mod(x0 + dx, w)
                yi = jnp.clip(y0 + dy, 0, h - 1)
                out = out + wgt * plane[yi, xi]
        return jnp.round(out).astype(plane.dtype)
    if method in ("lanczos2", "lanczos3"):
        a = 2 if method == "lanczos2" else 3
        lut = jnp.asarray(_lanczos_lut(a))
        phases = lut.shape[0]
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        px = jnp.clip((x - x0) * phases, 0, phases - 1).astype(jnp.int32)
        py = jnp.clip((y - y0) * phases, 0, phases - 1).astype(jnp.int32)
        kx = lut[px]                                    # (..., 2a)
        ky = lut[py]
        out = 0.0
        for ty in range(2 * a):
            row = 0.0
            for tx in range(2 * a):
                xi = jnp.mod(x0 + tx - a + 1, w)
                yi = jnp.clip(y0 + ty - a + 1, 0, h - 1)
                row = row + kx[..., tx] * plane[yi, xi]
            out = out + ky[..., ty] * row
        # Lanczos overshoots; clamp into the plane's dynamic range
        out = jnp.clip(jnp.round(out), jnp.min(plane), jnp.max(plane))
        return out.astype(plane.dtype)
    raise ValueError(method)


def geo_convert(plane: np.ndarray, src_geo: str, dst_geo: str,
                dst_size: tuple[int, int], method: str = "lanczos3"
                ) -> np.ndarray:
    """Convert one plane between geometries (reference:
    TGeometry::geoConvert)."""
    sh, sw = plane.shape
    dh, dw = dst_size
    coords = jnp.asarray(_conversion_map(src_geo, sw, sh, dst_geo, dw, dh))
    return np.asarray(_resample(jnp.asarray(plane), coords, method))


def render_viewport(plane: np.ndarray, width: int, height: int,
                    fov_deg: float = 90.0, yaw_deg: float = 0.0,
                    pitch_deg: float = 0.0, method: str = "lanczos3"
                    ) -> np.ndarray:
    """Render a rectilinear viewport from an ERP plane (reference:
    TViewPort; feeds viewport PSNR)."""
    sh, sw = plane.shape
    dirs = viewport_dirs(width, height, fov_deg, yaw_deg, pitch_deg)
    coords = jnp.asarray(erp_coords(dirs, sw, sh).astype(np.float32))
    return np.asarray(_resample(jnp.asarray(plane), coords, method))
