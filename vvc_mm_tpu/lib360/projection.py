"""Image-plane <-> unit-sphere projections — vectorized float32 jnp.

TPU-native analog of the reference's Coordinate/Projection layer (reference:
source/Lib/CommonLib/Coordinate.{h,cpp} — cartesian/polar/spherical
conversions with theta = acos(z/r), phi = atan2(y, x); Projection.cpp —
EquirectangularProjection toSphere: phi = -2*pi*(x+off)/W, theta =
pi*(y+off)/H; RadialProjection axis permutation X=-z_r, Y=x_r, Z=-y_r;
PerspectiveProjection with virtual-image-plane handling; Projection.h:127
ERP focal length = 1/tan(pi/H)).

Everything operates on arrays of any shape (scalars broadcast); no classes
with virtual dispatch — each projection is a small namespace of pure
functions plus a params dataclass, jit-friendly.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

PI = math.pi


# ---------------------------------------------------------------------------
# Coordinate conversions (reference: Coordinate.cpp)
# ---------------------------------------------------------------------------
def cartesian_to_polar(x, y):
    return jnp.sqrt(x * x + y * y), jnp.arctan2(y, x)


def polar_to_cartesian(r, phi):
    return r * jnp.cos(phi), r * jnp.sin(phi)


def cartesian_to_spherical(x, y, z):
    r = jnp.sqrt(x * x + y * y + z * z)
    theta = jnp.arccos(jnp.clip(z / r, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    return r, theta, phi


def spherical_to_cartesian(r, theta, phi):
    st = jnp.sin(theta)
    return r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)


# ---------------------------------------------------------------------------
# Equirectangular projection (reference: Projection.cpp ERP methods)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class ERP:
    width: int
    height: int
    pixel_offset: float = 0.0

    @property
    def focal(self) -> float:
        """reference: Projection.h:128 — 1/tan(pi/H)."""
        return 1.0 / math.tan(PI / self.height)

    def to_sphere(self, x, y):
        phi = -((x + self.pixel_offset) / self.width) * 2.0 * PI
        theta = ((y + self.pixel_offset) / self.height) * PI
        return spherical_to_cartesian(1.0, theta, phi)

    def from_sphere(self, cx, cy, cz):
        _, theta, phi = cartesian_to_spherical(cx, cy, cz)
        phi = jnp.where(phi > 0, phi - 2.0 * PI, phi)
        x = -(phi / (2.0 * PI)) * self.width - self.pixel_offset
        y = (theta / PI) * self.height - self.pixel_offset
        return x, y


# ---------------------------------------------------------------------------
# Perspective projection with virtual image plane (reference:
# Projection.cpp PerspectiveProjection; used as the MPA motion plane)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Perspective:
    focal: float
    cx: float = 0.0
    cy: float = 0.0

    def to_sphere(self, x, y, vip):
        """vip: bool array — point lies on the virtual (behind-camera)
        image plane."""
        r, phi = cartesian_to_polar(x - self.cx, y - self.cy)
        theta = jnp.arctan(r / self.focal)
        vipf = vip.astype(theta.dtype)
        theta = theta - vipf * (2.0 * theta - PI)
        phi = phi - vipf * PI
        xsr, ysr, zsr = spherical_to_cartesian(1.0, theta, phi)
        # axis permutation (reference: RadialProjection/Perspective toSphere)
        return -zsr, xsr, -ysr

    def from_sphere(self, cx3, cy3, cz3):
        """Returns (x, y, vip)."""
        # inverse axis permutation: spherical of (y, -z, -x)
        _, theta, phi = cartesian_to_spherical(cy3, -cz3, -cx3)
        r = self.focal * jnp.tan(theta)
        x, y = polar_to_cartesian(r, phi)
        return x + self.cx, y + self.cy, r < 0


# ---------------------------------------------------------------------------
# Equisolid (fisheye) projection (reference: Projection.cpp Equisolid)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Equisolid:
    focal: float
    cx: float = 0.0
    cy: float = 0.0

    def to_sphere(self, x, y):
        r, phi = cartesian_to_polar(x - self.cx, y - self.cy)
        theta = 2.0 * jnp.arcsin(jnp.clip(r / (2.0 * self.focal), -1.0, 1.0))
        xsr, ysr, zsr = spherical_to_cartesian(1.0, theta, phi)
        return -zsr, xsr, -ysr

    def from_sphere(self, cx3, cy3, cz3):
        _, theta, phi = cartesian_to_spherical(cy3, -cz3, -cx3)
        r = 2.0 * self.focal * jnp.sin(theta / 2.0)
        x, y = polar_to_cartesian(r, phi)
        return x + self.cx, y + self.cy


class LookupTable:
    """Sampled 1-D monotone function with forward and inverse lookup
    (reference: LookupTable.h:12-32 — used by CalibratedProjection for
    the theta <-> radius polynomial)."""

    def __init__(self, fn, domain, n: int = 4096):
        lo, hi = domain
        self.xs = np.linspace(lo, hi, int(n))
        self.ys = np.array([float(fn(x)) for x in self.xs])
        if not np.all(np.diff(self.ys) >= 0):
            raise ValueError("LookupTable requires a monotone function")

    def lookup(self, x):
        return jnp.interp(jnp.asarray(x), jnp.asarray(self.xs),
                          jnp.asarray(self.ys))

    def inverse_lookup(self, y):
        return jnp.interp(jnp.asarray(y), jnp.asarray(self.ys),
                          jnp.asarray(self.xs))


class Calibrated:
    """Calibrated polynomial radial projection (reference:
    Projection.h:78-97 CalibratedProjection — radius(theta) is a fitted
    polynomial sampled into a LookupTable; theta(radius) is the inverse
    lookup; LUT domain [0, pi/2 + pi/18] as in Projection.cpp:88)."""

    def __init__(self, coefficients, cx: float = 0.0, cy: float = 0.0,
                 n: int = 4096):
        self.coeffs = tuple(float(c) for c in coefficients)
        self.cx, self.cy = cx, cy
        self._lut = LookupTable(self._poly,
                                (0.0, np.pi / 2 + np.pi / 18), n)

    def _poly(self, t: float) -> float:
        return sum(c * t ** i for i, c in enumerate(self.coeffs))

    def radius(self, theta):
        return self._lut.lookup(theta)

    def theta(self, radius):
        return self._lut.inverse_lookup(radius)

    def to_sphere(self, x, y):
        r, phi = cartesian_to_polar(x - self.cx, y - self.cy)
        theta = self.theta(r)
        xsr, ysr, zsr = spherical_to_cartesian(1.0, theta, phi)
        return -zsr, xsr, -ysr

    def from_sphere(self, cx3, cy3, cz3):
        _, theta, phi = cartesian_to_spherical(cy3, -cz3, -cx3)
        r = self.radius(theta)
        x, y = polar_to_cartesian(r, phi)
        return x + self.cx, y + self.cy


def make_projection(projection_id: int, width: int, height: int,
                    focal: float | None = None, coefficients=None):
    """Factory over ProjectionID (reference: EncLib.cpp:335-355)."""
    from ..common.typedefs import ProjectionID
    pid = ProjectionID(projection_id)
    if pid == ProjectionID.EQUIRECTANGULAR:
        return ERP(width, height)
    if pid == ProjectionID.PERSPECTIVE:
        raise NotImplementedError("perspective source projection: "
                                  "MM operates on ERP/fisheye content")
    if pid == ProjectionID.EQUISOLID:
        return Equisolid(focal or (1088.0 / 5.2) * 1.8,
                         (width - 1) / 2.0, (height - 1) / 2.0)
    if pid == ProjectionID.CALIBRATED:
        # default: equidistant-ish polynomial r = f*theta when no
        # calibration is supplied (the reference app rejects CALIBRATED
        # for MM, EncApp.cpp:769; the projection itself is exercised by
        # the 360 conversion/metrics layer)
        f = focal or (1088.0 / 5.2) * 1.8
        coeffs = coefficients if coefficients is not None else (0.0, f)
        return Calibrated(coeffs, (width - 1) / 2.0, (height - 1) / 2.0)
    raise NotImplementedError(f"projection {pid}")
