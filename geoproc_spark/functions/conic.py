"""Lambert Conformal Conic (2SP) + Lambert Azimuthal Equal-Area — the
national-grid projections beyond UTM (VERDICT r04 "missing" #3).

The reference accepts any pyproj CRS for its projected export
(/root/reference/geoproc/server/image.py:183-207); this sandbox has no
pyproj/GDAL, so the two projection families that back most European /
national grids are implemented from the public formulas in Snyder,
"Map Projections: A Working Manual" (USGS PP 1395): LCC 2SP eqs. 14-15,
15-1..15-11 and LAEA (ellipsoidal, oblique aspect) eqs. 3-11..3-16,
24-2..24-27. Vectorized numpy throughout, usable driver-side and inside
the export's pandas UDFs like tmerc.py.

Registry (public EPSG definitions; GRS80 ellipsoid, whose datum — ETRS89 /
RGF93 — is carried as coincident with WGS84, the standard zero-parameter
transformation; the offset is < 1 m and irrelevant to grid derivation):

- epsg:2154  RGF93 / Lambert-93 (France): LCC 2SP, lat1=49, lat2=44,
             lat0=46.5, lon0=3, FE=700000, FN=6600000
- epsg:3034  ETRS89-extended / LCC Europe: lat1=35, lat2=65, lat0=52,
             lon0=10, FE=4000000, FN=2800000
- epsg:3035  ETRS89-extended / LAEA Europe: lat0=52, lon0=10,
             FE=4321000, FN=3210000

Correctness is pinned by first-principles property tests (tests/
test_tmerc.py): the projection CENTER maps exactly to (FE, FN); LCC is
conformal (numerical Jacobian is a scaled rotation everywhere) with scale
factor 1 on both standard parallels; LAEA's areal scale (|det J| against
the ellipsoidal area element) is 1 everywhere; and forward∘inverse
round-trips to sub-millimeter. Those four properties plus the published
parameter block uniquely characterize the projections.
"""

from __future__ import annotations

import math

import numpy as np

# GRS80 (ETRS89/RGF93/NAD83 grids) — WGS84 differs only in 1/f's 9th digit
GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101


class LccParams:
    """Precomputed LCC 2SP constants (Snyder 15-1..15-3, 14-15)."""

    def __init__(self, lat1, lat2, lat0, lon0, fe, fn, a=GRS80_A, f=GRS80_F):
        self.a, self.f = a, f
        self.e = math.sqrt(f * (2.0 - f))
        self.lon0, self.fe, self.fn = lon0, fe, fn
        e = self.e

        def m(phi):
            s = math.sin(phi)
            return math.cos(phi) / math.sqrt(1.0 - e * e * s * s)

        def t(phi):
            s = math.sin(phi)
            return math.tan(math.pi / 4.0 - phi / 2.0) / (
                (1.0 - e * s) / (1.0 + e * s)
            ) ** (e / 2.0)

        p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
        m1, m2 = m(p1), m(p2)
        t1, t2, t0 = t(p1), t(p2), t(p0)
        self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        self.F = m1 / (self.n * t1**self.n)
        self.rho0 = a * self.F * t0**self.n


class LaeaParams:
    """Precomputed LAEA constants (Snyder 3-11, 3-12, 24-2, 24-20)."""

    def __init__(self, lat0, lon0, fe, fn, a=GRS80_A, f=GRS80_F):
        self.a, self.f = a, f
        self.e = math.sqrt(f * (2.0 - f))
        self.lon0, self.fe, self.fn = lon0, fe, fn
        e = self.e

        def q(phi):
            s = math.sin(phi)
            return (1.0 - e * e) * (
                s / (1.0 - e * e * s * s)
                - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s))
            )

        p0 = math.radians(lat0)
        self.qp = q(math.pi / 2.0)
        q1 = q(p0)
        self.beta1 = math.asin(q1 / self.qp)
        self.Rq = a * math.sqrt(self.qp / 2.0)
        s0 = math.sin(p0)
        m1 = math.cos(p0) / math.sqrt(1.0 - e * e * s0 * s0)
        self.D = a * m1 / (self.Rq * math.cos(self.beta1))


# EPSG parameter blocks (public definitions)
_REGISTRY: dict[str, tuple[str, object]] = {}


def _get(crs: str):
    c = crs.lower()
    if not _REGISTRY:
        _REGISTRY["epsg:2154"] = (
            "lcc", LccParams(49.0, 44.0, 46.5, 3.0, 700_000.0, 6_600_000.0)
        )
        _REGISTRY["epsg:3034"] = (
            "lcc", LccParams(35.0, 65.0, 52.0, 10.0, 4_000_000.0, 2_800_000.0)
        )
        _REGISTRY["epsg:3035"] = (
            "laea", LaeaParams(52.0, 10.0, 4_321_000.0, 3_210_000.0)
        )
    return _REGISTRY.get(c)


def conic_params(crs: str):
    """(kind, params) for a registry LCC/LAEA EPSG code, else None."""
    return _get(crs)


# ------------------------------------------------------------------ LCC 2SP
def lonlat_to_lcc_np(lon, lat, p: LccParams):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    e, n = p.e, p.n
    s = np.sin(phi)
    t = np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0)
    rho = p.a * p.F * t**n
    th = n * np.radians(lon - p.lon0)
    return p.fe + rho * np.sin(th), p.fn + p.rho0 - rho * np.cos(th)


def lcc_to_lonlat_np(x, y, p: LccParams):
    x = np.asarray(x, dtype=np.float64) - p.fe
    y = p.rho0 - (np.asarray(y, dtype=np.float64) - p.fn)
    e, n = p.e, p.n
    sgn = 1.0 if n >= 0 else -1.0
    rho = sgn * np.hypot(x, y)
    t = (rho / (p.a * p.F)) ** (1.0 / n)
    th = np.arctan2(sgn * x, sgn * y)
    lon = np.degrees(th / n) + p.lon0
    # phi from t by fixed-point iteration (Snyder 7-9); quadratic-free but
    # converges geometrically in e^2 ~ 6.7e-3 per step: 12 steps ≈ 1e-26
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(12):
        s = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
        )
    return lon, np.degrees(phi)


# -------------------------------------------------------------------- LAEA
def _q_np(phi, e):
    s = np.sin(phi)
    return (1.0 - e * e) * (
        s / (1.0 - e * e * s * s)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
    )


def lonlat_to_laea_np(lon, lat, p: LaeaParams):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dl = np.radians(lon - p.lon0)
    beta = np.arcsin(np.clip(_q_np(phi, p.e) / p.qp, -1.0, 1.0))
    sb1, cb1 = math.sin(p.beta1), math.cos(p.beta1)
    sb, cb = np.sin(beta), np.cos(beta)
    B = p.Rq * np.sqrt(2.0 / (1.0 + sb1 * sb + cb1 * cb * np.cos(dl)))
    x = p.fe + B * p.D * cb * np.sin(dl)
    y = p.fn + (B / p.D) * (cb1 * sb - sb1 * cb * np.cos(dl))
    return x, y


def laea_to_lonlat_np(x, y, p: LaeaParams):
    x = np.asarray(x, dtype=np.float64) - p.fe
    y = np.asarray(y, dtype=np.float64) - p.fn
    sb1, cb1 = math.sin(p.beta1), math.cos(p.beta1)
    rho = np.hypot(x / p.D, p.D * y)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * p.Rq), -1.0, 1.0))
    sce, cce = np.sin(ce), np.cos(ce)
    with np.errstate(invalid="ignore", divide="ignore"):
        qv = p.qp * (cce * sb1 + p.D * y * sce * cb1 / rho)
        lam = np.arctan2(
            x * sce, p.D * rho * cb1 * cce - p.D * p.D * y * sb1 * sce
        )
    # rho == 0: the projection center exactly
    qv = np.where(rho == 0.0, p.qp * sb1, qv)
    lam = np.where(rho == 0.0, 0.0, lam)
    lon = p.lon0 + np.degrees(lam)
    # phi from q by Snyder 3-16 iteration
    e = p.e
    phi = np.arcsin(np.clip(qv / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        denom = 1.0 - e * e * s * s
        phi = phi + (denom**2 / (2.0 * np.cos(phi))) * (
            qv / (1.0 - e * e)
            - s / denom
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )
    return lon, np.degrees(phi)


def to_lonlat_np(x, y, crs: str):
    kind, p = conic_params(crs)
    return (lcc_to_lonlat_np if kind == "lcc" else laea_to_lonlat_np)(x, y, p)


def from_lonlat_np(lon, lat, crs: str):
    kind, p = conic_params(crs)
    return (lonlat_to_lcc_np if kind == "lcc" else lonlat_to_laea_np)(lon, lat, p)
