"""Transverse Mercator (UTM) kernel validation — no Spark session needed.

Three independent lines of evidence (no pyproj/GDAL in this sandbox):
1. exact invariants of the projection definition (central meridian maps to
   E=500000 with N = k0 * meridian arc; equator symmetry; south FN),
2. round-trip identity forward->inverse at sub-nanometer level,
3. a from-scratch SECOND implementation (Snyder, "Map Projections: A
   Working Manual" USGS PP 1395, eqs. 3-21/8-9..8-17) that shares no code
   or series with the Karney-Krueger kernel — agreement below a
   millimeter across the zone means both independently-published formulas
   were transcribed correctly.
"""

import math

import numpy as np
import pytest

from geoproc_spark.functions import cells, tmerc


# --------------------------------------------------- independent Snyder twin
_A = 6378137.0
_F = 1 / 298.257223563
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)


def _meridian_arc(phi):
    # Snyder eq. 3-21 (series in e^2 to e^6)
    e2, e4, e6 = _E2, _E2**2, _E2**3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )


def _snyder_fwd(lon, lat, lon0, fe=500000.0, fn=0.0, k0=0.9996):
    phi, lam = math.radians(lat), math.radians(lon - lon0)
    sp, cp, tp = math.sin(phi), math.cos(phi), math.tan(phi)
    nu = _A / math.sqrt(1 - _E2 * sp * sp)  # prime vertical radius (N)
    T = tp * tp
    C = _EP2 * cp * cp
    Aa = lam * cp
    M = _meridian_arc(phi)
    x = k0 * nu * (
        Aa
        + (1 - T + C) * Aa**3 / 6
        + (5 - 18 * T + T * T + 72 * C - 58 * _EP2) * Aa**5 / 120
    )
    y = k0 * (
        M
        + nu * tp * (
            Aa**2 / 2
            + (5 - T + 9 * C + 4 * C * C) * Aa**4 / 24
            + (61 - 58 * T + T * T + 600 * C - 330 * _EP2) * Aa**6 / 720
        )
    )
    return fe + x, fn + y


UTM30N = "epsg:32630"  # the reference's documented export CRS, lon0 = -3


def test_utm_param_parsing():
    assert tmerc.utm_params("epsg:32630") == (-3.0, 500000.0, 0.0)
    assert tmerc.utm_params("EPSG:32730") == (-3.0, 500000.0, 10000000.0)
    assert tmerc.utm_params("epsg:32601") == (-177.0, 500000.0, 0.0)
    assert tmerc.utm_params("epsg:32660") == (177.0, 500000.0, 0.0)
    assert tmerc.utm_params("epsg:32661") is None  # UPS, not UTM
    assert tmerc.utm_params("epsg:32600") is None
    assert tmerc.utm_params("epsg:3857") is None


def test_central_meridian_invariants():
    """On the central meridian: E = FE exactly; N = k0 * meridian arc."""
    lats = np.array([0.0, 12.5, 40.0, 71.3, -33.0])
    e, n = tmerc.lonlat_to_tmerc_np(np.full_like(lats, -3.0), lats, -3.0)
    assert np.allclose(e, 500000.0, atol=1e-6)
    for lat, ni in zip(lats, n):
        assert abs(ni - 0.9996 * _meridian_arc(math.radians(lat))) < 1e-3
    # equator, central meridian is the origin
    e0, n0 = tmerc.lonlat_to_tmerc_np(np.array([-3.0]), np.array([0.0]), -3.0)
    assert abs(e0[0] - 500000.0) < 1e-9 and abs(n0[0]) < 1e-9
    # southern false northing
    es, ns = tmerc.lonlat_to_tmerc_np(
        np.array([-3.0]), np.array([-30.0]), *tmerc.utm_params("epsg:32730")
    )
    nn, xn = tmerc.lonlat_to_tmerc_np(
        np.array([-3.0]), np.array([-30.0]), *tmerc.utm_params("epsg:32630")
    )
    assert abs((ns[0] - 10_000_000.0) - xn[0]) < 1e-6


def test_roundtrip_identity():
    rng = np.random.default_rng(42)
    lon = -3.0 + rng.uniform(-2.9, 2.9, 500)  # zone 30 span
    lat = rng.uniform(-80.0, 80.0, 500)
    e, n = tmerc.lonlat_to_tmerc_np(lon, lat, -3.0)
    lon2, lat2 = tmerc.tmerc_to_lonlat_np(e, n, -3.0)
    assert np.max(np.abs(lon2 - lon)) < 1e-11
    assert np.max(np.abs(lat2 - lat)) < 1e-11


def test_agrees_with_independent_snyder_series():
    """Two independently-published formulations agree below 1 mm inside
    the zone (Snyder's series is only good to ~mm at the zone edge)."""
    rng = np.random.default_rng(7)
    for _ in range(200):
        lon = -3.0 + rng.uniform(-2.5, 2.5)
        lat = rng.uniform(-75.0, 75.0)
        ek, nk = tmerc.lonlat_to_tmerc_np(np.array([lon]), np.array([lat]), -3.0)
        es, ns = _snyder_fwd(lon, lat, -3.0)
        assert abs(ek[0] - es) < 1e-3, (lon, lat, ek[0], es)
        assert abs(nk[0] - ns) < 1e-3, (lon, lat, nk[0], ns)


def test_registry_routing():
    """cells/grid registry: UTM is projected, transform_bounds routes
    through it, and the envelope accounts for meridian convergence."""
    from geoproc_spark.functions import grid

    assert grid.is_projected(UTM30N) is True
    assert grid.is_projected("epsg:32730") is True
    with pytest.raises(ValueError):
        grid.is_projected("epsg:99999")

    b = (-5.0, 40.0, -1.0, 42.0)  # straddles lon0=-3
    pb = cells.transform_bounds(b, src="epsg:4326", dst=UTM30N)
    # sanity: center of the box in UTM must be inside the projected envelope
    ec, nc = tmerc.lonlat_to_tmerc_np(np.array([-3.0]), np.array([41.0]), -3.0)
    assert pb[0] < ec[0] < pb[2] and pb[1] < nc[0] < pb[3]
    # inverse bounds return to ~the original lonlat box (envelope >= box)
    back = cells.transform_bounds(pb, src=UTM30N, dst="epsg:4326")
    assert back[0] <= b[0] + 1e-9 and back[2] >= b[2] - 1e-9
    assert back[1] <= b[1] + 1e-9 and back[3] >= b[3] - 1e-9

    # grid spec in UTM output: meter-scale pixel sizes, no 3857 detour
    spec = grid.export_grid_spec(b, scale=1000.0, crs=UTM30N)
    assert spec["proj_crs"] == UTM30N
    assert spec["width"] > 100 and spec["height"] > 100
    xs, _, west, _, ys, north = spec["transform"]
    assert 900.0 < xs < 1100.0 and -1100.0 < ys < -900.0


def test_export_grid_matches_reference_shape_logic():
    """The UTM grid spec follows the reference's export math: width/height
    = round(projected span / scale) (server/image.py:186-200)."""
    from geoproc_spark.functions import grid

    b = (-4.0, 50.0, -2.0, 51.0)
    spec = grid.export_grid_spec(b, scale=500.0, crs=UTM30N)
    pb = cells.transform_bounds(b, src="epsg:4326", dst=UTM30N)
    assert spec["width"] == round((pb[2] - pb[0]) / 500.0)
    assert spec["height"] == round((pb[3] - pb[1]) / 500.0)


# ---------------------------------------------------------- LCC/LAEA (conic)
def test_conic_centers_map_to_false_origin():
    """Snyder parameter-block invariant: (lon0, lat0) -> exactly (FE, FN)."""
    from geoproc_spark.functions import conic

    for crs, lon0, lat0, fe, fn in [
        ("epsg:2154", 3.0, 46.5, 700_000.0, 6_600_000.0),
        ("epsg:3034", 10.0, 52.0, 4_000_000.0, 2_800_000.0),
        ("epsg:3035", 10.0, 52.0, 4_321_000.0, 3_210_000.0),
    ]:
        x, y = conic.from_lonlat_np(np.array([lon0]), np.array([lat0]), crs)
        assert abs(x[0] - fe) < 1e-6 and abs(y[0] - fn) < 1e-6, (crs, x, y)


def test_conic_roundtrip_submillimeter():
    rng = np.random.default_rng(5)
    from geoproc_spark.functions import conic

    for crs, lon_rng, lat_rng in [
        ("epsg:2154", (-5.0, 10.0), (41.0, 51.5)),
        ("epsg:3034", (-10.0, 35.0), (30.0, 70.0)),
        ("epsg:3035", (-10.0, 35.0), (30.0, 70.0)),
    ]:
        lon = rng.uniform(*lon_rng, 500)
        lat = rng.uniform(*lat_rng, 500)
        x, y = conic.from_lonlat_np(lon, lat, crs)
        lon2, lat2 = conic.to_lonlat_np(x, y, crs)
        x2, y2 = conic.from_lonlat_np(lon2, lat2, crs)
        assert np.abs(np.hypot(x2 - x, y2 - y)).max() < 1e-3, crs


def _num_jacobian(crs, lon, lat, h=100.0):
    """d(E,N)/d(east-meters, north-meters) via ellipsoidal arc lengths —
    the local scale matrix of the projection. h=100 m: big enough to beat
    float64 cancellation against ~1e6-m coordinates (ulp ~2e-10 m), small
    enough that the curvature term is ~1e-5 relative."""
    from geoproc_spark.functions import conic

    a, f = conic.GRS80_A, conic.GRS80_F
    e2 = f * (2 - f)
    phi = np.radians(lat)
    # meridional + prime-vertical radii (Snyder 4-18/4-20)
    M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    dlat = np.degrees(h / M)          # h meters north in degrees
    dlon = np.degrees(h / (N * np.cos(phi)))  # h meters east in degrees
    x0, y0 = conic.from_lonlat_np(lon, lat, crs)
    xe, ye = conic.from_lonlat_np(lon + dlon, lat, crs)
    xn, yn = conic.from_lonlat_np(lon, lat + dlat, crs)
    return (
        (xe - x0) / h, (xn - x0) / h,
        (ye - y0) / h, (yn - y0) / h,
    )


def test_lcc_is_conformal_with_unit_scale_on_standard_parallels():
    """Conformality: the numerical Jacobian wrt local ENU meters is a
    scaled rotation (J11==J22, J12==-J21) everywhere; the scale is 1.0 on
    both standard parallels (the defining 2SP property) and >= the minimum
    between them."""
    rng = np.random.default_rng(6)
    lon = rng.uniform(-5.0, 10.0, 300)
    lat = rng.uniform(41.0, 51.0, 300)
    j11, j12, j21, j22 = _num_jacobian("epsg:2154", lon, lat)
    assert np.abs(j11 - j22).max() < 1e-4
    assert np.abs(j12 + j21).max() < 1e-4
    k = np.hypot(j11, j21)
    for sp in (44.0, 49.0):
        lonp = rng.uniform(-5.0, 10.0, 50)
        a11, _a12, a21, _a22 = _num_jacobian("epsg:2154", lonp, np.full(50, sp))
        ksp = np.hypot(a11, a21)
        assert np.abs(ksp - 1.0).max() < 1e-5, (sp, ksp.min(), ksp.max())
    assert k.min() > 0.99  # between the parallels k dips slightly below 1


def test_laea_is_equal_area_everywhere():
    """The defining LAEA property: |det J| wrt local ellipsoidal meters is
    exactly 1 — areas are preserved across the whole domain."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-10.0, 35.0, 400)
    lat = rng.uniform(30.0, 70.0, 400)
    j11, j12, j21, j22 = _num_jacobian("epsg:3035", lon, lat)
    det = j11 * j22 - j12 * j21
    assert np.abs(det - 1.0).max() < 1e-4, (det.min(), det.max())


def test_conic_registry_routing_and_export_grid():
    """cells/grid dispatch reaches the conic kernels and export_grid_spec
    produces a sane projected grid for a French Lambert-93 export."""
    from geoproc_spark.functions import grid

    assert grid.is_projected("epsg:2154") and grid.is_projected("epsg:3035")
    assert grid.tile_range_pad("epsg:2154") == 1
    lon, lat = cells.to_lonlat_np(
        np.array([700_000.0]), np.array([6_600_000.0]), "epsg:2154"
    )
    assert abs(lon[0] - 3.0) < 1e-9 and abs(lat[0] - 46.5) < 1e-9
    spec = grid.export_grid_spec((-5.0, 42.0, 8.0, 51.0), 10_000.0, crs="epsg:2154")
    assert spec["crs"] == "epsg:2154"
    # ~13 deg lon at ~46N is ~1000 km; 9 deg lat ~ 1000 km -> ~100x100 px
    assert 80 <= spec["width"] <= 130 and 90 <= spec["height"] <= 120
