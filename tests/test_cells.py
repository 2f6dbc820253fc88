"""Quadkey/tile math: numpy vs JVM Column vs shared SQL — bit-compatible."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoproc_spark.functions import cells

RNG = np.random.default_rng(42)
N = 2000
LATS = RNG.uniform(-84.9, 84.9, N)
LONS = RNG.uniform(-179.9, 179.9, N)


@pytest.mark.parametrize("zoom", [0, 3, 8, 12, 18])
def test_numpy_vs_column(spark, zoom):
    xt_np, yt_np = cells.tile_xy_np(LATS, LONS, zoom)
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(LATS, LONS)], "lat double, lon double"
    )
    xt_c, yt_c = cells.tile_cols(F.col("lat"), F.col("lon"), zoom)
    got = pdf.select(xt_c.alias("x"), yt_c.alias("y")).collect()
    assert [r["x"] for r in got] == xt_np.tolist()
    assert [r["y"] for r in got] == yt_np.tolist()


@pytest.mark.parametrize("zoom", [4, 12])
def test_sql_form_matches(spark, zoom):
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(LATS[:500], LONS[:500])],
        "lat double, lon double",
    )
    pdf.createOrReplaceTempView("pts")
    xt_sql, yt_sql = cells.tile_sql("lat", "lon", zoom)
    got = spark.sql(f"SELECT {xt_sql} AS x, {yt_sql} AS y FROM pts").collect()
    xt_np, yt_np = cells.tile_xy_np(LATS[:500], LONS[:500], zoom)
    assert [r["x"] for r in got] == xt_np.tolist()
    assert [r["y"] for r in got] == yt_np.tolist()


def test_cell_id_roundtrip():
    for zoom in (1, 7, 15, 28):
        cid = cells.cell_id_np(LATS, LONS, zoom)
        z, x, y = cells.cell_to_zxy_np(cid)
        xt, yt = cells.tile_xy_np(LATS, LONS, zoom)
        assert (z == zoom).all()
        assert (x == xt).all() and (y == yt).all()


def test_tile_bounds_contain_point():
    zoom = 10
    xt, yt = cells.tile_xy_np(LATS, LONS, zoom)
    w, s, e, n = cells.tile_bounds_np(np.full(N, zoom), xt, yt)
    assert (LONS >= w - 1e-9).all() and (LONS <= e + 1e-9).all()
    assert (LATS >= s - 1e-7).all() and (LATS <= n + 1e-7).all()


def test_covering_cells_complete():
    """Every point inside a bbox maps to a cell in the bbox's cover."""
    zoom = 9
    boxes = [(-1.0, 44.0, 3.4, 49.0), (150.0, -35.0, 152.0, -33.0)]
    covers = cells.covering_cells_np(
        np.array([b[0] for b in boxes]),
        np.array([b[1] for b in boxes]),
        np.array([b[2] for b in boxes]),
        np.array([b[3] for b in boxes]),
        zoom,
    )
    for (minx, miny, maxx, maxy), cover in zip(boxes, covers):
        inside = (LONS >= minx) & (LONS <= maxx) & (LATS >= miny) & (LATS <= maxy)
        pts = cells.cell_id_np(LATS[inside], LONS[inside], zoom)
        assert set(pts.tolist()) <= set(cover.tolist())


def test_parent_cell(spark):
    zoom, parent_zoom = 12, 6
    cid = cells.cell_id_np(LATS[:100], LONS[:100], zoom)
    want = cells.cell_id_np(LATS[:100], LONS[:100], parent_zoom)
    pdf = spark.createDataFrame([(int(c),) for c in cid], "cell bigint")
    got = pdf.select(
        cells.parent_cell_col(F.col("cell"), zoom, parent_zoom).alias("p")
    ).collect()
    assert [r["p"] for r in got] == want.tolist()


def test_zoom_for_res_golden():
    """F10 goldens vs hand-computed Web-Mercator ladder values (reference
    geoproc/server/image.py:467-515 -> morecantile zoom_for_res semantics)."""
    # exact matrix resolutions map to their own zoom
    for z in (0, 5, 12, 20):
        assert cells.zoom_for_res(cells.zoom_resolution(z)) == z
    # 10 m/px: res_14=9.55, res_13=19.11 -> auto picks 14 (closer in ratio)
    assert cells.zoom_for_res(10.0) == 14
    # 15 m/px: 19.11/15=1.27 < 15/9.55=1.57 -> snaps UP the ladder to 13
    assert cells.zoom_for_res(15.0) == 13
    # strategy overrides
    assert cells.zoom_for_res(15.0, strategy="upper") == 14
    assert cells.zoom_for_res(15.0, strategy="lower") == 13
    # coarser than zoom 0 clamps to 0
    assert cells.zoom_for_res(1e9) == 0


def test_max_overview_level_golden():
    # rio-tiler get_maximum_overview_level semantics (halve until <= minsize)
    assert cells.max_overview_level(256, 256) == 0
    assert cells.max_overview_level(512, 512) == 1
    assert cells.max_overview_level(10000, 8000) == 5
    assert cells.max_overview_level(100, 100) == 0


def test_min_max_zoom_golden():
    mn, mx = cells.min_max_zoom(10000, 8000, 10.0)
    assert (mn, mx) == (9, 14)
    # a tiny raster has no overviews: min_zoom == max_zoom
    mn2, mx2 = cells.min_max_zoom(200, 200, 100.0)
    assert mn2 == mx2


def test_mercator_roundtrip():
    """F9 CRS transform: WGS84 <-> WebMercator closed form round-trips."""
    x, y = cells.lonlat_to_mercator_np(LONS, LATS)
    lon2, lat2 = cells.mercator_to_lonlat_np(x, y)
    np.testing.assert_allclose(lon2, LONS, atol=1e-9)
    np.testing.assert_allclose(lat2, LATS, atol=1e-9)
    # pinned golden: equator/prime-meridian and the lat clamp edge
    x0, y0 = cells.lonlat_to_mercator_np(np.array([0.0]), np.array([0.0]))
    assert x0[0] == 0.0 and abs(y0[0]) < 1e-9
    _, ytop = cells.lonlat_to_mercator_np(np.array([0.0]), np.array([cells.MAX_LAT]))
    assert abs(ytop[0] - 20037508.342789244) < 1e-3  # half circumference


def test_transform_bounds_and_union():
    """F5 bounds union with CRS reconciliation (reference
    server/image.py:526-539): b reprojected into a's CRS, then envelope."""
    b4326 = (-10.0, -20.0, 30.0, 40.0)
    b3857 = cells.transform_bounds(b4326, "epsg:4326", "epsg:3857")
    back = cells.transform_bounds(b3857, "epsg:3857", "epsg:4326")
    assert all(abs(p - q) < 1e-9 for p, q in zip(back, b4326))

    a = (0.0, 0.0, 1113194.9079327357, 1118889.9748579597)  # ~ (0,0)-(10,10) deg
    (u, crs) = cells.bounds_union(a, (5.0, 5.0, 20.0, 20.0), "epsg:3857", "epsg:4326")
    assert crs == "epsg:3857"
    assert u[0] == 0.0 and u[1] == 0.0
    assert u[2] > a[2] and u[3] > a[3]  # grew to cover the 20-degree corner

    # UTM joined the registry in r4 (tmerc.py); Lambert-93 in r5 (conic.py)
    utm = cells.transform_bounds(b4326, "epsg:4326", "epsg:32630")
    assert utm[2] > utm[0] and utm[3] > utm[1]
    l93 = cells.transform_bounds(b4326, "epsg:4326", "epsg:2154")
    assert l93[2] > l93[0] and l93[3] > l93[1]
    # a code outside the registry still refuses loudly (OSGB grid)
    with np.testing.assert_raises(ValueError):
        cells.transform_bounds(b4326, "epsg:4326", "epsg:27700")
