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
