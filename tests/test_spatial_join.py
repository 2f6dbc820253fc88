"""Spatial-join operator: PIP kernel vs shapely-free numpy oracle, path
equivalence (covering-cell vs salted vs broadcast), concave polygons."""

import numpy as np
from pyspark.sql import functions as F

from geoproc_spark import synth
from geoproc_spark.operators import spatial_join as sj
from tests.conftest import SF_DIR


def test_pip_kernel_concave():
    # L-shaped concave ring (CCW): unit L with the notch at top-right
    ring = np.array([0, 0, 2, 0, 2, 1, 1, 1, 1, 2, 0, 2, 0, 0], dtype=float)
    px = np.array([0.5, 1.5, 1.5, 0.5, 2.5, 1.0])
    py = np.array([0.5, 0.5, 1.5, 1.5, 0.5, 3.0])
    got = sj.points_in_ring_np(px, py, ring)
    assert got.tolist() == [True, True, False, True, False, False]


def test_pip_kernel_vs_matplotlib_free_oracle():
    """Random convex k-gons: inside iff all cross products have one sign."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        k = rng.integers(5, 12)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(0.5, 2.0)
        cx, cy = rng.uniform(-50, 50, 2)
        xs, ys = cx + r * np.cos(ang), cy + r * np.sin(ang)
        ring = np.empty(2 * (k + 1))
        ring[0:-2:2], ring[1:-2:2] = xs, ys
        ring[-2], ring[-1] = xs[0], ys[0]
        px = rng.uniform(cx - 3, cx + 3, 300)
        py = rng.uniform(cy - 3, cy + 3, 300)
        # convex oracle: strict same-side test for every edge
        inside = np.ones(300, dtype=bool)
        for i in range(k):
            x1, y1 = xs[i], ys[i]
            x2, y2 = xs[(i + 1) % k], ys[(i + 1) % k]
            inside &= (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) > 0
        got = sj.points_in_ring_np(px, py, ring)
        assert (got == inside).all()


def _points(spark):
    return (
        synth.pages_df(spark, SF_DIR)
        .filter("has_geo = 1")
        .select(
            "page_id",
            (F.col("lat_s") / 10000.0).alias("lat"),
            (F.col("lon_s") / 10000.0).alias("lon"),
        )
    )


def test_join_paths_equivalent(spark):
    pts = _points(spark)
    poly = sj.polygons_df(spark)

    plain = sj.spatial_join(pts, poly).select("page_id", "feature_id")
    salted = sj.spatial_join(pts, poly, salt_buckets=4).select("page_id", "feature_id")
    bcast = sj.broadcast_spatial_join(pts, synth.polygon_rings()).select(
        "page_id", "feature_id"
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    c = sorted(map(tuple, bcast.collect()))
    assert a == b == c
    assert len(a) > 0
    # overlapping nested boxes: hot pages must match several features
    multi = plain.groupBy("page_id").count().filter("count > 1").count()
    assert multi > 0


def test_join_partition_invariant(spark):
    pts = _points(spark)
    poly = sj.polygons_df(spark)
    one = sorted(
        map(tuple, sj.spatial_join(pts.repartition(1), poly).select("page_id", "feature_id").collect())
    )
    many = sorted(
        map(tuple, sj.spatial_join(pts.repartition(16, "page_id"), poly).select("page_id", "feature_id").collect())
    )
    assert one == many
