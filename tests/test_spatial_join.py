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


def _random_boxes(n: int, seed: int = 11) -> list[dict]:
    """n small random boxes as closed rings (the 10k-polygon fixture)."""
    rng = np.random.default_rng(seed)
    clat = rng.uniform(-60, 60, n)
    clon = rng.uniform(-170, 170, n)
    half = rng.uniform(0.01, 0.2, n)
    out = []
    for i in range(n):
        minx, maxx = float(clon[i] - half[i]), float(clon[i] + half[i])
        miny, maxy = float(clat[i] - half[i]), float(clat[i] + half[i])
        out.append(
            {
                "layer_id": "rand",
                "feature_id": i,
                "ring": [minx, miny, maxx, miny, maxx, maxy, minx, maxy, minx, miny],
                "minx": minx,
                "miny": miny,
                "maxx": maxx,
                "maxy": maxy,
            }
        )
    return out


def test_cell_index_candidates_vs_dense_matrix():
    """The packed CellBboxIndex finds exactly the pairs the old dense
    (npoints x npolys) bbox matrix found — on 2k polys x 5k points."""
    polys = _random_boxes(2000)
    idx = sj.CellBboxIndex(polys, zoom=8)
    rng = np.random.default_rng(3)
    lat = rng.uniform(-61, 61, 5000)
    lon = rng.uniform(-171, 171, 5000)
    pi, fi = idx.candidates(lat, lon)
    got = set(zip(pi.tolist(), fi.tolist()))
    b = idx.boxes
    dense = (
        (lon[:, None] > b[None, :, 0])
        & (lon[:, None] < b[None, :, 2])
        & (lat[:, None] > b[None, :, 1])
        & (lat[:, None] < b[None, :, 3])
    )
    want = set(zip(*[a.tolist() for a in np.nonzero(dense)]))
    assert got == want and len(want) > 0


def test_broadcast_join_10k_polygons(spark):
    """Scale fixture: 10k polygons through the broadcast cell-index join,
    results equal the shuffle-based covering-cell join, within time budget
    (the old dense-matrix probe was O(n*m) per batch)."""
    import time

    from pyspark.sql import types as T

    polys = _random_boxes(10_000)
    schema = T.StructType(
        [
            T.StructField("layer_id", T.StringType()),
            T.StructField("feature_id", T.LongType()),
            T.StructField("ring", T.ArrayType(T.DoubleType())),
            T.StructField("minx", T.DoubleType()),
            T.StructField("miny", T.DoubleType()),
            T.StructField("maxx", T.DoubleType()),
            T.StructField("maxy", T.DoubleType()),
        ]
    )
    poly_df = spark.createDataFrame(polys, schema)
    rng = np.random.default_rng(5)
    n_pts = 50_000
    pts = spark.createDataFrame(
        [
            (int(i), float(la), float(lo))
            for i, (la, lo) in enumerate(
                zip(rng.uniform(-61, 61, n_pts), rng.uniform(-171, 171, n_pts))
            )
        ],
        "page_id long, lat double, lon double",
    ).repartition(8)

    t0 = time.time()
    bcast = sorted(
        map(
            tuple,
            sj.broadcast_spatial_join(pts, polys)
            .select("page_id", "feature_id")
            .collect(),
        )
    )
    dt = time.time() - t0
    shuffle = sorted(
        map(
            tuple,
            sj.spatial_join(pts, poly_df).select("page_id", "feature_id").collect(),
        )
    )
    assert bcast == shuffle and len(bcast) > 0
    assert dt < 60, f"broadcast join took {dt:.1f}s on 10k polys x 50k points"


def test_broadcast_join_nan_coordinates_never_match(spark):
    """Non-null NaN coordinates pass isNotNull but must not match (and must
    not hit the float->int cell cast): guarded sentinel path."""
    pts = spark.createDataFrame(
        [(1, 48.8566, 2.3522), (2, float("nan"), 2.3522), (3, 48.8566, float("nan"))],
        "page_id long, lat double, lon double",
    )
    got = sj.broadcast_spatial_join(pts, synth.polygon_rings()).select("page_id").collect()
    assert {r.page_id for r in got} == {1}


def test_knn_sparse_multi_round_flat_lineage(spark):
    """A sparse corpus forces several ring-expansion rounds; the per-round
    localCheckpoint must (a) keep the final plan free of the per-round
    candidate-join subtrees (bounded Exchange count regardless of rounds)
    and (b) leave the exact result intact vs numpy brute force."""
    from geoproc_spark.operators import knn as knn_op

    # 8 pages scattered ~continental distances apart; k=3 with a tiny seed
    # radius guarantees >= 2 expansion rounds at zoom 6
    pts = [(i, int((i * 37 % 140 - 70) * 1e4), int((i * 83 % 340 - 170) * 1e4)) for i in range(8)]
    pages = spark.createDataFrame(pts, "page_id long, lat_s long, lon_s long")
    queries = spark.createDataFrame(
        [(0, 0, 0, 3), (1, 500000, 900000, 3)], "qid long, qlat_s long, qlon_s long, k int"
    )
    out = knn_op.knn_join(queries, pages, zoom=6, n_pages=8, k_max=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 4, plan  # no per-round join subtrees left

    got = {(r.qid, r.page_id, r.rank) for r in out.collect()}
    want = set()
    arr = np.array(pts, dtype=np.int64)
    for qid, qla, qlo, k in [(0, 0, 0, 3), (1, 500000, 900000, 3)]:
        d2 = (arr[:, 1] - qla) ** 2 + (arr[:, 2] - qlo) ** 2
        order = np.lexsort((arr[:, 0], d2))[:k]
        for rank, j in enumerate(order, start=1):
            want.add((qid, int(arr[j, 0]), rank))
    assert got == want


def test_knn_collect_and_distributed_paths_agree(spark):
    """knn_join's driver-resident query path (collect_queries=True, the
    default) and the fully-distributed loop must return identical exact
    top-k, including multi-round ring expansion and the brute-force twin."""
    from geoproc_spark.operators import knn as knn_op

    pts = [
        (i, int((i * 37 % 140 - 70) * 1e4), int((i * 83 % 340 - 170) * 1e4))
        for i in range(8)
    ]
    pages = spark.createDataFrame(pts, "page_id long, lat_s long, lon_s long")
    queries = spark.createDataFrame(
        [(0, 0, 0, 3), (1, 500000, 900000, 2)],
        "qid long, qlat_s long, qlon_s long, k int",
    )
    got_c = {
        (r.qid, r.page_id, r.rank)
        for r in knn_op.knn_join(
            queries, pages, zoom=6, n_pages=8, collect_queries=True
        ).collect()
    }
    got_d = {
        (r.qid, r.page_id, r.rank)
        for r in knn_op.knn_join(
            queries, pages, zoom=6, n_pages=8, collect_queries=False
        ).collect()
    }
    assert got_c == got_d
    want = set()
    arr = np.array(pts, dtype=np.int64)
    for qid, qla, qlo, k in [(0, 0, 0, 3), (1, 500000, 900000, 2)]:
        d2 = (arr[:, 1] - qla) ** 2 + (arr[:, 2] - qlo) ** 2
        order = np.lexsort((arr[:, 0], d2))[:k]
        for rank, j in enumerate(order, start=1):
            want.add((qid, int(arr[j, 0]), rank))
    assert got_c == want
