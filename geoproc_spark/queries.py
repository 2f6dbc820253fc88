"""Registry of driver-checkable queries: Spark implementation + DuckDB oracle.

Each entry runs the REAL engine path (pandas-UDF extraction, covering-cell
joins, ring-expansion kNN, ...) on the synthetic corpus derived from the
driver's parquet tables; the oracle recomputes the expected result in plain
SQL from the integer-exact ground truth. Column names and types are aligned
on both sides (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import synth
from .functions import cells, extract
from .operators import knn as knn_op
from .operators import spatial_join as sj
from .operators import tiles as tiles_op

EXTRACT_ZOOM = 12
TILE_ZOOM = 6

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _pages_with_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine path: synthesize pages, extract coords from TEXT via the
    Arrow UDF (never from the ground-truth columns)."""
    pages = synth.pages_df(spark, sf_dir)
    return pages.select(
        "page_id", "url", "lang", "text", extract.extract_coords_udf("text").alias("c")
    ).select("page_id", "url", "lang", F.col("c.lat").alias("lat"), F.col("c.lon").alias("lon"))


def _pages_cte() -> str:
    return synth.pages_sql()


# ------------------------------------------------------------ geo_extract_cells
_xt12, _yt12 = cells.tile_sql("lat_s / 10000.0", "lon_s / 10000.0", EXTRACT_ZOOM)
_cell12 = cells.cell_id_sql("lat_s / 10000.0", "lon_s / 10000.0", EXTRACT_ZOOM)


@query(
    "geo_extract_cells",
    f"""
WITH pages AS ({synth.pages_sql()})
SELECT page_id, lat_s / 10000.0 AS lat, lon_s / 10000.0 AS lon,
       {_xt12} AS xt, {_yt12} AS yt, {_cell12} AS cell
FROM pages WHERE has_geo = 1
""",
)
def geo_extract_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text -> Arrow-UDF extraction -> JVM tile encode at zoom 12."""
    pts = _pages_with_coords(spark, sf_dir).filter(F.col("lat").isNotNull())
    xt, yt = cells.tile_cols(F.col("lat"), F.col("lon"), EXTRACT_ZOOM)
    return pts.select(
        "page_id",
        "lat",
        "lon",
        xt.alias("xt"),
        yt.alias("yt"),
        cells.cell_id_col(F.col("lat"), F.col("lon"), EXTRACT_ZOOM).alias("cell"),
    )


# ---------------------------------------------------------------- geo_pip_join
_PIP_ORACLE = f"""
WITH pages AS ({synth.pages_sql()}),
polyv AS ({synth.polygons_values_sql()})
SELECT p.page_id AS page_id, CAST(v.feature_id AS BIGINT) AS feature_id
FROM pages p JOIN polyv v
  ON abs(p.lat_s - v.clat) < v.half AND abs(p.lon_s - v.clon) < v.half
WHERE p.has_geo = 1
"""


@query("geo_pip_join", _PIP_ORACLE)
def geo_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covering-cell equi-join + exact PIP refine (the scale path)."""
    pts = _pages_with_coords(spark, sf_dir)
    poly = sj.polygons_df(spark)
    return sj.spatial_join(pts.select("page_id", "lat", "lon"), poly).select(
        "page_id", "feature_id"
    )


@query("geo_pip_join_salted", _PIP_ORACLE)
def geo_pip_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join with explicit 8-way salting — must be semantics-preserving."""
    pts = _pages_with_coords(spark, sf_dir)
    poly = sj.polygons_df(spark)
    return sj.spatial_join(
        pts.select("page_id", "lat", "lon"), poly, salt_buckets=8
    ).select("page_id", "feature_id")


@query("geo_pip_join_broadcast", _PIP_ORACLE)
def geo_pip_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast bbox-index variant (no shuffle; small polygon layers)."""
    pts = _pages_with_coords(spark, sf_dir)
    return sj.broadcast_spatial_join(
        pts.select("page_id", "lat", "lon"), synth.polygon_rings()
    ).select("page_id", "feature_id")


# -------------------------------------------------------------- geo_tile_stats
_xt6, _yt6 = cells.tile_sql("lat_s / 10000.0", "lon_s / 10000.0", TILE_ZOOM)


@query(
    "geo_tile_stats",
    f"""
WITH pages AS ({synth.pages_sql()}),
t AS (SELECT page_id, lat_s, lon_s, {_xt6} AS xt, {_yt6} AS yt
      FROM pages WHERE has_geo = 1)
SELECT {TILE_ZOOM} AS z, xt, yt,
       count(*) AS n_pages,
       min(lat_s) AS min_lat_s, max(lat_s) AS max_lat_s,
       min(lon_s) AS min_lon_s, max(lon_s) AS max_lon_s,
       CAST(sum(page_id % 100) AS BIGINT) AS chk
FROM t GROUP BY xt, yt
""",
)
def geo_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile hash aggregate at zoom 6 over the extracted corpus."""
    pts = (
        _pages_with_coords(spark, sf_dir)
        .filter(F.col("lat").isNotNull())
        .select(
            "page_id",
            # lat*1e4 is within 1 ulp of an integer (4-decimal corpus) — round,
            # never truncate, to recover the exact scaled value
            F.round(F.col("lat") * 10000).cast("bigint").alias("lat_s"),
            F.round(F.col("lon") * 10000).cast("bigint").alias("lon_s"),
            (F.col("page_id") % 100).alias("m100"),
        )
    )
    return tiles_op.tile_stats(pts, TILE_ZOOM, measure_col="m100")


# -------------------------------------------------------------------- geo_knn
@query(
    "geo_knn",
    f"""
WITH pages AS ({synth.pages_sql()}),
knnq AS ({synth.knn_queries_values_sql()}),
d AS (
  SELECT q.qid, p.page_id,
         (q.qlat_s - p.lat_s) * (q.qlat_s - p.lat_s)
         + (q.qlon_s - p.lon_s) * (q.qlon_s - p.lon_s) AS d2,
         q.k
  FROM knnq q CROSS JOIN pages p WHERE p.has_geo = 1
),
r AS (
  SELECT qid, page_id, k,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY d2, page_id) AS INT) AS rank
  FROM d
)
SELECT CAST(qid AS BIGINT) AS qid, page_id, rank FROM r WHERE rank <= k
""",
)
def geo_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN via cell-ring expansion; matches brute force by construction."""
    pages = synth.pages_df(spark, sf_dir).select("page_id", "lat_s", "lon_s")
    qrows = synth.knn_query_points()
    queries = spark.createDataFrame(qrows, "qid long, qlat_s long, qlon_s long, k int")
    return knn_op.knn_join(queries, pages)


# ---------------------------------------------------------------- tile_algebra
def _sum_px(data_col, n_bands: int):
    """Exact BIGINT checksum over all bands x pixels of a tile (JVM fold)."""
    e = None
    for i in range(n_bands):
        t = F.aggregate(
            data_col[i], F.lit(0).cast("bigint"), lambda acc, v: acc + v.cast("bigint")
        )
        e = t if e is None else e + t
    return e


def _mask_sum(mask_col):
    return F.aggregate(mask_col, F.lit(0).cast("bigint"), lambda acc, v: acc + v.cast("bigint"))


_PA0 = synth.tile_pixel_sql("t.x", "u.y", "r.i", 1)
_PA1 = synth.tile_pixel_sql("t.x", "u.y", "r.i", 2)
_PB = synth.tile_pixel_sql("t.x", "u.y", "r.i", 3)
_MASK = synth.tile_mask_sql("t.x", "u.y", "r.i")

_TILE_ALGEBRA_ORACLE = f"""
WITH px AS (
  SELECT t.x AS x, u.y AS y,
         CASE WHEN t.x <= 3 THEN {_PA0} ELSE 0 END AS pa0,
         CASE WHEN t.x <= 3 THEN {_PA1} ELSE 0 END AS pa1,
         CASE WHEN t.x >= 2 THEN {_PB} ELSE 0 END AS pb,
         CASE WHEN t.x <= 3 THEN {_MASK} ELSE 0 END AS ma,
         CASE WHEN t.x >= 2 THEN {_MASK} ELSE 0 END AS mb,
         t.x <= 3 AS in_a
  FROM range(6) t(x), range(4) u(y), range({synth.TILE_PX}) r(i)
)
SELECT {synth.TILE_Z} AS z, CAST(x AS INT) AS x, CAST(y AS INT) AS y,
       CAST(sum((pa0 + pb) + (pa1 + pb)) AS BIGINT) AS sum_c,
       CAST(sum(greatest(ma, mb)) AS BIGINT) AS mask_c,
       CAST(sum(CASE WHEN pa0 > pb THEN 1 ELSE 0 END
              + CASE WHEN pa1 > pb THEN 1 ELSE 0 END) AS BIGINT) AS sum_d,
       CAST(sum(abs(pa0 - pb) + abs(pa1 - pb)) AS BIGINT) AS sum_e,
       CAST(sum(CASE WHEN in_a THEN (pa0 * 2 + 1) + (pa1 * 2 + 1) END) AS BIGINT) AS sum_s
FROM px GROUP BY x, y
"""


@query("tile_algebra", _TILE_ALGEBRA_ORACLE)
def tile_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-algebra pipeline with geoproc parity semantics: A(2-band) +
    B(1-band, partial overlap), comparison, abs-chain, scalar ops — per-tile
    BIGINT checksums. Exercises outer-join bounds union, np.maximum mask
    union, float64 0/1 comparisons, and 1-band broadcast in one query."""
    from .image import Image

    a = Image.from_df(synth.tiles_df(spark, "A"), synth.TILE_BANDS["A"], synth.TILE_PX)
    b = Image.from_df(synth.tiles_df(spark, "B"), synth.TILE_BANDS["B"], synth.TILE_PX)
    c = a + b
    d = a > b
    e = abs(a - b)
    s = a * 2 + 1

    def sums(img, data_alias, with_mask=None):
        cols = [
            "z",
            "x",
            "y",
            _sum_px(F.col("data"), img.n_bands).alias(data_alias),
        ]
        if with_mask:
            cols.append(_mask_sum(F.col("mask")).alias(with_mask))
        return img.df.select(*cols)

    out = (
        sums(c, "sum_c", with_mask="mask_c")
        .join(sums(d, "sum_d"), ["z", "x", "y"])
        .join(sums(e, "sum_e"), ["z", "x", "y"])
        .join(sums(s, "sum_s"), ["z", "x", "y"], "left_outer")
    )
    return out


# ------------------------------------------------------------------- flagship
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages-per-polygon-feature counts — the §7 minimum end-to-end slice:
    scan -> extract (Arrow UDF) -> cell encode -> covering-cell join -> PIP
    refine -> aggregate."""
    joined = geo_pip_join(spark, sf_dir)
    return joined.groupBy("feature_id").agg(F.count("*").alias("n_pages"))
