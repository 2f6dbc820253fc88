"""Tiling operators: assignment of points to tiles + per-tile statistics.

The distributed analog of the reference's tile path
(/root/reference/geoproc/server/image.py:381-397: one 256^2 window per
request) and of its declared-but-empty `statistics()` stub
(/root/reference/geoproc/server/image.py:378-379): here a tile is a group
key and stats are a hash aggregate — partial (map-side) + final, handled by
Spark, no collect.

All outputs use integer-exact measures (counts, integer min/max, integer
sums) so results are associativity-independent — identical under any
partitioning, the determinism requirement of SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cells

SCALE = 10_000


def assign_tiles(points: DataFrame, zoom: int) -> DataFrame:
    """Add (z, xt, yt, cell) tile-assignment columns (JVM-side, codegen)."""
    lat = F.col("lat_s") / SCALE
    lon = F.col("lon_s") / SCALE
    xt, yt = cells.tile_cols(lat, lon, zoom)
    return (
        points.filter(F.col("lat_s").isNotNull())
        .withColumn("z", F.lit(zoom))
        .withColumn("xt", xt)
        .withColumn("yt", yt)
        .withColumn("cell", cells.cell_id_col(lat, lon, zoom))
    )


def tile_stats(points: DataFrame, zoom: int, measure_col: str | None = None) -> DataFrame:
    """Per-tile stats: (z, xt, yt, n_pages, min/max lat_s/lon_s, chk).

    `measure_col` (BIGINT) adds an exact integer checksum sum per tile.
    """
    t = assign_tiles(points, zoom)
    aggs = [
        F.count("*").alias("n_pages"),
        F.min("lat_s").alias("min_lat_s"),
        F.max("lat_s").alias("max_lat_s"),
        F.min("lon_s").alias("min_lon_s"),
        F.max("lon_s").alias("max_lon_s"),
    ]
    if measure_col:
        aggs.append(F.sum(measure_col).alias("chk"))
    return t.groupBy("z", "xt", "yt").agg(*aggs)
