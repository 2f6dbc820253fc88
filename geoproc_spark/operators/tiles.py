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


def build_parent_tiles(df: DataFrame, n_bands: int, n_px: int) -> DataFrame:
    """One zoom-pyramid level: parent tiles at z-1 assembled from their four
    children — the distributed COG-overview build the reference's min_zoom
    logic PRESUMES exists (geoproc/server/image.py:477 reads overview
    levels; building them was rasterio's job). Downsample is pinned
    nearest-neighbor top-left (child pixel (2r, 2c) -> parent local (r,c));
    a missing child quadrant is fully masked (data 0, mask 0), matching the
    outer-join zero-fill convention of the algebra kernels.

    Pure JVM: children group by parent key into a quadrant->tile map (one
    shuffle of tile rows, no explode), and the parent's pixel arrays are a
    transform() gather over that map — whole-stage codegen, no Python.
    """
    import math

    side = int(math.isqrt(n_px))
    assert side * side == n_px, "tiles must be square"
    half = side // 2

    child = df.select(
        (F.col("z") - 1).cast("int").alias("z"),
        F.floor(F.col("x") / 2).cast("int").alias("x"),
        F.floor(F.col("y") / 2).cast("int").alias("y"),
        ((F.col("y") % 2) * 2 + (F.col("x") % 2)).cast("int").alias("q"),
        "data",
        "mask",
    )
    g = child.groupBy("z", "x", "y").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("q"), F.struct("data", "mask")))
        ).alias("m")
    )

    def q_of(p):
        return (F.floor(p / side / half) * 2 + F.floor((p % side) / half)).cast("int")

    def ci_of(p):
        # child index of the nearest (top-left) source pixel, 1-based for element_at
        pr, pc = F.floor(p / side), p % side
        return ((pr % half) * 2 * side + (pc % half) * 2 + 1).cast("int")

    def band(b):
        return F.transform(
            F.sequence(F.lit(0), F.lit(n_px - 1)),
            lambda p: F.coalesce(
                F.element_at(F.element_at(F.col("m"), q_of(p)).getField("data")[b], ci_of(p)),
                F.lit(0.0),
            ),
        )

    mask = F.transform(
        F.sequence(F.lit(0), F.lit(n_px - 1)),
        lambda p: F.coalesce(
            F.element_at(F.element_at(F.col("m"), q_of(p)).getField("mask"), ci_of(p)),
            F.lit(0),
        ),
    )
    return g.select(
        "z", "x", "y", F.array(*[band(b) for b in range(n_bands)]).alias("data"), mask.alias("mask")
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
