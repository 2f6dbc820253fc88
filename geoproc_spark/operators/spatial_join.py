"""Point-in-polygon spatial join — the engine's headline operator.

Filter-refine, Raptor-style (PAPERS.md): polygons get a covering-cell set at
a fixed zoom; pages get their point cell at the same zoom; an equi-join on
cell produces candidates; an exact vectorized ray-cast refines. Maps the
reference's only join — the spatially-aligned zip join of
/root/reference/geoproc/server/image.py:295-301, where both children are
evaluated for the same window key — onto a Spark equi-join on cell key.

Scale notes (100 TB / 1000 executors):
- The big (pages) side is hash-partitioned on cell by the join shuffle; with
  a cell-prefix-partitioned table layout the shuffle is avoided entirely
  (storage-partitioned join). The polygon side is exploded x |cover| only.
- Catalyst broadcasts the polygon side automatically when it is small; for
  very small layers `broadcast_spatial_join` skips the shuffle AND the
  explode by probing a broadcast bbox index inside `mapInPandas`.
- Hot cells (city-center skew) are handled by explicit salting
  (`salt_buckets`) plus AQE skew-join as backstop. Salting preserves
  semantics: the page side picks ONE salt per row, the polygon side is
  replicated across all salts, so no duplicates are produced.

Both paths produce identical (page_id, feature_id) sets; strict-interior
semantics (boundary points excluded — fixtures keep integer points off the
half-integer polygon edges, synth.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cells
from .. import synth

DEFAULT_JOIN_ZOOM = 8


# ----------------------------------------------------------------- PIP kernel
def points_in_ring_np(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-cast point-in-polygon (strict interior, even-odd rule).

    `ring` is flat [x0,y0,...,x0,y0] (closed). ~the numpy PIP the reference
    would have needed had it implemented vector ops (its shapely/geopandas
    dev-deps, /root/reference/pyproject.toml:35-36, were never used).
    """
    xs = ring[0::2]
    ys = ring[1::2]
    inside = np.zeros(len(px), dtype=bool)
    for i in range(len(xs) - 1):
        x1, y1, x2, y2 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        if y1 == y2:
            continue
        crosses = (y1 > py) != (y2 > py)
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= crosses & (px < xint)
    return inside


@F.pandas_udf(T.BooleanType())
def _pip_udf(lon: pd.Series, lat: pd.Series, ring: pd.Series, fid: pd.Series) -> pd.Series:
    """Arrow-batched PIP refine. Candidates are grouped by feature_id (an
    int64 argsort — no per-row Python) and each distinct polygon is tested
    against its candidate points in one vectorized ray-cast pass."""
    out = np.zeros(len(lon), dtype=bool)
    px = lon.to_numpy(dtype=np.float64)
    py = lat.to_numpy(dtype=np.float64)
    f = fid.to_numpy(dtype=np.int64)
    order = np.argsort(f, kind="stable")
    fs = f[order]
    starts = np.flatnonzero(np.r_[True, fs[1:] != fs[:-1]])
    bounds = np.r_[starts, len(fs)]
    for a, b in zip(bounds[:-1], bounds[1:]):
        ii = order[a:b]
        r = np.asarray(ring.iloc[ii[0]], dtype=np.float64)
        out[ii] = points_in_ring_np(px[ii], py[ii], r)
    return pd.Series(out)


# ------------------------------------------------------------- polygon layer
def polygons_df(spark: SparkSession) -> DataFrame:
    """The fixture polygon layer as general closed rings (FIXTURES.md T2)."""
    feats = synth.polygon_rings()
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
    return spark.createDataFrame(feats, schema)


def with_covering_cells(poly: DataFrame, zoom: int = DEFAULT_JOIN_ZOOM) -> DataFrame:
    """Attach ARRAY<BIGINT> covering cells per polygon (Arrow-batched).

    Distributed: works for millions of polygons — the cover is computed per
    Arrow batch from the bbox, never driver-side.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        covers = cells.covering_cells_np(
            minx.to_numpy(), miny.to_numpy(), maxx.to_numpy(), maxy.to_numpy(), zoom
        )
        return pd.Series([c.tolist() for c in covers])

    return poly.withColumn("covering_cells", cover("minx", "miny", "maxx", "maxy"))


# ------------------------------------------------------------ the join paths
def spatial_join(
    points: DataFrame,
    poly: DataFrame,
    zoom: int = DEFAULT_JOIN_ZOOM,
    salt_buckets: int | None = None,
    lat_col: str = "lat",
    lon_col: str = "lon",
    broadcast_poly: bool = True,
) -> DataFrame:
    """Covering-cell equi-join + exact PIP refine (the scale path).

    points: any DataFrame with (lat_col, lon_col) in degrees + id columns.
    Returns points' columns + feature_id, one row per (point, containing
    polygon). Rows with null coordinates are dropped (no geo -> no match).

    broadcast_poly: the exploded polygon side goes through a pandas UDF, so
    Catalyst has no size estimate and can pick the wrong build side (it
    happily broadcast the *points* once in profiling). Polygon layers are
    almost always the small side — hint it explicitly; pass False for
    continent-scale layers, where the equi-join shuffles both sides on cell.
    """
    pts = points.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    pts = pts.withColumn("_cell", cells.cell_id_col(F.col(lat_col), F.col(lon_col), zoom))

    poly_cells = (
        with_covering_cells(poly, zoom)
        .select("feature_id", "ring", F.explode("covering_cells").alias("_cell"))
    )

    if broadcast_poly:
        poly_cells = F.broadcast(poly_cells)

    if salt_buckets and salt_buckets > 1:
        # Page side picks one salt; polygon side replicated over all salts.
        # Salt on a hash of ALL point columns: hashing only the first column
        # silently degrades to a constant salt when a caller's leading column
        # is low-cardinality (e.g. a lat passed first).
        pts = pts.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in pts.columns]), F.lit(salt_buckets))
        )
        poly_cells = poly_cells.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0).cast("bigint"), F.lit(salt_buckets - 1).cast("bigint")))
        )
        joined = pts.join(poly_cells, ["_cell", "_salt"], "inner")
    else:
        joined = pts.join(poly_cells, "_cell", "inner")

    refined = joined.filter(
        _pip_udf(F.col(lon_col), F.col(lat_col), F.col("ring"), F.col("feature_id"))
    )
    return refined.drop("_cell", "_salt", "ring")


def broadcast_spatial_join(
    points: DataFrame,
    poly_rows: list[dict],
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Broadcast bbox-index join (small polygon layers; no shuffle at all).

    `poly_rows` is the collected polygon layer (feature_id, ring, bbox).
    A packed bbox table is broadcast; each Arrow batch of points is probed
    vectorized: bbox containment matrix -> candidate pairs -> exact PIP.
    The distributed analog of the reference evaluating a constant image per
    window (/root/reference/geoproc/server/image.py:120-139): the small side
    rides along to every partition.
    """
    spark = points.sparkSession
    fids = np.array([p["feature_id"] for p in poly_rows], dtype=np.int64)
    boxes = np.array(
        [[p["minx"], p["miny"], p["maxx"], p["maxy"]] for p in poly_rows], dtype=np.float64
    )
    rings = [np.asarray(p["ring"], dtype=np.float64) for p in poly_rows]
    bc = spark.sparkContext.broadcast((fids, boxes, rings))

    out_schema = T.StructType(
        points.schema.fields + [T.StructField("feature_id", T.LongType())]
    )
    pt_cols = points.columns

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f, b, r = bc.value
        for pdf in batches:
            lon = pdf[lon_col].to_numpy(dtype=np.float64)
            lat = pdf[lat_col].to_numpy(dtype=np.float64)
            ok = ~(np.isnan(lon) | np.isnan(lat))
            # bbox containment: (npoints, npolys) — strict interior
            cand = (
                ok[:, None]
                & (lon[:, None] > b[None, :, 0])
                & (lon[:, None] < b[None, :, 2])
                & (lat[:, None] > b[None, :, 1])
                & (lat[:, None] < b[None, :, 3])
            )
            pi, fi = np.nonzero(cand)
            if len(pi) == 0:
                yield pdf.iloc[:0].assign(feature_id=np.array([], dtype=np.int64))
                continue
            keep = np.zeros(len(pi), dtype=bool)
            for j in np.unique(fi):
                sel = fi == j
                keep[sel] = points_in_ring_np(lon[pi[sel]], lat[pi[sel]], r[j])
            pi, fi = pi[keep], fi[keep]
            out = pdf.iloc[pi][pt_cols].reset_index(drop=True)
            out["feature_id"] = f[fi]
            yield out

    # Null coords never match: filter early so isnan probe sees no NaNs from null
    pts = points.filter(F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull())
    return pts.mapInPandas(probe, out_schema)
