"""Extraction invariants: UDF == JVM == arithmetic ground truth; byte-identical
per url across partitionings (input_hint)."""

from pyspark.sql import functions as F

from geoproc_spark import synth
from geoproc_spark.functions import extract
from tests.conftest import SF_DIR


def _truth(spark):
    return synth.pages_df(spark, SF_DIR).select(
        "page_id",
        "text",
        (F.col("lat_s") / 10000.0).alias("tlat"),
        (F.col("lon_s") / 10000.0).alias("tlon"),
        "has_geo",
    )


def test_udf_recovers_ground_truth(spark):
    df = _truth(spark).withColumn("c", extract.extract_coords_udf("text"))
    bad = df.filter(
        (
            (F.col("has_geo") == 1)
            & (~(F.col("c.lat") == F.col("tlat")) | ~(F.col("c.lon") == F.col("tlon")))
        )
        | ((F.col("has_geo") == 0) & F.col("c.lat").isNotNull())
    )
    assert bad.count() == 0


def test_jvm_path_matches_udf(spark):
    df = _truth(spark)
    lat_j, lon_j = extract.extract_coords_cols(F.col("text"))
    df = df.withColumn("c", extract.extract_coords_udf("text")).select(
        "page_id", "c.lat", "c.lon", lat_j.alias("jlat"), lon_j.alias("jlon")
    )
    mismatch = df.filter(
        ~(
            (F.col("lat").eqNullSafe(F.col("jlat")))
            & (F.col("lon").eqNullSafe(F.col("jlon")))
        )
    )
    assert mismatch.count() == 0


def test_extraction_partition_invariant(spark):
    """Same bytes out regardless of partitioning/parallelism."""
    base = _truth(spark)

    def run(df):
        out = df.withColumn("c", extract.extract_coords_udf("text")).select(
            "page_id", "c.lat", "c.lon"
        )
        return sorted((r.page_id, r.lat, r.lon) for r in out.collect())

    assert run(base.repartition(1)) == run(base.repartition(16, "page_id"))


def test_arrow_path_matches_udf(spark):
    """mapInArrow + RE2 (the production path) == pandas UDF, row for row."""
    pages = synth.pages_df(spark, SF_DIR)
    a = extract.with_coords_arrow(pages.select("page_id", "text"), keep=["page_id"])
    arrow_rows = sorted((r.page_id, r.lat, r.lon) for r in a.collect())
    p = pages.withColumn("c", extract.extract_coords_udf("text")).select(
        "page_id", "c.lat", "c.lon"
    )
    pandas_rows = sorted((r.page_id, r.lat, r.lon) for r in p.collect())
    assert arrow_rows == pandas_rows


def test_all_matches_document_order(spark):
    df = spark.createDataFrame(
        [("geo:1.5,2.5 then (3.25, -4.75) and lat 5.5, lon 6.5",), ("no coords",)],
        "text string",
    )
    rows = df.select(extract.extract_coords_all_udf("text").alias("a")).collect()
    got = [[(m["lat"], m["lon"]) for m in r["a"]] for r in rows]
    assert got == [[(1.5, 2.5), (3.25, -4.75), (5.5, 6.5)], []]
