"""SparkSession factory with the engine's standard configuration.

Local-mode testing uses local[$SPARK_GRAFT_CPUS]; on a real cluster the
same code runs via `spark-submit --py-files geoproc_spark.zip` with no
changes (all parallelism comes from partitioning, never from local
assumptions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF = {
    # AQE: runtime coalescing + skew-join splitting are part of the
    # engine's skew story (explicit salting is the other part).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF boundary (input_hint: no per-row Python).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    # Deterministic parquet scans regardless of file layout.
    "spark.sql.files.maxPartitionBytes": "128m",
    # zstd parquet (guide §6/§9): ~40% smaller than snappy on this text
    # corpus (139 -> 84 MB at sf0.1 pages) at neutral local wall — fewer
    # bytes through disk, page cache and network at every scale. A/B'd
    # interleaved: extract+write and join||tiles within noise, strictly
    # less I/O.
    "spark.sql.parquet.compression.codec": "zstd",
    # Long-lived sessions run MANY queries: unreferenced broadcasts,
    # shuffle files and RDD metadata are only released when the
    # ContextCleaner sees a JVM GC, and the default periodic-GC interval
    # (30 min) exceeds a whole bench/pipeline session — profiled as a
    # monotonic repeat-over-repeat slowdown that a forced System.gc()
    # reproducibly removed (r6). 2 min keeps the cleaner's backlog bounded
    # (vs a whole session under the default) without firing a full GC
    # inside every short query; the same setting is standard hygiene for
    # long-running drivers on real clusters.
    "spark.cleaner.periodicGC.interval": "2min",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "geoproc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in {**ENGINE_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
