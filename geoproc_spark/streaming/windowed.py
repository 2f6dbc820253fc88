"""Structured Streaming twins of the batch windowed aggregates.

The reference has no streaming (request/response only, SURVEY.md §2.6) and
north_rule asks for resumable *batch* checkpoints — but the engine's
windowed aggregates are written so the same expressions run on a stream:
`hourly_stream` is the streaming twin of queries.events_hourly, file-source
+ availableNow trigger + checkpointed sink. Tests assert batch/stream
result equality (the real guarantee a lakehouse pipeline cares about).

At scale: swap the file source for Kafka, add
`withWatermark("ts", "2 hours")` and append mode; the aggregation
expressions are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_agg(ev: DataFrame) -> DataFrame:
    """The shared aggregation — identical for batch and streaming inputs."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint")).alias("sum_cents"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_cents")
    )


def run_hourly_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_table: str = "hourly_stream_result",
) -> DataFrame:
    """Run the hourly aggregate as a stream over a parquet directory with an
    availableNow trigger (process-everything-then-stop), checkpointed.
    Returns the result as a DataFrame (from the in-memory sink)."""
    import os

    schema = spark.read.parquet(events_dir).schema
    if os.path.isfile(events_dir):
        # the streaming file source only takes directories: stream the
        # parent with a glob filter pinned to this one file
        stream = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", os.path.basename(events_dir))
            .parquet(os.path.dirname(events_dir))
        )
    else:
        stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        hourly_agg(stream)
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)
