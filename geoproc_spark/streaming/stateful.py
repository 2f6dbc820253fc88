"""Stateful streaming: exactly-once event dedup via the state store.

`dropDuplicates` on a stream keeps seen keys in the checkpointed state
store; with a watermark the state is bounded (keys older than the watermark
age out). The batch twin is a plain `dropDuplicates` — tests pin equality.

At scale: the state store shards by key hash across executors and
checkpoints incrementally (RocksDB provider on a real cluster); the same
code handles a Kafka source by swapping `readStream.parquet` for
`readStream.format("kafka")`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def dedup_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    out_table: str = "dedup_stream_result",
    watermark: str = "2 hours",
) -> DataFrame:
    schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches -> real state reuse
        .parquet(events_dir)
    )
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (tz-aware); parquet delivers NTZ
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(out_table)
