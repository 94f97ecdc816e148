"""Streaming deduplication: exactly-once rows from an at-least-once source.

``dropDuplicatesWithinWatermark`` keys state by the dedup id and evicts it
once the watermark passes — the standard recipe for deduping a replayed/
at-least-once feed (Kafka redeliveries, retried file drops) without
unbounded state. This is the streaming twin of the batch exact-dedup
operator (operators/dedup.py) and the S7 upsert semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import prepare


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit each key once; duplicates arriving within the watermark window
    are dropped, state for older keys is evicted (bounded memory forever)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    keys: list[str],
    sink,
    watermark: str = "1 hour",
    files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
) -> None:
    prepare(spark)
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        dedup_stream(stream, keys, watermark=watermark)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: sink(df, bid))
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        q = q.option("checkpointLocation", checkpoint_dir)
    q.start().awaitTermination()
