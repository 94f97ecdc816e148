"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user aggregates (event count, value total, last-seen) carried
across micro-batches in explicit GroupState — the pattern for any custom
stateful operator Spark's built-in windows can't express (per-key model
state, CEP-ish rules, incremental sketches).

State shape: one row per user (count BIGINT, total DOUBLE, last_us BIGINT).
Scale: state is partitioned by the grouping key across executors and
checkpointed per batch — at 100 TB/day the only watch-item is key
cardinality (state rows), not stream volume. Unbounded-cardinality keys
need a TTL (GroupStateTimeout.ProcessingTimeTimeout + setTimeoutDuration +
state.remove on hasTimedOut) to evict idle state; NOT enabled here because
a pending timeout keeps scheduling micro-batches after an availableNow
drain (an empty-batch spin) — a always-on deployment flips the
timeoutConf and adds the eviction branch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import prepare

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "total_value": total,
          "last_seen_us": last_us}]
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Apply the stateful update over a (possibly streaming) events frame."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drive_update_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    sink,
    operator,
    files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
) -> None:
    """Shared chunked-file-stream driver for the stateful operators (v1
    and v2 runners both delegate here): ``operator`` maps the streaming
    frame to its update-mode output, the sink sees each key's LATEST
    state per batch."""
    prepare(spark)
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        operator(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: sink(df, bid))
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        q = q.option("checkpointLocation", checkpoint_dir)
    q.start().awaitTermination()


def run_stateful_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    sink,
    files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
) -> None:
    """Drive running_user_totals over a chunked file stream; the sink sees
    each user's LATEST running totals per batch (update mode)."""
    drive_update_stream(
        spark,
        source_dir,
        source_schema,
        sink,
        running_user_totals,
        files_per_trigger,
        checkpoint_dir,
    )
