"""Watermarked stream-stream join: click→purchase attribution.

The reference joins one stream against static relations (MeshJoin.java:
216-284); joining two UNBOUNDED inputs is the capability beyond it that a
real event pipeline needs (attribution, funnel stitching, request/response
pairing). Spark's stream-stream inner join is the idiomatic engine for it:

* both sides carry an event-time watermark, and the join condition bounds
  purchase.ts to [click.ts, click.ts + window) — together these let the
  state store evict a click once the watermark passes click.ts + window
  and a purchase once the watermark passes purchase.ts, so state is
  O(events within the watermark horizon), not O(stream length);
* inner-join matches are emitted eagerly (the watermark gates state
  eviction, not emission), so an availableNow drain yields every pair
  whose rows both arrive before eviction — with in-order micro-batches
  and a watermark covering the attribution window, that is exactly the
  batch join result (tested: stream == batch).

At 100 TB/day both sides shuffle on ``user_id`` once into the same state
partitioning; there is no cheaper formulation — the join IS the shuffle.

Batch twin: ``operators.events.events_click_attribution`` runs the same
``click_attribution`` plan on the bounded table and is DuckDB-oracle
checked; this module must reproduce it row-for-row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prepare

ATTRIBUTION_WINDOW = "30 minutes"


def split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two join sides with disjoint column names (required for
    self-derived stream-stream joins; also what keeps the joined schema
    unambiguous)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id").alias("click_user"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id").alias("purchase_user"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = ATTRIBUTION_WINDOW,
) -> DataFrame:
    """Pairs (click, purchase by the same user within the window after it).

    Pure plan — identical on batch and streaming inputs; the caller adds
    watermarks for the streaming case (a watermark is a no-op on batch).
    The time bound in the join condition is what makes streaming state
    evictable, and on batch it lets a range-join strategy apply.
    """
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return clicks.join(purchases, cond).select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_micros("click_ts").alias("click_ts_us"),
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        (
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).cast("double")
            / 1000000.0
        ).alias("latency_s"),
        "purchase_value",
    )


def run_stream_stream_join(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    sink: Callable[[DataFrame, int], None],
    attribution_window: str = ATTRIBUTION_WINDOW,
    watermark: str = "2 hours",
    files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
) -> dict[str, int]:
    """Drive ``click_attribution`` as a watermarked stream-stream join.

    Both sides are file streams over ``source_dir`` (chunk = micro-batch,
    the reference's unit of progress). ``sink(batch_df, batch_id)``
    receives newly emitted pairs per trigger (append semantics — each pair
    exactly once). ``watermark`` must cover the source's cross-batch
    event-time disorder; pairs whose click was evicted before its purchase
    arrived are dropped, which is the documented late-data contract.

    That contract is OBSERVABLE, not just documented: returns a metrics
    dict so an operator can alarm on silent attribution loss —

    * ``pairs_emitted``   — rows the join emitted (observe() on the
      joined stream: Spark's run-cost-free metrics channel);
    * ``rows_dropped_by_watermark`` — input rows the join's state store
      refused because they arrived older than the watermark (summed from
      the state-operator progress of every micro-batch); any non-zero
      value means late data exceeded ``watermark`` and pairs may be
      missing vs the batch twin.
    """
    prepare(spark)

    def stream() -> DataFrame:
        return (
            spark.readStream.schema(source_schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(source_dir)
        )

    clicks, purchases = split_clicks_purchases(stream())
    joined = click_attribution(
        clicks.withWatermark("click_ts", watermark),
        purchases.withWatermark("purchase_ts", watermark),
        attribution_window,
    ).observe("attribution", F.count(F.lit(1)).alias("pairs_emitted"))

    writer = (
        joined.writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    query.awaitTermination()

    metrics = {"pairs_emitted": 0, "rows_dropped_by_watermark": 0}
    for progress in query.recentProgress:
        observed = progress["observedMetrics"].get("attribution")
        if observed is not None:
            metrics["pairs_emitted"] += observed["pairs_emitted"]
        for op in progress["stateOperators"]:
            metrics["rows_dropped_by_watermark"] += op.get(
                "numRowsDroppedByWatermark", 0
            )
    return metrics
