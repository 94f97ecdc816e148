"""Allowed-lateness routing with a dead-letter table (late-event DLQ).

Structured Streaming's watermark DROPS too-late rows inside stateful
operators — correct for windowed aggregates, but a data pipeline wants
the evidence: which rows arrived beyond the lateness budget, from which
batch, so they can be audited or backfilled (the same keep-don't-drop
posture as the DQ quarantine, applied to TIME instead of rules).

:class:`LateEventRouter` is the foreachBatch form:

* the event-time watermark is maintained as a ONE-ROW versioned state
  table — ``max(batch event time)`` folded monotonically, so deriving
  it never rescans the main table (at 100 TB a per-batch ``max(ts)``
  over the sink would be a full scan; the state row is bytes);
* each batch routes against ``watermark − allowed_lateness``: on-time
  rows upsert into the MAIN table, late rows into the LATE table tagged
  with the batch id and how late they were;
* commit order late → main → watermark, each under its own per-table
  ledger app id. A crash between any two commits replays to the same
  routing: the watermark only advances LAST, so a replayed batch is
  re-routed against the same pre-batch watermark, and the already-
  committed tables absorb their half via the ledger — at-least-once
  replay, exactly-once effect, the repo's standard contract.

Rows never vanish: main ∪ late == input, exactly once (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.sinks import VersionedParquetTable

_WM_KEY = "watermark"


class LateEventRouter:
    """Route event batches by allowed lateness (see module doc)."""

    def __init__(
        self,
        main_root: str,
        late_root: str,
        state_root: str,
        ts_col: str = "ts",
        allowed_lateness_s: int = 3600,
    ):
        self.main = VersionedParquetTable(main_root)
        self.late = VersionedParquetTable(late_root)
        self.state = VersionedParquetTable(state_root)
        self.ts_col = ts_col
        self.lateness_s = int(allowed_lateness_s)

    def watermark_us(self, spark: SparkSession) -> int | None:
        """Current high watermark (epoch µs of the max event time seen),
        None before the first batch."""
        st = self.state.read(spark)
        if st is None:
            return None
        row = st.filter(F.col("k") == _WM_KEY).first()
        return int(row.max_ts_us) if row is not None else None

    def apply_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        pk: list[str],
        batch_id: int | None = None,
        app_id: str = "late-dlq",
    ) -> dict[str, int | None]:
        """Route one batch; returns the three committed versions. With
        ``batch_id`` the whole routing is replay-safe (see module doc)."""
        from ..io import release_checkpoint

        ts = F.col(self.ts_col).cast("timestamp")
        # pin the batch: it feeds the routing split, the batch-max fold,
        # and every ledger retry
        b = batch.localCheckpoint(eager=True)
        try:
            wm = self.watermark_us(spark)
            cutoff_us = None if wm is None else wm - self.lateness_s * 1_000_000
            is_late = (
                F.lit(False)
                if cutoff_us is None
                else (F.unix_micros(ts) < F.lit(cutoff_us))
            )
            late_rows = b.filter(is_late).select(
                "*",
                F.lit(batch_id).cast("long").alias("late_batch_id"),
                ((F.lit(cutoff_us) - F.unix_micros(ts)) / 1_000_000.0).alias(
                    "late_by_s"
                ),
            )
            ontime = b.filter(~is_late)
            lv = self.late.upsert(
                spark,
                late_rows,
                pk,
                txn=(f"{app_id}.late", batch_id) if batch_id is not None else None,
            )
            mv = self.main.upsert(
                spark,
                ontime,
                pk,
                txn=(f"{app_id}.main", batch_id) if batch_id is not None else None,
            )
            batch_max = b.agg(F.max(F.unix_micros(ts)).alias("m")).first()["m"]
            new_wm = (
                max(wm, int(batch_max))
                if wm is not None and batch_max is not None
                else (int(batch_max) if batch_max is not None else wm)
            )
            sv = None
            if new_wm is not None:
                sv = self.state.upsert(
                    spark,
                    spark.createDataFrame(
                        [(_WM_KEY, new_wm)], "k string, max_ts_us long"
                    ),
                    ["k"],
                    txn=(f"{app_id}.wm", batch_id)
                    if batch_id is not None
                    else None,
                )
            return {"late_version": lv, "main_version": mv, "state_version": sv}
        finally:
            release_checkpoint(b)
