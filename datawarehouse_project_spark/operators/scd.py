"""Slowly-changing-dimension (Type 2) maintenance — warehouse-native
history tracking, built from a change log with windows only.

The reference project maintains star-schema dimensions as
current-state-only tables (metro.sql:15-59 DDL; the MESHJOIN enrichment
joins facts to whatever the dimension row says *now* — README.md's
enrichment spec). A production warehouse usually needs the stronger
form: SCD Type 2, where every attribute change opens a new dimension
row with a validity interval, and facts join to the row that was valid
AT THE FACT'S OWN TIMESTAMP. Both halves are implemented here
Spark-first:

* ``scd2_user_state_history`` — intervalize a change log
  (gaps-and-islands): consecutive runs of the same attribute value
  collapse into one row with ``[valid_from, valid_to)`` bounds and an
  ``is_current`` flag. One shuffle on the dimension key; every window
  is partitioned by that key, so partition size is bounded by a single
  entity's history, never the corpus.
* ``scd2_dim_asof_orders`` — the temporal (as-of) dimension join,
  implemented as the scalable union-merge: interval starts and fact
  probes are unioned into one keyed stream and a single
  ``last_value(ignorenulls)`` window assigns each fact the dimension
  version in effect at its timestamp. No range join, no per-fact
  interval scan — one shuffle on the key, exactly what a 100 TB fact
  table can afford. (The DuckDB oracle states the semantics as the
  naive interval join; the Spark plan is the production algorithm.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import table
from ..plans.registry import register
from ..session import prepare

#: Shared gaps-and-islands CTE text for the oracles: one row per
#: (user_id, run-of-equal-event_type), ordered by (ts, event_id).
_DUCK_HIST = """
runs AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
    SELECT user_id, event_type, ts,
           SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS version
    FROM runs
),
hist AS (
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           MIN(ts) AS valid_from,
           LEAD(MIN(ts)) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to,
           COUNT(*) AS run_events
    FROM numbered
    GROUP BY user_id, version, event_type
)
"""


def _runs_frame(events: DataFrame) -> DataFrame:
    """Gaps-and-islands core over any events frame: one row per
    (user_id, run-of-equal-event_type) with run number (dense from 1 in
    ``version``), run start (``valid_from``) and run length
    (``run_events``). One shuffle on user_id; everything downstream
    reuses that clustering."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        .otherwise(0)
        .alias("chg"),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = flagged.select(
        "user_id",
        "event_type",
        "ts",
        F.sum("chg").over(wsum).cast("bigint").alias("version"),
    )
    return numbered.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count("*").alias("run_events"),
        # the run's event-time high-watermark: what the incremental
        # maintainer's late-batch guard compares against (a late batch
        # can land AFTER the open row's valid_from but before its last
        # folded event — valid_from alone cannot catch that)
        F.max("ts").alias("last_ts"),
    )


def _close_intervals(runs: DataFrame) -> DataFrame:
    """Attach ``valid_to`` = next run's ``valid_from`` (NULL on the open
    interval) — reuses the user_id clustering, no extra shuffle."""
    wlead = Window.partitionBy("user_id").orderBy("version")
    extra = ["last_ts"] if "last_ts" in runs.columns else []
    return runs.select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wlead).alias("valid_to"),
        "run_events",
        *extra,
    )


def _history_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-recompute SCD2 history shared by both registered queries."""
    return _close_intervals(_runs_frame(table(spark, sf_dir, "events")))


@register(
    "scd2_user_state_history",
    # r10 rotation: driver-green r≤9; scd2_dim_asof_orders keeps the
    # SCD2 family's row in the driver's sweep.
    driver_facing=False,
    oracle=f"""
WITH {_DUCK_HIST}
SELECT user_id, version, event_type, valid_from, valid_to,
       valid_to IS NULL AS is_current, run_events
FROM hist
""",
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the SCD2 dimension history from the ``events`` change log:
    per user (ordered by ``ts, event_id`` — a deterministic total order
    since event_id is unique), consecutive runs of the same
    ``event_type`` become one versioned row with ``[valid_from,
    valid_to)`` validity and ``is_current`` on the open interval.

    Plan: one shuffle on ``user_id``; the change-flag window, the
    run-numbering prefix sum, the per-run aggregate, and the
    ``valid_to`` lead all reuse that partitioning (AQE keeps them in
    one exchange scope). Partition size is one user's history — at
    100 TB the skew bound is the most active entity, and the per-run
    GROUP BY is a partial agg before the lead."""
    prepare(spark)
    return _history_frame(spark, sf_dir).select(
        "user_id",
        "version",
        "event_type",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        "run_events",
    )


#: Synthetic order-placement time: the generated tables put orders in
#: 1995–2001 but events (the dimension change log) in 2024, so joining on
#: raw o_orderdate would make every as-of lookup NULL. A deterministic
#: map of o_orderkey into the events month keeps the temporal join
#: meaningful AND engine-portable (integer hour arithmetic — identical
#: timestamps on both engines). 720 hours = the 30-day events window.
_PLACED_EPOCH = "2024-01-01 00:00:00"
_PLACED_HOURS_MOD = 720


@register(
    "scd2_dim_asof_orders",
    oracle=f"""
WITH {_DUCK_HIST},
o AS (
    SELECT o_orderkey, o_custkey AS user_id,
           TIMESTAMP '{_PLACED_EPOCH}'
               + (o_orderkey % {_PLACED_HOURS_MOD}) * INTERVAL 1 HOUR
               AS placed_ts
    FROM orders
    WHERE o_custkey <= (SELECT MAX(user_id) FROM events)
)
SELECT o.o_orderkey, o.user_id, o.placed_ts,
       h.event_type AS state_at_order,
       h.version AS state_version
FROM o LEFT JOIN hist h
  ON h.user_id = o.user_id
 AND o.placed_ts >= h.valid_from
 AND (h.valid_to IS NULL OR o.placed_ts < h.valid_to)
""",
)
def scd2_dim_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join: each order (for users that have a
    dimension history) picks up the SCD2 ``event_type`` version that was
    valid at its placement time — NULL when the order predates the
    user's first recorded state (LEFT semantics). Placement time is a
    deterministic map of the order key into the change log's month (see
    ``_PLACED_EPOCH`` — the generated orders/events epochs don't
    overlap, and an all-NULL temporal join would verify nothing).

    The oracle states the semantics as the naive interval join; the
    Spark plan delegates to the engine's one union-merge as-of
    implementation (``operators/relational.py::asof_join``): interval
    starts and order probes merge into one keyed stream and a single
    ``last(ignorenulls)`` window carries the in-effect version onto
    every probe — one shuffle on the key, no range join, no interval
    multiplication. ``right_tiebreak="version"`` makes duplicate
    ``(user_id, valid_from)`` state rows (which a duplicate-``ts``
    change log legitimately produces as empty intervals) resolve to
    the HIGHEST version — exactly the row the oracle's
    ``[valid_from, valid_to)`` containment selects, since the empty
    interval matches nothing."""
    from .relational import asof_join

    prepare(spark)
    hist = _history_frame(spark, sf_dir)
    events = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders")
    max_user = events.select(F.max("user_id").alias("mx"))
    placed = F.timestamp_add(
        "HOUR",
        (F.col("o_orderkey") % _PLACED_HOURS_MOD).cast("int"),
        F.lit(_PLACED_EPOCH).cast("timestamp"),
    )
    probes = orders.join(
        F.broadcast(max_user), F.col("o_custkey") <= F.col("mx")
    ).select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        placed.alias("placed_ts"),
    )
    joined = asof_join(
        probes,
        hist,
        key="user_id",
        left_ts="placed_ts",
        right_ts="valid_from",
        right_cols=["event_type", "version"],
        right_tiebreak="version",
        prune_right=False,  # probes are dense in users — pruning buys nothing
    )
    return joined.select(
        "o_orderkey",
        "user_id",
        "placed_ts",
        F.col("event_type").alias("state_at_order"),
        F.col("version").alias("state_version"),
    )


class IncrementalScd2:
    """MERGE-style incremental SCD2 maintenance: fold an appended batch
    of change-log events into a persisted dimension history WITHOUT
    recomputing old rows.

    Contract: batches are appended in event-time order per key (the
    change-data-capture shape — same assumption as every streaming
    ingest here); within a batch any order is fine. Per batch the work
    is gaps-and-islands over THE BATCH ONLY, one broadcast-sized join
    against the affected users' open rows, and an upsert of
    O(batch runs + affected users) rows — never O(history).

    Semantics per user (pytest-pinned == full recompute):

    * batch's first run continues the stored open run with the same
      attribute value -> the open row is EXTENDED in place
      (``run_events`` grows; ``valid_from`` keeps its original start —
      SCD2 rows must never fork when nothing changed);
    * otherwise the open row CLOSES at the batch's first event time and
      new version rows append, numbering continuing from the stored max;
    * unseen users start at version 1.

    State lives in a :class:`VersionedParquetTable` keyed on
    ``(user_id, version)``; the extend/close merge is not naturally
    idempotent, so replay protection rides the snapshot's writer ledger
    (``txn``) and lost commit races re-read + re-fold exactly like
    :class:`operators.incremental.IncrementalRollup`.
    """

    KEYS = ["user_id", "version"]

    def __init__(self, root: str):
        from ..sources.sinks import VersionedParquetTable

        self.table = VersionedParquetTable(root)

    def apply_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        batch_id: int | None = None,
        app_id: str = "scd2",
    ) -> int:
        from ..io import release_checkpoint as _release_checkpoint

        # materialize the batch's gaps-and-islands ONCE: the runs frame
        # feeds three join branches per attempt (Spark does no common-
        # subplan elimination across them) plus every CAS retry, so an
        # eager localCheckpoint bounds the window work to one evaluation
        # (released in the finally — a long-lived stream must not accrue
        # one checkpoint's blocks per batch)
        runs = (
            _runs_frame(batch)
            .withColumnRenamed("version", "brun")
            .localCheckpoint(eager=True)
        )
        try:
            return self._apply_runs(spark, runs, batch_id, app_id)
        finally:
            _release_checkpoint(runs)

    def _apply_runs(
        self,
        spark: SparkSession,
        runs: DataFrame,
        batch_id: int | None,
        app_id: str,
    ) -> int:
        from ..sources.sinks import ConcurrentWriteError

        txn = (app_id, batch_id) if batch_id is not None else None
        for _ in range(10):
            if batch_id is not None:
                last = self.table.last_txn(app_id)
                if last is not None and batch_id <= last:
                    return self.table.current_version()
            base_version = self.table.current_version()
            state = self.table.read(spark)
            if state is None:
                delta = _close_intervals(
                    runs.withColumnRenamed("brun", "version")
                )
            else:
                batch_users = runs.select("user_id").distinct()
                cur_last = (
                    F.col("last_ts")
                    if "last_ts" in state.columns
                    else F.col("valid_from")  # pre-last_ts stores: degrade
                )
                cur = (
                    state.filter(F.col("valid_to").isNull())
                    .join(F.broadcast(batch_users), "user_id", "left_semi")
                    .select(
                        "user_id",
                        F.col("version").alias("cur_version"),
                        F.col("event_type").alias("cur_type"),
                        F.col("valid_from").alias("cur_from"),
                        F.col("run_events").alias("cur_events"),
                        cur_last.alias("cur_last"),
                    )
                )
                first = (
                    runs.filter(F.col("brun") == 1)
                    .select("user_id", "event_type", "valid_from")
                    .join(cur, "user_id", "left")
                    .select(
                        "user_id",
                        F.coalesce(F.col("cur_version"), F.lit(0).cast("bigint"))
                        .alias("base_version"),
                        (
                            F.col("cur_type").isNotNull()
                            & (F.col("cur_type") == F.col("event_type"))
                        ).alias("merged"),
                        "cur_version",
                        "cur_type",
                        "cur_from",
                        "cur_events",
                        "cur_last",
                        F.col("valid_from").alias("batch_start"),
                    )
                )
                # contract guard: batches must arrive in event-time order
                # per key. A late batch (events preceding an affected
                # user's stored open-row valid_from) would silently fold
                # into negative/overlapping intervals — fail loudly
                # instead. One extra action over the broadcast-sized
                # ``first`` frame (runs is checkpointed), so ~free.
                late = first.filter(
                    F.col("cur_version").isNotNull()
                    & (
                        F.col("batch_start")
                        < F.coalesce(F.col("cur_last"), F.col("cur_from"))
                    )
                ).select("user_id", "batch_start", "cur_last")
                sample = late.limit(3).collect()
                if sample:
                    raise ValueError(
                        "IncrementalScd2: batch violates the event-time-"
                        "ordered contract — events precede the stored open "
                        f"run's last event for user(s) "
                        f"{[r.user_id for r in sample]} "
                        f"(e.g. batch starts {sample[0].batch_start} < open "
                        f"run high-watermark {sample[0].cur_last}); replay "
                        "history in order or rebuild with a full recompute"
                    )
                joined = runs.join(first, "user_id")
                new_rows = joined.select(
                    "user_id",
                    (
                        F.col("base_version")
                        + F.col("brun")
                        - F.when(F.col("merged"), 1).otherwise(0)
                    ).alias("version"),
                    "event_type",
                    F.when(
                        F.col("merged") & (F.col("brun") == 1), F.col("cur_from")
                    )
                    .otherwise(F.col("valid_from"))
                    .alias("valid_from"),
                    (
                        F.col("run_events")
                        + F.when(
                            F.col("merged") & (F.col("brun") == 1),
                            F.col("cur_events"),
                        ).otherwise(F.lit(0).cast("bigint"))
                    ).alias("run_events"),
                    "last_ts",
                )
                closed_old = (
                    first.filter(
                        F.col("cur_version").isNotNull() & ~F.col("merged")
                    )
                    .select(
                        "user_id",
                        F.col("cur_version").alias("version"),
                        F.col("cur_type").alias("event_type"),
                        F.col("cur_from").alias("valid_from"),
                        F.col("batch_start").alias("valid_to"),
                        F.col("cur_events").alias("run_events"),
                        F.col("cur_last").alias("last_ts"),
                    )
                )
                delta = _close_intervals(new_rows).unionByName(closed_old)
            try:
                return self.table.upsert(
                    spark, delta, self.KEYS, txn=txn, expected_base=base_version
                )
            except ConcurrentWriteError:
                continue  # another writer landed: re-read and re-fold
        raise RuntimeError(
            "IncrementalScd2.apply_batch lost the commit race 10 times — "
            "writer contention exceeds the retry budget"
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Current SCD2 history (None before the first batch)."""
        return self.table.read(spark)
