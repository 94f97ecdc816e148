"""Mergeable-sketch rollups: store sketches, not raw keys.

``events_approx_distinct_users`` answers one approximate-distinct query
in one pass. The WAREHOUSE form of the problem is different: distinct
users per day are pre-aggregated once, and arbitrary date-range
questions ("distinct users last week/month/quarter") must be answered
from the pre-aggregate WITHOUT rescanning events — impossible with
counts (distinct does not add) but exactly what a mergeable sketch
gives: union(sketch(A), sketch(B)) == sketch(A ∪ B), so any range is a
register-wise merge of its days. This is the same algebra the corpus
overlap operator uses for minhash (``dedup.corpus_source_similarity``),
here with Spark's built-in Apache DataSketches HLL surface
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``).

Scale posture: the sketch table is O(days × lgK registers) — kilobytes
per day regardless of corpus size; the daily build is one pass with
map-side partial sketching (HLL aggregates combine in the partial agg,
so only registers shuffle, never user ids); range queries touch no raw
data at all. The mergeability property and error bound are
pytest-pinned; there is no cross-engine oracle by construction (sketch
registers are engine-specific), so the registered query is a rows-only
driver entry like the other sketch op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..plans.registry import register
from ..session import prepare
from ..sources.sinks import VersionedParquetTable

#: DataSketches HLL log2(registers) — 12 gives ~1.6 % typical relative
#: error in a 4 KB sketch; raise for tighter bounds, same algebra.
LG_K = 12


def daily_user_sketches(events: DataFrame, lg_k: int = LG_K) -> DataFrame:
    """One HLL sketch of ``user_id`` per event day: the pre-aggregate a
    warehouse stores instead of raw id lists. Map-side partial sketches
    merge in the aggregation, so the shuffle carries registers only."""
    return events.groupBy(
        F.to_date("ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_events"),
    )


def range_distinct_users(
    sketches: DataFrame, day_from: str, day_to: str
) -> DataFrame:
    """Distinct users over [day_from, day_to] from stored sketches only:
    one register-wise union, zero raw-data access."""
    return (
        sketches.filter(
            F.col("day").between(F.lit(day_from), F.lit(day_to))
        )
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            F.hll_sketch_estimate("merged").alias("approx_users"),
        )
    )


def range_overlap_users(
    sketches: DataFrame,
    a_from: str,
    a_to: str,
    b_from: str,
    b_to: str,
) -> DataFrame:
    """Inclusion–exclusion overlap between two day ranges, from stored
    sketches only: est(A∩B) = est(A) + est(B) − est(A∪B) (HLL unions
    compose, intersections don't — inclusion–exclusion is the standard
    derived estimator; its error compounds the three per-term bounds,
    documented in the pytest tolerance). Returns one row:
    approx_a, approx_b, approx_union, approx_overlap — e.g. "how many of
    last week's users were also active the week before", answered from
    kilobytes with no raw rescan."""
    in_a = F.col("day").between(F.lit(a_from), F.lit(a_to))
    in_b = F.col("day").between(F.lit(b_from), F.lit(b_to))
    merged = sketches.filter(in_a | in_b).agg(
        F.hll_union_agg(F.when(in_a, F.col("sketch"))).alias("_a"),
        F.hll_union_agg(F.when(in_b, F.col("sketch"))).alias("_b"),
        F.hll_union_agg("sketch").alias("_u"),
    )
    est = lambda c: F.coalesce(  # noqa: E731 — empty range estimates 0
        F.hll_sketch_estimate(c), F.lit(0).cast("bigint")
    )
    return merged.select(
        est("_a").alias("approx_a"),
        est("_b").alias("approx_b"),
        est("_u").alias("approx_union"),
        F.greatest(
            est("_a") + est("_b") - est("_u"), F.lit(0).cast("bigint")
        ).alias("approx_overlap"),
    )


class DailySketchStore:
    """Durable daily-sketch table (the warehouse pre-aggregate), with the
    same ledgered foreachBatch contract as :class:`IncrementalRollup`:
    each appended batch of events re-sketches ONLY its own days and
    merges them register-wise into the stored rows — O(batch) work,
    replay-safe, and any date-range query reads kilobytes."""

    KEYS = ["day"]

    def __init__(self, root: str, lg_k: int = LG_K):
        self.table = VersionedParquetTable(root)
        self.lg_k = lg_k

    def apply_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        batch_id: int | None = None,
        app_id: str = "sketches",
    ) -> int:
        from ..io import release_checkpoint

        # sketch the batch ONCE: the partial feeds batch_days + the
        # union merge, plus every CAS retry — without the checkpoint the
        # batch-wide hll_sketch_agg (the expensive step) re-runs per
        # consumer (same shape, same fix as IncrementalScd2's runs frame)
        part = daily_user_sketches(batch, self.lg_k).localCheckpoint(
            eager=True
        )
        txn = (app_id, batch_id) if batch_id is not None else None
        try:
            return self._apply_part(spark, part, txn, app_id, batch_id)
        finally:
            release_checkpoint(part)

    def _apply_part(self, spark, part, txn, app_id, batch_id) -> int:
        from ..sources.sinks import ConcurrentWriteError

        for _ in range(10):
            if batch_id is not None:
                last = self.table.last_txn(app_id)
                if last is not None and batch_id <= last:
                    return self.table.current_version()
            base_version = self.table.current_version()
            state = self.table.read(spark)
            merged = part
            if state is not None:
                batch_days = part.select("day").distinct()
                affected = state.join(batch_days, "day", "left_semi")
                merged = (
                    affected.unionByName(part)
                    .groupBy("day")
                    .agg(
                        F.hll_union_agg("sketch").alias("sketch"),
                        F.sum("n_events").alias("n_events"),
                    )
                )
            try:
                return self.table.upsert(
                    spark,
                    merged,
                    self.KEYS,
                    txn=txn,
                    expected_base=base_version,
                )
            except ConcurrentWriteError:
                continue  # another writer landed: re-read and re-merge
        raise RuntimeError(
            "DailySketchStore.apply_batch lost the commit race 10 times — "
            "writer contention exceeds the retry budget"
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.table.read(spark)

    def range_estimate(
        self, spark: SparkSession, day_from: str, day_to: str
    ) -> int:
        state = self.read(spark)
        if state is None:
            raise ValueError(
                f"sketch store at {self.table.root} is empty: nothing stored"
            )
        row = range_distinct_users(state, day_from, day_to).first()
        # hll_union_agg over zero stored days yields NULL: the range
        # holds no data, so its distinct count is 0
        return int(row.approx_users) if row.approx_users is not None else 0

    def overlap_estimate(
        self,
        spark: SparkSession,
        a_from: str,
        a_to: str,
        b_from: str,
        b_to: str,
    ):
        """Row(approx_a, approx_b, approx_union, approx_overlap) via
        inclusion–exclusion over the stored sketches — see
        :func:`range_overlap_users`."""
        state = self.read(spark)
        if state is None:
            raise ValueError(
                f"sketch store at {self.table.root} is empty: nothing stored"
            )
        return range_overlap_users(state, a_from, a_to, b_from, b_to).first()


@register("events_daily_sketch_rollup")  # r10 rotation: driver-facing as a
# rows-only row (no oracle: sketch registers are engine-specific); pytest
# bounds the estimates against exact distincts and pins the merge algebra
def events_daily_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day HLL user sketches rendered as estimates — the stored
    pre-aggregate a range query merges. Columns: day, n_events,
    approx_users."""
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    return daily_user_sketches(ev).select(
        "day",
        "n_events",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
    )
