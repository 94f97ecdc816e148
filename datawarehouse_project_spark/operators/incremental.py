"""Incremental materialized-aggregate maintenance over an append-only fact.

A warehouse that re-runs ``GROUP BY`` over the whole fact for every
refresh pays the full scan every time (the reference recomputes its
quarterly rollups from FACT_TRANSACTIONS on every query —
SQL/olap_queries.sql:24-40 re-aggregates the year each run). At 100 TB
the right shape is incremental view maintenance: aggregate ONLY the new
batch, then fold those partials into the stored rollup. For distributive
aggregates (SUM/COUNT — and AVG derived from them) the fold is itself a
``GROUP BY``:

    new_state[g] = old_state[g] (+) partial_of_batch[g]

so per-batch cost is ``O(batch + affected_groups)``, independent of the
fact's total size. State lives in a :class:`VersionedParquetTable`
(atomic commits, snapshot-isolated readers, time travel), and batch ids
ride the table's writer ledger — an additive merge is NOT naturally
idempotent, so replay protection must be transactional with the data,
which the in-snapshot ``txn`` ledger provides (the Delta
``txnAppId``/``txnVersion`` pattern). A restarted stream re-running its
last epoch becomes a no-op instead of double-counting.

Plan shape per batch: one partial aggregation of the batch (map-side
combine, one shuffle on the group key), a LEFT SEMI join to pull only
the affected incumbent groups (broadcastable — the batch's distinct key
set), one fold aggregation, one upsert. The stored state is
group-cardinality-sized, orders of magnitude smaller than the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.sinks import VersionedParquetTable


class IncrementalRollup:
    """Maintains ``SELECT keys, SUM(c) AS sum_c ..., COUNT(*) AS n_rows
    GROUP BY keys`` incrementally, one appended batch at a time.

    ``sum_cols`` are the measures; every state row carries ``sum_<col>``
    per measure plus ``n_rows``, from which COUNT and AVG are exact.
    """

    def __init__(self, root: str, keys: list[str], sum_cols: list[str]):
        self.table = VersionedParquetTable(root)
        self.keys = list(keys)
        self.sum_cols = list(sum_cols)

    def _partial(self, batch: DataFrame) -> DataFrame:
        return self._stable_sums(
            batch.groupBy(*self.keys).agg(
                *[F.sum(c).alias(f"sum_{c}") for c in self.sum_cols],
                F.count("*").alias("n_rows"),
            )
        )

    @staticmethod
    def _stable_sums(df: DataFrame) -> DataFrame:
        """Pin DECIMAL sum columns at precision 38 (their scale kept).
        Catalyst widens SUM(DECIMAL(p,s)) to DECIMAL(p+10,s), so an exact
        DECIMAL measure would change type on every fold generation
        (partial 28 → folded 38) and trip the state table's schema-
        evolution type guard; 38 is Spark's maximum, so SUM over it is a
        fixed point and every fold commits the same type."""
        from pyspark.sql.types import DecimalType

        cols = []
        for f in df.schema.fields:
            if f.name.startswith("sum_") and isinstance(
                f.dataType, DecimalType
            ):
                cols.append(
                    F.col(f.name)
                    .cast(DecimalType(38, f.dataType.scale))
                    .alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        return df.select(*cols)

    def apply_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        batch_id: int | None = None,
        app_id: str = "rollup",
    ) -> int:
        """Fold one appended batch into the rollup; returns the committed
        table version. With ``batch_id`` (monotonic, e.g. a foreachBatch
        epoch id) the call is idempotent under replay — the additive
        merge is guarded by the snapshot's writer ledger, so a re-run of
        an already-applied batch changes nothing.

        The read-fold-write is a table-level compare-and-swap
        (``expected_base``): if another writer commits between our state
        read and our commit, the fold was derived from a stale snapshot
        and silently last-write-winning would drop the other writer's
        addend — so the table refuses, and we re-read + re-fold. NULL
        group keys are folded with null-safe equality (SQL ``<=>``),
        matching the NULL-grouping semantics of GROUP BY itself."""
        from ..sources.sinks import ConcurrentWriteError

        base_partial = self._partial(batch)
        txn = (app_id, batch_id) if batch_id is not None else None
        for _ in range(10):
            if batch_id is not None:
                last = self.table.last_txn(app_id)
                if last is not None and batch_id <= last:
                    return self.table.current_version()
            base_version = self.table.current_version()
            state = self.table.read(spark)
            partial = base_partial
            if state is not None:
                batch_keys = base_partial.select(*self.keys).distinct()
                cond = None
                for k in self.keys:
                    c = state[k].eqNullSafe(batch_keys[k])
                    cond = c if cond is None else cond & c
                affected = state.join(batch_keys, cond, "left_semi")
                partial = affected.unionByName(base_partial).groupBy(
                    *self.keys
                ).agg(
                    *[
                        F.sum(f"sum_{c}").alias(f"sum_{c}")
                        for c in self.sum_cols
                    ],
                    F.sum("n_rows").alias("n_rows"),
                )
            try:
                return self.table.upsert(
                    spark,
                    partial,
                    self.keys,
                    txn=txn,
                    expected_base=base_version,
                )
            except ConcurrentWriteError:
                continue  # another writer landed: re-read and re-fold
        raise RuntimeError(
            "apply_batch lost the commit race 10 times in a row — writer "
            "contention on this rollup exceeds the retry budget"
        )

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Current rollup state (None before the first batch)."""
        return self.table.read(spark)
