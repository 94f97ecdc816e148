"""Write paths: partitioned parquet, bucketed tables, and upsert-merge.

The reference's only sink is per-row JDBC upsert (MeshJoin.java:79,145,207,
374 — one round-trip per row, the dominant cost of its ETL). The Spark
equivalents:

* ``write_partitioned`` — columnar parquet laid out by partition columns
  (date is the natural choice for the fact table: enables partition
  pruning for every year/quarter/month query in the catalog);
* ``write_bucketed`` — hash-bucketed by join key so repeated fact⨝fact or
  fact⨝bigdim joins co-locate without a shuffle (SURVEY §4: the
  pre-shuffle trade);
* ``upsert_parquet`` — the S7 PK upsert as a deterministic read-merge-write
  (last-write-wins vs the incumbent rows). On a mutable table format
  (Delta/Iceberg — not in this container) this is ``MERGE INTO``; the
  semantics here are identical and idempotent, which is what the streaming
  sink needs for exactly-once effect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .csv_ingest import dedup_last_wins


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partition-pruned parquet layout. At 100 TB, choose partition columns
    with bounded cardinality (date, not user_id) — small-file explosion is
    the classic failure; AQE coalescing keeps file counts sane per
    partition."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table: both sides of a future equi-join on
    ``bucket_col`` bucketed with the same count join shuffle-free."""
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table_name)
    )


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    pk: list[str],
) -> None:
    """Last-write-wins upsert into a parquet target: incoming rows beat
    incumbent rows on PK collision; otherwise union. Idempotent (replaying
    the same batch changes nothing) — the property the reference's
    ON DUPLICATE KEY UPDATE provided and our streaming sink contract
    requires."""
    cols = incoming.columns
    # Within-batch ordinal: monotonically_increasing_id over the incoming
    # frame — duplicates INSIDE one batch resolve deterministically by the
    # batch's own (partition, offset) order, the only row order a
    # distributed batch has (same input plan => same winner on replay,
    # which is what idempotence needs). Incumbent rows sit below every
    # incoming row (-1), so any incoming PK beats the stored one.
    ordered = incoming.withColumn("_ordinal", F.monotonically_increasing_id())
    if os.path.exists(path):
        incumbent = (
            spark.read.parquet(path)
            .select(cols)
            .withColumn("_ordinal", F.lit(-1).cast("bigint"))
        )
        merged = dedup_last_wins(
            incumbent.unionByName(ordered), pk, ordinal="_ordinal"
        ).drop("_ordinal")
    else:
        merged = dedup_last_wins(ordered, pk, ordinal="_ordinal").drop("_ordinal")
    # parquet cannot overwrite in place from its own scan: stage fully,
    # then swap via RENAMES (one write, not a second full copy).
    # Crash-recovery story: the incumbent is renamed ASIDE (path._old),
    # the staged result renamed into place, THEN ._old is deleted — a
    # crash between any two steps leaves at least one complete copy on
    # disk (._staged before the swap, ._old during it), never zero live
    # data; recovery is "rename whichever complete dir back". The swap
    # window is still not atomic under CONCURRENT writers — documented
    # limitation; a table format (Delta/Iceberg MERGE) is the concurrent
    # answer.
    import shutil

    tmp = path.rstrip("/") + "._staged"
    old = path.rstrip("/") + "._old"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
