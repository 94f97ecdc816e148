"""Streaming MESHJOIN analog: stream-relation enrichment on micro-batches.

The reference algorithm (MeshJoin.java:216-284, after Polyzotis et al.,
ICDE 2008) pages dimension partitions cyclically against a FIFO queue of
stream chunks because its dims exceed app-tier RAM. On Spark the idiomatic
equivalent needs none of that machinery (SURVEY §2.8):

* micro-batch            = the reference's "chunk" (``maxFilesPerTrigger``)
* dim paging + queue     = the join executor itself: broadcast hash join for
                           small dims; shuffled-hash/sort-merge with spill
                           when dims exceed memory — no custom state
* per-match FACT upsert  = idempotent per-batch sink (dedup by PK), giving
                           exactly-once rows where the reference relied on
                           ON DUPLICATE KEY UPDATE to absorb re-emissions

Inner-join emission (only rows matching both dims) mirrors the reference's
MESHJOIN (MeshJoin.java:264); ``how='left'`` gives the metro.sql variant.

Equivalence contract (tested): streaming over chunked input produces exactly
the rows of the batch join — byte-identical after sorting.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import prepare


def enrich_batch(
    stream_df: DataFrame,
    dims: dict[str, tuple[DataFrame, str]],
    how: str = "inner",
    broadcast_dims: bool = True,
) -> DataFrame:
    """One enrichment step: join the (micro-)batch against each dimension.

    ``dims`` maps a name to (dim_df, join_key). With ``broadcast_dims`` the
    plan is a chain of broadcast hash joins — one stage, zero shuffles,
    which is the whole point of replacing MESHJOIN's paging; at huge dims
    pass False and let AQE pick shuffle joins.
    """
    out = stream_df
    for _, (dim, key) in dims.items():
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, key, how)
    return out


def run_meshjoin_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema,
    dims: dict[str, tuple[DataFrame, str]],
    sink: Callable[[DataFrame, int], None],
    files_per_trigger: int = 1,
    how: str = "inner",
    checkpoint_dir: str | None = None,
) -> None:
    """Consume a file-based stream in chunks and enrich each micro-batch.

    ``sink(batch_df, batch_id)`` receives the enriched batch; idempotence
    (e.g. PK dedup before append) is the sink's contract, matching the
    reference's upsert semantics. Runs with availableNow=True so tests and
    backfills drain the source deterministically; a live deployment drops
    that trigger and keeps everything else.
    """
    prepare(spark)
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(source_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink(enrich_batch(batch_df, dims, how=how), batch_id)

    writer = stream.writeStream.foreachBatch(handle).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer.start().awaitTermination()
