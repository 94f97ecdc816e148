"""Streaming equivalence tests: the MESHJOIN analog and the watermarked
window aggregate must reproduce their batch twins exactly (the reference's
own implicit invariant — SURVEY §5.2.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_project_spark.io import table
from datawarehouse_project_spark.operators.events import events_enrich_meshjoin
from datawarehouse_project_spark.streaming.meshjoin import (
    enrich_batch,
    run_meshjoin_stream,
)
from datawarehouse_project_spark.streaming.stream_join import (
    click_attribution,
    run_stream_stream_join,
    split_clicks_purchases,
)
from datawarehouse_project_spark.streaming.windows import (
    run_windowed_stream,
    windowed_counts,
)


@pytest.fixture(scope="module")
def chunked_events(spark, tmp_path_factory):
    """events split into 4 parquet files = 4 micro-batch 'chunks'."""
    src = str(tmp_path_factory.mktemp("events_chunks"))
    ev = table(spark, "/root/testdata/sf0.001", "events")
    ev.withColumn("part", (F.col("event_id") % 4).cast("int")).write.partitionBy(
        "part"
    ).mode("overwrite").parquet(src)
    # schema of the partitioned files (without the partition col at read)
    return src, ev.schema


def _collect_sorted(df):
    return sorted(map(str, df.collect()))


def test_meshjoin_stream_equals_batch(spark, chunked_events, tmp_path):
    src, schema = chunked_events
    cust = table(spark, "/root/testdata/sf0.001", "customer")

    got = []
    run_meshjoin_stream(
        spark,
        src,
        schema,
        dims={"customer": (cust.withColumnRenamed("c_custkey", "user_id"), "user_id")},
        sink=lambda df, bid: got.append(df.collect()),
        files_per_trigger=1,
        how="inner",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert len(got) >= 2, "stream must process multiple chunks"
    streamed = sorted(str(r) for batch in got for r in batch)

    ev = spark.read.schema(schema).parquet(src)
    batch = enrich_batch(
        ev,
        {"customer": (cust.withColumnRenamed("c_custkey", "user_id"), "user_id")},
        how="inner",
    )
    assert streamed == _collect_sorted(batch)


def test_windowed_stream_equals_batch(spark, chunked_events, tmp_path):
    src, schema = chunked_events

    last = {}
    run_windowed_stream(
        spark,
        src,
        schema,
        sink=lambda df, bid: last.update({"rows": df.collect()}),
        window_duration="1 hour",
        watermark="2 hours",
        files_per_trigger=2,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    streamed = sorted(map(str, last["rows"]))

    ev = spark.read.schema(schema).parquet(src)
    batch = windowed_counts(ev, "1 hour", "2 hours")
    assert streamed == _collect_sorted(batch)
    assert len(streamed) > 10


def test_stream_stream_join_equals_batch(spark, chunked_events, tmp_path):
    """The watermarked stream-stream inner join must emit exactly the
    batch join's pairs. The chunk fixture splits by event_id, so a chunk
    spans the full month — an unordered backfill — and the documented
    contract is that the watermark must cover the source's event-time
    disorder; hence the full-span watermark here. Eager emission (inner
    joins don't wait for the watermark) is asserted via rows arriving
    across multiple micro-batches."""
    src, schema = chunked_events

    got = []
    run_stream_stream_join(
        spark,
        src,
        schema,
        sink=lambda df, bid: got.append(df.collect()),
        watermark="40 days",
        files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    batches_with_rows = [b for b in got if b]
    assert len(batches_with_rows) >= 2, "pairs must be emitted incrementally"
    streamed = sorted(str(r) for batch in got for r in batch)

    ev = spark.read.schema(schema).parquet(src)
    batch = click_attribution(*split_clicks_purchases(ev))
    assert streamed == _collect_sorted(batch)
    assert len(streamed) > 0
