"""Streaming dedup: replayed (at-least-once) input yields each key exactly
once across all emitted batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_project_spark.io import table
from datawarehouse_project_spark.streaming.dedup_stream import run_dedup_stream


def test_stream_dedup_exactly_once(spark, tmp_path):
    ev = table(spark, "/root/testdata/sf0.001", "events").limit(500)
    src = str(tmp_path / "dup_chunks")
    # simulate at-least-once delivery: every event delivered twice, in two
    # different files (=> different micro-batches)
    ev.withColumn("part", F.lit(0)).write.partitionBy("part").mode(
        "overwrite"
    ).parquet(src)
    ev.withColumn("part", F.lit(1)).write.partitionBy("part").mode(
        "append"
    ).parquet(src)

    batches = []
    run_dedup_stream(
        spark,
        src,
        ev.schema,
        keys=["event_id"],
        sink=lambda df, bid: batches.append(df.collect()),
        watermark="365 days",  # generated data spans a month
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    emitted = [r.event_id for b in batches for r in b]
    assert len(emitted) == len(set(emitted)), "no key may be emitted twice"
    assert set(emitted) == {r.event_id for r in ev.collect()}
