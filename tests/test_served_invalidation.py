"""Served-state staleness is enforced, not assumed (VERDICT r12 #6): a
rewrite of the source table under an sf_dir that already has in-process
serving state (the hourly rollup store, the vector index) must yield
fresh results — via the mtime guard on the memo for implicit rewrites,
and via the ``io.refresh_table`` hook for the explicit form."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_events(spark, sf, n, value):
    spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000)
        ).alias("ts"),
        F.lit(value).cast("double").alias("value"),
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")


def _write_embeddings(spark, sf, n, shift):
    spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: (F.col("id") * 8 + i + shift).cast("float") / 100.0,
        ).alias("embedding"),
    ).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")


def test_served_hourly_rebuilds_on_source_rewrite(spark, tmp_path):
    from datawarehouse_project_spark.catalog import all_queries

    sf = str(tmp_path / "sfa")
    q = all_queries()["events_hourly_from_store"]
    _write_events(spark, sf, 100, 1.0)
    first = q(spark, sf).agg(F.sum("n_events")).collect()[0][0]
    assert first == 100
    _write_events(spark, sf, 250, 2.0)
    second = q(spark, sf).agg(F.sum("n_events")).collect()[0][0]
    assert second == 250  # stale state would still say 100


def test_refresh_table_hook_drops_served_hourly(spark, tmp_path):
    from datawarehouse_project_spark.io import refresh_table
    from datawarehouse_project_spark.operators.events import (
        _SERVED_HOURLY_ROOTS,
        served_hourly_rollup,
    )

    sf = str(tmp_path / "sfb")
    _write_events(spark, sf, 10, 1.0)
    served_hourly_rollup(spark, sf)
    assert sf in _SERVED_HOURLY_ROOTS
    refresh_table(spark, sf, "events")
    assert sf not in _SERVED_HOURLY_ROOTS
    # an unrelated table name leaves the entry alone
    served_hourly_rollup(spark, sf)
    refresh_table(spark, sf, "orders")
    assert sf in _SERVED_HOURLY_ROOTS
    refresh_table(spark)  # wildcard drops everything
    assert sf not in _SERVED_HOURLY_ROOTS


def test_served_vector_index_rebuilds_on_source_rewrite(spark, tmp_path):
    from datawarehouse_project_spark.operators.similarity import (
        _SERVED_INDEX_ROOTS,
        served_vector_index,
    )

    sf = str(tmp_path / "sfc")
    _write_embeddings(spark, sf, 40, 0)
    idx1 = served_vector_index(spark, sf)
    root1 = _SERVED_INDEX_ROOTS[sf][0]
    n1 = idx1.read(spark).count()
    assert n1 == 40
    # same mtime: second call serves the same root, no rebuild
    served_vector_index(spark, sf)
    assert _SERVED_INDEX_ROOTS[sf][0] == root1
    _write_embeddings(spark, sf, 60, 5)
    idx2 = served_vector_index(spark, sf)
    assert _SERVED_INDEX_ROOTS[sf][0] != root1
    assert idx2.read(spark).count() == 60


def test_refresh_table_hook_drops_served_index(spark, tmp_path):
    from datawarehouse_project_spark.io import refresh_table
    from datawarehouse_project_spark.operators.similarity import (
        _SERVED_INDEX_ROOTS,
        served_vector_index,
    )

    sf = str(tmp_path / "sfd")
    _write_embeddings(spark, sf, 20, 0)
    served_vector_index(spark, sf)
    assert sf in _SERVED_INDEX_ROOTS
    refresh_table(spark, sf, "embeddings")
    assert sf not in _SERVED_INDEX_ROOTS
