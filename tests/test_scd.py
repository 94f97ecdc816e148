"""SCD Type 2, temperature mixing, and int8-quantization invariants —
properties the DuckDB parity tests can't state (they pin values; these
pin the SEMANTICS the values must obey)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_project_spark.catalog import all_queries

_Q = all_queries()


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    """Per user: versions are 1..n dense, intervals are contiguous
    (valid_to == next valid_from), non-overlapping, and exactly one row
    is current (the open interval)."""
    hist = _Q["scd2_user_state_history"](spark, sf_dir).cache()
    try:
        # exactly one open interval per user
        cur = (
            hist.groupBy("user_id")
            .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
            .filter(F.col("n_cur") != 1)
            .count()
        )
        assert cur == 0
        # dense versions starting at 1
        dense = (
            hist.groupBy("user_id")
            .agg(
                F.min("version").alias("lo"),
                F.max("version").alias("hi"),
                F.count("*").alias("n"),
            )
            .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
            .count()
        )
        assert dense == 0
        # contiguity: valid_to of version v == valid_from of version v+1
        # shift the NEXT row's valid_from back onto version v
        nxt = hist.select(
            "user_id",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
        )
        gaps = (
            hist.filter(F.col("valid_to").isNotNull())
            .join(nxt, ["user_id", "version"])
            .filter(F.col("valid_to") != F.col("next_from"))
            .count()
        )
        assert gaps == 0
        # run lengths account for every event
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert hist.agg(F.sum("run_events")).first()[0] == n_events
        # consecutive runs never share an attribute value (they'd be one run)
        prev = hist.select(
            "user_id",
            (F.col("version") + 1).alias("version"),
            F.col("event_type").alias("prev_type"),
        )
        merged_runs = (
            hist.join(prev, ["user_id", "version"])
            .filter(F.col("event_type") == F.col("prev_type"))
            .count()
        )
        assert merged_runs == 0
    finally:
        hist.unpersist()


def test_scd2_asof_matches_history_lookup(spark, sf_dir):
    """Every non-null as-of assignment must be the unique history row
    whose interval contains the order date; null assignments must predate
    the user's first interval."""
    hist = _Q["scd2_user_state_history"](spark, sf_dir)
    asof = _Q["scd2_dim_asof_orders"](spark, sf_dir).cache()
    try:
        joined = asof.filter(F.col("state_version").isNotNull()).join(
            hist.select(
                "user_id",
                F.col("version").alias("state_version"),
                "valid_from",
                "valid_to",
            ),
            ["user_id", "state_version"],
        )
        out_of_interval = joined.filter(
            (F.col("o_orderdate") < F.col("valid_from"))
            | (
                F.col("valid_to").isNotNull()
                & (F.col("o_orderdate") >= F.col("valid_to"))
            )
        ).count()
        assert out_of_interval == 0
        first = hist.groupBy("user_id").agg(F.min("valid_from").alias("first_from"))
        bad_nulls = (
            asof.filter(F.col("state_version").isNull())
            .join(first, "user_id")
            .filter(F.col("o_orderdate") >= F.col("first_from"))
            .count()
        )
        assert bad_nulls == 0
    finally:
        asof.unpersist()


def test_temperature_rates_monotone_and_rarest_keeps_all(spark, sf_dir):
    """T=2 mixing: the rarest language samples at rate 1.0 (per-mille
    1000) and keep-rates are non-increasing in language frequency."""
    rows = _Q["sample_lang_temperature"](spark, sf_dir).collect()
    by_n = sorted(rows, key=lambda r: r.n_total)
    assert by_n[0].keep_permille == 1000
    for a, b in zip(by_n, by_n[1:]):
        assert a.keep_permille >= b.keep_permille
    for r in rows:
        assert 0 < r.keep_permille <= 1000
        assert r.n_kept <= r.n_total


def test_quantized_topk_recall_against_exact(spark, sf_correct_dir):
    """int8 quantization must preserve the exact cosine top-10 almost
    perfectly on the test corpus (measured 1.0 at sf0.01; gate at 0.9
    to absorb future corpus changes)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in _Q["similarity_ann_cosine_topk"](spark, sf_correct_dir).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in _Q["similarity_quantized_topk"](spark, sf_correct_dir).collect()
    }
    assert len(exact & quant) / len(exact) >= 0.9


def test_quantized_vectors_stay_in_int8_range(spark, sf_dir):
    """Every quantized coordinate must fit int8: |q_i| <= 127 — the
    4x-smaller representation is the point of the operator."""
    from datawarehouse_project_spark.io import table
    from datawarehouse_project_spark.operators.similarity import (  # noqa: F401
        similarity_quantized_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    base = emb.select("embedding", scale.alias("scale"))
    qmax = base.select(
        F.array_max(
            F.transform(
                "embedding",
                lambda x: F.abs(
                    F.when(F.col("scale") == 0.0, F.lit(0).cast("bigint")).otherwise(
                        F.round((x.cast("double") * 127.0) / F.col("scale")).cast(
                            "bigint"
                        )
                    )
                ),
            )
        ).alias("m")
    )
    assert qmax.agg(F.max("m")).first()[0] <= 127
