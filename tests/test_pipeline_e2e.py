"""End-to-end LLM-corpus pipeline: the real operators chained the way a
training-data job would run them — redact -> decontaminate -> near-dup
dedup (keep best quality) -> split -> pack -> shard -> write. One test,
global invariants at every stage; every stage is an operator that is
individually oracle-gated elsewhere, so this pins the COMPOSITION."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from datawarehouse_project_spark.io import table
from datawarehouse_project_spark.operators.dedup import dedup_keep_best_quality
from datawarehouse_project_spark.operators.sampling import (
    N_SHARDS,
    corpus_shard_assignments,
)
from datawarehouse_project_spark.operators.textstats import (
    BENCHMARK_SOURCE,
    pii_redact_sql,
    text_decontaminate_vs_benchmark,
)


def test_llm_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. PII scrub (no-op on this corpus, but the column flows through).
    scrubbed = docs.selectExpr(
        "doc_id", "lang", "source", f"{pii_redact_sql('text')} AS text"
    )

    # 2. Decontaminate: drop the benchmark-source docs themselves AND any
    #    corpus doc sharing an 8-gram with them.
    contaminated = text_decontaminate_vs_benchmark(spark, sf_dir).select(
        "doc_id"
    )
    clean = scrubbed.filter(F.col("source") != BENCHMARK_SOURCE).join(
        contaminated, "doc_id", "left_anti"
    )
    n_bench = docs.filter(F.col("source") == BENCHMARK_SOURCE).count()
    n_contam = contaminated.count()
    n_clean = clean.count()
    assert n_clean == n_docs - n_bench - n_contam  # contaminated ⊄ benchmark

    # 3. Near-dup dedup, keeping the best-quality member per cluster.
    kept_ids = {
        r["doc_id"]
        for r in dedup_keep_best_quality(spark, sf_dir)
        .filter("kept")
        .collect()
    }
    deduped = clean.filter(F.col("doc_id").isin(list(kept_ids)))
    n_dedup = deduped.count()
    assert n_dedup <= n_clean

    # 4. Deterministic 90/5/5 split (same salted-hash expression as the
    #    registered census query).
    split = deduped.withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000,
    ).withColumn(
        "split",
        F.when(F.col("bucket") < 900, "train")
        .when(F.col("bucket") < 950, "val")
        .otherwise("test"),
    )
    per_split = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(per_split.values()) == n_dedup  # exhaustive + disjoint

    # 5. Pack the train docs per lang (concat-and-chop at a 64-token
    #    budget) and check token conservation over the pipeline subset.
    train = split.filter(F.col("split") == "train")
    from pyspark.sql import Window

    B = 64
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = train.selectExpr(
        "lang", "doc_id", "size(split(lower(trim(text)), '\\\\s+')) AS n_tokens"
    ).filter("n_tokens >= 1")
    cum = tok.withColumn(
        "cum_end", F.sum("n_tokens").over(w).cast("bigint")
    ).withColumn("cum_start", F.col("cum_end") - F.col("n_tokens"))
    spans = cum.selectExpr(
        "lang",
        "doc_id",
        "cum_start",
        "cum_end",
        f"explode(sequence(CAST(floor(cum_start / {B}) AS BIGINT), "
        f"CAST(floor((cum_end - 1) / {B}) AS BIGINT))) AS pack_id",
    ).selectExpr(
        "lang",
        "doc_id",
        "pack_id",
        f"CAST(least(cum_end, (pack_id + 1) * {B}) "
        f"- greatest(cum_start, pack_id * {B}) AS BIGINT) AS n_tok",
    ).collect()
    total_tokens = sum(r["n_tokens"] for r in tok.collect())
    assert sum(r["n_tok"] for r in spans) == total_tokens
    packs = defaultdict(int)
    for r in spans:
        packs[(r["lang"], r["pack_id"])] += r["n_tok"]
    assert all(v <= B for v in packs.values())

    # 6. Shard + write: assign shards over the full corpus, restrict to
    #    the pipeline's surviving train docs, write partitioned by shard,
    #    read back and reconcile counts.
    shards = corpus_shard_assignments(spark, sf_dir)
    out = str(tmp_path / "train_shards")
    train_sharded = train.join(shards, "doc_id").select(
        "doc_id", "lang", "text", "shard_id"
    )
    train_sharded.write.partitionBy("shard_id").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == train.count()
    seen_shards = {r["shard_id"] for r in back.select("shard_id").distinct().collect()}
    assert seen_shards <= set(range(N_SHARDS))

    # 7. Hygiene: nothing contaminated or benchmark-sourced survived into
    #    the written training set.
    bad = back.join(contaminated, "doc_id", "inner").count()
    assert bad == 0
    bench_ids = docs.filter(F.col("source") == BENCHMARK_SOURCE).select("doc_id")
    assert back.join(bench_ids, "doc_id", "inner").count() == 0


def test_warehouse_pipeline_scd2_end_to_end(spark, sf_dir):
    """Warehouse-side composition: star fact -> SCD2 dimension history
    from the change log -> temporal as-of enrichment of orders ->
    revenue rolled up by the dimension state in effect when each order
    was placed. Every stage is an oracle-gated operator; this pins that
    the COMPOSITION conserves revenue and accounts for every order
    exactly once."""
    from datawarehouse_project_spark.catalog import all_queries
    from datawarehouse_project_spark.plans.star import fact

    q = all_queries()
    asof = q["scd2_dim_asof_orders"](spark, sf_dir)

    # revenue per order from the enriched star fact (reference shape:
    # order_id / sale)
    f = fact(spark, sf_dir)
    rev = f.groupBy(F.col("order_id").alias("o_orderkey")).agg(
        F.sum("sale").cast("double").alias("revenue")
    )
    enriched = asof.join(rev, "o_orderkey", "left")

    # each probed order appears exactly once after enrichment
    assert enriched.count() == asof.count()
    assert (
        enriched.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    )

    by_state = enriched.groupBy("state_at_order").agg(
        F.sum("revenue").alias("revenue"), F.count("*").alias("n_orders")
    )
    rows = by_state.collect()
    # revenue conservation across dimension states (NULL state = orders
    # predating the user's first recorded state — still accounted)
    total_grouped = sum(r.revenue or 0.0 for r in rows)
    total_direct = (
        enriched.agg(F.sum("revenue")).first()[0] or 0.0
    )
    assert abs(total_grouped - total_direct) < 1e-6 * max(abs(total_direct), 1.0)
    assert sum(r.n_orders for r in rows) == asof.count()
    # the dimension attribute really varies (the rollup is non-trivial)
    assert len(rows) >= 3
