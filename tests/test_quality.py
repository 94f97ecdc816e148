"""Data-quality operators: audit report semantics, the clean/dirty
split, and the audit→quarantine routing on the versioned table
(reference tie: README.md:124-136 — the reference SKIPS bad rows with a
console warning; the warehouse keeps them queryable and replayable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_project_spark.operators.quality import (
    dq_audit,
    dq_quarantine_batch,
    dq_split,
)
from datawarehouse_project_spark.sources.sinks import VersionedParquetTable

def _checks():
    # built lazily: Column construction needs an active SparkContext
    return {
        "nonpositive_qty": F.col("qty") <= 0,
        "null_name": F.col("name").isNull(),
        "price_out_of_range": (F.col("price") < 0) | (F.col("price") > 100),
    }


def _batch(spark):
    rows = [
        (1, "a", 5, 10.0),     # clean
        (2, None, 5, 10.0),    # null_name
        (3, "c", 0, 10.0),     # nonpositive_qty
        (4, "d", 5, -1.0),     # price_out_of_range
        (5, None, -2, 200.0),  # all three rules
        (6, "f", 9, 99.0),     # clean
    ]
    return spark.createDataFrame(rows, "id int, name string, qty int, price double")


def test_dq_audit_empty_table_reports_zero(spark):
    """SUM over an empty table is NULL; the audit must still say 0 per
    rule — an alerting consumer comparing > threshold never sees NULL."""
    empty = _batch(spark).filter(F.lit(False))
    checks = _checks()
    rows = {r["rule"]: r["n_violations"] for r in dq_audit(empty, checks).collect()}
    assert rows == {name: 0 for name in checks}
    assert all(v == 0 and v is not None for v in rows.values())


def test_dq_audit_extra_aggs_share_the_pass(spark):
    """r22 scan fusion: table-level aggregates (duplicate-key counts)
    ride the same aggregation pass as the row rules and unpivot into the
    same (rule, n_violations) report — value-identical to the standalone
    dq_duplicates expression they replace."""
    import pytest

    df = _batch(spark).unionAll(_batch(spark).filter(F.col("id") == 1))
    rows = {
        r["rule"]: r["n_violations"]
        for r in dq_audit(
            df,
            {"nonpositive_qty": F.col("qty") <= 0},
            extra_aggs={
                "dup_ids": (F.count("*") - F.countDistinct("id")).cast("bigint")
            },
        ).collect()
    }
    assert rows == {"nonpositive_qty": 2, "dup_ids": 1}
    # name collisions across the two maps are a caller bug, not a merge
    with pytest.raises(ValueError, match="duplicated"):
        dq_audit(
            df,
            {"x": F.col("qty") <= 0},
            extra_aggs={"x": F.count("*").cast("bigint")},
        )


def test_dq_audit_registered_row_fused_plan_shape(spark, sf_dir):
    """The registered dq_audit_orders_lineitem plan reads each parquet
    table at most twice after the r22 fusion (orders: fused agg + the
    distinct keys build side; lineitem: once) — 3 scans total, down from
    5. Regression guard for the scan fusion."""
    from datawarehouse_project_spark.catalog import all_queries

    df = all_queries()["dq_audit_orders_lineitem"](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    scans = re.findall(
        r"Location: InMemoryFileIndex \[[^\]]*/(\w+)\.parquet\]", plan
    )
    counts = {t: scans.count(t) for t in set(scans)}
    assert counts == {"orders": 2, "lineitem": 1}, counts


def test_dq_split_tags_every_broken_rule(spark):
    checks = _checks()
    clean, dirty = dq_split(_batch(spark), checks)
    assert sorted(r["id"] for r in clean.select("id").collect()) == [1, 6]
    tags = {
        r["id"]: sorted(r["violations"])
        for r in dirty.select("id", "violations").collect()
    }
    assert tags == {
        2: ["null_name"],
        3: ["nonpositive_qty"],
        4: ["price_out_of_range"],
        5: sorted(checks),
    }
    # split is exhaustive and disjoint
    assert clean.count() + dirty.count() == 6


def test_dq_quarantine_batch_end_to_end_replay_safe(spark, tmp_path):
    """Dirty batch → audit → versioned quarantine table + clean fact;
    re-running the same batch (at-least-once replay) changes neither
    table's contents and no-ops both ledgers."""
    fact = VersionedParquetTable(str(tmp_path / "fact"))
    quar = VersionedParquetTable(str(tmp_path / "quarantine"))
    batch = _batch(spark)
    checks = _checks()

    out = dq_quarantine_batch(
        spark, batch, checks, ["id"], fact, quar, txn=("ingest", 1)
    )
    assert out["fact_version"] == 1 and out["quarantine_version"] == 1
    fact_ids = sorted(r["id"] for r in fact.read(spark).select("id").collect())
    assert fact_ids == [1, 6]
    q = {
        r["id"]: sorted(r["violations"])
        for r in quar.read(spark).select("id", "violations").collect()
    }
    assert set(q) == {2, 3, 4, 5} and q[5] == sorted(checks)

    # replay the SAME batch/txn: exactly-once in effect — version
    # numbers do not advance, contents identical
    out2 = dq_quarantine_batch(
        spark, batch, checks, ["id"], fact, quar, txn=("ingest", 1)
    )
    assert out2 == {"fact_version": 1, "quarantine_version": 1}
    assert sorted(r["id"] for r in fact.read(spark).select("id").collect()) == fact_ids

    # the NEXT batch (higher txn version) applies; a fixed-up row moves
    # from quarantine-only to the fact table
    fixed = spark.createDataFrame(
        [(3, "c", 7, 10.0), (7, "g", 1, 1.0)],
        "id int, name string, qty int, price double",
    )
    out3 = dq_quarantine_batch(
        spark, fixed, checks, ["id"], fact, quar, txn=("ingest", 2)
    )
    assert out3["fact_version"] == 2
    assert sorted(
        r["id"] for r in fact.read(spark).select("id").collect()
    ) == [1, 3, 6, 7]


def test_streaming_ingest_with_quarantine_routing(spark, tmp_path):
    """End-to-end streaming ingest: file stream → per-batch audit →
    clean rows to the fact table, rule-tagged rows to quarantine — and a
    FULL stream replay (fresh query, no checkpoint) is exactly-once in
    effect because the batch txn ids no-op both ledgers."""
    from pyspark.sql import types as T

    src = str(tmp_path / "src")
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    rows = [
        (1, "a", 5, 10.0), (2, None, 5, 10.0), (3, "c", 0, 10.0),
        (4, "d", 5, -1.0), (5, "e", 9, 99.0), (6, "f", 1, 1.0),
    ]
    df = spark.createDataFrame(rows, schema)
    df.withColumn("part", (F.col("id") % 3).cast("int")).write.partitionBy(
        "part"
    ).mode("overwrite").parquet(src)

    fact = VersionedParquetTable(str(tmp_path / "fact"))
    quar = VersionedParquetTable(str(tmp_path / "quarantine"))
    checks = _checks()

    def run_once():
        (
            spark.readStream.schema(
                T.StructType(list(schema.fields) + [T.StructField("part", T.IntegerType())])
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .drop("part")
            .writeStream.foreachBatch(
                lambda bdf, bid: dq_quarantine_batch(
                    spark, bdf, checks, ["id"], fact, quar,
                    txn=("stream-ingest", bid),
                )
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run_once()
    clean_ids = sorted(r["id"] for r in fact.read(spark).select("id").collect())
    dirty_ids = sorted(r["id"] for r in quar.read(spark).select("id").collect())
    assert clean_ids == [1, 5, 6]
    assert dirty_ids == [2, 3, 4]
    fv, qv = fact.current_version(), quar.current_version()

    run_once()  # no checkpoint: every batch replays; ledgers no-op all
    assert sorted(r["id"] for r in fact.read(spark).select("id").collect()) == clean_ids
    assert sorted(r["id"] for r in quar.read(spark).select("id").collect()) == dirty_ids
    assert fact.current_version() == fv and quar.current_version() == qv


def test_dq_replay_quarantine_promotes_after_rule_fix(spark, tmp_path):
    """The quarantine's second half: after the rules are LOOSENED,
    replaying the quarantine promotes now-clean rows into the fact,
    removes them from quarantine, refreshes the remaining rows'
    violation tags, and the whole three-commit operation is
    exactly-once under txn replay."""
    from datawarehouse_project_spark.operators.quality import (
        dq_replay_quarantine,
    )

    fact = VersionedParquetTable(str(tmp_path / "fact"))
    quar = VersionedParquetTable(str(tmp_path / "quarantine"))
    dq_quarantine_batch(
        spark, _batch(spark), _checks(), ["id"], fact, quar, txn=("ingest", 1)
    )
    # rules v2: negative prices are now defaulted upstream, so the
    # price range check is dropped — row 4 becomes clean; rows 2/3/5
    # still violate (5 under fewer rules than before -> tags refresh)
    fixed_checks = {
        "nonpositive_qty": F.col("qty") <= 0,
        "null_name": F.col("name").isNull(),
    }
    out = dq_replay_quarantine(
        spark, fixed_checks, ["id"], fact, quar, txn=("requal", 1)
    )
    assert out["promoted"] == 1
    assert sorted(
        r["id"] for r in fact.read(spark).select("id").collect()
    ) == [1, 4, 6]
    q = {
        r["id"]: sorted(r["violations"])
        for r in quar.read(spark).select("id", "violations").collect()
    }
    assert set(q) == {2, 3, 5}
    assert q[5] == ["nonpositive_qty", "null_name"]  # refreshed: 2 rules now
    fv, qv = fact.current_version(), quar.current_version()

    # txn replay of the SAME requalification: nothing moves
    out2 = dq_replay_quarantine(
        spark, fixed_checks, ["id"], fact, quar, txn=("requal", 1)
    )
    assert out2["promoted"] == -1
    assert fact.current_version() == fv and quar.current_version() == qv

    # a later requalification with unchanged rules promotes nothing but
    # still runs (tags rewritten identically)
    out3 = dq_replay_quarantine(
        spark, fixed_checks, ["id"], fact, quar, txn=("requal", 2)
    )
    assert out3["promoted"] == 0
    assert sorted(
        r["id"] for r in fact.read(spark).select("id").collect()
    ) == [1, 4, 6]
    assert {
        r["id"] for r in quar.read(spark).select("id").collect()
    } == {2, 3, 5}
