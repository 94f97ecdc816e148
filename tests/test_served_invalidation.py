"""Served-state staleness is enforced, not assumed (VERDICT r12 #6): a
rewrite of the source table under an sf_dir that already has in-process
serving state (the hourly rollup store, the vector index) must yield
fresh results — via the mtime guard on the memo for implicit rewrites,
and via the ``io.refresh_table`` hook for the explicit form."""

from __future__ import annotations

from pyspark.sql import functions as F


import pytest

# r22 fast-lane split, second pass (measured: the first fast lane still
# ran 16.5 min on this box — over the driver-timeout safety margin):
# this module's VALUE semantics are gated by the fast lane's sf0.001
# oracle-parity sweep; its deeper coverage runs in the slow lane
# (`pytest -m slow`, the round-end full sweep).
pytestmark = pytest.mark.slow


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
        _SERVED_HOURLY_MEMO,
        served_hourly_rollup,
    )

    _SERVED_HOURLY_ROOTS = _SERVED_HOURLY_MEMO.roots

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
        _SERVED_INDEX_MEMO,
        served_vector_index,
    )

    _SERVED_INDEX_ROOTS = _SERVED_INDEX_MEMO.roots

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
        _SERVED_INDEX_MEMO,
        served_vector_index,
    )

    _SERVED_INDEX_ROOTS = _SERVED_INDEX_MEMO.roots

    sf = str(tmp_path / "sfd")
    _write_embeddings(spark, sf, 20, 0)
    served_vector_index(spark, sf)
    assert sf in _SERVED_INDEX_ROOTS
    refresh_table(spark, sf, "embeddings")
    assert sf not in _SERVED_INDEX_ROOTS


def _write_fact_sources(spark, sf, n_orders, price):
    """A minimal 5-table star fixture for the fact builder."""
    spark.range(5).select(
        F.col("id").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
    ).write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    spark.range(1, 11).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        (F.col("id") % 5).alias("s_nationkey"),
    ).write.mode("overwrite").parquet(f"{sf}/supplier.parquet")
    spark.range(1, 21).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("Part#"), F.col("id")).alias("p_name"),
        (F.col("id") * 1.5).alias("p_retailprice"),
    ).write.mode("overwrite").parquet(f"{sf}/part.parquet")
    spark.range(1, n_orders + 1).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 7).alias("o_custkey"),
        F.lit("1997-03-01").cast("date").alias("o_orderdate"),
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    spark.range(1, n_orders + 1).select(
        F.col("id").alias("l_orderkey"),
        F.lit(1).alias("l_linenumber"),
        (F.col("id") % 20 + 1).alias("l_partkey"),
        (F.col("id") % 10 + 1).alias("l_suppkey"),
        F.lit(2.0).alias("l_quantity"),
        F.lit(float(price)).alias("l_extendedprice"),
        F.lit("1997-03-05").cast("date").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")


def test_q01_from_store_rebuilds_on_fact_source_rewrite(spark, tmp_path):
    """The product-rollup serving memo AND the fact() plan memo both
    carry mtime tokens: rewriting a fact source table in-process yields
    fresh served answers with no explicit invalidation call."""
    from datawarehouse_project_spark.catalog import all_queries

    sf = str(tmp_path / "sfq")
    q = all_queries()["q01_from_store"]
    _write_fact_sources(spark, sf, 40, 100.0)
    first = q(spark, sf).collect()
    assert first and abs(first[0].total_sales - 200.0) < 1e-9  # 2 rows/part
    _write_fact_sources(spark, sf, 40, 500.0)
    second = q(spark, sf).collect()
    assert second and abs(second[0].total_sales - 1000.0) < 1e-9


def test_q01_from_store_plan_is_state_topk_no_fact_scan(spark):
    """The serving pin: TakeOrderedAndProject over the rollup state;
    zero scans of any fact source table in the query plan."""
    from datawarehouse_project_spark.catalog import all_queries

    df = all_queries()["q01_from_store"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    for t in ("lineitem", "orders", "part.parquet", "supplier", "nation"):
        assert t not in plan, t


def test_refresh_table_drops_fact_plan_memo(spark, tmp_path):
    """refresh_table must reach the fact() PLAN memo too: on non-stat-able
    dirs the memo's mtime token never changes, so the explicit refresh is
    its only invalidation path (r13 review finding). Materialized-fact
    pins (bare frames) are deliberate overrides and must survive."""
    from datawarehouse_project_spark.io import refresh_table
    from datawarehouse_project_spark.plans.star import fact

    sf = str(tmp_path / "sff")
    _write_fact_sources(spark, sf, 10, 100.0)
    fact(spark, sf)
    assert isinstance(spark._dw_fact_cache[sf], tuple)
    # unrelated table name: the fact plan stays memoized
    refresh_table(spark, sf, "events")
    assert sf in spark._dw_fact_cache
    # a fact source table: the derived plan is dropped with it
    refresh_table(spark, sf, "lineitem")
    assert sf not in spark._dw_fact_cache
    # wildcard refresh drops it too
    fact(spark, sf)
    refresh_table(spark)
    assert sf not in spark._dw_fact_cache
    # a materialized-fact pin (bare frame, no token) survives refresh
    pinned = fact(spark, sf)
    spark._dw_fact_cache[sf] = pinned
    refresh_table(spark, sf, "lineitem")
    assert spark._dw_fact_cache[sf] is pinned
    del spark._dw_fact_cache[sf]


def test_serving_memo_retires_stale_roots_without_deleting(spark, tmp_path):
    """A root displaced by staleness must NOT be rmtree'd immediately — a
    previously-returned handle may still hold lazy plans against it
    (deleting turns stale-but-consistent serving into FileNotFoundError
    mid-use; r13 review finding). Displaced roots are retired and
    reclaimed at reset()."""
    import os

    from datawarehouse_project_spark.io import ServingMemo, refresh_table

    memo = ServingMemo("dwtest-retire-", ["events"])
    sf = str(tmp_path / "sfr")
    _write_events(spark, sf, 10, 1.0)

    built = []

    def build(root):
        with open(os.path.join(root, "state.txt"), "w") as f:
            f.write("v%d" % len(built))
        built.append(root)

    root1 = memo.get_or_build(sf, build)
    _write_events(spark, sf, 20, 2.0)  # stale token
    root2 = memo.get_or_build(sf, build)
    assert root2 != root1
    # the displaced root is still intact for any live handle...
    assert os.path.exists(os.path.join(root1, "state.txt"))
    assert root1 in memo.retired
    # ...and the explicit-refresh path retires (not deletes) the same way
    refresh_table(spark, sf, "events")
    assert os.path.exists(os.path.join(root2, "state.txt"))
    assert root2 in memo.retired
    # reset() reclaims live and retired roots alike
    memo.reset()
    assert not os.path.exists(root1) and not os.path.exists(root2)
    assert memo.retired == []


def test_serving_memo_failed_build_root_is_retired(spark, tmp_path):
    """A build() that raises must not LEAK its fresh temp root (advisor,
    r16): the dir is retired — still on disk for any handle the failed
    build handed out (the injected-crash restart tests resume on it) —
    and reclaimed at reset() like every other displaced root."""
    import os

    import pytest

    from datawarehouse_project_spark.io import ServingMemo

    memo = ServingMemo("dwtest-failbuild-", ["events"])
    sf = str(tmp_path / "sff")
    _write_events(spark, sf, 10, 1.0)

    seen = []

    def crash(root):
        seen.append(root)
        raise RuntimeError("injected build crash")

    with pytest.raises(RuntimeError, match="injected build crash"):
        memo.get_or_build(sf, crash)
    (failed,) = seen
    assert failed in memo.retired  # registered for reclamation...
    assert os.path.isdir(failed)  # ...but not deleted out from under
    assert sf not in memo.roots  # and never served as a built root

    # a retry builds a FRESH root (no half-built state is ever reused)
    ok = memo.get_or_build(sf, lambda root: None)
    assert ok != failed
    memo.reset()
    assert not os.path.exists(failed) and not os.path.exists(ok)
