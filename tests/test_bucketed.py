"""Bucketed-table co-located join: the write pays the shuffle once, then
the orders⨝lineitem join plans with ZERO Exchange — the property that
makes a repeated 100 TB fact⨝fact join affordable. Also pins value
equality with the catalog's pure-plan twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_project_spark.sources.bucketed import bucketed_order_lineitem

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bkt"))
    yield bucketed_order_lineitem(spark, SF, base, n_buckets=4)
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def _join(orders, lineitem):
    # merge hint: force the sort-merge strategy a 100 TB run would use
    # (locally AQE would broadcast the small side and hide the property
    # under test).
    return orders.hint("merge").join(lineitem, "o_orderkey")


def test_bucketed_join_has_no_exchange(bucketed):
    orders, lineitem = bucketed
    plan = _join(orders, lineitem)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_parquet_join(spark, bucketed):
    orders, lineitem = bucketed
    got = (
        _join(orders, lineitem)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    o = spark.read.parquet(f"{SF}/orders.parquet")
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(str, got)) == sorted(map(str, want))
