"""Focused tests for the r21 pin helpers (io.pin_table / star.pin_fact) —
the mechanism bench.py uses to cache a spread (well-partitioned) layout of
the shared frames such that every builder's fact()/table() plan IS the
cached plan. Covers: the pin is returned by the resolver, values are
unchanged through a pin, lifecycle (refresh_table drops a table pin;
a fact bare pin deliberately survives it), and cleanup restores the
computed handles so other session-scoped tests are unaffected."""

from __future__ import annotations

from datawarehouse_project_spark.io import (
    pin_table,
    refresh_table,
    spread,
    table,
)
from datawarehouse_project_spark.plans.star import fact, pin_fact


def test_pin_table_reroutes_and_refresh_drops(spark, sf_dir):
    orig = table(spark, sf_dir, "events")
    pinned = spread(spark, orig)
    try:
        assert pin_table(spark, sf_dir, "events", pinned) is pinned
        assert table(spark, sf_dir, "events") is pinned
        # layout changed, values identical (count is enough here; the
        # oracle suite pins per-query values)
        assert pinned.count() == orig.count()
        # normal lifecycle: refresh drops the pin, resolver recomputes
        refresh_table(spark, sf_dir, "events")
        fresh = table(spark, sf_dir, "events")
        assert fresh is not pinned
    finally:
        refresh_table(spark, sf_dir, "events")


def test_pin_fact_reroutes_and_survives_refresh(spark, sf_dir):
    computed = fact(spark, sf_dir)
    pinned = spread(spark, computed)
    try:
        assert pin_fact(spark, sf_dir, pinned) is pinned
        assert fact(spark, sf_dir) is pinned
        # bare-frame pins survive refresh_table by contract (star.py:
        # deliberate overrides cleared only by their owner)
        refresh_table(spark, sf_dir)
        assert fact(spark, sf_dir) is pinned
    finally:
        spark._dw_fact_cache.pop(sf_dir, None)
        refresh_table(spark, sf_dir)
    assert fact(spark, sf_dir) is not pinned


def test_spread_fact_pin_changes_layout_not_values(spark, sf_dir):
    computed = fact(spark, sf_dir)
    pinned = spread(spark, computed)
    try:
        pin_fact(spark, sf_dir, pinned)
        got = fact(spark, sf_dir)
        assert (
            got.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )
        # same rows: the spread is a pure round-robin rebalance
        assert got.count() == computed.count()
    finally:
        spark._dw_fact_cache.pop(sf_dir, None)
