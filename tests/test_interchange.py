"""ORC interchange: round-trip fidelity, scan-level optimization parity,
and query-result parity with the parquet originals."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_project_spark.io import TABLES, table
from datawarehouse_project_spark.sources.interchange import (
    read_orc_table,
    write_orc_tables,
)
from tests.oracle_check import canon_rows


import pytest

# r22 fast-lane split (VERDICT r21 #2: the driver's default pytest run
# timed out at 30-80 min on the drifting box): this module is stateful /
# property / streaming coverage whose VALUE semantics are already gated
# by the fast lane's sf0.001 oracle-parity sweep — the whole module runs
# in the slow lane (`pytest -m slow`, the round-end full sweep).
pytestmark = pytest.mark.slow


def test_orc_roundtrip_is_value_identical_for_every_table(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orc")
    write_orc_tables(spark, sf_dir, out)
    for name in TABLES:
        a = canon_rows(table(spark, sf_dir, name).toPandas())
        b = canon_rows(read_orc_table(spark, out, name).toPandas())
        assert a == b, f"{name}: ORC round-trip changed values"


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    """The same scan-level optimizations the parquet path is plan-pinned
    for must reach the ORC reader: the predicate lands in PushedFilters
    and the projection prunes ReadSchema to the touched columns."""
    out = str(tmp_path / "orc")
    write_orc_tables(spark, sf_dir, out, ["orders"])
    df = (
        read_orc_table(spark, out, "orders")
        .filter(F.col("o_custkey") == 7)
        .select("o_orderkey", "o_totalprice")
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,7)]" in p
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m, p
    assert sorted(f.split(":")[0] for f in m.group(1).split(",")) == [
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
    ]


def test_catalog_query_identical_over_orc_views(spark, sf_dir, tmp_path):
    """A registered SQL-surface query must compute the same result over
    ORC-backed views as the DataFrame builder does over parquet."""
    from datawarehouse_project_spark.catalog import all_queries, spark_sql_surface
    from datawarehouse_project_spark.sources.interchange import register_orc_views

    out = str(tmp_path / "orc")
    write_orc_tables(spark, sf_dir, out)
    register_orc_views(spark, out)
    try:
        name = "q01_top_revenue_products"
        parquet_result = canon_rows(
            all_queries()[name](spark, sf_dir).toPandas()
        )
        orc_result = canon_rows(
            spark.sql(spark_sql_surface()[name]).toPandas()
        )
        assert parquet_result == orc_result
    finally:
        for t in TABLES:
            spark.catalog.dropTempView(t)
