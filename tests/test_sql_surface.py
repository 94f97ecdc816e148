"""The catalog is dual-surface: every query runs as a DataFrame chain AND
as ``spark.sql`` text (SURVEY §2.11 — the reference's workload is SQL
text). ``catalog.spark_sql_surface()`` maps each query to Spark-dialect
SQL: dialect-neutral oracle strings verbatim, translated twins for the
rest (plans/sql_twins.py). This test runs every entry through ``spark.sql``
over registered temp views and asserts value-identity with the DataFrame
builder — float folds share operand order, so identity is exact."""

from __future__ import annotations

import pytest

from datawarehouse_project_spark.catalog import all_queries, spark_sql_surface
from datawarehouse_project_spark.io import TABLES, load_all
from tests.oracle_check import canon_rows


import pytest

# r22 fast-lane split, second pass (measured: the first fast lane still
# ran 16.5 min on this box — over the driver-timeout safety margin):
# this module's VALUE semantics are gated by the fast lane's sf0.001
# oracle-parity sweep; its deeper coverage runs in the slow lane
# (`pytest -m slow`, the round-end full sweep).
pytestmark = pytest.mark.slow

SURFACE = spark_sql_surface()


def test_sql_surface_covers_most_of_catalog():
    """SURVEY §2.11 promise: the SQL text surface is the norm, not the
    exception. (The remainder is rows-only sketches/streaming/stubs with
    no SQL-expressible contract.)"""
    assert len(SURFACE) >= 30, sorted(SURFACE)


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    yield
    for name in TABLES:
        spark.catalog.dropTempView(name)


@pytest.mark.parametrize("name", sorted(SURFACE))
def test_sql_text_matches_dataframe(spark, sf_dir, views, name):
    df_result = all_queries()[name](spark, sf_dir).toPandas()
    sql_result = spark.sql(SURFACE[name]).toPandas()
    assert canon_rows(df_result) == canon_rows(sql_result)
