"""End-to-end reference-pipeline replay (SURVEY §5.2.2): ingest the real
dirty CSVs, build the fact table, run representative OLAP shapes in Spark,
and compare against DuckDB computing the same queries from the same cleaned
fact — pinning ingest + enrichment + query semantics together."""

from __future__ import annotations

import os

import pytest

from datawarehouse_project_spark.sources.csv_ingest import (
    build_fact,
    read_customers,
    read_products,
    read_transactions,
)

REF_CSV = "/root/reference/CSV"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_CSV), reason="reference CSVs not available"
)


@pytest.fixture(scope="module")
def ref_fact(spark):
    cust = read_customers(spark, f"{REF_CSV}/customers_data.csv")
    prod = read_products(spark, f"{REF_CSV}/products_data.csv")
    txns = read_transactions(spark, f"{REF_CSV}/transactions.csv")
    fact = build_fact(txns, cust, prod, how="left")
    fact.createOrReplaceTempView("ref_fact")
    return fact


@pytest.fixture(scope="module")
def duck(ref_fact):
    import duckdb

    con = duckdb.connect()
    pdf = ref_fact.toPandas()
    con.register("fact", pdf)
    return con


def _cmp(spark, duck, spark_sql: str, duck_sql: str):
    a = sorted(map(str, [tuple(r) for r in spark.sql(spark_sql).collect()]))
    b = sorted(map(str, [tuple(r) for r in duck.execute(duck_sql).fetchall()]))
    assert a == b, (a[:3], b[:3])


@needs_ref
def test_q1_top_products_2019(spark, ref_fact, duck):
    q = """
    SELECT product_name, CAST(SUM(sale) AS DOUBLE) AS total_sales
    FROM {t} WHERE EXTRACT(YEAR FROM order_date) = 2019
    GROUP BY 1 ORDER BY total_sales DESC, product_name LIMIT 5
    """
    _cmp(spark, duck, q.format(t="ref_fact"), q.format(t="fact"))


@needs_ref
def test_q4_seasonal(spark, ref_fact, duck):
    q = """
    SELECT product_name,
           CASE WHEN EXTRACT(MONTH FROM order_date) BETWEEN 3 AND 5 THEN 'Spring'
                WHEN EXTRACT(MONTH FROM order_date) BETWEEN 6 AND 8 THEN 'Summer'
                WHEN EXTRACT(MONTH FROM order_date) BETWEEN 9 AND 11 THEN 'Fall'
                ELSE 'Winter' END AS season,
           CAST(SUM(sale) AS DOUBLE) AS total_sales
    FROM {t} GROUP BY 1, 2
    """
    _cmp(spark, duck, q.format(t="ref_fact"), q.format(t="fact"))


@needs_ref
def test_q10_store_quarterly(spark, ref_fact, duck):
    q = """
    SELECT store_name,
           CAST(EXTRACT(YEAR FROM order_date) * 100
                + EXTRACT(QUARTER FROM order_date) AS INT) AS sales_quarter,
           CAST(SUM(sale) AS DOUBLE) AS total_quarterly_sales
    FROM {t} WHERE store_name IS NOT NULL GROUP BY 1, 2
    """
    _cmp(spark, duck, q.format(t="ref_fact"), q.format(t="fact"))


@needs_ref
def test_fact_includes_1819_outlier(spark, ref_fact, duck):
    """The 1819 date outlier (transactions.csv:442) survives ingest into
    the fact — the reference applies no date-domain filter."""
    n = spark.sql(
        "SELECT COUNT(*) FROM ref_fact WHERE EXTRACT(YEAR FROM order_date) = 1819"
    ).collect()[0][0]
    assert n == 1
