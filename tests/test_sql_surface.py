"""The OLAP catalog is dual-surface: every query runs as a DataFrame chain
AND as SQL text. The ANSI oracle strings double as the Spark SQL surface —
this test runs them through spark.sql over registered temp views and
compares against the DataFrame builders."""

from __future__ import annotations

import pytest

from datawarehouse_project_spark.catalog import oracle_sql, queries
from datawarehouse_project_spark.io import TABLES, load_all
from tests.oracle_check import canon_rows

#: Queries whose oracle SQL is dialect-neutral (no DuckDB-only functions
#: like strftime/list_*/epoch_us/string_agg-with-ORDER-BY).
DUAL_DIALECT = [
    "q01_top_revenue_products",
    "q02_quarterly_growth_store",
    "q02j_growth_by_store_id",
    "q03_supplier_contribution",
    "q04_seasonal_product_sales",
    "q04j_quarter_seasons",
    "q05_monthly_volatility",
    "q07_rollup_yearly",
    "q07j_total_revenue",
    "q08_halfyearly_vs_yearly",
    "q10_store_quarterly_view",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    yield
    for name in TABLES:
        spark.catalog.dropTempView(name)


@pytest.mark.parametrize("name", DUAL_DIALECT)
def test_sql_text_matches_dataframe(spark, sf_dir, views, name):
    df_result = queries()[name](spark, sf_dir).toPandas()
    sql_result = spark.sql(oracle_sql()[name]).toPandas()
    assert canon_rows(df_result) == canon_rows(sql_result)
