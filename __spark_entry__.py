"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q1 top-revenue products) on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full named-query
catalog (one entry per implemented operator from SURVEY.md §2 plus the
north-star extensions) from ``datawarehouse_project_spark.catalog``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouse_project_spark import catalog as _catalog  # noqa: E402

SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.queries()["q01_top_revenue_products"](spark, SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
