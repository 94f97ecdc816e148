"""Parquet table loaders for the driver's TPC-H-ish star schema.

TESTDATA.md: tables ``region nation customer supplier part orders lineitem
events documents embeddings`` live as one parquet per table under
``/root/testdata/sf*/``. All loads are plain ``spark.read.parquet`` so
Catalyst keeps predicate pushdown / column pruning / partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Dimensions that stay small at any scale factor (bounded real-world
#: cardinality) and are always safe to broadcast.
ALWAYS_BROADCAST = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table. Never collects; never caches globally."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}
