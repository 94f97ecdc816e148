"""Bucketed (pre-partitioned) tables: shuffle-free big⨝big joins.

Every dim join in this engine broadcasts (plans/star.py), but a 100 TB
fact⨝fact join — orders⨝lineitem here; impressions⨝conversions in an
event pipeline — can broadcast neither side. The default plan shuffles
BOTH inputs on the key every time the join runs. Bucketing is Spark's
answer: write each table hash-partitioned into N buckets on the join key
(``bucketBy`` + ``saveAsTable``), and every subsequent join on that key
reads co-located buckets — zero Exchange in the plan, verified by
``tests/test_bucketed.py``. The write pays the shuffle ONCE; every later
join, agg, or dedup on the key rides it for free, which is the right
trade for the write-once/read-many shape of a warehouse fact table.

``sortBy`` within buckets additionally lets the sort-merge join skip its
per-partition sort when bucket files are read in order.

The reference has no analog (its engine is single-node; co-location is
implicit). This module is the scale-path counterpart of the pure-plan
``bigjoin_order_priority_revenue`` catalog entry, which lets Catalyst
pick the strategy on un-bucketed parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import prepare


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as an external bucketed parquet table.

    ``repartition(n_buckets, key)`` first, so each bucket is one file —
    the layout under which the bucketed scan both avoids the exchange and
    (with ``sortBy``) hands the join pre-sorted runs.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    (
        df.repartition(n_buckets, key)
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_order_lineitem(
    spark: SparkSession, sf_dir: str, base_path: str, n_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """orders and lineitem as bucketed tables on the join key, ready for a
    co-located join. One-time setup cost; the returned frames join with no
    Exchange on either side."""
    prepare(spark)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(
        orders, "bkt_orders", f"{base_path}/bkt_orders", "o_orderkey", n_buckets
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "bkt_lineitem",
        f"{base_path}/bkt_lineitem",
        "o_orderkey",
        n_buckets,
    )
    return spark.table("bkt_orders"), spark.table("bkt_lineitem")
