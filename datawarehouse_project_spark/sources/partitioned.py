"""Date-partitioned fact layout: partition pruning made observable.

``sinks.write_partitioned`` lays facts out by a bounded-cardinality
column; this module registers a catalog query that actually READS such a
layout so the payoff — Spark skipping entire partition directories before
any I/O happens (``PartitionFilters`` in the scan node, asserted in
tests/test_plan_shapes.py) — is exercised end-to-end and oracle-checked.

This is the Spark analog of the reference's year/quarter predicates
(olap_queries.sql:6,19,134): there, YEAR(date)= is evaluated per row; on
a year-partitioned 100 TB fact the same predicate prunes to ~1/7th of the
directories at plan time, before a single byte is scanned. Partition
pruning composes with (does not replace) the sargable min/max pushdown
the unpartitioned plans rely on.

The layout is materialized once per scale factor under /tmp and reused —
a registered query must stay cheap to re-run, and write-once/read-many is
precisely the partitioned-fact contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..plans.registry import register
from ..session import prepare
from .sinks import write_partitioned

_BASE = os.environ.get("SPARK_GRAFT_PART_DIR", "/tmp/dwspark-partitioned")
#: The year the registered query prunes to (within the generator's range).
PRUNE_YEAR = 1997


def partitioned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders laid out as parquet partitioned by o_year, built on first
    use per scale factor. The write stages into a unique temp dir and
    renames into place, so concurrent builders race benignly (first
    rename wins, losers clean up and read the winner)."""
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(_BASE, sf_name, "orders")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        orders = table(spark, sf_dir, "orders").withColumn(
            "o_year", F.year("o_orderdate")
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        staged = tempfile.mkdtemp(dir=os.path.dirname(path), prefix="._stage_")
        write_partitioned(orders, staged, ["o_year"])
        try:
            os.rename(staged, path)
        except OSError:  # lost the race — the winner's layout is equivalent
            shutil.rmtree(staged, ignore_errors=True)
    return spark.read.parquet(path)


@register(
    "partitioned_orders_year_agg",
    driver_facing=False,  # rotated out r9: driver-green since <=r7;
    # window slot ceded to the round-8 operator crop (pytest oracle still runs)
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE year(o_orderdate) = {PRUNE_YEAR}
GROUP BY o_orderpriority
""",
)
def partitioned_orders_year_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + exact-decimal revenue by priority for one year, read
    from the year-partitioned layout. The o_year predicate is a partition
    filter: the scan lists only the matching directory — plan-asserted
    via PartitionFilters, the property that turns a 100 TB scan into a
    one-partition scan."""
    prepare(spark)
    po = partitioned_orders(spark, sf_dir)
    return (
        po.filter(F.col("o_year") == PRUNE_YEAR)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )
