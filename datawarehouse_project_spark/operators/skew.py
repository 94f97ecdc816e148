"""Skew-mitigation operators: salted two-stage aggregation.

When a groupBy key is pathologically hot (one store takes 30% of a 100 TB
fact), the single reducer owning that key becomes the job's critical path.
Salting splits each key into ``n_salts`` sub-keys for a first partial
aggregation, then re-aggregates the (tiny) salted partials — two shuffles,
but each balanced. AQE's skew-join handling covers joins; this is the
aggregation-side equivalent, exposed as a reusable helper.

The result is bitwise-identical to the plain aggregation for any
commutative+associative aggregate (the oracle for the registered query IS
the plain GROUP BY — decimal sums make the equality exact, not just
approximate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..plans.registry import register
from ..session import prepare


def salted_sum(
    df: DataFrame,
    keys: list[str],
    value: Column,
    n_salts: int = 8,
    salt_on: Column | None = None,
) -> DataFrame:
    """SUM(value) GROUP BY keys, computed skew-safely via salting.

    ``salt_on`` must be a deterministic per-row expression (default: a hash
    of all columns is wrong under dedup — callers pass a row id); the salt
    only affects partitioning, never the result.
    """
    salt = (
        (F.abs(salt_on) % n_salts)
        if salt_on is not None
        else (F.abs(F.xxhash64(*[F.col(k) for k in keys], F.rand(seed=0))) % n_salts)
    )
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("total"))


@register(
    "skew_salted_store_revenue",
    driver_facing=False,  # r10 rotation: driver-green r≤9, pytest oracle retained
    oracle="""
SELECT n.n_name AS store_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_sales
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY 1
""",
)
def skew_salted_store_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store revenue via salted two-stage aggregation — the oracle is the
    PLAIN group-by: salting must be invisible in the result (exact decimal
    sums make the equivalence bitwise). 25 stores over 600k+ rows is
    exactly the low-cardinality/hot-key shape salting exists for."""
    prepare(spark)
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("store_name"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("sale"),
            F.col("l_orderkey"),
        )
    )
    out = salted_sum(
        joined,
        ["store_name"],
        F.col("sale"),
        n_salts=8,
        salt_on=F.col("l_orderkey"),
    )
    return out.select(
        "store_name", F.col("total").cast("double").alias("total_sales")
    )
