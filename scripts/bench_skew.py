#!/usr/bin/env python
"""Skewed-scale evidence for the CMS-driven split join (VERDICT r10 #5 /
r11 #4): plant a hot supplier into a scaled lineitem replica, then measure
plain shuffle join vs ``skew_split_join`` — wall time (interleaved ABAB
reps, median + spread) and reducer balance (max rows any single shuffle
partition owns on the join key).

Why the planting: the driver's TPC-H-ish data is uniform (no supplier
carries HOT_FRAC of the fact), so the registered row only proves
split-invisibility, never the win. Here rows with ``l_orderkey % 10 <
hot_tenths`` are remapped to ONE supplier (deterministic, no RNG), giving
that key ``hot_tenths/10`` of the fact — the "one key owns a third of the
corpus" shape the operator exists for.

Measurement regime (disclosed, matches the operator's stated scope):
* ``spark.sql.autoBroadcastJoinThreshold=-1`` — at bench scale the
  supplier dim is tiny and Spark would broadcast it, hiding the skew the
  same way it would NOT be hidden at 100 TB dim sizes or in a
  deliberately co-partitioned pipeline. Forcing the shuffle join
  reproduces the regime the manual split targets. The split path's OWN
  ``F.broadcast`` hints still apply (hints override the threshold).
* ``spark.sql.adaptive.enabled=false`` — skew_split_join is the manual
  form of AQE's skew split for plans AQE does not cover; measuring it
  under AQE would measure AQE instead.

Usage: python scripts/bench_skew.py SF_DIR [SF_DIR ...]
e.g.   python scripts/bench_skew.py .scale/sf1 .scale/sf3
Planted lineitem replicas are cached under ``<SF_DIR>-skew/`` (gitignored,
built once per dir). Prints one JSON line per SF_DIR.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_project_spark.operators.skew import (  # noqa: E402
    HOT_FRAC,
    detect_hot_keys,
    skew_split_join,
)
from datawarehouse_project_spark.session import get_spark  # noqa: E402

#: l_orderkey % 10 < HOT_TENTHS rows get the hot supplier => 30% of fact.
HOT_TENTHS = 3
REPS = 3
SHUFFLE_PARTITIONS = 32


def plant_hot_supplier(spark, sf_dir: str) -> str:
    """Write (once) a lineitem replica where one supplier owns
    HOT_TENTHS/10 of the rows; returns the planted parquet path."""
    out_dir = sf_dir.rstrip("/") + "-skew"
    out = os.path.join(out_dir, "lineitem.parquet")
    if os.path.exists(out):
        return out
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    hot_id = li.agg(F.min("l_suppkey")).collect()[0][0]
    planted = li.withColumn(
        "l_suppkey",
        F.when(F.col("l_orderkey") % 10 < HOT_TENTHS, F.lit(hot_id)).otherwise(
            F.col("l_suppkey")
        ),
    )
    os.makedirs(out_dir, exist_ok=True)
    planted.coalesce(8).write.mode("overwrite").parquet(out)
    return out


def frames(spark, sf_dir: str, planted: str):
    """The two join sides, rebuilt per call so conf changes take effect
    (a DataFrame pins its QueryExecution at first plan access)."""
    li = spark.read.parquet(planted).select(
        "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("sale"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("row_id"),
    )
    sup = (
        spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
        .join(
            spark.read.parquet(os.path.join(sf_dir, "nation.parquet")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("s_suppkey").alias("l_suppkey"),
            F.col("n_name").alias("store_name"),
            F.col("s_name").alias("supplier_name"),
        )
    )
    return li, sup


def agg(df):
    return df.groupBy("store_name", "supplier_name").agg(
        F.sum("sale").cast("double").alias("total_sales"),
        F.count("*").cast("bigint").alias("n_items"),
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def max_partition_rows(df, key: str) -> int:
    """Max rows any single hash partition owns when partitioned by
    ``key`` — the row-count analog of the critical-path reducer."""
    return (
        df.repartition(SHUFFLE_PARTITIONS, key)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )


def bench_dir(spark, sf_dir: str) -> dict:
    planted = plant_hot_supplier(spark, sf_dir)
    li, sup = frames(spark, sf_dir, planted)
    n_total = li.count()

    # detection cost, timed separately AND charged to the split path
    t0 = time.perf_counter()
    hot = detect_hot_keys(li, "l_suppkey", "row_id", min_frac=HOT_FRAC,
                          n_total=n_total)
    hot_keys = [r["l_suppkey"] for r in hot.collect()]
    detect_sec = time.perf_counter() - t0
    hot_df = spark.createDataFrame(
        [(k,) for k in hot_keys], "l_suppkey bigint"
    )

    plain_secs, split_secs = [], []
    for _ in range(REPS):  # interleaved ABAB: same machine state for both
        li, sup = frames(spark, sf_dir, planted)
        t0 = time.perf_counter()
        noop(agg(li.join(sup, "l_suppkey")))
        plain_secs.append(time.perf_counter() - t0)

        li, sup = frames(spark, sf_dir, planted)
        t0 = time.perf_counter()
        noop(agg(skew_split_join(li, sup, "l_suppkey", hot_df)))
        split_secs.append(time.perf_counter() - t0)

    # reducer balance: plain path shuffles EVERY row on the key; the
    # split path's shuffle side is only the cold remainder.
    li, _ = frames(spark, sf_dir, planted)
    cold = li.join(F.broadcast(hot_df), "l_suppkey", "left_anti")
    plain_max = max_partition_rows(li, "l_suppkey")
    cold_max = max_partition_rows(cold, "l_suppkey")

    def stats(xs):
        return {
            "median": round(statistics.median(xs), 3),
            "min": round(min(xs), 3),
            "max": round(max(xs), 3),
        }

    return {
        "sf_dir": sf_dir,
        "rows": n_total,
        "hot_keys_detected": hot_keys,
        "detect_sec": round(detect_sec, 3),
        "plain_join": stats(plain_secs),
        "split_join": stats(split_secs),
        "split_plus_detect_median": round(
            statistics.median(split_secs) + detect_sec, 3
        ),
        "reducer_max_rows_plain": plain_max,
        "reducer_max_rows_split": cold_max,
        "reducer_balance_gain": round(plain_max / max(cold_max, 1), 2),
        "reps": REPS,
        "confs": {
            "autoBroadcastJoinThreshold": "-1",
            "adaptive.enabled": "false",
            "shuffle.partitions": SHUFFLE_PARTITIONS,
        },
    }


def main() -> None:
    spark = get_spark("dwspark-bench-skew",
                      shuffle_partitions=SHUFFLE_PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for sf_dir in sys.argv[1:]:
        print(json.dumps(bench_dir(spark, sf_dir)), flush=True)


if __name__ == "__main__":
    main()
