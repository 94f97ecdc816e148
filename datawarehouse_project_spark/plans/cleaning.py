"""Oracle-checked parity queries for the cleaning operators (P7-P12, S7).

The driver's parquet tables are clean, so each query synthesizes the
reference's dirty shapes deterministically from them (same expressions on
both engines), then applies the engine's cleaning expression library — the
DuckDB oracle pins the exact semantics: strict multi-format date parsing
with first-hit-wins, non-numeric price stripping with 0.00 defaulting, and
last-write-wins PK upsert dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_price, multi_format_date
from ..io import table
from ..session import prepare
from ..sources.csv_ingest import dedup_last_wins
from .registry import register

# --------------------------------------------------------------------------
# P12/F9 — strict multi-format date parse, first success wins, else drop.
# Reference: MeshJoin.java:158,173-186. Dirty strings are synthesized from
# o_orderdate in the reference's four formats (+ a time-of-day suffix to be
# truncated, + unparsable rows to be dropped).
@register(
    "clean_multiformat_dates",
    driver_facing=False,  # rotated out r9: driver-green since <=r7;
    # window slot ceded to the round-8 operator crop (pytest oracle still runs)
    oracle="""
WITH dirty AS (
    SELECT o_orderkey,
           CASE
             WHEN o_orderkey % 23 = 0 THEN 'not-a-date'
             WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
             WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%m/%d/%Y') || ' 03:09:00'
             WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%d-%m-%Y')
             ELSE strftime(o_orderdate, '%Y/%m/%d')
           END AS order_date_raw
    FROM orders
),
parsed AS (
    SELECT o_orderkey,
           CAST(COALESCE(
               try_strptime(split_part(trim(order_date_raw), ' ', 1), '%Y-%m-%d'),
               try_strptime(split_part(trim(order_date_raw), ' ', 1), '%m/%d/%Y'),
               try_strptime(split_part(trim(order_date_raw), ' ', 1), '%d-%m-%Y'),
               try_strptime(split_part(trim(order_date_raw), ' ', 1), '%Y/%m/%d')
           ) AS DATE) AS order_date
    FROM dirty
)
SELECT CAST(EXTRACT(YEAR FROM order_date) * 100
            + EXTRACT(MONTH FROM order_date) AS INT) AS year_month,
       COUNT(*) AS n_rows
FROM parsed
WHERE order_date IS NOT NULL
GROUP BY 1
""",
)
def clean_multiformat_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dirty = o.select(
        k,
        F.when(k % 23 == 0, F.lit("not-a-date"))
        .when(k % 4 == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(
            k % 4 == 1,
            F.concat(F.date_format("o_orderdate", "MM/dd/yyyy"), F.lit(" 03:09:00")),
        )
        .when(k % 4 == 2, F.date_format("o_orderdate", "dd-MM-yyyy"))
        .otherwise(F.date_format("o_orderdate", "yyyy/MM/dd"))
        .alias("order_date_raw"),
    )
    parsed = dirty.withColumn("order_date", multi_format_date("order_date_raw"))
    return (
        parsed.filter(F.col("order_date").isNotNull())
        .groupBy(
            (F.year("order_date") * 100 + F.month("order_date")).alias("year_month")
        )
        .agg(F.count("*").alias("n_rows"))
    )


# --------------------------------------------------------------------------
# P10+P11/F8 — price cleanup: strip non-numeric chars, unparsable -> 0.00
# kept. Reference: MeshJoin.java:119-132 ("1299.99$" inputs).
@register(
    "clean_price_strings",
    driver_facing=False,  # rotated out r9: driver-green since <=r7;
    # window slot ceded to the round-8 operator crop (pytest oracle still runs)
    oracle="""
WITH dirty AS (
    SELECT p_partkey, p_brand,
           CASE
             WHEN p_partkey % 13 = 0 THEN 'N/A'
             WHEN p_partkey % 17 = 0 THEN '  ' || CAST(CAST(p_retailprice AS DECIMAL(10,2)) AS VARCHAR) || '$ '
             ELSE CAST(CAST(p_retailprice AS DECIMAL(10,2)) AS VARCHAR) || '$'
           END AS price_raw
    FROM part
),
cleaned AS (
    SELECT p_brand,
           COALESCE(
               try_cast(regexp_replace(price_raw, '[^0-9.\\-]', '', 'g') AS DECIMAL(10,2)),
               CAST('0.00' AS DECIMAL(10,2))
           ) AS price
    FROM dirty
)
SELECT p_brand,
       CAST(SUM(price) AS DOUBLE) AS total_price,
       CAST(SUM(CASE WHEN price = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
FROM cleaned
GROUP BY 1
""",
)
def clean_price_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    p = table(spark, sf_dir, "part")
    k = F.col("p_partkey")
    price_str = F.col("p_retailprice").cast("decimal(10,2)").cast("string")
    dirty = p.select(
        "p_brand",
        F.when(k % 13 == 0, F.lit("N/A"))
        .when(k % 17 == 0, F.concat(F.lit("  "), price_str, F.lit("$ ")))
        .otherwise(F.concat(price_str, F.lit("$")))
        .alias("price_raw"),
    )
    cleaned = dirty.withColumn("price", clean_price("price_raw"))
    return cleaned.groupBy("p_brand").agg(
        F.sum("price").cast("double").alias("total_price"),
        F.sum(F.when(F.col("price") == 0, 1).otherwise(0)).alias("n_defaulted"),
    )


# --------------------------------------------------------------------------
# S7 — PK upsert as deterministic last-write-wins dedup (row_number over
# ingestion ordinal). Reference: ON DUPLICATE KEY UPDATE replay,
# MeshJoin.java:74,136,200,358; README.md:134-136.
@register(
    "dedup_lastwins_upsert",
    driver_facing=False,  # rotated out r9: driver-green since <=r7;
    # window slot ceded to the round-8 operator crop (pytest oracle still runs)
    oracle="""
WITH ranked AS (
    SELECT lang, source, doc_id, n_chars,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source ORDER BY doc_id DESC
           ) AS rn
    FROM documents
)
SELECT lang, source, doc_id, n_chars
FROM ranked
WHERE rn = 1
""",
)
def dedup_lastwins_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    docs = table(spark, sf_dir, "documents").select(
        "lang", "source", "doc_id", "n_chars"
    )
    return dedup_last_wins(docs, ["lang", "source"], ordinal="doc_id")
