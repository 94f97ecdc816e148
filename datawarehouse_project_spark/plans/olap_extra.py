"""Additional OLAP operators rounding out the catalog: the MySQL-form
GROUP_CONCAT (bug-compatibility variant), discrete percentiles, top-N per
group, and pivot — each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import REGISTRY, register
from .star import FACT_CTE, fact
from ..io import table
from ..session import prepare

# --------------------------------------------------------------------------
# A6 bug-compatibility: MySQL's two-argument GROUP_CONCAT(expr, ', ')
# concatenates BOTH expressions per row, then joins rows with the DEFAULT
# separator ',' (reference olap_queries.sql:107) — i.e. 'a, ,b, ' not
# 'a, b'. The intent form lives in q06_product_affinity; this variant
# reproduces the quirk (rows sorted for determinism, which MySQL does not
# guarantee — documented divergence).
@register(
    "q06m_groupconcat_mysql_form",
    driver_facing=False,  # MySQL 2-arg GROUP_CONCAT bug-compat exemplar of q06
    oracle=f"""
WITH {FACT_CTE},
order_products AS (
    SELECT order_id,
           string_agg(product_name || ', ', ',' ORDER BY product_name)
               AS product_combination
    FROM fact
    GROUP BY order_id
    HAVING COUNT(*) > 1
)
SELECT product_combination, COUNT(*) AS pair_count
FROM order_products
GROUP BY 1
ORDER BY pair_count DESC, product_combination
LIMIT 5
""",
)
def q06m_groupconcat_mysql_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    order_products = (
        fact(spark, sf_dir)
        .groupBy("order_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("product_name")),
                    lambda x: F.concat(x, F.lit(", ")),
                ),
                ",",
            ).alias("product_combination"),
            F.count("*").alias("n_items"),
        )
        .filter(F.col("n_items") > 1)
    )
    return (
        order_products.groupBy("product_combination")
        .agg(F.count("*").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "product_combination")
        .limit(5)
    )


# --------------------------------------------------------------------------
# Discrete median (percentile_disc): picks an actual data value via
# row_number — deterministic on both engines, unlike interpolating
# percentiles (float arithmetic) or t-digest approximations.
@register(
    "events_value_median_disc",
    oracle="""
WITH ranked AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id
           ) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type, value AS median_value
FROM ranked
WHERE rn = (n + 1) // 2
""",
)
def events_value_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    return ranked.filter(
        F.col("rn") == ((F.col("n") + 1) / 2).cast("bigint")
    ).select("event_type", F.col("value").alias("median_value"))


# --------------------------------------------------------------------------
# Approximate median twin of events_value_median_disc: at 100 TB the
# exact form's per-key ROW_NUMBER is a per-key global sort; the production
# path is a mergeable quantile sketch (approx_percentile / KLL-style),
# one pass, bounded memory per group, no sort. Rows-only in the driver
# gate (sketches are engine-specific by construction); accuracy is
# asserted against the exact median in tests, mirroring the HLL pattern
# (events_approx_distinct_users).
@register("events_value_median_approx", driver_facing=False)
def events_value_median_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_median")
    )


# --------------------------------------------------------------------------
# Top-N per group: the ranking-window pattern (distinct from global top-k,
# which plans as TakeOrderedAndProject).
@register(
    "topn_products_per_store",
    oracle=f"""
WITH {FACT_CTE},
agg AS (
    SELECT store_name, product_name,
           CAST(SUM(sale) AS DOUBLE) AS total_sales
    FROM fact
    GROUP BY 1, 2
),
ranked AS (
    SELECT store_name, product_name, total_sales,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY store_name
               ORDER BY total_sales DESC, product_name
           ) AS INT) AS rank
    FROM agg
)
SELECT store_name, product_name, total_sales, rank
FROM ranked WHERE rank <= 3
""",
)
def topn_products_per_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        fact(spark, sf_dir)
        .groupBy("store_name", "product_name")
        .agg(F.sum("sale").cast("double").alias("total_sales"))
    )
    w = Window.partitionBy("store_name").orderBy(
        F.desc("total_sales"), "product_name"
    )
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


# --------------------------------------------------------------------------
# Pivot: revenue by store x order priority. Spark's native .pivot() with an
# explicit value list (never let pivot scan for distinct values at scale);
# the oracle is the equivalent conditional-aggregation spelling.
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIV_COLS = {p: "p" + p[0] for p in _PRIORITIES}


@register(
    "pivot_store_priority",
    oracle=f"""
WITH {FACT_CTE},
joined AS (
    SELECT f.store_name, f.sale, o.o_orderpriority
    FROM fact f JOIN orders o ON f.order_id = o.o_orderkey
)
SELECT store_name,
       {", ".join(
           f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN sale ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE) AS {c}"
           for p, c in _PIV_COLS.items()
       )}
FROM joined
GROUP BY 1
""",
)
def pivot_store_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    f = fact(spark, sf_dir)
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = f.join(o, f.order_id == o.o_orderkey).select(
        "store_name", "sale", "o_orderpriority"
    )
    pivoted = (
        joined.groupBy("store_name")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.sum("sale"))
    )
    return pivoted.select(
        "store_name",
        *[
            F.coalesce(F.col(f"`{p}`"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias(c)
            for p, c in _PIV_COLS.items()
        ],
    )


# --------------------------------------------------------------------------
# Unpivot: the inverse of the pivot above — wide (store x priority columns)
# back to long (store, priority, value) rows. Spark's native ``unpivot``
# (the SQL STACK/UNPIVOT analog) emits one row per id x value column,
# INCLUDING the zero cells the pivot materialized, so the pair
# pivot -> unpivot is lossless; the oracle states that directly by
# unioning the pivot oracle's columns.
_UNPIV_SELECTS = None  # built below from _PIV_COLS


def _unpivot_oracle() -> str:
    piv = REGISTRY["pivot_store_priority"].oracle
    arms = " UNION ALL ".join(
        f"SELECT store_name, '{c}' AS priority, {c} AS total_sales FROM piv"
        for c in _PIV_COLS.values()
    )
    return f"WITH piv AS ({piv}) {arms}"


@register(
    "unpivot_store_priority",
    driver_facing=False,  # driver window is full; oracle-gated in pytest
    oracle=_unpivot_oracle,
)
def unpivot_store_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot of the store x priority revenue matrix —
    the relational inverse the pivot was missing. Per-row reshaping
    (each input row expands to 5 output rows), no shuffle beyond what
    the pivot itself already did."""
    return pivot_store_priority(spark, sf_dir).unpivot(
        ["store_name"],
        list(_PIV_COLS.values()),
        "priority",
        "total_sales",
    )


# --------------------------------------------------------------------------
@register(
    "events_value_median_cont",
    driver_facing=False,  # driver window is full; oracle-gated in pytest
    oracle="""
SELECT event_type,
       percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS median_value
FROM events
GROUP BY 1
""",
)
def events_value_median_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated (continuous) median per event type — the
    PERCENTILE_CONT companion to the discrete median above. Spark's
    exact ``percentile`` and DuckDB's ``percentile_cont`` interpolate
    identically on doubles (verified bit-for-bit by the oracle gate).
    Same scale posture as the discrete form: exact percentiles need the
    per-key sorted mass; the sketch twin
    (``events_value_median_approx``) is the 100 TB path."""
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median_value")
    )
