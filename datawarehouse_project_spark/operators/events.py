"""Event-stream operators in batch form over the ``events`` table.

These are the batch twins of the streaming module: the tumbling-window
aggregate is exactly what ``streaming/windows.py`` runs incrementally with a
watermark, and the enrichment join is the MESHJOIN analog that
``streaming/meshjoin.py`` runs per micro-batch — keeping them registered
here gives the semantics a DuckDB oracle, which the streaming runtime can't
have.

Timestamps leave all queries as epoch-microsecond BIGINTs: Spark TIMESTAMP
(an instant) and DuckDB TIMESTAMP (naive) only agree unambiguously on the
epoch integer (session timezone pinned to UTC by ``session.prepare``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ..plans.registry import register
from ..session import prepare

#: Session gap for sessionization (seconds).
SESSION_GAP_S = 30 * 60


# --------------------------------------------------------------------------
@register(
    "events_hourly_windows",
    headline=True,
    oracle="""
SELECT event_type,
       epoch_us(date_trunc('hour', ts)) AS window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type — the batch form of the
    watermarked streaming aggregate. value goes through DECIMAL(18,6)
    (values are 6-dp doubles) so the sum is order-insensitive and exact."""
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.unix_micros(F.date_trunc("hour", "ts")).alias("window_start_us"),
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
            "total_value"
        ),
    )


# --------------------------------------------------------------------------
@register(
    "events_sessionization",
    headline=True,
    oracle=f"""
WITH ordered AS (
    SELECT user_id, event_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
numbered AS (
    SELECT user_id, event_id, ts,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us
FROM numbered
GROUP BY 1, 2
""",
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): LAG + running sum of
    session starts — the classic window formulation; deterministic tie-break
    on (ts, event_id). One shuffle on user_id, which is the natural key."""
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(order_w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros("ts") - F.unix_micros("prev_ts")
                > SESSION_GAP_S * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(order_w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )


# --------------------------------------------------------------------------
@register(
    "events_session_window_native",
    driver_facing=False,  # value-identical twin of events_sessionization (driver row);
    # the native operator stays pytest-oracle-checked + streaming-tested
    oracle=f"""
WITH ordered AS (
    SELECT user_id, event_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, ts,
           CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
numbered AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING
           ) AS session_id
    FROM flagged
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) + {SESSION_GAP_S} * 1000000 AS session_end_us,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (gap-merged event-time sessions; the
    same operator runs unchanged on a stream with a watermark). The oracle
    is the manual LAG+running-sum formulation — semantically identical for
    point events: session end = last event + gap."""
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
@register(
    "events_enrich_meshjoin",
    oracle="""
SELECT c.c_mktsegment AS segment, e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def events_enrich_meshjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-relation enrichment, batch form: the MESHJOIN semantics
    (reference MeshJoin.java:216-284) as a plain stream⨝dim equi-join —
    Spark's broadcast hash join replaces the reference's memory-bounded
    paging (SURVEY §2.3 J1). The per-micro-batch twin lives in
    streaming/meshjoin.py and must produce identical rows."""
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    cust = table(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "total_value"
            ),
        )
    )


# --------------------------------------------------------------------------
@register(
    "events_click_attribution",
    oracle="""
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(c.ts) AS click_ts_us, epoch_us(p.ts) AS purchase_ts_us,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS DOUBLE) / 1000000.0
           AS latency_s,
       p.value AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
""",
)
def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution pairs, batch form: same-user purchases
    within 30 minutes after a click. This is the batch twin of the
    watermarked stream-stream join (streaming/stream_join.py) — the
    capability one step beyond the reference's stream⨝static MESHJOIN
    (MeshJoin.java:216-284): both inputs unbounded. The streaming runner
    must reproduce these rows exactly (tests/test_streaming.py)."""
    from ..streaming.stream_join import click_attribution, split_clicks_purchases

    prepare(spark)
    clicks, purchases = split_clicks_purchases(table(spark, sf_dir, "events"))
    return click_attribution(clicks, purchases)


# --------------------------------------------------------------------------
@register(
    "events_gapfill_hourly",
    driver_facing=False,  # driver window is full; pytest oracle covers it
    oracle="""
WITH spans AS (
    SELECT event_type,
           date_trunc('hour', MIN(ts)) AS h0,
           date_trunc('hour', MAX(ts)) AS h1
    FROM events GROUP BY 1
),
grid AS (
    SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
    FROM spans
),
agg AS (
    -- exact decimal SUM then one double division: Spark's decimal AVG
    -- rounds at scale+4, double-averaging is order-dependent; SUM/COUNT
    -- over exact decimals is bit-identical on both engines
    SELECT event_type, date_trunc('hour', ts) AS h,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS avg_value
    FROM events GROUP BY 1, 2
)
SELECT g.event_type,
       epoch_us(g.h) AS window_start_us,
       CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       COALESCE(
           a.avg_value,
           LAST_VALUE(a.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )
       ) AS avg_value_ffill
FROM grid g LEFT JOIN agg a USING (event_type, h)
""",
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: a dense hourly grid per event
    type over that type's own [min, max] span, missing hours zero-filled
    for counts and FORWARD-FILLED for the hourly average — the standard
    shaping step between raw events and a dashboard/model-feature series
    (pandas ``resample().ffill()``, re-expressed distributed).

    Plan shape: the grid is generated per key with ``sequence`` +
    ``explode`` from a per-type min/max aggregate — grid size is
    |types| x |hours| (metadata-sized, data-independent), and there is
    NO cross join anywhere: grid⟕agg is an equi-join on (type, hour),
    and the forward fill is one partitioned running window. At 100 TB
    the grid is still tiny; the only data-sized stages are the hourly
    pre-aggregation (partial map-side) and its single shuffle."""
    prepare(spark)
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_value"),
    )
    spans = ev.groupBy("event_type").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = spans.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.unix_micros("h").alias("window_start_us"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.coalesce(
                "avg_value", F.last("avg_value", ignorenulls=True).over(w)
            ).alias("avg_value_ffill"),
        )
    )
