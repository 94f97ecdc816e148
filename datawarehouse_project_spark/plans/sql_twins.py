"""Spark-SQL text surface for the full catalog (SURVEY §2.11).

The reference's workload IS SQL text (SQL/olap_queries.sql); the promise is
that every catalog query runs both as a DataFrame chain and as ``spark.sql``
text. Most DuckDB oracle strings are already dialect-neutral and run in
Spark unchanged (``NEUTRAL_AS_IS``); the rest get a Spark-dialect twin here
(``SPARK_SQL``), mechanically translated:

    DuckDB                      Spark
    ------------------------    ---------------------------------
    epoch_us(ts)                unix_micros(ts)
    regexp_split_to_array       split
    list_transform/list_filter  transform / filter
    list_reduce(list_prepend)   aggregate(..., init, (acc,x) -> ...)
    len(arr)                    size(arr)
    unnest(arr)                 explode(arr)
    strftime / try_strptime     date_format / try_to_timestamp
    string_agg(x, s ORDER BY y) array_join(array_sort(collect_list(..)), s)
    x // y                      x DIV y
    CAST(x AS VARCHAR)          CAST(x AS STRING)
    regexp_matches(x, p)        x RLIKE p
    encode(s)                   encode(s, 'utf-8')
    ASOF JOIN                   max-date lookup + equi join-back
    ('0x'||substr(md5(x),1,15))::BIGINT
                                CAST(CONV(SUBSTRING(MD5(x),1,15),16,10) AS BIGINT)

``tests/test_sql_surface.py`` runs every entry through ``spark.sql`` over
temp views and asserts value-identity with the DataFrame builder. Float
folds use the same operand order as the builders, so results are
bit-identical, not merely close.
"""

from __future__ import annotations

from ..functions.text import MINHASH_COEFFS, P
from ..operators.dedup import DF_CAP, _BANDS
from ..operators.similarity import (
    BAND_BITS,
    HYPERPLANES,
    N_BANDS,
    N_QUERIES,
    ND_PLANES,
    TOP_K,
    spark_ivf_cluster_sql,
    spark_ivf_probes_sql,
)

#: Oracle strings that are dialect-neutral: Spark runs them verbatim
#: (verified by the dual-surface test).
NEUTRAL_AS_IS = [
    "bigjoin_order_priority_revenue",
    "dedup_exact_md5",
    "dedup_lastwins_upsert",
    "dq_audit_orders_lineitem",
    "fullouter_yearly_customer_recon",
    "unpivot_store_priority",
    "events_distinct_users",
    "events_enrich_meshjoin",
    "events_value_moments",
    "jdbc_nation_dim_agg",
    "partitioned_orders_year_agg",
    "pivot_store_priority",
    "q01_top_revenue_products",
    "q02_quarterly_growth_store",
    "q02j_growth_by_store_id",
    "q03_supplier_contribution",
    "q03_supplier_contribution_ordered",
    "q04_seasonal_product_sales",
    "q04j_quarter_seasons",
    "q05_monthly_volatility",
    "q06j_copurchase_pairs",
    "q07_rollup_yearly",
    "q07c_cube_store_product",
    "q07g_grouping_sets",
    "q07j_total_revenue",
    "q08_halfyearly_vs_yearly",
    "q10_store_quarterly_view",
    "range_join_ship_lag",
    "semi_anti_customers",
    "setops_customer_cohorts",
    "skew_salted_store_revenue",
    "topn_products_per_store",
]

# --------------------------------------------------------------------------
# Building blocks (Spark twins of functions/text.py + operators/similarity)

SPARK_H = "CAST(CONV(SUBSTRING(MD5({x}), 1, 15), 16, 10) AS BIGINT)"

#: Twin of DUCK_DOCWORDS (words() / word_shingles() as Spark SQL CTEs).
SPARK_DOCWORDS = r"""
docwords AS (
    SELECT doc_id, lang, source, n_chars, text,
           split(lower(trim(text)), '\\s+') AS ws
    FROM documents
),
docshingles AS (
    SELECT doc_id, lang, source, ws,
           array_distinct(transform(
               sequence(1, size(ws) - 2),
               i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
                              element_at(ws, i + 2)))) AS sgs
    FROM docwords
    WHERE size(ws) >= 3
)
"""


def _spark_minhash_aggs() -> list[str]:
    h = SPARK_H.format(x="sg")
    return [
        f"MIN(({a} * ({h} % {P}) + {b}) % {P}) AS mh{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS)
    ]


_SPARK_SIG = f"""
{SPARK_DOCWORDS},
exploded AS (SELECT doc_id, explode(sgs) AS sg FROM docshingles),
sig AS (
    SELECT doc_id, {", ".join(_spark_minhash_aggs())}
    FROM exploded
    GROUP BY doc_id
)
"""

_MH_COLS = ", ".join(f"mh{i}" for i in range(len(MINHASH_COEFFS)))


def _spark_bands() -> str:
    selects = [
        f"SELECT doc_id, {b} AS band, mh{2 * b} * {P} + mh{2 * b + 1} AS band_key FROM sig"
        for b in range(_BANDS)
    ]
    return " UNION ALL ".join(selects)


_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)
_SPARK_NORM = (
    "sqrt(aggregate(transform({e}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x))"
)


def _arr(weights: list[int]) -> str:
    return "array(" + ", ".join(str(w) for w in weights) + ")"


def _spark_plane_dot(e: str, weights: list[int]) -> str:
    return (
        f"aggregate(zip_with({e}, {_arr(weights)}, (x, w) -> CAST(x AS DOUBLE) * w), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _spark_bucket(e: str) -> str:
    parts = [
        f"(CASE WHEN {_spark_plane_dot(e, w)} >= 0 THEN {1 << j} ELSE 0 END)"
        for j, w in enumerate(HYPERPLANES)
    ]
    return "CAST((" + " + ".join(parts) + ") AS BIGINT)"


def _spark_band_key(e: str, band: int) -> str:
    parts = [
        f"(CASE WHEN {_spark_plane_dot(e, ND_PLANES[band * BAND_BITS + b])} >= 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(BAND_BITS)
    ]
    return "(" + " + ".join(parts) + ")"


def _spark_nd_bands() -> str:
    selects = [
        f"SELECT vec_id, {j} AS band, {_spark_band_key('embedding', j)} AS bkey FROM embeddings"
        for j in range(N_BANDS)
    ]
    return " UNION ALL ".join(selects)


_COS = (
    _SPARK_DOT.format(a="q.embedding", b="c.embedding")
    + f" / ({_SPARK_NORM.format(e='q.embedding')} * {_SPARK_NORM.format(e='c.embedding')})"
)

#: The shared star-schema CTE of the OLAP twins (same text as the oracles).
_FACT = """
fact AS (
    SELECT l.l_orderkey                            AS order_id,
           CAST(o.o_orderdate AS DATE)             AS order_date,
           l.l_partkey                             AS product_id,
           p.p_name                                AS product_name,
           CAST(p.p_retailprice AS DECIMAL(18,2))  AS product_price,
           s.s_suppkey                             AS supplier_id,
           s.s_name                                AS supplier_name,
           n.n_nationkey                           AS store_id,
           n.n_name                                AS store_name,
           o.o_custkey                             AS customer_id,
           CAST(l.l_quantity AS DECIMAL(18,2))     AS quantity,
           CAST(l.l_extendedprice AS DECIMAL(18,2)) AS sale
    FROM lineitem l
    JOIN orders   o ON l.l_orderkey = o.o_orderkey
    JOIN part     p ON l.l_partkey  = p.p_partkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation   n ON s.s_nationkey = n.n_nationkey
)
"""

# --------------------------------------------------------------------------
#: name -> Spark-dialect SQL for oracles that are NOT dialect-neutral.
SPARK_SQL: dict[str, str] = {}

SPARK_SQL["events_hourly_windows"] = """
SELECT event_type,
       unix_micros(date_trunc('hour', ts)) AS window_start_us,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""

SPARK_SQL["events_sessionization"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, event_id, ts,
           CASE WHEN prev_ts IS NULL
                     OR unix_micros(ts) - unix_micros(prev_ts) > 1800 * 1000000
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
       unix_micros(MIN(ts)) AS session_start_us,
       unix_micros(MAX(ts)) AS session_end_us
FROM numbered
GROUP BY 1, 2
"""

SPARK_SQL["events_session_window_native"] = """
WITH ordered AS (
    SELECT user_id, event_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
),
flagged AS (
    SELECT user_id, ts,
           CASE WHEN prev_ts IS NULL
                     OR unix_micros(ts) - unix_micros(prev_ts) > 1800 * 1000000
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
       unix_micros(MIN(ts)) AS session_start_us,
       unix_micros(MAX(ts)) + 1800 * 1000000 AS session_end_us,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""

SPARK_SQL["events_value_median_disc"] = """
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
WHERE rn = (n + 1) DIV 2
"""

SPARK_SQL["events_click_attribution"] = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       unix_micros(c.ts) AS click_ts_us, unix_micros(p.ts) AS purchase_ts_us,
       CAST(unix_micros(p.ts) - unix_micros(c.ts) AS DOUBLE) / 1000000.0D
           AS latency_s,
       p.value AS purchase_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE
"""

SPARK_SQL["asof_join_last_order"] = """
WITH ev AS (
    SELECT event_id, user_id, ts FROM events WHERE event_id % 20 = 0
),
ord AS (
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC
               ) AS rn
        FROM orders
    ) WHERE rn = 1
),
-- Spark has no ASOF JOIN: find each event's latest prior order date, then
-- join back to the (deduped) right side on the exact (key, date).
best AS (
    SELECT e.event_id, MAX(o.o_orderdate) AS best_date
    FROM ev e
    LEFT JOIN ord o
      ON e.user_id = o.o_custkey
     AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
    GROUP BY e.event_id
)
SELECT e.event_id, e.user_id,
       unix_micros(e.ts) AS event_ts_us,
       o.o_orderkey AS last_orderkey,
       unix_micros(CAST(o.o_orderdate AS TIMESTAMP)) AS last_order_ts_us
FROM ev e
JOIN best b ON e.event_id = b.event_id
LEFT JOIN ord o
  ON b.best_date = o.o_orderdate AND e.user_id = o.o_custkey
"""

SPARK_SQL["clean_price_strings"] = """
WITH dirty AS (
    SELECT p_partkey, p_brand,
           CASE
             WHEN p_partkey % 13 = 0 THEN 'N/A'
             WHEN p_partkey % 17 = 0 THEN '  ' || CAST(CAST(p_retailprice AS DECIMAL(10,2)) AS STRING) || '$ '
             ELSE CAST(CAST(p_retailprice AS DECIMAL(10,2)) AS STRING) || '$'
           END AS price_raw
    FROM part
),
cleaned AS (
    SELECT p_brand,
           COALESCE(
               try_cast(regexp_replace(price_raw, '[^0-9.-]', '') AS DECIMAL(10,2)),
               CAST('0.00' AS DECIMAL(10,2))
           ) AS price
    FROM dirty
)
SELECT p_brand,
       CAST(SUM(price) AS DOUBLE) AS total_price,
       CAST(SUM(CASE WHEN price = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted
FROM cleaned
GROUP BY 1
"""

SPARK_SQL["clean_multiformat_dates"] = """
WITH dirty AS (
    SELECT o_orderkey,
           CASE
             WHEN o_orderkey % 23 = 0 THEN 'not-a-date'
             WHEN o_orderkey % 4 = 0 THEN date_format(o_orderdate, 'yyyy-MM-dd')
             WHEN o_orderkey % 4 = 1 THEN date_format(o_orderdate, 'MM/dd/yyyy') || ' 03:09:00'
             WHEN o_orderkey % 4 = 2 THEN date_format(o_orderdate, 'dd-MM-yyyy')
             ELSE date_format(o_orderdate, 'yyyy/MM/dd')
           END AS order_date_raw
    FROM orders
),
parsed AS (
    SELECT o_orderkey,
           CAST(COALESCE(
               try_to_timestamp(split_part(trim(order_date_raw), ' ', 1), 'yyyy-MM-dd'),
               try_to_timestamp(split_part(trim(order_date_raw), ' ', 1), 'MM/dd/yyyy'),
               try_to_timestamp(split_part(trim(order_date_raw), ' ', 1), 'dd-MM-yyyy'),
               try_to_timestamp(split_part(trim(order_date_raw), ' ', 1), 'yyyy/MM/dd')
           ) AS DATE) AS order_date
    FROM dirty
)
SELECT CAST(EXTRACT(YEAR FROM order_date) * 100
            + EXTRACT(MONTH FROM order_date) AS INT) AS year_month,
       COUNT(*) AS n_rows
FROM parsed
WHERE order_date IS NOT NULL
GROUP BY 1
"""

SPARK_SQL["q03j_regex_type_filter"] = f"""
WITH {_FACT},
typed AS (
    SELECT f.*, p.p_type
    FROM fact f JOIN part p ON f.product_id = p.p_partkey
)
SELECT p_type, CAST(SUM(sale) AS DOUBLE) AS total_sales
FROM typed
WHERE NOT (p_type RLIKE '^(SMALL|MEDIUM)')
GROUP BY 1
"""

SPARK_SQL["q06_product_affinity"] = f"""
WITH {_FACT},
order_products AS (
    SELECT order_id,
           array_join(array_sort(collect_list(product_name)), ', ')
               AS product_combination
    FROM fact
    GROUP BY order_id
    HAVING COUNT(*) > 1
),
pair_counts AS (
    SELECT product_combination, COUNT(*) AS pair_count
    FROM order_products
    GROUP BY product_combination
)
SELECT product_combination, pair_count
FROM pair_counts
ORDER BY pair_count DESC, product_combination
LIMIT 5
"""

SPARK_SQL["q06m_groupconcat_mysql_form"] = f"""
WITH {_FACT},
order_products AS (
    SELECT order_id,
           array_join(transform(array_sort(collect_list(product_name)),
                                x -> x || ', '), ',')
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
"""

SPARK_SQL["q09_daily_spikes"] = f"""
WITH {_FACT},
daily AS (
    SELECT product_name, order_date, SUM(sale) AS daily_revenue_dec
    FROM fact
    GROUP BY 1, 2
),
avg_daily AS (
    SELECT product_name,
           CAST(SUM(daily_revenue_dec) AS DOUBLE) / COUNT(*) AS avg_daily_revenue
    FROM daily
    GROUP BY 1
)
SELECT d.product_name, CAST(d.order_date AS STRING) AS order_date,
       CAST(d.daily_revenue_dec AS DOUBLE) AS daily_revenue,
       a.avg_daily_revenue,
       CASE WHEN CAST(d.daily_revenue_dec AS DOUBLE) > 2 * a.avg_daily_revenue
            THEN 'Outlier' ELSE 'Normal' END AS outlier_flag
FROM daily d JOIN avg_daily a ON d.product_name = a.product_name
"""

# The J6 agg⋈agg exemplar shares q09's contract (same oracle, same values);
# the SQL text above IS the two-CTE join shape, so it serves both.
SPARK_SQL["q09j_spikes_aggjoin"] = SPARK_SQL["q09_daily_spikes"]

_H_TEXT = SPARK_H.format(x="text")
SPARK_SQL["multimodal_binary_features"] = f"""
WITH media AS (
    SELECT doc_id AS media_id, encode(text, 'utf-8') AS payload, text
    FROM documents
)
SELECT media_id,
       octet_length(payload) AS n_bytes,
       md5(text) AS content_md5,
       CAST({_H_TEXT} % 1920 AS INT) AS width,
       CAST({_H_TEXT} % 1080 AS INT) AS height,
       CAST(octet_length(payload) % 240 AS INT) AS n_frames
FROM media
"""

# -- dedup family ----------------------------------------------------------

SPARK_SQL["dedup_minhash_signatures"] = (
    f"WITH {_SPARK_SIG} SELECT doc_id, {_MH_COLS} FROM sig"
)

_K = len(MINHASH_COEFFS)
SPARK_SQL["dedup_minhash_lsh_pairs"] = f"""
WITH {_SPARK_SIG},
bands AS ({_spark_bands()}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST({" + ".join(f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(_K))} AS BIGINT)
           AS n_matching_minhash
FROM cand c
JOIN sig sa ON c.doc_a = sa.doc_id
JOIN sig sb ON c.doc_b = sb.doc_id
"""

_H_W = SPARK_H.format(x="w")
_SPARK_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN aggregate(transform(hw, h -> CASE WHEN "
    f"(h % {1 << (j + 1)}) >= {1 << j} THEN 1 ELSE -1 END), "
    f"0, (acc, x) -> acc + x) "
    f">= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(16)
)
SPARK_SQL["dedup_simhash"] = f"""
WITH {SPARK_DOCWORDS},
hashed AS (
    SELECT doc_id, transform(ws, w -> {_H_W} % {P}) AS hw
    FROM docwords
    WHERE size(ws) >= 1
)
SELECT doc_id, CAST(({_SPARK_SIMHASH_BITS}) AS BIGINT) AS simhash_val
FROM hashed
"""

from ..operators.dedup import SIMHASH_HD_MAX  # noqa: E402


def _spark_sh_blocks() -> str:
    from ..operators.dedup import _SH_BLOCK_BITS, _SH_BLOCK_MASK, _SH_BLOCKS

    selects = [
        f"SELECT doc_id, {j} AS block, "
        f"(simhash_val >> {j * _SH_BLOCK_BITS}) & {_SH_BLOCK_MASK} AS bval FROM sig"
        for j in range(_SH_BLOCKS)
    ]
    return " UNION ALL ".join(selects)


SPARK_SQL["dedup_simhash_pairs"] = f"""
WITH {SPARK_DOCWORDS},
hashed AS (
    SELECT doc_id, transform(ws, w -> {_H_W} % {P}) AS hw
    FROM docwords
    WHERE size(ws) >= 1
),
sig AS (SELECT doc_id, CAST(({_SPARK_SIMHASH_BITS}) AS BIGINT) AS simhash_val FROM hashed),
blocks AS ({_spark_sh_blocks()}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM blocks a JOIN blocks b
      ON a.block = b.block AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(sa.simhash_val ^ sb.simhash_val) AS BIGINT) AS hamming
FROM cand c
JOIN sig sa ON c.doc_a = sa.doc_id
JOIN sig sb ON c.doc_b = sb.doc_id
WHERE bit_count(sa.simhash_val ^ sb.simhash_val) <= {SIMHASH_HD_MAX}
"""

def _sampling_twin() -> str:
    from ..operators.sampling import _MOD, _SALT, _duck_rate_case

    h = SPARK_H.format(x=f"CONCAT('{_SALT}', CAST(doc_id AS STRING))")
    return f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {h} % {_MOD} < {_duck_rate_case()}
"""


SPARK_SQL["sample_stratified_hash"] = _sampling_twin()

SPARK_SQL["dedup_verified_near_dup"] = f"""
WITH {_SPARK_SIG},
bands AS ({_spark_bands()}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
    SELECT c.doc_a, c.doc_b,
           CAST(size(array_intersect(sa.sgs, sb.sgs)) AS DOUBLE)
             / (size(sa.sgs) + size(sb.sgs) - size(array_intersect(sa.sgs, sb.sgs)))
             AS jaccard
    FROM cand c
    JOIN docshingles sa ON c.doc_a = sa.doc_id
    JOIN docshingles sb ON c.doc_b = sb.doc_id
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.6
"""

SPARK_SQL["dedup_ngram_jaccard_pairs"] = f"""
WITH {SPARK_DOCWORDS},
inv AS (SELECT doc_id, explode(sgs) AS sg FROM docshingles),
sizes AS (SELECT doc_id, size(sgs) AS n_sg FROM docshingles),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
    FROM inv a JOIN inv b ON a.sg = b.sg AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(shared AS DOUBLE) / (sa.n_sg + sb.n_sg - shared) AS jaccard
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / (sa.n_sg + sb.n_sg - shared) >= 0.6
"""

SPARK_SQL["dedup_ngram_jaccard_capped"] = f"""
WITH {SPARK_DOCWORDS},
inv AS (SELECT doc_id, explode(sgs) AS sg FROM docshingles),
freq AS (
    SELECT sg FROM (SELECT sg, COUNT(*) AS df FROM inv GROUP BY 1)
    WHERE df <= {DF_CAP}
),
invc AS (SELECT i.doc_id, i.sg FROM inv i JOIN freq f USING (sg)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sg FROM invc GROUP BY 1),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
    FROM invc a JOIN invc b ON a.sg = b.sg AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(shared AS DOUBLE) / (sa.n_sg + sb.n_sg - shared) AS jaccard
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / (sa.n_sg + sb.n_sg - shared) >= 0.6
"""

# -- text family -----------------------------------------------------------

SPARK_SQL["text_stats_by_lang"] = rf"""
WITH {SPARK_DOCWORDS},
per_doc AS (
    SELECT lang,
           size(ws) AS n_tokens,
           length(text) AS n_ch,
           length(regexp_replace(lower(text), '[a-z0-9\\s]', '')) AS n_punct
    FROM docwords
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens,
       CAST(SUM(n_ch) AS BIGINT) AS total_chars,
       CAST(SUM(n_punct) AS DOUBLE) / SUM(n_ch) AS punct_ratio
FROM per_doc
GROUP BY 1
"""


def _spark_stop_count(stopwords: list[str], ws: str = "ws") -> str:
    lits = ", ".join(f"'{w}'" for w in stopwords)
    return f"size(filter({ws}, w -> w IN ({lits})))"


def _lang_stop_sql() -> dict[str, str]:
    from ..operators.textstats import LANG_STOPWORDS

    return {lang: _spark_stop_count(sw) for lang, sw in LANG_STOPWORDS.items()}


SPARK_SQL["text_quality_scores"] = f"""
WITH {SPARK_DOCWORDS},
per_doc AS (
    SELECT doc_id,
           size(ws) AS n_tokens,
           length(regexp_replace(lower(text), '[^a-z]', '')) AS n_alpha,
           {_lang_stop_sql()["en"]} AS n_stop
    FROM docwords
    WHERE size(ws) >= 1
),
scored AS (
    -- D suffixes: bare 0.5/100.0 literals parse as DECIMAL in Spark SQL
    -- and decimal division rounds differently from the builder's DOUBLE
    -- arithmetic (1-ulp mismatch without them)
    SELECT doc_id, n_tokens,
           0.5D * least(1.0D, n_tokens / 100.0D)
           + 0.3D * (CASE WHEN CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3 AND 10
                         THEN 1.0D ELSE 0.0D END)
           + 0.2D * least(1.0D, 5.0D * (CAST(n_stop AS DOUBLE) / n_tokens))
               AS quality
    FROM per_doc
)
SELECT doc_id, n_tokens, quality,
       CAST(floor(quality * 10) AS INT) AS quality_bucket
FROM scored
"""


def _spark_langid() -> str:
    from ..operators.textstats import _LANG_ORDER

    whens = []
    for i, lang in enumerate(_LANG_ORDER):
        others = _LANG_ORDER[i + 1 :]
        cond = (
            " AND ".join(f"s_{lang} >= s_{o}" for o in others) if others else "TRUE"
        )
        whens.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " END"


def _langid_sql() -> str:
    from ..operators.textstats import _LANG_ORDER

    stops = _lang_stop_sql()
    score_cols = ", ".join(f"{stops[lang]} AS s_{lang}" for lang in _LANG_ORDER)
    return f"""
WITH {SPARK_DOCWORDS},
scored AS (
    SELECT lang, {score_cols}
    FROM docwords
),
predicted AS (
    SELECT lang, {_spark_langid()} AS predicted_lang FROM scored
)
SELECT lang, predicted_lang, COUNT(*) AS n_docs
FROM predicted
GROUP BY 1, 2
"""


SPARK_SQL["text_langid_stopwords"] = _langid_sql()

_BPE_SQL = r"[a-z]+|[0-9]+|[^a-z0-9\\s]"
SPARK_SQL["text_token_counts"] = f"""
WITH {SPARK_DOCWORDS}
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(size(ws)) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(size(regexp_extract_all(lower(text), '{_BPE_SQL}', 0))) AS BIGINT)
           AS total_bpe_tokens
FROM docwords
GROUP BY 1
"""

SPARK_SQL["text_fingerprints"] = f"""
WITH {SPARK_DOCWORDS}
SELECT doc_id,
       md5(text) AS content_md5,
       aggregate(ws, CAST(0 AS BIGINT),
                 (acc, w) -> (acc * 131 + ({_H_W} % {P})) % {P}) AS rolling_fp
FROM docwords
WHERE size(ws) >= 1
"""

# -- similarity family -----------------------------------------------------

SPARK_SQL["similarity_ann_cosine_topk"] = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS} AS cosine
    FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""

SPARK_SQL["similarity_lsh_buckets"] = f"""
SELECT vec_id, label, {_spark_bucket("embedding")} AS bucket
FROM embeddings
"""

SPARK_SQL["similarity_lsh_topk"] = f"""
WITH b AS (
    SELECT vec_id, embedding, {_spark_bucket("embedding")} AS bucket
    FROM embeddings
),
q AS (SELECT * FROM b WHERE vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS} AS cosine
    FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""

SPARK_SQL["similarity_ivf_topk"] = f"""
WITH assigned AS (
    SELECT vec_id, embedding, {spark_ivf_cluster_sql("embedding")} AS cluster_id
    FROM embeddings
),
q AS (SELECT * FROM assigned WHERE vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS} AS cosine
    FROM q JOIN assigned c ON c.cluster_id = q.cluster_id AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""

_COS_AB = (
    _SPARK_DOT.format(a="a.embedding", b="b.embedding")
    + f" / ({_SPARK_NORM.format(e='a.embedding')} * {_SPARK_NORM.format(e='b.embedding')})"
)
SPARK_SQL["similarity_cosine_pairs"] = f"""
WITH pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_COS_AB} AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine
FROM pairs WHERE cosine >= 0.45
"""

_COS_EA_EB = (
    _SPARK_DOT.format(a="ea.embedding", b="eb.embedding")
    + f" / ({_SPARK_NORM.format(e='ea.embedding')} * {_SPARK_NORM.format(e='eb.embedding')})"
)
SPARK_SQL["similarity_near_dup_pairs"] = f"""
WITH bands AS ({_spark_nd_bands()}),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
),
scored AS (
    SELECT c.vec_a, c.vec_b, {_COS_EA_EB} AS cosine
    FROM cand c
    JOIN embeddings ea ON c.vec_a = ea.vec_id
    JOIN embeddings eb ON c.vec_b = eb.vec_id
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.45
"""


# -- pipeline text family (round 7) ----------------------------------------

SPARK_SQL["text_repetition_scores"] = f"""
WITH {SPARK_DOCWORDS},
wc AS (
    SELECT doc_id, w, COUNT(*) AS c
    FROM (SELECT doc_id, explode(ws) AS w FROM docwords)
    GROUP BY 1, 2
),
wagg AS (
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           MAX(c) AS top_w
    FROM wc GROUP BY 1
),
bc AS (
    SELECT doc_id, b, COUNT(*) AS c
    FROM (SELECT doc_id,
                 explode(zip_with(
                     slice(ws, 1, greatest(size(ws) - 1, 0)),
                     slice(ws, 2, greatest(size(ws) - 1, 0)),
                     (a, b) -> concat_ws(' ', a, b))) AS b
          FROM docwords)
    GROUP BY 1, 2
),
bagg AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, MAX(c) AS top_b
    FROM bc GROUP BY 1
)
SELECT w.doc_id,
       w.n_words,
       w.n_distinct,
       CAST(w.n_distinct AS DOUBLE) / w.n_words AS distinct_ratio,
       CAST(w.top_w AS DOUBLE) / w.n_words AS top_word_frac,
       COALESCE(CAST(b.top_b AS DOUBLE) / b.n_bigrams, 0.0D) AS top_bigram_frac,
       (CAST(w.top_w AS DOUBLE) / w.n_words > 0.125
        OR COALESCE(CAST(b.top_b AS DOUBLE) / b.n_bigrams, 0.0D) > 0.04)
           AS flag_repetitious
FROM wagg w LEFT JOIN bagg b USING (doc_id)
"""


def _chunk_sql() -> str:
    from ..operators.textstats import CHUNK_SIZE, CHUNK_STRIDE

    return f"""
WITH {SPARK_DOCWORDS},
starts AS (
    SELECT doc_id, ws,
           explode(sequence(0, greatest(size(ws) - 1, 0), {CHUNK_STRIDE})) AS s
    FROM docwords
)
SELECT doc_id,
       CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(size(slice(ws, s + 1, {CHUNK_SIZE})) AS BIGINT) AS n_tokens,
       concat_ws(' ', slice(ws, s + 1, {CHUNK_SIZE})) AS chunk_text
FROM starts
"""


SPARK_SQL["text_chunk_documents"] = _chunk_sql()


# ---- round-8 pipeline operators -------------------------------------------


def _round8_twins() -> dict[str, str]:
    from ..functions.text import words_sql
    from ..operators.sampling import N_SHARDS, _SHARD_SALT
    from ..operators.textstats import (
        PACK_BUDGET,
        TOP_BIGRAMS_K,
        PII_PATTERNS,
        _spark_pat,
        pii_redact_sql,
    )

    shard_h = (
        f"CAST(CONV(SUBSTRING(MD5(CONCAT('{_SHARD_SALT}', "
        f"CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
    )
    pii_counts = ", ".join(
        f"CAST(size(regexp_extract_all(text, '{_spark_pat(pat)}', 0)) AS BIGINT)"
        f" AS n_{name}s"
        for name, (pat, _rep) in PII_PATTERNS.items()
    )
    return {
        "corpus_shard_assignments": f"""
WITH h AS (SELECT doc_id, {shard_h} AS hv FROM documents)
SELECT doc_id,
       CAST(hv % {N_SHARDS} AS INT) AS shard_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY hv % {N_SHARDS}
                               ORDER BY hv, doc_id) AS BIGINT) AS pos_in_shard
FROM h
""",
        "text_pii_redaction": f"""
SELECT doc_id, {pii_counts}, {pii_redact_sql("text")} AS redacted
FROM documents
""",
        "text_top_bigrams": f"""
WITH docwords AS (SELECT {words_sql("text")} AS ws FROM documents),
bi AS (
    SELECT explode(transform(sequence(1, size(ws) - 1),
                             i -> concat(element_at(ws, i), ' ',
                                         element_at(ws, i + 1)))) AS bigram
    FROM docwords WHERE size(ws) >= 2
)
SELECT bigram, COUNT(*) AS n
FROM bi GROUP BY bigram ORDER BY n DESC, bigram LIMIT {TOP_BIGRAMS_K}
""",
        "text_pack_sequences": f"""
WITH tok AS (
    SELECT lang, doc_id, size({words_sql("text")}) AS n_tokens FROM documents
),
cum AS (
    SELECT lang, doc_id, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_end
    FROM tok WHERE n_tokens >= 1
),
spans AS (
    SELECT lang, doc_id, cum_end - n_tokens AS cum_start, cum_end FROM cum
),
packed AS (
    SELECT lang, doc_id, cum_start, cum_end,
           explode(sequence(CAST(floor(cum_start / {PACK_BUDGET}) AS BIGINT),
                            CAST(floor((cum_end - 1) / {PACK_BUDGET}) AS BIGINT)))
               AS pack_id
    FROM spans
)
SELECT lang, doc_id, pack_id,
       CAST(greatest(cum_start, pack_id * {PACK_BUDGET})
            - pack_id * {PACK_BUDGET} AS BIGINT) AS start_tok,
       CAST(least(cum_end, (pack_id + 1) * {PACK_BUDGET})
            - greatest(cum_start, pack_id * {PACK_BUDGET}) AS BIGINT) AS n_tok
FROM packed
""",
    }


SPARK_SQL.update(_round8_twins())


# The incremental staging contract is non-recursive SQL (batch pairs
# filtered to new-touching); its Spark twin reuses the batch twin's CTEs.
SPARK_SQL["dedup_incremental_lsh_pairs"] = (
    SPARK_SQL["dedup_minhash_lsh_pairs"]
    + "WHERE c.doc_a % 2 = 1 OR c.doc_b % 2 = 1\n"
)

# Corpus-source minhash overlap: per-source signature = MIN over exploded
# shingle hashes (sig(A ∪ B) = elementwise min), est next to exact Jaccard.
SPARK_SQL["corpus_source_similarity"] = f"""
WITH {SPARK_DOCWORDS},
exploded AS (SELECT source, explode(sgs) AS sg FROM docshingles),
ssig AS (
    SELECT source,
           {", ".join(f"MIN(({a} * ({SPARK_H.format(x='sg')} % {P}) + {b}) % {P}) AS mh{i}" for i, (a, b) in enumerate(MINHASH_COEFFS))}
    FROM exploded GROUP BY source
),
est AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST({" + ".join(f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)" for i in range(_K))} AS BIGINT)
               AS n_matching_minhash
    FROM ssig a JOIN ssig b ON a.source < b.source
),
dist AS (SELECT DISTINCT source, sg FROM exploded),
sizes AS (SELECT source, COUNT(*) AS n FROM dist GROUP BY source),
inter AS (
    SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
    FROM dist a JOIN dist b ON a.sg = b.sg AND a.source < b.source
    GROUP BY 1, 2
)
SELECT e.src_a, e.src_b, e.n_matching_minhash,
       CAST(e.n_matching_minhash AS DOUBLE) / {_K} AS est_jaccard,
       CAST(COALESCE(i.n_shared, 0) AS DOUBLE)
           / (sa.n + sb.n - COALESCE(i.n_shared, 0)) AS exact_jaccard
FROM est e
LEFT JOIN inter i ON e.src_a = i.src_a AND e.src_b = i.src_b
JOIN sizes sa ON e.src_a = sa.source
JOIN sizes sb ON e.src_b = sb.source
"""

# Interpolated median: Spark's exact percentile() is the dialect form of
# PERCENTILE_CONT (verified bit-identical by the oracle gate).
SPARK_SQL["events_value_median_cont"] = """
SELECT event_type, percentile(value, 0.5) AS median_value
FROM events GROUP BY event_type
"""


# Funnel: the oracle's scalar subqueries run in Spark too; only the
# dialect-neutral text is reused verbatim (appended to NEUTRAL_AS_IS
# below would also work — kept here so the retention twin sits beside it).
SPARK_SQL["events_funnel_conversion"] = """
WITH v AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after_view,
       CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after_click
"""

SPARK_SQL["events_weekly_retention"] = """
WITH first_seen AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
    FROM events
)
SELECT CAST(f.cohort_week AS STRING) AS cohort_week,
       CAST(datediff(a.act_week, f.cohort_week) DIV 7 AS BIGINT)
           AS week_offset,
       COUNT(*) AS n_active_users
FROM activity a JOIN first_seen f ON a.user_id = f.user_id
GROUP BY 1, 2
"""

# SCD2 (operators/scd.py): the gaps-and-islands oracles are dialect-neutral
# (Spark supports the named WINDOW clause and windows-over-aggregates), so
# they run verbatim — appended to NEUTRAL_AS_IS below rather than twinned.
NEUTRAL_AS_IS += [
    "scd2_user_state_history",
    "scd2_dim_asof_orders",
]

from ..operators.sampling import _TEMP_SALT  # noqa: E402

SPARK_SQL["sample_lang_temperature"] = f"""
WITH counts AS (
    SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
),
rates AS (
    SELECT lang, n_total,
           CAST(FLOOR(1000.0 * SQRT((SELECT MIN(n_total) FROM counts) * 1.0
                                    / n_total)) AS BIGINT) AS keep_permille
    FROM counts
),
kept AS (
    SELECT d.lang, d.doc_id
    FROM documents d JOIN rates r USING (lang)
    WHERE {SPARK_H.format(x=f"concat('{_TEMP_SALT}', CAST(d.doc_id AS STRING))")}
          % 1000 < r.keep_permille
),
census AS (
    SELECT lang, COUNT(*) AS n_kept,
           MIN(doc_id) AS min_kept_id, MAX(doc_id) AS max_kept_id
    FROM kept GROUP BY lang
)
SELECT r.lang, r.n_total, r.keep_permille,
       COALESCE(c.n_kept, CAST(0 AS BIGINT)) AS n_kept,
       c.min_kept_id, c.max_kept_id
FROM rates r LEFT JOIN census c USING (lang)
"""

#: Spark-dialect twin of operators/similarity._DUCK_Q8 — the single SQL-text
#: definition of the int8 quantization CTE, shared by both quantized twins.
_SPARK_Q8 = """qbase AS (
    SELECT vec_id, embedding,
           array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))
               AS scale
    FROM embeddings
),
q8 AS (
    SELECT vec_id, scale,
           transform(embedding,
               x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                         ELSE CAST(round((CAST(x AS DOUBLE) * 127.0) / scale)
                                   AS BIGINT) END) AS qvec
    FROM qbase
)"""

SPARK_SQL["similarity_quantized_topk"] = f"""
WITH {_SPARK_Q8},
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           aggregate(zip_with(q.qvec, c.qvec, (a, b) -> a * b),
                     CAST(0 AS BIGINT), (acc, x) -> acc + x) AS qdot,
           q.scale AS q_scale, c.scale AS c_scale
    FROM q8 q JOIN q8 c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
    SELECT query_id, neighbor_id, qdot,
           ((qdot * q_scale) * c_scale) / 16129.0 AS approx_dot,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY ((qdot * q_scale) * c_scale) DESC,
                                              neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, qdot, approx_dot, rank
FROM ranked WHERE rank <= {TOP_K}
"""

# events_ewma_by_user: the recursion no SQL window FRAME expresses IS a
# fold, and Spark SQL has one — the aggregate() higher-order function.
# Same lambda as the production builder and the DuckDB list_reduce oracle
# (0.125D/0.875D literals: DOUBLE, same IEEE sequence, bit-exact). The
# grouped-map twin events_ewma_grouped_map stays text-less (it exists to
# exercise the Pandas surface, not the SQL one).
from ..operators.events import EWMA_ALPHA  # noqa: E402

SPARK_SQL["events_ewma_by_user"] = f"""
WITH hist AS (
    SELECT user_id,
           filter(sort_array(collect_list(struct(ts, event_id, value))),
                  s -> s.value IS NOT NULL) AS h
    FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(size(h) AS BIGINT) AS n_events,
       aggregate(h, CAST(NULL AS DOUBLE),
                 (acc, s) -> CASE WHEN acc IS NULL THEN s.value
                             ELSE {EWMA_ALPHA}D * s.value
                                  + {1.0 - EWMA_ALPHA}D * acc END) AS ewma
FROM hist
"""
from ..operators.events import ROLL_WINDOW_US  # noqa: E402

SPARK_SQL["events_rolling_24h"] = f"""
SELECT event_id, user_id, unix_micros(ts) AS ts_us,
       COUNT(*) OVER w AS n_24h,
       SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS sum_centivalue_24h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(ts)
             RANGE BETWEEN {ROLL_WINDOW_US} PRECEDING AND CURRENT ROW)
"""

SPARK_SQL["similarity_ivf_quantized_topk"] = f"""
WITH assigned AS (
    SELECT vec_id, {spark_ivf_cluster_sql("embedding")} AS cluster_id
    FROM embeddings
),
{_SPARK_Q8},
a8 AS (
    SELECT a.vec_id, a.cluster_id, s.scale, s.qvec
    FROM assigned a JOIN q8 s USING (vec_id)
),
qp AS (
    SELECT vec_id, explode({spark_ivf_probes_sql("embedding")}) AS probe
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
qq AS (
    SELECT qp.vec_id, qp.probe, s.scale AS q_scale, s.qvec AS q_qvec
    FROM qp JOIN q8 s ON s.vec_id = qp.vec_id
),
pairs AS (
    SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
           aggregate(zip_with(qq.q_qvec, c.qvec, (a, b) -> a * b),
                     CAST(0 AS BIGINT), (acc, x) -> acc + x) AS qdot,
           qq.q_scale, c.scale AS c_scale
    FROM qq JOIN a8 c ON c.cluster_id = qq.probe AND c.vec_id <> qq.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, qdot,
           ((qdot * q_scale) * c_scale) / 16129.0 AS approx_dot,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY ((qdot * q_scale) * c_scale) DESC,
                                              neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, qdot, approx_dot, rank
FROM ranked WHERE rank <= {TOP_K}
"""

from ..functions.text import words_sql  # noqa: E402

SPARK_SQL["text_word_rarity_scores"] = f"""
WITH docwords AS (
    SELECT doc_id, {words_sql("text")} AS ws
    FROM documents
),
tokens AS (
    SELECT doc_id, explode(ws) AS w FROM docwords
),
df_map AS (
    SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM tokens GROUP BY w
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(m.df) AS BIGINT) AS sum_df,
       CAST(MIN(m.df) AS BIGINT) AS rarest_df
FROM tokens t JOIN df_map m ON m.w = t.w
GROUP BY t.doc_id
"""

# affinity_lift_rules' oracle is dialect-neutral (shared FACT_CTE + scalar
# subqueries + integer-ratio arithmetic) — Spark runs it verbatim.
NEUTRAL_AS_IS += ["affinity_lift_rules"]

from ..plans.olap_extra import RFM_ANCHOR  # noqa: E402

SPARK_SQL["rfm_customer_segments"] = f"""
WITH base AS (
    SELECT o_custkey,
           CAST(datediff(DATE '{RFM_ANCHOR}', CAST(MAX(o_orderdate) AS DATE))
                AS BIGINT) AS r_days,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS monetary
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT *,
           NTILE(5) OVER (ORDER BY r_days DESC, o_custkey) AS r_score,
           NTILE(5) OVER (ORDER BY n_orders ASC, o_custkey) AS f_score,
           NTILE(5) OVER (ORDER BY monetary ASC, o_custkey) AS m_score
    FROM base
)
SELECT o_custkey, r_days, n_orders, monetary,
       CAST(r_score AS INT) AS r_score,
       CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_segment
FROM scored
"""


from ..operators.textstats import TOKEN_BUDGET_PER_LANG  # noqa: E402

SPARK_SQL["corpus_select_token_budget"] = f"""
WITH {SPARK_DOCWORDS},
per_doc AS (
    SELECT doc_id,
           size(ws) AS n_tokens,
           length(regexp_replace(lower(text), '[^a-z]', '')) AS n_alpha,
           {_lang_stop_sql()["en"]} AS n_stop
    FROM docwords
    WHERE size(ws) >= 1
),
scored AS (
    SELECT doc_id, n_tokens,
           0.5D * least(1.0D, n_tokens / 100.0D)
           + 0.3D * (CASE WHEN CAST(n_alpha AS DOUBLE) / n_tokens BETWEEN 3 AND 10
                         THEN 1.0D ELSE 0.0D END)
           + 0.2D * least(1.0D, 5.0D * (CAST(n_stop AS DOUBLE) / n_tokens))
               AS quality
    FROM per_doc
),
ranked AS (
    SELECT s.doc_id, d.lang, CAST(s.n_tokens AS BIGINT) AS n_tokens,
           s.quality,
           SUM(CAST(s.n_tokens AS BIGINT)) OVER (
               PARTITION BY d.lang ORDER BY s.quality DESC, s.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_tokens
    FROM scored s JOIN docwords d USING (doc_id)
)
SELECT doc_id, lang, n_tokens, quality, cum_tokens
FROM ranked WHERE cum_tokens <= {TOKEN_BUDGET_PER_LANG}
"""


# text_idf_quality_scores has NO SQL twin on purpose: even within one
# engine, two different plans sum ln() terms in different partial-agg
# orders, so the dual-surface strict-equality gate would flake on the
# last ulp (measured: 8.2873914575032 vs ...3201). Its gate is the
# tolerance-based DuckDB differential in tests/test_docs_pipeline.py —
# the same reason the engine keeps integer cores for hash-gated scores.


def _spark_cms_sql() -> str:
    from ..operators.cms import CMS_DEPTH, CMS_WIDTH, _PROBE_MIN_LEN

    depths = ", ".join(str(i) for i in range(CMS_DEPTH))
    h = (
        "CAST(CONV(SUBSTRING(MD5(CONCAT('cms', CAST(d.i AS STRING), ':', "
        "{w})), 1, 15), 16, 10) AS BIGINT) % " + str(CMS_WIDTH)
    )
    return f"""
WITH {SPARK_DOCWORDS},
tokens AS (SELECT explode(ws) AS word FROM docwords),
depths AS (SELECT explode(array({depths})) AS i),
counters AS (
    SELECT d.i AS i, {h.format(w="t.word")} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tokens t CROSS JOIN depths d
    GROUP BY 1, 2
),
probes AS (
    SELECT DISTINCT word FROM tokens WHERE length(word) >= {_PROBE_MIN_LEN}
),
pairs AS (
    SELECT p.word, d.i AS i, {h.format(w="p.word")} AS bucket
    FROM probes p CROSS JOIN depths d
)
SELECT pr.word AS word,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
FROM pairs pr LEFT JOIN counters c ON pr.i = c.i AND pr.bucket = c.bucket
GROUP BY 1
"""


SPARK_SQL["cms_word_count_estimates"] = _spark_cms_sql()

SPARK_SQL["dedup_containment_pairs"] = f"""
WITH {SPARK_DOCWORDS},
inv AS (SELECT doc_id, explode(sgs) AS sg FROM docshingles),
freq AS (
    SELECT sg FROM (SELECT sg, COUNT(*) AS df FROM inv GROUP BY 1)
    WHERE df <= {DF_CAP}
),
invc AS (SELECT i.doc_id, i.sg FROM inv i JOIN freq f USING (sg)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sg FROM invc GROUP BY 1),
shared AS (
    SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc, COUNT(*) AS shared
    FROM invc a JOIN invc b ON a.sg = b.sg AND a.doc_id <> b.doc_id
    GROUP BY 1, 2
)
SELECT s.src_doc, s.dst_doc, CAST(sz.n_sg AS BIGINT) AS n_src,
       CAST(s.shared AS DOUBLE) / sz.n_sg AS containment
FROM shared s JOIN sizes sz ON s.src_doc = sz.doc_id
WHERE CAST(s.shared AS DOUBLE) / sz.n_sg >= 0.6
"""

# Spark has no forward ASOF either: nearest FUTURE purchase = MIN over the
# >= side, then join back on the exact (key, ts) — the mirror of the
# asof_join_last_order twin above.
SPARK_SQL["asof_forward_next_purchase"] = """
WITH ev AS (
    SELECT event_id, user_id, ts FROM events WHERE event_id % 20 = 0
),
pur AS (
    SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, ts ORDER BY event_id DESC
               ) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
),
best AS (
    SELECT e.event_id, MIN(p.ts) AS best_ts
    FROM ev e
    LEFT JOIN pur p ON e.user_id = p.user_id AND p.ts >= e.ts
    GROUP BY e.event_id
)
SELECT e.event_id, e.user_id,
       unix_micros(e.ts) AS event_ts_us,
       p.event_id AS next_purchase_id,
       unix_micros(CAST(p.ts AS TIMESTAMP)) AS next_purchase_ts_us
FROM ev e
JOIN best b ON e.event_id = b.event_id
LEFT JOIN pur p ON b.best_ts = p.ts AND e.user_id = p.user_id
"""


def _spark_hist_sql() -> str:
    from ..operators.histogram import _Q_DEN, _q_num, HIST_QS, HIST_WIDTH

    # Same exact-integer boundary test as the builder and the DuckDB
    # oracle: cum*_Q_DEN >= num*total (no DOUBLE q·total product).
    q_cols = ", ".join(
        "CAST(MIN(CASE WHEN cum * {den} >= {num} * total THEN bin END)"
        " * {w} AS DOUBLE) AS p{n}_lo".format(
            den=_Q_DEN, num=_q_num(q), w=float(HIST_WIDTH), n=round(q * 100)
        )
        for q in HIST_QS
    )
    return f"""
WITH hist AS (
    SELECT event_type, CAST(FLOOR(value / {float(HIST_WIDTH)}) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2
),
cum AS (
    SELECT event_type, bin, cnt,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY event_type) AS total
    FROM hist
)
SELECT event_type, {q_cols}
FROM cum
GROUP BY 1
"""


SPARK_SQL["events_value_histogram_percentiles"] = _spark_hist_sql()

def _spark_bm25_sql() -> str:
    from ..functions.text import words_sql
    from ..operators.retrieval import BM25_CONTRIB, LEXICAL_K, queries_rows_sql

    rows = queries_rows_sql()
    return f"""
WITH d AS (
    SELECT doc_id, {words_sql("text")} AS ws
    FROM documents WHERE text IS NOT NULL
),
tokens AS (SELECT doc_id, explode(ws) AS w FROM d),
postings AS (
    SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tokens GROUP BY 1, 2
),
withdl AS (
    SELECT doc_id, w, tf,
           CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
    FROM postings
),
dfm AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY 1),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS sum_dl
    FROM (SELECT DISTINCT doc_id, dl FROM withdl)
),
qterms AS (
    SELECT CAST(query_id AS BIGINT) AS query_id, w,
           CAST(COUNT(*) AS BIGINT) AS qtf
    FROM (
        SELECT query_id, explode({words_sql("qtext")}) AS w
        FROM VALUES {rows} AS q(query_id, qtext)
    )
    GROUP BY 1, 2
),
scored AS (
    SELECT q.query_id, p.doc_id,
           CAST(SUM({BM25_CONTRIB} * qtf) AS BIGINT) AS score
    FROM qterms q
    JOIN withdl p ON p.w = q.w
    JOIN dfm ON dfm.w = q.w
    CROSS JOIN stats
    GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, doc_id, score,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rnk
    FROM scored
)
SELECT query_id, doc_id, score, rnk FROM ranked WHERE rnk <= {LEXICAL_K}
"""


SPARK_SQL["lexical_bm25_topk"] = _spark_bm25_sql()


def _spark_tfidf_sql() -> str:
    # Semantic twin (join-based pair form; the builder carries the
    # posting-list double-explode). Same hashed grams, same integer
    # weights from the shared formula strings, same ride-along window
    # norm — values are bit-identical.
    from ..functions.text import word_grams_sql, words_sql
    from ..operators.retrieval import (
        TFIDF_COSINE,
        TFIDF_DF_CAP,
        TFIDF_THRESHOLD,
        TFIDF_WEIGHT,
    )

    return f"""
WITH d AS (
    SELECT doc_id, {words_sql("text")} AS ws
    FROM documents WHERE text IS NOT NULL
),
g AS (
    SELECT doc_id, explode({word_grams_sql("ws")}) AS sg
    FROM d WHERE size(ws) >= 3
),
p AS (
    SELECT doc_id, xxhash64(sg) AS w, CAST(COUNT(*) AS BIGINT) AS tf
    FROM g GROUP BY 1, 2
),
dfm AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY 1),
stats AS (
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM p
),
weighted AS (
    SELECT doc_id, p.w, {TFIDF_WEIGHT} AS wgt
    FROM p JOIN dfm ON dfm.w = p.w AND df <= {TFIDF_DF_CAP}
    CROSS JOIN stats
),
wn AS (
    SELECT doc_id, w, wgt,
           CAST(SUM(wgt * wgt) OVER (PARTITION BY doc_id) AS BIGINT) AS nrm2
    FROM weighted
),
dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           a.nrm2 AS na2, b.nrm2 AS nb2,
           CAST(SUM(a.wgt * b.wgt) AS BIGINT) AS dot
    FROM wn a JOIN wn b ON a.w = b.w AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, {TFIDF_COSINE} AS cosine
FROM dots WHERE {TFIDF_COSINE} >= {TFIDF_THRESHOLD}
"""


SPARK_SQL["lexical_tfidf_cosine_pairs"] = _spark_tfidf_sql()

# Semantic twin, not plan twin (the overlap twin below sets the
# precedent): the SQL-text contract is the quadratic definition; the
# DataFrame builder carries the blocked PassJoin plan that survives
# scale. The threshold comes from the operator's constant so the two
# surfaces cannot drift.
def _spark_fuzzy_sql() -> str:
    from ..operators.fuzzy import _FUZZY_D

    return f"""
WITH s AS (
    SELECT p_partkey AS id, concat_ws(' ', p_brand, p_type, p_name) AS s
    FROM part WHERE p_partkey % 10 = 0
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM s a JOIN s b
  ON a.id < b.id AND levenshtein(a.s, b.s) <= {_FUZZY_D}
"""


SPARK_SQL["fuzzy_part_desc_pairs"] = _spark_fuzzy_sql()


def _spark_fuzzy_link_sql() -> str:
    # Semantic twin of the two-table record-linkage form — quadratic
    # definition, threshold from the operator constant.
    from ..operators.fuzzy import _FUZZY_D

    return f"""
WITH a AS (
    SELECT p_partkey AS id, concat_ws(' ', p_brand, p_type, p_name) AS s
    FROM part WHERE p_partkey % 10 = 0
),
b AS (
    SELECT p_partkey AS id, concat_ws(' ', p_brand, p_type, p_name) AS s
    FROM part WHERE p_partkey % 10 = 5
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM a JOIN b ON levenshtein(a.s, b.s) <= {_FUZZY_D}
"""


SPARK_SQL["fuzzy_part_link_pairs"] = _spark_fuzzy_link_sql()

SPARK_SQL["overlap_shipping_windows"] = """
WITH win AS (
    SELECT l_orderkey * 10 + l_linenumber AS id,
           CAST(l_shipdate AS DATE) AS start_d,
           date_add(CAST(l_shipdate AS DATE), CAST(l_quantity AS INT)) AS end_d
    FROM lineitem WHERE l_orderkey % 100 = 0
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST(datediff(LEAST(a.end_d, b.end_d),
                     GREATEST(a.start_d, b.start_d)) + 1 AS BIGINT)
           AS overlap_days
FROM win a JOIN win b
  ON a.id < b.id
 AND a.start_d <= b.end_d AND b.start_d <= a.end_d
"""


def _spark_hybrid_ctes() -> str:
    """Spark-dialect twin of retrieval._HYBRID_CTES (r19 factoring): the
    shared tokenize -> postings -> legs -> fusion CTE prefix, reused by
    the RRF twin and the retrieval-eval twin so the two cannot drift."""
    from ..functions.text import words_sql
    from ..operators.retrieval import (
        BM25_CONTRIB,
        LEXICAL_K,
        RRF_SCORE,
        TFIDF_WEIGHT,
        queries_rows_sql,
    )

    rows = queries_rows_sql()
    return f"""d AS (
    SELECT doc_id, {words_sql("text")} AS ws
    FROM documents WHERE text IS NOT NULL
),
tokens AS (SELECT doc_id, explode(ws) AS w FROM d),
postings AS (
    SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tokens GROUP BY 1, 2
),
withdl AS (
    SELECT doc_id, w, tf,
           CAST(SUM(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS dl
    FROM postings
),
dfm AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY 1),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS sum_dl
    FROM (SELECT DISTINCT doc_id, dl FROM withdl)
),
qterms AS (
    SELECT CAST(query_id AS BIGINT) AS query_id, w,
           CAST(COUNT(*) AS BIGINT) AS qtf
    FROM (
        SELECT query_id, explode({words_sql("qtext")}) AS w
        FROM VALUES {rows} AS q(query_id, qtext)
    )
    GROUP BY 1, 2
),
bm25_ranked AS (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rnk_a
    FROM (
        SELECT q.query_id, p.doc_id,
               CAST(SUM({BM25_CONTRIB} * qtf) AS BIGINT) AS score
        FROM qterms q
        JOIN withdl p ON p.w = q.w
        JOIN dfm ON dfm.w = q.w
        CROSS JOIN stats
        GROUP BY 1, 2
    )
),
tdot_ranked AS (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rnk_b
    FROM (
        SELECT q.query_id, p.doc_id,
               CAST(SUM({TFIDF_WEIGHT} * qtf) AS BIGINT) AS score
        FROM qterms q
        JOIN postings p ON p.w = q.w
        JOIN dfm ON dfm.w = q.w
        CROSS JOIN stats
        GROUP BY 1, 2
    )
),
fused AS (
    SELECT COALESCE(a.query_id, b.query_id) AS query_id,
           COALESCE(a.doc_id, b.doc_id) AS doc_id,
           a.rnk_a, b.rnk_b
    FROM (SELECT * FROM bm25_ranked WHERE rnk_a <= {LEXICAL_K}) a
    FULL OUTER JOIN
         (SELECT * FROM tdot_ranked WHERE rnk_b <= {LEXICAL_K}) b
    ON a.query_id = b.query_id AND a.doc_id = b.doc_id
),
rrf_ranked AS (
    SELECT query_id, doc_id, rrf_score,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
           ) AS BIGINT) AS rnk
    FROM (SELECT query_id, doc_id, {RRF_SCORE} AS rrf_score FROM fused)
)"""


def _spark_rrf_sql() -> str:
    from ..operators.retrieval import LEXICAL_K

    return f"""
WITH {_spark_hybrid_ctes()}
SELECT query_id, doc_id, rrf_score, rnk
FROM rrf_ranked
WHERE rnk <= {LEXICAL_K}
"""


def _spark_retrieval_eval_sql() -> str:
    from ..operators.retrieval_eval import _EVAL_TAIL

    return f"""
WITH {_spark_hybrid_ctes()},
{_EVAL_TAIL}
"""


def _spark_retrieval_ndcg_sql() -> str:
    from ..operators.retrieval_eval import _NDCG_TAIL

    return f"""
WITH {_spark_hybrid_ctes()},
{_NDCG_TAIL}
"""


def _spark_leg_agreement_sql() -> str:
    from ..operators.retrieval_eval import _AGREE_TAIL

    return f"""
WITH {_spark_hybrid_ctes()},
{_AGREE_TAIL}
"""


SPARK_SQL["retrieval_rrf_fusion"] = _spark_rrf_sql()
SPARK_SQL["retrieval_eval_mrr_recall"] = _spark_retrieval_eval_sql()
SPARK_SQL["retrieval_eval_ndcg"] = _spark_retrieval_ndcg_sql()
SPARK_SQL["retrieval_leg_agreement"] = _spark_leg_agreement_sql()
