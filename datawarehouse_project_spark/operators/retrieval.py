"""Sparse lexical retrieval: BM25-style top-k via an inverted-index join.

The lexical complement to the dense-ANN family (operators/similarity.py,
ann_index.py): score documents against a query set through TERM POSTINGS
— the plan shape that survives any corpus size because nothing is ever
pairwise. Training-data pipelines use exactly this for quality-biased
corpus selection and retrieval-based decontamination.

Plan shape (all Catalyst, zero Python in the row path):
  1. postings: explode(words(text)) → groupBy(doc_id, term) count = tf —
     one corpus scan, partial aggs throughout;
  2. per-doc length dl: a window SUM over the postings (no second corpus
     scan) — at scale this is one exchange on doc_id;
  3. df map + (N, Σdl) corpus stats: aggregates OVER THE POSTINGS, which
     are orders of magnitude smaller than the corpus text;
  4. score: query terms (a bounded, BROADCAST set) equi-join the postings
     on term — the inverted-index probe; contributions aggregate per
     (query, doc);
  5. top-k per query: rank-filter, which Spark executes as
     WindowGroupLimit (partial per-partition top-k BEFORE the shuffle on
     query_id — the two-stage top-k, plan-pinned in tests).

Scoring is the BM25 shape with two deliberate substitutions for
cross-engine bit-exactness (the registry's determinism discipline):
``sqrt(N/df)`` replaces ``ln``-idf (sqrt IS correctly rounded under
IEEE 754 across libms; ln is not — see text_idf_quality_scores), and
per-(term,doc) contributions are floor-scaled to BIGINT before the SUM
(integer addition is order-free; double sums depend on reduction order).
The float part is a fixed expression tree evaluated on identical operands
in identical textual order — the SAME formula string builds the Spark
expression and the DuckDB oracle.

Reference parity note: the reference has no text retrieval (MySQL layer,
olap_queries.sql); this is LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import words
from ..io import spread, table
from ..plans.registry import register
from ..session import prepare

#: BM25 k1=1.2, b=0.75 — folded into literals so both engines evaluate
#: the identical constant tree: k1+1=2.2, 1-b=0.25.
#: One shared formula string; column names are unambiguous post-join in
#: both engines. FLOOR before the BIGINT cast (Spark truncates
#: double→bigint, DuckDB rounds — the repo-wide recipe).
BM25_CONTRIB = (
    "CAST(FLOOR((CAST(10000 AS DOUBLE) * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))"
    " / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)"
    " + CAST(0.75 AS DOUBLE) * (CAST(dl AS DOUBLE)"
    " / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))))"
    " * sqrt(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))) AS BIGINT)"
)

#: The registered query's fixed query set (terms from the documents
#: vocabulary; 'detection' is deliberately out-of-vocabulary — it must
#: contribute nothing; 'dup dup' exercises query-term frequency).
LEXICAL_QUERIES = [
    (0, "dup row detection"),
    (1, "hash join agg"),
    (2, "window order stream batch"),
    (3, "fast scan filter column value"),
    (4, "dup dup key"),
]

LEXICAL_K = 10


def term_counts(docs: DataFrame) -> DataFrame:
    """Raw inverted-index postings: (doc_id, w, tf) — the maintainable
    state (tf is additive across document batches, so an
    IncrementalRollup folds appends exactly)."""
    tokens = docs.select("doc_id", F.explode(words("text")).alias("w"))
    return tokens.groupBy("doc_id", "w").agg(
        F.count("*").cast("bigint").alias("tf")
    )


def term_postings(docs: DataFrame) -> DataFrame:
    """Postings with per-doc length: (doc_id, w, tf, dl)."""
    return with_doc_length(term_counts(docs))


def with_doc_length(postings: DataFrame) -> DataFrame:
    """Attach dl (total tokens per doc) to (doc_id, w, tf) postings —
    one window exchange over the postings, never the corpus."""
    return postings.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("bigint")
    )


def lexical_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = LEXICAL_K,
) -> DataFrame:
    """Top-``k`` documents per query under the scaled-integer BM25
    score, computed from the corpus text. ``queries``: (query_id BIGINT,
    qtext STRING) — a bounded set, broadcast to the postings probe."""
    return lexical_topk_from_postings(term_counts(docs), queries, k=k)


def lexical_topk_from_postings(
    counts: DataFrame,
    queries: DataFrame,
    k: int = LEXICAL_K,
) -> DataFrame:
    """The scoring plan over ALREADY-BUILT postings ``(doc_id, w, tf)``
    — the serving form: df map, corpus stats, and dl all derive from the
    postings (vocabulary × doc-sized), so no corpus text is touched.

    Tokenization note: both engines split ''/'   ' to ``['']`` (one
    empty token — verified against DuckDB regexp_split_to_array), so
    empty-text docs contribute identically on both sides; no filter
    needed for cross-engine exactness."""
    postings = with_doc_length(counts)
    per_doc = postings.select("doc_id", "dl").distinct()
    stats = per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    qterms = (
        queries.select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.explode(words("qtext")).alias("w"),
        )
        .groupBy("query_id", "w")
        .agg(F.count("*").cast("bigint").alias("qtf"))
    )
    # df is the TRUE corpus document frequency, but only the (bounded)
    # query terms' rows are ever probed — semi-restrict the postings to
    # those terms BEFORE the vocab-wide agg, so the broadcast below
    # ships |query terms| rows, not the vocabulary (which at corpus
    # scale would blow the broadcast limit).
    dfm = (
        postings.join(F.broadcast(qterms.select("w").distinct()), "w")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("df"))
    )
    scored = (
        postings.join(F.broadcast(qterms), "w")
        .join(F.broadcast(dfm), "w")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", F.expr(BM25_CONTRIB) * F.col("qtf"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").cast("bigint").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "score", "rnk")
    )


def queries_rows_sql() -> str:
    """The fixed query set as SQL VALUES rows — the single source for
    the DuckDB oracle AND the Spark-SQL twin (plans/sql_twins.py), so
    the two surfaces cannot drift."""
    return ", ".join(f"({qid}, '{qt}')" for qid, qt in LEXICAL_QUERIES)


def _queries_values_sql() -> str:
    return f"(VALUES {queries_rows_sql()}) AS q(query_id, qtext)"


#: One oracle for both the compute-from-text and the serve-from-store
#: forms: the maintained state must answer the query EXACTLY.
_BM25_ORACLE = f"""
WITH d AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
    FROM documents
),
tokens AS (SELECT doc_id, unnest(ws) AS w FROM d),
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
        SELECT query_id,
               unnest(regexp_split_to_array(lower(trim(qtext)), '\\s+')) AS w
        FROM {_queries_values_sql()}
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


@register(
    "lexical_bm25_topk",
    # r13 rotation IN: pre-validated with the plain-session driver-sim
    # recipe before the swap (fullouter_yearly_customer_recon ceded)
    oracle=_BM25_ORACLE,
)
def lexical_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents per fixed query under scaled-integer BM25 with
    sqrt-idf — the inverted-index retrieval plan (see module
    docstring)."""
    prepare(spark)
    docs = spread(spark, table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    q = spark.createDataFrame(
        LEXICAL_QUERIES, "query_id bigint, qtext string"
    )
    return lexical_topk(docs, q, k=LEXICAL_K)


# --------------------------------------------------------------------------
# Serving form: the postings as MAINTAINED STATE (io.ServingMemo +
# IncrementalRollup), same lifecycle as the hourly rollup and the vector
# index — build on first use, mtime-token staleness, refresh_table hook,
# atexit cleanup. tf is additive across appended document batches, so
# the rollup folds appends exactly; df/dl/corpus stats derive from the
# state at query time (vocabulary × doc-sized, never the corpus text).

_SERVED_POSTINGS_MEMO = None


def _postings_memo():
    global _SERVED_POSTINGS_MEMO
    if _SERVED_POSTINGS_MEMO is None:
        from ..io import ServingMemo

        _SERVED_POSTINGS_MEMO = ServingMemo("dw-postings-", ["documents"])
    return _SERVED_POSTINGS_MEMO


def reset_served_postings() -> None:
    """Drop (and delete) every memoized served postings store."""
    if _SERVED_POSTINGS_MEMO is not None:
        _SERVED_POSTINGS_MEMO.reset()


def served_postings(spark: SparkSession, sf_dir: str):
    """The session's maintained inverted index over ``sf_dir``'s
    documents: an IncrementalRollup keyed (doc_id, w) summing tf."""
    from .incremental import IncrementalRollup

    def handle(root: str) -> IncrementalRollup:
        return IncrementalRollup(root, keys=["doc_id", "w"], sum_cols=["tf"])

    def build(root: str) -> None:
        docs = table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        handle(root).apply_batch(
            spark, term_counts(docs), batch_id=0, app_id="served-postings"
        )

    return handle(_postings_memo().get_or_build(sf_dir, build))


@register(
    "lexical_bm25_from_store",
    driver_facing=False,  # window full; pytest oracle + store==text equality
    # Same oracle as lexical_bm25_topk: the maintained index must answer
    # the retrieval query exactly.
    oracle=_BM25_ORACLE,
)
def lexical_bm25_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query served from the maintained postings store — the
    corpus text is scanned once per ingest fold, never per query; the
    query plan touches only the (doc_id, w, sum_tf) state."""
    prepare(spark)
    store = served_postings(spark, sf_dir)
    counts = store.read(spark).select(
        "doc_id", "w", F.col("sum_tf").cast("bigint").alias("tf")
    )
    q = spark.createDataFrame(LEXICAL_QUERIES, "query_id bigint, qtext string")
    return lexical_topk_from_postings(counts, q, k=LEXICAL_K)
