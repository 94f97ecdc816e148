"""Sparse lexical retrieval: BM25-style top-k via an inverted-index join.

The lexical complement to the dense-ANN family (operators/similarity.py,
ann_index.py): score documents against a query set through TERM POSTINGS
— the plan shape that survives any corpus size because nothing is ever
pairwise. Training-data pipelines use exactly this for quality-biased
corpus selection and retrieval-based decontamination.

Plan shape (all Catalyst, zero Python in the row path) — the
PROBE-PROPORTIONAL text form (r17; see :func:`lexical_topk`):
  1. matched postings: explode(words(text)) → broadcast-semi-restrict to
     the query terms BEFORE any aggregate → groupBy(doc_id, term) = tf,
     with dl = size(words(text)) riding the tokens — one corpus scan
     whose aggregated/shuffled rows are proportional to the PROBE, not
     the vocabulary;
  2. df map: an aggregate of the matched rows only (identical values —
     whole posting lists match or don't);
  3. (N, Σdl) corpus stats: a second corpus scan that projects only
     size(words(text)) and partial-aggregates to ONE row per partition —
     the cheapest possible full pass, and the only full pass;
  4. score: query terms (a bounded, BROADCAST set) equi-join the matched
     postings on term — the inverted-index probe; contributions
     aggregate per (query, doc);
  5. top-k per query: rank-filter, which Spark executes as
     WindowGroupLimit (partial per-partition top-k BEFORE the shuffle on
     query_id — the two-stage top-k, plan-pinned in tests).
Nothing vocabulary-wide is ever aggregated, sorted, or shuffled: the
pre-r17 form built the FULL postings then window-sorted them for dl
(the profiled 1.9–3.0×-vs-DuckDB residual at sf10); the same
restriction-first layout that made the store row win (VERDICT r15 #3)
applies to the text form because the registered query set is bounded.

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
from .skew import validate_guard
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
    bounded_queries: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query under the scaled-integer BM25
    score, computed from the corpus text. ``queries``: (query_id BIGINT,
    qtext STRING) — a bounded set, broadcast to the postings probe (by
    default — see ``bounded_queries`` below for the unbounded path).

    PROBE-PROPORTIONAL (r17, VERDICT r16 #2): the query-term
    restriction is applied to the exploded tokens BEFORE any aggregate,
    so the only rows ever grouped, shuffled, or joined are the ones the
    probe touches; dl = size(words(text)) rides the tokens instead of a
    window over vocabulary-wide postings; df rides the MATCHED postings
    (a count window partitioned by term over probe-sized rows — a
    separate dfm subtree would re-scan the corpus, since Catalyst
    shares no unexchanged subplan); corpus stats come from a
    one-row-per-partition partial agg over a projection-only second
    scan — the plan's only full pass. Same restriction-first layout
    that made the store form win (:func:`lexical_topk_served`) —
    bit-identical scores, same oracle (tf/df/dl/n_docs/sum_dl values
    are unchanged; only the plan is). The pre-r17 window form survives
    as :func:`lexical_topk_from_postings` for already-built state.

    Contract: one row per doc_id (the documents-PK shape every caller
    has). Duplicate ids in the OLD form merged into one synthetic doc
    via the postings fold — an artifact of deriving dl from the fold,
    not a feature; here each row is its own document.

    Null-text rows contribute nothing either way (explode of the null
    token array drops them) — the stats branch filters them explicitly
    so n_docs/sum_dl agree with the postings-derived values.

    ``bounded_queries=False`` is the UNBOUNDED-workload escape hatch
    (the salted-guard knob pattern): the default broadcast hints on the
    query-side joins assume the broadcast-query contract; a batch-
    scoring workload with millions of queries would OOM the driver
    shipping them. With the knob off, the same plan carries no hints —
    AQE picks the join strategy (shuffle join on w for a genuinely
    large query set, auto-broadcast when it measures small) — and
    results are bit-identical (plan-only knob, equality- and
    hint-pinned). The 1-row stats frame stays broadcast either way."""
    live = docs.filter(F.col("text").isNotNull())
    qterms = _qterms(queries)
    hint = F.broadcast if bounded_queries else (lambda df: df)
    matched = _matched_from_text(live, qterms, hint, with_dl=True)
    stats = live.select(
        F.size(words("text")).cast("bigint").alias("dl")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    return _score_and_rank(
        matched, qterms, None, stats, k, bounded_queries=bounded_queries
    )


def _qterms(queries: DataFrame) -> DataFrame:
    """``(query_id, w, qtf)`` from the bounded query set — the shared
    probe side of both scoring plans (one definition so the two plans'
    bit-identity contract cannot drift on qtf semantics; r16 review)."""
    return (
        queries.select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.explode(words("qtext")).alias("w"),
        )
        .groupBy("query_id", "w")
        .agg(F.count("*").cast("bigint").alias("qtf"))
    )


def _matched_from_text(live, qterms, hint, with_dl: bool = True) -> DataFrame:
    """The shared probe-proportional matched-postings builder of both
    text-form retrievers (r17 review — one definition so the
    restrict-before-aggregate layout cannot drift between them):
    explode the corpus tokens, semi-restrict to the query TERMS before
    any aggregate, count tf per (doc, term), ride df on the matched
    rows (a count window partitioned by term over probe-sized rows).
    ``with_dl=True`` additionally rides dl = size(words(text)) on the
    tokens (BM25's length normalization); the unnormalized dot
    retriever passes False and never materializes it."""
    if with_dl:
        toks = live.select("doc_id", words("text").alias("ws")).select(
            "doc_id",
            F.size("ws").cast("bigint").alias("dl"),
            F.explode("ws").alias("w"),
        )
        keys = ["doc_id", "dl", "w"]
    else:
        toks = live.select("doc_id", F.explode(words("text")).alias("w"))
        keys = ["doc_id", "w"]
    return (
        toks.join(hint(qterms.select("w").distinct()), "w")
        .groupBy(*keys)
        .agg(F.count("*").cast("bigint").alias("tf"))
        .withColumn(
            "df",
            F.count("*").over(Window.partitionBy("w")).cast("bigint"),
        )
    )


def _score_and_rank(
    postings: DataFrame,
    qterms: DataFrame,
    dfm: DataFrame | None,
    stats: DataFrame,
    k: int,
    bounded_queries: bool = True,
    contrib_sql: str = BM25_CONTRIB,
) -> DataFrame:
    """The shared scoring tail of every plan: probe the postings (which
    must carry tf — and df already riding when ``dfm`` is None; dl too
    when the contribution formula reads it), sum the scaled-integer
    per-term contributions per (query, doc), two-stage rank-filter to
    top-k. ``bounded_queries`` keeps the broadcast hints on the
    query-side joins (the default contract); False drops them so AQE
    picks the strategy for an unbounded query set — the 1-row stats
    frame stays broadcast regardless. ``contrib_sql`` is the per-term
    scoring formula (default ``BM25_CONTRIB``; the unnormalized dot
    retriever passes ``TFIDF_WEIGHT`` — r17 review: one tail for both
    retrievers, so a tiebreak or cast-recipe change can never drift
    between them). The contribution expression is one shared string
    over the same column names either way, so the bit-identity contract
    cannot drift on WHERE df was computed or HOW the probe was
    joined."""
    hint = F.broadcast if bounded_queries else (lambda df: df)
    probe = postings.join(hint(qterms), "w")
    if dfm is not None:
        probe = probe.join(hint(dfm), "w")
    scored = (
        probe.crossJoin(F.broadcast(stats))
        .withColumn("contrib", F.expr(contrib_sql) * F.col("qtf"))
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


def lexical_topk_from_postings(
    counts: DataFrame,
    queries: DataFrame,
    k: int = LEXICAL_K,
) -> DataFrame:
    """The scoring plan over ALREADY-BUILT postings ``(doc_id, w, tf)``
    when no doc-length table exists: df map, corpus stats, and dl all
    derive from the postings (vocabulary × doc-sized), so no corpus
    text is touched — but dl costs a window over the WHOLE state, which
    is why serving paths with a doclen table use
    :func:`lexical_topk_served` (probe-proportional) and the text form
    (:func:`lexical_topk`) derives dl from the corpus scan it already
    pays for; this form remains for bare IncrementalRollup postings
    (e.g. the batch-additivity pin).

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
    qterms = _qterms(queries)
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
    return _score_and_rank(postings, qterms, dfm, stats, k)


#: Loud-contract bound on the served probe's distinct query-term set
#: (advisor, r16): the serving plan collects the terms to the driver and
#: inlines them as a pushed ``In(w, …)`` literal — correct ONLY while the
#: query set is bounded. Past this many distinct terms the caller is
#: violating the broadcast-query contract and gets a descriptive error
#: instead of an unbounded driver collect + megabyte ``In()`` predicate
#: (the ``max_hot_keys`` pattern).
MAX_PROBE_TERMS = 10_000


def _probe_terms(
    qterms: DataFrame, max_probe_terms: int, caller: str
) -> list:
    """Bounded driver-side materialization of the query TERM SET (not
    data) — the shared head of every store-serving probe: the contract
    already broadcasts the query set, so its distinct terms are
    bounded; the literal list is what lets the filter reach the parquet
    scan. The limit() bounds the collect ITSELF, so a
    contract-violating caller never materializes the oversized set
    before the error fires."""
    terms = [
        r.w
        for r in qterms.select("w").distinct().limit(max_probe_terms + 1).collect()
    ]
    if len(terms) > max_probe_terms:
        raise ValueError(
            f"{caller} probe exceeds the broadcast-query "
            f"contract: > {max_probe_terms} distinct query terms would be "
            f"collected and inlined as the pushed In(w) filter; batch the "
            f"query set, or raise max_probe_terms if the driver can hold it"
        )
    return terms


def lexical_topk_served(
    counts: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    k: int = LEXICAL_K,
    max_probe_terms: int = MAX_PROBE_TERMS,
) -> DataFrame:
    """The PROBE-PROPORTIONAL serving plan (VERDICT r15 #3): top-``k``
    per query from a maintained postings state ``(doc_id, w, tf)`` plus
    the doc-length state ``(doc_id, dl)``.

    Why a second table instead of :func:`lexical_topk_from_postings`:
    that plan re-derives dl with a window over the WHOLE postings state
    — a sort + exchange of every (doc, term) row to answer a 4-term
    probe, which is why the store row converged to 1.3× DuckDB at sf10
    instead of winning (profiled: execution, not dispatch). Here the
    probe's cost is proportional to the rows it touches:

    * the query TERMS (a bounded set by the broadcast-query contract)
      are collected and applied as an ``isin`` LITERAL filter, which
      pushes into the parquet scan of the state (PushedFilters, plan-
      pinned) — at corpus scale the scan skips row groups without the
      terms instead of reading the vocabulary;
    * df per term is an aggregate of the MATCHED rows only (identical
      values: whole posting lists match or don't);
    * dl joins from the doc-sized table; corpus stats (n_docs, sum_dl)
      are one tiny agg over it — never a postings-wide window.

    Scores are bit-identical to the window form: same formula string
    over the same (tf, df, dl, n_docs, sum_dl) values (the probe side
    and scoring tail are literally shared — :func:`_qterms` /
    :func:`_score_and_rank`), so the shared DuckDB oracle pins both
    plans."""
    qterms = _qterms(queries)
    terms = _probe_terms(qterms, max_probe_terms, "lexical_topk_served")
    matched = counts.filter(F.col("w").isin(terms))
    dfm = matched.groupBy("w").agg(
        F.count("*").cast("bigint").alias("df")
    )
    stats = doclens.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    return _score_and_rank(matched.join(doclens, "doc_id"), qterms, dfm, stats, k)


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
    docstring).

    At-scale adjudication (r17, VERDICT r16 #2): the probe-proportional
    text plan closed this row's sf10 residual by MEASUREMENT, not by a
    prune — two same-day ABAB runs at .scale/sf10 read 1.73x / 1.66x vs
    DuckDB (Spark 4.7/4.3 s, was 8.1-8.4 s = 2.9-3.0x with the
    vocabulary-wide window plan), inside the 2x bar; the serving twins
    (`lexical_bm25_from_store` / `_from_stream`) remain the repeated-
    probe answer and WIN outright (0.67x/0.84x same runs). Ledgered in
    PERFORMANCE.md's r17 entry."""
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

# Eager at module scope like _SERVED_HOURLY_MEMO/_SERVED_INDEX_MEMO: a
# lazy check-then-set singleton races on concurrent first touch (two
# memos, double-registered hooks, reset reaching only one — advisor
# finding, r13). Construction is cheap (no Spark work until first use).
from ..io import ServingMemo as _ServingMemo

_SERVED_POSTINGS_MEMO = _ServingMemo("dw-postings-", ["documents"])


def reset_served_postings() -> None:
    """Drop (and delete) every memoized served postings store."""
    _SERVED_POSTINGS_MEMO.reset()


def state_counts(state: DataFrame) -> DataFrame:
    """An IncrementalRollup postings state as ``(doc_id, w, tf)`` — the
    shared read shape for every store-serving consumer."""
    return state.select(
        "doc_id", "w", F.col("sum_tf").cast("bigint").alias("tf")
    )


def served_postings(spark: SparkSession, sf_dir: str) -> "StreamingPostingsStore":
    """The session's maintained inverted index over ``sf_dir``'s
    documents: a :class:`StreamingPostingsStore` (postings rollup keyed
    (doc_id, w) PLUS the doc-length rollup keyed doc_id — see the class
    docstring for why the second table is the serving win) folded from
    one batch."""

    def build(root: str) -> None:
        docs = table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
        StreamingPostingsStore(f"{root}/store").apply_batch(
            spark, docs, batch_id=0, app_id="served-postings"
        )

    root = _SERVED_POSTINGS_MEMO.get_or_build(sf_dir, build)
    return StreamingPostingsStore(f"{root}/store")


class StreamingPostingsStore:
    """BM25 postings maintained from an UNBOUNDED document stream — the
    ``foreachBatch`` twin of :func:`served_postings` (VERDICT r13 #4),
    the same glue discipline as ``StreamingLshDedup``:

        (spark.readStream...
           .writeStream.foreachBatch(
               lambda bdf, bid: store.apply_batch(spark, bdf, batch_id=bid))
           ...)

    tf is ADDITIVE, so the fold is exact under any micro-batching of the
    corpus — including one document's rows split across batches (the
    partial counts sum to the same postings). Exactly-once under replay
    AND restart: the fold inherits ``IncrementalRollup``'s (app_id,
    batch_id) writer ledger, so an at-least-once upstream re-delivering
    a committed epoch changes nothing — including the checkpoint-resume
    case where the sink crashed AFTER the state commit but BEFORE the
    epoch acked, and a NEW session resumes on the same checkpoint_dir
    — in its STRONGEST form across PROCESSES (fresh JVM, so recovery
    is genuinely from the on-disk checkpoint + ledger, never a cached
    state-store version — VERDICT r16 #3; all three pinned in
    tests/test_postings_stream.py: in-session replay, new-session
    restart, cross-process restart recovery).
    Serving reads the state through :func:`lexical_topk_served` — the
    probe-proportional plan: pushed query-term filter on the postings
    scan, df from the matched rows, dl and corpus stats from the
    doc-length table; the corpus text is never rescanned.

    ``counts_fn`` generalizes the unit of state: the default
    :func:`term_counts` streams the unigram BM25 postings; pass
    :func:`shingle_counts_of` to stream the word-3-gram store that
    serves TF-IDF pairs (any per-batch ``(doc_id, w, tf)`` builder whose
    tf is additive works — the fold is the same rollup either way).

    STORE LAYOUT (r16, VERDICT r15 #3): TWO rollups under ``root`` —
    ``root/postings`` keyed (doc_id, w) and ``root/doclen`` keyed
    doc_id, both summing tf (dl = Σtf per doc is additive under any
    batching, exactly like tf itself). The doc-length table is what
    makes serving PROBE-PROPORTIONAL: without it, every top-k probe
    re-derived dl by window-sorting the ENTIRE postings state (the
    state is vocabulary×doc-sized — 10-100× the doc count — and the
    sort is the profiled cost of the 1.9×/1.3× sf10 residual); with
    it, the probe scans only postings rows matching the query terms
    (an ``isin`` literal filter that pushes to the parquet scan) and
    joins dl from the doc-sized table. Each fold commits the two
    tables separately with the SAME (app_id, batch_id), in a
    DELIBERATE ORDER — doclen first, postings last (r16 review): the
    serving join is ``matched postings ⋈ doclens``, so with postings
    as the completion marker a torn read (crash between the commits,
    or a concurrent serve during ingest) NEVER drops a served doc or
    sees a df without its doc. For a batch adding NEW docs that is the
    whole tear: the half-applied batch's docs simply don't match yet,
    and n_docs/sum_dl already count them (a bounded, monotone
    idf/avg-dl shift toward the post-batch values). For a batch
    RE-TOUCHING an existing doc_id (split-doc micro-batching), the
    tear is one notch wider (advisor, r16): that doc serves with its
    UPDATED dl against its stale tf until the postings commit lands —
    a transiently understated score for that doc only, bounded by the
    one uncommitted batch and gone at the next read after the
    completion marker. Both cases pinned in
    tests/test_postings_stream.py. On re-delivery the doclen ledger
    absorbs its duplicate and the postings fold completes the epoch —
    both tables converge. The reverse order would serve df(t) rows
    whose docs vanish from the inner join: wrong results, not stale
    ones.
    MAINTENANCE: a long-lived streamed store accumulates interleaved
    term layouts across commits; ``store.rollup.table.compact(spark,
    cluster_keys=["w"])`` range-clusters the state so the probe's
    pushed In(w) filter skips whole FILES — rows, serving answer, and
    the replay ledger survive the rewrite (composition-pinned in
    tests/test_postings_stream.py)."""

    def __init__(
        self, root: str, counts_fn=term_counts, with_doclen: bool = True
    ) -> None:
        from .incremental import IncrementalRollup

        self.counts_fn = counts_fn
        self.rollup = IncrementalRollup(
            f"{root}/postings", keys=["doc_id", "w"], sum_cols=["tf"]
        )
        # with_doclen=False drops the doc-length rollup entirely
        # (advisor, r16): serving paths that never read dl — the TF-IDF
        # shingle store derives norms from the postings themselves —
        # otherwise pay an extra agg + second versioned commit per
        # micro-batch as pure ingest overhead.
        self.doclen = (
            IncrementalRollup(f"{root}/doclen", keys=["doc_id"], sum_cols=["tf"])
            if with_doclen
            else None
        )

    def apply_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        batch_id: int | None = None,
        app_id: str = "postings-stream",
    ) -> int:
        """Fold one micro-batch of ``(doc_id, text)`` rows into the
        doc-length AND postings states — in that order; postings commit
        LAST as the batch-completion marker (see the class docstring's
        torn-read argument). Idempotent under replay with ``batch_id``.
        Returns the postings table's committed version. The batch's
        counts feed both folds, so they are cached for the two passes
        (a micro-batch is bounded by construction; with
        ``with_doclen=False`` there is one fold and no extra pass)."""
        c = self.counts_fn(batch.filter(F.col("text").isNotNull()))
        if self.doclen is None:
            return self.rollup.apply_batch(
                spark, c, batch_id=batch_id, app_id=app_id
            )
        c = c.persist()
        try:
            self.doclen.apply_batch(
                spark,
                c.groupBy("doc_id").agg(
                    F.sum("tf").cast("bigint").alias("tf")
                ),
                batch_id=batch_id,
                app_id=app_id,
            )
            version = self.rollup.apply_batch(
                spark, c, batch_id=batch_id, app_id=app_id
            )
        finally:
            c.unpersist()
        return version

    def counts(self, spark: SparkSession) -> DataFrame:
        """The folded postings as ``(doc_id, w, tf)``."""
        state = self.rollup.read(spark)
        if state is None:
            raise ValueError("empty postings store: no batch applied yet")
        return state_counts(state)

    def doclens(self, spark: SparkSession) -> DataFrame:
        """The folded per-doc lengths as ``(doc_id, dl)``."""
        if self.doclen is None:
            raise ValueError(
                "store built with with_doclen=False maintains no doc-length "
                "table; BM25 serving needs with_doclen=True"
            )
        state = self.doclen.read(spark)
        if state is None:
            raise ValueError("empty postings store: no batch applied yet")
        return state.select(
            "doc_id", F.col("sum_tf").cast("bigint").alias("dl")
        )

    def topk(
        self, spark: SparkSession, queries: DataFrame, k: int = LEXICAL_K
    ) -> DataFrame:
        """Serve BM25 top-k from the maintained state (bit-identical to
        the batch operator over the same corpus — equivalence-tested)
        via the probe-proportional plan (:func:`lexical_topk_served`)."""
        return lexical_topk_served(
            self.counts(spark), self.doclens(spark), queries, k=k
        )

    def rrf_topk(
        self, spark: SparkSession, queries: DataFrame, k: int = LEXICAL_K
    ) -> DataFrame:
        """Serve HYBRID top-k from the maintained state (r18): BM25 and
        the unnormalized TF-IDF dot both probe THIS store's two tables
        (:func:`lexical_topk_served` / :func:`tfidf_dot_topk_served`),
        fused by truncated-list RRF — the one-liner behind the
        registered ``retrieval_rrf_from_store`` row. Requires
        ``with_doclen=True`` (BM25's length normalization)."""
        if self.doclen is None:
            raise ValueError(
                "rrf_topk needs a store built with with_doclen=True: the "
                "BM25 leg's length normalization reads the doc-length "
                "table this store was folded without"
            )
        counts = self.counts(spark)
        doclens = self.doclens(spark)
        return rrf_fuse(
            lexical_topk_served(counts, doclens, queries, k=k),
            tfidf_dot_topk_served(counts, doclens, queries, k=k),
            k=k,
        )


@register(
    "lexical_bm25_from_store",
    # r14 rotation IN (VERDICT r13 #1): the postings-store serving twin
    # earns a driver row; dedup_simhash64_pairs ceded.
    # Same oracle as lexical_bm25_topk: the maintained index must answer
    # the retrieval query exactly.
    oracle=_BM25_ORACLE,
)
def lexical_bm25_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query served from the maintained postings store — the
    corpus text is scanned once per ingest fold, never per query; the
    probe plan touches only the query terms' state rows (pushed isin
    scan) plus the doc-length table (:func:`lexical_topk_served` —
    VERDICT r15 #3)."""
    prepare(spark)
    store = served_postings(spark, sf_dir)
    q = spark.createDataFrame(LEXICAL_QUERIES, "query_id bigint, qtext string")
    return store.topk(spark, q, k=LEXICAL_K)


# Streamed-serving twin: same memo lifecycle, but the state is built by a
# REAL Structured Streaming job (availableNow micro-batches through
# StreamingPostingsStore.apply_batch) instead of one batch fold — the
# driver-checkable form of the stream==batch pin in
# tests/test_postings_stream.py (VERDICT r14 #7 / r15 next-1).
_SERVED_STREAM_POSTINGS_MEMO = _ServingMemo(
    "dw-postings-stream-", ["documents"]
)

#: Micro-batch count for the simulated ingest: doc_id % N file partitions,
#: maxFilesPerTrigger=1 — every batch boundary cuts through the corpus, so
#: the fold's additivity is genuinely exercised, not vacuous.
_STREAM_CHUNKS = 4


def reset_served_stream_postings() -> None:
    """Drop (and delete) every memoized streamed postings store."""
    _SERVED_STREAM_POSTINGS_MEMO.reset()


def _stream_fold(
    spark: SparkSession,
    sf_dir: str,
    memo: _ServingMemo,
    counts_fn,
    with_doclen: bool = True,
) -> StreamingPostingsStore:
    """Build (once per memo key) a :class:`StreamingPostingsStore` by a
    REAL ``availableNow`` file stream of ``sf_dir``'s documents in
    ``_STREAM_CHUNKS`` micro-batches — the shared ingest glue of both
    streamed-serving rows (unigram BM25 and 3-gram TF-IDF; the latter
    passes ``with_doclen=False`` — its serving path never reads dl)."""
    import pyspark.sql.types as T

    def build(root: str) -> None:
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        src = f"{root}/src"
        (
            docs.withColumn(
                "part", (F.col("doc_id") % _STREAM_CHUNKS).cast("int")
            )
            .write.partitionBy("part")
            .mode("overwrite")
            .parquet(src)
        )
        store = StreamingPostingsStore(
            f"{root}/postings", counts_fn=counts_fn, with_doclen=with_doclen
        )
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )
        (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                lambda bdf, bid: store.apply_batch(spark, bdf, batch_id=bid)
            )
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    root = memo.get_or_build(sf_dir, build)
    return StreamingPostingsStore(
        f"{root}/postings", counts_fn=counts_fn, with_doclen=with_doclen
    )


def served_stream_postings(
    spark: SparkSession, sf_dir: str
) -> StreamingPostingsStore:
    """The session's STREAMED inverted index over ``sf_dir``'s documents:
    :class:`StreamingPostingsStore` fed by an ``availableNow`` file
    stream of the corpus in ``_STREAM_CHUNKS`` micro-batches. The
    corpus copy under the memo root is ingest-simulation glue only — at
    deployment the document stream already exists and the ``readStream
    → foreachBatch(store.apply_batch)`` wiring in :func:`_stream_fold`
    is the whole recipe; the state itself is the same table pair the
    batch store maintains (postings keyed (doc_id, w) + doc lengths
    keyed doc_id), so serving cost and exactly-once posture are
    identical (ledger-replay-pinned in tests/test_postings_stream.py)."""
    return _stream_fold(spark, sf_dir, _SERVED_STREAM_POSTINGS_MEMO, term_counts)


@register(
    "lexical_bm25_from_stream",
    # r16 rotation IN (VERDICT r14 #7, the one open r14 item): the
    # streamed fold becomes driver-checkable with the SAME oracle as the
    # batch pair — the streamed state must answer the retrieval query
    # exactly. dedup_verified_near_dup ceded (green r10–r15; keeps its
    # pytest oracle).
    oracle=_BM25_ORACLE,
)
def lexical_bm25_from_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 per query served from postings maintained by a Structured
    Streaming fold of the corpus (availableNow micro-batches through the
    exactly-once rollup ledger) — bit-identical to the batch store and
    the compute-from-text form by construction, now pinned by the
    driver's cross-engine hash as well."""
    prepare(spark)
    store = served_stream_postings(spark, sf_dir)
    q = spark.createDataFrame(LEXICAL_QUERIES, "query_id bigint, qtext string")
    return store.topk(spark, q, k=LEXICAL_K)


# --------------------------------------------------------------------------
# TF-IDF sparse cosine similarity join: doc<->doc weighted similarity via
# an inverted index — the weighted complement to the set-based dedup
# family (MinHash/Jaccard treat a boilerplate shingle and a rare one
# alike; IDF weighting is what training-pipeline near-dup and
# template-detection passes actually want). The terms are word 3-gram
# shingles WITH occurrence counts (the documents fixture's unigram
# vocabulary is ~31 terms at df≈0.8N — unigram TF-IDF is degenerate
# there, and at real corpus scale shingles are the standard unit anyway).
# Plan family: df-capped posting-list self-pairing
# (operators/dedup.py::ngram_jaccard_pairs is the unweighted precedent),
# so candidate fan-out is <= df_cap(df_cap-1)/2 per shingle at ANY corpus
# size and nothing is ever all-pairs.
#
# Cross-engine exactness (the repo-wide recipe): per-(doc,term) weights
# are FLOOR-scaled to BIGINT from one shared formula string, dot products
# and squared norms are INTEGER sums (order-free), and the only float ops
# — divide and sqrt on identical operands in identical textual order —
# are IEEE-correctly-rounded in both engines, so the cosine is hash-exact.
# The Spark index keys on xxhash64(shingle) for narrow shuffle rows (the
# ngram_jaccard precedent: the string-keyed oracle diverges only on a
# 64-bit collision, ~1e-10 here and a one-count perturbation if it ever
# fires).

#: Shingles in more than this many documents are dropped from the index
#: (and from the norms) on BOTH engines — the boilerplate guard that
#: bounds the pair fan-out; same role as dedup.DF_CAP.
TFIDF_DF_CAP = 20

def tfidf_weight_sql(
    quantizer: int = 100, idf_cap: float | None = None, integer: bool = True
) -> str:
    """The integer-weight formula, parameterized (VERDICT r14 #5): a
    lower ``quantizer`` or a capped idf ratio (``least(sqrt(N/df),
    idf_cap)`` — standard practice for web-scale df=1 templated grams)
    shrinks every weight, pulling a corpus back inside the int64
    envelope. Both change scores, so they are deliberate caller
    choices; the default (100, None) IS ``TFIDF_WEIGHT`` — the shared
    cross-engine formula string of the registered rows.

    ``integer=False`` returns the same floored value computed ENTIRELY
    in DOUBLE — the overflow-proof domain the ``checked=True`` envelope
    pre-flight evaluates in, so the check survives even a SINGLE weight
    past int64, where the integer form dies with the opaque ANSI error
    the check exists to pre-empt (advisor finding, r15). Spark's
    ``FLOOR(double)`` itself returns BIGINT (and hence overflows too),
    so the double form floors via ``p - (p % 1.0)`` — exact for the
    nonnegative p here (fmod and the subtraction are both IEEE-exact;
    for p ≥ 2⁵³ the fmod is 0 and p is already integral), identical to
    the integer form wherever the integer form is defined."""
    idf = "sqrt(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))"
    if idf_cap is not None:
        idf = f"least({idf}, CAST({float(idf_cap)} AS DOUBLE))"
    p = f"CAST({int(quantizer)} AS DOUBLE) * CAST(tf AS DOUBLE) * {idf}"
    if integer:
        return f"CAST(FLOOR({p}) AS BIGINT)"
    return f"(({p}) - (({p}) % CAST(1 AS DOUBLE)))"


#: Integer weight for one (doc, term): floor(100 * tf * sqrt(N/df)).
#: sqrt-idf, not ln-idf, for the same libm-rounding reason as BM25_CONTRIB.
TFIDF_WEIGHT = tfidf_weight_sql()

#: Cosine from the integer dot and squared norms — identical operand order
#: in both engines (divide, then the product of two sqrts).
TFIDF_COSINE = (
    "CAST(dot AS DOUBLE)"
    " / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))"
)

#: 0.35 sits in the fixture's measured gap: the planted near-dup cluster
#: scores >= 0.5 and the background noise < 0.15 at sf0.01.
TFIDF_THRESHOLD = 0.35


def shingle_counts_of(docs: DataFrame) -> DataFrame:
    """Frequency postings over rolling word 3-grams for a ``(doc_id,
    text)`` frame: ``(doc_id, w=xxhash64(gram), tf)`` for docs with
    >= 3 words. The per-batch builder — also the streaming fold's unit
    (gram tf is additive across appended batches exactly like unigram
    tf)."""
    from ..functions.text import word_grams_sql, words_sql

    grams = (
        docs.filter(F.col("text").isNotNull())
        .selectExpr("doc_id", f"{words_sql('text')} AS ws")
        .filter("size(ws) >= 3")
        .selectExpr("doc_id", f"explode({word_grams_sql('ws')}) AS sg")
    )
    return (
        grams.select("doc_id", F.xxhash64("sg").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def shingle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`shingle_counts_of` over ``sf_dir``'s documents table.

    Same parallelism posture as dedup.doc_shingle_frame: repartition
    before the interpreted higher-order gram lambda, SQL-text expression
    construction (one parser call, no per-node py4j round-trips)."""
    prepare(spark)
    return shingle_counts_of(
        table(spark, sf_dir, "documents").repartition(
            spark.sparkContext.defaultParallelism
        )
    )


def tfidf_cosine_pairs(
    counts: DataFrame,
    threshold: float = TFIDF_THRESHOLD,
    df_cap: int = TFIDF_DF_CAP,
    n_docs: DataFrame | None = None,
    bounded: bool = True,
    quantizer: int = 100,
    idf_cap: float | None = None,
    checked: bool = False,
    guard: str = "window",
) -> DataFrame:
    """Document pairs (doc_a < doc_b) with TF-IDF cosine >= ``threshold``
    over postings ``(doc_id, w, tf)``.

    ONE pass over the postings (and so one corpus scan upstream): df is
    the SIZE of each term's posting list (the capped-jaccard trick — no
    separate df-map join), weights are computed on the exploded capped
    entries, per-doc squared norms are a window over them and ride
    INSIDE the rebuilt posting-list structs (the uncapped-jaccard
    "sizes ride along" trick — no pairs x norms join; the naive
    dfm-join + two-norms-join form replans the weighted subtree three
    times, ~9 corpus scans). Pairing re-groups by term, drops singleton
    lists (no pair can emerge; typically most of the vocabulary), then
    partition-local double-explode -> integer dot per pair with the
    norms emerging as grouping keys -> cosine filter.

    MEMORY SHAPE (same trade as dedup.ngram_jaccard_pairs' posting
    build): the default one-scan form's collect_list agg buffer for a
    single ultra-common gram materializes its FULL posting list BEFORE
    the cap filter drops it — a web-boilerplate gram in 1e9 docs is a
    single-key buffer hazard. ``bounded=True`` (the DEFAULT — VERDICT
    r13 #2, final r14 form): a COUNT window over the term key computes
    df and filters rows above the cap BEFORE any list is collected —
    every collect buffer is bounded by df_cap entries, the window's
    spillable row buffer carries hot keys safely, and the postings are
    still scanned once (the window's exchange on w is reused by the
    pairing regroup). Measured FREE-to-faster vs the one-scan form
    (0.90–0.97× at sf0.1/sf1), so it is unconditional at the registered
    entries — an earlier count-then-join draft cost 1.17–1.51× and was
    gated behind a source-size chooser, both superseded (PERFORMANCE
    r14 entries). The one-scan form stays as the measured alternative
    (df = list size, no window sort); results are bit-identical between
    the forms (equality-tested).

    INT64 ENVELOPE (a correctness contract, not a perf note): the
    integer norms and dots require per-doc Σwgt² < 2^63, i.e. with the
    100× quantizer roughly grams_per_doc · (100·tf·sqrt(N/df))² below
    9.2e18 — safe for ~10^6-gram docs at N/df ≤ 10^9, but a df=1
    templated gram at web scale (N ≥ 1e12) breaks it. The failure mode
    there depends on a session conf this engine does not control:
    under Spark 4's ANSI default the job dies mid-task with an opaque
    ArithmeticException; under ``ansi=false`` the sums WRAP SILENTLY —
    the wrapped norm goes negative, sqrt→NaN, and (NaN ordering) the
    garbage pair passes the threshold filter — while DuckDB's
    HUGEINT-then-CAST always raises. Outside the envelope the engines
    diverge instead of erroring alike. The guard (VERDICT r14 #5):
    ``checked=True`` runs a cheap
    eager envelope assertion — the per-doc Σwgt² maximum computed in
    DOUBLE (one bounded agg over the capped postings; doubles cannot
    overflow) compared against 2⁶² (factor-2 margin absorbs the double
    roundoff) — and raises loudly INSIDE the edge instead of letting
    Spark wrap, naming the mitigations: ``idf_cap`` (caps the idf
    ratio at ``least(sqrt(N/df), idf_cap)`` — standard practice for
    web-scale df=1 templated grams) or a lower ``quantizer``. Per-doc
    norms bound the dots too (Cauchy–Schwarz: dot ≤ √(na2·nb2)), so
    the one check covers every integer sum in the plan. Both knobs
    change scores, so they are deliberate caller choices, not
    defaults; the registered rows sit ~9 orders inside the envelope
    (boundary test: tests/test_retrieval.py).

    STRAGGLER GUARD (``guard=``, VERDICT r15 #2): the window form
    routes ALL rows of a key through one task before the cap filter
    drops them — bounded memory (WindowExec spills) but a df=10⁹
    boilerplate gram still serializes 10⁹ rows through one straggler.
    This build needs the df VALUE downstream, so it cannot simply swap
    in :func:`~.skew.cap_hot_keys_salted` (and re-joining counted
    values is the subtree-replan shape r14 measured and rejected) —
    but the HYBRID works because hot keys are DROPPED, not valued:
    ``guard="salted"`` first removes every above-cap key's rows via the
    salted count + broadcast anti-join (no task ever owns a hot key),
    then runs the SAME count window over the cold mass only — where
    every key has ≤ df_cap rows by construction, so the per-task skew
    of the value-producing window is bounded by the cap. df values for
    surviving keys are unchanged (whole keys drop, never partial
    rows), so results are bit-identical (equality-tested). MEASURED
    (scripts/bench_straggler.py --tfidf, PERFORMANCE r16): on local[32]
    the window form wins at every size up to 32 M docs (1.71× → 1.44×,
    trending to the hybrid) because the hybrid's two extra balanced
    passes cost more than the single straggler sort when cores ≈
    grams/doc; the crossover criterion is cores ≫ grams-per-doc — the
    1000-executor regime — so the default stays "window" by
    measurement and the knob is the cluster-scale opt-in.

    ``n_docs``: optional 1-row (n_docs BIGINT) frame; callers that know
    a cheaper equivalent (docs with >= 3 words needs no shingling)
    should pass it. Default derives it from ``counts``."""
    validate_guard(guard)
    if guard != "window" and not bounded:
        # the unbounded one-scan build has no guard to salt; silently
        # accepting the knob would run the exact single-key buffer
        # hazard it was passed to avoid
        raise ValueError("guard='salted' requires bounded=True")
    if n_docs is None:
        n_docs = counts.select("doc_id").distinct().agg(
            F.count("*").cast("bigint").alias("n_docs")
        )
    if bounded:
        # df-first via a COUNT window over the term key (the shared
        # guard shape, skew.cap_hot_keys' form, kept inline because the
        # df VALUE is needed downstream): rows above the cap never
        # reach a collect buffer, the window's spillable row buffer
        # carries hot keys safely, and — unlike a count-then-join form,
        # which replans the counts subtree twice (r14 review) — the
        # postings are scanned ONCE, with the window's exchange on w
        # reused by the pairing regroup.
        base = counts
        if guard == "salted":
            # hybrid (docstring above): pre-drop hot keys under the
            # salted guard, then let the window value the cold mass —
            # the cap filter below is then vacuous but kept so both
            # forms share the identical downstream plan
            from .skew import cap_hot_keys_salted

            base = cap_hot_keys_salted(counts, ["w"], df_cap)
        flat = (
            base.withColumn(
                "df",
                F.count("*").over(Window.partitionBy("w")).cast("bigint"),
            )
            .filter(F.col("df") <= df_cap)
            .crossJoin(F.broadcast(n_docs))
        )
    else:
        capped = counts.groupBy("w").agg(
            F.collect_list(F.struct("doc_id", "tf")).alias("entries")
        ).filter(F.size("entries") <= df_cap)
        flat = (
            capped.select(
                "w",
                F.size("entries").cast("bigint").alias("df"),
                F.explode("entries").alias("e"),
            )
            .crossJoin(F.broadcast(n_docs))
            .select(
                "w",
                F.col("e.doc_id").alias("doc_id"),
                F.col("e.tf").alias("tf"),
                "df",
                "n_docs",
            )
        )
    weight_sql = tfidf_weight_sql(quantizer, idf_cap)
    if checked:
        # eager envelope assertion: max per-doc Σwgt² in DOUBLE (cannot
        # overflow) vs 2⁶² — one bounded agg, 1 collected row. Opt-in
        # because it is an extra pass over the capped postings. The
        # check's weight is the PURE-DOUBLE form (integer=False): the
        # integer form's BIGINT cast would itself raise the opaque ANSI
        # ArithmeticException on a single >int64 weight — exactly the
        # failure the pre-flight exists to pre-empt (advisor, r15).
        check_weight_sql = tfidf_weight_sql(quantizer, idf_cap, integer=False)
        row = (
            flat.select("doc_id", F.expr(check_weight_sql).alias("wd"))
            .groupBy("doc_id")
            .agg(F.sum(F.col("wd") * F.col("wd")).alias("n2"))
            .agg(F.max("n2").alias("max_n2"))
            .collect()[0]
        )
        max_n2 = row["max_n2"] or 0.0
        if max_n2 >= float(2**62):
            raise ValueError(
                f"tfidf int64 envelope exceeded: max per-doc sum(wgt^2) "
                f"= {max_n2:.3e} >= 2^62; Spark would wrap silently "
                f"(DuckDB raises) — pass idf_cap to bound sqrt(N/df) "
                f"or lower quantizer (currently {quantizer})"
            )
    weighted = flat.withColumn("wgt", F.expr(weight_sql)).withColumn(
        "nrm2",
        F.sum(F.col("wgt") * F.col("wgt"))
        .over(Window.partitionBy("doc_id"))
        .cast("bigint"),
    )
    posting = (
        weighted.groupBy("w")
        .agg(F.collect_list(F.struct("doc_id", "wgt", "nrm2")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    dots = (
        posting.select(F.explode("docs").alias("d1"), "docs")
        .select("d1", F.explode("docs").alias("d2"))
        .filter(F.col("d1.doc_id") < F.col("d2.doc_id"))
        .groupBy(
            F.col("d1.doc_id").alias("doc_a"),
            F.col("d2.doc_id").alias("doc_b"),
            F.col("d1.nrm2").alias("na2"),
            F.col("d2.nrm2").alias("nb2"),
        )
        .agg(F.sum(F.col("d1.wgt") * F.col("d2.wgt")).cast("bigint").alias("dot"))
    )
    return (
        dots.withColumn("cosine", F.expr(TFIDF_COSINE))
        .filter(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


#: String-keyed where the Spark plan keys on xxhash64(gram) — identical
#: results barring a 64-bit hash collision (see module comment above).
_TFIDF_ORACLE = f"""
WITH d AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT doc_id,
           unnest(list_transform(
               generate_series(1, len(ws) - 2),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS w
    FROM d WHERE len(ws) >= 3
),
postings AS (
    SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM grams GROUP BY 1, 2
),
dfm AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM postings GROUP BY 1),
stats AS (
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM postings
),
weighted AS (
    SELECT doc_id, p.w, {TFIDF_WEIGHT} AS wgt
    FROM postings p
    JOIN dfm ON dfm.w = p.w AND df <= {TFIDF_DF_CAP}
    CROSS JOIN stats
),
dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(SUM(a.wgt * b.wgt) AS BIGINT) AS dot
    FROM weighted a JOIN weighted b
      ON a.w = b.w AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
norms AS (
    SELECT doc_id, CAST(SUM(wgt * wgt) AS BIGINT) AS nrm2
    FROM weighted GROUP BY 1
)
SELECT doc_a, doc_b, {TFIDF_COSINE} AS cosine
FROM (
    SELECT doc_a, doc_b, dot, na.nrm2 AS na2, nb.nrm2 AS nb2
    FROM dots
    JOIN norms na ON doc_a = na.doc_id
    JOIN norms nb ON doc_b = nb.doc_id
)
WHERE {TFIDF_COSINE} >= {TFIDF_THRESHOLD}
"""


@register(
    "lexical_tfidf_cosine_pairs",
    # r14 rotation IN (VERDICT r13 #1); events_rolling_24h ceded.
    # r16: headline=True (VERDICT r15 #5) — the lexical family's
    # corpus-sized representative joins the driver bench so its ratio
    # is tracked round-over-round, not only in ad-hoc scaling runs.
    # Totals across the set change are NOT comparable (disclosed in
    # bench.py's methodology docstring and PERFORMANCE.md).
    headline=True,
    oracle=_TFIDF_ORACLE,
)
def lexical_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted near-dup pairs over the documents table — cosine of
    floor-scaled integer TF-IDF shingle vectors via the df-capped
    inverted index (see tfidf_cosine_pairs; bounded guard-window build
    — the always-safe default)."""
    from ..functions.text import words_sql

    prepare(spark)
    # n_docs == docs with >= 1 gram == docs with >= 3 words: countable
    # from the raw text without evaluating the interpreted gram lambda.
    n_docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .filter(F.expr(f"size({words_sql('text')}) >= 3"))
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    return tfidf_cosine_pairs(shingle_counts(spark, sf_dir), n_docs=n_docs)


# --------------------------------------------------------------------------
# TF-IDF over the MAINTAINED shingle-postings store (VERDICT r13 #8 —
# the module's own at-scale recommendation made real): the word-3-gram
# postings live in an IncrementalRollup keyed (doc_id, w) summing tf
# (shingle tf is additive across appended document batches, exactly like
# the unigram BM25 store), under the standard ServingMemo lifecycle.
# Per query, df / n_docs / weights / norms all derive from the state —
# the corpus text is scanned once per ingest fold, never per query —
# and the bounded guard-window build runs as everywhere (the r14
# default).

_SERVED_SHINGLES_MEMO = _ServingMemo("dw-shingles-", ["documents"])


def reset_served_shingles() -> None:
    """Drop (and delete) every memoized served shingle-postings store."""
    _SERVED_SHINGLES_MEMO.reset()


def served_shingle_postings(spark: SparkSession, sf_dir: str):
    """The session's maintained 3-gram shingle index over ``sf_dir``'s
    documents: an IncrementalRollup keyed (doc_id, w) summing tf."""
    from .incremental import IncrementalRollup

    def handle(root: str) -> IncrementalRollup:
        return IncrementalRollup(root, keys=["doc_id", "w"], sum_cols=["tf"])

    def build(root: str) -> None:
        handle(root).apply_batch(
            spark,
            shingle_counts(spark, sf_dir),
            batch_id=0,
            app_id="served-shingles",
        )

    return handle(_SERVED_SHINGLES_MEMO.get_or_build(sf_dir, build))


@register(
    "lexical_tfidf_from_store",
    # r14 rotation IN (second swap): the shingle-store serving twin earns
    # a driver row; text_pii_redaction ceded.
    # Same oracle as lexical_tfidf_cosine_pairs: the maintained shingle
    # index must answer the pairs query exactly.
    oracle=_TFIDF_ORACLE,
)
def lexical_tfidf_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine near-dup pairs served from the maintained shingle
    postings — no corpus text in the query plan: n_docs, df, weights,
    and norms are all aggregates over the (doc_id, w, sum_tf) state;
    the df-first bounded build runs unconditionally (see module
    comment). Bit-identical to ``lexical_tfidf_cosine_pairs`` — same
    oracle, plus a direct store==text equality test."""
    prepare(spark)
    store = served_shingle_postings(spark, sf_dir)
    return tfidf_cosine_pairs(state_counts(store.read(spark)), bounded=True)


_SERVED_STREAM_SHINGLES_MEMO = _ServingMemo(
    "dw-shingles-stream-", ["documents"]
)


def reset_served_stream_shingles() -> None:
    """Drop (and delete) every memoized streamed shingle store."""
    _SERVED_STREAM_SHINGLES_MEMO.reset()


@register(
    "lexical_tfidf_from_stream",
    # r16: the TF-IDF twin of lexical_bm25_from_stream — the streamed
    # 3-gram shingle store serves the pairs query with the SAME oracle
    # as the batch forms. r17 rotation IN (VERDICT r16 #5): promoted to
    # a driver slot so BOTH streamed stores are driver-checkable
    # (sample_train_val_test ceded — driver-green r10–r16, pytest
    # oracle remains); pre-validated with the plain-session driver-sim
    # recipe before the swap.
    oracle=_TFIDF_ORACLE,
)
def lexical_tfidf_from_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine near-dup pairs served from a shingle-postings store
    maintained by a Structured Streaming fold of the corpus (the
    ``counts_fn=shingle_counts_of`` form of the same availableNow →
    foreachBatch → exactly-once rollup recipe as the BM25 streamed
    row)."""
    prepare(spark)
    store = _stream_fold(
        spark,
        sf_dir,
        _SERVED_STREAM_SHINGLES_MEMO,
        shingle_counts_of,
        with_doclen=False,
    )
    return tfidf_cosine_pairs(store.counts(spark), bounded=True)


# --------------------------------------------------------------------------
# Hybrid retrieval fusion: reciprocal-rank fusion (RRF) of two retrievers
# with genuinely different rankings over the same corpus — the standard
# way a training-data pipeline combines retrieval signals (Cormack,
# Clarke & Buettcher, SIGIR 2009: RRF outperforms individual rankers and
# needs no score calibration, only ranks). Retriever A is the BM25 top-k
# (tf saturation + length normalization); retriever B is the
# unnormalized scaled-integer TF-IDF dot product (no saturation, no
# length norm — long keyword-dense docs rank differently). Both run the
# probe-proportional text plan; ranks are integers, so the only floats
# are the two reciprocals, added in one fixed textual order — the same
# expression string builds the Spark plan and the DuckDB oracle.

#: Standard RRF smoothing constant (k=60 in the original paper).
RRF_K = 60

#: rrf = 1/(K+rank_a) + 1/(K+rank_b); a doc outside one retriever's
#: top-k contributes 0 from that retriever (truncated-list RRF). One
#: shared formula string — fixed operand order, bit-identical across
#: engines. Reads the GENERIC ``rnk_a``/``rnk_b`` columns
#: :func:`rrf_fuse` emits (r17 review: the fuser accepts any two
#: rankings, so its schema must not name specific retrievers).
RRF_SCORE = (
    f"CAST(COALESCE(CAST(1 AS DOUBLE) / (CAST({RRF_K} AS DOUBLE)"
    f" + CAST(rnk_a AS DOUBLE)), CAST(0 AS DOUBLE))"
    f" + COALESCE(CAST(1 AS DOUBLE) / (CAST({RRF_K} AS DOUBLE)"
    f" + CAST(rnk_b AS DOUBLE)), CAST(0 AS DOUBLE)) AS DOUBLE)"
)


def tfidf_dot_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = LEXICAL_K,
    bounded_queries: bool = True,
) -> DataFrame:
    """Top-``k`` documents per query under the UNNORMALIZED
    scaled-integer TF-IDF dot product Σ_t qtf·floor(100·tf·sqrt(N/df))
    — retriever B of the RRF pair. Same probe-proportional layout as
    :func:`lexical_topk` — LITERALLY the same builder and tail
    (:func:`_matched_from_text` / :func:`_score_and_rank`, r17 review),
    minus dl — this scorer has no length normalization BY DESIGN, which
    is exactly what makes its ranking diverge from BM25's and the
    fusion informative.

    ``bounded_queries=False`` is the same unbounded-workload escape
    hatch as :func:`lexical_topk`'s (VERDICT r17 #5 — previously only
    the BM25 leg had it, so batch-scoring RRF against a query set too
    large to broadcast had no story): hints dropped on the query-side
    joins, AQE picks, the 1-row stats frame stays broadcast,
    bit-identical results."""
    live = docs.filter(F.col("text").isNotNull())
    qterms = _qterms(queries)
    hint = F.broadcast if bounded_queries else (lambda df: df)
    matched = _matched_from_text(live, qterms, hint, with_dl=False)
    stats = live.agg(F.count("*").cast("bigint").alias("n_docs"))
    return _score_and_rank(
        matched,
        qterms,
        None,
        stats,
        k,
        bounded_queries=bounded_queries,
        contrib_sql=TFIDF_WEIGHT,
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = LEXICAL_K,
) -> DataFrame:
    """Truncated-list reciprocal-rank fusion of two ``(query_id,
    doc_id, …, rnk)`` rankings: full-outer join on (query_id, doc_id)
    (a doc one retriever missed still scores from the other), RRF_SCORE
    in one fixed expression, re-rank to top-``k`` per query. The join
    inputs are top-k lists — bounded per query by construction — so
    this is a fusion of tiny frames regardless of corpus size.

    GENERIC over the two rankings (r17 review): any pair of frames with
    the ``(query_id, doc_id, …, rnk)`` shape fuses; internally the legs
    are aliased ``rnk_a``/``rnk_b`` (argument order — RRF is symmetric,
    so order only matters to a reader of the intermediate plan). The
    output schema is retriever-agnostic: (query_id, doc_id, rrf_score,
    rnk)."""
    a = ranked_a.select(
        "query_id", "doc_id", F.col("rnk").alias("rnk_a")
    )
    b = ranked_b.select(
        "query_id", "doc_id", F.col("rnk").alias("rnk_b")
    )
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score", F.expr(RRF_SCORE)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "doc_id", "rrf_score", "rnk")
    )


#: Shared hybrid-retrieval oracle CTEs (r19: factored so the RRF rows and
#: the eval row recompute the SAME two legs and fusion — one text, no
#: drift): tokenize -> postings -> dl/df/stats -> query terms -> BM25 and
#: dot legs scored+ranked -> truncated full-outer fusion -> RRF re-rank.
_HYBRID_CTES = f"""d AS (
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
bm25_scored AS (
    SELECT q.query_id, p.doc_id,
           CAST(SUM({BM25_CONTRIB} * qtf) AS BIGINT) AS score
    FROM qterms q
    JOIN withdl p ON p.w = q.w
    JOIN dfm ON dfm.w = q.w
    CROSS JOIN stats
    GROUP BY 1, 2
),
bm25_ranked AS (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rnk_a
    FROM bm25_scored
),
tdot_scored AS (
    SELECT q.query_id, p.doc_id,
           CAST(SUM({TFIDF_WEIGHT} * qtf) AS BIGINT) AS score
    FROM qterms q
    JOIN postings p ON p.w = q.w
    JOIN dfm ON dfm.w = q.w
    CROSS JOIN stats
    GROUP BY 1, 2
),
tdot_ranked AS (
    SELECT query_id, doc_id,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id
           ) AS BIGINT) AS rnk_b
    FROM tdot_scored
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
rrf AS (
    SELECT query_id, doc_id, {RRF_SCORE} AS rrf_score
    FROM fused
),
rrf_ranked AS (
    SELECT query_id, doc_id, rrf_score,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
           ) AS BIGINT) AS rnk
    FROM rrf
)"""

_RRF_ORACLE = f"""
WITH {_HYBRID_CTES}
SELECT query_id, doc_id, rrf_score, rnk
FROM rrf_ranked
WHERE rnk <= {LEXICAL_K}
"""


@register(
    "retrieval_rrf_fusion",
    # r17: hybrid-retrieval extension row, rotated IN the same round
    # (second swap, the r14 precedent): text_top_bigrams ceded after
    # five driver-green rounds. Pre-validated with the plain-session
    # dress rehearsal before the swap; oracle also pinned at sf0.001/
    # 0.01/0.1 during development.
    oracle=_RRF_ORACLE,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 top-10 and the unnormalized
    TF-IDF-dot top-10 per fixed query — the hybrid-retrieval composition
    (rrf = Σ 1/(60+rank), truncated lists, ties by doc_id). Both legs
    run the probe-proportional text plan; the fusion joins two ≤k-row
    frames per query."""
    prepare(spark)
    docs = spread(spark, table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    q = spark.createDataFrame(LEXICAL_QUERIES, "query_id bigint, qtext string")
    return rrf_fuse(
        lexical_topk(docs, q, k=LEXICAL_K),
        tfidf_dot_topk(docs, q, k=LEXICAL_K),
        k=LEXICAL_K,
    )


def tfidf_dot_topk_served(
    counts: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    k: int = LEXICAL_K,
    max_probe_terms: int = MAX_PROBE_TERMS,
) -> DataFrame:
    """The dot retriever's PROBE-PROPORTIONAL serving plan — the
    :func:`lexical_topk_served` twin for retriever B (VERDICT r17 #4):
    top-``k`` per query under the unnormalized scaled-integer TF-IDF
    dot product, from the SAME maintained state the BM25 probe serves
    — postings ``(doc_id, w, tf)`` plus the doc-length table. The query
    terms push into the postings scan as an ``In(w)`` literal, df is an
    aggregate of the matched rows only, and n_docs is one tiny count of
    the doc-sized table (this scorer reads no dl and no sum_dl — its
    corpus statistic is N alone, which is why the doclen table can
    stand in for a corpus scan: one row per ingested doc, null-text
    rows filtered at the fold). Scores are bit-identical to
    :func:`tfidf_dot_topk` over the same corpus: same formula string
    over the same (tf, df, n_docs) values, same shared scoring tail."""
    qterms = _qterms(queries)
    terms = _probe_terms(qterms, max_probe_terms, "tfidf_dot_topk_served")
    matched = counts.filter(F.col("w").isin(terms))
    dfm = matched.groupBy("w").agg(
        F.count("*").cast("bigint").alias("df")
    )
    stats = doclens.agg(F.count("*").cast("bigint").alias("n_docs"))
    return _score_and_rank(
        matched, qterms, dfm, stats, k, contrib_sql=TFIDF_WEIGHT
    )


@register(
    "retrieval_rrf_from_store",
    # r18 (VERDICT r17 #4): hybrid retrieval as a SERVING composition —
    # both RRF legs answered from the maintained postings state, no
    # corpus text anywhere in the query plan. Same oracle as
    # retrieval_rrf_fusion: the served fusion must equal the
    # compute-from-text fusion exactly. Rotation IN the same round per
    # VERDICT r17 #7's recipe: full pytest round green first (707-pass
    # suite with the row registered), plain-session dress rehearsal
    # green (driver-sim, value-identical vs DuckDB at sf0.01), pin list
    # updated; dedup_containment_pairs ceded after six driver-green
    # rounds (pytest oracle remains). sf10: 0.77x vs its DuckDB control,
    # 2.10x over the two-leg text recompute (PERFORMANCE.md r18).
    oracle=_RRF_ORACLE,
)
def retrieval_rrf_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion served from the maintained postings store:
    the BM25 leg through :func:`lexical_topk_served` and the
    unnormalized dot leg through :func:`tfidf_dot_topk_served`, both
    probing the SAME :class:`StreamingPostingsStore` state (postings +
    doc lengths — everything both scorers need: tf/df ride the matched
    postings, dl/n_docs/sum_dl are aggregates over the doc-sized
    table), fused by :func:`rrf_fuse`. The corpus text is scanned once
    per ingest fold, never per query — a 4-corpus-scan query becomes a
    two-pushed-probe serving composition (plan-pinned: no documents
    scan)."""
    prepare(spark)
    store = served_postings(spark, sf_dir)
    q = spark.createDataFrame(LEXICAL_QUERIES, "query_id bigint, qtext string")
    return store.rrf_topk(spark, q, k=LEXICAL_K)
