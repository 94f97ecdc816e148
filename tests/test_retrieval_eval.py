"""Retrieval-quality eval (r19, VERDICT r18 #5): MRR/recall@k metrics
over the three hybrid retrievers, deterministic containment qrels, and
the divergence property that motivates fusion — on a PLANTED corpus
where each leg fails a different query, RRF's MRR is >= each leg's and
strictly better than both legs' aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_project_spark.catalog import all_queries
from datawarehouse_project_spark.operators.retrieval import (
    term_counts,
)
from datawarehouse_project_spark.operators.retrieval_eval import (
    EVAL_SCALE,
    eval_retrievers,
    qrels_from_postings,
)


import pytest

# r22 fast-lane split, second pass (measured: the first fast lane still
# ran 16.5 min on this box — over the driver-timeout safety margin):
# this module's VALUE semantics are gated by the fast lane's sf0.001
# oracle-parity sweep; its deeper coverage runs in the slow lane
# (`pytest -m slow`, the round-end full sweep).
pytestmark = pytest.mark.slow


def _planted(spark):
    """Two queries, each defeating one leg: q100's distractor (doc 3)
    stacks tf on one term (the unnormalized dot ranks it first; BM25's
    saturation + both-term matches keep the relevant docs on top);
    q200's distractor (doc 6) is a one-term ultra-short doc (BM25's
    length normalization ranks it first; the dot ignores dl and keeps
    the two-term relevant docs on top). RRF fuses the disagreeing
    lists and recovers rank 1 on BOTH queries."""
    filler_a = " ".join(f"fa{i}" for i in range(48))
    filler_b = " ".join(f"fb{i}" for i in range(48))
    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta"),
            (3, " ".join(["alpha"] * 50)),
            (4, "gamma delta " + filler_a),
            (5, "gamma delta " + filler_b),
            (6, "gamma"),
            (7, "noise one two three four five"),
            (8, "noise six seven eight nine ten"),
        ],
        "doc_id bigint, text string",
    )
    queries = spark.createDataFrame(
        [(100, "alpha beta"), (200, "gamma delta"), (300, "alpha zzz")],
        "query_id bigint, qtext string",
    )
    counts = term_counts(docs)
    doclens = counts.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("dl")
    )
    return counts, doclens, queries


def _metrics(spark):
    counts, doclens, queries = _planted(spark)
    out = {}
    for r in eval_retrievers(counts, doclens, queries, k=5).collect():
        out[(r.retriever, r.query_id)] = r
    return out


def test_qrels_containment_rule(spark):
    counts, _, queries = _planted(spark)
    qrels = {
        (r.query_id, r.doc_id)
        for r in qrels_from_postings(counts, queries).collect()
    }
    # q100: both-term docs only — the tf-stacked one-term distractor is
    # NOT relevant; q200 mirrors; q300's second term is OOV -> no doc
    # can reach 2 distinct matches.
    assert qrels == {(100, 1), (100, 2), (200, 4), (200, 5)}


def test_planted_divergence_rrf_geq_each_leg(spark):
    m = _metrics(spark)
    # Each leg fails exactly its planted query...
    assert m[("bm25", 100)].rr_scaled == EVAL_SCALE
    assert m[("tdot", 100)].rr_scaled < EVAL_SCALE
    assert m[("tdot", 200)].rr_scaled == EVAL_SCALE
    assert m[("bm25", 200)].rr_scaled < EVAL_SCALE
    # ...and RRF recovers rank 1 on both.
    assert m[("rrf", 100)].rr_scaled == EVAL_SCALE
    assert m[("rrf", 200)].rr_scaled == EVAL_SCALE
    for q in (100, 200, 300):
        for leg in ("bm25", "tdot"):
            assert m[("rrf", q)].rr_scaled >= m[(leg, q)].rr_scaled
    # Aggregate (scaled) MRR: strictly above BOTH legs.
    def mrr(ret):
        return sum(m[(ret, q)].rr_scaled for q in (100, 200, 300))

    assert mrr("rrf") > mrr("bm25")
    assert mrr("rrf") > mrr("tdot")


def test_no_relevant_query_scores_zero_not_missing(spark):
    """q300 ('alpha zzz') has ranked lists (alpha matches docs) but no
    doc can reach 2 distinct matched terms — the row must exist with
    zero metrics, not vanish or divide by zero."""
    m = _metrics(spark)
    for ret in ("bm25", "tdot", "rrf"):
        r = m[(ret, 300)]
        assert r.n_rel == 0
        assert r.hits_at_k == 0
        assert r.first_rel_rnk == 0
        assert r.rr_scaled == 0
        assert r.recall_at_k_scaled == 0


def test_recall_counts_hits_in_topk(spark):
    """q100 has exactly 2 relevant docs and both fit in the top-5 of
    every retriever that ranks them — bm25 and rrf see both (recall
    1e6); the dot leg still surfaces them below the tf-stacked
    distractor (recall 1e6 too, hits 2 of 2)."""
    m = _metrics(spark)
    for ret in ("bm25", "tdot", "rrf"):
        r = m[(ret, 100)]
        assert r.n_rel == 2
        assert r.hits_at_k == 2
        assert r.recall_at_k_scaled == EVAL_SCALE


def test_ndcg_discount_table_shape():
    from datawarehouse_project_spark.operators.retrieval_eval import (
        DISC_SCALED,
    )

    assert DISC_SCALED[1] == EVAL_SCALE  # log2(2) = 1 -> no discount
    assert DISC_SCALED[3] == EVAL_SCALE // 2  # log2(4) = 2
    vals = [DISC_SCALED[i] for i in sorted(DISC_SCALED)]
    assert vals == sorted(vals, reverse=True)  # strictly decreasing
    assert len(vals) == len(set(vals))


def _ndcg_metrics(spark):
    from datawarehouse_project_spark.operators.retrieval_eval import (
        ndcg_retrievers,
    )

    counts, doclens, queries = _planted(spark)
    return {
        (r.retriever, r.query_id): r
        for r in ndcg_retrievers(counts, doclens, queries, k=5).collect()
    }


def test_planted_ndcg_perfect_and_aggregate_divergence(spark):
    """Each leg ranks ITS planted query perfectly (ndcg = 1e6) and the
    other one imperfectly; per-query nDCG can favor a single leg (the
    fused list interleaves the distractor), but the AGGREGATE nDCG of
    RRF is strictly above both legs — fusion wins on average, which is
    the property that justifies it."""
    m = _ndcg_metrics(spark)
    assert m[("bm25", 100)].ndcg_at_k_scaled == EVAL_SCALE
    assert m[("tdot", 200)].ndcg_at_k_scaled == EVAL_SCALE
    assert m[("tdot", 100)].ndcg_at_k_scaled < EVAL_SCALE
    assert m[("bm25", 200)].ndcg_at_k_scaled < EVAL_SCALE
    # IDCG is a per-query constant — identical across retrievers.
    for q in (100, 200, 300):
        idcgs = {m[(ret, q)].idcg_scaled for ret in ("bm25", "tdot", "rrf")}
        assert len(idcgs) == 1

    def total(ret):
        return sum(m[(ret, q)].ndcg_at_k_scaled for q in (100, 200, 300))

    assert total("rrf") > total("bm25")
    assert total("rrf") > total("tdot")


def test_ndcg_no_relevant_query_scores_zero(spark):
    m = _ndcg_metrics(spark)
    for ret in ("bm25", "tdot", "rrf"):
        r = m[(ret, 300)]
        assert r.dcg_scaled == 0
        assert r.idcg_scaled == 0
        assert r.ndcg_at_k_scaled == 0


def test_ndcg_registered_row_plan_touches_no_corpus_text(
    spark, sf_correct_dir
):
    df = all_queries()["retrieval_eval_ndcg"](spark, sf_correct_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan


def test_leg_agreement_hand_computed_tau(spark):
    """Hand-verifiable Kendall tau: rankings A=(d1:1,d2:2,d3:3) and
    B=(d1:2,d2:3,d3:1) share all 3 docs; pairs (d1,d2) concordant,
    (d1,d3) and (d2,d3) discordant -> tau = (1-2)/3, scaled
    floor(-333333.33) = -333334 (floor toward -inf in both engines)."""
    from datawarehouse_project_spark.operators.retrieval_eval import (
        leg_agreement,
    )

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id bigint, doc_id bigint, rnk bigint",
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 20, 3), (1, 30, 1)],
        "query_id bigint, doc_id bigint, rnk bigint",
    )
    [r] = leg_agreement(a, b, k=5).collect()
    assert (r.overlap_at_k, r.n_pairs, r.concordant, r.discordant) == (
        3,
        3,
        1,
        2,
    )
    assert r.tau_scaled == -333334

    [same] = leg_agreement(a, a, k=5).collect()
    assert same.tau_scaled == EVAL_SCALE  # identical rankings
    assert same.discordant == 0


def test_leg_agreement_on_planted_fixture(spark):
    """On the planted corpus the legs genuinely disagree where designed:
    q100's shared top-3 (two relevant docs + the tf-stacked distractor)
    has 1 concordant / 2 discordant pairs -> tau = -1/3 scaled. A
    single-doc overlap (q300, one vocab term) yields 0 pairs, tau 0."""
    from datawarehouse_project_spark.operators.retrieval_eval import (
        leg_agreement,
    )
    from datawarehouse_project_spark.operators.retrieval import (
        lexical_topk_served,
        tfidf_dot_topk_served,
    )

    counts, doclens, queries = _planted(spark)
    rows = {
        r.query_id: r
        for r in leg_agreement(
            lexical_topk_served(counts, doclens, queries, k=5),
            tfidf_dot_topk_served(counts, doclens, queries, k=5),
            k=5,
        ).collect()
    }
    q100 = rows[100]
    assert q100.overlap_at_k == 3
    assert (q100.concordant, q100.discordant) == (1, 2)
    assert q100.tau_scaled == -333334


def test_registered_row_plan_touches_no_corpus_text(spark, sf_correct_dir):
    """The registered eval row serves every leg AND the qrels from the
    maintained postings state — zero `documents` scans in the executed
    plan (the retrieval_rrf_from_store pin, extended to the eval)."""
    df = all_queries()["retrieval_eval_mrr_recall"](spark, sf_correct_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan


def test_pre_checkpoint_probes_touch_no_corpus_text(spark, sf_correct_dir):
    """ADVICE r20 #1: the two pins above inspect the FINAL plans, which
    after `_materialize` are ExistingRDD-only — a `documents` scan
    regressing into a PROBE would execute at build time, invisible to
    them. Pin the probes themselves: build the exact pre-checkpoint
    frames the registered rows materialize (both served legs, the
    binary qrels, the graded gains) and assert each one's executed plan
    reads ONLY the maintained store (parquet scans of the postings
    state are expected; any `documents` reference is the regression)."""
    from datawarehouse_project_spark.operators.retrieval import (
        LEXICAL_QUERIES,
        lexical_topk_served,
        served_postings,
        tfidf_dot_topk_served,
    )
    from datawarehouse_project_spark.operators.retrieval_eval import (
        LEXICAL_K,
        graded_qrels_from_postings,
    )

    store = served_postings(spark, sf_correct_dir)
    counts = store.counts(spark)
    doclens = store.doclens(spark)
    q = spark.createDataFrame(
        LEXICAL_QUERIES, "query_id bigint, qtext string"
    )
    probes = {
        "lexical_leg": lexical_topk_served(counts, doclens, q, k=LEXICAL_K),
        "tfidf_leg": tfidf_dot_topk_served(counts, doclens, q, k=LEXICAL_K),
        "qrels": qrels_from_postings(counts, q),
        "gains": graded_qrels_from_postings(counts, q),
    }
    for name, df in probes.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "documents" not in plan, name
        assert "Scan parquet" in plan, name  # reads the store, not RDDs


def test_eval_rows_execute_each_probe_once(spark, sf_correct_dir):
    """One-execution-per-leg pin (VERDICT r19 #1): before r20 each
    served leg executed once as its union branch and AGAIN inside the
    fusion (Spark shares no subplans across a union), and the
    qrels/gains/shared frames re-ran their probe once per consumer.
    After `_materialize`, every probe runs exactly once at build time
    (localCheckpoint eager=True) — so the registered rows' FINAL plans
    must contain ZERO parquet scans (all inputs are pre-materialized
    checkpoint RDDs; a parquet scan reappearing means some probe is
    executing inside the collected plan again, possibly multiply)."""
    for name in (
        "retrieval_eval_mrr_recall",
        "retrieval_eval_ndcg",
        "retrieval_leg_agreement",
    ):
        df = all_queries()[name](spark, sf_correct_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 0, name
        assert "ExistingRDD" in plan, name
