"""The df-first bounded-buffer posting builds (VERDICT r13 #2).

The one-scan posting build (collect_list then cap-filter) materializes an
ultra-common term's FULL posting list in a single agg buffer before the
cap drops it. The bounded form filters rows above the
cap through a COUNT window over the term key BEFORE any list is
collected — every collect buffer bounded by df_cap, hot keys riding the
window's spillable row buffer, and the term subtree scanned once.
These tests pin (a) bit-identical results between the forms, (b) the
bounded plan's shape (guard window, no df join), and (c) that the
registered queries run the guard unconditionally (measured free).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_tfidf_bounded_equals_onescan(spark, sf_dir):
    from datawarehouse_project_spark.operators.retrieval import (
        shingle_counts,
        tfidf_cosine_pairs,
    )

    counts = shingle_counts(spark, sf_dir)
    base = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(counts, bounded=False).collect()
    }
    bounded = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(counts, bounded=True).collect()
    }
    assert base, "fixture plants a near-dup cluster"
    assert bounded.keys() == base.keys()
    for k in base:
        assert bounded[k] == base[k], (k, bounded[k], base[k])  # bit-exact


def test_ngram_jaccard_bounded_equals_onescan(spark, sf_dir):
    from datawarehouse_project_spark.operators.dedup import (
        DF_CAP,
        ngram_jaccard_pairs,
    )

    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            spark, sf_dir, threshold=0.6, df_cap=DF_CAP, bounded=False
        ).collect()
    }
    bounded = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            spark, sf_dir, threshold=0.6, df_cap=DF_CAP, bounded=True
        ).collect()
    }
    assert base, "fixture plants near-dups"
    assert bounded.keys() == base.keys()
    for k in base:
        assert bounded[k] == base[k], (k, bounded[k], base[k])  # bit-exact


#: The bounded build's plan signature: a COUNT window over the term key
#: (the guard runs BEFORE any list is collected). Also the discriminator
#: the auto-select pin uses — the one-scan plans have no such window.
TFIDF_GUARD = "count(1) windowspecdefinition(w#"
NGRAM_GUARD = "count(1) windowspecdefinition(sgh#"


def test_tfidf_bounded_plan_guard_window_no_join(spark, sf_dir):
    """The bounded plan's defining properties: the df guard is a COUNT
    window over w (rows above the cap never reach a collect buffer), NO
    df join exists (the count-then-join form replanned the counts
    subtree twice — r14 review), the pairing double-explode survives,
    and still no cartesian product."""
    from datawarehouse_project_spark.operators.retrieval import (
        shingle_counts,
        tfidf_cosine_pairs,
    )

    plan = _plan(tfidf_cosine_pairs(shingle_counts(spark, sf_dir), bounded=True))
    assert TFIDF_GUARD in plan
    for j in ("ShuffledHashJoin [w", "SortMergeJoin [w", "BroadcastHashJoin [w",
              "LeftSemi"):
        assert j not in plan, j
    assert plan.count("Generate explode(docs") == 2
    assert "CartesianProduct" not in plan


def test_jaccard_bounded_plan_guard_window_no_join(spark, sf_dir):
    from datawarehouse_project_spark.operators.dedup import (
        DF_CAP,
        ngram_jaccard_pairs,
    )

    plan = _plan(
        ngram_jaccard_pairs(
            spark, sf_dir, threshold=0.6, df_cap=DF_CAP, bounded=True
        )
    )
    assert NGRAM_GUARD in plan
    for j in ("ShuffledHashJoin [sgh", "SortMergeJoin [sgh",
              "BroadcastHashJoin [sgh", "LeftSemi"):
        assert j not in plan, j
    assert "CartesianProduct" not in plan


def test_registered_queries_always_run_the_guard_window(spark, sf_dir):
    """The bounded guard-window build measured FREE vs one-scan (r14
    final form), so the registered queries run it UNCONDITIONALLY — no
    size chooser, no unsafe plan at any scale. Pinned via the guard's
    plan signature. (History: a count-then-join bounded draft cost
    1.17–1.51× and hid behind an os.stat size chooser; both superseded
    and removed — PERFORMANCE r14.)"""
    from datawarehouse_project_spark.catalog import all_queries

    plan = _plan(all_queries()["lexical_tfidf_cosine_pairs"](spark, sf_dir))
    assert TFIDF_GUARD in plan
    plan = _plan(all_queries()["dedup_ngram_jaccard_capped"](spark, sf_dir))
    assert NGRAM_GUARD in plan
    plan = _plan(all_queries()["dedup_containment_pairs"](spark, sf_dir))
    assert NGRAM_GUARD in plan


def test_containment_bounded_equals_onescan(spark, sf_dir):
    from datawarehouse_project_spark.operators.dedup import (
        CONTAINMENT_T,
        DF_CAP,
        ngram_containment_pairs,
    )

    base = {
        (r.src_doc, r.dst_doc): (r.n_src, r.containment)
        for r in ngram_containment_pairs(
            spark, sf_dir, CONTAINMENT_T, DF_CAP, bounded=False
        ).collect()
    }
    bounded = {
        (r.src_doc, r.dst_doc): (r.n_src, r.containment)
        for r in ngram_containment_pairs(
            spark, sf_dir, CONTAINMENT_T, DF_CAP, bounded=True
        ).collect()
    }
    assert base, "fixture plants containment pairs"
    assert bounded == base  # bit-exact
