"""The df-first bounded-buffer posting builds (VERDICT r13 #2).

The one-scan posting build (collect_list then cap-filter) materializes an
ultra-common term's FULL posting list in a single agg buffer before the
cap drops it. The bounded form counts df first (constant-size buffers),
joins the surviving keys, THEN collects — every buffer bounded by df_cap.
These tests pin (a) bit-identical results between the forms, (b) the
bounded plan's shape (the collect happens after the df join), and (c) the
os.stat-based auto-chooser that keeps fixtures on the one-scan plan.
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


def test_tfidf_bounded_plan_collects_after_df_join(spark, sf_dir):
    """The bounded plan's defining property: the posting-list collect
    consumes the OUTPUT of the df join (only `df <= cap` keys reach any
    collect buffer). Pinned structurally: a df-count aggregate and a
    join on w appear; the pairing double-explode survives; still no
    cartesian product."""
    from datawarehouse_project_spark.operators.retrieval import (
        shingle_counts,
        tfidf_cosine_pairs,
    )

    plan = _plan(tfidf_cosine_pairs(shingle_counts(spark, sf_dir), bounded=True))
    assert "count(1)" in plan  # the df-first COUNT aggregate
    # the df map joins the postings on w before any list is collected
    assert any(
        j in plan
        for j in ("ShuffledHashJoin [w", "SortMergeJoin [w", "BroadcastHashJoin [w")
    ), plan
    assert plan.count("Generate explode(docs") == 2
    assert "CartesianProduct" not in plan


def test_jaccard_bounded_plan_semi_join(spark, sf_dir):
    from datawarehouse_project_spark.operators.dedup import (
        DF_CAP,
        ngram_jaccard_pairs,
    )

    plan = _plan(
        ngram_jaccard_pairs(
            spark, sf_dir, threshold=0.6, df_cap=DF_CAP, bounded=True
        )
    )
    assert "LeftSemi" in plan  # capped keys semi-join the postings
    assert "CartesianProduct" not in plan


def test_bounded_posting_build_chooser(monkeypatch, sf_dir, tmp_path):
    """os.stat-only selection: fixtures stay on the one-scan form, large
    or un-stat-able sources get the bounded form. No Spark job involved
    (the function takes no session)."""
    from datawarehouse_project_spark import io

    assert io.bounded_posting_build(sf_dir) is False  # tiny fixture
    assert io.bounded_posting_build("/nonexistent") is True  # un-stat-able
    monkeypatch.setattr(io, "BOUNDED_POSTINGS_BYTES", 1)
    assert io.bounded_posting_build(sf_dir) is True  # above threshold


def test_source_size_bytes_recurses_partitioned_layout(tmp_path):
    """A partitionBy layout nests its data files under key subdirs; the
    size sum must be recursive or such a corpus reads as ~0 bytes and
    the chooser picks the unsafe one-scan form at exactly the scale the
    guard exists for (r14 review finding)."""
    from datawarehouse_project_spark import io

    root = tmp_path / "documents.parquet"
    (root / "part=0").mkdir(parents=True)
    (root / "part=0" / "data.parquet").write_bytes(b"x" * 1000)
    (root / "part=1").mkdir()
    (root / "part=1" / "data.parquet").write_bytes(b"y" * 500)
    (root / "_SUCCESS").write_bytes(b"")
    assert io.source_size_bytes(str(tmp_path), "documents") == 1500


def test_registered_queries_auto_select_onescan_at_fixture(spark, sf_dir):
    """At fixture scale both registered queries must keep the (faster)
    one-scan plan. The bounded tfidf plan's marker is an INNER join on
    w (it never uses LeftSemi — asserting only LeftSemi absence would be
    vacuous there; r14 review finding), so pin the absence of ANY join
    on the shingle key plus the df-count aggregate."""
    from datawarehouse_project_spark.catalog import all_queries

    plan = _plan(all_queries()["lexical_tfidf_cosine_pairs"](spark, sf_dir))
    for j in ("ShuffledHashJoin [w", "SortMergeJoin [w", "BroadcastHashJoin [w",
              "LeftSemi"):
        assert j not in plan, j
    plan = _plan(all_queries()["dedup_ngram_jaccard_capped"](spark, sf_dir))
    for j in ("ShuffledHashJoin [sgh", "SortMergeJoin [sgh",
              "BroadcastHashJoin [sgh", "LeftSemi"):
        assert j not in plan, j


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
