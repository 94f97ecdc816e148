"""Oracle-differential tests: every registered query with an oracle must
match DuckDB exactly at the smoke scale factor (the driver runs the same
check at sf0.01 — also covered here, marked slow)."""

from __future__ import annotations

import pytest

from datawarehouse_project_spark.catalog import (
    DRIVER_WINDOW,
    all_oracle_sql,
    all_queries,
    oracle_sql,
    queries,
)
from tests.oracle_check import compare

# Full registry surface — demoted (driver_facing=False) entries keep their
# oracle checks here even though the driver no longer sweeps them.
_ORACLES = all_oracle_sql()
_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(_QUERIES[name](spark, sf_dir), _ORACLES[name], sf_dir)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle_sf001(spark, sf_correct_dir, name):
    compare(_QUERIES[name](spark, sf_correct_dir), _ORACLES[name], sf_correct_dir)


def test_all_queries_have_builders():
    assert set(_ORACLES) <= set(_QUERIES)
    assert len(_QUERIES) >= 10


def test_driver_catalog_fits_sweep_window():
    """The external harness verifies at most DRIVER_WINDOW names (sorted);
    every driver-facing entry must land inside it or it ships unverified."""
    facing = queries()
    assert len(facing) <= DRIVER_WINDOW, sorted(facing)[DRIVER_WINDOW:]
    assert set(oracle_sql()) <= set(facing)
    # The window's must-keep set: the reference's 10 OLAP queries (the
    # parity core, kept continuously driver-green) plus the round-12
    # rotation — the r10-crop rows VERDICT r11 #1 told us to promote
    # (ten long-green donors ceded their slots; pytest oracles still run
    # on every demoted row via all_queries()).
    for name in [
        *[f"q0{i}" for i in range(1, 10)],
        "q10",
        # long-standing family anchors kept across rotations
        "scd2_dim_asof_orders",
        "similarity_ivf_quantized_topk",
        "dedup_incremental_lsh_pairs",
        "dq_audit_orders_lineitem",
        "corpus_select_token_budget",
        "text_idf_quality_scores",
        "bpe_token_counts",
        "events_daily_sketch_rollup",
        "multimodal_audio_features",
        # the three rows the r11 oversubscription silently truncated out —
        # restored to the gate in r12 (VERDICT r11 what's-wrong #1);
        # text_top_bigrams ceded its slot in r17 (second swap, five
        # driver-green rounds) to retrieval_rrf_fusion
        "text_word_rarity_scores",
        # unpivot_store_priority ceded its slot in r20 (eight
        # driver-green rounds r10-r19) to retrieval_eval_ndcg; pytest
        # oracle remains
        # r12 rotation IN: the r10 crop, finally driver-proven
        # (dedup_containment_pairs ceded its slot in r18 after six
        # driver-green rounds to retrieval_rrf_from_store; pytest
        # oracle remains)
        # cms_word_count_estimates ceded its slot in r19 (seven
        # driver-green rounds r12-r18) to retrieval_eval_mrr_recall;
        # pytest oracle remains
        # overlap_shipping_windows ceded its slot in r20 (eight
        # driver-green rounds r12-r19) to similarity_ann_recall_at_k;
        # pytest oracle remains
        "bpe_merge_rules",
        # r12 new operator: the composed IVF→hamming→exact serving funnel
        "similarity_ivf_binary_funnel_topk",
        # r13 rotation IN: the maintained-rollup serving twin (VERDICT
        # r12 #3; events_value_median_cont ceded the slot)
        "events_hourly_from_store",
        # r13 rotation IN: the two new operator families, pre-validated
        # with the plain-session driver-sim recipe before the swap
        # (rfm_customer_segments and fullouter_yearly_customer_recon
        # ceded — driver-green r8-r12 / r10-r12, pytest oracles remain)
        "fuzzy_part_desc_pairs",
        "lexical_bm25_topk",
        # r14 rotation IN (VERDICT r13 #1): the serving twins plus the two
        # strong r13 rows (asof_join_last_order, dedup_simhash64_pairs,
        # events_rolling_24h, text_quality_scores ceded — driver-green
        # r3-r13/r10-r13/r8-r13/r5-r13, pytest oracles remain)
        "q01_from_store",
        "lexical_bm25_from_store",
        "lexical_tfidf_cosine_pairs",
        "fuzzy_part_link_pairs",
        # r14 rotation IN, second swap: the round's two new operators
        # (dedup_minhash_lsh_pairs and text_pii_redaction ceded —
        # driver-green r1-r13 / r8-r13, pytest oracles remain)
        "similarity_index_drift_monitor",
        "lexical_tfidf_from_store",
        # r15 rotation IN: the native session-window operator (now also
        # anchoring the streaming append-mode test) and the seg_cap
        # semantics row (asof_forward_next_purchase and
        # events_value_histogram_percentiles ceded — driver-green
        # r12–r14, pytest oracles remain)
        "events_session_window_native",
        "fuzzy_part_desc_pairs_capped",
        # r16 rotation IN (VERDICT r14 #7 / r15 next-1): the streamed-
        # postings serving row (dedup_verified_near_dup ceded —
        # driver-green r10–r15, pytest oracle remains)
        "lexical_bm25_from_stream",
        # r17 rotation IN (VERDICT r16 #5): the second streamed store
        # becomes driver-checkable (sample_train_val_test ceded —
        # driver-green r10–r16, pytest oracle remains)
        "lexical_tfidf_from_stream",
        # r17 rotation IN, second swap: the round's new hybrid-retrieval
        # operator (text_top_bigrams ceded — driver-green r12–r16,
        # pytest oracle remains)
        "retrieval_rrf_fusion",
        # r18 rotation IN (VERDICT r17 #4/#7): the store-served fusion —
        # full pytest round + dress rehearsal green before the swap
        # (dedup_containment_pairs ceded — driver-green r12–r17, pytest
        # oracle remains)
        "retrieval_rrf_from_store",
        # r19 rotation IN (VERDICT r18 #5): the retrieval-quality eval
        # row — full 722-green pytest round + dress rehearsal before
        # the swap (cms_word_count_estimates ceded — driver-green
        # r12–r18, pytest oracle remains)
        "retrieval_eval_mrr_recall",
        # r20 rotation IN (VERDICT r19 #1): the graded nDCG companion,
        # promoted after the one-execution-per-leg materialization —
        # full pytest round + dress rehearsal before the swap
        # (unpivot_store_priority ceded — driver-green r10–r19, pytest
        # oracle remains)
        "retrieval_eval_ndcg",
        # r20 rotation IN, second swap: the ANN family's measured-recall
        # row (overlap_shipping_windows ceded — driver-green r12–r19,
        # pytest oracle remains)
        "similarity_ann_recall_at_k",
    ]:
        if name.startswith("q") and len(name) <= 3:
            assert any(f.startswith(name + "_") for f in facing), name
        else:
            assert name in facing, name
