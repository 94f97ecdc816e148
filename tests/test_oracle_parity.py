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
    # parity core, kept continuously driver-green) plus the round-10
    # rotation — the round-9 crop the r9 verdict told us to rotate IN so
    # every registered operator family earns a driver CORRECTNESS row at
    # least once (r10: topn/skew/langid/pandas_linear and eight others
    # ceded their long-green slots; pytest oracles still run on all).
    for name in [
        *[f"q0{i}" for i in range(1, 10)],
        "q10",
        # r9-crop rows kept from the round-9 window
        "scd2_dim_asof_orders",
        "events_ewma_by_user",
        "similarity_ivf_quantized_topk",
        "dedup_incremental_lsh_pairs",
        "dq_audit_orders_lineitem",
        "corpus_select_token_budget",
        # round-10 rotation: the round-9 pytest-only crop + the ordered
        # O2 surface row
        "text_idf_quality_scores",
        "rfm_customer_segments_scaled",
        "events_gapfill_hourly",
        "unpivot_store_priority",
        "events_value_median_cont",
        "fullouter_yearly_customer_recon",
        "corpus_shard_assignments",
        "sample_train_val_test",
        "dedup_verified_near_dup",
        "bpe_token_counts",
        "events_daily_sketch_rollup",
        "multimodal_audio_features",
        "q03_supplier_contribution_ordered",
    ]:
        if name.startswith("q") and len(name) <= 3:
            assert any(f.startswith(name + "_") for f in facing), name
        else:
            assert name in facing, name
