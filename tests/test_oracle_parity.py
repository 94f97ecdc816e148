"""Oracle-differential tests: every registered query with an oracle must
match DuckDB exactly at the smoke scale factor (the driver runs the same
check at sf0.01 — also covered here, marked slow)."""

from __future__ import annotations

import pytest

from datawarehouse_project_spark.catalog import oracle_sql, queries
from tests.oracle_check import compare

_ORACLES = oracle_sql()
_QUERIES = queries()


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
