"""Local mirror of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables and compares row count, sorted-by-name schema, and the order-
insensitive multiset of canonicalized row values. Stricter than any hash:
values must match exactly (floats bit-for-bit), so if this passes, any
reasonable driver hash passes.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetch_df()


def _canon_value(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return ("f", v)
    if isinstance(v, (np.floating,)):
        return _canon_value(float(v))
    if isinstance(v, (np.integer,)):
        return ("i", int(v))
    if isinstance(v, (bool, np.bool_)):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<NULL>"
        return ("t", v.isoformat())
    if isinstance(v, _dt.datetime):
        return ("t", v.isoformat())
    if isinstance(v, _dt.date):
        return ("t", v.isoformat())
    if isinstance(v, (list, np.ndarray)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return ("b", v.hex())
    if v is pd.NaT:
        return "<NULL>"
    return ("s", str(v))


def canon_rows(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=repr)
    return rows


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Raise AssertionError with a useful diff when results mismatch."""
    actual = spark_df.toPandas()
    expected = run_oracle(oracle_sql, sf_dir)
    assert sorted(c.lower() for c in actual.columns) == sorted(
        c.lower() for c in expected.columns
    ), f"columns differ: spark={sorted(actual.columns)} duck={sorted(expected.columns)}"
    assert len(actual) == len(expected), (
        f"row count differs: spark={len(actual)} duck={len(expected)}"
    )
    a = canon_rows(actual)
    e = canon_rows(expected)
    if a != e:
        diffs = [(x, y) for x, y in zip(a, e) if x != y][:5]
        raise AssertionError(
            f"value mismatch ({sum(1 for x, y in zip(a, e) if x != y)} rows differ); "
            f"first diffs (spark, duck): {diffs}"
        )
