#!/usr/bin/env python
"""Spark-vs-DuckDB scaling curve over the headline queries.

For each sf dir given, times every headline query end-to-end on Spark
(noop sink, shared warmed session — bench.py conditions) AND its DuckDB
oracle (same parquet files, results fully materialized), then prints one
JSON line per sf plus a markdown ratio table for PERFORMANCE.md.

This is the evidence for the bench gate: Spark carries a ~fixed per-query
scheduling/codegen cost that dominates at toy scale; DuckDB's runtime
scales with data. The ratio trend across sf, not the sf0.1 point, is the
claim to check.

Usage: python scripts/bench_scaling.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from datawarehouse_project_spark.catalog import headline_queries, oracle_sql  # noqa: E402
from datawarehouse_project_spark.io import TABLES  # noqa: E402
from datawarehouse_project_spark.session import get_spark  # noqa: E402


#: Best-of-N per query on BOTH engines: the scaling claim is about
#: steady-state engine cost, not first-run plan-compilation noise.
#: (bench.py dual-reports: value_cold single-shot AND value_warm
#: best-of-3 with shared caches — see PERFORMANCE.md for the history.)
RUNS = 2


def time_spark(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name, build in headline_queries().items():
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def time_duck(sf_dir: str, names: list[str]) -> dict[str, float]:
    oracles = oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        best = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    dirs = sys.argv[1:]
    spark = get_spark("dwspark-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for sf_dir in dirs:
        spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # warm
        sp = time_spark(spark, sf_dir)
        du = time_duck(sf_dir, list(sp))
        row = {
            "sf_dir": sf_dir,
            "spark_total": round(sum(sp.values()), 3),
            "duck_total": round(sum(du.values()), 3),
            "ratio": round(sum(sp.values()) / max(sum(du.values()), 1e-9), 2),
            "spark": sp,
            "duck": du,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print("\n| sf dir | Spark (s) | DuckDB (s) | ratio |")
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['sf_dir']} | {r['spark_total']} | {r['duck_total']} "
            f"| {r['ratio']}x |"
        )
    print("\nper-query ratios (spark/duck):")
    names = sorted(results[0]["spark"])
    print("| query | " + " | ".join(r["sf_dir"].split("/")[-1] for r in results) + " |")
    print("|---|" + "---|" * len(results))
    for n in names:
        cells = []
        for r in results:
            s, d = r["spark"].get(n), r["duck"].get(n)
            cells.append(f"{s}/{d} = {round(s / max(d, 1e-9), 1)}x" if d else f"{s}/-")
        print(f"| {n} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
