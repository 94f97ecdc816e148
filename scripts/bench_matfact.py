#!/usr/bin/env python
"""Materialized-fact methodology variant for the OLAP family (round-9
verdict item #6): the reference's own posture is enrich-once/query-many
(metro.sql:64-86 INSERT INTO FACT_TRANSACTIONS), so this benches the q*
headliners against a pre-built durable fact table instead of rebuilding
the 4-join enrichment inside every query.

Three timings per query at each sf, best-of-N:
  * spark_computed    — the registered builder (enrichment in the plan)
  * spark_materialized — same builder, fact handle rerouted onto the
    partitioned materialized fact (use_materialized_fact)
  * duck_base         — the DuckDB oracle on the base tables (the frozen
    control: DuckDB also re-derives the fact inside its CTE)
  * duck_materialized — the same oracle with the fact CTE swapped for a
    scan of the SAME materialized parquet (the fair variant: both
    engines amortize the enrichment)
Plus the one-time materialize cost, disclosed.

Usage: python scripts/bench_matfact.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from datawarehouse_project_spark.catalog import headline_queries, oracle_sql  # noqa: E402
from datawarehouse_project_spark.io import TABLES  # noqa: E402
from datawarehouse_project_spark.plans.star import FACT_CTE  # noqa: E402
from datawarehouse_project_spark.session import get_spark  # noqa: E402
from datawarehouse_project_spark.sources.catalog_ddl import (  # noqa: E402
    materialize_fact,
    use_materialized_fact,
)

RUNS = 2
OLAP = [n for n in headline_queries() if n.startswith("q")]


def _best(fn) -> float:
    best = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    dirs = sys.argv[1:]
    spark = get_spark("dwspark-matfact")
    spark.sparkContext.setLogLevel("ERROR")
    builders = headline_queries()
    oracles = oracle_sql()
    for sf_dir in dirs:
        mat_path = tempfile.mkdtemp(prefix="matfact-")
        try:
            t0 = time.perf_counter()
            materialize_fact(spark, sf_dir, mat_path)
            build_sec = round(time.perf_counter() - t0, 3)

            computed = {
                n: _best(
                    lambda n=n: builders[n](spark, sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                for n in OLAP
            }
            use_materialized_fact(spark, sf_dir, mat_path)
            try:
                materialized = {
                    n: _best(
                        lambda n=n: builders[n](spark, sf_dir)
                        .write.format("noop")
                        .mode("overwrite")
                        .save()
                    )
                    for n in OLAP
                }
            finally:
                spark._dw_fact_cache.pop(sf_dir, None)

            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
                )
            con.execute(
                "CREATE OR REPLACE VIEW mat_fact AS SELECT * FROM "
                f"read_parquet('{mat_path}/*/*.parquet')"
            )
            duck_base, duck_mat = {}, {}
            mat_cte = "\nfact AS (SELECT * FROM mat_fact)\n"
            for n in OLAP:
                sql = oracles[n]
                duck_base[n] = _best(lambda s=sql: con.execute(s).fetchall())
                assert FACT_CTE in sql, f"{n} oracle does not embed FACT_CTE"
                swapped = sql.replace(FACT_CTE, mat_cte)
                duck_mat[n] = _best(
                    lambda s=swapped: con.execute(s).fetchall()
                )
            con.close()
        finally:
            shutil.rmtree(mat_path, ignore_errors=True)

        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "materialize_sec": build_sec,
                    "spark_computed": computed,
                    "spark_materialized": materialized,
                    "duck_base": duck_base,
                    "duck_materialized": duck_mat,
                }
            )
        )
        print(f"\n| query | computed | mat | duck_base | duck_mat | "
              f"mat/duck_base | mat/duck_mat |   ({sf_dir})")
        print("|---|---|---|---|---|---|---|")
        for n in OLAP:
            rb = materialized[n] / duck_base[n] if duck_base[n] else float("inf")
            rm = materialized[n] / duck_mat[n] if duck_mat[n] else float("inf")
            print(
                f"| {n} | {computed[n]} | {materialized[n]} | {duck_base[n]} "
                f"| {duck_mat[n]} | {rb:.2f}x | {rm:.2f}x |"
            )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
