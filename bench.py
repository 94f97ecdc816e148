#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf"}.

Each query executes end-to-end with a noop sink (full computation, zero
driver collection). Timing is best-of-2 per query — the same methodology
as scripts/bench_scaling.py uses for BOTH engines — so one-time JVM JIT /
whole-stage-codegen compilation and first-touch parquet footer reads are
not attributed to steady-state query latency (the quantity that matters
for a long-lived cluster; DuckDB equally benefits from page cache on its
second run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datawarehouse_project_spark.catalog import headline_queries  # noqa: E402
from datawarehouse_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0)
    spark = get_spark("dwspark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer reads, not counted
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}
    for name, build in headline_queries().items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
