#!/usr/bin/env python
"""Store-read vs re-aggregate serving comparison (VERDICT r10 #3 /
r11 #3 / r12 #3): `events_hourly_from_store` (reads the maintained
IncrementalRollup state — group-cardinality rows, no fact scan) against
`events_hourly_windows` (re-aggregates the events table per query),
interleaved ABAB with medians + spread. The one-time rollup fold (the
ingest cost a maintained store pays once per batch, not per query) is
timed separately, same policy as bench.py's cache_build_sec.

Usage: python scripts/bench_serving.py DIR [DIR ...]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_project_spark.catalog import all_queries  # noqa: E402
from datawarehouse_project_spark.io import table  # noqa: E402
from datawarehouse_project_spark.operators.events import (  # noqa: E402
    served_hourly_rollup,
)
from datawarehouse_project_spark.session import get_spark  # noqa: E402

REPS = 3


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_pair(spark, sf_dir: str, family: str) -> dict:
    """One store-vs-recompute pair: 'hourly' (events) or 'q01' (fact)."""
    qs = all_queries()
    if family == "hourly":
        n_source = table(spark, sf_dir, "events").count()
        t0 = time.perf_counter()
        roll = served_hourly_rollup(spark, sf_dir)  # one-time fold
        build_sec = time.perf_counter() - t0
        variants = {
            "recompute": qs["events_hourly_windows"],
            "from_store": qs["events_hourly_from_store"],
        }
    elif family == "bm25":
        from datawarehouse_project_spark.operators.retrieval import (
            served_postings,
        )

        n_source = table(spark, sf_dir, "documents").count()
        t0 = time.perf_counter()
        # one-time fold; .rollup = the postings table, so the generic
        # state_rows read below works (served_postings returns the
        # two-table StreamingPostingsStore since r16 — review finding)
        roll = served_postings(spark, sf_dir).rollup
        build_sec = time.perf_counter() - t0
        variants = {
            "recompute": qs["lexical_bm25_topk"],
            "from_store": qs["lexical_bm25_from_store"],
        }
    elif family == "rrf":
        from datawarehouse_project_spark.operators.retrieval import (
            served_postings,
        )

        n_source = table(spark, sf_dir, "documents").count()
        t0 = time.perf_counter()
        roll = served_postings(spark, sf_dir).rollup
        build_sec = time.perf_counter() - t0
        variants = {
            "recompute": qs["retrieval_rrf_fusion"],
            "from_store": qs["retrieval_rrf_from_store"],
        }
    elif family == "tfidf":
        from datawarehouse_project_spark.operators.retrieval import (
            served_shingle_postings,
        )

        n_source = table(spark, sf_dir, "documents").count()
        t0 = time.perf_counter()
        roll = served_shingle_postings(spark, sf_dir)  # one-time fold
        build_sec = time.perf_counter() - t0
        variants = {
            "recompute": qs["lexical_tfidf_cosine_pairs"],
            "from_store": qs["lexical_tfidf_from_store"],
        }
    else:
        from datawarehouse_project_spark.plans.olap_extra import (
            served_product_rollup,
        )

        n_source = table(spark, sf_dir, "lineitem").count()
        t0 = time.perf_counter()
        roll = served_product_rollup(spark, sf_dir)
        build_sec = time.perf_counter() - t0
        variants = {
            "recompute": qs["q01_top_revenue_products"],
            "from_store": qs["q01_from_store"],
        }
    state_rows = roll.read(spark).count()
    for build in variants.values():  # untimed warm pass
        noop(build(spark, sf_dir))
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(REPS):  # interleaved ABAB
        for name, build in variants.items():
            t0 = time.perf_counter()
            noop(build(spark, sf_dir))
            times[name].append(time.perf_counter() - t0)

    def stats(xs):
        return {
            "median": round(statistics.median(xs), 3),
            "min": round(min(xs), 3),
            "max": round(max(xs), 3),
        }

    return {
        "sf_dir": sf_dir,
        "family": family,
        "source_rows": n_source,
        "state_rows": state_rows,
        "store_build_sec": round(build_sec, 3),
        "timings": {k: stats(v) for k, v in times.items()},
        "speedup_median": round(
            statistics.median(times["recompute"])
            / max(statistics.median(times["from_store"]), 1e-9),
            2,
        ),
        "reps": REPS,
        "protocol": "interleaved ABAB, 1 untimed warm pass each, noop "
        "sink; one-time rollup fold timed separately",
    }


def main() -> None:
    spark = get_spark("dwspark-bench-serving")
    spark.sparkContext.setLogLevel("ERROR")
    families = tuple(
        os.environ.get("SERVING_FAMILIES", "hourly,q01,bm25,tfidf").split(",")
    )
    for sf_dir in sys.argv[1:]:
        for family in families:
            print(json.dumps(bench_pair(spark, sf_dir, family)), flush=True)


if __name__ == "__main__":
    main()
