#!/usr/bin/env python
"""Interleaved A/B over the bench's shared-cache SPREAD WIDTH (r22,
VERDICT r21 #1): for each candidate width, rebuild the fact+events
caches at that width (pinned via pin_fact/pin_table exactly like
bench.py), run the warm fact-agg/events headline rows best-of-N, then
move to the next width; the whole block cycle repeats CYCLES times so
box-speed drift hits every width equally. Prints per-width totals per
cycle and the cross-cycle best.

Usage: python scripts/ab_spread_width.py [-n reps] [-c cycles] [w ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_project_spark.catalog import all_queries
from datawarehouse_project_spark.io import pin_table, sf_from_dir, table
from datawarehouse_project_spark.plans.star import fact, pin_fact
from datawarehouse_project_spark.session import get_spark

ROWS = [
    "q01_top_revenue_products",
    "q02_quarterly_growth_store",
    "q03_supplier_contribution",
    "q05_monthly_volatility",
    "q06_product_affinity",
    "q07_rollup_yearly",
    "q09_daily_spikes",
    "events_hourly_windows",
    "events_sessionization",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("-c", type=int, default=2)
    ap.add_argument("widths", nargs="*", type=int, default=[32, 8, 4, 16, 2])
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_from_dir(sf_dir)
    spark = get_spark(
        "dwspark-ab-spread", shuffle_partitions=8 if 0 < sf <= 0.2 else 32
    )
    spark.sparkContext.setLogLevel("ERROR")
    builds = all_queries()

    totals: dict[int, list[float]] = {w: [] for w in args.widths}
    for cycle in range(args.c):
        for w in args.widths:
            # rebuild the two shared caches at this width
            spark._dw_fact_cache = {}
            spark._dw_table_cache = {}
            spark.catalog.clearCache()
            fr_fact = fact(spark, sf_dir).repartition(w)
            fr_ev = table(spark, sf_dir, "events").repartition(w)
            for fr in (fr_fact, fr_ev):
                fr.cache()
                fr.count()
            pin_fact(spark, sf_dir, fr_fact)
            pin_table(spark, sf_dir, "events", fr_ev)
            frames = {n: builds[n](spark, sf_dir) for n in ROWS}
            for n in ROWS:  # untimed warm exec (JIT/AQE)
                _noop(frames[n])
            per = {}
            for n in ROWS:
                reps = []
                for _ in range(args.n):
                    t0 = time.perf_counter()
                    _noop(frames[n])
                    reps.append(time.perf_counter() - t0)
                per[n] = min(reps)
            tot = sum(per.values())
            totals[w].append(tot)
            detail = " ".join(f"{n.split('_')[0]}={v:.3f}" for n, v in per.items())
            print(f"cycle{cycle} width={w:>2}: total={tot:.3f}  {detail}", flush=True)
    print("---")
    for w in args.widths:
        print(f"width={w:>2}: per-cycle {['%.3f' % t for t in totals[w]]} best={min(totals[w]):.3f}")


if __name__ == "__main__":
    main()
