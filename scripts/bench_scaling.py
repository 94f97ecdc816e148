#!/usr/bin/env python
"""Spark-vs-DuckDB scaling curve over the headline queries — ABAB.

For each sf dir given, runs the full headline sweep on Spark (noop sink,
shared warmed session — bench.py conditions) and on DuckDB (same parquet
files, results fully materialized) INTERLEAVED: one untimed warm pass
per engine, then REPS alternating timed sweeps (S D S D S D). Medians +
spread go in the JSON line, so a single FS-cache hiccup or background
task can no longer swing the ratio the way the old single-rep protocol
did twice (VERDICT r10 #4 / r11 #5 / r12 #2 — the ABAB methodology is
bench_skew.py's, applied here).

This is the evidence for the bench gate: Spark carries a ~fixed
per-query scheduling/codegen cost that dominates at toy scale; DuckDB's
runtime scales with data. The ratio trend across sf, not the sf0.1
point, is the claim to check.

Usage: python scripts/bench_scaling.py [--names a,b,c] [--engine E] DIR [DIR ...]

``--names`` sweeps an explicit registry query set instead of the
FROZEN 15-query scaling set — the SAME protocol (interleave, warm
pass, medians) over a different family; added for the lexical-
retrieval crossover measurement (VERDICT r14 #1).

``--engine spark|duck|both`` (default both) runs ONE engine's half of
the protocol — the SERIAL protocol for controls whose plans spill
(r18: the interleaved recipe alternates each DuckDB rep with a full
Spark sweep, and the Spark scans evict the control's working pages
from the OS cache between reps; for the TF-IDF shingle oracle at sf10
that turned a 43–84 s external window sort into a killed >27-min,
45 GB-spill run — diagnosed in PERFORMANCE.md's r18 pathology entry).
Run ``--engine spark`` to completion, let the process exit, then
``--engine duck`` on the same dirs; each half keeps the per-engine
recipe (1 untimed warm pass, REPS timed sweeps, medians). No ratio is
printed in single-engine mode — compute it across the pair, same day,
same box.

The default set is PINNED BY NAME (`FROZEN_SCALING_SET`), not derived
from `headline_queries()`: bench.py's headline set grew 15 → 16 in
round 16 (`lexical_tfidf_cosine_pairs`), and deriving the scaling set
from it would have silently broken comparability with every earlier
curve (r16 review finding). The default invocation therefore stays
byte-identical to the frozen recipe; the lexical family has its own
`--names` curve.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from datawarehouse_project_spark.catalog import (  # noqa: E402
    all_oracle_sql,
    all_queries,
)
from datawarehouse_project_spark.io import TABLES  # noqa: E402
from datawarehouse_project_spark.session import get_spark  # noqa: E402

#: Interleaved timed sweeps per engine per sf (after one untimed warm
#: pass each): median of 3 is robust to a single disturbed rep.
REPS = 3

#: The FROZEN default scaling set — the 15 queries every curve since the
#: ABAB protocol landed has summed. Pinned by name so changes to
#: bench.py's headline flag can never silently alter this recipe (see
#: module docstring).
FROZEN_SCALING_SET = [
    "asof_join_last_order",
    "dedup_exact_md5",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_capped",
    "events_hourly_windows",
    "events_sessionization",
    "q01_top_revenue_products",
    "q02_quarterly_growth_store",
    "q03_supplier_contribution",
    "q05_monthly_volatility",
    "q06_product_affinity",
    "q07_rollup_yearly",
    "q09_daily_spikes",
    "similarity_ann_cosine_topk",
    "text_stats_by_lang",
]

#: The query set for one run: the frozen set by default, or --names.
QUERY_SET: dict | None = None


def _query_set() -> dict:
    if QUERY_SET is not None:
        return QUERY_SET
    reg = all_queries()
    return {n: reg[n] for n in FROZEN_SCALING_SET}


def sweep_spark(spark, sf_dir: str) -> dict[str, float]:
    """One timed pass over every query in the set (seconds per query)."""
    out = {}
    for name, build in _query_set().items():
        t0 = time.perf_counter()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = time.perf_counter() - t0
    return out


def sweep_duck(con, names: list[str]) -> dict[str, float]:
    oracles = all_oracle_sql()
    out = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            continue
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        out[name] = time.perf_counter() - t0
    return out


def _stats(totals: list[float]) -> dict[str, float]:
    return {
        "median": round(statistics.median(totals), 3),
        "min": round(min(totals), 3),
        "max": round(max(totals), 3),
    }


def bench_dir(spark, sf_dir: str, engine: str = "both") -> dict:
    if engine == "spark":
        sweep_spark(spark, sf_dir)  # untimed warm pass (state builds land here)
        sp_reps = [sweep_spark(spark, sf_dir) for _ in range(REPS)]
        sp_med = {
            n: round(statistics.median(r[n] for r in sp_reps), 3)
            for n in sp_reps[0]
        }
        # ADVICE r18: the duck half filters to oracle-covered names, so
        # the cross-half ratio must be computed over the SAME set — emit
        # an oracle-covered subtotal alongside the full-set total.
        oracle_names = [n for n in sp_reps[0] if n in all_oracle_sql()]
        return {
            "sf_dir": sf_dir,
            "engine": "spark",
            "spark_total": _stats([sum(r.values()) for r in sp_reps]),
            "spark_total_oracle_covered": _stats(
                [sum(r[n] for n in oracle_names) for r in sp_reps]
            ),
            "oracle_covered_names": oracle_names,
            "spark": sp_med,
            "reps": REPS,
            "protocol": "SERIAL spark half: 1 untimed warm pass, then "
            f"{REPS} timed sweeps, medians; cross-half ratios use "
            "spark_total_oracle_covered over the duck half's name set "
            "(see --engine docstring)",
        }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    if engine == "duck":
        names = [n for n in _query_set() if n in all_oracle_sql()]
        sweep_duck(con, names)  # untimed warm pass
        du_reps = [sweep_duck(con, names) for _ in range(REPS)]
        du_med = {
            n: round(statistics.median(r[n] for r in du_reps), 3)
            for n in du_reps[0]
        }
        return {
            "sf_dir": sf_dir,
            "engine": "duck",
            "duck_total": _stats([sum(r.values()) for r in du_reps]),
            "duck": du_med,
            "reps": REPS,
            "protocol": "SERIAL duck half: 1 untimed warm pass, then "
            f"{REPS} timed sweeps, medians (see --engine docstring)",
        }
    # one untimed warm pass per engine (plan compilation, FS cache)
    warm_names = list(sweep_spark(spark, sf_dir))
    sweep_duck(con, warm_names)

    sp_reps: list[dict[str, float]] = []
    du_reps: list[dict[str, float]] = []
    for _ in range(REPS):  # interleaved: same machine state for both
        sp_reps.append(sweep_spark(spark, sf_dir))
        du_reps.append(sweep_duck(con, warm_names))

    def per_query_median(reps: list[dict[str, float]]) -> dict[str, float]:
        return {
            n: round(statistics.median(r[n] for r in reps), 3)
            for n in reps[0]
        }

    sp_med = per_query_median(sp_reps)
    du_med = per_query_median(du_reps)
    # compare totals over the ORACLE-COVERED names only, so both sums
    # span the same query set
    names = list(du_med)
    sp_totals = [sum(r[n] for n in names) for r in sp_reps]
    du_totals = [sum(r[n] for n in names) for r in du_reps]
    return {
        "sf_dir": sf_dir,
        "spark_total": _stats(sp_totals),
        "duck_total": _stats(du_totals),
        "ratio": round(
            statistics.median(sp_totals)
            / max(statistics.median(du_totals), 1e-9),
            2,
        ),
        "spark": sp_med,
        "duck": du_med,
        "reps": REPS,
        "protocol": "ABAB interleaved, 1 untimed warm pass per engine, "
        "median of per-rep sweep totals",
    }


def main() -> None:
    global QUERY_SET
    args = sys.argv[1:]
    if "--names" in args:  # accepted at any position (r15 review)
        i = args.index("--names")
        if i + 1 >= len(args):
            sys.exit("usage: bench_scaling.py [--names a,b,c] DIR [DIR ...]")
        reg = all_queries()
        names = args[i + 1].split(",")
        unknown = [n for n in names if n not in reg]
        if unknown:
            sys.exit(f"unknown query names: {unknown} (see catalog.all_queries())")
        QUERY_SET = {n: reg[n] for n in names}
        args = args[:i] + args[i + 2 :]
    json_out = None
    if "--json-out" in args:
        i = args.index("--json-out")
        if i + 1 >= len(args):
            sys.exit("usage: bench_scaling.py [--json-out FILE] DIR [DIR ...]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    engine = "both"
    if "--engine" in args:
        i = args.index("--engine")
        if i + 1 >= len(args) or args[i + 1] not in ("spark", "duck", "both"):
            sys.exit("usage: bench_scaling.py [--engine spark|duck|both] DIR ...")
        engine = args[i + 1]
        args = args[:i] + args[i + 2 :]
    dirs = args
    if not dirs:
        sys.exit("usage: bench_scaling.py [--names a,b,c] DIR [DIR ...]")
    spark = None
    if engine != "duck":  # the duck half must run with NO JVM resident
        spark = get_spark("dwspark-scaling")
        spark.sparkContext.setLogLevel("ERROR")
    results = []
    for sf_dir in dirs:
        row = bench_dir(spark, sf_dir, engine=engine)
        results.append(row)
        print(json.dumps(row), flush=True)
    if engine == "both":
        print("\n| sf dir | Spark median (min–max) | DuckDB median (min–max) | ratio |")
        print("|---|---|---|---|")
        for r in results:
            s, d = r["spark_total"], r["duck_total"]
            print(
                f"| {r['sf_dir']} | {s['median']} ({s['min']}–{s['max']}) "
                f"| {d['median']} ({d['min']}–{d['max']}) | {r['ratio']}x |"
            )
        print("\nper-query medians (spark/duck):")
        names = sorted(results[0]["duck"])
        print("| query | " + " | ".join(r["sf_dir"].split("/")[-1] for r in results) + " |")
        print("|---|" + "---|" * len(results))
        for n in names:
            cells = []
            for r in results:
                s, d = r["spark"].get(n), r["duck"].get(n)
                cells.append(f"{s}/{d} = {round(s / max(d, 1e-9), 1)}x" if d else f"{s}/-")
            print(f"| {n} | " + " | ".join(cells) + " |")
    # machine-readable summary LAST so `tail -1` of a run parses as JSON
    # (VERDICT r15 "What's wrong" #3 — the markdown tables above used to
    # be the final lines and silently fed a table row to captures);
    # --json-out additionally writes the same object to a file.
    summary = json.dumps({"dirs": results})
    if json_out:
        with open(json_out, "w") as f:
            f.write(summary + "\n")
    print(summary, flush=True)


if __name__ == "__main__":
    main()
