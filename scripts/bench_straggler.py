#!/usr/bin/env python
"""Planted-straggler measurement for the hot-key guard forms (VERDICT
r14 #2): the window form (`cap_hot_keys`) routes EVERY row of a hot key
through one WindowExec task before the filter drops it — bounded memory
(spill), unbounded single-task wall — while the salted two-phase form
(`cap_hot_keys_salted`) counts via map-side partial aggregation (the
salt = input partition) and anti-joins a broadcast hot-key list, so no
task ever owns a hot key's full row set.

The corpus plants ONE key carrying `hot_frac` of all rows over a cold
long tail; both forms drop the same rows (bit-identical — pinned in
tests/test_bounded_postings.py). Prints one JSON line per n with
best-of-2 ABAB wall times for both forms, so the crossover is a
ledgered number like every other guard in this repo.

Measured (local[32], 30%-hot key, cap=100): 2M rows → salted 1.05× the
window form (free); 8M → 0.74× (WINS); 32M → 0.94× (still wins — the
ratio narrows because on 32 cores the salted form's two balanced
passes ≈ the window form's single 9.6M-row straggler task; the scale
argument is the BOUND, not this box's ratio: the window straggler
grows linearly in the hot key's df, the salted form's per-task work
stays N/cores at any df).

`--tfidf` measures the COUNT-CONSUMING variant instead (VERDICT r15
#2): the df-valuing stage of the TF-IDF posting build, window form
(count window over ALL keys, filter) vs the hybrid (salted pre-drop of
the hot gram, then the same window over the cold mass only — see
tfidf_cosine_pairs' guard= docstring). N = documents; each doc carries
5 cold grams (df≈5) and EVERY doc shares ONE hot gram (df = N ≫ cap)
— the web-boilerplate shape. Both forms produce the same flat row set
(bit-identical operator results pinned in
tests/test_bounded_postings.py).

Usage: python scripts/bench_straggler.py [--tfidf] [N ...]   (default 2e6 8e6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datawarehouse_project_spark.operators.skew import (  # noqa: E402
    cap_hot_keys,
    cap_hot_keys_salted,
)
from datawarehouse_project_spark.session import get_spark  # noqa: E402

CAP = 100
HOT_FRAC = 0.3  # one key owns 30% of all rows — the adversarial shape


def corpus(spark, n: int):
    """n rows: HOT_FRAC of them on the single key 'HOT', the rest spread
    over a cold tail of n/50 keys (each ~35 rows at default sizes —
    under the cap, so the tail survives and the guard does real work).
    A payload column makes row width realistic (the straggler cost is
    serializing ROWS, not counting them)."""
    n_hot = int(n * HOT_FRAC)
    n_cold_keys = max(n // 50, 1)  # floor: n<50 must not modulo by zero
    base = spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit("HOT"))
        .otherwise(
            F.concat(F.lit("k"), (F.col("id") % n_cold_keys).cast("string"))
        )
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    return base.repartition(32)


def run(label, fn, df):
    t0 = time.perf_counter()
    kept = fn(df, ["k"], CAP).count()
    return {f"{label}_sec": round(time.perf_counter() - t0, 3),
            f"{label}_kept": kept}


def tfidf_corpus(spark, n_docs: int, hot_doc_frac: float = 1.0):
    """(doc_id, w, tf) postings: 5 cold grams per doc drawn from an
    n_docs-sized gram space (avg df ≈ 5, under the cap) plus one hot
    gram shared by ``hot_doc_frac`` of docs. Web boilerplate sits in
    essentially EVERY document, so the default plants df = n — at 5
    cold grams/doc that routes ~1/6 of all posting rows (plus the hot
    task's balanced share) through one WindowExec task: straggler
    factor ≈ 1 + 32/5 on 32 cores."""
    cold = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.expr("sequence(0, 4)")).alias("j"),
        )
        .select(
            "doc_id",
            ((F.col("doc_id") + F.col("j") * 7919) % n_docs).alias("w"),
            F.lit(1).cast("bigint").alias("tf"),
        )
    )
    hot = (
        spark.range(n_docs)
        .filter(F.col("id") % 100 < int(hot_doc_frac * 100))
        .select(
            F.col("id").alias("doc_id"),
            F.lit(10**12).alias("w"),
            F.lit(1).cast("bigint").alias("tf"),
        )
    )
    return cold.unionByName(hot).repartition(32)


def tfidf_stage(df, guard: str) -> int:
    """The df-valuing stage of tfidf_cosine_pairs' bounded build,
    replicated exactly (window count + cap filter, with the hybrid's
    salted pre-drop under guard='salted')."""
    from pyspark.sql import Window

    base = df
    if guard == "salted":
        base = cap_hot_keys_salted(df, ["w"], CAP)
    flat = base.withColumn(
        "df", F.count("*").over(Window.partitionBy("w")).cast("bigint")
    ).filter(F.col("df") <= CAP)
    return flat.count()


def main() -> None:
    args = sys.argv[1:]
    tfidf = "--tfidf" in args
    if tfidf:
        args.remove("--tfidf")
    spark = get_spark("dwspark-bench-straggler")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(float(a)) for a in args] or [2_000_000, 8_000_000]
    for n in sizes:
        if tfidf:
            df = tfidf_corpus(spark, n)
            df.count()
            out = {"mode": "tfidf_df_stage", "n_docs": n,
                   "hot_doc_frac": 1.0, "cap": CAP}
            for rep in range(2):
                for label in ("window", "salted"):
                    t0 = time.perf_counter()
                    kept = tfidf_stage(df, label)
                    sec = round(time.perf_counter() - t0, 3)
                    out[f"{label}_sec"] = min(
                        out.get(f"{label}_sec", 1e9), sec
                    )
                    out[f"{label}_kept"] = kept
        else:
            df = corpus(spark, n)
            df.count()  # materialize the shuffle input once, outside timers
            out = {"n_rows": n, "hot_frac": HOT_FRAC, "cap": CAP}
            # ABAB to amortize JIT/GC drift
            for rep in range(2):
                for label, fn in (("window", cap_hot_keys),
                                  ("salted", cap_hot_keys_salted)):
                    r = run(label, fn, df)
                    key = f"{label}_sec"
                    out[key] = min(out.get(key, 1e9), r[key])
                    out[f"{label}_kept"] = r[f"{label}_kept"]
        assert out["window_kept"] == out["salted_kept"]
        out["salted_over_window"] = round(
            out["salted_sec"] / out["window_sec"], 3
        )
        print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
