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

Usage: python scripts/bench_straggler.py [N ...]   (default 2e6 8e6)
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


def main() -> None:
    spark = get_spark("dwspark-bench-straggler")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(float(a)) for a in sys.argv[1:]] or [2_000_000, 8_000_000]
    for n in sizes:
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
