#!/usr/bin/env python
"""Wall-clock evidence for the fuzzy-join hot-segment cap (VERDICT r13
#3): on a corpus whose strings share a long boilerplate suffix, the
lossless blocking join's candidate set is ~O(N²) (every hot suffix
segment pairs everything with everything), while the capped join's is
bounded by the cold keys. Prints one JSON line per corpus size with
candidate counts and end-to-end pair-join wall times (pairs themselves
differ only by the measured recall class — see
tests/test_fuzzy.py::test_seg_cap_recall_on_hot_suffix).

Usage: python scripts/bench_fuzzy_cap.py [N ...]   (default 2000 5000)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_project_spark.operators.fuzzy import (  # noqa: E402
    candidate_pairs,
    edit_distance_pairs,
)
from datawarehouse_project_spark.session import get_spark  # noqa: E402

SUFFIX = " PROMO BURNISHED COPPER plate 13"  # 32 boilerplate chars
SEG_CAP = 100
D = 2


def corpus(spark, n: int):
    rows = [
        (i, hashlib.md5(f"filler{i}".encode()).hexdigest()[:16] + SUFFIX)
        for i in range(n)
    ]
    # planted cold-head near-dups so the capped join has true work too
    for j in range(n // 100):
        head = hashlib.md5(f"kept{j}".encode()).hexdigest()[:16]
        rows.append((10_000_000 + 2 * j, head + SUFFIX))
        rows.append((10_000_001 + 2 * j, head + SUFFIX[:-2] + "qq"))
    return spark.createDataFrame(rows, "id bigint, s string")


def main() -> None:
    spark = get_spark("dwspark-bench-fuzzy-cap")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 5000]
    for n in sizes:
        df = corpus(spark, n)
        s = df.select("id", "s")
        out = {"n_strings": df.count(), "d": D, "seg_cap": SEG_CAP}
        for label, cap in (("lossless", None), ("capped", SEG_CAP)):
            t0 = time.perf_counter()
            out[f"candidates_{label}"] = candidate_pairs(s, D, seg_cap=cap).count()
            out[f"candidates_{label}_sec"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            out[f"pairs_{label}"] = edit_distance_pairs(
                df, d=D, seg_cap=cap
            ).count()
            out[f"pairs_{label}_sec"] = round(time.perf_counter() - t0, 3)
        out["candidate_shrink"] = round(
            out["candidates_lossless"] / max(out["candidates_capped"], 1), 1
        )
        out["join_speedup"] = round(
            out["pairs_lossless_sec"] / max(out["pairs_capped_sec"], 1e-9), 2
        )
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
