#!/usr/bin/env python
"""A/B micro-bench: time catalog queries (or variant builders) under the
bench.py WARM protocol — shared frames cached, plan built once outside the
timer, interleaved reps into the noop sink — plus the same-session DuckDB
control per oracle-covered name.

Usage: python scripts/ab_bench.py [-n REPS] name [name ...]
Variant builders can be registered ad hoc by importing this module; from the
CLI it times registered catalog queries by name.

Interleaves reps round-robin (A,B,A,B,...) so box-speed drift between reps
hits every variant equally; reports best-of and median.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_project_spark.catalog import all_oracle_sql, all_queries
from datawarehouse_project_spark.io import sf_from_dir, table
from datawarehouse_project_spark.operators.dedup import (
    doc_shingle_frame,
    signature_frame,
)
from datawarehouse_project_spark.plans.star import fact
from datawarehouse_project_spark.session import get_spark


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def warm_session(sf_dir: str):
    sf = sf_from_dir(sf_dir)
    spark = get_spark(
        "dwspark-ab", shuffle_partitions=8 if 0 < sf <= 0.2 else 32
    )
    spark.sparkContext.setLogLevel("ERROR")
    for fr in (
        fact(spark, sf_dir),
        signature_frame(spark, sf_dir),
        doc_shingle_frame(spark, sf_dir),
        table(spark, sf_dir, "events"),
    ):
        fr.cache()
        fr.count()
    return spark


def time_frames(spark, frames: dict, n_reps: int = 5) -> dict:
    """frames: name -> DataFrame (plan already built). Returns per-name
    (best, median) over n_reps, interleaved."""
    names = list(frames)
    for name in names:  # one untimed warm-up exec each (JIT, AQE plan)
        _noop(frames[name])
    reps: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            _noop(frames[name])
            reps[name].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    return {
        n: (round(min(r), 3), round(statistics.median(r), 3))
        for n, r in reps.items()
    }


def duck_control(sf_dir: str, names: list[str], n_reps: int = 3) -> dict:
    import duckdb

    from datawarehouse_project_spark.io import TABLES

    oracles = all_oracle_sql()
    names = [n for n in names if n in oracles]
    if not names:
        return {}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, list[float]] = {n: [] for n in names}
    for n in names:
        con.execute(oracles[n]).fetchall()  # untimed warm
    for _ in range(n_reps):
        for n in names:
            t0 = time.perf_counter()
            con.execute(oracles[n]).fetchall()
            out[n].append(time.perf_counter() - t0)
    con.close()
    return {n: round(statistics.median(r), 3) for n, r in out.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--no-duck", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = warm_session(sf_dir)
    builds = all_queries()
    frames = {n: builds[n](spark, sf_dir) for n in args.names}
    res = time_frames(spark, frames, args.n)
    duck = {} if args.no_duck else duck_control(sf_dir, args.names)
    for n in args.names:
        b, m = res[n]
        d = duck.get(n)
        extra = f"  duck={d}  ratio_best={round(b / d, 2)}" if d else ""
        print(f"{n}: best={b} median={m}{extra}")


if __name__ == "__main__":
    main()
