#!/usr/bin/env python
"""Dump .explain("formatted") for catalog queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [name ...]
  tag     — subdirectory under plans/ (e.g. r21)
  suffix  — "before" or "after"
  names   — query names; default = the headline set

The judge cannot run Spark; these files are the plan-shape evidence for
OPTIMIZATION_r<N>.md claims (Exchange counts, join strategies, PushedFilters,
ReadSchema, BatchEvalPython nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datawarehouse_project_spark.catalog import all_queries, headline_queries
from datawarehouse_project_spark.io import sf_from_dir
from datawarehouse_project_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    sf = sf_from_dir(sf_dir)
    spark = get_spark("dwspark-plan-dump", shuffle_partitions=8 if 0 < sf <= 0.2 else 32)
    spark.sparkContext.setLogLevel("ERROR")

    builds = all_queries() if names else headline_queries()
    if names:
        builds = {n: builds[n] for n in names}

    for name, build in sorted(builds.items()):
        df = build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
