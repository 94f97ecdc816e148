"""Parquet table loaders for the driver's TPC-H-ish star schema.

TESTDATA.md: tables ``region nation customer supplier part orders lineitem
events documents embeddings`` live as one parquet per table under
``/root/testdata/sf*/``. All loads are plain ``spark.read.parquet`` so
Catalyst keeps predicate pushdown / column pruning / partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Dimensions that stay small at any scale factor (bounded real-world
#: cardinality) and are always safe to broadcast.
ALWAYS_BROADCAST = {"region", "nation"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table. Never collects; never caches data.

    The resolved leaf ``DataFrame`` HANDLE is memoized per
    ``(session, sf_dir, name)`` — this is a catalog, not a data cache: a
    warehouse resolves a table (open footers, infer schema) once per
    session, not once per query, and ``spark.read.parquet`` costs a
    ~60-70 ms py4j/footer round-trip per call that repeated resolution
    would pay 40+ times across the query catalog. The memo holds the
    logical scan relation — schema AND file listing are pinned at
    resolution time (Spark's ``InMemoryFileIndex``); data PAGES are
    re-read on every execution. The driver's sf dirs are immutable, so
    pinning is correct here; a caller that REWRITES a table directory
    in-session must call :func:`refresh_table` (the ``REFRESH TABLE``
    analog) or silently read the stale file listing — deleted files
    raise, replaced files serve old rows. The cache dict lives on the
    session object itself, so its lifetime (and identity) is exactly
    the session's.

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects outright — read it as raw nanos
    (legacy conf) and truncate to a microsecond timestamp, matching how
    DuckDB coerces nanos to its µs TIMESTAMP.
    """
    cache = getattr(spark, "_dw_table_cache", None)
    if cache is None:
        cache = {}
        spark._dw_table_cache = cache
    key = (sf_dir, name)
    if key in cache:
        return cache[key]
    cache[key] = _load_table(spark, sf_dir, name)
    return cache[key]


def refresh_table(
    spark: SparkSession, sf_dir: str | None = None, name: str | None = None
) -> None:
    """Invalidate :func:`table`'s memoized handles — the ``REFRESH
    TABLE`` analog for this path-based catalog. Call after overwriting a
    table directory that was previously resolved in this session (e.g.
    ``df.write.mode("overwrite").parquet(...)`` over a dir ``table`` has
    read): the pinned file listing otherwise serves deleted-file reads
    or stale rows. With ``name`` (and its ``sf_dir``), drops one entry;
    with ``sf_dir`` alone, every entry under that dir; with neither,
    everything."""
    cache = getattr(spark, "_dw_table_cache", None)
    if not cache:
        return
    if name is not None:
        cache.pop((sf_dir, name), None)
    elif sf_dir is not None:
        for key in [k for k in cache if k[0] == sf_dir]:
            del cache[key]
    else:
        cache.clear()


def _load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def require_small(df: DataFrame, limit: int, what: str) -> DataFrame:
    """Executable contract for documented small-corpus-only baselines.

    The O(N^2) recall/ground-truth baselines (all-pairs cosine, uncapped
    jaccard) are *meant* to be quadratic — but "never run this at scale"
    must be a refusal, not a docstring. Counts the input (cheap metadata-
    only count for parquet scans) and raises above ``limit`` so a pipeline
    that accidentally points a baseline at a production corpus fails fast
    instead of launching an N^2 job. Call the scale-safe twin instead, or
    re-invoke the operator function directly with ``allow_large=True``.
    """
    n = df.count()
    if n > limit:
        raise ValueError(
            f"{what}: input has {n} rows > baseline limit {limit}. "
            f"This is an O(N^2) ground-truth baseline — use its registered "
            f"scale-safe twin, or pass allow_large=True if you really mean it."
        )
    return df


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Rebalance a small-file scan across all cores before per-row-expensive
    work (interpreted higher-order lambdas, md5 folds, vector math).

    A table that arrives as one tiny parquet file is one partition — fine
    for columnar scans, pathological for compute-bound per-row operators on
    a 32-core executor. At real scale the scan splits naturally and this
    repartition is a cheap rebalance of already-distributed data.
    """
    return df.repartition(spark.sparkContext.defaultParallelism)
