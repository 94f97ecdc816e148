"""Range-clustered (sort-ordered) parquet layout: row-group min/max pruning.

Bucketing (``bucketed.py``) co-locates JOIN keys; range-clustering sorts
the table on a FILTER key so parquet row-group statistics become tight.
A selective range predicate then skips whole row groups at the reader —
at 100 TB, a date-range query over a time-clustered fact touches only
the row groups whose ``[min, max]`` intersect the predicate instead of
scanning the full table. This is the 1-D case of Delta/Iceberg
``OPTIMIZE ZORDER`` and the same idea as ClickHouse ``ORDER BY`` or
Redshift sort keys: pay one range-shuffle + sort at write time, and
every later range scan on that key rides the layout.

Mechanics on the write side are pure Spark: ``repartitionByRange`` (a
range exchange — each output file covers a disjoint key range) then
``sortWithinPartitions`` (tight per-row-group stats inside each file).
Catalyst already pushes the predicate to the scan (``PushedFilters`` in
the plan); the parquet reader consults footer statistics per row group
and skips non-overlapping ones. ``rowgroup_prune_stats`` recomputes that
exact skip decision from the footers with pyarrow, so the test asserts
the real prune rate instead of trusting a timing.

The reference has no analog (single-node, full-scan engine); this is
scale-path infrastructure in the same family as ``bucketed.py`` and
``partitioned.py``: partitioning prunes by directory, clustering prunes
inside files, bucketing co-locates joins.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def write_range_clustered(
    df: DataFrame, path: str, key: str, n_files: int = 8
) -> None:
    """Persist ``df`` range-clustered on ``key``: ``n_files`` files, each
    covering a disjoint key range, rows sorted within each file.

    ``repartitionByRange`` samples the key distribution to build balanced
    range bounds (skew-tolerant: a hot key still lands in one range, but
    ranges are equi-depth, not equi-width), so file sizes stay uniform
    even on non-uniform keys.

    Timestamps are forced to ``TIMESTAMP_MICROS`` for the write: Spark's
    default parquet timestamp encoding is INT96, for which writers emit
    NO min/max statistics (the stats were deprecated as unreliable), so
    an INT96 time column can never be pruned — which silently defeats
    the entire point of time-clustering a fact table. Scoped
    save/restore so the session's conf is untouched afterwards."""
    spark = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        (
            df.repartitionByRange(n_files, key)
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def rowgroup_prune_stats(
    path: str, key: str, lo: Any, hi: Any
) -> dict[str, int]:
    """Count parquet row groups whose ``[min, max]`` footer statistics
    overlap ``[lo, hi]`` — the identical check the vectorized reader
    performs before decoding a row group, recomputed from the footers so
    a layout's prune rate is a testable number.

    Returns ``{"row_groups", "overlapping", "rows", "overlapping_rows"}``;
    a reader needs to decode only ``overlapping_rows`` of ``rows``."""
    import datetime
    import glob
    import os

    import pyarrow.parquet as pq

    def _naive(v: Any) -> Any:
        # Spark writes TIMESTAMP_MICROS as isAdjustedToUTC=true, so
        # pyarrow hands back tz-aware datetimes; normalize everything to
        # naive UTC so caller-supplied naive bounds compare cleanly.
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v

    lo, hi = _naive(lo), _naive(hi)

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    total = overlapping = rows = overlapping_rows = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        if meta.num_row_groups == 0:
            continue  # metadata-only file (empty write): nothing to prune
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.row_group(0).num_columns)
        }[key]
        for g in range(meta.num_row_groups):
            col = meta.row_group(g).column(idx)
            total += 1
            rows += meta.row_group(g).num_rows
            st = col.statistics
            if st is None or not st.has_min_max:
                # no stats → the reader cannot prune; count as overlap
                overlapping += 1
                overlapping_rows += meta.row_group(g).num_rows
                continue
            if not (_naive(st.max) < lo or _naive(st.min) > hi):
                overlapping += 1
                overlapping_rows += meta.row_group(g).num_rows
    return {
        "row_groups": total,
        "overlapping": overlapping,
        "rows": rows,
        "overlapping_rows": overlapping_rows,
    }


def zorder_column(df: DataFrame, keys: list[str], bits: int = 8):
    """Z-value (Morton code) column interleaving ``bits``-bit equi-width
    bucket ids of each key — 2+ dimensions supported, all JVM-side
    expressions.

    Equi-width bucketing from a one-row global MIN/MAX aggregate (the
    same driver-side bounds pattern as the JDBC partitioned scan — a
    2-value collect, not a data collect). Equi-depth bounds via
    ``approxQuantile`` would tolerate skew better; equi-width keeps the
    bucket map a pure expression, which is enough for the pruning
    evidence and mirrors what Delta's Z-ORDER does with its range ids.

    Keys may be numeric, date, or timestamp — temporal keys are
    normalized to epoch numbers (``cast timestamp -> long`` seconds /
    ``date -> epoch days``) BEFORE the bounds aggregate, so the Python
    side only ever sees numbers. String keys are rejected with a clear
    error (lexicographic ranks need a dictionary pass, not a linear
    map). NULL key values sort to bucket 0; an empty input is rejected
    (there is nothing to cluster and no bounds to compute).

    Returns ``(df_with_z, "_z")``."""
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    num_exprs = []
    for k in keys:
        t = dtypes[k]
        if t == "date":
            num_exprs.append(F.datediff(F.col(k), F.lit("1970-01-01")))
        elif t.startswith("timestamp"):
            num_exprs.append(F.col(k).cast("long"))
        elif t in ("string", "binary", "boolean"):
            raise ValueError(
                f"z-order key {k!r} has type {t}: only numeric, date, and "
                "timestamp keys have a linear bucket map"
            )
        else:
            num_exprs.append(F.col(k))
    row = df.agg(
        *[
            F.min(e.cast("double")).alias(f"lo_{i}")
            for i, e in enumerate(num_exprs)
        ],
        *[
            F.max(e.cast("double")).alias(f"hi_{i}")
            for i, e in enumerate(num_exprs)
        ],
    ).first()
    n_buckets = 1 << bits
    bucket_cols = []
    for i, (k, e) in enumerate(zip(keys, num_exprs)):
        lo, hi = row[f"lo_{i}"], row[f"hi_{i}"]
        if lo is None or hi is None:
            raise ValueError(
                f"z-order key {k!r} has no non-NULL values (empty input?) — "
                "no bounds to bucket against"
            )
        span = max(float(hi) - float(lo), 1e-300)
        b = F.floor(
            (e.cast("double") - F.lit(float(lo))) / F.lit(span) * n_buckets
        ).cast("long")
        bucket_cols.append(
            F.coalesce(
                F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)),
                F.lit(0),
            )
        )
    ndim = len(keys)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for d, b in enumerate(bucket_cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * ndim + d,
                )
            )
    return df.withColumn("_z", z), "_z"


def write_zorder_clustered(
    df: DataFrame, path: str, keys: list[str], n_files: int = 8, bits: int = 8
) -> None:
    """Persist ``df`` clustered on the z-curve over ``keys``: each file
    covers a contiguous z-range, i.e. a bounded region in EVERY key
    dimension, so range predicates on ANY of the keys prune row groups —
    the multi-column generalization of ``write_range_clustered``, which
    prunes perfectly on one key and not at all on the others. Same write
    cost (one range exchange + local sort); ``_z`` is dropped from the
    stored table (derivable, and the reader prunes on the key columns'
    own stats, not on z)."""
    zdf, zcol = zorder_column(df, keys, bits=bits)
    spark = df.sparkSession
    conf_key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "TIMESTAMP_MICROS")
    try:
        (
            zdf.repartitionByRange(n_files, zcol)
            .sortWithinPartitions(zcol)
            .drop(zcol)
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)
