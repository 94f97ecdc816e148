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


def _string_bucket_map(
    df: DataFrame, key: str, n_buckets: int
) -> DataFrame:
    """Equi-depth bucket map for a STRING key via a dictionary-rank
    pass: ``groupBy(key).count()`` (one distributed shuffle, output
    sized by DISTINCT cardinality, not row count), then a running-sum
    window over the distinct frame assigns each value the bucket of its
    cumulative-frequency position — so buckets hold equal ROW mass even
    when one value dominates. The window orders the whole distinct
    frame in one partition: correct while distinct cardinality is
    broadcast-sized (the same bound the broadcast join back onto the
    fact already requires); a billion-distinct-key table should cluster
    on a hash or prefix of the key instead. Returns ``(key, _bkt)``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    freq = df.filter(F.col(key).isNotNull()).groupBy(key).count()
    w_all = Window.orderBy(key).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy(key).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return freq.select(
        key,
        F.least(
            F.floor(
                (F.sum("count").over(w_cum) - F.col("count"))
                / F.sum("count").over(w_all)
                * n_buckets
            ),
            F.lit(n_buckets - 1),
        )
        .cast("long")
        .alias("_bkt"),
    )


def zorder_column(
    df: DataFrame, keys: list[str], bits: int = 8, method: str = "width"
):
    """Z-value (Morton code) column interleaving ``bits``-bit bucket ids
    of each key — 2+ dimensions supported, all JVM-side expressions (a
    broadcast-joined dictionary for string keys).

    ``method="width"`` buckets each numeric key equi-width from a
    one-row global MIN/MAX aggregate (a 2-value collect, not a data
    collect) — the bucket map stays a pure expression, mirroring Delta's
    Z-ORDER range ids. ``method="depth"`` buckets by ``approxQuantile``
    boundaries (one distributed Greenwald-Khanna sketch pass over all
    keys) so each bucket holds ~equal ROW MASS: under a skewed key,
    equi-width collapses most rows into one bucket and the z-curve
    degenerates to the other dimensions, while equi-depth keeps every
    bucket populated and the layout prunes on the skewed key too
    (evidence: ``tests/test_clustered.py`` zipfian prune-rate test).

    Keys may be numeric, date, timestamp, or string — temporal keys are
    normalized to epoch numbers (``cast timestamp -> long`` seconds /
    ``date -> epoch days``) BEFORE the bounds aggregate, so the Python
    side only ever sees numbers; string keys go through a
    dictionary-rank pass (``_string_bucket_map`` — equi-depth by
    construction, cardinality-bounded) under either method. NULL key
    values sort to bucket 0; an empty input is rejected for
    numeric/temporal keys (no bounds to bucket against).

    Returns ``(df_with_z, "_z")``."""
    from pyspark.sql import functions as F

    if method not in ("width", "depth"):
        raise ValueError(f"method must be 'width' or 'depth', got {method!r}")
    if bits * len(keys) > 63:
        raise ValueError(
            f"bits * len(keys) = {bits * len(keys)} exceeds 63: the Morton "
            "code is a signed 64-bit long and Spark's shiftleft masks the "
            "shift count to 6 bits, so higher bit positions silently wrap "
            "onto lower ones and bucket bits from different dimensions "
            "collide — lower `bits` (e.g. 63 // len(keys)) instead"
        )
    dtypes = dict(df.dtypes)
    orig_cols = list(df.columns)
    n_buckets = 1 << bits
    num_exprs: dict[str, object] = {}
    for k in keys:
        t = dtypes[k]
        if t == "date":
            num_exprs[k] = F.datediff(F.col(k), F.lit("1970-01-01"))
        elif t.startswith("timestamp"):
            num_exprs[k] = F.col(k).cast("long")
        elif t == "string":
            pass  # dictionary-rank path below
        elif t in ("binary", "boolean"):
            raise ValueError(
                f"z-order key {k!r} has type {t}: no meaningful range "
                "bucketing exists (boolean has 2 values; binary has no "
                "collation here) — cluster on a different key"
            )
        else:
            num_exprs[k] = F.col(k)

    bucket_cols: dict[str, object] = {}
    work = df
    for i, k in enumerate(keys):
        if dtypes[k] != "string":
            continue
        bmap = _string_bucket_map(df, k, n_buckets).withColumnRenamed(
            "_bkt", f"_bkt_{i}"
        )
        work = work.join(F.broadcast(bmap), on=k, how="left")
        bucket_cols[k] = F.coalesce(F.col(f"_bkt_{i}"), F.lit(0))

    numeric_keys = [k for k in keys if k in num_exprs]
    if numeric_keys and method == "width":
        row = df.agg(
            *[
                F.min(num_exprs[k].cast("double")).alias(f"lo_{i}")
                for i, k in enumerate(numeric_keys)
            ],
            *[
                F.max(num_exprs[k].cast("double")).alias(f"hi_{i}")
                for i, k in enumerate(numeric_keys)
            ],
        ).first()
        for i, k in enumerate(numeric_keys):
            lo, hi = row[f"lo_{i}"], row[f"hi_{i}"]
            if lo is None or hi is None:
                raise ValueError(
                    f"z-order key {k!r} has no non-NULL values (empty "
                    "input?) — no bounds to bucket against"
                )
            span = max(float(hi) - float(lo), 1e-300)
            b = F.floor(
                (num_exprs[k].cast("double") - F.lit(float(lo)))
                / F.lit(span)
                * n_buckets
            ).cast("long")
            bucket_cols[k] = F.coalesce(
                F.least(F.greatest(b, F.lit(0)), F.lit(n_buckets - 1)),
                F.lit(0),
            )
    elif numeric_keys:  # method == "depth"
        probs = [j / n_buckets for j in range(1, n_buckets)]
        tmp = df.select(
            *[
                num_exprs[k].cast("double").alias(f"_k{i}")
                for i, k in enumerate(numeric_keys)
            ]
        )
        # one pass, all columns; relErr trades sketch size for boundary
        # precision — 1/(4*n_buckets) keeps neighboring buckets distinct
        quantiles = tmp.approxQuantile(
            [f"_k{i}" for i in range(len(numeric_keys))],
            probs,
            1.0 / (4 * n_buckets),
        )
        for i, k in enumerate(numeric_keys):
            bounds = quantiles[i]
            if not bounds:
                raise ValueError(
                    f"z-order key {k!r} has no non-NULL values (empty "
                    "input?) — no bounds to bucket against"
                )
            # Boundaries are kept WITH duplicates: a heavy value that
            # repeats as a boundary still maps all its rows to one
            # bucket id (#bounds <= v is constant across the ties), but
            # the NEXT value's id skips ahead by the tie count — so
            # bucket POSITION stays proportional to cumulative mass
            # across the full 0..n_buckets-1 space, which is what the
            # bit-interleave needs (dedup would compress ids and
            # misalign mass quantiles with bucket-bit boundaries).
            barr = F.array(*[F.lit(float(x)) for x in sorted(bounds)])
            val = num_exprs[k].cast("double")
            # bucket = #boundaries <= value: a single JVM higher-order
            # fold over the (<= n_buckets-1 element) boundary literal
            bucket_cols[k] = F.coalesce(
                F.aggregate(
                    barr,
                    F.lit(0),
                    lambda acc, x: acc
                    + F.when(val >= x, F.lit(1)).otherwise(F.lit(0)),
                ).cast("long"),
                F.lit(0),
            )

    ndim = len(keys)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for d, k in enumerate(keys):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket_cols[k], bit).bitwiseAND(F.lit(1)),
                    bit * ndim + d,
                )
            )
    return work.withColumn("_z", z).select(*orig_cols, "_z"), "_z"


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    keys: list[str],
    n_files: int = 8,
    bits: int = 8,
    method: str = "width",
) -> None:
    """Persist ``df`` clustered on the z-curve over ``keys``: each file
    covers a contiguous z-range, i.e. a bounded region in EVERY key
    dimension, so range predicates on ANY of the keys prune row groups —
    the multi-column generalization of ``write_range_clustered``, which
    prunes perfectly on one key and not at all on the others. Same write
    cost (one range exchange + local sort); ``_z`` is dropped from the
    stored table (derivable, and the reader prunes on the key columns'
    own stats, not on z). ``method="depth"`` buckets equi-depth
    (skew-proof — see ``zorder_column``)."""
    zdf, zcol = zorder_column(df, keys, bits=bits, method=method)
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
