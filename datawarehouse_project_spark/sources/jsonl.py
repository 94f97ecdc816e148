"""JSONL (newline-delimited JSON) document source.

The reference ingests CSV only (MeshJoin.java:93-160); a training-data
pipeline's raw text overwhelmingly arrives as JSONL shards (one JSON
object per line). Same ingestion contract as ``csv_ingest``: explicit
schema (never inference — a schema-inference pass is a full extra scan
at 100 TB and makes ingestion nondeterministic under drifting fields),
PERMISSIVE parse with corrupt lines quarantined instead of aborting, and
a per-line replay ordinal for last-write-wins upserts.

Scale notes: JSONL is line-splittable, so a 100 TB shard set parallelizes
by byte range with no coordination; gzip shards are NOT splittable (one
task per .gz file — re-shard or use zstd-seekable at scale, documented
here rather than silently tolerated)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .csv_ingest import CORRUPT_COL

#: Canonical document-shard schema (documents.parquet's columns, as the
#: JSONL feed would carry them) + the corrupt-record slot.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """PERMISSIVE JSONL scan: lines that do not parse (or do not fit the
    schema's types) land whole in ``_corrupt_record`` with every data
    column NULL; well-formed lines parse positionally-independent by
    field NAME (JSONL has no column order).

    Implemented as ``text`` scan + ``from_json`` rather than
    ``spark.read.json``: the raw-JSON scan refuses any query whose
    referenced columns reduce to the corrupt column alone
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — which is
    exactly what a quarantine ``count()`` does), and the documented
    workaround is caching, unacceptable for a corpus-sized clean path.
    ``from_json`` runs the SAME Jackson record parser over the same
    line-splittable text scan, with no such restriction and no cache."""
    if CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    raw = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_r")
    )
    return (
        parsed.select("_r.*")
        .withColumn("_src_file", F.input_file_name())
        .withColumn("_ordinal", F.monotonically_increasing_id())
    )


def jsonl_quarantine(df: DataFrame) -> DataFrame:
    """Unparseable lines, kept for audit (same contract as
    ``csv_ingest.quarantine``, but no cache needed: the from_json path
    has no corrupt-column query restriction)."""
    return df.filter(F.col(CORRUPT_COL).isNotNull())


def jsonl_clean(df: DataFrame) -> DataFrame:
    """Well-formed rows with the bookkeeping columns dropped."""
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(
        CORRUPT_COL, "_src_file", "_ordinal"
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str,
    order_key: str | None = None,
    manifest: bool = True,
) -> dict:
    """The export half of the interchange loop: write a corpus as JSONL
    shards the way a training job consumes them — ``n_shards`` files,
    rows assigned by hash of ``shard_key`` (stable under re-runs and
    incremental re-exports; pair with
    ``sampling.corpus_shard_assignments`` to choose the layout) and
    ordered inside each shard by ``order_key`` (default: the shard key),
    so a reader streaming one file sequentially sees a deterministic
    order. One shuffle — the one any shard writer pays.

    Internal columns (``_src_file``/``_ordinal``/``_corrupt_record``
    et al.) are dropped: they describe THIS engine's scan, not the data.
    JSON is written with ``to_json`` (ignoreNullFields=false, so a NULL
    field round-trips as an explicit ``null`` instead of vanishing from
    the schema).

    With ``manifest=True`` a ``_MANIFEST.json`` lands beside the shards
    AFTER the data (write-then-publish: a consumer that requires the
    manifest never sees a half-written export) recording per-shard file
    names, row counts, byte sizes, and the total — the handshake a
    downstream loader validates against. Returns the manifest dict.
    The manifest pass lists/counts through the LOCAL filesystem (this
    container's layout); on HDFS/S3 swap the ``os`` calls for the
    Hadoop FileSystem API — the write-then-publish protocol is
    unchanged, and object stores make the final rename a copy."""
    import json as _json
    import os

    cols = [c for c in df.columns if not c.startswith("_")]
    order = order_key or shard_key
    out = (
        df.select(*cols)
        .repartition(n_shards, F.col(shard_key))
        .sortWithinPartitions(order)
        .select(
            F.to_json(
                F.struct(*cols), {"ignoreNullFields": "false"}
            ).alias("value")
        )
    )
    out.write.mode("overwrite").text(path)
    shards = sorted(
        f for f in os.listdir(path)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    per_shard = []
    total = 0
    for f in shards:
        full = os.path.join(path, f)
        n = 0
        with open(full, "rb") as fh:
            for _ in fh:
                n += 1
        total += n
        per_shard.append(
            {"file": f, "rows": n, "bytes": os.path.getsize(full)}
        )
    doc = {
        "format": "jsonl",
        "n_shards": len(per_shard),
        "total_rows": total,
        "shard_key": shard_key,
        "order_key": order,
        "shards": per_shard,
    }
    if manifest:
        tmp = os.path.join(path, "._MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(doc, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(path, "_MANIFEST.json"))
    return doc
