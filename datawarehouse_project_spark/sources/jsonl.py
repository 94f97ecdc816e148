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
