"""JSONL document source: schema-first parse, corrupt-line quarantine,
field-name (not position) binding, and parity with the parquet twin."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from datawarehouse_project_spark.sources.jsonl import (
    DOCUMENT_SCHEMA,
    jsonl_clean,
    jsonl_quarantine,
    read_jsonl,
)

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10},
    # field order scrambled on purpose: JSONL binds by NAME
    {"n_chars": 9, "lang": "de", "doc_id": 2, "source": "s1", "text": "gamma neun"},
    {"doc_id": 3, "text": "delta", "lang": "fr", "source": "s0", "n_chars": 5},
]
BAD_LINES = [
    '{"doc_id": "not-a-number", "text": "x"}',   # type mismatch
    '{broken json',                               # unparseable
]


def _write_shard(path, objs, bad=()):
    with open(path, "w") as fh:
        for o in objs:
            fh.write(json.dumps(o) + "\n")
        for line in bad:
            fh.write(line + "\n")


def test_jsonl_parses_clean_and_quarantines_bad(spark, tmp_path):
    shard = str(tmp_path / "docs_0.jsonl")
    _write_shard(shard, GOOD, BAD_LINES)
    df = read_jsonl(spark, shard, DOCUMENT_SCHEMA)
    clean = jsonl_clean(df)
    quar = jsonl_quarantine(df)
    assert clean.count() == 3
    assert quar.count() == 2
    rows = {r["doc_id"]: r for r in clean.collect()}
    # name-bound: the scrambled object landed in the right columns
    assert rows[2]["lang"] == "de" and rows[2]["n_chars"] == 9
    # quarantined lines carry the raw text for audit
    raw = [r[0] for r in quar.select("_corrupt_record").collect()]
    assert any("not-a-number" in s for s in raw)
    assert any("broken json" in s for s in raw)


def test_jsonl_matches_parquet_twin(spark, sf_dir, tmp_path):
    """Round-trip the documents table through JSONL: same rows, same
    values — the source format must be semantics-free."""
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shard = str(tmp_path / "docs_rt.jsonl")
    with open(shard, "w") as fh:
        for r in src.collect():
            fh.write(json.dumps(r.asDict()) + "\n")
    back = jsonl_clean(read_jsonl(spark, shard, DOCUMENT_SCHEMA))
    assert back.count() == src.count()
    a = src.agg(
        F.sum("n_chars").alias("s"), F.count("*").alias("n"),
        F.sum(F.xxhash64("text").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    b = back.agg(
        F.sum("n_chars").alias("s"), F.count("*").alias("n"),
        F.sum(F.xxhash64("text").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    assert (a["s"], a["n"], a["h"]) == (b["s"], b["n"], b["h"])


def test_jsonl_gz_shard_reads_but_is_single_task(spark, tmp_path):
    """gzip shards work (codec transparently) — the scale caveat is
    parallelism, not correctness: one .gz file = one task."""
    shard = str(tmp_path / "docs_0.jsonl.gz")
    with gzip.open(shard, "wt") as fh:
        for o in GOOD:
            fh.write(json.dumps(o) + "\n")
    df = jsonl_clean(read_jsonl(spark, shard, DOCUMENT_SCHEMA))
    assert df.count() == 3
    assert df.rdd.getNumPartitions() == 1
