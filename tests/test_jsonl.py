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


def test_write_jsonl_round_trip_with_manifest(spark, sf_dir, tmp_path):
    """Export -> re-ingest is the identity on data columns; shards carry
    a deterministic in-file order; the manifest's counts match both the
    files and the frame; nulls survive as explicit JSON nulls."""
    import json
    import os

    from datawarehouse_project_spark.io import table
    from datawarehouse_project_spark.sources.jsonl import (
        DOCUMENT_SCHEMA,
        jsonl_clean,
        read_jsonl,
        write_jsonl,
    )

    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "export")
    doc = write_jsonl(docs, out, n_shards=4, shard_key="doc_id")
    assert doc["n_shards"] == 4
    assert doc["total_rows"] == docs.count()
    m = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert m == doc
    for shard in m["shards"]:
        p = os.path.join(out, shard["file"])
        assert os.path.getsize(p) == shard["bytes"]
        with open(p) as fh:
            lines = fh.read().splitlines()
        assert len(lines) == shard["rows"]
        ids = [json.loads(ln)["doc_id"] for ln in lines]
        assert ids == sorted(ids)  # in-shard order key
    back = jsonl_clean(read_jsonl(spark, out, DOCUMENT_SCHEMA))
    want = sorted(map(str, docs.collect()))
    got = sorted(
        map(str, back.select(*docs.columns).collect())
    )
    assert got == want
    # determinism: a re-export writes byte-identical shard contents
    out2 = str(tmp_path / "export2")
    doc2 = write_jsonl(docs, out2, n_shards=4, shard_key="doc_id")
    assert [s["rows"] for s in doc2["shards"]] == [
        s["rows"] for s in doc["shards"]
    ]
    for a, b in zip(doc["shards"], doc2["shards"]):
        pa = os.path.join(out, a["file"]); pb = os.path.join(out2, b["file"])
        assert open(pa, "rb").read() == open(pb, "rb").read()


def test_write_jsonl_preserves_explicit_nulls(spark, tmp_path):
    import json
    import os

    from datawarehouse_project_spark.sources.jsonl import write_jsonl

    df = spark.createDataFrame(
        [(1, None, "en"), (2, "hello", None)],
        "doc_id long, text string, lang string",
    )
    out = str(tmp_path / "nulls")
    write_jsonl(df, out, n_shards=1, shard_key="doc_id")
    lines = []
    for f in os.listdir(out):
        if f.startswith("part-") and not f.endswith(".crc"):
            lines += open(os.path.join(out, f)).read().splitlines()
    rows = {json.loads(ln)["doc_id"]: json.loads(ln) for ln in lines}
    assert rows[1]["text"] is None and "text" in rows[1]
    assert rows[2]["lang"] is None and "lang" in rows[2]
