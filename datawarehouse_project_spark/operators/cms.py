"""Count-min sketch: mergeable approximate frequencies as COUNTER ROWS.

The HLL store (:mod:`.sketches`) answers *distinct-count* range queries
from kilobytes; the count-min sketch is its *frequency* sibling — "how
often does token X occur?" over a corpus too big to keep an exact
vocabulary count table hot. The classic CMS (Cormode & Muthukrishnan,
"An improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005) is a d×w counter matrix with d
pairwise hashes; updates increment one counter per row, point queries
take the min over the d counters — never under the true count, over by
at most e·N/w with probability 1−e^−d.

Spark-first representation: the matrix lives as ROWS ``(i, bucket,
count)``, not as a fat array column —

* an **update** is ``explode(d hash structs) → groupBy(i, bucket) →
  sum`` — a plain hash aggregate with map-side partial combine, so the
  shuffle carries at most d×w partial rows per map task no matter how
  many tokens flow in (d=4, w=1024 ⇒ ≤4096 rows — kilobytes at 100 TB);
* a **merge** of two sketches is ``unionByName → groupBy(i, bucket) →
  sum`` — counters add, which is what makes the store incremental;
* a **point query** joins the probe tokens' d (i, bucket) pairs against
  the counter rows and takes ``min`` per token — an equi-join against a
  ≤d×w-row table, broadcast-sized forever.

The d hash functions are the repo's portable md5 hash family
(``functions.text.portable_hash`` with per-depth salts), so the full
counter table — and therefore every estimate — is bit-identical in
DuckDB: unlike the HLL rows (engine-specific registers, rows-only
driver gate), the registered CMS query carries an EXACT cross-engine
oracle.

No counterpart in the reference (its aggregation layer is exact
GROUP BY, olap_queries.sql); this is north-star surface for the
training-data pipeline: heavy-hitter token tracking over a stream of
document batches without a vocabulary-sized state table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import DUCK_DOCWORDS, portable_hash, words
from ..io import spread, table
from ..plans.registry import register
from ..session import prepare
from ..sources.sinks import VersionedParquetTable

#: Depth d: P[estimate exceeds true + e·N/w] <= e^-d per probe.
CMS_DEPTH = 4
#: Width w: additive error bound is e·N/w (N = total token mass).
CMS_WIDTH = 1024

#: Probe predicate for the registered exemplar: deterministic, corpus-
#: independent (no collected state feeds the plan). 5 yields a non-trivial
#: probe set on the synthetic documents vocabulary (max word length 8;
#: the original 9 selected ZERO words, so the driver row compared empty
#: sets — caught in the r12 promotion dress rehearsal).
_PROBE_MIN_LEN = 5


def cms_bucket(token, i: int, width: int = CMS_WIDTH) -> F.Column:
    """Depth-``i`` bucket of ``token``: portable md5 hash with a per-depth
    salt, mod width — identical arithmetic in both engines."""
    return portable_hash(F.concat(F.lit(f"cms{i}:"), token)) % width


def cms_counters(
    tokens: DataFrame,
    token: str = "word",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """The sketch of a token stream: ``(i, bucket, count)`` rows, one
    update per (token occurrence × depth), collapsed by the hash
    aggregate. Output is at most depth×width rows."""
    ib = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    cms_bucket(F.col(token), i, width).alias("bucket"),
                )
                for i in range(depth)
            ]
        )
    ).alias("ib")
    return (
        tokens.select(ib)
        .groupBy(
            F.col("ib.i").alias("i"), F.col("ib.bucket").alias("bucket")
        )
        .agg(F.count("*").cast("bigint").alias("count"))
    )


def cms_estimates(
    counters: DataFrame,
    probes: DataFrame,
    token: str = "word",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for each probe token: min over the d counters its
    hashes land in. ``counters`` is broadcast (≤ d×w rows by
    construction); absent counters read as 0 (a token the sketch never
    saw estimates 0 — the no-false-negative direction still holds)."""
    pairs = probes.select(
        F.col(token),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        cms_bucket(F.col(token), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("ib"),
    ).select(token, F.col("ib.i").alias("i"), F.col("ib.bucket").alias("bucket"))
    return (
        pairs.join(F.broadcast(counters), ["i", "bucket"], "left")
        .groupBy(token)
        .agg(
            F.min(F.coalesce(F.col("count"), F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


class CmsCounterStore:
    """Durable CMS with the repo's standard incremental-store contract
    (ledgered foreachBatch, CAS retry — same shape as
    :class:`.sketches.DailySketchStore`): each appended token batch is
    sketched ONCE (O(batch) + a ≤d×w-row state merge; counters ADD, so
    incremental == one-shot bit-for-bit) and committed idempotently."""

    KEYS = ["i", "bucket"]

    def __init__(self, root: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
        self.table = VersionedParquetTable(root)
        self.depth = depth
        self.width = width

    def apply_batch(
        self,
        spark: SparkSession,
        tokens: DataFrame,
        token: str = "word",
        batch_id: int | None = None,
        app_id: str = "cms",
    ) -> int:
        from ..io import release_checkpoint
        from ..sources.sinks import ConcurrentWriteError

        part = cms_counters(
            tokens, token, self.depth, self.width
        ).localCheckpoint(eager=True)
        txn = (app_id, batch_id) if batch_id is not None else None
        try:
            for _ in range(10):
                if batch_id is not None:
                    last = self.table.last_txn(app_id)
                    if last is not None and batch_id <= last:
                        return self.table.current_version()
                base_version = self.table.current_version()
                state = self.table.read(spark)
                merged = part
                if state is not None:
                    affected = state.join(
                        part.select("i", "bucket").distinct(),
                        ["i", "bucket"],
                        "left_semi",
                    )
                    merged = (
                        affected.unionByName(part)
                        .groupBy("i", "bucket")
                        .agg(F.sum("count").cast("bigint").alias("count"))
                    )
                try:
                    return self.table.upsert(
                        spark,
                        merged,
                        self.KEYS,
                        txn=txn,
                        expected_base=base_version,
                    )
                except ConcurrentWriteError:
                    continue
            raise RuntimeError(
                "CmsCounterStore.apply_batch lost the commit race 10 times"
            )
        finally:
            release_checkpoint(part)

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.table.read(spark)

    def estimates(
        self, spark: SparkSession, probes: DataFrame, token: str = "word"
    ) -> DataFrame:
        state = self.read(spark)
        if state is None:
            raise ValueError(
                f"CMS store at {self.table.root} is empty: nothing stored"
            )
        return cms_estimates(state, probes, token, self.depth, self.width)


def _cms_oracle() -> str:
    depths = ", ".join(str(i) for i in range(CMS_DEPTH))
    return f"""
WITH {DUCK_DOCWORDS},
tokens AS (
    SELECT unnest(ws) AS word FROM docwords
),
depths AS (SELECT unnest([{depths}]) AS i),
counters AS (
    SELECT d.i AS i,
           (('0x' || substr(md5('cms' || CAST(d.i AS VARCHAR) || ':' || t.word), 1, 15))::BIGINT)
               % {CMS_WIDTH} AS bucket,
           COUNT(*)::BIGINT AS cnt
    FROM tokens t CROSS JOIN depths d
    GROUP BY 1, 2
),
probes AS (
    SELECT DISTINCT word FROM tokens WHERE length(word) >= {_PROBE_MIN_LEN}
),
pairs AS (
    SELECT p.word, d.i AS i,
           (('0x' || substr(md5('cms' || CAST(d.i AS VARCHAR) || ':' || p.word), 1, 15))::BIGINT)
               % {CMS_WIDTH} AS bucket
    FROM probes p CROSS JOIN depths d
)
SELECT pr.word AS word,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
FROM pairs pr LEFT JOIN counters c ON pr.i = c.i AND pr.bucket = c.bucket
GROUP BY 1
"""


@register(
    "cms_word_count_estimates",
    # r12 rotation: promoted to the driver window (VERDICT r11 #1). The
    # oracle is EXACT — portable md5 buckets make the whole counter matrix,
    # and therefore every min-estimate, bit-identical cross-engine.
    # r19 rotation OUT: ceded its driver slot to retrieval_eval_mrr_recall
    # after seven consecutive driver-green rounds (r12-r18); the full
    # DuckDB oracle still runs at both SFs via tests/test_oracle_parity.py.
    oracle=_cms_oracle,
    driver_facing=False,
)
def cms_word_count_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS frequency estimates for every distinct long word (length ≥ 9)
    in the documents corpus: build the d×w counter rows in one hash
    aggregate, probe them with a broadcast join, min over depths.
    Columns: word, est_count."""
    prepare(spark)
    docs = spread(spark, table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(words("text")).alias("word"))
    counters = cms_counters(toks)
    probes = (
        toks.filter(F.length("word") >= _PROBE_MIN_LEN).select("word").distinct()
    )
    return cms_estimates(counters, probes)
