"""Incremental MinHash-LSH dedup: dedup a NEW batch of documents against
a persistent signature store without re-pairing the historical corpus.

This is the shape corpus dedup actually takes at 100 TB: the corpus is
deduped once, its minhash signatures live on as a (small, per-doc) store,
and every ingest batch afterwards computes signatures for the NEW docs
only and emits candidate pairs that touch at least one new doc —
new x existing through the band-bucket join against the store, plus
new x new within the batch. Historical pairs are never recomputed:
per-batch cost is O(batch + collisions), not O(corpus).

The algebra that makes this correct (pytest-pinned): LSH banding is a
per-doc function, so

    pairs(old ∪ new) = pairs(old)  ∪  incremental_pairs(sigs(old), new)

exactly — the batch operator over the union equals the historical answer
plus this operator's output, with no overlap (a pair is old x old, or it
touches a new doc). The signature STORE is the versioned parquet table
(``sources/sinks.py``) keyed on doc_id, so store maintenance inherits
atomic commits, idempotent-replay txns, and time travel.

Reference parity note: the reference dedups per-load via upsert
(MeshJoin.java:358 ON DUPLICATE KEY UPDATE); this extends that
load-by-load discipline to NEAR-dup candidate generation per SURVEY §2's
north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    P,
    hash_array_sql,
    minhash_signature_sql,
    word_shingles_sql,
    words_sql,
)
from ..io import spread, table
from ..plans.registry import register
from ..session import prepare
from .dedup import _BANDS, _DUCK_SIG, _K, _MH_COLS, _duck_bands


def signatures_of(docs: DataFrame) -> DataFrame:
    """Minhash signatures (doc_id + mh0..mh{k-1}) for ANY (doc_id, text)
    frame — the reusable form of ``dedup.signature_frame`` (which binds
    to a table directory). Per-row work, shuffle-free; same portable
    md5-derived hashing, so signatures computed in different batches,
    sessions, or engines agree bit-for-bit — the property that lets a
    signature STORE be appended to forever."""
    return (
        docs.selectExpr("doc_id", f"{words_sql('text')} AS ws")
        .filter("size(ws) >= 3")
        .selectExpr("doc_id", f"{word_shingles_sql('ws')} AS sgs")
        .selectExpr("doc_id", f"{hash_array_sql('sgs')} AS hsh")
        .selectExpr(
            "doc_id",
            *[
                f"{e} AS {n}"
                for e, n in zip(minhash_signature_sql("hsh"), _MH_COLS)
            ],
        )
    )


def bands_of(sigs: DataFrame) -> DataFrame:
    """Explode a signature frame into its LSH band rows (doc_id, full
    signature riding through, band, band_key) — identical banding to the
    batch operator, which is what makes incremental == batch provable."""
    return sigs.select(
        "doc_id",
        *_MH_COLS,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.col(f"mh{2 * b}") * F.lit(P)
                            + F.col(f"mh{2 * b + 1}")
                        ).alias("band_key"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", *_MH_COLS, "bk.band", "bk.band_key")


def incremental_lsh_pairs(
    existing_sigs: DataFrame, new_docs: DataFrame
) -> DataFrame:
    """Candidate pairs introduced by a new batch: every LSH collision
    touching at least one new doc, normalized to ``doc_a < doc_b`` with
    the same ``n_matching_minhash`` estimate as the batch operator.

    Plan shape: the store side shuffles on (band, band_key) exactly like
    the batch pair join — but the build side is only the BATCH's bands,
    so at a steady corpus size the per-batch cost is the batch's own
    signature work plus one bucket join against the store. new x new
    pairs come from the batch's self-join (batch-sized, tiny). No
    nested loop anywhere."""
    new_sigs = signatures_of(new_docs)
    nb, eb = bands_of(new_sigs), bands_of(existing_sigs)

    match_count = sum(
        F.when(F.col(f"a.mh{i}") == F.col(f"b.mh{i}"), 1).otherwise(0)
        for i in range(_K)
    ).cast("bigint")

    # new x existing: bucket join, then orient the pair by id. A new doc
    # can collide with an existing doc in either id order.
    a, b = nb.alias("a"), eb.alias("b")
    cross = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
        F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        match_count.alias("n_matching_minhash"),
    )

    # new x new: the batch's own pair join (ordered directly).
    na, nb2 = nb.alias("a"), nb.alias("b")
    within = na.join(
        nb2,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        match_count.alias("n_matching_minhash"),
    )

    # match count is a function of the pair, so distinct on the triple ==
    # distinct per pair (same argument as the batch operator).
    return cross.unionByName(within).distinct()


# --------------------------------------------------------------------------
@register(
    "dedup_incremental_lsh_pairs",
    oracle=f"""
WITH {_DUCK_SIG},
bands AS ({_duck_bands()}),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST({" + ".join(f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)" for i in range(_K))} AS BIGINT)
           AS n_matching_minhash
FROM cand c
JOIN sig sa ON c.doc_a = sa.doc_id
JOIN sig sb ON c.doc_b = sb.doc_id
WHERE c.doc_a % 2 = 1 OR c.doc_b % 2 = 1
""",
)
def dedup_incremental_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable staging of the incremental flow: even doc_ids play
    the historical corpus (their signatures are 'the store'), odd doc_ids
    arrive as the new batch. The oracle states the correctness contract
    directly: the incremental operator must emit exactly the batch
    operator's pairs that touch a new doc — computed here as the full
    batch pair set filtered to pairs with an odd member, value-identical
    including the match-count column."""
    prepare(spark)
    docs = spread(spark, table(spark, sf_dir, "documents"))
    existing_sigs = signatures_of(docs.filter(F.col("doc_id") % 2 == 0))
    new_docs = docs.filter(F.col("doc_id") % 2 == 1)
    return incremental_lsh_pairs(existing_sigs, new_docs)


# --------------------------------------------------------------------------
class StreamingLshDedup:
    """Near-dup candidate detection over an UNBOUNDED document stream:
    each micro-batch lands its minhash signatures in a versioned store
    and emits the candidate pairs it introduces (vs the store + within
    itself) into a versioned pairs table — ``foreachBatch`` glue around
    :func:`incremental_lsh_pairs`, same discipline as
    ``IncrementalRollup``.

    Exactly-once under replay: both commits carry the (app_id, batch_id)
    txn ledger. Commit ORDER is pairs first, then signatures — if the
    writer dies between them, the replayed batch recomputes the
    identical pairs (the store still lacks this batch's signatures, so
    the computation's inputs are unchanged), the pairs table's ledger
    absorbs the duplicate commit, and the signature commit then
    completes the batch. The pair stream is therefore append-exact:
    every near-dup pair of the whole stream appears exactly once, at
    the batch where its LATER member arrived. That between-commits
    window is pinned as a RESTART fact, not just an argument: an
    injected crash exactly there, resumed by a new session on the same
    checkpoint_dir, converges both tables to the uninterrupted run's
    (tests/test_dedup_incremental.py::
    test_streaming_lsh_dedup_restart_recovery_between_commits) — and in
    its strongest form the resume runs in a NEW PROCESS (fresh
    interpreter + JVM, r17), so the convergence provably comes from the
    on-disk checkpoint + txn ledger rather than any same-JVM cached
    state (…_restart_recovery_across_processes: the re-delivered
    epoch's duplicate pairs commit is version-pinned absorbed)."""

    def __init__(self, root: str) -> None:
        from ..sources.sinks import VersionedParquetTable

        self.signatures = VersionedParquetTable(f"{root}/signatures")
        self.pairs = VersionedParquetTable(f"{root}/pairs")

    def apply_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        batch_id: int | None = None,
        app_id: str = "lsh-dedup",
    ) -> None:
        txn = (app_id, batch_id) if batch_id is not None else None
        if txn is not None:
            last = self.signatures.last_txn(app_id)
            if last is not None and batch_id <= last:
                return  # batch fully applied (signatures commit LAST)
        existing = self.signatures.read(spark)
        if existing is None:
            existing = signatures_of(batch.limit(0))
        new_pairs = incremental_lsh_pairs(existing, batch)
        self.pairs.upsert(spark, new_pairs, pk=["doc_a", "doc_b"], txn=txn)
        self.signatures.upsert(
            spark, signatures_of(batch), pk=["doc_id"], txn=txn
        )
