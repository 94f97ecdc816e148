"""Deduplication operators for large-scale training-data pipelines.

Four families over the ``documents`` table, each a `queries()` entry with a
DuckDB oracle (exact-integer hashing via ``functions.text`` makes even
minhash/LSH oracle-checkable):

* exact            — md5 content hash, hash-groupBy (one shuffle on the hash)
* minhash + LSH    — 3-word-shingle minhash signatures computed per-row
                     (shuffle-free), banded into buckets, candidate pairs by
                     band-bucket equi-join
* simhash          — 16-bit frequency-weighted sign hash per doc, per-row
* n-gram Jaccard   — exact overlap via a shingle inverted index (shuffle on
                     shingle), the verification stage after LSH candidates

Scale posture (100 TB of documents):
* signatures are embarrassingly parallel — no shuffle, no skew;
* the LSH pair join shuffles on (band, key): bucket sizes are bounded by
  collision probability, and a hot bucket means true near-dup clusters —
  AQE skew-join splits it;
* the inverted-index join's known hazard is ultra-common shingles
  (stop-phrase posting lists); ``ngram_jaccard_pairs`` takes a
  ``df_cap`` to drop shingles with document frequency above a cap —
  standard practice; the registered oracle query keeps it exact (None).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    DUCK_DOCWORDS,
    DUCK_H,
    MINHASH_COEFFS,
    P,
    duck_minhash_exprs,
    hash_array,
    minhash_signature,
    simhash,
    word_shingles,
    words,
)
from ..io import table
from ..session import prepare
from ..plans.registry import register

_K = len(MINHASH_COEFFS)
_MH_COLS = [f"mh{i}" for i in range(_K)]
#: LSH banding: bands of 2 rows => 4 bands from 8 minhashes. Band key packs
#: two minhash values into one BIGINT (each < P < 2^31).
_BANDS = _K // 2


def doc_shingle_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + tokenized words + distinct 3-gram shingles (docs >= 3
    words). The Spark twin of DUCK_DOCWORDS.

    The corpus is repartitioned before the per-row shingling: higher-order
    lambdas run interpreted (outside codegen), so per-doc cost dominates and
    parallelism is everything — a single small parquet file would otherwise
    pin the whole corpus to one core. At real scale the scan already splits;
    the repartition then just rebalances and stays cheap relative to the
    per-doc work it parallelizes.
    """
    prepare(spark)
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = words("text")
    return (
        docs.withColumn("ws", ws)
        .filter(F.size("ws") >= 3)
        .withColumn("sgs", word_shingles(F.col("ws")))
    )


def signature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + k minhash columns; per-row computation, shuffle-free.

    Shingles are md5-hashed ONCE (``hash_array`` materialized as a column),
    then the k permutations are integer maps — k-fold less md5 work, the
    dominant cost of signature computation at corpus scale.
    """
    sh = doc_shingle_frame(spark, sf_dir).withColumn(
        "hsh", hash_array(F.col("sgs"))
    )
    sigs = minhash_signature(F.col("hsh"))
    return sh.select(
        "doc_id", *[c.alias(n) for c, n in zip(sigs, _MH_COLS)]
    )


_DUCK_SIG = f"""
{DUCK_DOCWORDS},
exploded AS (SELECT doc_id, unnest(sgs) AS sg FROM docshingles),
sig AS (
    SELECT doc_id,
           {", ".join(f"{e} AS mh{i}" for i, e in enumerate(duck_minhash_exprs()))}
    FROM exploded
    GROUP BY doc_id
)
"""


# --------------------------------------------------------------------------
@register(
    "dedup_exact_md5",
    headline=True,
    oracle="""
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS dup_count
FROM documents
GROUP BY 1
""",
)
def dedup_exact_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy; canonical row = lowest doc_id.
    At scale: one shuffle on a uniformly-distributed hash — no skew."""
    prepare(spark)
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("dup_count"),
    )


# --------------------------------------------------------------------------
@register(
    "dedup_minhash_signatures",
    oracle=f"WITH {_DUCK_SIG} SELECT doc_id, {', '.join(_MH_COLS)} FROM sig",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return signature_frame(spark, sf_dir)


# --------------------------------------------------------------------------
def _duck_bands() -> str:
    selects = [
        f"SELECT doc_id, {b} AS band, mh{2 * b} * {P} + mh{2 * b + 1} AS band_key FROM sig"
        for b in range(_BANDS)
    ]
    return " UNION ALL ".join(selects)


@register(
    "dedup_minhash_lsh_pairs",
    headline=True,
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
""",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: band signatures -> bucket equi-join ->
    per-pair matching-minhash count (the cheap similarity estimate; exact
    verification is ``dedup_ngram_jaccard_pairs``).

    The signature frame feeds three join branches and is recomputed per
    branch deliberately: the branches execute in parallel across cores, so
    recompute is wall-clock-free, while cache materialization serializes
    before the join (measured slower cold: 6.0s cached vs ~5s uncached at
    sf0.1)."""
    sig = signature_frame(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.col(f"mh{2 * b}") * F.lit(P) + F.col(f"mh{2 * b + 1}")
                        ).alias("band_key"),
                    )
                    for b in range(_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    match_count = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(_K)
    )
    return (
        cand.join(sa, cand.doc_a == F.col("sa.doc_id"))
        .join(sb, cand.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a", "doc_b", match_count.cast("bigint").alias("n_matching_minhash")
        )
    )


# --------------------------------------------------------------------------
# Bit tests run on H(w) % P (hash computed once per word, shared across all
# 16 bits) — the Spark side does the same via hash_array.
_DUCK_SIMHASH_BITS = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hw, h -> CASE WHEN "
    f"(h % {1 << (j + 1)}) >= {1 << j} THEN 1 ELSE -1 END)) "
    f">= 0 THEN {1 << j} ELSE 0 END)"
    for j in range(16)
)


@register(
    "dedup_simhash",
    oracle=f"""
WITH {DUCK_DOCWORDS},
hashed AS (
    SELECT doc_id,
           list_transform(ws, w -> {DUCK_H.format(x="w")} % {P}) AS hw
    FROM docwords
    WHERE len(ws) >= 1
)
SELECT doc_id, ({_DUCK_SIMHASH_BITS})::BIGINT AS simhash_val
FROM hashed
""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit simhash per document; near-dups share values at small hamming
    distance. Per-row expression — no shuffle at any scale."""
    prepare(spark)
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return (
        docs.withColumn("ws", words("text"))
        .filter(F.size("ws") >= 1)
        .withColumn("hw", hash_array(F.col("ws")))
        .select("doc_id", simhash(F.col("hw")).alias("simhash_val"))
    )


# --------------------------------------------------------------------------
def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.6,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted index.

    shuffle on shingle -> pair counts -> jaccard = shared/(|a|+|b|-shared).
    ``df_cap`` drops shingles whose posting list exceeds the cap (the
    standard stop-phrase guard at scale; None = exact).
    """
    # Inverted index with each doc's shingle count attached. The self-join
    # runs as a SHUFFLED-HASH join (no sort phase — the hint matters: SMJ
    # would sort both branches) on a 64-bit hash of the shingle instead of
    # the string: smaller shuffle rows, integer comparisons. Collision risk
    # is ~|shingles|^2 / 2^65 (~1e-10 here, still <1e-3 at a billion
    # distinct shingles) and a collision only perturbs one pair's overlap
    # count by 1. [Measured: SMJ on strings 13.8s -> SHJ on xxhash64 9.5s
    # at sf0.1; the posting-list pair-generation alternative was slower
    # (16s) because nested array lambdas run interpreted.]
    sh = doc_shingle_frame(spark, sf_dir)
    inv = (
        sh.select(
            "doc_id", F.size("sgs").alias("n_sg"), F.explode("sgs").alias("sg")
        )
        .withColumn("sgh", F.xxhash64("sg"))
        .drop("sg")
    )
    if df_cap is not None:
        freq = inv.groupBy("sgh").agg(F.count("*").alias("df"))
        inv = inv.join(freq.filter(F.col("df") <= df_cap), "sgh").select(
            "doc_id", "n_sg", "sgh"
        )
    # no cache: the two join branches recompute the index in parallel,
    # which beats serializing on a cache materialization (measured).
    a, b = inv.alias("a"), inv.alias("b")
    shared = (
        a.hint("SHUFFLE_HASH")
        .join(
            b.hint("SHUFFLE_HASH"),
            (F.col("a.sgh") == F.col("b.sgh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sg").alias("n_a"),
            F.col("b.n_sg").alias("n_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    jac = F.col("shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("shared")
    )
    return shared.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


@register(
    "dedup_ngram_jaccard_pairs",
    headline=True,
    oracle=f"""
WITH {DUCK_DOCWORDS},
inv AS (SELECT doc_id, unnest(sgs) AS sg FROM docshingles),
sizes AS (SELECT doc_id, len(sgs) AS n_sg FROM docshingles),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
    FROM inv a JOIN inv b ON a.sg = b.sg AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(shared AS DOUBLE) / (sa.n_sg + sb.n_sg - shared) AS jaccard
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / (sa.n_sg + sb.n_sg - shared) >= 0.6
""",
)
def dedup_ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(spark, sf_dir, threshold=0.6, df_cap=None)
