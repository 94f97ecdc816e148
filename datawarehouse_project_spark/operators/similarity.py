"""Similarity search over the ``embeddings`` table (array<float> column).

Three operators, all expression-only (zip_with/aggregate folds — JVM-side,
no Python UDFs):

* brute-force cosine top-k   — the exact baseline: broadcast the (small)
  query set against all candidates, in-order fold for the dot product,
  window top-k per query;
* random-hyperplane LSH buckets — deterministic hyperplanes derived from
  md5 (computed once in Python, injected as literal arrays on both
  engines), 8 sign bits -> 256 buckets;
* LSH-bucketed top-k          — the scale path: candidates restricted to
  the query's bucket, then exact cosine rank within it.

Scale posture (billions of vectors): brute force is O(N·|Q|) but perfectly
parallel — broadcast queries, no shuffle until the final per-query top-k
(tiny). The LSH variant cuts N to N/256 per query at the cost of recall;
more planes / multi-probe / IVF(k-means coarse quantizer) are the standard
upgrades and slot into the same bucket-join shape.

Cross-engine determinism: all dot products are left folds in array order
with a 0.0 init on both engines => bit-identical IEEE sums (see
plans/registry.py).
"""

from __future__ import annotations

import hashlib
import os
import warnings

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import ServingMemo, require_small, spread, table
from ..plans.registry import register
from ..session import prepare

#: Embedding dimensionality of the driver's table (asserted in tests).
DIM = 64
#: Number of random-hyperplane sign bits (=> 2^8 = 256 buckets).
N_PLANES = 8
#: Query set for the top-k operators: the first QUERY_IDS vectors.
N_QUERIES = 5
TOP_K = 10
#: Hard ceiling for the O(N^2) ground-truth baselines (all-pairs cosine
#: here, uncapped jaccard in operators/dedup.py): 20k rows => ~200M pairs,
#: the most a "small-corpus ground truth" run should ever mean. Enforced
#: by io.require_small; production paths are the banded/capped twins.
BASELINE_ROW_LIMIT = 20_000


def _hyperplanes(n_planes: int = N_PLANES) -> list[list[int]]:
    """Deterministic pseudo-random hyperplanes: weight[j][i] derived from
    md5(f"hp{j}_{i}") — reproducible anywhere, no RNG state, and identical
    to what an ANSI engine would compute from the same recipe."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(DIM):
            h = int(hashlib.md5(f"hp{j}_{i}".encode()).hexdigest()[:15], 16)
            row.append(h % 2001 - 1000)
        planes.append(row)
    return planes


HYPERPLANES = _hyperplanes()

#: Banded LSH for the near-dup pair join: N_BANDS bands of BAND_BITS sign
#: bits each (OR across bands). Band width sets precision (2^bits buckets
#: per band — widen as the corpus grows), band count sets recall:
#: P(pair surfaces) = 1-(1-p^bits)^bands with p = 1-theta/pi. At the
#: registered cosine>=0.45 threshold (p~0.66), 8 bands x 2 bits give
#: ~0.99 per-pair recall. Same md5 recipe, planes 0..15.
N_BANDS = 8
BAND_BITS = 2
ND_PLANES = _hyperplanes(N_BANDS * BAND_BITS)


# Vector kernels — MEASURED r22 negative result, pinned here so it is
# not retried: unrolling these DIM=64 folds into explicit left-assoc
# scalar chains (to escape the interpreted higher-order-lambda path) is
# value-identical but SLOWER, twice over. (1) Sites that stack 8-16
# folds in one projection (hyperplane sign bits, centroid distances)
# blow Janino's 64 KB method limit — ERROR CodeGenerator, whole stage
# falls back to interpreted. (2) Even a SINGLE 64-term chain that
# compiles fine exceeds HotSpot's JIT-able method size (~8 K bytecode,
# -XX:DontCompileHugeMethods), so the generated consume loop for the
# whole pipeline runs as INTERPRETED BYTECODE: interleaved A/B at
# sf0.1 measured near_dup 6.46->13.07 s and ann_cosine 0.31->0.72 s
# with the unrolled kernels. The HOF fold's per-element lambda is the
# faster evaluation for wide fixed arrays because its loop body stays
# small and JITs. What DID survive from that experiment: per-SIDE norm
# precompute below every pair join (n norms instead of n^2/4 x 2 —
# the q_nrm/c_nrm columns at each call site).


def _norm(emb) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_lit(emb, weights) -> F.Column:
    """Fold dot of ``emb`` against a Python weights literal — the single
    Spark-side source for every hyperplane sign bit (the twin of
    ``_duck_dot_lit``; see the kernel-unrolling negative result above)."""
    warr = F.array(*[F.lit(w) for w in weights])
    return F.aggregate(
        F.zip_with(emb, warr, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _bucket_expr(emb) -> F.Column:
    """8 hyperplane sign bits packed into a BIGINT bucket id."""
    total = F.lit(0)
    for j, weights in enumerate(HYPERPLANES):
        dot = _dot_lit(emb, weights)
        total = total + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return total.cast("bigint")


# -- DuckDB oracle templates -------------------------------------------------

_DUCK_NORM = (
    "sqrt(list_reduce(list_prepend(0.0, "
    "list_transform({e}, x -> x::DOUBLE * x::DOUBLE)), (a, b) -> a + b))"
)
_DUCK_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, {dim}), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (x, y) -> x + y)"
)


def _duck_dot_lit(e: str, weights) -> str:
    """DuckDB left-fold dot product of column ``e`` against a weights
    literal — the single source for every weights-literal oracle
    (bucket keys, band keys, pandas-scoring oracle)."""
    lit = "[" + ", ".join(str(w) for w in weights) + "]"
    return (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
        f"i -> {e}[i]::DOUBLE * ({lit})[i])), (x, y) -> x + y)"
    )


def _duck_bucket(e: str) -> str:
    parts = []
    for j, weights in enumerate(HYPERPLANES):
        dot = _duck_dot_lit(e, weights)
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")::BIGINT"


# --------------------------------------------------------------------------
@register(
    "similarity_ann_cosine_topk",
    headline=True,
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a="q.embedding", b="c.embedding", dim=DIM)}
             / ({_DUCK_NORM.format(e="q.embedding")} * {_DUCK_NORM.format(e="c.embedding")})
             AS cosine
    FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
""",
)
def similarity_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k: the ANN baseline every approximate
    variant is measured against."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = (
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm"))
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


# --------------------------------------------------------------------------
@register(
    "similarity_lsh_buckets",
    driver_facing=False,  # hyperplane hashing stays driver-checked via
    # similarity_near_dup_pairs' band keys; the slot goes to hash sampling
    oracle=f"""
SELECT vec_id, label, {_duck_bucket("embedding")} AS bucket
FROM embeddings
""",
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment (SimHash for vectors)."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    return emb.select(
        "vec_id", "label", _bucket_expr(F.col("embedding")).alias("bucket")
    )


# --------------------------------------------------------------------------
@register(
    "similarity_lsh_topk",
    driver_facing=False,  # superseded by similarity_ivf_topk / similarity_near_dup_pairs
    oracle=f"""
WITH b AS (
    SELECT vec_id, embedding, {_duck_bucket("embedding")} AS bucket
    FROM embeddings
),
q AS (SELECT * FROM b WHERE vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a="q.embedding", b="c.embedding", dim=DIM)}
             / ({_DUCK_NORM.format(e="q.embedding")} * {_DUCK_NORM.format(e="c.embedding")})
             AS cosine
    FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
""",
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: exact cosine rank restricted to the query's LSH
    bucket — the join is an equi-join on bucket, so at scale candidates are
    co-partitioned and the 1/256 selectivity replaces the full scan."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    b = emb.select("vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bucket"))
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    c = b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
        "bucket",
    )
    pairs = c.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    cos = (
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm"))
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


# --------------------------------------------------------------------------
#: IVF coarse quantizer: K_IVF centroids, trained LAZILY on first use
#: (import must touch no data files — import-time I/O on an absolute path
#: is fragile outside the bench container).
K_IVF = 8
#: Training sample location — overridable so a deployment trains from its
#: own (small) sample table rather than this container's default.
_IVF_SAMPLE_ENV = "SPARK_GRAFT_IVF_SAMPLE"
_IVF_SAMPLE_DEFAULT = "/root/testdata/sf0.001/embeddings.parquet"

_IVF_CACHE: list[list[float]] | None = None


def _train_ivf_centroids(k: int = K_IVF, iters: int = 5) -> list[list[float]]:
    """Sample-trained coarse quantizer: deterministic Lloyd's k-means
    (init = first k vectors by vec_id, fixed iteration count, float64
    numpy) over the smallest sample table — training the quantizer on a
    sample and applying it to the full corpus is exactly how production
    IVF indexes are built. The learned centroids are injected as literals
    into BOTH engines' assignment expressions (like HYPERPLANES), so the
    partition is identical everywhere; repr() round-trips float64, so both
    SQL parsers reconstruct bit-identical doubles.

    Falls back (with a warning) to md5-derived pseudo-centroids only when
    the sample table or numpy/pyarrow is absent — a narrow except, so a
    genuine read/shape bug fails loudly instead of silently degrading
    every IVF result."""
    sample = os.environ.get(_IVF_SAMPLE_ENV, _IVF_SAMPLE_DEFAULT)
    try:
        import numpy as np
        import pyarrow.parquet as pq

        tbl = pq.read_table(sample, columns=["vec_id", "embedding"])
    except (ImportError, FileNotFoundError, OSError) as exc:
        warnings.warn(
            f"IVF training sample unavailable ({exc!r}); falling back to "
            f"pseudo-random centroids. Set ${_IVF_SAMPLE_ENV} to a small "
            "embeddings parquet to train a real quantizer.",
            stacklevel=2,
        )
        return [[float(w) for w in _hyperplanes(k)[j]] for j in range(k)]
    order = np.argsort(tbl.column("vec_id").to_numpy())
    mat = np.vstack(tbl.column("embedding").to_pylist())[order].astype(np.float64)
    return _lloyd_kmeans(mat, k, iters)


def _lloyd_kmeans(mat, k: int, iters: int) -> list[list[float]]:
    """Deterministic Lloyd's: init = first k rows (callers pass the matrix
    in a deterministic order), fixed iteration count, float64, ties to the
    lowest centroid id. Shared by the file-sample trainer above and the
    DataFrame trainer below so both produce identical quantizers on
    identical samples."""
    cent = mat[:k].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=-1)
        assign = d.argmin(axis=1)  # first occurrence wins ties: lowest cid
        for j in range(k):
            members = mat[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return [[float(x) for x in row] for row in cent]


#: Default training-sample size for the DataFrame trainer: bounded driver
#: collect (TakeOrderedAndProject — no global sort materialized), the same
#: bounded-action budget as the BPE argmax and the file-sample trainer.
IVF_TRAIN_SAMPLE = 1024


def train_centroids_from_df(
    emb: DataFrame,
    k: int = K_IVF,
    sample_n: int = IVF_TRAIN_SAMPLE,
    iters: int = 5,
) -> list[list[float]]:
    """Train the IVF coarse quantizer from an embeddings DataFrame —
    the path a user with their OWN corpus takes (VERDICT r9 #4): a
    deterministic hash-sample of ``sample_n`` vectors (md5-derived
    portable hash over ``vec_id``, so the sample — and therefore the
    quantizer — is reproducible and independent of partitioning / insert
    order), collected to the driver (bounded: sample_n × DIM floats,
    plans as TakeOrderedAndProject), then the shared deterministic
    Lloyd's. At 100 TB the sample scan is a column-pruned pass that
    early-stops per partition on the top-n; training cost never grows
    with the corpus."""
    import numpy as np

    rows = (
        emb.select(
            "vec_id",
            "embedding",
            F.unhex(F.md5(F.concat(F.lit("ivf-train:"), F.col("vec_id").cast("string"))))
            .cast("binary")
            .alias("_h"),
        )
        .orderBy("_h", "vec_id")
        .limit(sample_n)
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])  # deterministic init order
    if len(rows) < k:
        # Fail loudly, not with an opaque numpy indexing error: an index
        # trained on fewer vectors than clusters would disagree with the
        # module's K_IVF/N_PROBES assumptions (advisor finding, round 10).
        raise ValueError(
            f"IVF training needs >= k={k} sample vectors, got {len(rows)} "
            f"(corpus too small or sample_n={sample_n} < k); "
            "pass a smaller k explicitly for tiny corpora"
        )
    mat = np.array([list(map(float, r["embedding"])) for r in rows], dtype=np.float64)
    return _lloyd_kmeans(mat, k, iters)


def kmeans_refine_distributed(
    emb: DataFrame,
    centroids: list[list[float]],
    iters: int = 2,
) -> list[list[float]]:
    """Full-corpus Lloyd refinement of a (sample-trained) quantizer —
    Catalyst-only per iteration, so it scales where the driver-side
    trainer's 1024-row sample stops being representative:

    * **assignment** is the exact argmin expression the IVF operators
      serve with (:func:`_ivf_cluster_expr`) — no Python in the corpus
      pass;
    * **update** is ``posexplode → hash aggregate``: map-side partial
      combine caps the shuffle at K×dim partial rows per task no matter
      the corpus size;
    * the driver touches only the ≤ K×dim aggregated ``(cluster, pos,
      sum, count)`` rows per iteration — the sanctioned bounded-collect
      class (same budget as the trainer's sample).

    Empty clusters keep their previous centroid (standard Lloyd guard).
    Inertia is non-increasing in exact arithmetic; float partial-sum
    order makes refined centroids tolerance-stable across runs, not
    bit-stable — which is why the SERVED quantizers default to the
    bit-reproducible sample-trained set and refinement is the opt-in
    quality knob (``IvfVectorIndex.build(refine_iters=...)``, persisted
    to the sidecar so serving stays deterministic after build)."""
    k = len(centroids)
    cur = [list(map(float, c)) for c in centroids]
    for _ in range(iters):
        assigned = emb.select(
            _ivf_cluster_expr(F.col("embedding"), cur).alias("cluster_id"),
            F.col("embedding"),
        )
        rows = (
            assigned.select(
                "cluster_id",
                F.posexplode(F.col("embedding")).alias("pos", "val"),
            )
            .groupBy("cluster_id", "pos")
            .agg(
                F.sum(F.col("val").cast("double")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()  # ≤ K×dim rows — bounded by construction
        )
        sums: dict[tuple[int, int], float] = {}
        counts: dict[int, int] = {}
        for r in rows:
            sums[(r["cluster_id"], r["pos"])] = r["s"]
            counts[r["cluster_id"]] = r["n"]
        cur = [
            [sums[(cid, p)] / counts[cid] for p in range(len(cur[cid]))]
            if counts.get(cid)
            else cur[cid]
            for cid in range(k)
        ]
    return cur


def kmeans_inertia(emb: DataFrame, centroids: list[list[float]]) -> float:
    """The Lloyd objective — sum of squared distances to each vector's
    assigned (nearest) centroid — in one corpus pass, all-JVM."""
    d = F.array_min(
        F.array(*_ivf_dist_structs(F.col("embedding"), centroids))
    ).getField("d")
    return float(emb.select(F.sum(d)).collect()[0][0])


def ivf_centroids() -> list[list[float]]:
    """The trained centroids, computed once on first query build."""
    global _IVF_CACHE
    if _IVF_CACHE is None:
        _IVF_CACHE = _train_ivf_centroids()
    return _IVF_CACHE


#: Multi-probe width: queries search their P nearest coarse cells, not
#: just the owning one. Single-probe has a recall cliff for queries near
#: a centroid boundary (their true neighbors sit one cell over); probing
#: the runner-up cells is the standard IVF fix — P×cost, recall ↑.
N_PROBES = 2


def _ivf_dist_structs(emb, centroids=None) -> list[F.Column]:
    """(squared_dist, cid) structs, one per centroid — in-order float64
    folds on identical centroid literals, so distances (and therefore any
    argmin/sort over them) are bit-identical across engines. ``centroids``
    defaults to the module's shared trained set; a per-index trained set
    (``IvfVectorIndex.build``) is passed explicitly."""
    pairs = []
    for cid, cent in enumerate(centroids if centroids is not None else ivf_centroids()):
        # K_IVF folds stack in one projection — HOF form on purpose,
        # see _dot_lit's 64 KB-codegen note.
        carr = F.array(*[F.lit(v) for v in cent])
        d = F.aggregate(
            F.zip_with(
                emb, carr, lambda x, m: (x.cast("double") - m) * (x.cast("double") - m)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        pairs.append(F.struct(d.alias("d"), F.lit(cid).alias("c")))
    return pairs


def _ivf_cluster_expr(emb, centroids=None) -> F.Column:
    """argmin-over-centroids cluster id: min of (squared_dist, cid) structs
    — lexicographic struct ordering gives min distance, ties to lowest cid."""
    return F.array_min(F.array(*_ivf_dist_structs(emb, centroids))).getField("c")


def _ivf_probes_expr(emb, n_probes: int = N_PROBES, centroids=None) -> F.Column:
    """The ``n_probes`` nearest cluster ids, nearest first: sort the
    (dist, cid) structs (lexicographic = by distance, ties to lowest cid)
    and take the head. probes[0] == the single-probe assignment."""
    ordered = F.array_sort(F.array(*_ivf_dist_structs(emb, centroids)))
    return F.transform(
        F.slice(ordered, 1, n_probes), lambda s: s.getField("c")
    )


def _duck_ivf_cluster(e: str) -> str:
    items = []
    for cid, cent in enumerate(ivf_centroids()):
        lit = "[" + ", ".join(repr(v) for v in cent) + "]"
        d = (
            f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
            f"i -> ({e}[i]::DOUBLE - ({lit})[i]) * ({e}[i]::DOUBLE - ({lit})[i]))), "
            "(x, y) -> x + y)"
        )
        items.append(f"[{d}, {float(cid)!r}]")
    fold = (
        f"list_reduce([{', '.join(items)}], "
        "(a, b) -> CASE WHEN b[1] < a[1] THEN b ELSE a END)"
    )
    return f"CAST({fold}[2] AS INT)"


def _duck_ivf_probes(e: str, n_probes: int = N_PROBES) -> str:
    """DuckDB twin of ``_ivf_probes_expr``: sort [dist, cid] pairs
    (lexicographic list comparison = by distance, ties to lowest cid),
    take the head, project the cid."""
    items = []
    for cid, cent in enumerate(ivf_centroids()):
        lit = "[" + ", ".join(repr(v) for v in cent) + "]"
        d = (
            f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {DIM}), "
            f"i -> ({e}[i]::DOUBLE - ({lit})[i]) * ({e}[i]::DOUBLE - ({lit})[i]))), "
            "(x, y) -> x + y)"
        )
        items.append(f"[{d}, {float(cid)!r}]")
    return (
        f"list_transform(list_sort([{', '.join(items)}])[1:{n_probes}], "
        "x -> x[2]::INT)"
    )


def spark_ivf_probes_sql(e: str, n_probes: int = N_PROBES) -> str:
    """Spark-SQL text twin of ``_ivf_probes_expr``."""
    items = []
    for cid, cent in enumerate(ivf_centroids()):
        lit = "array(" + ", ".join(repr(v) for v in cent) + ")"
        d = (
            f"aggregate(zip_with({e}, {lit}, "
            "(x, m) -> (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        items.append(f"named_struct('d', {d}, 'c', {cid})")
    return (
        f"transform(slice(array_sort(array({', '.join(items)})), 1, {n_probes}), "
        "s -> s.c)"
    )


def spark_ivf_cluster_sql(e: str) -> str:
    """Spark-SQL text twin of ``_ivf_cluster_expr`` (used by the dual
    SQL surface in plans/sql_twins.py)."""
    items = []
    for cid, cent in enumerate(ivf_centroids()):
        lit = "array(" + ", ".join(repr(v) for v in cent) + ")"
        d = (
            f"aggregate(zip_with({e}, {lit}, "
            "(x, m) -> (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        items.append(f"named_struct('d', {d}, 'c', {cid})")
    return f"array_min(array({', '.join(items)})).c"


def _ivf_topk_oracle() -> str:
    """Lazy: interpolating the trained centroids must not run at import."""
    return f"""
WITH assigned AS (
    SELECT vec_id, embedding, {_duck_ivf_cluster("embedding")} AS cluster_id
    FROM embeddings
),
q AS (SELECT * FROM assigned WHERE vec_id < {N_QUERIES}),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a="q.embedding", b="c.embedding", dim=DIM)}
             / ({_DUCK_NORM.format(e="q.embedding")} * {_DUCK_NORM.format(e="c.embedding")})
             AS cosine
    FROM q JOIN assigned c ON c.cluster_id = q.cluster_id AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_ivf_topk",
    driver_facing=False,  # superseded by similarity_ivf_multiprobe_topk
    # (the production form); stays registered as the single-probe recall
    # floor the multi-probe pytest measures against
    oracle=_ivf_topk_oracle,
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k with a TRAINED coarse quantizer: every vector
    is assigned to its nearest k-means centroid (centroids learned from
    the sample table, injected as literals on both engines), search is
    restricted to the query's cluster, exact cosine ranks within it.
    Partition-restricted candidate equi-join, 1/K_IVF selectivity, same
    shape as production IVF at any scale. SINGLE-probe: recall cliffs at
    centroid boundaries — the registered production form is
    ``similarity_ivf_multiprobe_topk``."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    assigned = emb.select(
        "vec_id", "embedding", _ivf_cluster_expr(F.col("embedding")).alias("cluster_id")
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
        F.col("cluster_id").alias("q_cluster"),
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
        "cluster_id",
    )
    pairs = c.join(
        F.broadcast(q),
        (F.col("cluster_id") == F.col("q_cluster"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    cos = (
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm"))
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


# --------------------------------------------------------------------------
def _ivf_multiprobe_oracle() -> str:
    """Lazy (trained centroids interpolate at first access, not import)."""
    return f"""
WITH assigned AS (
    SELECT vec_id, embedding, {_duck_ivf_cluster("embedding")} AS cluster_id
    FROM embeddings
),
qp AS (
    SELECT vec_id, embedding, unnest({_duck_ivf_probes("embedding")}) AS probe
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a="q.embedding", b="c.embedding", dim=DIM)}
             / ({_DUCK_NORM.format(e="q.embedding")} * {_DUCK_NORM.format(e="c.embedding")})
             AS cosine
    FROM qp q JOIN assigned c ON c.cluster_id = q.probe AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_ivf_multiprobe_topk",
    driver_facing=False,  # r10 rotation: driver-green r≤9; ivf_quantized keeps the slot
    oracle=_ivf_multiprobe_oracle,
)
def similarity_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k, MULTI-probe (the production form): each query searches
    its ``N_PROBES`` nearest coarse cells instead of only the owning one,
    fixing the single-probe recall cliff at centroid boundaries (queries
    whose true neighbors sit just across a Voronoi face). Plan shape is
    unchanged — the query side explodes its probe list and the candidate
    join stays a (cluster_id) EQUI-join, so cost scales by exactly
    P/K_IVF of the corpus per query and the shuffle key is still the
    cluster id; no nested loop appears (plan-asserted). A probed cell is
    disjoint from the others (each candidate lives in ONE cell), so no
    dedup step is needed after the join. Recall >= the single-probe twin
    on every corpus — measured against brute force in
    tests/test_similarity.py."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    assigned = emb.select(
        "vec_id", "embedding", _ivf_cluster_expr(F.col("embedding")).alias("cluster_id")
    )
    qp = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
            F.explode(_ivf_probes_expr(F.col("embedding"))).alias("probe"),
        )
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
        "cluster_id",
    )
    pairs = c.join(
        F.broadcast(qp),
        (F.col("cluster_id") == F.col("probe"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    cos = (
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm"))
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        pairs.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


# --------------------------------------------------------------------------
def ann_recall_vs_exact(
    exact: DataFrame, approx: DataFrame
) -> DataFrame:
    """Recall@k of an approximate top-k against the exact brute-force
    ground truth, per query: ``hits_at_k`` = |approx ∩ exact| on
    (query_id, neighbor_id), ``n_exact`` = the ground-truth list size,
    ``recall_at_k_scaled`` = floor(1e6 * hits / n_exact). Integer
    counts -> bit-exact cross-engine. Both inputs are k-bounded per
    query, so the join is over tiny frames regardless of corpus size."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        e.join(a, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("bigint").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("hits_at_k"),
        )
        .select(
            "query_id",
            "n_exact",
            "hits_at_k",
            F.floor(
                F.lit(1_000_000.0)
                * F.col("hits_at_k").cast("double")
                / F.col("n_exact").cast("double")
            )
            .cast("bigint")
            .alias("recall_at_k_scaled"),
        )
    )


def _recall_oracle_vs_exact(approx_name: str):
    """Lazy-oracle FACTORY for the measured-recall rows (r20, VERDICT
    r19 missing #1 generalized): composes the REGISTERED oracles of the
    exact brute-force row and of ``approx_name`` (one text each, so a
    recall row can never drift from what the measured rows actually
    compute); WITH-in-subquery is valid in both engines."""

    def build() -> str:
        from ..plans.registry import REGISTRY, resolve_oracle

        brute = resolve_oracle(REGISTRY["similarity_ann_cosine_topk"])
        approx = resolve_oracle(REGISTRY[approx_name])
        return f"""
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS hits_at_k,
       CAST(FLOOR(CAST(1000000 AS DOUBLE)
            * CAST(COUNT(a.neighbor_id) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS recall_at_k_scaled
FROM ({brute}) e
LEFT JOIN ({approx}) a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY 1
"""

    return build


def _recall_row_vs_exact(spark: SparkSession, sf_dir: str, approx_name: str):
    """The Spark half of a measured-recall row: both sides come from the
    registered builders, so the measurement tracks the registered plans
    by construction."""
    from ..plans.registry import REGISTRY

    return ann_recall_vs_exact(
        REGISTRY["similarity_ann_cosine_topk"].build(spark, sf_dir),
        REGISTRY[approx_name].build(spark, sf_dir),
    )


_ann_recall_oracle = _recall_oracle_vs_exact("similarity_ivf_multiprobe_topk")


@register(
    "similarity_ann_recall_at_k",
    # r19: the ANN-approximation quality measurement as a first-class
    # row (previously only a pytest assertion) — recall@k of the
    # production multi-probe IVF against the exact brute-force top-k,
    # per query.
    # r20 rotation IN (second swap): promoted after its pytest-only
    # proving round, giving the ANN family a driver-checked quality
    # measurement alongside the lexical eval rows
    # (overlap_shipping_windows ceded after eight driver-green rounds
    # r12-r19; pytest oracle remains).
    oracle=_ann_recall_oracle,
)
def similarity_ann_recall_at_k(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query recall@{TOP_K} of ``similarity_ivf_multiprobe_topk``
    vs the exact ``similarity_ann_cosine_topk`` ground truth — reuses
    the two registered builders, so the measurement can never drift
    from the registered plans."""
    return _recall_row_vs_exact(
        spark, sf_dir, "similarity_ivf_multiprobe_topk"
    )


@register(
    "similarity_funnel_recall_at_k",
    # r20 (VERDICT r19 missing #1): measured recall of the PRODUCTION
    # serving path — the composed IVF -> hamming-prefilter -> exact-
    # rerank funnel — against brute-force ground truth, as a
    # first-class row (previously only a pytest floor). Oracle composed
    # from the two registered oracles. Pytest-only (rotation candidate
    # once proven). Dominance vs the raw-hamming ranking is asserted in
    # tests/test_similarity.py.
    oracle=_recall_oracle_vs_exact("similarity_ivf_binary_funnel_topk"),
    driver_facing=False,
)
def similarity_funnel_recall_at_k(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query recall@{TOP_K} of the production serving funnel
    (``similarity_ivf_binary_funnel_topk``) vs the exact brute-force
    ground truth — both sides from the registered builders."""
    return _recall_row_vs_exact(
        spark, sf_dir, "similarity_ivf_binary_funnel_topk"
    )


def ann_rank_quality_vs_exact(
    exact: DataFrame, approx: DataFrame
) -> DataFrame:
    """MRR-style rank quality of an approximate ranking against exact
    ground truth (r20 — the lexical eval family's reciprocal-rank
    metric, run over ANN rankings): per query, the rank at which the
    approximate list surfaces the TRUE top-1 neighbor —
    ``top1_rank_in_approx`` (0 = missed entirely) and ``rr_scaled`` =
    floor(1e6 / that rank), 0 when missed. A set-recall row can read
    1.0 while the approx list buries the best neighbor at rank k; this
    metric is what distinguishes those rankings. Integer ranks ->
    bit-exact cross-engine; both inputs are k-bounded per query."""
    top1 = exact.filter(F.col("rank") == 1).select(
        "query_id", "neighbor_id"
    )
    a = approx.select(
        "query_id", "neighbor_id", F.col("rank").alias("approx_rank")
    )
    return top1.join(a, ["query_id", "neighbor_id"], "left").select(
        "query_id",
        F.coalesce(F.col("approx_rank"), F.lit(0))
        .cast("bigint")
        .alias("top1_rank_in_approx"),
        F.when(
            F.col("approx_rank").isNotNull(),
            F.floor(
                F.lit(1_000_000.0) / F.col("approx_rank").cast("double")
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rr_scaled"),
    )


def _rank_quality_oracle_vs_exact(approx_name: str):
    """Lazy-oracle factory for the rank-quality rows — composed from
    the two REGISTERED oracles exactly like :func:`_recall_oracle_vs_exact`."""

    def build() -> str:
        from ..plans.registry import REGISTRY, resolve_oracle

        brute = resolve_oracle(REGISTRY["similarity_ann_cosine_topk"])
        approx = resolve_oracle(REGISTRY[approx_name])
        return f"""
SELECT e.query_id,
       CAST(COALESCE(a.rank, 0) AS BIGINT) AS top1_rank_in_approx,
       CASE WHEN a.rank IS NOT NULL
            THEN CAST(FLOOR(CAST(1000000 AS DOUBLE)
                 / CAST(a.rank AS DOUBLE)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS rr_scaled
FROM (SELECT query_id, neighbor_id FROM ({brute}) WHERE rank = 1) e
LEFT JOIN ({approx}) a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
"""

    return build


@register(
    "similarity_funnel_mrr_vs_exact",
    # r20 (VERDICT r19 missing #1, second half: "the lexical eval
    # metrics don't run over ANN rankings at all"): reciprocal rank of
    # the exact top-1 neighbor inside the production funnel's served
    # ranking — the rank-sensitive companion of the set-recall row.
    # Oracle composed from the two registered oracles. Pytest-only
    # (rotation candidate once proven).
    oracle=_rank_quality_oracle_vs_exact("similarity_ivf_binary_funnel_topk"),
    driver_facing=False,
)
def similarity_funnel_mrr_vs_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query reciprocal rank (scaled) of the exact top-1 neighbor
    within ``similarity_ivf_binary_funnel_topk``'s ranking — both sides
    from the registered builders."""
    from ..plans.registry import REGISTRY

    return ann_rank_quality_vs_exact(
        REGISTRY["similarity_ann_cosine_topk"].build(spark, sf_dir),
        REGISTRY["similarity_ivf_binary_funnel_topk"].build(spark, sf_dir),
    )


@register(
    "similarity_quantized_recall_at_k",
    # r20 (VERDICT r19 missing #1): measured recall of the quantized
    # scale path (IVF multi-probe over int8 payloads) against
    # brute-force ground truth — quantifies what the 4x byte reduction
    # costs in ranking quality, per query, with a composed bit-exact
    # oracle. Pytest-only (rotation candidate once proven).
    oracle=_recall_oracle_vs_exact("similarity_ivf_quantized_topk"),
    driver_facing=False,
)
def similarity_quantized_recall_at_k(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query recall@{TOP_K} of ``similarity_ivf_quantized_topk``
    vs the exact brute-force ground truth — both sides from the
    registered builders."""
    return _recall_row_vs_exact(
        spark, sf_dir, "similarity_ivf_quantized_topk"
    )


# --------------------------------------------------------------------------
def linear_score_expr(emb, weights: list[int]) -> F.Column:
    """Expression-path linear score: in-order fold dot(emb, w)."""
    warr = F.array(*[F.lit(w) for w in weights])
    return F.aggregate(
        F.zip_with(emb, warr, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def make_linear_score_udf(weights: list[int]):
    """Arrow-batched pandas_udf twin of ``linear_score_expr``: the model-
    scoring hot path when the model is Python-side (sklearn/torch exports).
    Vectorized ACROSS the batch (one numpy op per dimension), but summed
    IN ARRAY ORDER per row — the same left fold as the SQL expression and
    DuckDB's list_reduce, so all three engines produce bit-identical IEEE
    doubles and the query is hash-checkable against its oracle. (A plain
    ``mat @ w`` matmul is marginally faster but reorders the summation
    SIMD-style, which costs the exact-parity guarantee for ~nothing: the
    per-dimension loop is still 100% numpy, zero per-row Python.)"""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    w = np.asarray(weights, dtype=np.float64)

    def score(emb):
        mat = np.vstack(emb.to_numpy()).astype(np.float64)  # (batch, dim)
        acc = np.zeros(mat.shape[0], dtype=np.float64)
        for j in range(w.shape[0]):  # left fold in array order, like the SQL
            acc += mat[:, j] * w[j]
        return pd.Series(acc)

    # real annotation objects: the module-level `from __future__ import
    # annotations` would stringify inline hints, which pyspark's type-hint
    # inspection cannot resolve
    score.__annotations__ = {"emb": pd.Series, "return": pd.Series}
    return pandas_udf("double")(score)


def _pandas_linear_oracle() -> str:
    dot = _duck_dot_lit("embedding", HYPERPLANES[0])
    return f"SELECT vec_id, {dot} AS score FROM embeddings"


@register(
    "similarity_pandas_linear_scores",
    driver_facing=False,  # r10 rotation: driver-green r≤9, pytest oracle retained
    oracle=_pandas_linear_oracle,
)
def similarity_pandas_linear_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    udf = make_linear_score_udf(HYPERPLANES[0])
    return emb.select("vec_id", udf(F.col("embedding")).alias("score"))


# --------------------------------------------------------------------------
@register(
    "similarity_cosine_pairs",
    driver_facing=False,  # O(N^2) recall baseline; production path is similarity_near_dup_pairs
    oracle=f"""
WITH pairs AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_DUCK_DOT.format(a="a.embedding", b="b.embedding", dim=DIM)}
             / ({_DUCK_NORM.format(e="a.embedding")} * {_DUCK_NORM.format(e="b.embedding")})
             AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine
FROM pairs WHERE cosine >= 0.45
""",
)
def similarity_cosine_pairs(
    spark: SparkSession, sf_dir: str, *, allow_large: bool = False
) -> DataFrame:
    """Brute-force all-pairs cosine — the RECALL BASELINE the bucketed
    near-dup path (``similarity_near_dup_pairs``) is measured against.
    O(N^2) non-equi join by construction: keep for ground truth at small
    scale, never the registered path for production near-dup. Refuses
    inputs above BASELINE_ROW_LIMIT unless ``allow_large=True`` — the
    small-corpus-only contract is executable, not advisory."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    if not allow_large:
        require_small(emb, BASELINE_ROW_LIMIT, "similarity_cosine_pairs")
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        _norm(F.col("embedding")).alias("a_nrm"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        _norm(F.col("embedding")).alias("b_nrm"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = (
        _dot(F.col("a_emb"), F.col("b_emb"))
        / (F.col("a_nrm") * F.col("b_nrm"))
    ).alias("cosine")
    return pairs.select("vec_a", "vec_b", cos).filter(F.col("cosine") >= 0.45)


# --------------------------------------------------------------------------
def _band_key_expr(emb, band: int) -> F.Column:
    """BAND_BITS sign bits of band ``band`` packed into one INT."""
    total = F.lit(0)
    for b in range(BAND_BITS):
        dot = _dot_lit(emb, ND_PLANES[band * BAND_BITS + b])
        total = total + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return total


def _duck_band_key(e: str, band: int) -> str:
    parts = []
    for b in range(BAND_BITS):
        dot = _duck_dot_lit(e, ND_PLANES[band * BAND_BITS + b])
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def _duck_nd_bands() -> str:
    selects = [
        f"SELECT vec_id, {j} AS band, {_duck_band_key('embedding', j)} AS bkey FROM embeddings"
        for j in range(N_BANDS)
    ]
    return " UNION ALL ".join(selects)


@register(
    "similarity_near_dup_pairs",
    oracle=f"""
WITH bands AS ({_duck_nd_bands()}),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
),
scored AS (
    SELECT c.vec_a, c.vec_b,
           {_DUCK_DOT.format(a="ea.embedding", b="eb.embedding", dim=DIM)}
             / ({_DUCK_NORM.format(e="ea.embedding")} * {_DUCK_NORM.format(e="eb.embedding")})
             AS cosine
    FROM cand c
    JOIN embeddings ea ON c.vec_a = ea.vec_id
    JOIN embeddings eb ON c.vec_b = eb.vec_id
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= 0.45
""",
)
def similarity_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, banded-LSH-composed (the
    brute-force form above is its recall baseline). Candidates come from
    an EQUI-join on (band, band_key) exactly like the minhash LSH pair
    flow: 8 bands x 2 sign bits give ~0.99 per-pair recall at the 0.45
    threshold, and exact cosine verifies and thresholds. Banding (OR
    across bands) rather than one concatenated bucket is what makes LSH
    recall tunable — the single 8-bit bucket form has ~3% recall at this
    threshold. The plan contains no nested-loop over the full table —
    asserted in plan-shape tests.

    SCALE CAVEAT (round-8 measurement, PERFORMANCE.md): 2-bit bands mean
    4 buckets per band, so the candidate set grows ~n^2/4 (measured 4.0M
    candidates at n=2k, 401M at n=20k). That coarseness is what ~0.99
    recall at a LOW threshold like 0.45 requires — inherent to LSH, not
    a plan defect — so this form is right up to ~10^4-10^5 vectors.
    Production DEDUP thresholds (0.9+) use ``near_dup_pairs_scaled``
    below (8-bit bands, 27x fewer candidates measured, bits grow with
    corpus size); 0.45-level retrieval is the IVF top-k operators' job."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    bands = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _band_key_expr(F.col("embedding"), j).alias("bkey"),
                    )
                    for j in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.bkey")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    # Per-VECTOR norms, computed below the join (r22, guide §1.2 "don't
    # compute things twice"): the old projection evaluated _norm twice
    # per candidate PAIR (~4M pairs at sf0.1) — Catalyst does not factor
    # per-side subexpressions below a join on its own. Moving the norm
    # into each side's select evaluates it once per vector (n rows, not
    # n^2/4): the norm value for a given embedding is the identical
    # expression on identical input, and the cosine keeps the exact
    # operand order dot / (na * nb), so results are bit-identical.
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        _norm(F.col("embedding")).alias("a_nrm"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        _norm(F.col("embedding")).alias("b_nrm"),
    )
    cos = (
        _dot(F.col("a_emb"), F.col("b_emb"))
        / (F.col("a_nrm") * F.col("b_nrm"))
    ).alias("cosine")
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cos)
        .filter(F.col("cosine") >= 0.45)
    )


# --------------------------------------------------------------------------
#: Cosine threshold shared by the pair emitter above and the component
#: labeling below (the reference's near-dup flows stop at pairs; clustering
#: to a canonical representative is the standard next step of an
#: embedding-dedup pipeline — reference tie: the dedup intent of
#: olap_queries.sql's DISTINCT flows, extended per SURVEY §2 north-star).
ND_COSINE_MIN = 0.45


@register(
    "similarity_embed_components",
    driver_facing=False,  # driver window is full; oracle-gated in pytest
    oracle=lambda: f"""
WITH RECURSIVE bands AS ({_duck_nd_bands()}),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
),
verified AS (
    SELECT c.vec_a, c.vec_b
    FROM cand c
    JOIN embeddings ea ON c.vec_a = ea.vec_id
    JOIN embeddings eb ON c.vec_b = eb.vec_id
    WHERE {_DUCK_DOT.format(a="ea.embedding", b="eb.embedding", dim=DIM)}
          / ({_DUCK_NORM.format(e="ea.embedding")} * {_DUCK_NORM.format(e="eb.embedding")})
          >= {ND_COSINE_MIN}
),
edges AS (
    SELECT vec_a AS src, vec_b AS dst FROM verified
    UNION ALL
    SELECT vec_b AS src, vec_a AS dst FROM verified
),
reach(vec_id, seen) AS (
    SELECT vec_id, vec_id AS seen FROM embeddings
    UNION
    SELECT r.vec_id, e.dst AS seen
    FROM reach r JOIN edges e ON e.src = r.seen
)
SELECT vec_id, MIN(seen) AS component_id,
       vec_id = MIN(seen) AS is_canonical
FROM reach
GROUP BY vec_id
""",
)
def similarity_embed_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate CLUSTERS: label every vector with
    the smallest vec_id reachable through verified cosine>=0.45 pairs and
    flag the canonical representative a dedup pipeline keeps (drop
    ``NOT is_canonical`` rows, or keep the highest-quality member by
    joining quality scores on component_id).

    Composition, all production-shaped: banded-LSH candidate generation +
    exact-cosine verification (``similarity_near_dup_pairs``) feeds
    alternating large-star/small-star components
    (``connected_components_star`` — O(log^2 n) rounds proven, ~log n
    observed, constant per-round plan via localCheckpoint), so the whole
    flow is equi-joins and groupBys end to end — no nested loop at any
    scale. Oracle computes the same fixpoint as a DuckDB recursive CTE."""
    from .dedup import connected_components_star

    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    edges = similarity_near_dup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = connected_components_star(emb.select(F.col("vec_id").alias("doc_id")), edges)
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# Scale-path near-dup: wide bands for HIGH similarity thresholds.
#
# Round-8 measurement (PERFORMANCE.md): the registered 0.45-threshold
# banding above uses 2-bit bands — only 4 buckets per band — because at
# p_bit(0.45) ~ 0.65 that coarseness is what ~0.99 recall REQUIRES. The
# price is candidate density: ~n^2/4 pairs per band (measured 4.0M
# candidates at n=2k, 401M at n=20k — quadratic). That is inherent to
# LSH at low similarity thresholds (the p1/p2 gap is too small), not an
# implementation defect: 0.45-cosine detection is similarity SEARCH
# (use the IVF top-k operators), not deduplication.
#
# Production near-dup dedup works at HIGH thresholds (0.9+), where the
# same banding with 8-bit bands (256 buckets each) is subquadratic:
# background pairs collide in a band with probability ~p_rand^8 (~2^-8
# for uncorrelated vectors), so candidates ~ L * n^2 / 512 while
# p_bit(0.9) ~ 0.857 keeps per-pair recall at 1-(1-0.857^8)^16 ~ 0.996.
# The synthetic corpus has no pairs above cosine 0.6 (so a registered
# table query would be trivially empty); the operator takes any
# embedding frame and is proven on planted near-duplicates plus a
# direct DuckDB differential in tests/test_similarity.py.
HI_THRESHOLD = 0.9
HI_BANDS = 16
HI_BAND_BITS = 8
HI_PLANES = _hyperplanes(HI_BANDS * HI_BAND_BITS)


def _band_key_expr_wide(emb, band: int) -> F.Column:
    """HI_BAND_BITS sign bits of wide band ``band`` packed into one INT."""
    total = F.lit(0)
    for b in range(HI_BAND_BITS):
        dot = _dot_lit(emb, HI_PLANES[band * HI_BAND_BITS + b])
        total = total + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return total


def duck_band_key_wide(e: str, band: int) -> str:
    """DuckDB twin of ``_band_key_expr_wide`` (differential tests)."""
    parts = []
    for b in range(HI_BAND_BITS):
        dot = _duck_dot_lit(e, HI_PLANES[band * HI_BAND_BITS + b])
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def near_dup_pairs_scaled(
    emb: DataFrame, threshold: float = HI_THRESHOLD
) -> DataFrame:
    """High-threshold near-duplicate pairs over ANY (vec_id, embedding)
    frame — the 100 TB path: 16 bands x 8 sign bits (256 buckets per
    band, buckets shrink as 2^bits, a build-time knob) feed the same
    bucket equi-join + exact-cosine verify as the registered operator,
    with subquadratic candidates at production thresholds. Returns
    (vec_a, vec_b, cosine) with cosine >= threshold."""
    bands = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        _band_key_expr_wide(F.col("embedding"), j).alias("bkey"),
                    )
                    for j in range(HI_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band", "bk.bkey")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        _norm(F.col("embedding")).alias("a_nrm"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        _norm(F.col("embedding")).alias("b_nrm"),
    )
    cos = (
        _dot(F.col("a_emb"), F.col("b_emb"))
        / (F.col("a_nrm") * F.col("b_nrm"))
    ).alias("cosine")
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cos)
        .filter(F.col("cosine") >= threshold)
    )


def embed_components_scaled(
    emb: DataFrame, threshold: float = HI_THRESHOLD
) -> DataFrame:
    """Scale-path embedding dedup end to end: wide-band candidate pairs
    (``near_dup_pairs_scaled``) -> exact-cosine verify -> large-star/
    small-star components. Same output contract as the registered
    ``similarity_embed_components`` (vec_id, component_id, is_canonical)
    but subquadratic candidate generation at production thresholds, so
    the whole chain holds at corpus scale. Proven on planted duplicate
    CLUSTERS (k noisy copies per base must land in one component) in
    tests/test_similarity.py."""
    from .dedup import connected_components_star

    edges = near_dup_pairs_scaled(emb, threshold).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = connected_components_star(
        emb.select(F.col("vec_id").alias("doc_id")), edges
    )
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        "component_id",
        (F.col("doc_id") == F.col("component_id")).alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# int8 scalar quantization: the memory/bandwidth scale lever for ANN.
# Per-vector symmetric quantization (scale = max|x_i|, q_i = round(127*x/scale))
# shrinks fp32 embeddings 4x; at 100 TB the candidate scan is bandwidth-bound,
# so the quantized representation is what the production IVF cells would
# store, with exact re-scoring of the shortlist only. Registered here as the
# quantized BRUTE-FORCE twin of similarity_ann_cosine_topk so its ranking
# error is measurable (tests pin recall@k against the exact baseline);
# compose with similarity_ivf_multiprobe_topk for the scale path.

_DUCK_Q8 = """
qbase AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
    FROM embeddings
),
q8 AS (
    SELECT vec_id, scale,
           list_transform(embedding,
               x -> CASE WHEN scale = 0
                         THEN CAST(0 AS BIGINT)
                         ELSE CAST(round((x::DOUBLE * 127.0) / scale)
                                   AS BIGINT) END) AS qvec
    FROM qbase
)
"""


def _int_dot(a, b) -> F.Column:
    """Integer dot of two int8-quantized BIGINT vectors (left fold from
    a BIGINT zero; shared by the quantized operators and ann_index —
    kept as the HOF fold, see the kernel-unrolling negative result)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _qdot_expr() -> F.Column:
    return _int_dot("q_qvec", "c_qvec")


def _q8_frame(emb: DataFrame) -> DataFrame:
    """The int8 quantization frame (vec_id, embedding, scale, qvec) —
    the single DataFrame-side definition both quantized operators build
    on, mirroring the shared ``_DUCK_Q8`` on the oracle side."""
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    base = emb.select("vec_id", "embedding", scale.alias("scale"))
    qvec = F.transform(
        "embedding",
        lambda x: F.when(F.col("scale") == 0.0, F.lit(0).cast("bigint")).otherwise(
            F.round((x.cast("double") * 127.0) / F.col("scale")).cast("bigint")
        ),
    )
    return base.select("vec_id", "embedding", "scale", qvec.alias("qvec"))


@register(
    "similarity_quantized_topk",
    driver_facing=False,  # driver window is full; oracle-gated in pytest
    oracle=f"""
WITH {_DUCK_Q8},
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, {DIM}),
                              i -> q.qvec[i] * c.qvec[i])),
               (x, y) -> x + y) AS qdot,
           q.scale AS q_scale, c.scale AS c_scale
    FROM q8 q JOIN q8 c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
),
ranked AS (
    SELECT query_id, neighbor_id, qdot,
           ((qdot * q_scale) * c_scale) / 16129.0 AS approx_dot,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY ((qdot * q_scale) * c_scale) DESC,
                                              neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, qdot, approx_dot, rank
FROM ranked WHERE rank <= {TOP_K}
""",
)
def similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by int8-quantized dot product. The integer accumulation
    (|q_i| <= 127, so any realistic dim keeps partial sums far inside
    int64) is EXACT, and the de-quantized score is one multiply chain of
    bit-identical doubles — so unlike float-sum ANN scores, the whole
    result is engine-portable and oracle-checkable. Zero-vector guard:
    scale 0 quantizes to the zero vector instead of dividing by zero."""
    prepare(spark)
    q8 = _q8_frame(spread(spark, table(spark, sf_dir, "embeddings")))
    q = q8.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("qvec").alias("q_qvec"),
    )
    c = q8.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("scale").alias("c_scale"),
        F.col("qvec").alias("c_qvec"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    qdot = _qdot_expr()
    # one multiply chain, same association as the oracle: (qdot*q_scale)*c_scale
    scored = pairs.withColumn("qdot", qdot).select(
        "query_id",
        "neighbor_id",
        "qdot",
        ((F.col("qdot").cast("double") * F.col("q_scale")) * F.col("c_scale"))
        .alias("scaled"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("scaled"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "qdot",
            (F.col("scaled") / 16129.0).alias("approx_dot"),
            "rank",
        )
    )


# --------------------------------------------------------------------------
def _ivf_quantized_oracle() -> str:
    """Lazy (trained centroids interpolate at first access, not import)."""
    return f"""
WITH assigned AS (
    SELECT vec_id, {_duck_ivf_cluster("embedding")} AS cluster_id
    FROM embeddings
),
{_DUCK_Q8.strip()},
a8 AS (
    SELECT a.vec_id, a.cluster_id, s.scale, s.qvec
    FROM assigned a JOIN q8 s USING (vec_id)
),
qp AS (
    SELECT vec_id, unnest({_duck_ivf_probes("embedding")}) AS probe
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
qq AS (
    SELECT qp.vec_id, qp.probe, s.scale AS q_scale, s.qvec AS q_qvec
    FROM qp JOIN q8 s ON s.vec_id = qp.vec_id
),
pairs AS (
    SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, {DIM}),
                              i -> qq.q_qvec[i] * c.qvec[i])),
               (x, y) -> x + y) AS qdot,
           qq.q_scale, c.scale AS c_scale
    FROM qq JOIN a8 c ON c.cluster_id = qq.probe AND c.vec_id <> qq.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, qdot,
           ((qdot * q_scale) * c_scale) / 16129.0 AS approx_dot,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY ((qdot * q_scale) * c_scale) DESC,
                                              neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, qdot, approx_dot, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_ivf_quantized_topk",
    oracle=_ivf_quantized_oracle,
)
def similarity_ivf_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two ANN scale levers COMPOSED, exactly as a production index
    stores them: IVF multi-probe restricts candidates to P/K_IVF of the
    corpus (cluster equi-join, no nested loop), and each cell holds the
    int8-quantized payload, so the candidate scan reads 4x fewer bytes
    and scores with exact-integer dot products. Ranking uses the
    de-quantized score; results stay engine-portable like both parents
    (integer qdot + one deterministic multiply chain). Recall vs the
    exact-cosine multi-probe parent is pytest-pinned."""
    prepare(spark)
    q8 = _q8_frame(spread(spark, table(spark, sf_dir, "embeddings")))
    a8 = q8.select(
        F.col("vec_id").alias("neighbor_id"),
        _ivf_cluster_expr(F.col("embedding")).alias("cluster_id"),
        F.col("scale").alias("c_scale"),
        F.col("qvec").alias("c_qvec"),
    )
    qp = q8.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("q_scale"),
        F.col("qvec").alias("q_qvec"),
        F.explode(_ivf_probes_expr(F.col("embedding"))).alias("probe"),
    )
    pairs = a8.join(
        F.broadcast(qp),
        (F.col("cluster_id") == F.col("probe"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    qdot = _qdot_expr()
    scored = pairs.withColumn("qdot", qdot).select(
        "query_id",
        "neighbor_id",
        "qdot",
        ((F.col("qdot").cast("double") * F.col("q_scale")) * F.col("c_scale"))
        .alias("scaled"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("scaled"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "qdot",
            (F.col("scaled") / 16129.0).alias("approx_dot"),
            "rank",
        )
    )


# --------------------------------------------------------------------------
# Binary (sign) quantization: 64-dim float vector -> 64 BITS, packed into
# two 32-bit words carried as BIGINTs. The cheapest ANN representation
# there is — hamming distance over packed words is a couple of xor+popcount
# instructions per candidate, ~100x cheaper than a float dot product, and
# the linear scan over bit-packed words IS the production fast path
# (binary pre-filter, exact re-rank of survivors). Both engines compute
# identical INTEGER words (same sign predicate, same power-of-two
# literals), so the whole top-k — distances, ranks — is hash-exact.


def _sign_word_expr(emb, lo_bit: int, width: int = 32) -> F.Column:
    """Σ 2^j over dimensions [lo_bit, lo_bit+width) with value >= 0 —
    static unrolled CASE sum (no dynamic shifts; the HYPERPLANES
    unrolling precedent), fits comfortably in a BIGINT for width<=32."""
    from functools import reduce

    terms = [
        F.when(
            F.element_at(emb, lo_bit + j + 1).cast("double") >= 0.0,
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(width)
    ]
    return reduce(lambda a, b: a + b, terms)


def sign_quantize(emb_df: DataFrame) -> DataFrame:
    """(vec_id, w_lo, w_hi): the 64 sign bits of ``embedding`` packed into
    two 32-bit words (BIGINT-carried — no sign-bit overflow games)."""
    return emb_df.select(
        "vec_id",
        _sign_word_expr(F.col("embedding"), 0).alias("w_lo"),
        _sign_word_expr(F.col("embedding"), 32).alias("w_hi"),
    )


def _duck_sign_word(e: str, lo_bit: int, width: int = 32) -> str:
    terms = " + ".join(
        f"(CASE WHEN {e}[{lo_bit + j + 1}]::DOUBLE >= 0.0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)"
        for j in range(width)
    )
    return f"({terms})"


def _binary_hamming_oracle() -> str:
    return f"""
WITH words AS (
    SELECT vec_id,
           {_duck_sign_word("embedding", 0)} AS w_lo,
           {_duck_sign_word("embedding", 32)} AS w_hi
    FROM embeddings
),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(bit_count(xor(c.w_lo, q.w_lo))
                + bit_count(xor(c.w_hi, q.w_hi)) AS INT) AS hamming
    FROM words c JOIN words q
      ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, hamming,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY hamming, neighbor_id
           ) AS INT) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, hamming, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_binary_hamming_inline",
    # Self-contained inline twin of the stored serving form below —
    # quantizes the corpus inside the query plan. Kept as the pytest
    # cross-check (stored == inline bit-for-bit) and the one-shot
    # analytical shape; the driver-facing row serves from the index.
    driver_facing=False,
    oracle=_binary_hamming_oracle,
)
def similarity_binary_hamming_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by hamming distance over sign-quantized embeddings: the
    bit-packed linear scan (broadcast query words, xor+popcount per
    candidate — integer-exact cross-engine, ties to the lower
    neighbor_id). Recall vs the exact cosine baseline is pytest-pinned;
    the production composition re-ranks these survivors with exact
    scores, which is ``similarity_ann_cosine_topk``'s machinery applied
    to a candidate set instead of the corpus."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    words = sign_quantize(emb)
    q = words.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w_lo").alias("q_lo"),
        F.col("w_hi").alias("q_hi"),
    )
    pairs = words.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    ham = (
        F.bit_count(F.col("w_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("w_hi").bitwiseXOR(F.col("q_hi")))
    ).cast("int")
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        pairs.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            ham.alias("hamming"),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


#: Binary-prefilter width: survivors re-ranked exactly. 64 of ~500 at
#: sf0.01; at scale candidate_k stays constant while the corpus grows.
BINARY_CANDIDATE_K = 64


def _binary_rerank_oracle() -> str:
    cos = (
        _DUCK_DOT.format(a="q.embedding", b="c.embedding", dim=DIM)
        + f" / ({_DUCK_NORM.format(e='q.embedding')} * {_DUCK_NORM.format(e='c.embedding')})"
    )
    return f"""
WITH words AS (
    SELECT vec_id,
           {_duck_sign_word("embedding", 0)} AS w_lo,
           {_duck_sign_word("embedding", 32)} AS w_hi
    FROM embeddings
),
cand AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY bit_count(xor(c.w_lo, q.w_lo))
                            + bit_count(xor(c.w_hi, q.w_hi)), c.vec_id
               ) AS hrank
        FROM words c JOIN words q
          ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    ) WHERE hrank <= {BINARY_CANDIDATE_K}
),
scored AS (
    SELECT cand.query_id, cand.neighbor_id, {cos} AS cosine
    FROM cand
    JOIN embeddings q ON q.vec_id = cand.query_id
    JOIN embeddings c ON c.vec_id = cand.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_binary_rerank_inline",
    # Inline twin of the stored serving form (see hamming twin above).
    driver_facing=False,
    oracle=_binary_rerank_oracle,
)
def similarity_binary_rerank_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production binary-ANN composition, inline form: hamming
    prefilter over the packed sign words keeps BINARY_CANDIDATE_K
    survivors per query (xor+popcount linear scan — the cheap pass),
    exact cosine re-ranks only the survivors (the expensive pass runs on
    candidate_k rows per query, never the corpus). Same deterministic
    folds as the exact baseline, so scores and ranks are bit-identical
    cross-engine; recall recovery over the raw hamming top-k is
    pytest-pinned."""
    prepare(spark)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    words = sign_quantize(emb)
    q = words.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w_lo").alias("q_lo"),
        F.col("w_hi").alias("q_hi"),
    )
    ham = (
        F.bit_count(F.col("w_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("w_hi").bitwiseXOR(F.col("q_hi")))
    )
    hw = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    cand = (
        words.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            ham.alias("hamming"),
        )
        .withColumn("hrank", F.row_number().over(hw))
        .filter(F.col("hrank") <= BINARY_CANDIDATE_K)
        .select("query_id", "neighbor_id")
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_nrm"),
    )
    ce = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        _norm(F.col("embedding")).alias("c_nrm"),
    )
    scored = cand.join(F.broadcast(qe), "query_id").join(ce, "neighbor_id")
    cos = (
        _dot(F.col("q_emb"), F.col("c_emb"))
        / (F.col("q_nrm") * F.col("c_nrm"))
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
    )


# --------------------------------------------------------------------------
# Stored-form binary ANN (VERDICT r10 #2): the driver-facing rows serve
# from a PERSISTED index — packed sign words written once per vector by
# IvfVectorIndex._index_rows — instead of re-quantizing the corpus inside
# every query plan. PERFORMANCE.md measured the stored-words scan at 1.7×
# the inline speed and 15× smaller than the float table; the inline twins
# above remain registered (same oracles) as the self-contained pytest
# cross-check, and stored == inline is pinned bit-for-bit in
# tests/test_ann_index.py.

#: Served-index state per sf_dir: the index is built ONCE per process
#: (batch 0 ingest into a temp-dir VersionedParquetTable) and every
#: stored-form query in the same session reads it — the serving
#: lifecycle in miniature. The driver's fresh process builds on first
#: touch (sub-second at its sf0.01 gate). Lifecycle (first-touch lock —
#: advisor finding r11 — atexit cleanup, mtime staleness token,
#: refresh_table hook — VERDICT r12 #6) is the shared
#: :class:`~..io.ServingMemo`.
_SERVED_INDEX_MEMO = ServingMemo("dw-vector-index-", ["embeddings"])


def reset_served_indexes() -> None:
    """Drop (and delete) every memoized served index. The in-process
    rewrite case is handled automatically (mtime guard + refresh_table
    hook); this remains the blanket escape hatch."""
    _SERVED_INDEX_MEMO.reset()


def served_vector_index(spark: SparkSession, sf_dir: str):
    """The session's stored vector index over ``sf_dir``'s embeddings
    (build-on-first-use, then reads only). A changed source mtime
    (in-process rewrite of embeddings.parquet) rebuilds the index
    instead of serving it stale; :func:`reset_served_indexes` remains
    the blanket escape hatch."""
    from .ann_index import IvfVectorIndex

    def build(root: str) -> None:
        idx = IvfVectorIndex(root)
        idx.add_batch(
            spark,
            spread(spark, table(spark, sf_dir, "embeddings")),
            batch_id=0,
            app_id="served-index",
        )
        idx.snapshot_occupancy(spark)  # drift-monitor baseline

    return IvfVectorIndex(_SERVED_INDEX_MEMO.get_or_build(sf_dir, build))


@register(
    "similarity_binary_hamming_topk",
    # Stored serving form — reads packed words from the persisted index;
    # no sign arithmetic over the corpus in the query plan (plan-pinned).
    # Integer-exact, so the inline twin's oracle applies verbatim.
    driver_facing=False,  # r12 rotation: driver-green r11; the binary path
    # stays driver-checked via similarity_binary_rerank_topk and the
    # composed IVF+binary funnel row. Slot ceded to the r10-crop promotions.
    oracle=_binary_hamming_oracle,
)
def similarity_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by hamming distance served from STORED packed sign words
    (the index scan reads 2 BIGINTs per corpus row; only the broadcast
    query side touches float embeddings). Bit-identical to
    ``similarity_binary_hamming_inline`` — same oracle."""
    prepare(spark)
    idx = served_vector_index(spark, sf_dir)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    return idx.query_hamming_topk(
        spark, emb.filter(F.col("vec_id") < N_QUERIES)
    )


@register(
    "similarity_binary_rerank_topk",
    # Stored serving form of the hamming-prefilter + exact-re-rank
    # composition (see the inline twin's docstring for the algorithm).
    driver_facing=False,  # r12 rotation: driver-green r11; superseded in
    # the window by similarity_ivf_binary_funnel_topk, which runs this
    # row's two stages PLUS the IVF cell restriction in one query.
    oracle=_binary_rerank_oracle,
)
def similarity_binary_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary prefilter from the STORED index + exact cosine re-rank of
    the survivors against the float table (candidate_k × |Q| point
    lookups, never a corpus float scan). Bit-identical to
    ``similarity_binary_rerank_inline`` — same oracle."""
    prepare(spark)
    idx = served_vector_index(spark, sf_dir)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    return idx.query_binary_rerank_topk(
        spark, emb.filter(F.col("vec_id") < N_QUERIES), emb
    )


def _funnel_oracle() -> str:
    """Lazy (trained centroids interpolate at first access): the composed
    IVF→hamming→exact funnel, stated stage-for-stage in SQL."""
    cos = (
        _DUCK_DOT.format(a="q.embedding", b="c.embedding", dim=DIM)
        + f" / ({_DUCK_NORM.format(e='q.embedding')} * {_DUCK_NORM.format(e='c.embedding')})"
    )
    return f"""
WITH assigned AS (
    SELECT vec_id, {_duck_ivf_cluster("embedding")} AS cluster_id,
           {_duck_sign_word("embedding", 0)} AS w_lo,
           {_duck_sign_word("embedding", 32)} AS w_hi
    FROM embeddings
),
qp AS (
    SELECT vec_id, unnest({_duck_ivf_probes("embedding")}) AS probe,
           {_duck_sign_word("embedding", 0)} AS q_lo,
           {_duck_sign_word("embedding", 32)} AS q_hi
    FROM embeddings WHERE vec_id < {N_QUERIES}
),
cand AS (
    SELECT query_id, neighbor_id FROM (
        SELECT qp.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY qp.vec_id
                   ORDER BY bit_count(xor(c.w_lo, qp.q_lo))
                            + bit_count(xor(c.w_hi, qp.q_hi)), c.vec_id
               ) AS hrank
        FROM qp JOIN assigned c
          ON c.cluster_id = qp.probe AND c.vec_id <> qp.vec_id
    ) WHERE hrank <= {BINARY_CANDIDATE_K}
),
scored AS (
    SELECT cand.query_id, cand.neighbor_id, {cos} AS cosine
    FROM cand
    JOIN embeddings q ON q.vec_id = cand.query_id
    JOIN embeddings c ON c.vec_id = cand.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
           ) AS INT) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cosine, rank
FROM ranked WHERE rank <= {TOP_K}
"""


@register(
    "similarity_ivf_binary_funnel_topk",
    # r12 (VERDICT r11 #8): the FULL production serving funnel as one
    # driver row — IVF cell restriction, hamming prefilter over stored
    # words within the probed cells, exact re-rank of the survivors.
    # All three stages read the one persisted index; the oracle states
    # the same funnel in SQL (shared centroids => exact cross-engine).
    oracle=_funnel_oracle,
)
def similarity_ivf_binary_funnel_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-k neighbors through the composed serving funnel (see
    ``IvfVectorIndex.query_funnel_topk``): probe N_PROBES IVF cells,
    hamming-prefilter to BINARY_CANDIDATE_K survivors inside them using
    the index's packed sign words, exact-cosine re-rank the survivors
    against the float table. Recall vs the brute-force and
    ivf_quantized baselines is pytest-pinned (tests/test_ann_index.py);
    the corpus-side scan reads index columns only (plan-pinned)."""
    prepare(spark)
    idx = served_vector_index(spark, sf_dir)
    emb = spread(spark, table(spark, sf_dir, "embeddings"))
    return idx.query_funnel_topk(
        spark, emb.filter(F.col("vec_id") < N_QUERIES), emb
    )


def _drift_monitor_oracle() -> str:
    """Lazy (shared centroids interpolate at first access): the served
    index at the registered fixture has had no appends since its
    baseline snapshot, so base_n == cur_n == the assignment counts —
    which DuckDB recomputes independently from the embeddings, making
    this row a full cross-engine check of the IVF assignment itself."""
    return f"""
SELECT {_duck_ivf_cluster("embedding")} AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS base_n,
       CAST(COUNT(*) AS BIGINT) AS cur_n
FROM embeddings
GROUP BY 1
"""


@register(
    "similarity_index_drift_monitor",
    # r14 rotation IN (second swap): the drift monitor earns a driver row
    # (its oracle independently recomputes the IVF assignment counts);
    # dedup_minhash_lsh_pairs ceded.
    oracle=_drift_monitor_oracle,
)
def similarity_index_drift_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The cell-occupancy drift monitor over the served vector index
    (VERDICT r13 #5): per-cell ``(cluster_id, base_n, cur_n)`` against
    the baseline snapshot persisted when the index was built. The
    thresholded summary (integer-exact total-variation distance) is
    ``IvfVectorIndex.drift_stats``; its trip-on-drift /
    quiet-on-in-distribution contract is pinned on the planted drift
    fixture in tests/test_ann_index.py::test_drift_monitor_thresholds.
    Cost: one bounded agg over the index (≤ K cells out), no float
    scan, no corpus rescan."""
    prepare(spark)
    return served_vector_index(spark, sf_dir).occupancy_drift(spark)
