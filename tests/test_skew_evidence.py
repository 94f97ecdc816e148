"""Skew evidence for the 100 TB posture (round-3 task, VERDICT r4/r6):
the salting + AQE story must be *demonstrated* on a hot key, not just
stated. Three pieces of evidence, all deterministic:

1. ``salted_sum`` is exactly equal to the plain aggregation on a
   zipfian-hot corpus (parity — salting is invisible in the result);
2. salting actually balances the reduce side: the max rows any single
   hash partition owns drops by >= 4x when the hot key is salted — the
   row-count analog of tail-task time, measured through Spark's real
   hash partitioning (``repartition`` + ``spark_partition_id``), so
   this test FAILS if salting stops spreading the hot key;
3. AQE's skew-join split fires on a skewed sort-merge join (the join-
   side answer salting doesn't cover): the finalized adaptive plan
   carries the skew marker.

Plus the LSH-specific shape: a hot LSH bucket (a genuine 60-doc
near-dup clique, every band colliding) flows through the banded
pair join correctly — candidate generation stays an equi-join and
emits exactly C(60,2) clique pairs.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datawarehouse_project_spark.operators.skew import salted_sum


import pytest

# r22 fast-lane split, second pass (measured: the first fast lane still
# ran 16.5 min on this box — over the driver-timeout safety margin):
# this module's VALUE semantics are gated by the fast lane's sf0.001
# oracle-parity sweep; its deeper coverage runs in the slow lane
# (`pytest -m slow`, the round-end full sweep).
pytestmark = pytest.mark.slow

#: hot store 0 owns every even row (~50% of the corpus); the rest is
#: spread uniformly over 96 cold stores — the "one store takes half the
#: fact" shape salting exists for.
_N_COLD = 96


def _zipfian_fact(spark, n):
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") / 2).cast("long") % _N_COLD + 1)
        .alias("store_id"),
        (F.col("id") % 1000).cast("decimal(18,2)").alias("sale"),
        F.col("id").alias("row_id"),
    )


def test_salted_sum_parity_on_zipfian(spark):
    """Exact (decimal) equality of salted vs plain aggregation when one
    key owns half the corpus — parity must hold on skewed data, not just
    the uniform corpora every other test uses."""
    fact = _zipfian_fact(spark, 2_000_000)
    plain = {
        r["store_id"]: r["total"]
        for r in fact.groupBy("store_id")
        .agg(F.sum("sale").alias("total"))
        .collect()
    }
    salted = {
        r["store_id"]: r["total"]
        for r in salted_sum(
            fact, ["store_id"], F.col("sale"), n_salts=8,
            salt_on=F.col("row_id"),
        ).collect()
    }
    assert len(plain) == _N_COLD + 1
    assert salted == plain


def test_salting_balances_reduce_partitions(spark):
    """The mechanism itself: hash-partitioning on the bare key pins the
    hot key's ~50% of rows onto ONE partition (the critical-path reducer
    at scale); adding the salt to the partitioning key must cut the max
    per-partition row count by >= 4x (32 salts over 32 partitions; the
    floor is loose against balls-in-bins collisions among sub-keys —
    hash(key, salt) placement is uniform, not round-robin). Fails if
    salting stops helping."""
    n = 400_000
    fact = _zipfian_fact(spark, n)
    parts = 32

    def max_partition_rows(df, cols):
        counts = (
            df.repartition(parts, *[F.col(c) for c in cols])
            .groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        return max(r["cnt"] for r in counts)

    unsalted_max = max_partition_rows(fact, ["store_id"])
    salted = fact.withColumn("_salt", (F.abs(F.col("row_id")) % 32))
    salted_max = max_partition_rows(salted, ["store_id", "_salt"])

    # the hot key alone is n/2 rows; its partition holds at least that
    assert unsalted_max >= n // 2
    assert salted_max * 4 <= unsalted_max, (
        f"salting stopped helping: unsalted max {unsalted_max} rows/"
        f"partition vs salted max {salted_max}"
    )


def test_aqe_skew_join_split_fires(spark):
    """Join-side skew is AQE's job (salting covers aggregation): on a
    sort-merge join whose probe side has one partition ~100x the median,
    the finalized adaptive plan must carry the skew-split marker. Conf
    thresholds are lowered to make the sf-test-sized skew visible to the
    detector (production defaults: 256MB / factor 5) and restored after.
    """
    tuned = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k in tuned:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        # incompressible per-row pad so the hot partition's COMPRESSED
        # shuffle bytes clear the (lowered) skew threshold
        fact = _zipfian_fact(spark, 400_000).withColumn(
            "pad", F.sha2(F.col("row_id").cast("string"), 256)
        )
        dim = spark.range(_N_COLD + 1).select(
            F.col("id").alias("store_id"),
            F.concat(F.lit("store_"), F.col("id")).alias("store_name"),
        )
        joined = fact.join(dim, "store_id").select(
            "store_name", "sale", "pad"
        )
        # aggregate consumes pad AFTER the join so column pruning keeps
        # it in the fact-side shuffle; collect() executes THIS Dataset's
        # QueryExecution, finalizing its adaptive plan in place
        probe = joined.agg(
            F.sum(F.length("pad")).alias("pad_bytes"),
            F.sum("sale").alias("total"),
        )
        probe.collect()
        plan = probe._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "skewed" in plan.lower(), (
            "AQE skew-join split did not fire on a 50%-hot join key:\n"
            + plan[:4000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lsh_hot_bucket_clique_pairs(spark, tmp_path):
    """A hot LSH bucket — 60 identical docs, every band colliding — is a
    genuine near-dup cluster, the one shape where bucket fan-out is
    irreducible. The banded pair join must emit exactly C(60,2) = 1770
    clique pairs (all 8 minhashes matching), stay an equi-join (no
    cartesian product in the plan), and not disturb pairs for the
    unrelated filler corpus."""
    from datawarehouse_project_spark.operators.dedup import (
        dedup_minhash_lsh_pairs,
    )

    clique = 60
    filler = 200
    rows = []
    for i in range(clique):
        rows.append((i, "the same exact near duplicate document text", "en"))
    for i in range(filler):
        rows.append(
            (
                clique + i,
                f"unique filler words alpha{i} beta{i * 7} gamma{i * 13} "
                f"delta{i * 29} epsilon{i * 31}",
                "en",
            )
        )
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["synthetic"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))

    pairs = dedup_minhash_lsh_pairs(spark, str(tmp_path))
    assert "CartesianProduct" not in pairs._jdf.queryExecution().executedPlan().toString()
    got = pairs.filter(
        (F.col("doc_a") < clique) & (F.col("doc_b") < clique)
    )
    rows_out = got.collect()
    assert len(rows_out) == clique * (clique - 1) // 2
    assert all(r["n_matching_minhash"] == 8 for r in rows_out)


# --------------------------------------------------------------------------
# Sketch-driven differentiated join (r10): CMS hot-key detection + split.


def _skewed_frames(spark):
    """Left: one hot key carrying ~75% of rows + 100 cold keys; right: one
    payload row per key."""
    rows = [(7, i) for i in range(30_000)] + [
        (1000 + k, i) for k in range(100) for i in range(100)
    ]
    # deterministic row ids: derive from the data, not monotonic ids
    left = spark.createDataFrame(
        [(k, j) for j, (k, _) in enumerate(rows)], "k bigint, row_id bigint"
    )
    right = spark.createDataFrame(
        [(7, "hot-payload")] + [(1000 + k, f"cold-{k}") for k in range(100)],
        "k bigint, payload string",
    )
    return left, right


def test_detect_hot_keys_finds_planted_key_and_no_cold_ones(spark):
    from datawarehouse_project_spark.operators.skew import detect_hot_keys

    left, _ = _skewed_frames(spark)
    hot = [r.k for r in detect_hot_keys(left, "k", "row_id").collect()]
    assert hot == [7], hot  # the superset guarantee still excludes cold
    # keys here: CMS overestimate of a 100-row key is << 5% of 40k rows


def test_skew_split_join_equals_plain_join(spark):
    from datawarehouse_project_spark.operators.skew import (
        detect_hot_keys,
        skew_split_join,
    )

    left, right = _skewed_frames(spark)
    hot = detect_hot_keys(left, "k", "row_id")

    def canon(df):
        return sorted(map(repr, (tuple(r) for r in df.collect())))

    for how in ("inner", "left"):
        got = skew_split_join(left, right, "k", hot, how=how)
        want = left.join(right, "k", how)
        assert canon(got) == canon(want), how
    # the hot path actually broadcasts
    plan = (
        skew_split_join(left, right, "k", hot)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_skew_split_join_left_rows_with_unmatched_and_null_keys(spark):
    """Left rows whose key matches nothing survive a left join through
    the cold path; NULL keys never match (standard equi-join semantics)
    on either path."""
    from datawarehouse_project_spark.operators.skew import skew_split_join

    left = spark.createDataFrame(
        [(7, 1), (None, 2), (999999, 3)], "k bigint, row_id bigint"
    )
    right = spark.createDataFrame([(7, "x")], "k bigint, payload string")
    hot = spark.createDataFrame([(7,)], "k bigint")
    got = sorted(
        (
            (r.k, r.row_id, r.payload)
            for r in skew_split_join(left, right, "k", hot, how="left").collect()
        ),
        key=repr,
    )
    want = sorted(
        (
            (r.k, r.row_id, r.payload)
            for r in left.join(right, "k", "left").collect()
        ),
        key=repr,
    )
    assert got == want


def _planted_sf_dir(spark, path: str, n_rows: int = 40_000, hot_frac: float = 0.3):
    """A miniature sf_dir (lineitem/supplier/nation parquet) where
    supplier 1 owns ``hot_frac`` of lineitem — the planted-hot-key
    fixture the registered split-join row can run on verbatim."""
    n_sup = 50
    hot_every = int(1 / hot_frac)
    li = spark.range(n_rows).select(
        F.col("id").alias("l_orderkey"),
        F.lit(1).alias("l_linenumber"),
        F.when(F.col("id") % hot_every == 0, F.lit(1))
        .otherwise(F.col("id") % (n_sup - 1) + 2)
        .cast("long")
        .alias("l_suppkey"),
        ((F.col("id") % 997) + 1).cast("double").alias("l_extendedprice"),
    )
    sup = spark.range(1, n_sup + 1).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        (F.col("id") % 5).cast("long").alias("s_nationkey"),
    )
    nat = spark.range(5).select(
        F.col("id").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
    )
    os.makedirs(path, exist_ok=True)
    li.write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    sup.write.mode("overwrite").parquet(f"{path}/supplier.parquet")
    nat.write.mode("overwrite").parquet(f"{path}/nation.parquet")


def test_registered_split_join_row_on_planted_hot_supplier(spark, tmp_path):
    """The registered ``skew_split_supplier_revenue`` pipeline on a
    corpus where one supplier owns 30% of the fact: (1) the detector
    flags exactly that supplier at HOT_FRAC=5%; (2) the hot path carries
    real rows through a BroadcastHashJoin while the long tail shuffles;
    (3) the result equals the plain join bit-for-bit — the split is
    invisible. This is the skewed-fixture evidence for the driver row,
    which at the driver's uniform sf runs the same plan with an empty
    hot set."""
    from datawarehouse_project_spark.catalog import all_queries
    from datawarehouse_project_spark.io import table
    from datawarehouse_project_spark.operators.skew import (
        HOT_FRAC,
        detect_hot_keys,
    )

    sf = str(tmp_path / "planted")
    _planted_sf_dir(spark, sf)

    li = table(spark, sf, "lineitem").select(
        "l_suppkey",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("row_id"),
    )
    hot = [r.l_suppkey for r in detect_hot_keys(
        li, "l_suppkey", "row_id", min_frac=HOT_FRAC
    ).collect()]
    assert hot == [1], hot

    got = all_queries()["skew_split_supplier_revenue"](spark, sf)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

    plain = (
        table(spark, sf, "lineitem")
        .join(
            table(spark, sf, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            table(spark, sf, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("store_name"),
            F.col("s_name").alias("supplier_name"),
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_sales"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )
    canon = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert canon(got) == canon(plain)
    # the hot supplier's rows actually flowed through the pipeline
    hot_rows = [r for r in got.collect() if r.supplier_name == "Supplier#1"]
    assert hot_rows and hot_rows[0].n_items == 13334  # every 3rd of 40k


def test_detect_hot_keys_candidates_universe_matches_sampling(spark):
    """VERDICT r12 #4: a caller-supplied bounded key universe (the dim
    side) replaces the fact-row sample — same hot set, and the returned
    hot-keys plan contains NO scan of the fact at all (counters are
    checkpointed, candidates come from the universe)."""
    from datawarehouse_project_spark.operators.skew import detect_hot_keys

    left, _ = _skewed_frames(spark)
    universe = spark.range(0, 2000).select(F.col("id").alias("k"))
    via_universe = detect_hot_keys(left, "k", candidates=universe)
    assert [r.k for r in via_universe.collect()] == [7]
    sampled = [r.k for r in detect_hot_keys(left, "k", "row_id").collect()]
    assert sampled == [7]


def test_detect_hot_keys_requires_row_id_or_candidates(spark):
    import pytest as _pytest

    from datawarehouse_project_spark.operators.skew import detect_hot_keys

    left, _ = _skewed_frames(spark)
    with _pytest.raises(ValueError, match="row_id"):
        detect_hot_keys(left, "k")


def test_registered_split_row_plans_two_fact_scans_only(spark):
    """VERDICT r12 #4 'done' gate: the registered row's final plan scans
    lineitem exactly twice — the hot/cold semi+anti split itself — with
    the sizing count folded into the (checkpointed) CMS pass and the
    candidate universe taken from the supplier dim, so neither sizing,
    sketching, nor candidate generation adds a fact scan."""
    from datawarehouse_project_spark.catalog import all_queries

    df = all_queries()["skew_split_supplier_revenue"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 2, plan.count("lineitem.parquet")


def test_detect_hot_keys_accepts_precomputed_n_total(spark):
    """VERDICT r10 #4: passing n_total skips the sizing scan and yields
    the same hot set as the self-counted path."""
    from datawarehouse_project_spark.operators.skew import detect_hot_keys

    fact = _zipfian_fact(spark, 100_000)
    self_counted = sorted(
        r.store_id for r in detect_hot_keys(fact, "store_id", "row_id").collect()
    )
    supplied = sorted(
        r.store_id
        for r in detect_hot_keys(
            fact, "store_id", "row_id", n_total=100_000
        ).collect()
    )
    assert supplied == self_counted == [0]
