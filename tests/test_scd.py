"""SCD Type 2, temperature mixing, and int8-quantization invariants —
properties the DuckDB parity tests can't state (they pin values; these
pin the SEMANTICS the values must obey)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datawarehouse_project_spark.catalog import all_queries


import pytest

# r22 fast-lane split, second pass (measured: the first fast lane still
# ran 16.5 min on this box — over the driver-timeout safety margin):
# this module's VALUE semantics are gated by the fast lane's sf0.001
# oracle-parity sweep; its deeper coverage runs in the slow lane
# (`pytest -m slow`, the round-end full sweep).
pytestmark = pytest.mark.slow

_Q = all_queries()


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    """Per user: versions are 1..n dense, intervals are contiguous
    (valid_to == next valid_from), non-overlapping, and exactly one row
    is current (the open interval)."""
    hist = _Q["scd2_user_state_history"](spark, sf_dir).cache()
    try:
        # exactly one open interval per user
        cur = (
            hist.groupBy("user_id")
            .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
            .filter(F.col("n_cur") != 1)
            .count()
        )
        assert cur == 0
        # dense versions starting at 1
        dense = (
            hist.groupBy("user_id")
            .agg(
                F.min("version").alias("lo"),
                F.max("version").alias("hi"),
                F.count("*").alias("n"),
            )
            .filter((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
            .count()
        )
        assert dense == 0
        # contiguity: valid_to of version v == valid_from of version v+1
        # shift the NEXT row's valid_from back onto version v
        nxt = hist.select(
            "user_id",
            (F.col("version") - 1).alias("version"),
            F.col("valid_from").alias("next_from"),
        )
        gaps = (
            hist.filter(F.col("valid_to").isNotNull())
            .join(nxt, ["user_id", "version"])
            .filter(F.col("valid_to") != F.col("next_from"))
            .count()
        )
        assert gaps == 0
        # run lengths account for every event
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert hist.agg(F.sum("run_events")).first()[0] == n_events
        # consecutive runs never share an attribute value (they'd be one run)
        prev = hist.select(
            "user_id",
            (F.col("version") + 1).alias("version"),
            F.col("event_type").alias("prev_type"),
        )
        merged_runs = (
            hist.join(prev, ["user_id", "version"])
            .filter(F.col("event_type") == F.col("prev_type"))
            .count()
        )
        assert merged_runs == 0
    finally:
        hist.unpersist()


def test_scd2_asof_matches_history_lookup(spark, sf_dir):
    """Every non-null as-of assignment must be the unique history row
    whose interval contains the order date; null assignments must predate
    the user's first interval."""
    hist = _Q["scd2_user_state_history"](spark, sf_dir)
    asof = _Q["scd2_dim_asof_orders"](spark, sf_dir).cache()
    try:
        joined = asof.filter(F.col("state_version").isNotNull()).join(
            hist.select(
                "user_id",
                F.col("version").alias("state_version"),
                "valid_from",
                "valid_to",
            ),
            ["user_id", "state_version"],
        )
        out_of_interval = joined.filter(
            (F.col("placed_ts") < F.col("valid_from"))
            | (
                F.col("valid_to").isNotNull()
                & (F.col("placed_ts") >= F.col("valid_to"))
            )
        ).count()
        assert out_of_interval == 0
        first = hist.groupBy("user_id").agg(F.min("valid_from").alias("first_from"))
        bad_nulls = (
            asof.filter(F.col("state_version").isNull())
            .join(first, "user_id")
            .filter(F.col("placed_ts") >= F.col("first_from"))
            .count()
        )
        assert bad_nulls == 0
    finally:
        asof.unpersist()


def test_temperature_rates_monotone_and_rarest_keeps_all(spark, sf_dir):
    """T=2 mixing: the rarest language samples at rate 1.0 (per-mille
    1000) and keep-rates are non-increasing in language frequency."""
    rows = _Q["sample_lang_temperature"](spark, sf_dir).collect()
    by_n = sorted(rows, key=lambda r: r.n_total)
    assert by_n[0].keep_permille == 1000
    for a, b in zip(by_n, by_n[1:]):
        assert a.keep_permille >= b.keep_permille
    for r in rows:
        assert 0 < r.keep_permille <= 1000
        assert r.n_kept <= r.n_total


def test_quantized_topk_recall_against_exact(spark, sf_correct_dir):
    """int8 quantization must preserve the exact cosine top-10 almost
    perfectly on the test corpus (measured 1.0 at sf0.01; gate at 0.9
    to absorb future corpus changes)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in _Q["similarity_ann_cosine_topk"](spark, sf_correct_dir).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id)
        for r in _Q["similarity_quantized_topk"](spark, sf_correct_dir).collect()
    }
    assert len(exact & quant) / len(exact) >= 0.9


def test_quantized_vectors_stay_in_int8_range(spark, sf_dir):
    """Every quantized coordinate must fit int8: |q_i| <= 127 — the
    4x-smaller representation is the point of the operator."""
    from datawarehouse_project_spark.io import table
    from datawarehouse_project_spark.operators.similarity import (  # noqa: F401
        similarity_quantized_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    base = emb.select("embedding", scale.alias("scale"))
    qmax = base.select(
        F.array_max(
            F.transform(
                "embedding",
                lambda x: F.abs(
                    F.when(F.col("scale") == 0.0, F.lit(0).cast("bigint")).otherwise(
                        F.round((x.cast("double") * 127.0) / F.col("scale")).cast(
                            "bigint"
                        )
                    )
                ),
            )
        ).alias("m")
    )
    assert qmax.agg(F.max("m")).first()[0] <= 127


# ---------------------------------------------------------------------------
# Incremental SCD2 maintenance


def _scd2_canon(df):
    return sorted(
        (
            r.user_id,
            r.version,
            r.event_type,
            r.valid_from,
            r.valid_to,
            r.run_events,
        )
        for r in df.collect()
    )


def _time_sliced_batches(spark, sf_dir, n=3):
    """Event-time-ordered batches (the CDC contract): global thirds by
    timestamp, so run-boundaries straddle the cuts and exercise the
    extend-open-row merge path."""
    from datawarehouse_project_spark.io import table

    events = table(spark, sf_dir, "events")
    # ntile over a global ts order gives an exact n-way time split
    from pyspark.sql.window import Window
    from pyspark.sql import functions as F

    tiled = events.withColumn(
        "tile", F.ntile(n).over(Window.orderBy("ts", "event_id"))
    )
    return [
        tiled.filter(F.col("tile") == i + 1).drop("tile").localCheckpoint(
            eager=True
        )
        for i in range(n)
    ]


def test_incremental_scd2_equals_full_recompute_each_batch(spark, sf_dir, tmp_path):
    from datawarehouse_project_spark.operators.scd import (
        IncrementalScd2,
        _close_intervals,
        _runs_frame,
    )

    batches = _time_sliced_batches(spark, sf_dir)
    inc = IncrementalScd2(str(tmp_path / "scd2"))
    assert inc.read(spark) is None
    seen = None
    for i, b in enumerate(batches):
        inc.apply_batch(spark, b, batch_id=i)
        seen = b if seen is None else seen.unionByName(b)
        full = _close_intervals(_runs_frame(seen))
        assert _scd2_canon(inc.read(spark)) == _scd2_canon(full)


def test_incremental_scd2_replay_is_noop(spark, sf_dir, tmp_path):
    from datawarehouse_project_spark.operators.scd import IncrementalScd2

    batches = _time_sliced_batches(spark, sf_dir, n=2)
    inc = IncrementalScd2(str(tmp_path / "scd2r"))
    inc.apply_batch(spark, batches[0], batch_id=0)
    v1 = inc.apply_batch(spark, batches[1], batch_id=1)
    before = _scd2_canon(inc.read(spark))
    v2 = inc.apply_batch(spark, batches[1], batch_id=1)  # replay
    assert v2 == v1
    assert _scd2_canon(inc.read(spark)) == before


def test_incremental_scd2_rejects_late_batch(spark, sf_dir, tmp_path):
    """Contract violation fails loudly: applying batches out of event-time
    order (batch 2 then batch 1) must raise, not silently fold
    negative/overlapping intervals into the history, and must leave the
    stored history untouched."""
    import pytest

    from datawarehouse_project_spark.operators.scd import IncrementalScd2

    batches = _time_sliced_batches(spark, sf_dir, n=2)
    inc = IncrementalScd2(str(tmp_path / "scd2late"))
    inc.apply_batch(spark, batches[1], batch_id=0)  # later slice first
    before = _scd2_canon(inc.read(spark))
    with pytest.raises(ValueError, match="event-time-ordered"):
        inc.apply_batch(spark, batches[0], batch_id=1)  # late arrival
    assert _scd2_canon(inc.read(spark)) == before


def test_incremental_scd2_new_user_in_later_batch(spark, sf_dir, tmp_path):
    """A user first seen in batch 2 must start at version 1, and users
    absent from a batch must keep their rows untouched."""
    from pyspark.sql import functions as F

    from datawarehouse_project_spark.io import table
    from datawarehouse_project_spark.operators.scd import (
        IncrementalScd2,
        _close_intervals,
        _runs_frame,
    )

    events = table(spark, sf_dir, "events")
    b0 = events.filter(F.col("user_id") % 2 == 0).localCheckpoint(eager=True)
    b1 = events.filter(F.col("user_id") % 2 == 1).localCheckpoint(eager=True)
    inc = IncrementalScd2(str(tmp_path / "scd2n"))
    inc.apply_batch(spark, b0, batch_id=0)
    even_before = _scd2_canon(inc.read(spark))
    inc.apply_batch(spark, b1, batch_id=1)
    state = inc.read(spark)
    even_after = _scd2_canon(state.filter(F.col("user_id") % 2 == 0))
    assert even_after == even_before
    odd = _scd2_canon(state.filter(F.col("user_id") % 2 == 1))
    assert odd == _scd2_canon(_close_intervals(_runs_frame(b1)))


def test_streaming_scd2_foreachbatch_exactly_once(spark, sf_dir, tmp_path):
    """SCD2 maintenance as a structured stream: time-ordered event files
    micro-batched through foreachBatch into IncrementalScd2 must converge
    to the full recompute, and a full stream replay (fresh epoch ids)
    must be absorbed by the txn ledger."""
    import os
    import time

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from datawarehouse_project_spark.operators.scd import (
        IncrementalScd2,
        _close_intervals,
        _runs_frame,
    )
    from datawarehouse_project_spark.io import table

    batches = _time_sliced_batches(spark, sf_dir)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # the CDC contract is event-time-ordered arrival: write slices
    # sequentially with strictly increasing mtimes so the file source
    # (ascending modification time) delivers them in order
    for i, b in enumerate(batches):
        part = str(tmp_path / f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(part)
        files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        assert len(files) == 1
        dst = f"{src}/batch{i}.parquet"
        os.rename(f"{part}/{files[0]}", dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    inc = IncrementalScd2(str(tmp_path / "scd2s"))

    def run():
        (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
            .writeStream.foreachBatch(
                lambda bdf, bid: inc.apply_batch(spark, bdf, batch_id=bid)
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    full = _close_intervals(_runs_frame(table(spark, sf_dir, "events")))
    assert _scd2_canon(inc.read(spark)) == _scd2_canon(full)
    v = inc.table.current_version()
    run()  # replay: fresh epochs 0..n, ledger absorbs every one
    assert inc.table.current_version() == v
    assert _scd2_canon(inc.read(spark)) == _scd2_canon(full)


def test_scd2_asof_duplicate_ts_resolves_to_highest_version(spark):
    """Two state changes at the SAME timestamp produce an empty interval
    (v, [t,t)) and an open one (v+1, [t,...)). The as-of must always pick
    v+1 — the tiebreak the engine's asof_join provides — never the stale
    empty interval, regardless of shuffle order."""
    import datetime as dt

    from datawarehouse_project_spark.operators.relational import asof_join
    from datawarehouse_project_spark.operators.scd import (
        _close_intervals,
        _runs_frame,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "a", 0.0, ""),
        (2, t0, 10, "b", 0.0, ""),  # same ts, later event_id -> v2 opens at t0
        (3, dt.datetime(2024, 1, 2), 10, "c", 0.0, ""),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    hist = _close_intervals(_runs_frame(events))
    probes = spark.createDataFrame(
        [(100, 10, t0), (101, 10, dt.datetime(2024, 1, 1, 12))],
        "o_orderkey long, user_id long, o_orderdate timestamp",
    )
    out = asof_join(
        probes,
        hist,
        key="user_id",
        left_ts="o_orderdate",
        right_ts="valid_from",
        right_cols=["event_type", "version"],
        right_tiebreak="version",
        prune_right=False,
    )
    got = {r.o_orderkey: (r.event_type, r.version) for r in out.collect()}
    assert got == {100: ("b", 2), 101: ("b", 2)}


def test_ewma_c_kernel_bit_exact():
    """The round-9 vectorization replaced the Python fold with pandas'
    Cython ewm kernel; both must produce the IDENTICAL IEEE sequence
    (s_i = α·x_i + (1−α)·s_{i−1}, seeded with the first value) — the
    property the DuckDB list_reduce oracle's hash check rides on."""
    import numpy as np
    import pandas as pd

    from datawarehouse_project_spark.operators.events import EWMA_ALPHA

    alpha, beta = EWMA_ALPHA, 1.0 - EWMA_ALPHA
    rng = np.random.default_rng(9)
    for _ in range(50):
        vals = rng.normal(50, 20, int(rng.integers(1, 400)))
        acc = None
        for x in vals:
            acc = float(x) if acc is None else alpha * float(x) + beta * acc
        got = float(
            pd.Series(vals).ewm(alpha=alpha, adjust=False).mean().iloc[-1]
        )
        assert np.float64(got).tobytes() == np.float64(acc).tobytes()


def test_ewma_skips_null_observations(spark):
    """NULL values are skipped (oracle FILTER semantics), not folded as
    NaN; an all-NULL user reports n_events=0 and NULL ewma."""
    import datetime as dt
    import math

    from datawarehouse_project_spark.operators.events import events_ewma_by_user  # noqa: F401
    from datawarehouse_project_spark.catalog import all_queries, all_oracle_sql
    import duckdb
    import pandas as pd

    t = dt.datetime(2024, 1, 1)
    rows = [
        (1, t, 1, "a", 2.0, ""),
        (2, dt.datetime(2024, 1, 1, 1), 1, "a", None, ""),
        (3, dt.datetime(2024, 1, 1, 2), 1, "a", 4.0, ""),
        (4, t, 2, "a", None, ""),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/events.parquet")
        out = {
            r.user_id: (r.n_events, r.ewma)
            for r in all_queries()["events_ewma_by_user"](spark, d).collect()
        }
    # user 1: fold 2.0 then 4.0 -> 0.125*4 + 0.875*2 = 2.25; NULL skipped
    assert out[1] == (2, 2.25)
    assert out[2][0] == 0 and out[2][1] is None


def test_concurrent_scd2_writers_lose_no_users(spark, sf_dir, tmp_path):
    """Two SCD2 maintainers (different apps, disjoint user sets) race
    into one table: the table-level CAS forces the loser to re-read and
    re-fold, so both user sets must land and equal the full recompute."""
    import threading

    from datawarehouse_project_spark.io import table
    from datawarehouse_project_spark.operators.scd import (
        IncrementalScd2,
        _close_intervals,
        _runs_frame,
    )

    events = table(spark, sf_dir, "events")
    b0 = events.filter(F.col("user_id") % 2 == 0).localCheckpoint(eager=True)
    b1 = events.filter(F.col("user_id") % 2 == 1).localCheckpoint(eager=True)
    root = str(tmp_path / "cscd2")
    errs = []

    def writer(batch, app):
        try:
            IncrementalScd2(root).apply_batch(spark, batch, batch_id=0, app_id=app)
        except Exception as e:  # pragma: no cover - surfaced by assert
            errs.append(e)

    ts = [
        threading.Thread(target=writer, args=(b0, "even")),
        threading.Thread(target=writer, args=(b1, "odd")),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = _scd2_canon(IncrementalScd2(root).read(spark))
    assert got == _scd2_canon(_close_intervals(_runs_frame(events)))


# ---------------------------------------------------------------------------
# RFM scale twin (round-9): quantile-cut scoring vs the exact NTILE form.


def test_rfm_scaled_equals_exact_on_distinct_values(spark):
    """Calibration pin: on DISTINCT metric values with N divisible by 5
    and relative_error=0, the quantile-cut scores equal the exact form's
    NTILE output for all three metrics (asc f/m and desc r rules)."""
    import random

    from pyspark.sql import Window

    from datawarehouse_project_spark.plans.olap_extra import (
        rfm_quantile_scores,
    )

    random.seed(11)
    n = 200
    rows = [
        (
            i,
            float(v_r),
            v_f,
            float(v_m),
        )
        for i, (v_r, v_f, v_m) in enumerate(
            zip(
                random.sample(range(1, 10_000), n),
                random.sample(range(1, 10_000), n),
                random.sample(range(1, 10_000), n),
            )
        )
    ]
    base = spark.createDataFrame(
        rows, "o_custkey long, r_days double, n_orders long, monetary double"
    )
    got = {
        r.o_custkey: (r.r_score, r.f_score, r.m_score)
        for r in rfm_quantile_scores(base, relative_error=0.0).collect()
    }
    w_r = Window.orderBy(F.desc("r_days"), "o_custkey")
    w_f = Window.orderBy(F.asc("n_orders"), "o_custkey")
    w_m = Window.orderBy(F.asc("monetary"), "o_custkey")
    want = {
        r.o_custkey: (r.r, r.f, r.m)
        for r in base.select(
            "o_custkey",
            F.ntile(5).over(w_r).alias("r"),
            F.ntile(5).over(w_f).alias("f"),
            F.ntile(5).over(w_m).alias("m"),
        ).collect()
    }
    assert got == want


def test_rfm_scaled_invariants_and_no_global_sort(spark, sf_dir):
    """On real data: same base metrics as the exact form, scores in 1..5
    and value-monotone (equal values share a score — the documented tie
    divergence from NTILE), and the PLAN has no single-partition window
    (the point of the twin)."""
    exact = _Q["rfm_customer_segments"](spark, sf_dir).collect()
    scaled = _Q["rfm_customer_segments_scaled"](spark, sf_dir)
    p = scaled._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p and "Sort" not in p.replace("SortAggregate", "")
    rows = scaled.collect()
    assert {r.o_custkey for r in rows} == {r.o_custkey for r in exact}
    base_exact = {r.o_custkey: (r.r_days, r.n_orders, r.monetary) for r in exact}
    for r in rows:
        assert base_exact[r.o_custkey] == (r.r_days, r.n_orders, r.monetary)
        for s in (r.r_score, r.f_score, r.m_score):
            assert 1 <= s <= 5
        assert r.rfm_segment == r.r_score * 100 + r.f_score * 10 + r.m_score
    # value-monotone per metric, ties share scores
    for metric, score, sign in (
        ("r_days", "r_score", -1),
        ("n_orders", "f_score", 1),
        ("monetary", "m_score", 1),
    ):
        ordered = sorted(rows, key=lambda r: sign * getattr(r, metric))
        for a, b in zip(ordered, ordered[1:]):
            if getattr(a, metric) == getattr(b, metric):
                assert getattr(a, score) == getattr(b, score)
            else:
                assert getattr(a, score) <= getattr(b, score)


def test_incremental_scd2_rejects_mid_run_late_batch(spark, tmp_path):
    """The round-9 review case: a late batch whose events land AFTER the
    open row's valid_from but BEFORE its last folded event (the window
    the old valid_from-only guard could not see) must raise, not close
    the open run mid-history."""
    import datetime as dt

    import pytest

    from datawarehouse_project_spark.operators.scd import IncrementalScd2

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    t = dt.datetime(2024, 1, 1)
    first = spark.createDataFrame(
        [
            (1, t, 7, "a", 1.0, ""),
            (2, t + dt.timedelta(hours=100), 7, "a", 1.0, ""),
        ],
        schema,
    )
    late = spark.createDataFrame(
        [(3, t + dt.timedelta(hours=50), 7, "b", 1.0, "")], schema
    )
    inc = IncrementalScd2(str(tmp_path / "midlate"))
    inc.apply_batch(spark, first, batch_id=0)
    before = _scd2_canon(inc.read(spark))
    with pytest.raises(ValueError, match="high-watermark"):
        inc.apply_batch(spark, late, batch_id=1)
    assert _scd2_canon(inc.read(spark)) == before
    # the boundary itself is legal: an event AT the high-watermark
    at_hwm = spark.createDataFrame(
        [(4, t + dt.timedelta(hours=100), 7, "b", 1.0, "")], schema
    )
    inc.apply_batch(spark, at_hwm, batch_id=1)
    rows = {r.version: r.event_type for r in inc.read(spark).collect()}
    assert rows == {1: "a", 2: "b"}
