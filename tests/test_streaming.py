"""Streaming equivalence tests: the MESHJOIN analog and the watermarked
window aggregate must reproduce their batch twins exactly (the reference's
own implicit invariant — SURVEY §5.2.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_project_spark.io import table
from datawarehouse_project_spark.operators.events import events_enrich_meshjoin
from datawarehouse_project_spark.streaming.meshjoin import (
    enrich_batch,
    run_meshjoin_stream,
)
from datawarehouse_project_spark.streaming.stream_join import (
    click_attribution,
    run_stream_stream_join,
    split_clicks_purchases,
)
from datawarehouse_project_spark.streaming.windows import (
    run_windowed_stream,
    windowed_counts,
)


import pytest

# r22 fast-lane split (VERDICT r21 #2: the driver's default pytest run
# timed out at 30-80 min on the drifting box): this module is stateful /
# property / streaming coverage whose VALUE semantics are already gated
# by the fast lane's sf0.001 oracle-parity sweep — the whole module runs
# in the slow lane (`pytest -m slow`, the round-end full sweep).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def chunked_events(spark, tmp_path_factory):
    """events split into 4 parquet files = 4 micro-batch 'chunks'."""
    src = str(tmp_path_factory.mktemp("events_chunks"))
    ev = table(spark, "/root/testdata/sf0.001", "events")
    ev.withColumn("part", (F.col("event_id") % 4).cast("int")).write.partitionBy(
        "part"
    ).mode("overwrite").parquet(src)
    # schema of the partitioned files (without the partition col at read)
    return src, ev.schema


def _collect_sorted(df):
    return sorted(map(str, df.collect()))


def test_meshjoin_stream_equals_batch(spark, chunked_events, tmp_path):
    src, schema = chunked_events
    cust = table(spark, "/root/testdata/sf0.001", "customer")

    got = []
    run_meshjoin_stream(
        spark,
        src,
        schema,
        dims={"customer": (cust.withColumnRenamed("c_custkey", "user_id"), "user_id")},
        sink=lambda df, bid: got.append(df.collect()),
        files_per_trigger=1,
        how="inner",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert len(got) >= 2, "stream must process multiple chunks"
    streamed = sorted(str(r) for batch in got for r in batch)

    ev = spark.read.schema(schema).parquet(src)
    batch = enrich_batch(
        ev,
        {"customer": (cust.withColumnRenamed("c_custkey", "user_id"), "user_id")},
        how="inner",
    )
    assert streamed == _collect_sorted(batch)


def test_windowed_stream_equals_batch(spark, chunked_events, tmp_path):
    src, schema = chunked_events

    last = {}
    run_windowed_stream(
        spark,
        src,
        schema,
        sink=lambda df, bid: last.update({"rows": df.collect()}),
        window_duration="1 hour",
        watermark="2 hours",
        files_per_trigger=2,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    streamed = sorted(map(str, last["rows"]))

    ev = spark.read.schema(schema).parquet(src)
    batch = windowed_counts(ev, "1 hour", "2 hours")
    assert streamed == _collect_sorted(batch)
    assert len(streamed) > 10


def test_stream_stream_join_equals_batch(spark, chunked_events, tmp_path):
    """The watermarked stream-stream inner join must emit exactly the
    batch join's pairs. The chunk fixture splits by event_id, so a chunk
    spans the full month — an unordered backfill — and the documented
    contract is that the watermark must cover the source's event-time
    disorder; hence the full-span watermark here. Eager emission (inner
    joins don't wait for the watermark) is asserted via rows arriving
    across multiple micro-batches."""
    src, schema = chunked_events

    got = []
    run_stream_stream_join(
        spark,
        src,
        schema,
        sink=lambda df, bid: got.append(df.collect()),
        watermark="40 days",
        files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    batches_with_rows = [b for b in got if b]
    assert len(batches_with_rows) >= 2, "pairs must be emitted incrementally"
    streamed = sorted(str(r) for batch in got for r in batch)

    ev = spark.read.schema(schema).parquet(src)
    batch = click_attribution(*split_clicks_purchases(ev))
    assert streamed == _collect_sorted(batch)
    assert len(streamed) > 0


def test_stream_stream_join_reports_metrics(spark, chunked_events, tmp_path):
    """With a watermark covering all disorder: observed pairs_emitted ==
    batch pair count and zero watermark drops."""
    src, schema = chunked_events
    got = []
    metrics = run_stream_stream_join(
        spark,
        src,
        schema,
        sink=lambda df, bid: got.append(df.count()),
        watermark="40 days",
        checkpoint_dir=str(tmp_path / "ckpt_m"),
    )
    batch_pairs = click_attribution(
        *split_clicks_purchases(spark.read.schema(schema).parquet(src))
    ).count()
    assert metrics["pairs_emitted"] == sum(got) == batch_pairs
    assert metrics["rows_dropped_by_watermark"] == 0


def test_stream_stream_join_observes_late_drops(spark, tmp_path):
    """VERDICT r2 #9: deliberately late purchases must surface in the
    returned metrics (rows_dropped_by_watermark > 0) instead of vanishing
    silently. Chunk 0 carries clicks up to t+60min (advancing the
    watermark); chunk 1 delivers purchases at t+1..3min — far older than
    the 1-minute watermark horizon by the time they arrive."""
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    base = 1_600_000_000
    # Three chunks, because two watermark mechanics must fire BEFORE the
    # late rows arrive: (a) with the default min-of-watermarks policy both
    # sides' watermarks must advance (chunk 0 carries a high-ts purchase
    # for that), and (b) state eviction happens at the END of the batch
    # that advances the watermark — so chunk 1 is a quiet batch whose
    # processing evicts the old clicks, and only chunk 2's purchases meet
    # an already-evicted state and count as droppedByWatermark.
    chunk0 = [(i, 1, "click", i * 60, 0.0) for i in range(61)]  # t+0..60min
    chunk0.append((99, 2, "purchase", 60 * 60, 1.0))
    chunk1 = [(200, 2, "click", 3660, 0.0), (201, 2, "purchase", 3665, 1.0)]
    late_purchases = [(100 + i, 1, "purchase", i * 60 + 30, 9.9) for i in (1, 2, 3)]
    src = str(tmp_path / "late_src")

    import datetime
    import time

    def write_chunk(rows):
        data = [
            (e, u, k, datetime.datetime.utcfromtimestamp(base + s), v)
            for e, u, k, s, v in rows
        ]
        spark.createDataFrame(data, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mtimes keep the file-source chunk order

    write_chunk(chunk0)
    write_chunk(chunk1)
    write_chunk(late_purchases)

    got = []
    metrics = run_stream_stream_join(
        spark,
        src,
        schema,
        sink=lambda df, bid: got.append(df.count()),
        watermark="1 minute",
        files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt_late"),
    )
    assert metrics["rows_dropped_by_watermark"] > 0
    # the batch twin WOULD have attributed those purchases — the metric is
    # exactly the observability of that divergence
    ev = spark.read.schema(schema).parquet(src)
    batch_pairs = click_attribution(*split_clicks_purchases(ev)).count()
    assert batch_pairs > sum(got)


# --------------------------------------------------------------------------
# Late-event dead-letter routing (r10): allowed-lateness with evidence.


def test_late_dlq_routes_and_conserves_rows(spark, tmp_path):
    from datawarehouse_project_spark.streaming.late_dlq import LateEventRouter

    router = LateEventRouter(
        str(tmp_path / "main"),
        str(tmp_path / "late"),
        str(tmp_path / "state"),
        allowed_lateness_s=3600,
    )
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")],
        "event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    router.apply_batch(spark, b0, ["event_id"], batch_id=0)
    # first batch: no prior watermark, nothing can be late
    assert router.late.read(spark).count() == 0
    assert router.watermark_us(spark) is not None

    b1 = spark.createDataFrame(
        [
            (3, "2024-01-01 12:30:00"),  # fresh
            (4, "2024-01-01 11:30:00"),  # within lateness (wm 12:00 - 1h)
            (5, "2024-01-01 09:00:00"),  # LATE: 2h before the 12:00 wm
        ],
        "event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    router.apply_batch(spark, b1, ["event_id"], batch_id=1)
    late = {r.event_id: r for r in router.late.read(spark).collect()}
    assert set(late) == {5}
    assert late[5].late_batch_id == 1
    assert late[5].late_by_s == 7200.0
    main_ids = {r.event_id for r in router.main.read(spark).collect()}
    assert main_ids == {1, 2, 3, 4}
    # conservation: main ∪ late == every input row exactly once
    assert router.main.read(spark).count() + router.late.read(spark).count() == 5
    # watermark advanced to b1's max
    assert router.watermark_us(spark) == int(
        b1.agg(F.max(F.unix_micros(F.col("ts")))).first()[0]
    )

    # replay of the whole batch: all three ledgers absorb it
    versions = (
        router.main.current_version(),
        router.late.current_version(),
        router.state.current_version(),
    )
    router.apply_batch(spark, b1, ["event_id"], batch_id=1)
    assert versions == (
        router.main.current_version(),
        router.late.current_version(),
        router.state.current_version(),
    )


def test_late_dlq_streaming_foreachbatch(spark, tmp_path):
    """The router as a writeStream sink: chunked replayed input still
    yields exactly-once routing (ledger), and the watermark only ever
    advances."""
    from datawarehouse_project_spark.streaming.late_dlq import LateEventRouter

    rows = [
        (i, f"2024-01-01 {8 + i:02d}:00:00", i % 3) for i in range(6)
    ]
    src_df = spark.createDataFrame(
        rows, "event_id long, ts string, part int"
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "src")
    src_df.write.partitionBy("part").mode("overwrite").parquet(src)
    router = LateEventRouter(
        str(tmp_path / "m"),
        str(tmp_path / "l"),
        str(tmp_path / "s"),
        allowed_lateness_s=1800,
    )

    def run():
        (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                lambda bdf, bid: router.apply_batch(
                    spark, bdf.drop("part"), ["event_id"], batch_id=bid
                )
            )
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run()
    total = router.main.read(spark).count() + (
        router.late.read(spark) or spark.createDataFrame([], "x int")
    ).count()
    assert total == 6
    wm1 = router.watermark_us(spark)
    vs = (router.main.current_version(), router.late.current_version())
    run()  # full replay
    assert (router.main.current_version(), router.late.current_version()) == vs
    assert router.watermark_us(spark) == wm1


def test_late_dlq_composes_with_incremental_rollup(spark, tmp_path):
    """Composition: the router's ON-TIME stream feeds the incremental
    rollup inside the SAME foreachBatch — exactly the allowed-lateness
    windowed aggregation Structured Streaming does internally, but with
    the dropped rows preserved in the DLQ. Invariants: rollup == exact
    aggregate over the main table (late rows excluded), main ∪ late ==
    input, full replay changes nothing anywhere."""
    from datawarehouse_project_spark.operators.incremental import (
        IncrementalRollup,
    )
    from datawarehouse_project_spark.streaming.late_dlq import LateEventRouter

    router = LateEventRouter(
        str(tmp_path / "m"),
        str(tmp_path / "l"),
        str(tmp_path / "s"),
        allowed_lateness_s=3600,
    )
    rollup = IncrementalRollup(
        str(tmp_path / "roll"), keys=["etype"], sum_cols=["value"]
    )
    batches = [
        [(1, "2024-01-01 10:00:00", "a", 1.0), (2, "2024-01-01 12:00:00", "b", 2.0)],
        [
            (3, "2024-01-01 12:30:00", "a", 4.0),
            (4, "2024-01-01 09:00:00", "b", 8.0),  # LATE -> DLQ, not rollup
        ],
    ]

    def apply(bid, rows):
        bdf = spark.createDataFrame(
            rows, "event_id long, ts string, etype string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        router.apply_batch(spark, bdf, ["event_id"], batch_id=bid)
        # the on-time half of THIS batch feeds the rollup: recompute the
        # routing deterministically from the router's pre-batch watermark
        # is what apply_batch did; the main table's NEW rows are exactly
        # that half, so fold the batch MINUS the DLQ'd ids
        late_ids = {
            r.event_id
            for r in router.late.read(spark).collect()
        }
        ontime = bdf.filter(~F.col("event_id").isin(*late_ids) if late_ids else F.lit(True))
        rollup.apply_batch(spark, ontime.select("etype", "value"), batch_id=bid)

    for bid, rows in enumerate(batches):
        apply(bid, rows)

    main = router.main.read(spark)
    state = {
        r.etype: (r.sum_value, r.n_rows)
        for r in rollup.read(spark).collect()
    }
    exact = {
        r.etype: (r.s, r.n)
        for r in main.groupBy("etype")
        .agg(F.sum("value").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    assert state == exact
    assert state["b"] == (2.0, 1)  # the late 8.0 never entered the rollup
    assert {r.event_id for r in router.late.read(spark).collect()} == {4}
    # conservation + replay
    assert main.count() + router.late.read(spark).count() == 4
    versions = (
        router.main.current_version(),
        router.late.current_version(),
        rollup.table.current_version(),
    )
    for bid, rows in enumerate(batches):
        apply(bid, rows)
    assert versions == (
        router.main.current_version(),
        router.late.current_version(),
        rollup.table.current_version(),
    )


# --------------------------------------------------------------------------
# r12 (VERDICT r11 #6): the composed pipeline as ONE class — route + fold
# into the maintained hourly rollup + watermark, crash-anywhere replay.


_HRR_BATCHES = [
    [
        (1, "2024-01-01 10:10:00", "view", 1.25),
        (2, "2024-01-01 12:20:00", "click", 2.5),
        (3, "2024-01-01 12:40:00", "view", 0.75),
    ],
    [
        (4, "2024-01-01 13:05:00", "view", 4.0),
        (5, "2024-01-01 09:00:00", "click", 8.0),  # LATE -> DLQ only
        (6, "2024-01-01 12:55:00", "click", 1.0),  # within lateness
    ],
    [
        (7, "2024-01-01 13:45:00", "view", 3.0),
        (8, "2024-01-01 10:30:00", "view", 16.0),  # LATE vs 13:05 wm - 1h
    ],
]


def _hrr(spark, base):
    from datawarehouse_project_spark.streaming.late_dlq import (
        HourlyRollupRouter,
    )

    return HourlyRollupRouter(
        str(base / "main"),
        str(base / "late"),
        str(base / "state"),
        str(base / "rollup"),
        allowed_lateness_s=3600,
    )


def _hrr_batch_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))


def _hrr_run_all(spark, pipe):
    for bid, rows in enumerate(_HRR_BATCHES):
        pipe.apply_batch(
            spark, _hrr_batch_df(spark, rows), ["event_id"], batch_id=bid
        )


def _hrr_state(spark, pipe):
    main = sorted(
        (r.event_id, r.event_type) for r in pipe.main.read(spark).collect()
    )
    late = sorted(r.event_id for r in pipe.late.read(spark).collect())
    roll = sorted(
        (r.event_type, r.window_start_us, r.n_events, r.total_value)
        for r in pipe.serve_hourly(spark).collect()
    )
    return main, late, roll, pipe.watermark_us(spark)


def test_hourly_rollup_router_composes_exactly(spark, tmp_path):
    """One apply_batch maintains all four tables: main ∪ late == input
    exactly once, the rollup equals the exact hourly GROUP BY over the
    main table bit-for-bit (late rows excluded), and whole-batch replay
    is a no-op on every ledger."""
    pipe = _hrr(spark, tmp_path)
    _hrr_run_all(spark, pipe)

    main, late, roll, wm = _hrr_state(spark, pipe)
    n_in = sum(len(b) for b in _HRR_BATCHES)
    assert len(main) + len(late) == n_in
    assert late == [5, 8]

    exact = sorted(
        (r.event_type, r.window_start_us, r.n_events, r.total_value)
        for r in pipe.main.read(spark)
        .groupBy(
            "event_type",
            F.unix_micros(F.date_trunc("hour", "ts")).alias(
                "window_start_us"
            ),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    )
    assert roll == exact

    versions = (
        pipe.main.current_version(),
        pipe.late.current_version(),
        pipe.rollup.table.current_version(),
        pipe.state.current_version(),
    )
    _hrr_run_all(spark, pipe)  # full replay: every ledger absorbs it
    assert versions == (
        pipe.main.current_version(),
        pipe.late.current_version(),
        pipe.rollup.table.current_version(),
        pipe.state.current_version(),
    )


def test_hourly_rollup_router_crash_anywhere_replays_exactly_once(
    spark, tmp_path, monkeypatch
):
    """Kill the pipeline after EACH of its per-batch commits (late,
    main, rollup — the watermark is last), replay the batch, finish the
    stream: the final four-table state must equal the no-crash run's,
    for every crash point. The watermark committing last is what makes
    the replayed routing deterministic."""
    from datawarehouse_project_spark.sources import sinks as sinks_mod

    class Boom(RuntimeError):
        pass

    reference = _hrr(spark, tmp_path / "ref")
    _hrr_run_all(spark, reference)
    want = _hrr_state(spark, reference)

    real_upsert = sinks_mod.VersionedParquetTable.upsert
    for crash_after in (1, 2, 3):
        pipe = _hrr(spark, tmp_path / f"c{crash_after}")
        # batch 0 lands cleanly; batch 1 crashes mid-commit
        pipe.apply_batch(
            spark,
            _hrr_batch_df(spark, _HRR_BATCHES[0]),
            ["event_id"],
            batch_id=0,
        )
        calls = {"n": 0}

        def exploding(self, *a, **kw):
            calls["n"] += 1
            if calls["n"] > crash_after:
                raise Boom()
            return real_upsert(self, *a, **kw)

        monkeypatch.setattr(
            sinks_mod.VersionedParquetTable, "upsert", exploding
        )
        try:
            pipe.apply_batch(
                spark,
                _hrr_batch_df(spark, _HRR_BATCHES[1]),
                ["event_id"],
                batch_id=1,
            )
        except Boom:
            pass
        else:  # crash point beyond this batch's commit count
            pass
        finally:
            monkeypatch.setattr(
                sinks_mod.VersionedParquetTable, "upsert", real_upsert
            )
        # restart: replay the crashed batch, then the rest of the stream
        pipe.apply_batch(
            spark,
            _hrr_batch_df(spark, _HRR_BATCHES[1]),
            ["event_id"],
            batch_id=1,
        )
        pipe.apply_batch(
            spark,
            _hrr_batch_df(spark, _HRR_BATCHES[2]),
            ["event_id"],
            batch_id=2,
        )
        assert _hrr_state(spark, pipe) == want, f"crash_after={crash_after}"


def test_events_hourly_from_store_equals_batch_twin(spark, sf_dir):
    """The serving twin (maintained-store read) answers exactly the
    batch twin's rows — same grain, same DECIMAL-exact sums."""
    from datawarehouse_project_spark.catalog import all_queries

    aq = all_queries()
    served = sorted(map(tuple, aq["events_hourly_from_store"](spark, sf_dir).collect()))
    batch = sorted(map(tuple, aq["events_hourly_windows"](spark, sf_dir).collect()))
    assert served == batch


def test_session_stream_equals_batch_native(spark, chunked_events, tmp_path):
    """Streaming gap-merged session windows == the batch native operator
    (the 'runs unchanged on a stream' claim of
    events_session_window_native, made a tested fact). The chunk fixture
    splits by event_id, so every micro-batch spans the month — sessions
    MERGE across batches as their members arrive out of order, which is
    exactly the state machinery under test; the watermark covers the
    disorder like the stream-stream join test."""
    from datawarehouse_project_spark.catalog import all_queries
    from datawarehouse_project_spark.operators.events import SESSION_GAP_S
    from datawarehouse_project_spark.streaming.windows import (
        run_session_stream,
    )

    src, schema = chunked_events

    last = {}
    run_session_stream(
        spark,
        src,
        schema,
        sink=lambda df, bid: last.update({"rows": df.collect(), "bid": bid}),
        gap_s=SESSION_GAP_S,
        watermark="40 days",
        files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt_sess"),
    )
    assert last["bid"] >= 2, "stream must process multiple chunks"
    streamed = sorted(map(str, last["rows"]))

    # batch twin over the SAME chunked source rows
    ev = spark.read.schema(schema).parquet(src)
    batch = (
        ev.groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )
    assert streamed == _collect_sorted(batch)
    assert len(streamed) > 100
    # and the batch twin is itself the oracle-checked registered query
    reg = all_queries()["events_session_window_native"](
        spark, "/root/testdata/sf0.001"
    )
    assert _collect_sorted(reg) == _collect_sorted(batch)


def test_session_stream_append_finalization(spark, tmp_path):
    """VERDICT r14 #4 / 'What's wrong' #2: the deployment-mode claim of
    run_session_stream — append mode emits each session EXACTLY ONCE at
    watermark finalization — driven over a multi-batch stream with a
    late-but-in-watermark event (merges into its session) and a
    beyond-watermark event (dropped; must NOT resurrect the finalized
    session), asserting the union of appended batches equals the batch
    twin over the surviving events."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouse_project_spark.streaming.windows import (
        run_session_stream,
    )

    GAP_S = 600
    src = tmp_path / "sess_src"
    src.mkdir()

    def chunk(path, rows, mtime):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    t0 = time.time()
    # f0: user 1 opens a session (events 1000,1100); user 2 at 1200
    chunk(src / "f0.parquet", [(1, 1000), (1, 1100), (2, 1200)], t0 - 50)
    # f1: in-watermark late event extends user 1's session to [1000,1900];
    #     user 2 opens a SECOND session at 5000
    chunk(src / "f1.parquet", [(1, 1300), (2, 5000)], t0 - 40)
    # f2: sentinel far-future event pushes the watermark (2h) to 92800s —
    #     beyond every open session's close, finalizing them
    chunk(src / "f2.parquet", [(99, 100_000)], t0 - 30)
    # f3: second sentinel. Spark ≥3.4 advances the watermark in TWO
    #     phases per operator: the LATE-EVENT filter of batch N uses the
    #     watermark committed entering batch N-1, while EVICTION/emission
    #     uses the one entering batch N — so finalization fires one batch
    #     after f2, and the late filter reaches 92800 one batch after
    #     that. This chunk burns that phase gap.
    chunk(src / "f3.parquet", [(99, 100_001)], t0 - 20)
    # f4: BEYOND-watermark event for user 1 (1400 << 92800) — must be
    #     dropped, not resurrect (or re-open) the finalized [1000,1900]
    #     session as a fresh [1400,2000) one
    chunk(src / "f4.parquet", [(1, 1400)], t0 - 10)

    batches = []
    run_session_stream(
        spark,
        str(src),
        "user_id bigint, ts timestamp",
        sink=lambda df, bid: batches.append((bid, df.collect())),
        gap_s=GAP_S,
        watermark="2 hours",
        files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt_append"),
        output_mode="append",
    )

    appended = [
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for _, rows in batches
        for r in rows
    ]
    # exactly-once: no session row appears twice across the whole drain
    assert len(appended) == len(set(appended)), appended
    got = set(appended)

    US = 1_000_000
    want = {
        # user 1: the in-watermark late 1300 merged in; the dropped 1400
        # did NOT (n_events=3, end=1900, emitted once, never re-emitted)
        (1, 1000 * US, (1300 + GAP_S) * US, 3),
        (2, 1200 * US, (1200 + GAP_S) * US, 1),
        (2, 5000 * US, (5000 + GAP_S) * US, 1),
    }
    assert got == want, got
    # the sentinel's own session stays OPEN at drain end — append mode
    # never emits an unfinalized session
    assert all(u != 99 for u, *_ in got)

    # finalization happened only after the watermark-advancing chunk:
    # batches 0..2 (f0..f2) emit nothing, the post-f2 trigger emits all
    emitted_at = [bid for bid, rows in batches if rows]
    assert emitted_at and min(emitted_at) >= 3, [
        (b, len(r)) for b, r in batches
    ]

    # and the union equals the batch twin over the SURVIVING events
    # (sentinel excluded = the still-open session; dropped event absent
    # from the source twin by the stream's own semantics — so the twin
    # runs on f0+f1 only)
    twin_src = spark.createDataFrame(
        [(1, 1000), (1, 1100), (2, 1200), (1, 1300), (2, 5000)],
        "user_id bigint, sec bigint",
    ).select("user_id", F.timestamp_seconds("sec").alias("ts"))
    twin = (
        twin_src.groupBy(
            "user_id", F.session_window("ts", f"{GAP_S} seconds").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )
    assert got == {tuple(r) for r in twin.collect()}


def test_windowed_stream_append_finalization(spark, tmp_path):
    """The tumbling-window twin of the append-mode session pin: each
    (window, event_type) row is emitted exactly once when the watermark
    passes the window end, a beyond-watermark event neither re-emits
    nor alters a finalized window, and the appended union equals the
    batch twin over the surviving events. Same two-phase watermark
    shape: a second sentinel chunk burns the late-filter lag."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datawarehouse_project_spark.streaming.windows import (
        run_windowed_stream,
    )

    src = tmp_path / "win_src"
    src.mkdir()

    def chunk(path, rows, mtime):
        tbl = pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    HOUR = 3600
    t0 = time.time()
    # window [0, 3600): two clicks; window [3600, 7200): one view
    chunk(src / "f0.parquet",
          [("click", 100, 1.5), ("view", 3700, 2.0)], t0 - 50)
    # in-watermark late row lands in the FIRST window before it closes
    chunk(src / "f1.parquet", [("click", 200, 0.5)], t0 - 40)
    # sentinel far ahead: watermark (2h) passes both windows' ends
    chunk(src / "f2.parquet", [("zz", 100_000, 0.0)], t0 - 30)
    # second sentinel burns the late-filter phase lag
    chunk(src / "f3.parquet", [("zz", 100_001, 0.0)], t0 - 20)
    # beyond-watermark click for the finalized first window: dropped
    chunk(src / "f4.parquet", [("click", 300, 9.9)], t0 - 10)

    batches = []
    run_windowed_stream(
        spark,
        str(src),
        "event_type string, ts timestamp, value double",
        sink=lambda df, bid: batches.append((bid, df.collect())),
        window_duration="1 hour",
        watermark="2 hours",
        files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt_winapp"),
        output_mode="append",
    )

    appended = [
        (r.window_start_us, r.event_type, r.n_events, r.total_value)
        for _, rows in batches
        for r in rows
    ]
    assert len(appended) == len(set(appended)), appended  # exactly-once
    got = set(appended)
    US = 1_000_000
    want = {
        # late-but-in-watermark 0.5 merged; beyond-watermark 9.9 did NOT
        (0, "click", 2, 2.0),
        (HOUR * US, "view", 1, 2.0),
    }
    assert got == want, got
    # sentinel windows stay open at drain end — never emitted
    assert all(t != "zz" for _, t, *_ in got)
    emitted_at = [bid for bid, rows in batches if rows]
    assert emitted_at and min(emitted_at) >= 3, [
        (b, len(r)) for b, r in batches
    ]


def test_session_stream_restart_recovery(spark, tmp_path):
    """VERDICT r15 next-4, stateful twin: run_session_stream's
    append-mode exactly-once claim survives a restart. The sink crashes
    on its first NON-EMPTY delivery (rows seen, epoch never acked — the
    at-least-once window); resuming on the same checkpoint_dir
    re-delivers that epoch with IDENTICAL content (the state store
    version for the failed epoch never committed, so the recompute is
    deterministic), and one-delivery-per-epoch dedup yields exactly the
    uninterrupted run's emission."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    from pyspark.errors import StreamingQueryException

    from datawarehouse_project_spark.streaming.windows import (
        run_session_stream,
    )

    GAP_S = 600
    src = tmp_path / "sess_src_restart"
    src.mkdir()

    def chunk(path, rows, mtime):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    t0 = time.time()
    chunk(src / "f0.parquet", [(1, 1000), (1, 1100), (2, 1200)], t0 - 50)
    chunk(src / "f1.parquet", [(1, 1300), (2, 5000)], t0 - 40)
    # sentinel advances the watermark past every open session's close
    chunk(src / "f2.parquet", [(99, 100_000)], t0 - 30)
    chunk(src / "f3.parquet", [(99, 100_001)], t0 - 20)

    ckpt = str(tmp_path / "ckpt_restart")
    deliveries = []
    crashed = {"fired": False}

    def poison(df, bid):
        rows = [
            (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
            for r in df.collect()
        ]
        deliveries.append((bid, rows))
        if rows and not crashed["fired"]:
            crashed["fired"] = True
            raise RuntimeError("injected crash after delivery")

    def run(sink):
        run_session_stream(
            spark,
            str(src),
            "user_id bigint, ts timestamp",
            sink=sink,
            gap_s=GAP_S,
            watermark="2 hours",
            files_per_trigger=1,
            checkpoint_dir=ckpt,
            output_mode="append",
        )

    with pytest.raises(StreamingQueryException):
        run(poison)
    assert crashed["fired"]

    def clean(df, bid):
        deliveries.append(
            (bid, [
                (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
                for r in df.collect()
            ])
        )

    run(clean)

    # the crashed epoch was re-delivered with identical content
    by_bid = {}
    redelivered = None
    for bid, rows in deliveries:
        if bid in by_bid and rows:
            assert by_bid[bid] == rows, (bid, by_bid[bid], rows)
            redelivered = bid
        by_bid[bid] = rows
    assert redelivered is not None

    # one-delivery-per-epoch == the uninterrupted run's exactly-once set
    US = 1_000_000
    got = {t for rows in by_bid.values() for t in rows}
    want = {
        (1, 1000 * US, (1300 + GAP_S) * US, 3),
        (2, 1200 * US, (1200 + GAP_S) * US, 1),
        (2, 5000 * US, (5000 + GAP_S) * US, 1),
    }
    assert got == want, got
    # and no epoch emitted a session row twice WITHIN a delivery
    flat = [t for rows in by_bid.values() for t in rows]
    assert len(flat) == len(set(flat))


def test_windowed_stream_restart_recovery(spark, tmp_path):
    """Tumbling twin of the session restart pin (r16): the sink crashes
    on its first non-empty delivery (rows seen, epoch unacked); resuming
    on the same checkpoint_dir re-delivers that epoch with identical
    content, and one-delivery-per-epoch dedup equals the uninterrupted
    run's exactly-once emission."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    from pyspark.errors import StreamingQueryException

    from datawarehouse_project_spark.streaming.windows import (
        run_windowed_stream,
    )

    src = tmp_path / "win_src_restart"
    src.mkdir()

    def chunk(path, rows, mtime):
        tbl = pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    HOUR = 3600
    t0 = time.time()
    chunk(src / "f0.parquet",
          [("click", 100, 1.5), ("view", 3700, 2.0)], t0 - 50)
    chunk(src / "f1.parquet", [("click", 200, 0.5)], t0 - 40)
    chunk(src / "f2.parquet", [("zz", 100_000, 0.0)], t0 - 30)
    chunk(src / "f3.parquet", [("zz", 100_001, 0.0)], t0 - 20)

    ckpt = str(tmp_path / "ckpt_winrestart")
    deliveries = []
    crashed = {"fired": False}

    def row_tuples(df):
        return [
            (r.window_start_us, r.event_type, r.n_events, r.total_value)
            for r in df.collect()
        ]

    def poison(df, bid):
        rows = row_tuples(df)
        deliveries.append((bid, rows))
        if rows and not crashed["fired"]:
            crashed["fired"] = True
            raise RuntimeError("injected crash after delivery")

    def run(sink):
        run_windowed_stream(
            spark,
            str(src),
            "event_type string, ts timestamp, value double",
            sink=sink,
            window_duration="1 hour",
            watermark="2 hours",
            files_per_trigger=1,
            checkpoint_dir=ckpt,
            output_mode="append",
        )

    with pytest.raises(StreamingQueryException):
        run(poison)
    assert crashed["fired"]

    run(lambda df, bid: deliveries.append((bid, row_tuples(df))))

    by_bid = {}
    redelivered = None
    for bid, rows in deliveries:
        if bid in by_bid and rows:
            assert by_bid[bid] == rows, (bid, by_bid[bid], rows)
            redelivered = bid
        by_bid[bid] = rows
    assert redelivered is not None

    US = 1_000_000
    got = {t for rows in by_bid.values() for t in rows}
    want = {
        (0, "click", 2, 2.0),
        (HOUR * US, "view", 1, 2.0),
    }
    assert got == want, got
    flat = [t for rows in by_bid.values() for t in rows]
    assert len(flat) == len(set(flat))


def test_session_stream_restart_recovery_across_processes(tmp_path):
    """The strongest form of the restart pin: the resume happens in a
    NEW PROCESS (fresh JVM), so the state-store recovery is genuinely
    from the on-disk checkpoint — within one JVM the HDFS-backed state
    store provider can serve a cached version, which the in-session
    restart test cannot rule out. Phase 1 crashes the sink on its first
    non-empty delivery; phase 2 (separate interpreter + JVM) resumes on
    the same checkpoint_dir; the parent asserts identical re-delivered
    content and the exactly-once union."""
    import json
    import os
    import subprocess
    import sys
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    GAP_S = 600
    src = tmp_path / "sess_src_xproc"
    src.mkdir()

    def chunk(path, rows, mtime):
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    t0 = time.time()
    chunk(src / "f0.parquet", [(1, 1000), (1, 1100), (2, 1200)], t0 - 50)
    chunk(src / "f1.parquet", [(1, 1300), (2, 5000)], t0 - 40)
    chunk(src / "f2.parquet", [(99, 100_000)], t0 - 30)
    chunk(src / "f3.parquet", [(99, 100_001)], t0 - 20)

    ckpt = str(tmp_path / "ckpt_xproc")
    out = str(tmp_path / "deliveries.jsonl")
    driver = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from datawarehouse_project_spark.streaming.windows import run_session_stream

mode, src, ckpt, out = sys.argv[1:5]
spark = (SparkSession.builder.master("local[4]")
         .appName("xproc-" + mode).config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())

def sink(df, bid):
    rows = [[r.user_id, r.session_start_us, r.session_end_us, r.n_events]
            for r in df.collect()]
    with open(out, "a") as f:
        f.write(json.dumps({{"mode": mode, "bid": bid, "rows": rows}}) + "\n")
    if mode == "crash" and rows:
        raise RuntimeError("injected crash after delivery")

try:
    run_session_stream(spark, src, "user_id bigint, ts timestamp",
                       sink=sink, gap_s=600, watermark="2 hours",
                       files_per_trigger=1, checkpoint_dir=ckpt,
                       output_mode="append")
    print("DRAINED")
except Exception as e:
    print("DIED:" + type(e).__name__)
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def phase(mode):
        return subprocess.run(
            [sys.executable, "-c", driver, mode, str(src), ckpt, out],
            capture_output=True, text=True, timeout=300,
        )

    p1 = phase("crash")
    assert "DIED:" in p1.stdout, (p1.stdout[-500:], p1.stderr[-500:])
    p2 = phase("resume")
    assert "DRAINED" in p2.stdout, (p2.stdout[-500:], p2.stderr[-500:])

    deliveries = [json.loads(line) for line in open(out)]
    crash_bids = {d["bid"]: d["rows"] for d in deliveries if d["mode"] == "crash"}
    # the crashed epoch was re-delivered BY THE NEW PROCESS with
    # identical content (state recovered from disk, not a JVM cache)
    redelivered = [
        d for d in deliveries
        if d["mode"] == "resume" and d["bid"] in crash_bids and d["rows"]
    ]
    assert redelivered, deliveries
    for d in redelivered:
        assert d["rows"] == crash_bids[d["bid"]], (d, crash_bids[d["bid"]])

    by_bid = {}
    for d in deliveries:
        by_bid[d["bid"]] = d["rows"]  # last delivery per epoch
    US = 1_000_000
    got = {tuple(t) for rows in by_bid.values() for t in rows}
    want = {
        (1, 1000 * US, (1300 + GAP_S) * US, 3),
        (2, 1200 * US, (1200 + GAP_S) * US, 1),
        (2, 5000 * US, (5000 + GAP_S) * US, 1),
    }
    assert got == want, got
    flat = [tuple(t) for rows in by_bid.values() for t in rows]
    assert len(flat) == len(set(flat))


def test_windowed_stream_restart_recovery_across_processes(tmp_path):
    """Tumbling twin of the cross-process session pin (r17, VERDICT r16
    missing-2): phase 1 crashes the sink on its first non-empty
    delivery, phase 2 resumes on the same checkpoint_dir in a SEPARATE
    interpreter + JVM — the re-delivered epoch must carry identical
    content (recovered from the on-disk state store, never a cached JVM
    version) and one-delivery-per-epoch dedup must equal the
    uninterrupted run's exactly-once emission. With this, all four
    streaming surfaces carry the strongest restart form."""
    import json
    import os
    import subprocess
    import sys
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "win_src_xproc"
    src.mkdir()

    def chunk(path, rows, mtime):
        tbl = pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "ts": pa.array(
                    [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
                ),
                "value": pa.array([float(r[2]) for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    HOUR = 3600
    t0 = time.time()
    chunk(src / "f0.parquet",
          [("click", 100, 1.5), ("view", 3700, 2.0)], t0 - 50)
    chunk(src / "f1.parquet", [("click", 200, 0.5)], t0 - 40)
    chunk(src / "f2.parquet", [("zz", 100_000, 0.0)], t0 - 30)
    chunk(src / "f3.parquet", [("zz", 100_001, 0.0)], t0 - 20)

    ckpt = str(tmp_path / "ckpt_win_xproc")
    out = str(tmp_path / "win_deliveries.jsonl")
    driver = r"""
import json, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from datawarehouse_project_spark.streaming.windows import run_windowed_stream

mode, src, ckpt, out = sys.argv[1:5]
spark = (SparkSession.builder.master("local[4]")
         .appName("xproc-win-" + mode).config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())

def sink(df, bid):
    rows = [[r.window_start_us, r.event_type, r.n_events, r.total_value]
            for r in df.collect()]
    with open(out, "a") as f:
        f.write(json.dumps({{"mode": mode, "bid": bid, "rows": rows}}) + "\n")
    if mode == "crash" and rows:
        raise RuntimeError("injected crash after delivery")

try:
    run_windowed_stream(spark, src,
                        "event_type string, ts timestamp, value double",
                        sink=sink, window_duration="1 hour",
                        watermark="2 hours", files_per_trigger=1,
                        checkpoint_dir=ckpt, output_mode="append")
    print("DRAINED")
except Exception as e:
    print("DIED:" + type(e).__name__)
""".format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def phase(mode):
        return subprocess.run(
            [sys.executable, "-c", driver, mode, str(src), ckpt, out],
            capture_output=True, text=True, timeout=300,
        )

    p1 = phase("crash")
    assert "DIED:" in p1.stdout, (p1.stdout[-500:], p1.stderr[-500:])
    p2 = phase("resume")
    assert "DRAINED" in p2.stdout, (p2.stdout[-500:], p2.stderr[-500:])

    deliveries = [json.loads(line) for line in open(out)]
    crash_bids = {d["bid"]: d["rows"] for d in deliveries if d["mode"] == "crash"}
    redelivered = [
        d for d in deliveries
        if d["mode"] == "resume" and d["bid"] in crash_bids and d["rows"]
    ]
    assert redelivered, deliveries
    for d in redelivered:
        assert d["rows"] == crash_bids[d["bid"]], (d, crash_bids[d["bid"]])

    by_bid = {}
    for d in deliveries:
        by_bid[d["bid"]] = d["rows"]  # last delivery per epoch
    US = 1_000_000
    got = {tuple(t) for rows in by_bid.values() for t in rows}
    want = {
        (0, "click", 2, 2.0),
        (HOUR * US, "view", 1, 2.0),
    }
    assert got == want, got
    flat = [tuple(t) for rows in by_bid.values() for t in rows]
    assert len(flat) == len(set(flat))
