"""Robustness pins: failure modes that would otherwise degrade silently
— catalog staleness after a rewrite, the localCheckpoint release
reflection path, and commit-dir garbage collection."""

from __future__ import annotations

import os

from datawarehouse_project_spark.io import refresh_table, table


def test_refresh_table_invalidates_pinned_listing(spark, tmp_path):
    """table() pins schema + file listing per session, guarded by the
    path's mtime: a LOCAL overwrite re-resolves automatically, and
    refresh_table is the explicit REFRESH TABLE analog (the only form
    for non-statable paths)."""
    d = str(tmp_path)
    spark.range(0, 5).selectExpr("id AS v").write.parquet(f"{d}/t.parquet")
    assert table(spark, d, "t").count() == 5
    (
        spark.range(10, 12)
        .selectExpr("id AS v")
        .write.mode("overwrite")
        .parquet(f"{d}/t.parquet")
    )
    # mtime changed → the memo self-heals without an explicit refresh
    vals = sorted(r["v"] for r in table(spark, d, "t").collect())
    assert vals == [10, 11]
    # the explicit refresh path and its scoped variants stay available
    refresh_table(spark, d, "t")
    assert sorted(r["v"] for r in table(spark, d, "t").collect()) == [10, 11]
    refresh_table(spark, d)
    refresh_table(spark)
    # and the memo still memoizes: same handle back on repeated calls
    h1 = table(spark, d, "t")
    h2 = table(spark, d, "t")
    assert h1 is h2


def test_release_checkpoint_reflection_path_exists(spark):
    """_release_checkpoint digs through private py4j accessors
    (queryExecution().analyzed().rdd().unpersist) with failures
    swallowed — a Spark upgrade that renames the chain would silently
    turn eager release into a slow leak. Pin the chain loudly here."""
    df = spark.range(0, 10).localCheckpoint(eager=True)
    qe = df._jdf.queryExecution()
    rdd = qe.analyzed().rdd()  # raises AttributeError/Py4JError if renamed
    sl = rdd.getStorageLevel()
    assert sl.useMemory() or sl.useDisk(), (
        "localCheckpoint RDD is not persisted — the release path's "
        "premise changed"
    )
    rdd.unpersist(False)
    sl2 = rdd.getStorageLevel()
    assert not (sl2.useMemory() or sl2.useDisk())


def test_vacuum_reaps_orphan_tmp_manifests(spark, tmp_path):
    from datawarehouse_project_spark.sources.sinks import (
        VersionedParquetTable,
    )

    vt = VersionedParquetTable(str(tmp_path / "vt"))
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    vt.upsert(spark, df, ["id"])
    # simulate a writer that crashed between link() and unlink()
    stale = os.path.join(vt._commits, ".tmp-deadbeef")
    with open(stale, "w") as fh:
        fh.write("orphan")
    os.utime(stale, (1, 1))  # far in the past → beyond any grace window
    fresh = os.path.join(vt._commits, ".tmp-cafebabe")
    with open(fresh, "w") as fh:
        fh.write("in-flight")
    removed = vt.vacuum(keep=2, orphan_grace_sec=3600)
    assert not os.path.exists(stale), "stale tmp manifest must be reaped"
    assert os.path.exists(fresh), "fresh tmp manifest is a racing writer"
    assert removed >= 1
    # reads unaffected
    assert vt.read(spark).count() == 1
