"""SnapshotTable commit log: history(), read(at_version=), retention.

The Delta-fidelity gap called out in round 2 — the snapshot sink now
keeps a commit log so past versions stay readable inside a configured
retention window (single-writer; concurrency remains Delta's job).
"""

from __future__ import annotations

import pytest

from changedatacapture_spark.streaming.sink import SnapshotTable


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, op string, v long")


def test_time_travel_reads_past_versions(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), ["k"], n_buckets=4, retain_history=2
    )
    t.merge(_batch(spark, [(1, "c", 10), (2, "c", 20)]), batch_id=0)
    v0 = t.version
    t.merge(_batch(spark, [(1, "u", 11), (3, "c", 30)]), batch_id=1)
    v1 = t.version
    t.merge(_batch(spark, [(2, "d", 0)]), batch_id=2)

    assert {(r.k, r.v) for r in t.read().collect()} == {(1, 11), (3, 30)}
    assert {(r.k, r.v) for r in t.read(at_version=v0).collect()} == {
        (1, 10),
        (2, 20),
    }
    assert {(r.k, r.v) for r in t.read(at_version=v1).collect()} == {
        (1, 11),
        (2, 20),
        (3, 30),
    }
    hist = t.history()
    assert [e["version"] for e in hist] == [v0, v1, t.version]
    assert [e["batch_id"] for e in hist] == [0, 1, 2]


def test_time_travel_beyond_retention_raises(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), ["k"], n_buckets=4, retain_history=1
    )

    def full(rows):
        return spark.createDataFrame(rows, "k long, v long")

    t.overwrite(full([(1, 10)]))
    v0 = t.version
    t.overwrite(full([(1, 11)]))
    t.overwrite(full([(1, 12)]))  # v0's files now beyond retention
    with pytest.raises(ValueError, match="retain_history"):
        t.read(at_version=v0)
    # the previous version is still inside the window
    prev = t.version - 1
    assert [r.v for r in t.read(at_version=prev).collect()] == [11]


def test_time_travel_unknown_version_raises(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    t.merge(_batch(spark, [(1, "c", 10)]), batch_id=0)
    with pytest.raises(ValueError, match="not in commit log"):
        t.read(at_version=99)


def test_retention_zero_keeps_current_readable(spark, tmp_path):
    """Default retain_history=0 preserves the original storage
    behavior: only the live version's files are guaranteed."""
    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    t.merge(_batch(spark, [(1, "c", 10)]), batch_id=0)
    t.merge(_batch(spark, [(1, "u", 11)]), batch_id=1)
    assert [r.v for r in t.read().collect()] == [11]
    assert len(t.history()) == 2


def test_changes_between_versions(spark, tmp_path):
    from pyspark.sql import functions as F

    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(
        spark, str(tmp_path / "cdf"), key_cols=["k"], n_buckets=2,
        retain_history=4,
    )

    def batch(rows):
        df = spark.createDataFrame(rows, "k long, op string, v string")
        table.merge(df)

    batch([(1, "c", "a"), (2, "c", "b"), (3, "c", "c")])
    v1 = table.version
    batch([(2, "u", "B"), (3, "d", None), (4, "c", "d"), (1, "u", "a")])
    v2 = table.version

    got = {
        (r.change_type, r.k, r.v)
        for r in table.changes_between(v1, v2).collect()
    }
    # key 1 rewritten identically -> NOT in the feed
    assert got == {
        ("update_post", 2, "B"),
        ("delete", 3, "c"),
        ("insert", 4, "d"),
    }

    # a version gap spanning several commits nets out intermediate churn
    batch([(4, "d", None)])
    v3 = table.version
    got2 = {
        (r.change_type, r.k, r.v)
        for r in table.changes_between(v1, v3).collect()
    }
    assert got2 == {("update_post", 2, "B"), ("delete", 3, "c")}

    import pytest

    with pytest.raises(ValueError, match="must be >"):
        table.changes_between(v2, v1)


def test_change_feed_replicates_to_second_table(spark, tmp_path):
    """CDF-driven replication: applying the feed between v1 and v2 to a
    replica that was synced at v1 makes it equal the source at v2."""
    from pyspark.sql import functions as F

    from changedatacapture_spark.streaming.sink import SnapshotTable

    src = SnapshotTable(
        spark, str(tmp_path / "src"), key_cols=["k"], n_buckets=2,
        retain_history=4,
    )
    src.merge(spark.createDataFrame(
        [(1, "c", "a"), (2, "c", "b")], "k long, op string, v string"))
    v1 = src.version
    replica = SnapshotTable(spark, str(tmp_path / "rep"), key_cols=["k"],
                            n_buckets=2)
    replica.merge(src.read(at_version=v1).withColumn("op", F.lit("c"))
                  .select("k", "op", "v"))

    src.merge(spark.createDataFrame(
        [(1, "u", "A"), (2, "d", None), (3, "c", "c")],
        "k long, op string, v string"))
    v2 = src.version

    feed = src.changes_between(v1, v2)
    as_changes = feed.select(
        "k",
        F.when(F.col("change_type") == "delete", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        "v",
    )
    replica.merge(as_changes)
    assert (
        sorted((r.k, r.v) for r in replica.read().collect())
        == sorted((r.k, r.v) for r in src.read().collect())
        == [(1, "A"), (3, "c")]
    )


def test_merge_recovers_from_orphan_version_dir(spark, tmp_path):
    """A crash between bucket write and pointer commit leaves an orphan
    staging dir the commit log has never seen. The next merge must not
    adopt it (writer-unique physical dirs make collisions impossible),
    and vacuum must collect it once the in-flight grace window — which
    protects CONCURRENT writers' staging dirs — has expired."""
    import os

    from changedatacapture_spark.streaming.sink import SnapshotTable

    path = str(tmp_path / "t")
    table = SnapshotTable(spark, path, key_cols=["k"], n_buckets=2)
    table.merge(spark.createDataFrame(
        [(1, "c", "a")], "k long, op string, v string"))
    v = table.version
    # simulate the crash: a dead writer's staging files, pointer never
    # flipped (any never-committed physical id looks the same)
    orphan = f"{path}/v={table._new_data_version()}/bucket=0"
    os.makedirs(orphan)
    with open(f"{orphan}/part-stale.parquet", "w") as f:
        f.write("garbage from a dead writer")
    table2 = SnapshotTable(spark, path, key_cols=["k"], n_buckets=2)
    assert table2.version == v  # pointer untouched by the crash
    table2.merge(spark.createDataFrame(
        [(2, "c", "b")], "k long, op string, v string"))
    assert sorted((r.k, r.v) for r in table2.read().collect()) == [
        (1, "a"), (2, "b"),
    ]
    # within the grace window the orphan survives (it could have been a
    # live concurrent writer's staging dir) ...
    assert os.path.exists(f"{orphan}/part-stale.parquet")
    # ... and STILL survives with grace expired while its staging
    # marker stands — a live slow writer is protected however long its
    # write job runs (the round-14 TOCTOU fix) ...
    table2.vacuum_grace_s = 0.0
    table2._vacuum()
    assert os.path.exists(f"{orphan}/part-stale.parquet")
    # ... and is collected once the marker's TTL expires too (the
    # writer is provably dead, not slow)
    table2.staging_ttl_s = 0.0
    table2._vacuum()
    assert not os.path.exists(orphan)
    assert sorted((r.k, r.v) for r in table2.read().collect()) == [
        (1, "a"), (2, "b"),
    ]
