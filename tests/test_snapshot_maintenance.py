"""SnapshotTable maintenance: compact() (OPTIMIZE analogue),
rebucket() (online bucket-count rewrite), commit-log compaction, and
the corruption-vs-retention read error.

Round-4 items from VERDICT.md: merge-heavy tables need small-file
compaction, and a fixed creation-time ``n_buckets`` needs an online
full-rewrite path that every future writer then honors.
"""

from __future__ import annotations

import glob
import os

import pytest

from changedatacapture_spark.streaming.sink import SnapshotTable


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, op string, v long")


def _contents(t, **kw):
    return sorted((r.k, r.op, r.v) if "op" in t.schema().names else (r.k, r.v)
                  for r in t.read(**kw).collect())


def _parquet_files(path):
    return glob.glob(f"{path}/v=*/bucket=*/*.parquet")


def test_compact_bit_identical_and_bounded_files(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path, ["k"], n_buckets=4)
    # merge-heavy history: every merge fragments its touched buckets
    t.merge(_batch(spark, [(k, "c", k * 10) for k in range(40)]), batch_id=0)
    for i in range(1, 6):
        t.merge(
            _batch(spark, [(k, "u", k * 10 + i) for k in range(i, 40, 7)]),
            batch_id=i,
        )
    t.merge(_batch(spark, [(3, "d", 0), (17, "d", 0)]), batch_id=6)

    before = _contents(t)
    files_before = len(_parquet_files(path))
    versions_before = len(glob.glob(f"{path}/v=*"))

    n_files = t.compact()

    assert _contents(t) == before  # bit-identical logical contents
    # one part file per live bucket, nothing more
    assert n_files <= t.n_buckets
    assert len(_parquet_files(path)) == n_files < files_before
    # every older version dir is unpinned and vacuumed
    assert len(glob.glob(f"{path}/v=*")) == 1 < versions_before
    # replay idempotence survives: same batch_id merge is a no-op
    t.merge(_batch(spark, [(0, "u", 999)]), batch_id=6)
    assert _contents(t) == before


def test_compact_preserves_guarded_tombstones(spark, tmp_path):
    def gb(rows):
        return spark.createDataFrame(rows, "k long, op string, ts long, v long")

    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=4)
    t.merge(gb([(1, "c", 100, 10), (2, "c", 100, 20)]), guard_cols=["ts"],
            batch_id=0)
    t.merge(gb([(2, "d", 200, 0)]), guard_cols=["ts"], batch_id=1)

    t.compact()

    # logical view hides the tombstone; physical view retains it
    assert [r.k for r in t.read().collect()] == [1]
    tomb = [r for r in t.read(include_tombstones=True).collect() if r.op == "d"]
    assert [(r.k, r.ts) for r in tomb] == [(2, 200)]
    # the guard still fends off a late, older upsert after compaction
    t.merge(gb([(2, "u", 150, 21)]), guard_cols=["ts"], batch_id=2)
    assert [r.k for r in t.read().collect()] == [1]


def test_rebucket_preserves_contents_and_guard(spark, tmp_path):
    def gb(rows):
        return spark.createDataFrame(rows, "k long, op string, ts long, v long")

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path, ["k"], n_buckets=2)
    t.merge(gb([(k, "c", 100, k) for k in range(30)]), guard_cols=["ts"],
            batch_id=0)
    t.merge(gb([(5, "d", 200, 0)]), guard_cols=["ts"], batch_id=1)
    before = sorted((r.k, r.v) for r in t.read().collect())

    t.rebucket(8)

    assert sorted((r.k, r.v) for r in t.read().collect()) == before
    # every manifest bucket routes within the new modulus, and the
    # physical dirs it references hold exactly those bucket ids
    manifest = t._bucket_manifest()
    assert set(manifest) <= set(range(8))
    pv = next(iter(set(manifest.values())))
    assert {int(d.split("=")[1]) for d in os.listdir(f"{path}/v={pv}")
            if d.startswith("bucket=")} <= set(range(8))
    # guarded semantics survive the rewrite
    t.merge(gb([(5, "u", 150, 99)]), guard_cols=["ts"], batch_id=2)
    assert 5 not in {r.k for r in t.read().collect()}
    t.merge(gb([(7, "u", 300, 700)]), guard_cols=["ts"], batch_id=3)
    assert (7, 700) in {(r.k, r.v) for r in t.read().collect()}


def test_rebucket_persists_across_instances(spark, tmp_path):
    """A writer constructed with a different default must honor the
    committed bucket count, or its merges would probe the wrong
    buckets and strand live rows (duplicate keys)."""
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path, ["k"], n_buckets=4)
    t.merge(_batch(spark, [(k, "c", k) for k in range(50)]), batch_id=0)
    t.rebucket(16)

    t2 = SnapshotTable(spark, path, ["k"], n_buckets=4)  # stale default
    assert t2.n_buckets == 16
    t2.merge(_batch(spark, [(k, "u", k + 1000) for k in range(0, 50, 5)]),
             batch_id=1)
    got = sorted((r.k, r.v) for r in t2.read().collect())
    want = sorted(
        (k, k + 1000 if k % 5 == 0 else k) for k in range(50)
    )
    assert got == want  # no duplicates, no stale rows


def test_log_compaction_bounds_commit_log(spark, tmp_path):
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path, ["k"], n_buckets=2, retain_history=2)
    t.log_compact_bytes = 2000  # force compaction every few commits
    for i in range(12):
        t.merge(_batch(spark, [(i % 3, "u", i)]), batch_id=i)
    # log bounded: at most retention+1 entries survive a compaction,
    # plus the few commits appended since the last one
    assert os.path.getsize(f"{path}/_LOG") < 4 * t.log_compact_bytes
    hist = t.history()
    assert hist[-1]["version"] == t.version
    assert len(hist) >= t.retain_history + 1
    # time travel within retention still works off the compacted log
    prev = t.version - 1
    assert t.read(at_version=prev).count() == 3


def test_corrupted_current_manifest_raises_distinct_error(spark, tmp_path):
    import shutil

    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path, ["k"], n_buckets=2)
    t.merge(_batch(spark, [(1, "c", 10), (2, "c", 20)]), batch_id=0)
    # externally delete a live bucket dir: this is corruption, and the
    # error must say so instead of blaming retain_history
    victim = glob.glob(f"{path}/v=*/bucket=*")[0]
    shutil.rmtree(victim)
    with pytest.raises(RuntimeError, match="corrupted"):
        t.read()


def test_read_keys_prunes_to_touched_buckets(spark, tmp_path):
    from pyspark.sql import functions as F

    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t"), key_cols=["k"], n_buckets=16)
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(200)], "k long, val string"
    ).withColumn("op", F.lit("c"))
    table.merge(df.select("k", "op", "val"), batch_id=0)

    out = table.read_keys([3, 77, 150])
    got = {(r.k, r.val) for r in out.collect()}
    assert got == {(3, "v3"), (77, "v77"), (150, "v150")}
    # the scan touched only the buckets those keys hash to, not all 16
    dirs = {p.rsplit("/", 2)[-2] for p in out.inputFiles()}
    assert len(dirs) <= 3 < 16
    # absent keys simply don't match
    assert table.read_keys([99999]).count() == 0
    assert table.read_keys([]).count() == 0


def test_read_keys_respects_tombstone_guard(spark, tmp_path):
    from pyspark.sql import functions as F

    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t2"), key_cols=["k"], n_buckets=4)
    ins = spark.createDataFrame(
        [(1, "a", 10, 0), (2, "b", 11, 1)], "k long, val string, ts long, seq long"
    ).withColumn("op", F.lit("c"))
    table.merge(ins.select("k", "op", "ts", "seq", "val"), batch_id=0,
                guard_cols=["ts", "seq"])
    dels = spark.createDataFrame(
        [(1, None, 20, 2)], "k long, val string, ts long, seq long"
    ).withColumn("op", F.lit("d"))
    table.merge(dels.select("k", "op", "ts", "seq", "val"), batch_id=1,
                guard_cols=["ts", "seq"])
    assert table.read_keys([1]).count() == 0          # tombstoned
    assert table.read_keys([1], include_tombstones=True).count() == 1
    assert table.read_keys([2]).count() == 1


def test_merge_widens_int_to_long_and_float_to_double(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t"), key_cols=["k"], n_buckets=2)
    narrow = spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5)], "k long, a int, b float"
    ).withColumn("op", F.lit("c"))
    table.merge(narrow.select("k", "op", "a", "b"), batch_id=0)
    assert isinstance(table.schema()["a"].dataType, T.IntegerType)

    wide = spark.createDataFrame(
        [(3, 2**40, 3.5)], "k long, a long, b double"
    ).withColumn("op", F.lit("c"))
    table.merge(wide.select("k", "op", "a", "b"), batch_id=1)
    assert isinstance(table.schema()["a"].dataType, T.LongType)
    assert isinstance(table.schema()["b"].dataType, T.DoubleType)
    got = {r.k: (r.a, round(r.b, 1)) for r in table.read().collect()}
    assert got == {1: (10, 1.5), 2: (20, 2.5), 3: (2**40, 3.5)}


def test_merge_narrower_batch_coerces_without_schema_change(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t2"), key_cols=["k"], n_buckets=2)
    wide = spark.createDataFrame([(1, 2**40)], "k long, a long").withColumn(
        "op", F.lit("c")
    )
    table.merge(wide.select("k", "op", "a"), batch_id=0)
    narrow = spark.createDataFrame([(2, 7)], "k long, a int").withColumn(
        "op", F.lit("c")
    )
    table.merge(narrow.select("k", "op", "a"), batch_id=1)
    assert isinstance(table.schema()["a"].dataType, T.LongType)
    assert {r.k: r.a for r in table.read().collect()} == {1: 2**40, 2: 7}


def test_merge_rejects_cross_family_type_change(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t3"), key_cols=["k"], n_buckets=2)
    base = spark.createDataFrame([(1, 10)], "k long, a int").withColumn(
        "op", F.lit("c")
    )
    table.merge(base.select("k", "op", "a"), batch_id=0)
    bad = spark.createDataFrame([(2, "oops")], "k long, a string").withColumn(
        "op", F.lit("c")
    )
    with pytest.raises(ValueError, match="not a safe widening"):
        table.merge(bad.select("k", "op", "a"), batch_id=1)


def test_guarded_merge_widens_too(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from changedatacapture_spark.operators.cdc import compact_latest
    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t4"), key_cols=["k"], n_buckets=2)
    b0 = spark.createDataFrame(
        [(1, 1, 1, "c", 10)], "k long, ts long, seq long, op string, a int"
    )
    table.merge(compact_latest(b0, ["k"], ["ts", "seq"]), guard_cols=["ts", "seq"],
                batch_id=0)
    b1 = spark.createDataFrame(
        [(2, 2, 2, "c", 2**40)], "k long, ts long, seq long, op string, a long"
    )
    table.merge(compact_latest(b1, ["k"], ["ts", "seq"]), guard_cols=["ts", "seq"],
                batch_id=1)
    assert isinstance(table.schema()["a"].dataType, T.LongType)
    assert {r.k: r.a for r in table.read().collect()} == {1: 10, 2: 2**40}


def test_widening_refused_when_evolution_off(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from changedatacapture_spark.streaming.sink import SnapshotTable

    table = SnapshotTable(spark, str(tmp_path / "t5"), key_cols=["k"], n_buckets=2)
    base = spark.createDataFrame([(1, 10)], "k long, a int").withColumn(
        "op", F.lit("c")
    )
    table.merge(base.select("k", "op", "a"), batch_id=0)
    wide = spark.createDataFrame([(2, 2**40)], "k long, a long").withColumn(
        "op", F.lit("c")
    )
    with pytest.raises(ValueError, match="evolve_schema is off"):
        table.merge(wide.select("k", "op", "a"), batch_id=1, evolve_schema=False)
