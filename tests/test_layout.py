"""Z-order expressions + clustered (sorted) snapshot writes."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from changedatacapture_spark.operators.layout import (
    minmax_scale16,
    zorder16,
    zorder16_sql,
)
from changedatacapture_spark.streaming.sink import SnapshotTable


def _py_zorder16(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder16_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 8)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", zorder16(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r.z == _py_zorder16(r.a, r.b), (r.a, r.b)


def test_zorder16_sql_twin_agrees(spark):
    df = spark.createDataFrame(
        [(3, 5), (1000, 2000), (65535, 1)], "a long, b long"
    )
    got = df.select(
        zorder16(F.col("a"), F.col("b")).alias("z1"),
        F.expr(zorder16_sql("a", "b")).alias("z2"),
    ).collect()
    assert all(r.z1 == r.z2 for r in got)


def test_minmax_scale16_bounds(spark):
    df = spark.createDataFrame([(0,), (500,), (1000,)], "v long")
    got = [
        r.s for r in df.select(minmax_scale16(F.col("v"), 0, 1000).alias("s")).collect()
    ]
    assert got[0] == 0 and got[2] == 65535 and 0 < got[1] < 65535


def test_clustered_write_sorts_files(spark, tmp_path):
    import pyarrow.parquet as pq

    table = SnapshotTable(
        spark,
        str(tmp_path / "t"),
        key_cols=["k"],
        n_buckets=4,
        cluster_cols=["ts_us"],
    )
    # shuffled insert order: clustering must still sort within files
    rows = [(k, (k * 7919) % 1000, f"v{k}") for k in range(500)]
    df = spark.createDataFrame(rows, "k long, ts_us long, val string").withColumn(
        "op", F.lit("c")
    )
    table.merge(df.select("k", "op", "ts_us", "val"), batch_id=0)
    files = glob.glob(f"{tmp_path}/t/v=*/bucket=*/*.parquet")
    assert files
    for f in files:
        ts = pq.read_table(f, columns=["ts_us"])["ts_us"].to_pylist()
        assert ts == sorted(ts), f"unsorted file {os.path.basename(f)}"


def test_cluster_cols_persist_across_instances(spark, tmp_path):
    path = str(tmp_path / "t2")
    t1 = SnapshotTable(
        spark, path, key_cols=["k"], n_buckets=2, cluster_cols=["ts_us"]
    )
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "k long, ts_us long, val string"
    ).withColumn("op", F.lit("c"))
    t1.merge(df.select("k", "op", "ts_us", "val"), batch_id=0)
    # a fresh handle with no cluster_cols adopts the committed layout
    t2 = SnapshotTable(spark, path, key_cols=["k"])
    assert t2.cluster_cols == ["ts_us"]


def test_unclustered_table_unaffected(spark, tmp_path):
    table = SnapshotTable(spark, str(tmp_path / "t3"), key_cols=["k"], n_buckets=2)
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, val string"
    ).withColumn("op", F.lit("c"))
    table.merge(df.select("k", "op", "val"), batch_id=0)
    assert sorted(r.k for r in table.read().collect()) == [1, 2]
    assert table.cluster_cols == []
