"""Round-18 optimization pins: results must be layout-invariant.

The optimization round changed physical execution only — bucket-local
merge writes, range-partitioned clustered maintenance writes, and
fan-out of narrow scans. Each pin here drives the NEW physical path
and asserts byte-identical logical results against the old one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from changedatacapture_spark.streaming.sink import SnapshotTable


def _rows(t):
    return sorted((r.k, r.v) for r in t.read().collect())


class TestBucketLocalMerge:
    """The broadcast-anti merge may stream kept rows straight from
    their bucket files to the partitioned write (shuffle = batch only)
    once the touched buckets are big enough. Forced on and forced off
    must commit identical logical state."""

    def _drive(self, spark, path, threshold):
        t = SnapshotTable(spark, path, ["k"], n_buckets=4)
        t.bucket_local_merge_bytes = threshold
        t.overwrite(
            spark.createDataFrame(
                [(i, i * 10) for i in range(200)], "k long, v long"
            ),
            batch_id=0,
        )
        t.merge(
            spark.createDataFrame(
                [(5, 5000, "u"), (201, 2010, "c"), (7, 0, "d")],
                "k long, v long, op string",
            ),
            batch_id=1,
        )
        t.merge(
            spark.createDataFrame(
                [(5, 5001, "u"), (202, 2020, "c"), (201, 0, "d")],
                "k long, v long, op string",
            ),
            batch_id=2,
        )
        return t

    def test_forced_bucket_local_equals_repartitioned(self, spark, tmp_path):
        a = self._drive(spark, str(tmp_path / "local"), threshold=0)
        b = self._drive(spark, str(tmp_path / "shuffle"), threshold=None)
        assert a.last_write_report == {"repartitioned": False}
        assert b.last_write_report == {"repartitioned": True}
        assert _rows(a) == _rows(b)
        got = {r.k: r.v for r in a.read().collect()}
        assert got[5] == 5001 and 7 not in got and 201 not in got
        assert got[202] == 2020

    def test_default_threshold_keeps_small_tables_repartitioned(
        self, spark, tmp_path
    ):
        t = self._drive(spark, str(tmp_path / "dflt"), threshold=256 << 20)
        # a 3 KB table never crosses the 256 MiB band
        assert t.last_write_report == {"repartitioned": True}

    def test_bucket_local_keys_stay_routed(self, spark, tmp_path):
        """Point reads (hash-routed) must still find keys written by
        the bucket-local path — i.e. kept rows landed in the right
        bucket dirs, not just somewhere readable."""
        t = self._drive(spark, str(tmp_path / "routed"), threshold=0)
        got = sorted(r.k for r in t.read_keys([5, 202, 42]).collect())
        assert got == [5, 42, 202]


class TestRangeClusteredWrite:
    """Clustered maintenance writes range-partition across the cluster
    instead of one task per bucket; zone-map pruning and logical
    contents must be unchanged."""

    def test_clustered_overwrite_prunes_and_matches(self, spark, tmp_path):
        df = spark.range(0, 4000).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("a"),
            ((F.col("id") * 31) % 89).alias("b"),
        )
        t = SnapshotTable(
            spark,
            str(tmp_path / "rc"),
            ["k"],
            n_buckets=4,
            cluster_cols=["a"],
            max_records_per_file=64,
        )
        t.overwrite(df, batch_id=0)
        out = t.read_where([("a", "between", 10, 20)])
        got = sorted(r.k for r in out.collect())
        want = sorted(
            r.k for r in df.filter(F.col("a").between(10, 20)).collect()
        )
        assert got == want
        rep = t.last_scan_report
        # the range-partitioned write must keep per-file zone maps
        # selective: an 11/97 box keeps well under half the files
        assert rep["files_kept"] * 2 < rep["files_total"], rep
