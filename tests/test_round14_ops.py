"""Round-14 operator tests: heavy-hitter NULL-key contract, bloom
IN-list probe skipping, bin-packed rewrites, JoinView x MoR."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_spark.streaming.sink import SnapshotTable


def test_heavy_hitters_null_keys_excluded(spark):
    """NULL keys (ADVICE round-14): the whole family computes over the
    NON-NULL key population — totals and thresholds included — and
    NULL never appears as an output key, matching a SQL oracle with
    WHERE key IS NOT NULL."""
    from changedatacapture_spark.operators.stats import (
        calibrated_heavy_hitters,
        exact_heavy_hitters,
    )

    rows = [(1,)] * 60 + [(2,)] * 30 + [(None,)] * 50 + [(3,)] * 10
    df = spark.createDataFrame(rows, "k long").repartition(7)

    out = exact_heavy_hitters(df, "k", k=3, capacity=8).collect()
    got = {r.key: (r.n_rows, r.total_rows) for r in out}
    # non-null population is 100 rows; k=3 → count*3 > 100
    assert None not in got
    assert got == {1: (60, 100)}

    cal = calibrated_heavy_hitters(df, "k", sample_mod=1).collect()
    assert all(r.key is not None for r in cal)
    assert all(r.total_rows == 100 for r in cal)
    # sample_mod=1 samples every key: threshold = max count = 60
    assert {r.key for r in cal} == {1}


def test_bloom_in_list_pruning(spark, tmp_path):
    """IN-list probes compose with manifest blooms (verdict #5): a
    file/bucket survives iff ANY listed literal may be present
    (per-literal bloom OR-fold). Pins: kept < total for present
    values, 0 kept when every value is provably absent, and legacy
    bloom-less buckets always survive."""

    path = str(tmp_path / "t")
    t = SnapshotTable(
        spark, path, ["k"], n_buckets=8, bloom_cols=["tag"]
    )
    t.overwrite(
        spark.createDataFrame(
            [(k, f"t{k}", k) for k in range(200)],
            "k long, tag string, v long",
        )
    )
    # two present values -> at most their two home buckets (+ rare
    # bloom false positives) are scheduled
    out = t.read_where([("tag", "in", ["t3", "t77"])])
    rep = dict(t.last_scan_report)
    assert rep["buckets_kept"] < rep["buckets_total"] == 8
    assert rep["buckets_kept"] <= 3
    assert sorted(r.k for r in out.collect()) == [3, 77]

    # all values absent (inside the lexicographic range, so only the
    # bloom can exclude them) -> zero buckets scheduled, empty result
    out = t.read_where([("tag", "in", ["t3x", "t77x"])])
    rep = dict(t.last_scan_report)
    assert rep["buckets_kept"] == 0
    assert out.count() == 0

    # legacy table without blooms: IN-list pruning must never exclude
    # a bucket it cannot prove empty
    plain = SnapshotTable(spark, str(tmp_path / "p"), ["k"], n_buckets=8)
    plain.overwrite(
        spark.createDataFrame(
            [(k, f"t{k}", k) for k in range(200)],
            "k long, tag string, v long",
        )
    )
    out = plain.read_where([("tag", "in", ["t3", "t77"])])
    rep = dict(plain.last_scan_report)
    assert rep["buckets_kept"] == rep["buckets_total"] == 8
    assert sorted(r.k for r in out.collect()) == [3, 77]


def test_compact_target_file_bytes_bin_packs(spark, tmp_path):
    """compact(target_file_bytes=...) (verdict #3): a fragmented
    clustered table rewrites to far fewer, size-targeted files;
    contents are bit-identical and per-file zone pruning still
    prunes."""

    t = SnapshotTable(
        spark,
        str(tmp_path / "t"),
        ["k"],
        n_buckets=4,
        cluster_cols=["v"],
        max_records_per_file=8,
    )
    rows = [(k, k % 997, f"p{k}") for k in range(2000)]
    t.overwrite(
        spark.createDataFrame(rows, "k long, v long, p string")
    )
    before = sorted((r.k, r.v, r.p) for r in t.read().collect())
    frag = t.compact()  # 8-row cap still applies: stays fragmented
    assert frag >= 100

    # huge byte target -> rows-per-file >> bucket size -> 1 file/bucket
    packed = t.compact(target_file_bytes=1 << 30)
    assert packed == 4
    assert sorted((r.k, r.v, r.p) for r in t.read().collect()) == before

    # the rewrite kept the cluster sort: a narrow range probe still
    # prunes buckets whose v-zone cannot match
    t.read_where([("v", "between", 0, 3)])
    rep = dict(t.last_scan_report)
    assert rep["files_total"] == 4


def test_pipeline_health_audit(spark, tmp_path):
    """attach_health_audit (verdict #8): post-batch fsck + volume
    control appended as one JSON audit row per batch — a flood batch
    flags out_of_control, a vanished bucket path flips fsck_ok, an
    unreferenced version dir counts as an orphan, and a foreachBatch
    replay appends nothing."""
    import json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from changedatacapture_spark.streaming.pipeline import CdcPipeline

    table = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    record = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    pipe = CdcPipeline(spark, record, table, "k")
    audit = str(tmp_path / "audit.jsonl")
    pipe.attach_health_audit(audit, sigma=3.0, min_history=3)

    def env(rows):
        df = spark.createDataFrame(rows, "k long, v long, op string")
        doc = F.struct("k", "v")
        return df.select(
            F.to_json(
                F.struct(
                    F.struct(
                        F.when(F.col("op") != "c", doc).alias("before"),
                        F.when(F.col("op") != "d", doc).alias("after"),
                        F.col("op").alias("op"),
                        F.col("v").alias("ts_ms"),
                    ).alias("payload")
                )
            ).alias("value"),
            F.col("k").alias("seq"),
        )

    def lines():
        with open(audit) as f:
            return [json.loads(x) for x in f if x.strip()]

    # steady feed: 4 batches x 3 rows — all in control, fsck green
    for b in range(4):
        pipe.process_batch(env([(b * 3 + i, i, "c") for i in range(3)]), b)
    rows = lines()
    assert len(rows) == 4
    assert all(r["fsck_ok"] and not r["volume_out_of_control"] for r in rows)
    assert rows[0]["volume_mean"] is None  # below min_history
    assert rows[3]["volume_mean"] == 3.0  # exact history of 3s

    # replay of batch 3: merge skips, audit appends nothing
    pipe.process_batch(env([(99, 9, "c")]), 3)
    assert len(lines()) == 4

    # flood batch: 60 rows against a mean of 3, sigma 0 -> flagged
    pipe.process_batch(env([(100 + i, i, "c") for i in range(60)]), 4)
    rows = lines()
    assert rows[-1]["rows"] == 60 and rows[-1]["volume_out_of_control"]

    # an orphan staging dir (crashed writer) is reported, not fatal
    os.makedirs(f"{table.path}/v=123456789/bucket=0")
    pipe.process_batch(env([(200, 1, "c"), (201, 1, "c"), (202, 1, "c")]), 5)
    rows = lines()
    assert rows[-1]["fsck_orphans"] >= 1 and rows[-1]["fsck_ok"]

    # a vanished CURRENT bucket path flips fsck_ok False. (A further
    # merge would fail loudly on the missing files before the audit
    # ran — correct; the audit row is how the NEXT healthy trigger, or
    # an operator, sees what fsck sees, so drive the hook directly.)
    import shutil

    ptr = table._read_pointer()
    b0, v0 = next(iter(ptr["buckets"].items()))
    shutil.rmtree(f"{table.path}/v={v0}/bucket={b0}")
    row = pipe._run_health_audit(6, 3)
    assert row["fsck_ok"] is False and row["fsck_missing"] >= 1
    assert lines()[-1]["fsck_ok"] is False


def test_join_view_key_type_drift_routes_correctly(spark, tmp_path):
    """Review fix: a delta whose key arrived NARROWER than the
    committed key type (int vs long) must hash to the committed
    buckets — otherwise read_buckets misses the rows and the view
    emits false deletes."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from changedatacapture_spark.streaming.pipeline import JoinView

    fact = SnapshotTable(spark, str(tmp_path / "f"), ["k"], n_buckets=8)
    dim = SnapshotTable(spark, str(tmp_path / "d"), ["d"], n_buckets=2)
    view = SnapshotTable(spark, str(tmp_path / "v"), ["k"], n_buckets=8)
    jv = JoinView(
        spark, fact, dim, view,
        fact_key_cols=["k"], join_col="d", dim_payload_cols=["label"],
    )
    a1 = spark.createDataFrame(
        [(k, k % 2, k, "c") for k in range(20)],
        "k long, d long, v long, op string",
    )
    d1 = spark.createDataFrame(
        [(0, "even", "c"), (1, "odd", "c")],
        "d long, label string, op string",
    )
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)

    # the drifted delta: INT keys against the LONG-keyed fact
    a2 = spark.createDataFrame(
        [(3, 1, 333, "u"), (4, 0, 444, "u")],
        T.StructType(
            [
                T.StructField("k", T.IntegerType()),
                T.StructField("d", T.LongType()),
                T.StructField("v", T.LongType()),
                T.StructField("op", T.StringType()),
            ]
        ),
    )
    fact.merge(a2, batch_id=1)
    jv.apply(a2, None, batch_id=1)
    got = {(r.k, r.v) for r in view.read().collect()}
    assert (3, 333) in got and (4, 444) in got
    assert len(got) == 20  # nothing falsely deleted


def test_join_view_null_values_never_mask_inlist_overflow(spark, tmp_path):
    """Review fix: NULL join values are dropped BEFORE the
    max_inlist+1 overflow probe — with NULLs in the sample a genuine
    overflow previously looked like a fit and silently truncated the
    dim read (live rows evicted as deletes)."""
    from changedatacapture_spark.streaming.pipeline import JoinView

    fact = SnapshotTable(spark, str(tmp_path / "f"), ["k"], n_buckets=4)
    dim = SnapshotTable(spark, str(tmp_path / "d"), ["d"], n_buckets=2)
    view = SnapshotTable(spark, str(tmp_path / "v"), ["k"], n_buckets=4)
    jv = JoinView(
        spark, fact, dim, view,
        fact_key_cols=["k"], join_col="d", dim_payload_cols=["label"],
        max_inlist=3,  # tiny cap: 6 distinct values overflow it
    )
    rows = [(k, k % 6, k, "c") for k in range(18)]
    rows += [(100, None, 100, "c"), (101, None, 101, "c")]
    a1 = spark.createDataFrame(rows, "k long, d long, v long, op string")
    d1 = spark.createDataFrame(
        [(i, f"L{i}", "c") for i in range(6)],
        "d long, label string, op string",
    )
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)
    got = sorted((r.k, r.label) for r in view.read().collect())
    want = sorted((k, f"L{k % 6}") for k in range(18))
    assert got == want  # all 6 dims enriched; NULL-d rows absent


def test_text_index_append_backfills_legacy_markers(spark, tmp_path):
    """Review fix: the FIRST append to a pre-marker index must bless
    the existing (legacy) segments with backfilled markers — not hide
    the whole old corpus behind the new marker set."""
    import os

    from changedatacapture_spark.operators.text import (
        bm25_topk,
        bm25_topk_indexed,
        build_text_index,
    )

    import shutil

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha delta"), (3, "beta beta alpha")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_text_index(base, idx)
    shutil.rmtree(f"{idx}/_segments")  # simulate the legacy layout

    delta = spark.createDataFrame(
        [(4, "alpha beta beta")], "doc_id long, text string"
    )
    build_text_index(delta, idx, mode="append")
    # a stray non-numeric file must never crash the probe
    with open(f"{idx}/_segments/.DS_Store", "w"):
        pass
    final = base.unionByName(delta)
    terms = ["alpha", "beta"]
    got = sorted(map(tuple, bm25_topk_indexed(spark, idx, terms, 10).collect()))
    want = sorted(map(tuple, bm25_topk(final, terms, 10).collect()))
    assert got == want
    assert len(os.listdir(f"{idx}/_segments")) >= 3  # legacy + new + stray


def test_vacuum_sweeps_expired_dirless_staging_markers(spark, tmp_path):
    """Review fix: a writer that aborted BEFORE creating its v= dir
    leaves a marker the dir loop never visits; expired dirless markers
    are swept so churny retry workloads don't accumulate them."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.merge(
        spark.createDataFrame([(1, "c", 1)], "k long, op string, v long"),
        batch_id=0,
    )
    pv = t._new_data_version()  # marker dropped, no dir ever written
    assert os.path.exists(f"{t.path}/_staging/{pv}")
    t._vacuum()
    assert os.path.exists(f"{t.path}/_staging/{pv}")  # inside TTL: kept
    t.staging_ttl_s = 0.0
    t._vacuum()
    assert not os.path.exists(f"{t.path}/_staging/{pv}")
