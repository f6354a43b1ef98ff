"""Round-13 hardening: ADVICE fixes from the round-12 review.

1. ``_commit`` refuses a manifest/run that references freshly written
   paths a racing writer's vacuum already deleted (the long-write
   vacuum-grace race).
2. Empty merge-on-read micro-batches commit no run entry (idle streams
   must not bloat the pointer or the compaction cadence).
3. Quantile-sketch bottom-k windows tie-break by ``(hv, v)`` so the
   sketch stays deterministic under id reuse.
4. ``lsh_incremental_candidates`` never counts a re-ingested doc id as
   its own duplicate partner.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from changedatacapture_spark.streaming.sink import (
    ConcurrentWriteError,
    SnapshotTable,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, op string, v long")


# -- 1. vacuum-race commit guard -----------------------------------------


def test_commit_refuses_vacuumed_staging_dir(spark, tmp_path, monkeypatch):
    """A writer whose write job outlives the vacuum grace window can
    have its staging dir rmtree'd by a racing winner's vacuum; the
    pointer CAS alone would let it commit a manifest referencing
    deleted files. The pre-flip existence check must fail it loudly."""
    path = str(tmp_path / "t")
    seed = SnapshotTable(spark, path, ["k"], n_buckets=2)
    seed.merge(_batch(spark, [(0, "c", 1), (1, "c", 2)]), batch_id=0)
    t = SnapshotTable(spark, path, ["k"], n_buckets=2)

    orig = SnapshotTable._do_write_buckets

    def hook(self, df, version, dynamic=False, records_per_file=None, **kw):
        written = orig(self, df, version, dynamic, records_per_file, **kw)
        if self is t:
            # simulate the racing vacuum landing after the write job
            # finished but before this writer's commit
            shutil.rmtree(f"{self.path}/v={version}")
        return written

    monkeypatch.setattr(SnapshotTable, "_do_write_buckets", hook)
    with pytest.raises(ConcurrentWriteError, match="no longer exist"):
        t.merge(_batch(spark, [(0, "u", 7)]), batch_id=1)
    # the table is uncorrupted: the loser never flipped the pointer
    t2 = SnapshotTable(spark, path, ["k"], n_buckets=2)
    assert sorted((r.k, r.v) for r in t2.read().collect()) == [(0, 1), (1, 2)]
    assert t2.version == 0


def test_commit_guard_applies_to_mor_runs(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    seed = SnapshotTable(spark, path, ["k"], n_buckets=2)
    seed.merge(_batch(spark, [(0, "c", 1)]), batch_id=0)
    t = SnapshotTable(spark, path, ["k"], n_buckets=2)

    orig = SnapshotTable._do_write_buckets

    def hook(self, df, version, dynamic=False, records_per_file=None, **kw):
        written = orig(self, df, version, dynamic, records_per_file, **kw)
        if self is t:
            shutil.rmtree(f"{self.path}/v={version}")
        return written

    monkeypatch.setattr(SnapshotTable, "_do_write_buckets", hook)
    with pytest.raises(ConcurrentWriteError, match="no longer exist"):
        t.merge(_batch(spark, [(0, "u", 9)]), batch_id=1, mode="mor")
    t2 = SnapshotTable(spark, path, ["k"], n_buckets=2)
    assert (t2._read_pointer().get("runs") or []) == []
    assert sorted((r.k, r.v) for r in t2.read().collect()) == [(0, 1)]


# -- 2. empty MoR batches commit nothing ----------------------------------


def test_mor_empty_batch_commits_no_run_entry(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.merge(_batch(spark, [(0, "c", 1), (1, "c", 2)]), batch_id=0)
    t.merge(_batch(spark, [(0, "u", 10)]), batch_id=1, mode="mor")
    v = t.version
    runs = list(t._read_pointer().get("runs") or [])
    # idle-stream tick: an empty micro-batch with the table's schema
    empty = _batch(spark, []).limit(0)
    t.merge(empty, batch_id=2, mode="mor")
    assert t.version == v, "empty MoR batch must not commit"
    assert (t._read_pointer().get("runs") or []) == runs
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(0, 10), (1, 2)]


def test_mor_empty_batch_with_new_column_still_evolves(spark, tmp_path):
    """An empty batch that widens the schema commits the evolution but
    appends no run entry."""
    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.merge(_batch(spark, [(0, "c", 1)]), batch_id=0)
    runs_before = list(t._read_pointer().get("runs") or [])
    v = t.version
    empty_wide = spark.createDataFrame(
        [], "k long, op string, v long, extra string"
    )
    t.merge(empty_wide, batch_id=1, mode="mor")
    assert t.version == v + 1
    assert (t._read_pointer().get("runs") or []) == runs_before
    assert "extra" in t.read().columns


# -- size-based MoR compaction policy --------------------------------------


def test_compact_by_size_tiers(spark, tmp_path):
    """Deterministic policy behavior: below both thresholds → none;
    past the minor ratio with ≥2 runs → minor fold (runs collapse to
    one, base untouched); past the major ratio → major fold (runs
    absorbed, base rewritten)."""
    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.merge(
        _batch(spark, [(k, "c", k) for k in range(200)]), batch_id=0
    )
    base_v = {int(v) for v in t._read_pointer()["buckets"].values()}
    t.merge(_batch(spark, [(0, "u", 100)]), batch_id=1, mode="mor")
    t.merge(_batch(spark, [(1, "u", 101)]), batch_id=2, mode="mor")
    assert len(t._read_pointer()["runs"]) == 2
    assert t.pending_run_bytes() > 0 and t.base_bytes() > 0
    # two tiny runs against a 200-row base: far below a 1e9 ratio
    assert t.compact_by_size(1e9, 1e9) == "none"
    assert len(t._read_pointer()["runs"]) == 2
    # minor tier: folds the two runs into one, base versions unchanged
    assert t.compact_by_size(0.0, None) == "minor"
    ptr = t._read_pointer()
    assert len(ptr["runs"]) == 1
    assert {int(v) for v in ptr["buckets"].values()} == base_v
    # single pending run: minor is not re-armed (needs >= 2 runs) ...
    assert t.compact_by_size(0.0, None) == "none"
    # ... but the major tier absorbs it into a rewritten base
    assert t.compact_by_size(None, 0.0) == "major"
    ptr = t._read_pointer()
    assert (ptr.get("runs") or []) == []
    assert {int(v) for v in ptr["buckets"].values()} != base_v
    rows = dict((r.k, r.v) for r in t.read().collect())
    assert rows[0] == 100 and rows[1] == 101 and rows[7] == 7


def test_pipeline_size_policy_bounds_runs(spark, tmp_path):
    """CdcPipeline with compact_minor_ratio keeps the pending-run list
    byte-bounded across high-churn batches, and the result matches the
    logical fold."""
    from changedatacapture_spark.operators.cdc import compact_latest

    t = SnapshotTable(spark, str(tmp_path / "t"), ["k"], n_buckets=2)
    t.merge(_batch(spark, [(k, "c", 0) for k in range(50)]), batch_id=0)
    # every batch rewrites every key: pending bytes ≈ base bytes per
    # batch, so a 0.5 minor ratio folds on (roughly) every evaluation
    for i in range(1, 5):
        b = compact_latest(
            _batch(spark, [(k, "u", i) for k in range(50)]),
            ["k"],
            ["v"],
        )
        t.merge(b, batch_id=i, mode="mor")
        t.compact_by_size(0.5, None)
    assert len(t._read_pointer()["runs"]) <= 2
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (k, 4) for k in range(50)
    ]


# -- fsck -------------------------------------------------------------------


def test_fsck_healthy_and_broken(spark, tmp_path):
    import os

    t = SnapshotTable(
        spark, str(tmp_path / "t"), ["k"], n_buckets=2, retain_history=1
    )
    t.merge(_batch(spark, [(0, "c", 1), (1, "c", 2)]), batch_id=0)
    t.merge(_batch(spark, [(0, "u", 10)]), batch_id=1, mode="mor")
    rep = t.fsck()
    assert rep["ok"] and not rep["missing"] and not rep["orphans"]
    # an unreferenced staging dir is an orphan, not a failure
    os.makedirs(f"{t.path}/v=999999", exist_ok=True)
    rep = t.fsck()
    assert rep["ok"] and rep["orphans"] == [999999]
    # deleting a run's bucket dir breaks the current pointer: not ok
    run = (t._read_pointer().get("runs") or [])[0]
    shutil.rmtree(f"{t.path}/v={run['v']}/bucket={run['buckets'][0]}")
    rep = t.fsck()
    assert not rep["ok"]
    assert any(f"v={run['v']}" in p for p in rep["missing"])


# -- bloom-filter data skipping ---------------------------------------------


def test_bloom_skipping_point_lookup(spark, tmp_path):
    """Equality probes on a high-cardinality column prune buckets via
    the manifest blooms where zone maps cannot (a uniform column's
    per-bucket [min, max] spans everything); results stay exact."""
    from changedatacapture_spark.streaming.sink import _bloom_contains

    t = SnapshotTable(
        spark, str(tmp_path / "t"), ["k"], n_buckets=8,
        bloom_cols=["tag"],
    )
    rows = [(k, f"tag-{k * 7919 % 100000}", k) for k in range(400)]
    t.overwrite(
        spark.createDataFrame(rows, "k long, tag string, v long")
    )
    ptr = t._read_pointer()
    zones = ptr["stats"]
    assert any("bloom__tag" in z for z in zones.values())
    # a present value: found exactly, with fewer buckets scanned
    probe = rows[123][1]
    got = t.read_where([("tag", "=", probe)]).collect()
    assert [(r.k, r.v) for r in got] == [(123, 123)]
    rep = t.last_scan_report
    assert rep["buckets_kept"] < rep["buckets_total"], rep
    # an absent value whose bloom check fails everywhere: zero buckets
    missing = "tag-none-such"
    assert not any(
        _bloom_contains(z["bloom__tag"], missing, "str")
        for z in zones.values()
        if "bloom__tag" in z
    )
    assert t.read_where([("tag", "=", missing)]).count() == 0
    assert t.last_scan_report["buckets_kept"] == 0
    # exactness against the unpruned definition
    full = sorted(
        (r.k, r.v)
        for r in t.read().filter(F.col("tag") == probe).collect()
    )
    assert full == [(123, 123)]


def test_bloom_int_column_and_range_predicates_unaffected(spark, tmp_path):

    t = SnapshotTable(
        spark, str(tmp_path / "t"), ["k"], n_buckets=8,
        bloom_cols=["seq"],
    )
    t.overwrite(
        spark.createDataFrame(
            [(k, k * 7919 % 100000, k) for k in range(400)],
            "k long, seq long, v long",
        )
    )
    probe = 123 * 7919 % 100000
    got = t.read_where([("seq", "=", probe)]).collect()
    assert [(r.k, r.v) for r in got] == [(123, 123)]
    assert (
        t.last_scan_report["buckets_kept"]
        < t.last_scan_report["buckets_total"]
    )
    # range predicates never consult blooms: full exact answer
    n = t.read_where([("seq", ">=", 0)]).count()
    assert n == 400


def test_bloom_in_list_pruning(spark, tmp_path):
    """IN-list predicates prune per value: a list of two present
    values keeps their buckets; an all-absent list keeps none; an
    empty list reads nothing. Results stay exact."""

    t = SnapshotTable(
        spark, str(tmp_path / "t"), ["k"], n_buckets=8, bloom_cols=["tag"],
    )
    rows = [(k, f"tag-{k * 7919 % 100000}", k) for k in range(400)]
    t.overwrite(spark.createDataFrame(rows, "k long, tag string, v long"))
    probes = [rows[123][1], rows[321][1]]
    got = sorted(
        (r.k, r.v) for r in t.read_where([("tag", "in", probes)]).collect()
    )
    assert got == [(123, 123), (321, 321)]
    rep = t.last_scan_report
    assert rep["buckets_kept"] < rep["buckets_total"], rep
    assert t.read_where([("tag", "in", ["no-1", "no-2"])]).count() == 0
    assert t.last_scan_report["buckets_kept"] == 0
    assert t.read_where([("tag", "in", [])]).count() == 0


def test_bloom_probe_literal_rendering(spark, tmp_path):
    """A numerically-equal but differently-rendered literal (5.0
    probing a long column whose write side hashed "5") must NOT be
    pruned away: the probe normalizes to the column's CAST-AS-STRING
    domain, and un-normalizable literals never prune."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), ["k"], n_buckets=4, bloom_cols=["seq"],
    )
    t.overwrite(
        spark.createDataFrame(
            [(k, k, k) for k in range(50)], "k long, seq long, v long"
        )
    )
    got = t.read_where([("seq", "=", 5.0)]).collect()
    assert [(r.k, r.v) for r in got] == [(5, 5)]
    got = t.read_where([("seq", "in", [5.0, 7])]).collect()
    assert sorted((r.k, r.v) for r in got) == [(5, 5), (7, 7)]
    # a non-integral float probe matches nothing but must not crash
    assert t.read_where([("seq", "=", 5.5)]).count() == 0


def test_text_index_recrawl_tombstones(spark, tmp_path):
    """Re-crawled docs: appending their new segment WITH tombstones
    masks the stale segment, so the indexed BM25 equals a fresh build
    over the final corpus (no double-counting in N/L/df/tf)."""
    from changedatacapture_spark.operators.text import (
        bm25_topk,
        bm25_topk_indexed,
        build_text_index,
    )

    final = [
        (1, "alpha beta gamma"),
        (2, "alpha alpha delta"),
        (3, "beta beta beta alpha"),
        (4, "gamma delta alpha beta"),
    ]
    docs = spark.createDataFrame(final, "doc_id long, text string")
    stale = spark.createDataFrame(
        [(1, "stale words only"), (2, "alpha alpha delta")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_text_index(stale, idx)
    delta = docs.filter(F.col("doc_id").isin(1, 3, 4))  # re-crawl 1 + new
    build_text_index(
        delta, idx, mode="append",
        tombstone_docs=delta.filter(F.col("doc_id") == 1).select("doc_id"),
    )
    terms = ["alpha", "beta"]
    got = sorted(map(tuple, bm25_topk_indexed(spark, idx, terms, 10).collect()))
    want = sorted(map(tuple, bm25_topk(docs, terms, 10).collect()))
    assert got == want


def test_bloom_absent_zone_survives(spark, tmp_path):
    """Buckets committed WITHOUT blooms (table written before the
    column was bloom-indexed) must always survive — pruning is an
    optimization, never a correctness gate."""
    path = str(tmp_path / "t")
    plain = SnapshotTable(spark, path, ["k"], n_buckets=4)
    plain.overwrite(
        spark.createDataFrame(
            [(k, f"tag-{k}", k) for k in range(50)],
            "k long, tag string, v long",
        )
    )
    bloomy = SnapshotTable(spark, path, ["k"], n_buckets=4, bloom_cols=["tag"])
    got = bloomy.read_where([("tag", "=", "tag-7")]).collect()
    assert [(r.k, r.v) for r in got] == [(7, 7)]


# -- 3. qsketch (hv, v) determinism ---------------------------------------


def test_qsketch_partial_deterministic_under_id_reuse(spark):
    """Two rows sharing an id collide on hv; the (hv, v) tie-break must
    make the bottom-k selection deterministic (k smaller than the
    collision group, so which row survives is decided by the order)."""
    from changedatacapture_spark.operators.stats import qsketch_partial

    rows = [("g", float(i % 3), 7) for i in range(6)] + [
        ("g", 42.0, 1),
        ("g", 43.0, 2),
    ]
    df = spark.createDataFrame(rows, "grp string, value double, id long")
    out = sorted(
        tuple(r)
        for r in qsketch_partial(
            df, "grp", "value", "id", k=4, n_cells=2
        ).collect()
    )
    out2 = sorted(
        tuple(r)
        for r in qsketch_partial(
            df.repartition(7), "grp", "value", "id", k=4, n_cells=2
        ).collect()
    )
    assert out == out2
    assert len(out) == 4
    # the colliding id-group contributes its SMALLEST values: all six
    # duplicate-id rows share one hv, so (hv, v) order admits v
    # ascending — never an arbitrary pick
    from collections import Counter

    dup_hv = Counter(h for *_, h in out).most_common(1)[0][0]
    dup_vals = [v for (_, v, h) in out if h == dup_hv]
    assert dup_vals == sorted(dup_vals)


def test_qsketch_stream_equals_batch_with_duplicate_ids(spark):
    from changedatacapture_spark.operators.stats import (
        qsketch_finalize,
        qsketch_partial,
        quantile_sketch,
    )

    rows = [("g", float(i), i % 5) for i in range(40)]  # heavy id reuse
    df = spark.createDataFrame(rows, "grp string, value double, id long")
    whole = quantile_sketch(df, "grp", "value", "id", k=8)
    p1 = qsketch_partial(df.filter("value < 13"), "grp", "value", "id", k=8)
    p2 = qsketch_partial(df.filter("value >= 13"), "grp", "value", "id", k=8)
    merged = qsketch_finalize(
        p1.unionByName(p2), df, "grp", "value", "id", k=8
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


# -- 4. incremental LSH self-match guard ----------------------------------


def test_lsh_incremental_recrawled_id_not_own_partner(spark):
    """A delta doc whose id already exists in the corpus (the re-crawl
    change-feed shape) must not count itself as its own duplicate."""
    from changedatacapture_spark.operators.dedup import (
        lsh_incremental_candidates,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different content with no shared shingles at all"
    corpus = spark.createDataFrame(
        [(1, text), (2, other)], "doc_id long, text string"
    )
    delta = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = lsh_incremental_candidates(
        delta, corpus, n_hashes=4, bands=2, k=5
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.doc_id == 1
    assert row.n_candidates == 0 and row.first_partner is None
    # identical text, different id still matches
    delta2 = spark.createDataFrame([(9, text)], "doc_id long, text string")
    out2 = lsh_incremental_candidates(
        delta2, corpus, n_hashes=4, bands=2, k=5
    ).collect()
    assert out2[0].first_partner == 1


def test_text_index_uncommitted_segment_invisible(spark, tmp_path):
    """Crash atomicity (round-14 ADVICE): a segment whose commit
    marker is missing — the crash-between-writes state — must be
    invisible to probes: postings/doclen/tombstone rows of the
    half-written segment never skew N, L, df, or the ranking."""
    import os

    from changedatacapture_spark.operators.text import (
        bm25_topk_indexed,
        build_text_index,
    )

    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha alpha delta"),
            (3, "beta beta beta alpha"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_text_index(base, idx)
    terms = ["alpha", "beta"]
    before = sorted(
        map(tuple, bm25_topk_indexed(spark, idx, terms, 10).collect())
    )

    # append a segment (re-crawling doc 1), then simulate the crash:
    # remove its commit marker — all three relations hold its rows
    markers_before = set(os.listdir(f"{idx}/_segments"))
    delta = spark.createDataFrame(
        [(1, "alpha alpha alpha alpha"), (4, "beta beta")],
        "doc_id long, text string",
    )
    build_text_index(
        delta, idx, mode="append",
        tombstone_docs=delta.filter(F.col("doc_id") == 1).select("doc_id"),
    )
    (new_marker,) = set(os.listdir(f"{idx}/_segments")) - markers_before
    os.remove(f"{idx}/_segments/{new_marker}")

    after = sorted(
        map(tuple, bm25_topk_indexed(spark, idx, terms, 10).collect())
    )
    assert after == before

    # restoring the marker (the retry/commit completing) flips the
    # segment visible — rows, tombstone masking and all
    with open(f"{idx}/_segments/{new_marker}", "x"):
        pass
    from changedatacapture_spark.operators.text import bm25_topk

    final = spark.createDataFrame(
        [
            (1, "alpha alpha alpha alpha"),
            (2, "alpha alpha delta"),
            (3, "beta beta beta alpha"),
            (4, "beta beta"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        map(tuple, bm25_topk_indexed(spark, idx, terms, 10).collect())
    )
    want = sorted(map(tuple, bm25_topk(final, terms, 10).collect()))
    assert got == want
