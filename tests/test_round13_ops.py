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

    def hook(self, df, version, dynamic=False):
        written = orig(self, df, version, dynamic)
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

    def hook(self, df, version, dynamic=False):
        written = orig(self, df, version, dynamic)
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
