"""JoinView: incrementally-maintained inner equi-join of two
CDC-maintained SnapshotTables (touched-key recompute).

Invariant: after any batch sequence, the view equals the plain inner
join of the two base tables' current states — including dim updates
re-enriching fact rows and dim deletes evicting them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_spark.streaming.pipeline import JoinView
from changedatacapture_spark.streaming.sink import SnapshotTable


def _mk(spark, tmp_path):
    fact = SnapshotTable(spark, str(tmp_path / "fact"), ["k"], n_buckets=4)
    dim = SnapshotTable(spark, str(tmp_path / "dim"), ["d"], n_buckets=2)
    view = SnapshotTable(spark, str(tmp_path / "view"), ["k"], n_buckets=4)
    jv = JoinView(
        spark, fact, dim, view,
        fact_key_cols=["k"], join_col="d", dim_payload_cols=["label"],
    )
    return fact, dim, view, jv


def _fact_batch(spark, rows):
    return spark.createDataFrame(rows, "k long, d long, v long, op string")


def _dim_batch(spark, rows):
    return spark.createDataFrame(rows, "d long, label string, op string")


def _expect(fact, dim):
    f = {r.k: (r.d, r.v) for r in fact.read().collect()}
    d = {r.d: r.label for r in dim.read().collect()}
    return sorted(
        (k, dv, v, d[dv]) for k, (dv, v) in f.items() if dv in d
    )


def _got(view):
    return sorted((r.k, r.d, r.v, r.label) for r in view.read().collect())


def test_join_view_tracks_fact_and_dim_changes(spark, tmp_path):
    fact, dim, view, jv = _mk(spark, tmp_path)
    a1 = _fact_batch(
        spark, [(1, 10, 100, "c"), (2, 10, 200, "c"), (3, 11, 300, "c")]
    )
    d1 = _dim_batch(spark, [(10, "x", "c"), (11, "y", "c")])
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)
    assert _got(view) == _expect(fact, dim)

    # dim update re-enriches ALL its fact rows; dim delete evicts; a
    # fact update moves a row between dims; a fact delete drops it
    a2 = _fact_batch(spark, [(2, 11, 201, "u"), (3, 11, 300, "d")])
    d2 = _dim_batch(spark, [(10, "x2", "u")])
    fact.merge(a2, batch_id=1)
    dim.merge(d2, batch_id=1)
    jv.apply(a2, d2, batch_id=1)
    got = _got(view)
    assert got == _expect(fact, dim)
    assert (1, 10, 100, "x2") in got  # re-enriched by the dim update
    assert (2, 11, 201, "y") in got  # moved dims via fact update
    assert all(k != 3 for k, *_ in got)  # fact delete evicted

    # dim delete evicts its remaining fact rows from the inner join
    d3 = _dim_batch(spark, [(10, None, "d")])
    dim.merge(d3, batch_id=2)
    jv.apply(
        _fact_batch(spark, []).limit(0), d3, batch_id=2
    )
    assert _got(view) == _expect(fact, dim)
    assert all(dv != 10 for _, dv, *_ in _got(view))


def test_pipeline_attach_join_view(spark, tmp_path):
    """JoinView attached to a CdcPipeline: every processed batch
    updates the view after the fact merge; a dim change applied out of
    band re-enriches via its own apply call."""
    from pyspark.sql import types as T

    from changedatacapture_spark.streaming.pipeline import CdcPipeline

    fact = SnapshotTable(spark, str(tmp_path / "fact"), ["k"], n_buckets=4)
    dim = SnapshotTable(spark, str(tmp_path / "dim"), ["d"], n_buckets=2)
    view = SnapshotTable(spark, str(tmp_path / "view"), ["k"], n_buckets=4)
    jv = JoinView(
        spark, fact, dim, view,
        fact_key_cols=["k"], join_col="d", dim_payload_cols=["label"],
    )
    dim.merge(_dim_batch(spark, [(10, "x", "c"), (11, "y", "c")]), batch_id=0)
    record = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("d", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    pipe = CdcPipeline(spark, record, fact, "k")
    pipe.attach_join_view(jv)

    def env(rows):
        df = spark.createDataFrame(rows, "k long, d long, v long, op string")
        doc = F.struct("k", "d", "v")
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

    pipe.process_batch(env([(1, 10, 100, "c"), (2, 11, 200, "c")]), 0)
    assert _got(view) == _expect(fact, dim)
    pipe.process_batch(env([(1, 11, 101, "u"), (2, 11, 200, "d")]), 1)
    assert _got(view) == [(1, 11, 101, "y")]
    # out-of-band dim change re-enriches through the view's own apply
    d2 = _dim_batch(spark, [(11, "y2", "u")])
    dim.merge(d2, batch_id=1)
    jv.apply(_fact_batch(spark, []).limit(0), d2, batch_id=50)
    assert _got(view) == [(1, 11, 101, "y2")]


def test_join_view_fact_row_without_dim_joins_later(spark, tmp_path):
    """A fact row arriving BEFORE its dim partner is absent from the
    inner-join view, then appears when the dim lands (the late-dim
    case: the dim batch's join value touches the waiting fact row)."""
    fact, dim, view, jv = _mk(spark, tmp_path)
    a1 = _fact_batch(spark, [(1, 10, 100, "c")])
    d1 = _dim_batch(spark, [(99, "other", "c")])
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)
    assert _got(view) == []

    d2 = _dim_batch(spark, [(10, "late", "c")])
    dim.merge(d2, batch_id=1)
    jv.apply(_fact_batch(spark, []).limit(0), d2, batch_id=1)
    assert _got(view) == [(1, 10, 100, "late")]


def test_join_view_io_is_delta_bounded(spark, tmp_path):
    """The round-14 pruning contract: a small delta's apply must read
    a strict SUBSET of the fact's buckets (read_buckets on the touched
    keys' bucket ids) and a strict subset of the dim's buckets
    (read_keys on fact_now's actual join values) — never full scans.
    last_scan is the manifest-level evidence."""
    fact = SnapshotTable(spark, str(tmp_path / "fact"), ["k"], n_buckets=64)
    dim = SnapshotTable(spark, str(tmp_path / "dim"), ["d"], n_buckets=8)
    view = SnapshotTable(spark, str(tmp_path / "view"), ["k"], n_buckets=8)
    jv = JoinView(
        spark, fact, dim, view,
        fact_key_cols=["k"], join_col="d", dim_payload_cols=["label"],
    )
    a1 = _fact_batch(
        spark, [(k, k % 16, k * 10, "c") for k in range(200)]
    )
    d1 = _dim_batch(spark, [(d, f"L{d}", "c") for d in range(16)])
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)

    # delta: 2 fact keys + 1 dim value (→ ≤ 13 referencing fact rows)
    a2 = _fact_batch(spark, [(1, 3, 11, "u"), (2, 5, 22, "u")])
    d2 = _dim_batch(spark, [(3, "L3v2", "u")])
    fact.merge(a2, batch_id=1)
    dim.merge(d2, batch_id=1)
    jv.apply(a2, d2, batch_id=1)
    assert _got_labeled(view) == _expect(fact, dim)

    scan = jv.last_scan
    # fact read: touched ≤ 15 keys → ≤ 15 of 64 buckets
    assert scan["fact"]["buckets_kept"] <= 15
    assert scan["fact"]["buckets_kept"] < scan["fact"]["buckets_total"]
    assert scan["fact"]["buckets_total"] >= 32
    # dim read: fact_now references ≤ 3 distinct dim values of 16
    assert scan["dim_d"]["buckets_kept"] <= 3
    assert scan["dim_d"]["buckets_kept"] < scan["dim_d"]["buckets_total"]
    # the ΔB repair probe went through read_where (IN-list skipping)
    assert "probe_d" in scan
    assert scan["probe_d"]["buckets_kept"] <= scan["probe_d"]["buckets_total"]


def _got_labeled(view):
    return sorted((r.k, r.d, r.v, r.label) for r in view.read().collect())


def test_join_view_out_of_band_id_never_swallows_pipeline_batch(
    spark, tmp_path
):
    """An out-of-band dim apply reusing the NEXT pipeline batch id must
    not make the view's replay check skip that batch (the ADVICE
    finding): out_of_band=True namespaces the id negative."""
    fact, dim, view, jv = _mk(spark, tmp_path)
    a1 = _fact_batch(spark, [(1, 10, 100, "c")])
    d1 = _dim_batch(spark, [(10, "x", "c"), (11, "y", "c")])
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)

    # out-of-band dim apply that (wrongly but plausibly) reuses id 1
    d2 = _dim_batch(spark, [(10, "x2", "u")])
    dim.merge(d2, batch_id=1)
    jv.apply(
        _fact_batch(spark, []).limit(0), d2, batch_id=1, out_of_band=True
    )
    assert _got(view) == [(1, 10, 100, "x2")]

    # the pipeline's OWN batch 1 must still apply (not replay-skipped)
    a2 = _fact_batch(spark, [(2, 11, 200, "c")])
    fact.merge(a2, batch_id=1)
    jv.apply(a2, None, batch_id=1)
    assert _got(view) == [(1, 10, 100, "x2"), (2, 11, 200, "y")]


def test_star_join_view_two_dims(spark, tmp_path):
    """StarJoinView: fact ⋈ dim1 ⋈ dim2 stays equal to the plain
    3-way inner join of final states under fact updates/deletes and
    per-dim updates/deletes (each Δdim contributing its own probe)."""
    from changedatacapture_spark.streaming.pipeline import StarJoinView

    fact = SnapshotTable(spark, str(tmp_path / "fact"), ["k"], n_buckets=8)
    d1t = SnapshotTable(spark, str(tmp_path / "d1"), ["d"], n_buckets=4)
    d2t = SnapshotTable(spark, str(tmp_path / "d2"), ["e"], n_buckets=4)
    view = SnapshotTable(spark, str(tmp_path / "view"), ["k"], n_buckets=8)
    sv = StarJoinView(
        spark, fact,
        [(d1t, "d", ["label"]), (d2t, "e", ["tag"])],
        view, fact_key_cols=["k"],
    )

    def fb(rows):
        return spark.createDataFrame(
            rows, "k long, d long, e long, v long, op string"
        )

    def db1(rows):
        return spark.createDataFrame(rows, "d long, label string, op string")

    def db2(rows):
        return spark.createDataFrame(rows, "e long, tag string, op string")

    def expect():
        f = {r.k: (r.d, r.e, r.v) for r in fact.read().collect()}
        m1 = {r.d: r.label for r in d1t.read().collect()}
        m2 = {r.e: r.tag for r in d2t.read().collect()}
        return sorted(
            (k, d, e, v, m1[d], m2[e])
            for k, (d, e, v) in f.items()
            if d in m1 and e in m2
        )

    def got():
        return sorted(
            (r.k, r.d, r.e, r.v, r.label, r.tag)
            for r in view.read().collect()
        )

    a1 = fb([(1, 10, 7, 100, "c"), (2, 10, 8, 200, "c"), (3, 11, 7, 300, "c")])
    b1 = db1([(10, "x", "c"), (11, "y", "c")])
    c1 = db2([(7, "p", "c"), (8, "q", "c")])
    fact.merge(a1, batch_id=0)
    d1t.merge(b1, batch_id=0)
    d2t.merge(c1, batch_id=0)
    sv.apply(a1, [b1, c1], batch_id=0)
    assert got() == expect()

    # dim1 update re-enriches; dim2 delete evicts; fact update moves
    a2 = fb([(3, 11, 8, 301, "u")])
    b2 = db1([(10, "x2", "u")])
    c2 = db2([(7, None, "d")])
    fact.merge(a2, batch_id=1)
    d1t.merge(b2, batch_id=1)
    d2t.merge(c2, batch_id=1)
    sv.apply(a2, [b2, c2], batch_id=1)
    g = got()
    assert g == expect()
    assert (1, 10, 7, 100, "x2", "p") not in g  # e=7 evicted by dim2 delete
    assert (3, 11, 8, 301, "y", "q") in g  # moved to surviving dim2 value
    assert (2, 10, 8, 200, "x2", "q") in g  # re-enriched by dim1 update

    # both dims' Δ probes and pruned reads are in the scan report —
    # the per-dim decomposition ran and each read stayed bounded
    scan = sv.last_scan
    assert "probe_d" in scan and "probe_e" in scan and "fact" in scan
    for key in ("dim_d", "dim_e", "fact"):
        assert scan[key]["buckets_kept"] <= scan[key]["buckets_total"]


def test_join_view_oversized_dim_delta_stays_pruned(spark, tmp_path):
    """|Δdim join values| > max_inlist no longer full-scans the fact:
    the repair probe chunks the value set through read_where IN-lists,
    and the summed kept buckets stay a strict subset of the manifest
    (the round-15 closure of the documented fallback)."""
    fact = SnapshotTable(
        spark, str(tmp_path / "fact"), ["k"], n_buckets=64,
        bloom_cols=["d"],
    )
    dim = SnapshotTable(spark, str(tmp_path / "dim"), ["d"], n_buckets=8)
    view = SnapshotTable(spark, str(tmp_path / "view"), ["k"], n_buckets=8)
    jv = JoinView(
        spark, fact, dim, view,
        fact_key_cols=["k"], join_col="d", dim_payload_cols=["label"],
        max_inlist=2,  # force chunking with a small Δdim
    )
    a1 = _fact_batch(
        spark, [(k, k % 32, k * 10, "c") for k in range(200)]
    )
    d1 = _dim_batch(spark, [(d, f"L{d}", "c") for d in range(32)])
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)

    # Δdim: 6 values > max_inlist=2 → 3 chunked probes, no full scan
    d2 = _dim_batch(spark, [(d, f"L{d}v2", "u") for d in range(6)])
    dim.merge(d2, batch_id=1)
    jv.apply(_fact_batch(spark, []).limit(0), d2, batch_id=1)
    assert _got_labeled(view) == _expect(fact, dim)

    probe = jv.last_scan["probe_d"]
    assert probe["chunks"] == 3
    # summed scan volume across chunks still beats one full pass
    assert probe["buckets_kept"] < probe["buckets_total"]
    # ...and the dim-side read stayed pruned too (6 of 32 values)
    dim_scan = jv.last_scan["dim_d"]
    assert dim_scan["buckets_kept"] <= dim_scan["buckets_total"]


def test_join_view_composite_keyed_dim_probes_not_full_reads(
    spark, tmp_path
):
    """A dim keyed (join_col, sub) can't bucket-route on the join
    column alone — the round-15 path probes it through chunked
    read_where IN-lists (bloom-pruned) instead of the old full read,
    and the view still matches the plain join."""
    fact = SnapshotTable(spark, str(tmp_path / "fact"), ["k"], n_buckets=8)
    dim = SnapshotTable(
        spark, str(tmp_path / "dim"), ["d", "sub"], n_buckets=16,
        bloom_cols=["d"],
    )
    view = SnapshotTable(spark, str(tmp_path / "view"), ["k"], n_buckets=8)
    jv = JoinView(
        spark, fact, dim, view,
        fact_key_cols=["k"], join_col="d", dim_payload_cols=["label"],
        max_inlist=2,
    )
    a1 = _fact_batch(spark, [(k, k % 20, k * 10, "c") for k in range(40)])
    d1 = spark.createDataFrame(
        [(d, d, f"L{d}", "c") for d in range(20)],
        "d long, sub long, label string, op string",
    )
    fact.merge(a1, batch_id=0)
    dim.merge(d1, batch_id=0)
    jv.apply(a1, d1, batch_id=0)
    assert _got_labeled(view) == _expect(fact, dim)
    # the dim read went through chunked IN-probes, not dim.read()
    # (on this ALL-values bootstrap the summed chunk volume can
    # exceed one full pass — chunks re-keep overlapping buckets —
    # which is the known trade; the pin below is the selective case)
    assert "dim_d" in jv.last_scan
    assert jv.last_scan["dim_d"]["chunks"] >= 1

    # a 3-key fact delta probes only those join values' dim buckets
    a2 = _fact_batch(spark, [(1, 1, 11, "u"), (2, 2, 22, "u")])
    fact.merge(a2, batch_id=1)
    jv.apply(a2, None, batch_id=1)
    assert _got_labeled(view) == _expect(fact, dim)
    sel = jv.last_scan["dim_d"]
    assert sel["buckets_kept"] < sel["buckets_total"]
