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
