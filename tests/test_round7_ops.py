"""Round-7 operator semantics: gap-fill resample invariants, KMV
sketch accuracy, and stream-interval-join batch equivalence are pinned
by the oracle differential; these tests add the properties an oracle
can't express (estimator error bounds, conservation laws)."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_spark.queries import SPARK_QUERIES
from changedatacapture_spark.sources.tables import load_table


def test_resample_conserves_event_count(spark, sf_dir):
    """Gap-filling must neither drop nor invent events: the spine's
    n_events sums to the raw event count, and zero-filled hours carry
    exactly the gap hours."""
    res = SPARK_QUERIES["events_resample"](spark, sf_dir)
    total = res.agg(F.sum("n_events")).first()[0]
    raw = load_table(spark, "events", sf_dir).count()
    assert total == raw
    # dense grid: every type covers the same hour span
    per_type = res.groupBy("event_type").count().select("count").distinct()
    assert per_type.count() == 1


def test_resample_forward_fill_matches_last_observed(spark, sf_dir):
    """At an observed hour the filled value equals that hour's sum; at
    a gap hour it equals the most recent observed hour's value."""
    res = SPARK_QUERIES["events_resample"](spark, sf_dir).orderBy(
        "event_type", "hour"
    )
    rows = res.collect()
    last_by_type: dict = {}
    for r in rows:
        if r.n_events == 0:
            expect = last_by_type.get(r.event_type)
            if expect is not None:
                assert r.filled_value == expect, (r.event_type, r.hour)
        else:
            last_by_type[r.event_type] = r.filled_value


def test_kmv_estimate_accuracy(spark, sf_dir):
    """KMV with k=64 has relative standard error ~ 1/sqrt(k-2) ≈ 13%;
    assert every group lands within 4 sigma (52%) of exact — loose
    enough to be deterministic-data-safe, tight enough to catch a
    broken estimator (off by 2x+)."""
    out = SPARK_QUERIES["kmv_distinct_users"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        if r.n_mink < 64:  # degenerate: estimator is exact count
            assert r.est_users == float(r.n_mink)
        else:
            rel = abs(r.est_users - r.exact_users) / r.exact_users
            assert rel < 0.52, (r.event_type, r.est_users, r.exact_users)


def test_session_window_stream_bounds(spark, sf_dir):
    """Every emitted session is internally consistent: end - start >=
    gap (a session always extends gap past its last event) and
    n_events >= 1."""
    out = SPARK_QUERIES["events_session_window_stream"](spark, sf_dir)
    bad = out.filter(
        (F.col("session_end_ms") - F.col("session_start_ms") < 1_800_000)
        | (F.col("n_events") < 1)
    ).count()
    assert bad == 0
