"""Curation operators: stable splits, sequence packing, funnel."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_spark.operators.curation import (
    curation_funnel,
    pack_sequences,
    split_assign,
)


def test_split_assign_stable_under_append(spark):
    d1 = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    d2 = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split for r in split_assign(d1).collect()}
    s2 = {r.doc_id: r.split for r in split_assign(d2).collect()}
    # appending docs never moves an existing doc between splits
    assert all(s2[k] == v for k, v in s1.items())
    assert set(s2.values()) == {"train", "val", "test"}


def test_split_assign_proportions(spark):
    out = (
        split_assign(spark.range(0, 2000).withColumnRenamed("id", "doc_id"))
        .groupBy("split")
        .count()
        .collect()
    )
    counts = {r.split: r["count"] for r in out}
    assert counts["train"] > counts["val"]
    assert counts["train"] > counts["test"]
    assert sum(counts.values()) == 2000


def test_pack_sequences_bins_fill_in_order(spark):
    rows = [(i, "s", " ".join(["w"] * 600)) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r.bin for r in pack_sequences(docs, max_tokens=1000).collect()}
    # exclusive cumsum: doc0 at 0, doc1 starts at 600 (bin 0),
    # doc2 at 1200 (bin 1), doc3 at 1800 (bin 1), doc4 at 2400 (bin 2)
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_curation_funnel_monotone(spark):
    rows = [
        (1, "a" * 200),                      # passes all
        (2, "b" * 50),                       # fails minlen
        (3, "1" * 200),                      # fails alpha ratio
        (4, "a" * 200),                      # duplicate of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.stage: r.n_docs for r in curation_funnel(docs).collect()}
    assert out == {"0_total": 4, "1_minlen": 3, "2_alpha": 2, "3_dedup": 1}


def test_range_join_bucketed_equals_naive(spark):
    from changedatacapture_spark.operators.joins import range_join_bucketed

    points = spark.createDataFrame(
        [(i, "k", i * 100) for i in range(50)], "pid long, key string, t long"
    )
    intervals = spark.createDataFrame(
        [
            (1, "k", 0, 250),        # multi-point
            (2, "k", 240, 260),      # boundary inclusive both ends
            (3, "k", 1000, 4000),    # spans many buckets
            (4, "k", 4900, 4900),    # single-instant interval
            (5, "other", 0, 5000),   # key mismatch -> no pairs
        ],
        "iid long, ikey string, s long, e long",
    )
    out = range_join_bucketed(
        points,
        intervals.withColumnRenamed("ikey", "key"),
        "t",
        "s",
        "e",
        keys=["key"],
        bucket_width=500,
    )
    got = {(r.pid, r.iid) for r in out.collect()}
    naive = {
        (p, i)
        for p in range(50)
        for (i, k, s, e) in [(1, "k", 0, 250), (2, "k", 240, 260),
                             (3, "k", 1000, 4000), (4, "k", 4900, 4900)]
        if s <= p * 100 <= e
    }
    assert got == naive
