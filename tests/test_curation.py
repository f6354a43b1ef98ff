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


def test_stratified_sample_deterministic_and_append_stable(spark):
    from changedatacapture_spark.operators.curation import stratified_sample

    rows = [(i, "a" if i % 2 == 0 else "b", "t") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    picked1 = {r.doc_id for r in stratified_sample(docs, {"a": 50, "b": 10}).collect()}
    picked2 = {r.doc_id for r in stratified_sample(docs, {"a": 50, "b": 10}).collect()}
    assert picked1 == picked2  # rerun-stable, unlike df.sample()
    # appending new docs never changes which old docs are sampled
    more = spark.createDataFrame(
        rows + [(i, "a", "t") for i in range(200, 300)],
        "doc_id long, source string, text string",
    )
    picked3 = {
        r.doc_id
        for r in stratified_sample(more, {"a": 50, "b": 10}).collect()
        if r.doc_id < 200
    }
    assert picked3 == picked1
    # rate ordering holds on the strata (a keeps ~5x more than b)
    n_a = sum(1 for i in picked1 if i % 2 == 0)
    n_b = len(picked1) - n_a
    assert n_a > n_b


def test_token_budget_select_takes_best_quality_first(spark):
    from changedatacapture_spark.operators.curation import token_budget_select

    # quality: doc 1 all-alpha (1000pm), doc 2 mixed (~500pm), doc 3 digits (0pm)
    rows = [
        (1, "s", " ".join(["abcd"] * 10)),          # 10 tokens, high quality
        (2, "s", " ".join(["ab12"] * 10)),          # 10 tokens, mid quality
        (3, "s", " ".join(["1234"] * 10)),          # 10 tokens, zero quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id for r in token_budget_select(docs, budget_tokens=20).collect()}
    assert got == {1, 2}  # greedy fill stops before the low-quality doc


def test_contamination_counts_shared_shingles(spark):
    from changedatacapture_spark.operators.dedup import contamination

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps"),   # identical: fully contaminated
            (11, "a quick brown fox appears"),   # partial overlap
            (12, "zzzz yyyy xxxx wwww vvvv"),    # clean: no shared 8-gram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_overlap for r in contamination(docs, bench, k=8).collect()}
    assert 12 not in got            # clean docs emit no row
    assert got[10] == 18            # len 25 → 18 distinct 8-grams, all shared
    assert 0 < got[11] < 18         # partially contaminated


# ---------------------------------------------------------------------------
# round-6 additions: chunking + domain mixing
# ---------------------------------------------------------------------------


def test_chunk_documents_covers_all_tokens_with_overlap(spark):
    from changedatacapture_spark.operators.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(23))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=10, overlap=3).orderBy("chunk_idx").collect()
    # stride 7 over 23 tokens: starts 0, 7, 14, 21
    assert [(r.chunk_idx, r.start_tok, r.n_tok_chunk) for r in out] == [
        (0, 0, 10),
        (1, 7, 10),
        (2, 14, 9),
        (3, 21, 2),
    ]
    # consecutive chunks overlap by exactly `overlap` tokens (when full)
    assert out[0].start_tok + 10 - out[1].start_tok == 3


def test_chunk_documents_short_doc_single_chunk(spark):
    from changedatacapture_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=10, overlap=3).collect()
    assert len(out) == 1 and out[0].n_tok_chunk == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from changedatacapture_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=5, overlap=5)


def test_chunk_documents_is_shuffle_free(spark, sf_dir):
    from changedatacapture_spark.operators.curation import chunk_documents
    from changedatacapture_spark.plans.inspect import count_exchanges
    from changedatacapture_spark.sources.tables import load_table

    out = chunk_documents(load_table(spark, "documents", sf_dir))
    out.collect()
    assert count_exchanges(out) == 0


def test_mix_weights_hand_computed(spark):
    from changedatacapture_spark.operators.curation import mix_weights

    rows = [
        (1, "en", "x " * 79 + "x"),   # 80 tokens
        (2, "de", "y " * 19 + "y"),   # 20 tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r.grp: r
        for r in mix_weights(
            docs, group_col="lang", target_ppm={"en": 500_000, "de": 500_000}
        ).collect()
    }
    # en: natural 800000 ppm, weight = 500000*1e6/800000 = 625000
    assert out["en"].natural_ppm == 800_000
    assert out["en"].weight_ppm == 625_000
    assert out["en"].effective_tokens == 80 * 625_000 // 1_000_000
    # de: natural 200000 ppm, weight = 2.5x
    assert out["de"].weight_ppm == 2_500_000
    assert out["de"].effective_tokens == 50


def test_mix_weights_cap_applies(spark):
    from changedatacapture_spark.operators.curation import mix_weights

    rows = [(1, "en", "x " * 99 + "x"), (2, "zh", "y")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r.grp: r
        for r in mix_weights(
            docs, group_col="lang", target_ppm={"en": 100_000, "zh": 900_000},
            cap_ppm=3_000_000,
        ).collect()
    }
    # zh natural = 9900 ppm; uncapped weight would be ~90x → capped at 3x
    assert out["zh"].weight_ppm == 3_000_000


def test_chunking_invariants_property(spark):
    """For any doc length and any (chunk, overlap): starts advance by
    stride from 0; every token is covered; consecutive full chunks
    overlap by exactly `overlap`; chunk sizes are exact."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from changedatacapture_spark.operators.curation import chunk_documents

    @given(
        n_tok=st.integers(1, 120),
        chunk=st.integers(2, 40),
        overlap=st.integers(0, 20),
    )
    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(n_tok, chunk, overlap):
        if overlap >= chunk:
            return
        stride = chunk - overlap
        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(n_tok)))],
            "doc_id long, text string",
        )
        out = sorted(
            (r.chunk_idx, r.start_tok, r.n_tok_chunk)
            for r in chunk_documents(
                docs, chunk_tokens=chunk, overlap=overlap
            ).collect()
        )
        starts = [s for _, s, _ in out]
        assert starts == list(range(0, n_tok, stride))
        covered = set()
        for idx, s, ln in out:
            assert idx == s // stride
            assert ln == min(chunk, n_tok - s)
            covered.update(range(s, s + ln))
        assert covered == set(range(n_tok))

    check()


def test_mix_weights_sub_ppm_group_hits_cap_not_divide_by_zero(spark):
    """A group holding <1 ppm of corpus tokens floors natural_ppm to 0;
    under ANSI a raw division raises DIVIDE_BY_ZERO at runtime. The
    clamped divisor must instead up-weight the tiny group to cap_ppm."""
    from pyspark.sql import functions as F

    from changedatacapture_spark.operators.curation import mix_weights

    docs = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        # 1,500,000 tokens: trailing space adds no token to split()
        F.expr("repeat('x ', 1500000)").alias("text"),
    ).unionByName(
        spark.createDataFrame([(2, "zh", "y")], "doc_id long, lang string, text string")
    )
    out = {
        r.grp: r
        for r in mix_weights(
            docs, group_col="lang", target_ppm={"en": 500_000, "zh": 500_000},
            cap_ppm=3_000_000,
        ).collect()
    }
    assert out["zh"].natural_ppm == 0
    assert out["zh"].weight_ppm == 3_000_000  # deterministic cap, no error
