"""Tests for dedup / text / similarity / multimodal operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
)
from changedatacapture_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from changedatacapture_spark.operators.text import fingerprint, text_stats
from changedatacapture_spark.operators.multimodal import (
    extract_features,
    media_stats,
    synthetic_media,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumped over the lazy dog"),  # near dup
        (4, "completely different content about spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark)).collect()
    by_canon = {r.canonical_id: r.n_copies for r in out}
    assert by_canon[1] == 2 and by_canon[3] == 1 and by_canon[4] == 1


def test_minhash_lsh_finds_near_dups(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs, n_hashes=8, k=5)
    assert sigs.columns == ["doc_id", *[f"mh{i}" for i in range(8)]]
    pairs = lsh_candidate_pairs(sigs, n_hashes=8, bands=4)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got  # exact dups always collide
    assert (1, 3) in got or (2, 3) in got  # near dup should share a band
    assert (1, 4) not in got and (3, 4) not in got


def test_connected_components_transitive_chain(spark):
    # A~B, B~C, C~D must collapse into ONE group rooted at the minimum
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.group_id for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}


def test_connected_components_groups_reversed_and_selfloop(spark):
    # reversed pair order, a second component, and a self-loop node
    pairs = spark.createDataFrame(
        [(3, 2), (1, 2), (11, 10), (20, 20)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r.group_id for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_raises_on_max_rounds_exhaustion(spark):
    # max_rounds=1 cannot confirm a fixpoint (the probe needs two equal
    # consecutive states), so the guard must refuse rather than let a
    # possibly-split group reach survivor selection
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 0, -1)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not reach a fixpoint"):
        connected_components(pairs, max_rounds=1)


def test_connected_components_long_path_converges(spark):
    # 40-node path presented in worst-case descending order: exercises
    # multiple large-star/small-star rounds plus the fixpoint probe
    edges = [(i, i + 1) for i in range(40, 0, -1)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = {r.doc_id: r.group_id for r in connected_components(pairs).collect()}
    assert len(out) == 41
    assert set(out.values()) == {1}


def test_ngram_jaccard_scores(spark):
    docs = _docs(spark)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    out = {(r.doc_a, r.doc_b): r.jaccard_pct for r in ngram_jaccard(docs, pairs).collect()}
    assert out[(1, 2)] == 100
    assert 50 < out[(1, 3)] < 100
    assert out[(1, 4)] < 10


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world")], "doc_id long, text string"
    )
    fps = [r.fp for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_text_stats(spark):
    out = text_stats(_docs(spark)).filter(F.col("doc_id") == 1).collect()[0]
    assert out.n_tokens == 9
    assert out.n_distinct_tokens == 8  # "the" twice
    assert out.n_chars == 43


def test_cosine_topk_brute(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.filter(F.col("vec_id") == 1)
    out = cosine_topk(emb, probes, k=2).collect()
    assert [r.neighbor_id for r in sorted(out, key=lambda r: r.rk)] == [2, 3]


def test_cosine_topk_lsh_same_bucket_recovers_close_pair(spark):
    rows = [(i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)]) for i in range(20)]
    rows.append((100, rows[5][1]))  # identical vector to id 5
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.filter(F.col("vec_id") == 100)
    out = cosine_topk_lsh(emb, probes, k=3, n_planes=4, dim=8).collect()
    assert any(r.neighbor_id == 5 and r.rk == 1 for r in out)


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, n=12)
    stats = {r.mime: r.n_items for r in media_stats(media).collect()}
    assert sum(stats.values()) == 12
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 12
    assert all(len(r.feature) == 16 for r in feats)
    # determinism: same payload -> same feature
    again = extract_features(media, dim=16).collect()
    assert {r.media_id: tuple(r.feature) for r in feats} == {
        r.media_id: tuple(r.feature) for r in again
    }


def test_cosine_topk_ivf_recovers_identical_vector(spark):
    from changedatacapture_spark.operators.similarity import cosine_topk_ivf

    rows = [(i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)]) for i in range(20)]
    rows.append((100, rows[5][1]))  # identical vector to id 5
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.filter(F.col("vec_id") == 100)
    # identical vectors land in the same argmax cell, so nprobe=1 finds it
    out = cosine_topk_ivf(emb, probes, k=3, n_cells=4, nprobe=1, dim=8).collect()
    assert any(r.neighbor_id == 5 and r.rk == 1 for r in out)


def test_ivf_searches_only_nprobe_fraction(spark):
    from changedatacapture_spark.operators.similarity import (
        cosine_topk_ivf,
        ivf_cell_scores,
    )
    from pyspark.sql import functions as SF

    rows = [(i, [float((i * 13 + d * 5) % 17 - 8) for d in range(8)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cs = ivf_cell_scores("embedding", n_cells=4, dim=8)
    cells = emb.select(
        "vec_id",
        (SF.array_position(cs, SF.array_max(cs)) - 1).cast("int").alias("cell"),
    )
    cell_of = {r.vec_id: r.cell for r in cells.collect()}
    probes = emb.filter(SF.col("vec_id") == 0)
    out = cosine_topk_ivf(emb, probes, k=50, n_cells=4, nprobe=1, dim=8).collect()
    # every candidate that survived comes from the probe's own cell
    assert out and all(cell_of[r.neighbor_id] == cell_of[0] for r in out)


def test_lsh_bucket_cap_survival_aware_emission(spark):
    """Hub guard semantics, hand-built: docs 1-5 share band 0 (a hot
    bucket at cap 3); docs 1,2 ALSO share band 1 (rare). With the cap,
    the only surviving pair is (1,2) — emitted from band 1 even though
    its FIRST shared band (0) was dropped; the uncapped run emits all
    10 band-0 pairs."""
    from changedatacapture_spark.operators.dedup import lsh_hot_buckets

    # n_hashes=4, bands=2: band0 = md5(mh0|mh1), band1 = md5(mh2|mh3)
    rows = [
        (1, "aa", "bb", "cc", "dd"),
        (2, "aa", "bb", "cc", "dd"),
        (3, "aa", "bb", "c3", "d3"),
        (4, "aa", "bb", "c4", "d4"),
        (5, "aa", "bb", "c5", "d5"),
    ]
    sigs = spark.createDataFrame(
        rows, "doc_id long, mh0 string, mh1 string, mh2 string, mh3 string"
    )
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            sigs, n_hashes=4, bands=2, max_bucket_size=None
        ).collect()
    }
    assert uncapped == {(a, b) for a in range(1, 6) for b in range(a + 1, 6)}
    capped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            sigs, n_hashes=4, bands=2, max_bucket_size=3
        ).collect()
    }
    assert capped == {(1, 2)}
    hot = lsh_hot_buckets(sigs, n_hashes=4, bands=2, max_bucket_size=3).collect()
    assert [(r.band_idx, r.n_docs) for r in hot] == [(0, 5)]


def test_lsh_cap_emits_each_pair_once(spark):
    """Min-band dedup must stay exact under the cap: docs agreeing on
    BOTH surviving bands appear exactly once."""
    rows = [
        (1, "aa", "bb", "cc", "dd"),
        (2, "aa", "bb", "cc", "dd"),
        (3, "x3", "y3", "z3", "w3"),
    ]
    sigs = spark.createDataFrame(
        rows, "doc_id long, mh0 string, mh1 string, mh2 string, mh3 string"
    )
    got = lsh_candidate_pairs(sigs, n_hashes=4, bands=2, max_bucket_size=10).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(1, 2)]


def test_simhash_cap_drops_hot_slice_bucket(spark):
    """SimHash banding with the hub guard: a pile of identical docs
    saturates every 16-bit slice bucket; capping below the pile size
    removes its pairs while distinct near-dups still emit."""
    from changedatacapture_spark.operators.dedup import simhash_neardup_pairs

    boiler = [(i, "same boilerplate text repeated everywhere") for i in range(1, 8)]
    near = [
        (10, "a unique document about spark adaptive execution"),
        (11, "a unique document about spark adaptive execution"),
    ]
    docs = spark.createDataFrame(boiler + near, "doc_id long, text string")
    capped = {
        (r.doc_a, r.doc_b)
        for r in simhash_neardup_pairs(docs, max_bucket_size=4).collect()
    }
    # the 7-doc boilerplate pile saturates all four of its slice
    # buckets (size 7 > cap 4) — none of its 21 pairs emit
    assert not any(a < 8 and b < 8 for a, b in capped)
    assert (10, 11) in capped
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in simhash_neardup_pairs(docs, max_bucket_size=None).collect()
    }
    assert (1, 2) in uncapped and (10, 11) in uncapped
