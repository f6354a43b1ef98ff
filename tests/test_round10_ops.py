"""Round-10 operator tests: vectorized average-hash parity, PGM codec,
and the de-skewed inverted-index equivalence."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=1, max_size=63))
def test_average_hash_batch_matches_scalar(pix):
    """The numpy batch hash must equal the scalar oracle bit for bit
    on every raster length/content the codec path can produce."""
    import numpy as np

    from changedatacapture_spark.operators.multimodal import (
        average_hash,
        average_hash_batch,
    )

    arr = np.array([pix, pix[::-1]], dtype=np.uint8)
    got = average_hash_batch(arr)
    assert int(got[0]) == average_hash(bytes(pix))
    assert int(got[1]) == average_hash(bytes(pix[::-1]))


def test_bmp_ahash_unchanged_by_vectorization(spark):
    """End-to-end: the mapInPandas hash path emits the same
    (doc_id, ahash) rows as the scalar reference for every raster
    shape in the widths table."""
    from changedatacapture_spark.operators.multimodal import (
        _bmp_raster,
        average_hash,
        bmp_ahash,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["ahash"] for r in bmp_ahash(docs).collect()}
    want = {i: average_hash(_bmp_raster(i)) for i in range(12)}
    assert got == want


def _vec(seed, dim=64):
    return [(((seed * 31 + d) * 2654435761) % 2000) / 1000.0 - 1.0 for d in range(dim)]


def test_pq_refine_with_full_shortlist_equals_exact_l2(spark):
    """With shortlist >= corpus size the refine stage re-ranks EVERY
    candidate by exact scaled-integer L2, so the result must equal
    brute-force L2 top-k regardless of how lossy the codes are — the
    property that makes the refine recall claim trustworthy."""
    import math

    from changedatacapture_spark.operators.similarity import (
        PQ_SCALE,
        pq_refine_topk,
    )

    rows = [(i, _vec(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = df.filter("vec_id < 2")
    got = {
        (r["probe_id"], r["rk"]): (r["neighbor_id"], r["dist_scaled"])
        for r in pq_refine_topk(df, probes, k=3, shortlist=25).collect()
    }
    xs = {i: [math.floor(x * PQ_SCALE) for x in v] for i, v in rows}
    for p in (0, 1):
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(xs[p], xs[i])), i)
            for i, _ in rows
            if i != p
        )
        for rk in (1, 2, 3):
            d, i = exact[rk - 1]
            assert got[(p, rk)] == (i, d), (p, rk)


def test_pq_refine_broadcasts_shortlist_not_corpus(spark, sf_dir):
    """The refine fetch must be a broadcast point-lookup: the tiny
    (probe x shortlist) candidate set broadcasts into the corpus scan,
    never a second shuffled corpus pass."""
    from changedatacapture_spark.plans.inspect import (
        executed_plan,
        has_broadcast_join,
    )
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["knn_pq_refine_topk"](spark, sf_dir)
    df.collect()
    assert has_broadcast_join(df), executed_plan(df)


# ------------------------------------------------------------ PGM codec

def test_pgm_roundtrip_all_widths():
    """encode_pgm -> decode_pgm must be the identity for every raster
    shape in the widths table, including the comment line."""
    from changedatacapture_spark.operators.multimodal import (
        _BMP_PIXELS,
        _BMP_WIDTHS,
        _bmp_raster,
        decode_pgm,
        encode_pgm,
    )

    for did in range(12):
        w = _BMP_WIDTHS[did % len(_BMP_WIDTHS)]
        h = _BMP_PIXELS // w
        raster = _bmp_raster(did)
        got = decode_pgm(encode_pgm(raster, w, h))
        assert got == (w, h, raster)


def test_pgm_decoder_rejects_malformed():
    import pytest as _pytest

    from changedatacapture_spark.operators.multimodal import decode_pgm, encode_pgm

    with _pytest.raises(ValueError, match="not a P5"):
        decode_pgm(b"P6\n1 1\n255\n\x00")
    with _pytest.raises(ValueError, match="maxval"):
        decode_pgm(b"P5\n1 1\n65535\n\x00\x00")
    with _pytest.raises(ValueError, match="truncated"):
        decode_pgm(encode_pgm(bytes(6), 2, 3)[:-2])


def test_decode_image_dispatches_by_magic():
    from changedatacapture_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_pgm,
    )

    raster = bytes(range(24))
    assert decode_image(encode_bmp(raster, 4, 6)) == (4, 6, raster)
    assert decode_image(encode_pgm(raster, 4, 6)) == (4, 6, raster)
    import pytest as _pytest

    # PNG is a real codec now (round 12) — JPEG is the remaining
    # unsupported-format representative
    from changedatacapture_spark.operators.multimodal import encode_png

    assert decode_image(encode_png(raster, 4, 6)) == (4, 6, raster)
    with _pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


def test_mixed_decode_stats_matches_raster_arithmetic(spark):
    from changedatacapture_spark.operators.multimodal import (
        _BMP_PIXELS,
        _BMP_WIDTHS,
        _bmp_raster,
        mixed_decode_stats,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in mixed_decode_stats(docs).collect()}
    for i in range(12):
        raster = _bmp_raster(i)
        w = _BMP_WIDTHS[i % len(_BMP_WIDTHS)]
        r = got[i]
        assert r["codec"] == ("bmp" if i % 2 == 0 else "pgm")
        assert (r["width"], r["height"]) == (w, _BMP_PIXELS // w)
        assert r["sum_px"] == sum(raster)
        assert (r["min_px"], r["max_px"]) == (min(raster), max(raster))


# ------------------------------------------- chained embedding dedup

def test_chained_pairs_are_subset_of_all_pairs(spark):
    """The chain compares a subset of the in-bucket pairs, so every
    emitted (pair, score) must also appear in the all-pairs variant
    with identical score."""
    from changedatacapture_spark.operators.similarity import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_chained,
    )

    rows = [(i, _vec(i // 3)) for i in range(30)]  # clusters of 3 identical
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {
        (r["vec_a"], r["vec_b"]): r["score_scaled"]
        for r in embedding_neardup_pairs(
            df, threshold_scaled=250_000, n_planes=6
        ).collect()
    }
    chained = {
        (r["vec_a"], r["vec_b"]): r["score_scaled"]
        for r in embedding_neardup_pairs_chained(
            df, threshold_scaled=250_000, n_planes=6, window=4
        ).collect()
    }
    assert chained, "identical triples must chain"
    for k, v in chained.items():
        assert full.get(k) == v, k


def test_chained_closure_recovers_tight_cluster(spark):
    """A cluster of identical vectors larger than the chain window
    must still collapse into ONE group through the closure — the
    connectivity guarantee the linear candidate volume is traded
    against."""
    from changedatacapture_spark.operators.dedup import connected_components
    from changedatacapture_spark.operators.similarity import (
        embedding_neardup_pairs_chained,
    )

    k = 12  # cluster 3x the window
    rows = [(i, _vec(7)) for i in range(k)] + [
        (100 + i, _vec(50 + i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_neardup_pairs_chained(
        df, threshold_scaled=250_000, n_planes=6, window=4
    )
    groups = connected_components(pairs, a_col="vec_a", b_col="vec_b")
    got = {
        r["doc_id"]: r["group_id"]
        for r in groups.collect()
        if r["doc_id"] < 100
    }
    assert set(got) == set(range(k))
    assert set(got.values()) == {0}, got


def test_chained_candidate_volume_is_bounded(spark):
    """Even with EVERY vector identical (one maximal hot bucket), the
    pre-threshold candidate count is <= n * window — the linearity
    contract; the all-pairs variant would emit n*(n-1)/2 here."""
    from changedatacapture_spark.operators.similarity import (
        embedding_neardup_pairs_chained,
    )

    n, w = 40, 4
    rows = [(i, _vec(3)) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs_chained(
        df, threshold_scaled=-2_000_000, n_planes=6, window=w
    ).count()
    assert out <= n * w, out
    assert out == (n - w) * w + sum(range(w)), out  # exact chain count


# ---------------------------------------------------------------- BPE


def _bpe_reference(word_counts, n_merges):
    """Pure-Python Sennrich et al. (2016) trainer: overlapping pair
    statistics over the word-frequency table, greedy left-to-right
    merge application, ties to the lexicographically smallest pair."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = (
                    pairs.get((syms[i], syms[i + 1]), 0) + n
                )
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_merges_match_sennrich_reference(spark):
    """The distributed trainer must learn the identical merge table
    (pairs, order, weighted counts) as the sequential reference,
    including a same-symbol run ('aaaa') that exercises the
    island-parity greedy rule."""
    from changedatacapture_spark.operators.text import bpe_learn_merges

    texts = [
        "low low lower lowest",
        "new newer newest new",
        "aaaa aaab baaa",
        "low new aaaa",
    ]
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = _bpe_reference(counts, 5)

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["step"], r["sym_left"], r["sym_right"], r["pair_count"])
        for r in bpe_learn_merges(docs, n_merges=5).orderBy("step").collect()
    ]
    assert got == want, (got, want)


def test_bpe_same_symbol_run_merges_at_even_offsets(spark):
    """'aaaaa' contributes 4 overlapping ('a','a') pairs to the count
    but only 2 greedy merges apply (positions 0-1 and 2-3) — the
    Sennrich asymmetry the island-parity rewrite must reproduce."""
    from changedatacapture_spark.operators.text import bpe_learn_merges

    docs = spark.createDataFrame([("aaaaa",)], "text string")
    out = bpe_learn_merges(docs, n_merges=2).orderBy("step").collect()
    assert (out[0]["sym_left"], out[0]["sym_right"], out[0]["pair_count"]) == (
        "a", "a", 4,
    )
    # after merging: ['aa', 'aa', 'a'] -> both ('aa','aa') and
    # ('aa','a') count 1; the lexicographic tie-break picks ('aa','a')
    assert (out[1]["sym_left"], out[1]["sym_right"], out[1]["pair_count"]) == (
        "aa", "a", 1,
    )


# ------------------------------------------------- weighted sampling


def test_weighted_sample_matches_python_predicate(spark):
    """The Spark filter must accept exactly the ids the pure-Python
    integer predicate accepts (content-addressed: no RNG anywhere)."""
    import hashlib

    from changedatacapture_spark.operators.curation import weighted_sample

    rows = [(i, (i * 37) % 500 + 1) for i in range(300)]
    tw = sum(w for _, w in rows)
    k = 30
    want = {
        i
        for i, w in rows
        if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) * tw
        < w * k * (1 << 60)
    }
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        r["doc_id"]
        for r in weighted_sample(df, total_weight=tw, target_k=k).collect()
    }
    assert got == want
    # sanity: the expected-size math holds loosely (Bernoulli sum)
    assert 0 < len(got) < 300


def test_weighted_sample_always_keeps_heavy_items(spark):
    """Items with weight >= total_weight / k have acceptance
    probability clamped to 1 — they must ALWAYS survive."""
    from changedatacapture_spark.operators.curation import weighted_sample

    rows = [(1, 1_000_000)] + [(i, 1) for i in range(2, 200)]
    tw = sum(w for _, w in rows)
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    kept = {
        r["doc_id"]
        for r in weighted_sample(df, total_weight=tw, target_k=5).collect()
    }
    assert 1 in kept


# ----------------------------------------------------------- semdedup


def test_semdedup_collapses_identical_vectors(spark):
    """A corpus of one repeated vector is a single duplicate group:
    every member lands in one cell, the rank chain connects them all,
    and exactly one survivor remains."""
    from changedatacapture_spark.operators.similarity import semdedup_stats

    rows = [(i, _vec(7)) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup_stats(df, n_cells=4, threshold_scaled=999_000).collect()
    occupied = [r for r in out if r["n_members"] > 0]
    assert len(occupied) == 1
    r = occupied[0]
    assert r["n_members"] == 30
    assert r["n_dup_members"] == 30
    assert r["n_groups"] == 1
    assert r["n_survivors"] == 1


def test_semdedup_keeps_distinct_vectors(spark):
    """Dissimilar vectors produce no duplicate pairs: survivors equal
    members in every cell and the survivor identity is vacuous."""
    from changedatacapture_spark.operators.similarity import semdedup_stats

    rows = [(i, _vec(i * 13 + 1)) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup_stats(df, n_cells=4, threshold_scaled=999_999).collect()
    assert sum(r["n_members"] for r in out) == 24
    for r in out:
        assert r["n_dup_members"] == 0 and r["n_groups"] == 0
        assert r["n_survivors"] == r["n_members"]


# --------------------------------------- contamination matrix / BM25


def test_contamination_matrix_counts_shared_shingles(spark):
    """Two sources sharing one document's text overlap in exactly its
    distinct 8-grams; a disjoint third source appears in no pair."""
    from changedatacapture_spark.operators.dedup import contamination_matrix

    shared_text = "abcdefghij"  # 3 distinct 8-grams
    rows = [
        (0, "s0", shared_text),
        (1, "s1", shared_text + " xxxxxxxxxx"),
        (2, "s2", "qqqqqqqqqqqq"),  # 1 distinct 8-gram, disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in contamination_matrix(df, k=8).collect()
    }
    assert set(out) == {("s0", "s1")}
    r = out[("s0", "s1")]
    assert r["n_shared_shingles"] == 3
    assert r["n_a"] == 3
    # jaccard = 3 / (3 + n_b - 3)
    assert r["jaccard_scaled"] == 3 * 1_000_000 // r["n_b"]


def test_bm25_prefers_rare_term_and_shorter_docs(spark):
    """A doc containing the rare query term must outrank docs with
    only common terms; among equal-tf docs the shorter one scores
    higher (length normalization)."""
    from changedatacapture_spark.operators.text import bm25_topk

    filler = "pad " * 30
    rows = [
        (0, "needle common"),              # rare term, short
        (1, "common common " + filler),    # common term only, long
        (2, "common common"),              # common term, short
        (3, filler.strip()),               # no query terms
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bm25_topk(df, ["needle", "common"], top_k=4).collect()}
    assert 3 not in out  # no matching term, no row
    assert out[0]["rk"] == 1  # rare term wins
    assert out[2]["score_scaled"] > out[1]["score_scaled"]  # shorter doc


def test_bm25_plan_is_take_ordered_not_global_sort(spark, sf_dir):
    """Top-k must lower to TakeOrderedAndProject over the scored
    aggregate — a global single-partition window sort of every doc
    would be the inverted-index skew bug all over again."""
    from changedatacapture_spark.plans.inspect import executed_plan
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["text_bm25_rank"](spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


# ------------------------------------------------------------ WAV codec


def test_wav_roundtrip_all_lengths():
    """encode_wav -> decode_wav is the identity for every sample-count
    class the corpus generator produces, including odd byte counts'
    word alignment."""
    from changedatacapture_spark.operators.multimodal import (
        _WAV_RATE,
        _wav_samples,
        decode_wav,
        encode_wav,
    )

    for did in range(10):
        s = _wav_samples(did)
        rate, got = decode_wav(encode_wav(s, _WAV_RATE))
        assert (rate, got) == (_WAV_RATE, s)


def test_wav_decoder_walks_unknown_chunks():
    """A LIST chunk inserted before data must be skipped by declared
    size — the property that distinguishes a chunk walker from a
    fixed-offset slicer."""
    import struct

    from changedatacapture_spark.operators.multimodal import decode_wav, encode_wav

    s = [-2048, 0, 2047, 5]
    raw = encode_wav(s, 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = raw.index(b"data")
    # odd-sized chunk body: the walker must skip declared size PLUS
    # the RIFF word-alignment pad byte
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = raw[:fmt_end] + extra + raw[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (8000, s)


def test_wav_decoder_rejects_malformed():
    import struct

    import pytest as _pytest

    from changedatacapture_spark.operators.multimodal import (
        decode_audio,
        decode_wav,
        encode_wav,
    )

    good = encode_wav([1, 2, 3], 8000)
    with _pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"RIFX" + good[4:])
    with _pytest.raises(ValueError, match="truncated RIFF"):
        decode_wav(good[:-2])
    stereo = good.replace(
        struct.pack("<HH", 1, 1), struct.pack("<HH", 1, 2), 1
    )
    with _pytest.raises(ValueError, match="PCM mono"):
        decode_wav(stereo)
    with _pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04....")


def test_wav_stats_match_signal_arithmetic(spark):
    from changedatacapture_spark.operators.multimodal import (
        _wav_samples,
        wav_decode_stats,
    )

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r for r in wav_decode_stats(docs).collect()}
    for i in range(10):
        s = _wav_samples(i)
        r = got[i]
        assert r["n_samples"] == len(s)
        assert r["sum_s"] == sum(s)
        assert r["sum_sq"] == sum(x * x for x in s)
        assert r["peak"] == max(abs(x) for x in s)
        assert r["duration_ms"] == len(s) * 1000 // 8000


# -------------------------------------------------------- Gopher rules


def test_gopher_rules_flag_crafted_violations(spark):
    """Each crafted document violates exactly one rule; the clean
    50-word document passes all seven."""
    from changedatacapture_spark.operators.text import gopher_quality

    clean = "the be to of and " + "word " * 45
    rows = [
        (0, "s", clean.strip()),                             # passes all
        (1, "s", "the be short text"),                       # word count < 50
        (2, "s", "the be " + "a " * 60),                     # mean len < 3
        (3, "s", "the be " + "#### " * 30 + "w " * 30),      # symbols + mean-len
        (4, "s", "the be " + "123 " * 60),                   # alpha-words (+mean len)
        (5, "s", "zz " + "word " * 60),                      # < 2 stopwords
        (6, "s", "the be " + "word " * 48 + "\n".join("- b" for _ in range(40))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[0]["passes_all"], dict(out[0].asDict())
    assert not out[1]["r_word_count"]
    assert not out[2]["r_mean_word_len"]
    assert not out[3]["r_symbol_ratio"]
    assert not out[4]["r_alpha_words"]
    assert not out[5]["r_stopwords"]
    assert not out[6]["r_bullet_lines"]


def _bm25_reference(texts, query_terms, top_k):
    """Pure-Python replica of the bm25_topk contract (log2-quantized
    Lucene idf, rational k1/b folded to one integer fraction)."""
    toks = {i: [w for w in t.split(" ") if w] for i, t in texts}
    dl = {i: len(ws) for i, ws in toks.items()}
    n_docs = len(dl)
    l_tot = sum(dl.values())
    tf = {}
    for i, ws in toks.items():
        for w in ws:
            if w in query_terms:
                tf[(i, w)] = tf.get((i, w), 0) + 1
    df_ = {}
    for (_i, w) in tf:
        df_[w] = df_.get(w, 0) + 1
    scores, hits = {}, {}
    for (i, w), f in tf.items():
        idf2 = max(
            1,
            (2 * n_docs + 2).bit_length() - (2 * df_[w] + 1).bit_length() + 1,
        )
        num = idf2 * 44 * f * l_tot * 10_000
        den = 20 * f * l_tot + 6 * l_tot + 18 * dl[i] * n_docs
        scores[i] = scores.get(i, 0) + num // den
        hits[i] = hits.get(i, 0) + 1
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return [
        (i, s, hits[i], rk + 1) for rk, (i, s) in enumerate(ranked)
    ]


from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st


@_settings(max_examples=12, deadline=None)
@_given(
    _st.lists(
        _st.lists(
            _st.sampled_from(["alpha", "beta", "gamma", "delta", "pad"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=9,
    )
)
def _bm25_differential(docs_words):
    spark = _bm25_differential._spark
    texts = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    from changedatacapture_spark.operators.text import bm25_topk

    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = [
        (r["doc_id"], r["score_scaled"], r["n_terms_hit"], r["rk"])
        for r in bm25_topk(df, ["alpha", "beta", "gamma"], top_k=5)
        .orderBy("rk")
        .collect()
    ]
    want = _bm25_reference(texts, {"alpha", "beta", "gamma"}, 5)
    assert got == want, (got, want)


def test_bm25_matches_python_reference(spark):
    """Differential: the Spark BM25 must equal the pure-Python replica
    on random corpora — scores, hit counts, and ranking. (The
    hypothesis body lives in an uncollected helper because @given
    can't take pytest fixtures; the session binds via attribute.)"""
    _bm25_differential._spark = spark
    _bm25_differential()


# ------------------------------------------------------- water-filling


def test_waterfill_invariants(spark):
    """Budget is spent to within level granularity, never exceeded;
    uncapped sources keep everything; capped sources share one level."""
    from changedatacapture_spark.operators.curation import token_waterfill

    sizes = {"a": 5, "b": 40, "c": 400, "d": 4000, "e": 90}
    rows = []
    did = 0
    for s, n in sizes.items():
        rows.append((did, s, " ".join(["w"] * n)))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in token_waterfill(df, 3, 5).collect()}
    total = sum(sizes.values())
    budget = total * 3 // 5
    spent = sum(r["allocated"] for r in out.values())
    assert spent <= budget
    assert budget - spent < len(sizes)  # residual below level granularity
    capped_levels = {r["allocated"] for r in out.values() if r["capped"]}
    assert len(capped_levels) <= 1  # one common cap level
    for s, n in sizes.items():
        r = out[s]
        assert r["n_tokens"] == n
        if not r["capped"]:
            assert r["allocated"] == n
        else:
            assert r["allocated"] < n


def test_waterfill_budget_covers_everything(spark):
    """With budget >= total, every source keeps all tokens uncapped."""
    from changedatacapture_spark.operators.curation import token_waterfill

    rows = [(0, "a", "x y z"), (1, "b", "p q")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in token_waterfill(df, 5, 5).collect()}
    assert out["a"]["allocated"] == 3 and not out["a"]["capped"]
    assert out["b"]["allocated"] == 2 and not out["b"]["capped"]


# ------------------------------------ prefix join / heavy hitters


def test_jaccard_prefix_join_equals_brute_force(spark):
    """The All-Pairs prefix algorithm must reproduce the O(n²)
    brute-force definition exactly on a corpus with graded overlap."""
    from changedatacapture_spark.operators.dedup import jaccard_prefix_join

    base = ["red", "blue", "green", "gold", "iron", "clay", "moss", "salt"]
    rows = []
    for i in range(24):
        toks = base[: 4 + i % 4] + [f"u{i // 3}"]  # shared core + group token
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_inter"], r["n_union"])
        for r in jaccard_prefix_join(df, t_pct=80).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    for a in range(24):
        for b in range(a + 1, 24):
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if inter * 100 >= 80 * uni:
                want[(a, b)] = (inter, uni)
    assert got == want
    assert want, "threshold must admit some pairs for the test to bite"


def test_heavy_hitters_exact_and_partitioning_independent(spark):
    """A key above total/k must always be found with its exact count,
    a key just below must not, and the output must not depend on how
    the input is partitioned (the sketch phase does; the verify phase
    erases it)."""
    from changedatacapture_spark.operators.stats import exact_heavy_hitters

    rows = [(99,)] * 300 + [(7,)] * 26 + [(i, ) for i in range(1000, 1674)]
    total = len(rows)  # 1000 rows; k=40 -> threshold 25
    df = spark.createDataFrame(rows, "user_id long")
    outs = []
    for nparts in (1, 7, 32):
        got = {
            r["key"]: (r["n_rows"], r["total_rows"])
            for r in exact_heavy_hitters(
                df.repartition(nparts), "user_id", k=40, capacity=64
            ).collect()
        }
        outs.append(got)
    assert outs[0] == outs[1] == outs[2]
    got = outs[0]
    assert got == {99: (300, total), 7: (26, total)}, got


def test_heavy_hitters_rejects_bad_capacity(spark):
    import pytest as _pytest

    from changedatacapture_spark.operators.stats import exact_heavy_hitters

    df = spark.createDataFrame([(1,)], "user_id long")
    with _pytest.raises(ValueError, match="capacity"):
        exact_heavy_hitters(df, "user_id", k=64, capacity=64)
