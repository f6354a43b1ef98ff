"""Unit tests for the round-2 text / dedup / similarity operators:
language-ID, quality scoring, BPE-ish counting, SimHash, embedding
near-dup. Small hand-built inputs with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from changedatacapture_spark.operators.text import (
    bpe_token_count,
    langid,
    quality_score,
    simhash,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_langid_predicts_by_stopwords(spark):
    docs = _docs(
        spark,
        [
            "the cat and the dog of a house",      # en
            "der hund und die katze ist da",        # de
            "le chat et la maison est grande",      # fr
            "el gato y las casas es grande",        # es
            "xyzzy plugh quux",                     # no evidence -> und
        ],
    )
    out = {r.doc_id: r.pred_lang for r in langid(docs).collect()}
    assert out == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_langid_tie_breaks_alphabetically(spark):
    # 'es' list and 'fr' list each get one hit ("es" vs "la") -> es wins
    docs = _docs(spark, ["es la"])
    assert langid(docs).collect()[0].pred_lang == "es"


def test_quality_score_exact_values(spark):
    text = "the quick brown fox jumps over the lazy dog again now"  # 11 tokens
    out = quality_score(_docs(spark, [text])).collect()[0]
    assert out.n_tokens == 11
    assert out.stop_hits == 1  # only "the" (distinct)
    # 10 distinct tokens -> floor(1000/10) = 100
    assert out.stop_ratio_pm == 100
    assert out.passes is True


def test_bpe_token_count(spark):
    df = _docs(spark, ["hello, world! x2"])
    n = df.select(bpe_token_count(F.col("text")).alias("n")).collect()[0].n
    # hello , world ! x 2  -> 6
    assert n == 6


def test_simhash_deterministic_and_order_insensitive(spark):
    a = "alpha beta gamma delta"
    b = "delta gamma beta alpha"  # same token set -> same simhash
    c = "totally different words here entirely"
    out = {r.doc_id: r.simhash for r in simhash(_docs(spark, [a, b, c])).collect()}
    assert out[0] == out[1]
    assert 0 <= out[0] < 1 << 63
    assert out[0] != out[2]


def test_simhash_neardup_pairs_finds_close_docs(spark):
    from changedatacapture_spark.operators.dedup import simhash_neardup_pairs

    # at 63 bits a single extra token flips ~|votes near zero| bits;
    # with ~100 shared tokens the flip count stays within hamming<=3
    base = " ".join(f"word{i}" for i in range(100))
    near = base + " extra"
    far = "completely unrelated vocabulary about cooking pasta sauce"
    docs = _docs(spark, [base, near, far])
    pairs = {(r.doc_a, r.doc_b) for r in simhash_neardup_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_embedding_neardup_pairs_threshold(spark):
    from changedatacapture_spark.operators.similarity import embedding_neardup_pairs

    dim = 64
    v = [1.0] + [0.0] * (dim - 1)
    v_close = [1.0, 0.1] + [0.0] * (dim - 2)
    v_orth = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    emb = spark.createDataFrame(
        [(0, v), (1, v_close), (2, v_orth)],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r.vec_a, r.vec_b): r.score_scaled
        for r in embedding_neardup_pairs(emb, threshold_scaled=900_000).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 900_000
    assert (0, 2) not in pairs


def test_media_roundtrip_payload_bytes(spark):
    from changedatacapture_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
    )

    docs = spark.createDataFrame(
        [(0, "hello", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = documents_as_media(docs).collect()[0]
    assert bytes(media.payload) == b"hello"
    assert media.n_bytes == 5 and media.mime == "image/png"

    feats = extract_features(documents_as_media(docs), dim=8).collect()[0]
    assert len(feats.feature) == 8
    # deterministic fake: same payload -> same feature
    feats2 = extract_features(documents_as_media(docs), dim=8).collect()[0]
    assert feats.feature == feats2.feature


def test_repetition_stats_flags_dominated_docs(spark):
    from changedatacapture_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam spam spam spam spam"),
            (1, "one two three four five six seven eight nine ten"),
            (2, "solo"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert rows[0].top_token_pm == 1000 and rows[0].top_bigram_pm == 1000
    assert not rows[0].passes_repetition
    assert rows[1].top_token_pm == 100 and rows[1].dup_token_pm == 0
    assert rows[1].passes_repetition
    # single-token doc: no bigrams -> coalesced 0, dup 0
    assert rows[2].top_bigram_pm == 0 and rows[2].n_tokens == 1


def test_pii_scrub_redacts_and_counts(spark):
    from changedatacapture_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail a.b+c@site.org or x@y.io and ssn 123-45-6789"),
            (1, "call 555-013-4242 from 192.168.0.1 twice 555-013-4242"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert rows[0].n_email == 2 and rows[0].n_ssn == 1 and not rows[0].clean
    assert "<EMAIL>" in rows[0].text_scrubbed
    assert "@" not in rows[0].text_scrubbed
    assert "123-45-6789" not in rows[0].text_scrubbed
    assert rows[1].n_phone == 2 and rows[1].n_ipv4 == 1
    # SSN pattern must not claim the 3-3-4 phone shape
    assert rows[1].n_ssn == 0
    assert rows[2].clean and rows[2].text_scrubbed == "nothing sensitive here"
