"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM
codegen, no Python round-trips): tokenization via ``split``, hashing via
``md5``, ratios via length arithmetic. At 100 TB these run inside
whole-stage codegen over the parquet scan with full column pruning —
a document row never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from changedatacapture_spark.operators.layout import fan_out_scan

#: Tiny per-language stopword lists (public common words) for the
#: n-gram/stopword language-ID heuristic and quality scoring. Kept in
#: alphabetical language order — ties in the argmax resolve to the
#: first language alphabetically, deterministically.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "an", "and", "of", "to", "in", "is"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "por"),
    "fr": ("le", "la", "les", "et", "est", "une", "du", "pour"),
}

#: English stopwords used by the quality score.
STOPWORDS = LANG_STOPWORDS["en"]

#: GPT-2-style pretokenizer approximation: letter runs, digit runs,
#: single non-alphanumeric marks. Valid in both Java regex and RE2.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def normalized_text(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics, squeeze whitespace —
    the canonical form used for fingerprinting and exact dedup."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    squeezed = F.regexp_replace(stripped, " +", " ")
    return F.trim(squeezed)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


def bpe_token_count(text: Column) -> Column:
    """Pretokenizer-style token count: letter runs / digit runs /
    single punctuation marks (``BPE_TOKEN_PATTERN``)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), F.lit(0)))


def _stopword_hits(distinct_toks: Column, words: tuple[str, ...]) -> Column:
    """Number of distinct tokens that appear in ``words``."""
    return F.size(
        F.array_intersect(distinct_toks, F.array(*[F.lit(w) for w in words]))
    )


def langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language identification.

    Scores each document against the per-language stopword lists
    (distinct-token hits) and predicts the argmax; ties resolve to the
    alphabetically-first language, zero evidence predicts ``und``
    (ISO 639-3 undetermined). The scoring is pure column arithmetic —
    at 100 TB this is one codegen'd pass over the scan, no shuffle.

    Output: ``doc_id, s_de, s_en, s_es, s_fr, pred_lang``.
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    scored = docs.select(
        "doc_id",
        *[
            _stopword_hits(toks, ws).alias(f"s_{lang}")
            for lang, ws in LANG_STOPWORDS.items()
        ],
    )
    s = {lang: F.col(f"s_{lang}") for lang in LANG_STOPWORDS}
    pred = (
        F.when(
            (s["de"] >= s["en"]) & (s["de"] >= s["es"]) & (s["de"] >= s["fr"])
            & (s["de"] > 0),
            F.lit("de"),
        )
        .when((s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), F.lit("es"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return scored.withColumn("pred_lang", pred)


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality signals, all integer-exact.

    ``stop_ratio_pm`` — per-mille of distinct tokens that are English
    stopwords; ``alpha_ratio_pm`` — per-mille of characters that are
    letters; ``mean_alpha_per_token_x100`` — scaled mean letters per
    token; ``passes`` — the boilerplate filter a training pipeline
    would apply. Scaled integers (not floats) keep results bit-exact
    across engines.
    """
    t = F.col(text_col)
    toks = tokens(t)
    dtoks = F.array_distinct(toks)
    n_tokens = F.size(toks)
    n_distinct = F.size(dtoks)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    stop_hits = _stopword_hits(dtoks, STOPWORDS)
    stop_ratio = F.floor(stop_hits * 1000 / n_distinct).cast("long")
    alpha_ratio = F.floor(n_alpha * 1000 / n_chars).cast("long")
    mean_alpha = F.floor(n_alpha * 100 / n_tokens).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        stop_ratio.alias("stop_ratio_pm"),
        alpha_ratio.alias("alpha_ratio_pm"),
        mean_alpha.alias("mean_alpha_per_token_x100"),
        (
            (n_tokens >= 10) & (stop_ratio >= 10) & (alpha_ratio >= 600)
        ).alias("passes"),
    )


_HEX = "0123456789abcdef"
# 63, not 64: the fingerprint must stay a non-negative BIGINT so every
# engine (Spark long, DuckDB BIGINT — which raises on 1<<63) folds and
# bands it identically. 2^63 key space kills the 16-bit version's
# bucket-collision skew at scale (a 65k-value key space degenerates
# the band join at 100 TB).
SIMHASH_BITS = 63


def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """63-bit SimHash over distinct whitespace tokens.

    Classic Charikar scheme: each token votes ±1 per bit position
    according to its hash; the fingerprint bit is the sign of the sum.
    Bit ``j`` is bit ``j % 4`` of md5 hex digit ``j // 4`` — expressible
    identically in any engine with ``md5``/``instr`` (the oracle uses
    ``strpos``), so fingerprints are engine-portable. The md5 is
    computed once per token (projection), then the array-aggregates
    fold the votes — all inside whole-stage codegen, zero shuffles.

    Output: ``doc_id, simhash`` (non-negative bigint, 63 bits).
    """
    # one md5 per distinct token then 63 vote folds per doc — far
    # heavier than the scan: fan a narrow source out first
    hashed = fan_out_scan(docs).select(
        "doc_id",
        F.transform(
            F.array_distinct(tokens(F.col(text_col))), lambda x: F.md5(x)
        ).alias("_h"),
    )
    # decode each hex digit ONCE per token (16 instr+substring) in its
    # own projection — the vote folds then do array-index integer math
    # instead of re-running instr per BIT (63x): same values, ~4x less
    # string work per token. Separate select, like the md5 stage: a
    # HOF referencing another HOF expression is not reliably CSE'd.
    n_digits = (SIMHASH_BITS + 3) // 4
    digits = hashed.select(
        "doc_id",
        F.expr(
            f"transform(_h, h -> transform(sequence(1, {n_digits}), "
            f"i -> instr('{_HEX}', substring(h, i, 1)) - 1))"
        ).alias("_d"),
    )
    votes = digits.select(
        "doc_id",
        *[
            F.expr(
                f"aggregate(_d, 0, (acc, dv) -> acc + "
                f"CASE WHEN (element_at(dv, {j // 4 + 1}) "
                f"div {1 << (j % 4)}) % 2 = 1 "
                f"THEN 1 ELSE -1 END)"
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ],
    )
    fp = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return votes.select("doc_id", fp.cast("long").alias("simhash"))


#: PII patterns, ordered — earlier patterns are scrubbed first so a
#: replacement can never create a later match. Each regex is valid and
#: equivalent in Java regex (Spark) and RE2 (DuckDB oracle): character
#: classes, bounded repetition, and non-capturing groups only.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("ipv4", "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"),
)


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII before a corpus ships: emails, SSNs, phone numbers,
    IPv4 addresses → ``<TYPE>`` placeholder tokens, with per-type match
    counts and a ``clean`` flag.

    Patterns apply in :data:`PII_PATTERNS` order (SSN before the
    overlapping 3-3-4 phone shape) so counting and scrubbing agree.
    Pure ``regexp_extract_all`` / ``regexp_replace`` column expressions
    — whole-stage codegen, zero Python, no shuffle; at 100 TB this is
    a free rider on whatever scan already reads the text column.
    """
    counts = {}
    scrubbed = F.col(text_col)
    for name, pat in PII_PATTERNS:
        # count against the partially-scrubbed text so sequential
        # replacement and the counts can never disagree (an email's
        # digits, once redacted, cannot also count as an IP)
        counts[name] = F.size(
            F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    out = docs.select(
        "doc_id",
        scrubbed.alias("text_scrubbed"),
        *[counts[name].alias(f"n_{name}") for name, _ in PII_PATTERNS],
    )
    clean = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"n_{name}") == 0
        clean = c if clean is None else (clean & c)
    return out.withColumn("clean", clean)


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1):
    documents dominated by a single token or bigram are boilerplate /
    spam and get dropped before training.

    Per document: ``top_token_pm`` — per-mille of tokens taken by the
    most frequent token; ``top_bigram_pm`` — per-mille of bigram slots
    taken by the most frequent bigram; ``dup_token_pm`` — per-mille of
    tokens that repeat an earlier token; ``passes_repetition`` — the
    composite keep decision. Scaled-integer exact (``DIV``), like
    :func:`quality_score`.

    Scale: gram counting is explode → groupBy(doc_id, gram) — a
    wordcount-shaped shuffle with map-side partial aggregation, the
    cheapest distributed shape for per-gram modes (a per-row array
    sort+fold would keep whole documents in one expression buffer).
    Both gram families ride ONE kind-tagged explode, so the corpus is
    tokenized once and the per-doc modes come from conditional
    aggregation — the two-independent-aggregates-joined-on-doc_id
    form tokenized the corpus twice (column pruning blocks exchange
    reuse between branches with different column sets).
    """
    toks = tokens(F.col(text_col))
    base = docs.select("doc_id", toks.alias("_t"))
    combined = F.expr(
        "concat("
        " transform(_t, x -> struct('t' AS kind, x AS g)),"
        " transform(slice(_t, 1, greatest(size(_t) - 1, 0)),"
        "  (x, i) -> struct('b' AS kind,"
        "                   concat(x, ' ', element_at(_t, i + 2)) AS g)))"
    )
    counts = (
        base.select("doc_id", F.explode(combined).alias("kg"))
        .select("doc_id", F.col("kg.kind").alias("kind"), F.col("kg.g").alias("g"))
        .groupBy("doc_id", "kind", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    istok = F.col("kind") == "t"
    per = counts.groupBy("doc_id").agg(
        F.max(F.when(istok, F.col("c"))).alias("_max_tok"),
        F.sum(F.when(istok, F.col("c"))).cast("long").alias("n_tokens"),
        F.count(F.when(istok, F.lit(1))).alias("n_distinct"),
        F.max(F.when(~istok, F.col("c"))).alias("_max_bg"),
    )
    joined = per.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr("1000 * _max_tok DIV n_tokens").alias("top_token_pm"),
        F.expr(
            "1000 * coalesce(_max_bg, 0) DIV greatest(n_tokens - 1, 1)"
        ).alias("top_bigram_pm"),
        F.expr("1000 * (n_tokens - n_distinct) DIV n_tokens").alias(
            "dup_token_pm"
        ),
    )
    return joined.withColumn(
        "passes_repetition",
        (F.col("top_token_pm") <= 200)
        & (F.col("top_bigram_pm") <= 180)
        & (F.col("dup_token_pm") <= 900),
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: chars, tokens, distinct tokens,
    punctuation count, mean token length (scaled-integer exact)."""
    t = F.col(text_col)
    n_tokens = token_count(t)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        distinct_token_count(t).alias("n_distinct_tokens"),
        (F.length(t) - F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", ""))).alias(
            "n_punct"
        ),
    )


def _staged_gram_keys(
    docs: DataFrame, text_col: str, n: int, id_col: str
) -> DataFrame:
    """Per-document DISTINCT word-n-gram keys as ``(doc_id, g)`` rows:
    16-hex md5 prefix of each n-token window (join/count on 16-byte
    keys, never gram text — at 100 TB the shuffle carries fixed-width
    keys; collisions at 64 bits are negligible for document-frequency
    counting).

    Two-phase, like ``winnow_fingerprints``: the TOKEN ARRAY
    materializes in its own projection FIRST. A lambda that references
    ``slice(split(text), s, n)`` re-runs the split once per gram
    position — O(tokens²) per document (the executed plan showed the
    split inlined inside the transform; measured 110 s for the sf1
    boilerplate query vs ~8 s staged)."""
    tk = tokens(F.col(text_col))
    staged = docs.select(
        F.col(id_col).alias("doc_id"), tk.alias("_tk"), F.size(tk).alias("_nt")
    )
    starts = F.when(
        F.col("_nt") >= n, F.sequence(F.lit(1), F.col("_nt") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda s: F.substring(
            F.md5(F.array_join(F.slice(F.col("_tk"), s, n), " ")), 1, 16
        ),
    )
    return staged.select("doc_id", F.explode(F.array_distinct(grams)).alias("g"))


def boilerplate_ratio(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-boilerplate share per document (CCNet-style repeated
    n-gram detection): a word n-gram is *boilerplate* when it appears
    in ≥ ``min_docs`` distinct documents; each document reports how
    much of it is made of such grams.

    Plan: one explode of per-doc distinct gram keys, the per-gram
    document frequency as a WINDOW count over the gram key (the
    aggregate-then-join-back form computed the gram keys twice:
    column pruning made the frequency branch's exchange child differ
    from the join side's, so nothing reused), one per-doc aggregate.
    Gram text never shuffles — only 16-hex keys, exactly one gram
    exchange in the whole plan.

    Output: ``doc_id, n_grams, n_boiler, boiler_pm`` (scaled-ppm
    integer ratio; docs shorter than ``n`` tokens emit no row).
    """
    from pyspark.sql.window import Window

    grams = _staged_gram_keys(docs, text_col, n, id_col)
    flagged = grams.withColumn(
        "g_docs", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    is_b = (F.col("g_docs") >= min_docs).cast("long")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(is_b).alias("n_boiler"),
        F.floor(F.sum(is_b) * 1_000_000 / F.count(F.lit(1)))
        .cast("long")
        .alias("boiler_pm"),
    )


def top_repeated_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    top_k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """The ``top_k`` word-n-grams by document frequency, with the gram
    text — the inspection view over what :func:`boilerplate_ratio`
    counts (kept separate so the counting path never shuffles text).

    Ties rank by gram string; output ``gram, n_docs, rk``.
    """
    tk = tokens(F.col(text_col))
    nt = F.size(tk)
    starts = F.when(nt >= n, F.sequence(F.lit(1), nt - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.transform(starts, lambda s: F.array_join(F.slice(tk, s, n), " "))
            )
        ).alias("gram"),
    )
    from pyspark.sql.window import Window

    freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    # orderBy + limit lowers to TakeOrderedAndProject (distributed
    # per-partition top-k, then a k-row driver merge) — NOT a global
    # window sort, which would single-partition the whole gram table
    top = freq.orderBy(F.col("n_docs").desc(), "gram").limit(top_k)
    w = Window.orderBy(F.col("n_docs").desc(), F.col("gram"))
    return top.withColumn("rk", F.row_number().over(w))


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top ``top_k`` terms per document by tf-idf, with exact rational
    scoring: ``score_scaled = floor(tf * n_docs * 1e6 / df)`` — the
    idf stays a ratio (no log), so every score is integer arithmetic
    and bit-identical across engines; ranking order matches log-idf
    for fixed tf since ``N/df`` is monotone in ``1/df``.

    Plan: one explode → (doc, term) count, materialized ONCE
    (``localCheckpoint``): the document-frequency aggregate and the
    score join consume it with different column sets, so column
    pruning makes their exchange children non-identical and no
    exchange reuse is possible — without the checkpoint the
    tokenizing scan (the dominant cost on a text corpus) ran once per
    consumer. Then a broadcast single-row corpus count and a per-doc
    window top-k. Term strings shuffle once.
    """
    from pyspark.sql.window import Window

    term_rows = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = (
        term_rows.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.floor(F.col("tf") * F.col("n_docs") * F.lit(1_000_000) / F.col("df"))
            .cast("long")
            .alias("score_scaled"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_scaled").desc(), F.col("term")
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_k
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every character ``k``-gram, slide a window of ``w`` hashes,
    keep each window's MINIMUM hash, emit the distinct survivors.

    Guarantees any shared substring of length ≥ ``k + w - 1`` between
    two documents yields at least one shared fingerprint — the partial-
    overlap detector MinHash (whole-document similarity) is blind to.

    Pure per-row expressions (transform → array_min → array_distinct →
    explode): no UDF, no shuffle before the output's own consumers.
    Hashes are 16-hex md5 prefixes; min is lexicographic on the fixed-
    width hex, identical in any engine.

    Two-phase plan, like ``minhash_signatures``: the gram-hash array
    materializes in its own projection FIRST — a higher-order function
    referencing another HOF expression is not common-subexpression-
    eliminated, so the single-select form recomputes every md5 once
    per window (O(n·w) hashing; measured 40x slower).
    """
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(0))
    # one md5 per character k-gram: compute-bound, fan the scan out
    docs = fan_out_scan(docs)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.substring(F.md5(F.substring(t, i, k)), 1, 16),
        ).alias("_gh"),
        n_grams.alias("_ng"),
    )
    n_windows = F.greatest(F.col("_ng") - (w - 1), F.lit(0))
    window_mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))),
            lambda i: F.array_min(F.slice(F.col("_gh"), i, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return staged.select(
        "doc_id",
        F.explode(F.array_distinct(window_mins)).alias("fp"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    max_docs_per_fp: int = 20,
    min_shared: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Partial-overlap candidate pairs from winnowing fingerprints:
    documents sharing ≥ ``min_shared`` RARE fingerprints (a fingerprint
    in ≤ ``max_docs_per_fp`` docs).

    The rare-fp restriction is the standard hub guard: a boilerplate
    8-gram run shared by hundreds of documents would otherwise emit a
    quadratic bucket (the corpus's worst fingerprint sits in hundreds
    of docs; capped buckets bound every join group at
    ``max_docs_per_fp²``). Discriminative overlaps — the ones worth
    reviewing — live in rare fingerprints by definition.

    Plan: fingerprint explode → fp-bucket size as a window count over
    the SAME fp key the self-join shuffles on (zero extra exchanges,
    one fingerprint scan serving both join sides via runtime exchange
    reuse — the aggregate-then-join-back form computed the fingerprint
    scan twice because column pruning made the two branches'
    exchanges non-identical) → capped self-join → pair aggregate.
    Output: ``doc_a, doc_b, shared_fps``.
    """
    from pyspark.sql.window import Window

    fps = winnow_fingerprints(docs, text_col, k, w, id_col)
    wspec = Window.partitionBy("fp")
    rare_fps = (
        fps.withColumn("_n", F.count(F.lit(1)).over(wspec))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_docs_per_fp))
        .drop("_n")
        .hint("merge")
    )
    a = rare_fps.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = rare_fps.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def hashed_linear_score(
    docs: DataFrame,
    n_features: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature-hashed linear model scoring — the fastText-style quality
    classifier shape of corpus curation (hash every token into a fixed
    feature space, sum per-feature weights, threshold the score), with
    a deterministic weight table so the oracle can restate it exactly:
    ``w(b) = (b mod 256) - 128`` for feature bucket ``b``.

    This is the INFERENCE data flow of a real hashed linear model
    (weights would come from training; the arithmetic is identical):
    tokenize → md5-hash each occurrence into ``n_features`` buckets →
    integer weight sum per document. All exact integers, all JVM
    column expressions, one map-side-combinable aggregation — at
    100 TB the cost is the tokenizing scan, the shuffle carries one
    row per document.

    Output: ``doc_id, n_tokens, score_int, keep`` (keep = score ≥ 0).
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(text_col), "[^a-z]+", " ")),
                " ",
            )
        ).alias("token"),
    ).filter(F.col("token") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 8), 16, 10).cast("long")
        % n_features
    )
    weight = bucket % 256 - 128
    return (
        toks.select(F.col(id_col), weight.alias("w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("score_int"),
        )
        .select(
            id_col,
            "n_tokens",
            "score_int",
            (F.col("score_int") >= 0).alias("keep"),
        )
    )


def _bpe_train(
    docs: DataFrame, n_merges: int, text_col: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Shared BPE training core: returns (merge rows, final symbol
    table ``word, n, pos, sym``). See :func:`bpe_learn_merges` for the
    algorithm and scale-shape contract."""
    from pyspark.sql import Window as W

    spark = docs.sparkSession
    # tokenizing explode + word count partials run in the scan stage:
    # fan a narrow corpus out first
    docs = fan_out_scan(docs)
    words = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sym = words.select(
        "word",
        "n",
        F.posexplode(F.split(F.col("word"), "(?!$)")).alias("pos", "sym"),
    ).localCheckpoint(eager=True)

    out_rows: list[tuple[int, str, str, int]] = []
    wd = W.partitionBy("word").orderBy("pos")
    for step in range(1, n_merges + 1):
        dense = sym.withColumn("rn", F.row_number().over(wd))
        p = dense.withColumn(
            "nxt", F.lead("sym").over(W.partitionBy("word").orderBy("rn"))
        )
        winner = (
            p.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "sym", "nxt")
            .first()
        )
        if winner is None:
            break
        a, b, cnt = winner["sym"], winner["nxt"], int(winner["cnt"])
        out_rows.append((step, a, b, cnt))
        if a == b:
            # greedy left-to-right on same-symbol runs: merge at even
            # offsets within each maximal run of consecutive `a` rows
            run = p.filter(F.col("sym") == F.lit(a)).withColumn(
                "isl",
                F.col("rn")
                - F.row_number().over(W.partitionBy("word").orderBy("rn")),
            )
            starts = (
                run.withColumn(
                    "off",
                    F.row_number().over(
                        W.partitionBy("word", "isl").orderBy("rn")
                    )
                    - 1,
                )
                .filter(
                    (F.col("off") % 2 == 0) & (F.col("nxt") == F.lit(b))
                )
                # the parity rule needs a successor INSIDE the run;
                # nxt == a guarantees it since islands are maximal
                .select("word", F.col("rn").alias("start_rn"))
            )
        else:
            starts = p.filter(
                (F.col("sym") == F.lit(a)) & (F.col("nxt") == F.lit(b))
            ).select("word", F.col("rn").alias("start_rn"))
        # rewrite: merged symbol at start_rn, row at start_rn+1 consumed
        s_start = starts.withColumnRenamed("start_rn", "rn").withColumn(
            "_merge", F.lit(1)
        )
        s_consumed = starts.select(
            "word", (F.col("start_rn") + 1).alias("rn")
        ).withColumn("_consumed", F.lit(1))
        sym = (
            dense.join(s_start, ["word", "rn"], "left")
            .join(s_consumed, ["word", "rn"], "left")
            .filter(F.col("_consumed").isNull())
            .select(
                "word",
                "n",
                F.col("rn").alias("pos"),
                F.when(
                    F.col("_merge") == 1, F.concat(F.lit(a), F.lit(b))
                )
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
            .localCheckpoint(eager=True)
        )
    return out_rows, sym


def bpe_learn_merges(
    docs: DataFrame, n_merges: int = 6, text_col: str = "text"
) -> DataFrame:
    """Train byte-pair-encoding merges over the corpus — the tokenizer-
    construction step of an LLM data pipeline, run as a sequence of
    bounded Spark aggregates (Sennrich et al. 2016 semantics: pair
    statistics count every adjacent occurrence; merges apply greedily
    left-to-right, so a run of k identical symbols merges at odd
    offsets).

    Scale shape: everything after the first aggregate operates on the
    WORD-FREQUENCY table (distinct words + counts), never the corpus —
    the same reduction every production BPE trainer makes, so a 100 TB
    corpus costs one word-count aggregate and the iterations cost
    O(vocabulary). Each of the ``n_merges`` iterations is: one
    pair-count aggregate, ONE driver-collected winner row (the same
    bounded-artifact budget as the k-means/PQ fits), and a relational
    merge rewrite (dense re-rank + island parity for same-symbol
    runs); symbol state is localCheckpoint-ed per iteration so the
    plan does not grow with merge count.

    Returns the learned merge table: ``step, sym_left, sym_right,
    pair_count``
    (1-indexed steps, ``pair_count`` = weighted adjacent-pair
    frequency the winner had when chosen; ties break lexicographic).
    """
    out_rows, _ = _bpe_train(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        out_rows,
        "step int, sym_left string, sym_right string, pair_count long",
    )


def bpe_encode_stats(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Train BPE, then ENCODE the corpus under the learned vocabulary
    and report per-source compression: ``source, n_docs, total_words,
    total_chars, total_bpe_tokens`` (all exact integers; the token/char
    ratio is the tokenizer-fertility metric data teams track per
    source).

    Encoding costs nothing extra at corpus scale: training already
    rewrote the word-frequency symbol table, so tokens-per-word is one
    count over that O(vocabulary) table, joined back to per-doc word
    multiplicities (broadcast — the vocabulary is tiny relative to the
    corpus). The corpus is scanned exactly twice (word-count seed +
    per-doc multiplicities), never per merge step.
    """
    # both corpus scans (word-count seed + per-doc multiplicities)
    # are tokenize-heavy: fan a narrow source once for both
    docs = fan_out_scan(docs)
    _, sym = _bpe_train(docs, n_merges, text_col)
    tokens_per_word = sym.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_sym")
    )
    doc_words = (
        docs.select(
            F.col("doc_id"),
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy("doc_id", "source", "word")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    per_doc = doc_words.join(F.broadcast(tokens_per_word), "word").groupBy(
        "doc_id", "source"
    ).agg(
        F.sum("mult").alias("words"),
        F.sum(F.col("mult") * F.length("word")).alias("chars"),
        F.sum(F.col("mult") * F.col("n_sym")).alias("bpe_tokens"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("total_words"),
        F.sum("chars").alias("total_chars"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval for a fixed term query — the relevance
    scorer behind corpus search / RAG shortlist / quality-by-query
    curation (Robertson-Sparck Jones weighting, k1 = 1.2, b = 0.75 as
    exact rationals 6/5 and 3/4).

    ENGINE-EXACT SCORING: no floats anywhere. With N docs, L total
    tokens, dl the doc length and tf the term frequency, the classic
    term partial idf * (k1+1)*tf / (tf + k1*(1-b+b*dl/avgdl)) is
    multiplied through by 20L (avgdl = L/N) into the integer fraction
    ``idf2 * 44*tf*L / (20*tf*L + 6*L + 18*dl*N)`` evaluated in
    DECIMAL(38,0)/HUGEINT with a per-term floor at 10^4 scale; the doc
    score is the exact integer sum of term partials. idf2 is the
    log2-QUANTIZED Lucene idf ln((N+1)/(df+0.5)) — computed as
    ``max(1, floor(log2(2N+2)) - floor(log2(2df+1)) + 1)`` via
    binary-string length (exact for any integer, portable to any
    engine); the +1/clamp keeps every matched term at weight >= 1,
    preserving BM25's matching-any-term-beats-none property under
    quantization.

    Scale shape: tf/df/dl are plain map-side-combinable aggregates;
    the corpus constants (N, L) ride as a broadcast single-row join,
    never a driver collect; top-k is a distributed TakeOrdered, not a
    global sort. The tf aggregate is pre-filtered to the query terms,
    so the shuffle carries O(|query| * n_docs) rows max.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    q = [t for t in query_terms if t]
    tf = (
        toks.filter(F.col("term").isin(q))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _bm25_score(tf, dl, top_k)


def build_text_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
    tombstone_docs: DataFrame | None = None,
) -> None:
    """Materialize the BM25 search index as two skinny parquet
    relations — ``postings`` (doc_id, term, tf — ALL terms, query
    comes later) and ``doclen`` (doc_id, dl) — the Lucene-segment
    analogue built with plain aggregates. One tokenize pass: doclen is
    derived FROM the postings aggregate (dl = Σ tf), never a second
    corpus scan.

    ``mode="append"`` is the incremental-maintenance path: a snapshot
    change feed's INSERT set tokenizes and appends its own segment, so
    a daily crawl re-tokenizes only the delta
    (``text_index_cdf_incremental``) — the text-side twin of
    ``build_label_ann_index(mode="append")``. Corpus constants (N, L)
    and per-term df are NOT stored: they are one aggregate over the
    skinny relations at probe time, so appends never read-modify-write
    a global stat (segments stay immutable, the LSM discipline).

    Re-crawled / updated / deleted documents: appending a NEW segment
    for an id whose OLD segment rows still stand would double-count it
    in N, L, df, and tf. Pass the affected ids as ``tombstone_docs``
    (one ``id_col`` column — e.g. the change feed's update/delete key
    set): they are written to a ``tombstones`` relation that the probe
    anti-joins against OLDER segments' rows (each tombstone carries
    the writing segment's sequence number, so it masks prior segments
    without suppressing the re-inserted doc's own new rows). Pure
    growth needs no tombstones; a tombstone-heavy index wants a
    periodic ``mode="overwrite"`` rebuild, like any LSM major
    compaction.

    Crash atomicity: postings, doclen, and tombstones are three Spark
    writes — a crash between them must not leave a half-segment that
    silently skews N, L, and df. Each segment therefore becomes
    visible only when its COMMIT MARKER (``_segments/<seg>``, an
    atomic O_CREAT after all three relations land) exists; probes
    filter every relation to marked segments, so an interrupted
    append's rows are never read (they are reclaimed by the next
    ``mode="overwrite"`` rebuild, the LSM major compaction).
    """
    import time as _time

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    # segment sequence: tombstones written at seg s mask rows of
    # segments < s. Monotonic wall-clock ns is sufficient — segments
    # are written by one maintainer in feed order (the change-feed
    # contract), never concurrently.
    seg = _time.time_ns()
    postings = (
        toks.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("seg", F.lit(seg))
    )
    postings.write.mode(mode).parquet(f"{path}/postings")
    # doclen from a READ-BACK of the just-written postings (filtered
    # to this seg — parquet stats skip other segments' files): the
    # corpus is tokenized exactly once; the doclen job re-reads the
    # skinny aggregate, never the text
    spark = docs.sparkSession
    written = spark.read.parquet(f"{path}/postings").filter(
        F.col("seg") == seg
    )
    (
        written.groupBy("doc_id", "seg")
        .agg(F.sum("tf").alias("dl"))
        .write.mode(mode)
        .parquet(f"{path}/doclen")
    )
    if tombstone_docs is not None:
        (
            tombstone_docs.select(F.col(id_col).alias("doc_id"))
            .distinct()
            .withColumn("seg", F.lit(seg))
            .write.mode(mode)
            .parquet(f"{path}/tombstones")
        )
    elif mode == "overwrite":
        # a rebuild clears stale tombstones from prior increments
        import shutil

        shutil.rmtree(f"{path}/tombstones", ignore_errors=True)
    # commit point: the marker makes the segment visible to probes.
    # A rebuild starts a fresh marker set (older segments' rows were
    # just overwritten; their markers must not resurrect tombstones).
    import os as _os
    import shutil as _shutil

    if mode == "overwrite":
        _shutil.rmtree(f"{path}/_segments", ignore_errors=True)
    elif not _os.path.isdir(f"{path}/_segments"):
        # first append to a PRE-marker index: its existing segments
        # were all visible under the legacy contract, so bless them
        # with backfilled markers BEFORE this append's marker lands —
        # otherwise the new marker set would hide the whole old corpus
        # from probes. One bounded distinct over the skinny relation.
        legacy = {
            r[0]
            for r in written.sparkSession.read.parquet(f"{path}/postings")
            .select("seg")
            .distinct()
            .collect()
            if r[0] != seg
        }
        _os.makedirs(f"{path}/_segments", exist_ok=True)
        for s in legacy:
            with open(f"{path}/_segments/{s}", "w"):
                pass
    _os.makedirs(f"{path}/_segments", exist_ok=True)
    with open(f"{path}/_segments/{seg}", "x"):
        pass


def _committed_segs(index_path: str) -> list[int] | None:
    """Marked (fully committed) segment ids of a text index, or None
    for a legacy layout without markers (everything visible)."""
    import os

    segdir = f"{index_path}/_segments"
    if not os.path.isdir(segdir):
        return None
    # tolerate stray non-numeric entries (.DS_Store, editor temps) —
    # a probe must never crash on directory litter
    return [int(x) for x in os.listdir(segdir) if x.lstrip("-").isdigit()]


def _only_committed(index_path: str, rel: DataFrame) -> DataFrame:
    """Filter an index relation (carrying ``seg``) to committed
    segments — the probe-side half of the commit-marker contract in
    :func:`build_text_index`. Driver metadata is one bounded listdir
    (#segments ≪ #files); the resulting IN-list prunes whole files
    via parquet row-group stats (seg is constant per file)."""
    segs = _committed_segs(index_path)
    if segs is None:
        return rel
    return rel.filter(F.col("seg").isin(segs))


def _mask_tombstones(spark, index_path: str, rel: DataFrame) -> DataFrame:
    """Drop rows of ``rel`` (carrying doc_id, seg) masked by a LATER
    segment's tombstone for the same doc — the probe-side half of the
    re-crawl contract in :func:`build_text_index`."""
    import os

    if not os.path.isdir(f"{index_path}/tombstones"):
        return rel
    tmb = _only_committed(
        index_path, spark.read.parquet(f"{index_path}/tombstones")
    ).select(
        F.col("doc_id").alias("_t_doc"), F.col("seg").alias("_t_seg")
    )
    return (
        rel.join(
            F.broadcast(tmb),
            (rel["doc_id"] == F.col("_t_doc"))
            & (rel["seg"] < F.col("_t_seg")),
            "left_anti",
        )
    )


def bm25_topk_indexed(
    spark,
    index_path: str,
    query_terms: list[str],
    top_k: int = 10,
) -> DataFrame:
    """BM25 ranked retrieval FROM the stored index (see
    :func:`build_text_index`): the probe never touches document text —
    it filters the postings relation to the query terms (predicate
    pushed to the parquet scan), masks tombstoned rows of older
    segments, and re-derives df/N/L from the skinny stored relations
    with map-side-combinable aggregates. Results are bit-equal to
    :func:`bm25_topk` over the LOGICAL corpus (identical integer
    scoring), which is the oracle statement the incremental query
    shares."""
    q = [t for t in query_terms if t]
    tf = _mask_tombstones(
        spark,
        index_path,
        _only_committed(
            index_path,
            spark.read.parquet(f"{index_path}/postings").filter(
                F.col("term").isin(q)
            ),
        ),
    ).drop("seg")
    dl = _mask_tombstones(
        spark,
        index_path,
        _only_committed(
            index_path, spark.read.parquet(f"{index_path}/doclen")
        ),
    ).drop("seg")
    return _bm25_score(tf, dl, top_k)


def _bm25_score(tf: DataFrame, dl: DataFrame, top_k: int) -> DataFrame:
    """Shared scoring tail of the BM25 family: exact integer partials
    from (tf, dl) relations, broadcast corpus constants, TakeOrdered
    top-k. See :func:`bm25_topk` for the arithmetic contract."""
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("l_tot")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    def blen(c: Column) -> Column:
        # floor(log2(k)) for positive integer k, via binary length
        return (F.length(F.bin(c)) - 1).cast("long")

    d38 = lambda c: c.cast("decimal(38,0)")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf2",
            F.greatest(
                F.lit(1).cast("long"),
                blen(F.lit(2) * F.col("n_docs") + 2)
                - blen(F.lit(2) * F.col("df") + 1)
                + 1,
            ),
        )
        .withColumn(
            "_num",
            d38(F.col("idf2"))
            * d38(F.lit(44) * F.col("tf"))
            * d38(F.col("l_tot"))
            * d38(F.lit(10_000)),
        )
        .withColumn(
            "_den",
            d38(F.lit(20) * F.col("tf")) * d38(F.col("l_tot"))
            + d38(F.lit(6)) * d38(F.col("l_tot"))
            + d38(F.lit(18) * F.col("dl")) * d38(F.col("n_docs")),
        )
        # `div` = exact integral division on DECIMAL (the repo's
        # PageRank idiom) — decimal `/` would round at scale 6 before
        # a floor could run
        .withColumn("partial", F.expr("_num div _den").cast("long"))
    )
    from pyspark.sql import Window as W

    agg = scored.groupBy("doc_id").agg(
        F.sum("partial").alias("score_scaled"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    # orderBy + limit lowers to TakeOrderedAndProject (per-partition
    # top-k + k-row driver merge); the rank window then runs over k
    # rows only — never a global single-partition sort of all docs
    top = agg.orderBy(F.col("score_scaled").desc(), "doc_id").limit(top_k)
    rk = F.row_number().over(
        W.orderBy(F.col("score_scaled").desc(), F.col("doc_id"))
    )
    return top.withColumn("rk", rk).select(
        "doc_id", "score_scaled", "n_terms_hit", "rk"
    )


#: Gopher-rule stopword set (Rae et al. 2021 Appendix A).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, Appendix A — the
    public heuristic suite C4/Gopher/FineWeb-style pipelines apply
    before training), each as an EXACT-INTEGER predicate (ratios
    multiplied through, no float division):

    - ``r_word_count``: 50 <= words <= 100,000
    - ``r_mean_word_len``: mean word length in [3, 10] chars
      (``3·words <= Σlen <= 10·words``)
    - ``r_symbol_ratio``: (# '#' chars + # '...' occurrences) <= 0.1·words
    - ``r_alpha_words``: >= 80% of words contain a letter
    - ``r_stopwords``: >= 2 of the 8 Gopher stopwords present
    - ``r_bullet_lines``: <= 90% of lines start with a bullet mark
    - ``r_ellipsis_lines``: <= 30% of lines end with '...'

    One zero-shuffle projection over the scan — every rule is a
    whole-stage-codegen column expression; at 100 TB this is a
    map-only pass with full column pruning.
    """
    t = F.col(text_col)
    tk = F.split(t, " ")
    n_words = F.size(tk)
    sum_len = F.expr(
        f"aggregate(transform(split({text_col}, ' '), x -> length(x)), "
        f"0, (a, x) -> a + x)"
    )
    n_alpha_words = F.size(F.expr(
        f"filter(split({text_col}, ' '), x -> x rlike '[A-Za-z]')"
    ))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_stop = sum(
        F.array_contains(tk, s).cast("int") for s in GOPHER_STOPWORDS
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.expr(
        f"filter(split({text_col}, '\\n'), "
        "x -> x like '- %' or x like '* %')"
    ))
    n_ell_end = F.size(F.expr(
        f"filter(split({text_col}, '\\n'), x -> x like '%...')"
    ))
    rules = {
        "r_word_count": (n_words >= 50) & (n_words <= 100_000),
        "r_mean_word_len": (F.lit(3) * n_words <= sum_len)
        & (sum_len <= F.lit(10) * n_words),
        "r_symbol_ratio": (n_hash + n_ellipsis.cast("long")) * 10 <= n_words,
        "r_alpha_words": F.lit(5) * n_alpha_words >= F.lit(4) * n_words,
        "r_stopwords": n_stop >= F.lit(2),
        "r_bullet_lines": F.lit(10) * n_bullet <= F.lit(9) * n_lines,
        "r_ellipsis_lines": F.lit(10) * n_ell_end <= F.lit(3) * n_lines,
    }
    cols = [F.col("doc_id")]
    if "source" in docs.columns:
        cols.append(F.col("source"))
    cols += [v.alias(k) for k, v in rules.items()]
    passes = None
    for v in rules.values():
        passes = v if passes is None else (passes & v)
    return docs.select(*cols, passes.alias("passes_all"))


def gopher_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-source Gopher-rule report: document counts, per-rule FAIL
    counts, and the all-rules pass count — the corpus health dashboard
    a curation team reads before choosing filter thresholds. One scan,
    one map-side-combinable aggregate."""
    flags = gopher_quality(docs, text_col)
    rule_cols = [c for c in flags.columns if c.startswith("r_")]
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum((~F.col(c)).cast("long")).alias(f"fail_{c[2:]}")
        for c in rule_cols
    ] + [F.sum(F.col("passes_all").cast("long")).alias("n_pass_all")]
    return flags.groupBy("source").agg(*aggs)


def ppl_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fit_pct: int = 30,
    scale: int = 1000,
) -> DataFrame:
    """CCNet-style perplexity quality bucketing (Wenzek et al. 2020):
    fit a bigram LM on a held-out corpus slice, score every OTHER
    document's per-token surprisal under it, and cut the scored set
    into head/middle/tail tertiles — the standard "keep the head,
    maybe the middle, drop the tail" pretraining filter.

    Exactness across engines: the FIT/SCORE split is the repo's
    content-addressed md5 bucket (first ``fit_pct``% of buckets fit
    the LM; the rest are scored — DISJOINT by construction, so no
    document scores under a model that saw it). Probabilities are
    add-one-smoothed ratios of exact integer counts,
    P(w2|w1) = (c(w1,w2)+1) / (c(w1)+V); per-bigram surprisal is the
    scaled-integer log ``floor(scale · ln((c(w1)+V)/(c(w1,w2)+1)))``
    — the ln argument is one IEEE double division of two exact
    integers, identical in any engine, and the 1000-step quantization
    makes a last-ulp ln() difference crossing a floor boundary
    vanishingly unlikely (verified hash-exact vs DuckDB at sf0.01).
    Doc score = integer mean surprisal (milli-nats/bigram);
    buckets = ntile(3) over the deterministic (score, id) total order.

    Scale shape: the LM fit is two map-side-combinable aggregations
    over the fit slice only; scoring joins the per-doc bigram stream
    against the AGGREGATED LM relations (bigram table then prefix
    table, both shuffles keyed by LM vocabulary — bounded by vocab²,
    not corpus size); V is a 1-row broadcast scalar. The tertile cut
    is ntile(3)-exact but SHUFFLE-BOUNDED: a two-phase prefix-sum
    rank (per-score counts → metadata-scale offsets, broadcast back;
    row-level window partitioned by score) replaces the
    single-partition global sort — no task ever sees more than one
    score's docs.

    Output: ``doc_id, n_bigrams, ppl_milli, bucket`` for every scored
    doc with ≥ 1 bigram; bucket ∈ head (most fluent) /middle/tail.
    """
    from pyspark.sql import Window as W

    from changedatacapture_spark.operators.curation import split_bucket

    # bigram explode + md5 bucketing ride the scan: fan it out first
    docs = fan_out_scan(docs)
    b = split_bucket(f"CAST({id_col} AS STRING)")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        b.alias("_b"),
        F.split(
            F.trim(F.regexp_replace(F.lower(text_col), "[^a-z]+", " ")), " "
        ).alias("t"),
    ).filter(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        "_b",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t)-2),"
                " i -> struct(t[i] AS w1, t[i+1] AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "_b", "bg.w1", "bg.w2")

    fit = bigrams.filter(F.col("_b") < fit_pct)
    lm = fit.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_b"))
    prefix = lm.groupBy("w1").agg(F.sum("n_b").alias("n_p"))
    vocab = lm.agg((F.count_distinct("w2") + 1).alias("v"))

    scored = (
        bigrams.filter(F.col("_b") >= fit_pct)
        .join(lm, ["w1", "w2"], "left")
        .join(prefix, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.floor(
                scale
                * F.log(
                    (F.coalesce(F.col("n_p"), F.lit(0)) + F.col("v")).cast(
                        "double"
                    )
                    / (F.coalesce(F.col("n_b"), F.lit(0)) + 1).cast("double")
                )
            )
            .cast("long")
            .alias("s"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("sum(s) DIV count(1)").alias("ppl_milli"),
    )
    # tertile cut WITHOUT a single-partition global sort: the exact
    # rank over the (ppl_milli, doc_id) total order via the repo's
    # two-phase prefix sum (operators/layout.py pattern). Per-score
    # counts (map-side-combinable) feed a prefix-sum window over the
    # SCORE relation — metadata-scale: distinct milli-nat values, not
    # docs — offsets broadcast back, and the row-level window
    # partitions by ppl_milli (parallel across scores; a pathological
    # all-one-score corpus degrades to the sort this replaces). The
    # boundary ranks reproduce ntile(3) exactly: bucket sizes differ
    # by ≤1 with the larger buckets first, so head ends at
    # ceil(N/3) = (N+2) DIV 3 and middle at (2N+2) DIV 3 — the DuckDB
    # oracle keeps its literal ntile and hashes identical.
    bucket_counts = per_doc.groupBy("ppl_milli").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w_score = W.orderBy("ppl_milli").rowsBetween(W.unboundedPreceding, 0)
    offsets = bucket_counts.select(
        "ppl_milli",
        (F.sum("bn").over(w_score) - F.col("bn")).alias("off"),
    )
    totals = bucket_counts.agg(F.sum("bn").alias("n_docs"))
    w_local = W.partitionBy("ppl_milli").orderBy("doc_id")
    return (
        per_doc.join(offsets, "ppl_milli")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "n_bigrams",
            "ppl_milli",
            (F.col("off") + F.row_number().over(w_local)).alias("_rn"),
            "n_docs",
        )
        .select(
            "doc_id",
            "n_bigrams",
            "ppl_milli",
            F.when(
                F.expr("_rn <= (n_docs + 2) DIV 3"), F.lit("head")
            )
            .when(
                F.expr("_rn <= (2 * n_docs + 2) DIV 3"), F.lit("middle")
            )
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target_cond: Column,
    n_features: int = 1024,
    scale: int = 1000,
    keep_num: int = 1,
    keep_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every RAW document by how much more likely its hashed
    n-gram features are under the TARGET domain's distribution than
    under the raw distribution, then keep the top slice. This is the
    production recipe for "find the Wikipedia-like fraction of the
    crawl": fit two bag-of-hashed-ngrams multinomials (add-one
    smoothed), importance log-weight = Σ_features c_doc[b] ·
    (ln p_target[b] − ln p_raw[b]).

    ``target_cond`` partitions the corpus: rows where it holds fit the
    target distribution; all OTHER rows fit the raw distribution and
    are the scored/selected population (fit and scored populations for
    the raw side coincide, as in the paper — q̂ is the raw corpus's own
    distribution).

    Exactness: features are md5-hashed unigram+bigram occurrences
    (engine-portable); each per-feature weight is
    ``floor(scale · (ln((ct+1)/(T+m)) − ln((cr+1)/(R+m))))`` — two
    IEEE-double logs of exact-integer ratios, identical cross-engine —
    and doc scores are exact integer sums of those weights. Selection
    keeps the top ``keep_num/keep_den`` of scored docs by the
    deterministic (score DESC, id) total order.

    Scale shape: one tokenizing corpus scan → feature-count shuffle
    keyed by the BOUNDED feature space (m buckets, not vocab); totals
    are a broadcast 1-row aggregate; the m-row weight table BROADCASTS
    back onto the occurrence stream (no corpus-sized shuffle on the
    scoring side); per-doc sum is map-side combinable. The final rank
    uses the repo's two-phase prefix-sum cut (the ``ppl_buckets``
    pattern): per-score counts (map-side combinable) feed a prefix-sum
    window over the DISTINCT-SCORE relation — metadata-scale — whose
    offsets broadcast back, and the row-level window partitions by
    ``logw_milli`` so the rank never funnels the scored corpus through
    one partition. ``test_plan_shapes`` pins the absence of an
    empty-partitionBy window.

    Output: ``doc_id, n_feats, logw_milli, sel_rank, selected`` for
    every raw doc with AT LEAST ONE alphabetic feature — a doc whose
    text yields no [a-z] tokens (NULL/empty/all-digit) has no
    evidence to score and is EXCLUDED from both the output and the
    top-``keep_num/keep_den`` quota's denominator (the DuckDB oracle
    behaves identically); callers wanting one row per raw doc should
    left-join this back to the corpus.
    """
    from pyspark.sql import Window as W

    # hashed-ngram featurization is the heavy stage: fan the scan out
    docs = fan_out_scan(docs)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target_cond.cast("int").alias("is_tgt"),
        F.split(
            F.trim(F.regexp_replace(F.lower(text_col), "[^a-z]+", " ")), " "
        ).alias("t"),
    ).filter(F.size("t") >= 1)
    feats = toks.select(
        "doc_id",
        "is_tgt",
        F.explode(
            F.expr(
                # sequence(0, n) is DESCENDING for n < 0, so the bigram
                # arm must be gated on size >= 2, not clamped
                "concat(filter(t, x -> x <> ''),"
                " CASE WHEN size(t) >= 2"
                " THEN transform(sequence(0, size(t) - 2),"
                "                i -> concat(t[i], ' ', t[i+1]))"
                " ELSE CAST(array() AS ARRAY<STRING>) END)"
            )
        ).alias("feat"),
    )
    b = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("long")
        % n_features
    )
    occ = feats.select("doc_id", "is_tgt", b.alias("b"))
    counts = occ.groupBy("b").agg(
        F.sum("is_tgt").alias("ct"),
        F.sum(F.expr("1 - is_tgt")).alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot")
    )
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"CAST(floor({scale} * ("
            f"ln(CAST(ct + 1 AS DOUBLE) / CAST(t_tot + {n_features} AS DOUBLE))"
            f" - ln(CAST(cr + 1 AS DOUBLE) / CAST(r_tot + {n_features} AS DOUBLE))"
            ")) AS BIGINT)"
        ).alias("w"),
    )
    scored = (
        occ.filter(F.col("is_tgt") == 0)
        .join(F.broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w").alias("logw_milli"),
        )
    )
    # two-phase prefix-sum rank over the (logw_milli DESC, doc_id)
    # total order: per-score counts → prefix sum over the distinct
    # score relation (metadata-scale: one row per distinct milli-nat
    # weight) → offsets broadcast back → row-level window partitioned
    # by score. Rank values are identical to the single-partition
    # row_number this replaces (same total order), so the oracle hash
    # is unchanged; a pathological all-one-score corpus degrades to
    # the global sort it replaces.
    score_counts = scored.groupBy("logw_milli").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w_score = W.orderBy(F.col("logw_milli").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    offsets = score_counts.select(
        "logw_milli",
        (F.sum("bn").over(w_score) - F.col("bn")).alias("off"),
    )
    totals = score_counts.agg(F.sum("bn").alias("n_scored"))
    w_local = W.partitionBy("logw_milli").orderBy("doc_id")
    return (
        scored.join(offsets, "logw_milli")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "n_feats",
            "logw_milli",
            (F.col("off") + F.row_number().over(w_local))
            .cast("long")
            .alias("sel_rank"),
            "n_scored",
        )
        .select(
            "doc_id",
            "n_feats",
            "logw_milli",
            "sel_rank",
            F.expr(
                f"sel_rank <= (n_scored * {keep_num} + {keep_den - 1})"
                f" DIV {keep_den}"
            ).alias("selected"),
        )
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    rrf_k: int = 60,
    scale: int = 1_000_000_000_000,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists — the
    standard hybrid-search combiner (Cormack et al., SIGIR'09; the
    fusion step behind every BM25+vector "hybrid" endpoint):
    ``score(d) = Σ_lists 1 / (rrf_k + rank_d)``, documents missing
    from a list contribute nothing.

    Engine-exact scoring: each reciprocal is the INTEGER
    ``scale div (rrf_k + rank)`` (no floating division anywhere), so
    fused scores and the final ranking are bit-identical across
    engines; ties break by document id.

    Plan: the lists union (they are top-k-sized — tiny relative to the
    corpora that produced them), one hash aggregate sums
    contributions, and the final top-k lowers to
    TakeOrderedAndProject. Cost is ∝ Σ list sizes, independent of
    corpus size — fusion is never the scale bottleneck; the retrieval
    legs are, and each leg keeps its own index-pruned plan.

    Output: ``{id_col}, rrf_scaled, n_lists, rk``.
    """
    from pyspark.sql.window import Window

    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contrib = F.expr(
        f"CAST({scale} AS BIGINT) div CAST({rrf_k} + {rank_col} AS BIGINT)"
    )
    parts = [
        df.select(F.col(id_col), contrib.alias("_c")) for df in ranked_lists
    ]
    uni = parts[0]
    for p in parts[1:]:
        uni = uni.unionByName(p)
    agg = uni.groupBy(id_col).agg(
        F.sum("_c").alias("rrf_scaled"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.orderBy(F.col("rrf_scaled").desc(), F.col(id_col))
    return (
        agg.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
    )
