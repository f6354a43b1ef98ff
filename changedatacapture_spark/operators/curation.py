"""Training-corpus curation operators: deterministic splits, sequence
packing, and filter funnels.

These are the operations a large-scale LLM-data pipeline runs after
dedup/quality scoring (none exist in the reference — it stops at CDC
materialization — but they are the reason a 100 TB corpus engine is
worth having). All are pure column expressions / window functions:

- **split assignment** hashes the *document id*, not row position, so
  the train/val/test partition is stable under reordering, reruns and
  incremental appends — the property random() sampling lacks;
- **sequence packing** is the contiguous-fill approximation (running
  token total per stream, cut every ``max_tokens``): a two-phase
  distributed prefix sum, no driver loop, deterministic bins;
- **the funnel** composes the quality filters as plain predicates so
  Catalyst can collapse them into one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from changedatacapture_spark.operators.text import tokens

_HEX = "0123456789abcdef"


def _hash_bucket_expr(instr_fn: str, arg: str, n_buckets: int = 100) -> str:
    """Engine-portable SQL: first 4 md5 hex digits of ``arg`` → int
    in [0, n_buckets). ``instr_fn`` is ``instr`` (Spark) / ``strpos``
    (DuckDB); everything else is shared arithmetic.
    """
    terms = " + ".join(
        f"({instr_fn}('{_HEX}', substring(md5({arg}), {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) % {n_buckets})"


def split_bucket(id_expr_sql: str) -> Column:
    """Spark column: md5-derived bucket in [0, 100) for an id expression."""
    return F.expr(_hash_bucket_expr("instr", id_expr_sql)).cast("long")


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each document a stable train/val/test split label.

    bucket = md5(id) mod 100; [0, train) → train, [train, train+val)
    → val, rest → test. Adding documents later never moves an existing
    document between splits (content-addressed, not position-based).
    """
    bucket = split_bucket(f"CAST({id_col} AS STRING)")
    label = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        F.col(id_col), bucket.alias("split_bucket"), label.alias("split")
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    stream_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 4096,
) -> DataFrame:
    """Contiguous-fill sequence packing: within each stream, documents
    (in stable ``order_col`` order) fill bins of ``max_tokens``.

    bin = floor(exclusive-running-token-total / max_tokens). An
    oversized document (n_tokens >= max_tokens) *overflows* the bin it
    starts in — bins are contiguous token ranges of the stream, not
    per-document allocations — and the next document jumps to the first
    bin past the overflow.

    Scale: the running total is a TWO-PHASE prefix sum, never one
    window over a whole stream (which would sort and sum each stream's
    entire corpus on a single executor — a straggler at 100×):

    1. rows chunk by ``floor(order / chunk_size)`` — monotone in the
       order key, so chunk order == document order;
    2. per-(stream, chunk) token subtotals (map-side combinable agg)
       feed a prefix-sum window over the *chunk* table — per-stream
       serial state is O(n_chunks), tuned by ``chunk_size``, instead of
       O(n_docs);
    3. chunk offsets broadcast-join back; the per-row window now
       partitions by (stream, chunk) — parallel across chunks.

    Requires a numeric ``order_col`` (chunking needs monotone integer
    division; a non-numeric key raises rather than silently falling
    back to the single-window shape).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    if not isinstance(docs.schema[order_col].dataType, T.NumericType):
        raise TypeError(
            f"pack_sequences needs a numeric order column, got "
            f"{docs.schema[order_col].dataType.simpleString()!r} for {order_col!r}"
        )

    n_tok = F.size(tokens(F.col(text_col)))
    base = docs.select(
        F.col(order_col), F.col(stream_col), n_tok.alias("n_tokens")
    )
    return pack_by_weight(
        base, "n_tokens", max_tokens, stream_col, order_col, chunk_size
    )


def pack_by_weight(
    df: DataFrame,
    weight_col: str,
    max_weight: int,
    stream_col: str,
    order_col: str,
    chunk_size: int = 4096,
) -> DataFrame:
    """The generic two-phase contiguous-fill core behind
    :func:`pack_sequences` (token bins) and media shard assignment
    (byte-sized shards): ``bin = floor(exclusive-running-weight /
    max_weight)`` within each stream, with the prefix sum chunked so no
    single executor ever sorts a whole stream. See
    :func:`pack_sequences` for the phase-by-phase scale rationale.
    """
    from pyspark.sql import Window as W

    base = df.select(
        F.col(order_col),
        F.col(stream_col),
        F.col(weight_col),
        F.floor(F.col(order_col) / chunk_size).cast("long").alias("_chunk"),
    )
    chunk_sums = base.groupBy(stream_col, "_chunk").agg(
        F.sum(weight_col).alias("_chunk_w")
    )
    w_chunks = (
        W.partitionBy(stream_col)
        .orderBy("_chunk")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = chunk_sums.select(
        stream_col,
        "_chunk",
        (F.sum("_chunk_w").over(w_chunks) - F.col("_chunk_w")).alias("_offset"),
    )
    w_local = (
        W.partitionBy(stream_col, "_chunk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local_cum = F.sum(weight_col).over(w_local)
    # no explicit broadcast hint: offsets is n_rows/chunk_size rows per
    # stream, which at corpus scale can exceed the broadcast threshold
    # and fail the job — AQE broadcasts it automatically while it's
    # small and falls back to shuffle join when it isn't
    return base.join(offsets, [stream_col, "_chunk"]).select(
        F.col(order_col),
        F.col(stream_col),
        F.col(weight_col),
        F.floor(
            (F.col("_offset") + local_cum - F.col(weight_col)) / max_weight
        )
        .cast("long")
        .alias("bin"),
    )


def stratified_sample(
    docs: DataFrame,
    rates_pct: dict[str, int],
    default_pct: int = 0,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a document iff its
    md5 bucket (0-99) falls below its stratum's percentage.

    Content-addressed like :func:`split_assign` — the sample is stable
    under reordering, reruns, and incremental appends (a rerun samples
    the SAME documents), which ``df.sample()``'s RNG cannot give. Pure
    predicate: no shuffle, composes with any downstream operator.
    ``rates_pct`` maps stratum value → percent kept; unlisted strata
    use ``default_pct``.
    """
    bucket = split_bucket(f"CAST({id_col} AS STRING)")
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(rate)
    return docs.filter(bucket < rate)


def weighted_sample(
    docs: DataFrame,
    total_weight: int,
    target_k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep a document with
    probability ``min(1, target_k * weight / total_weight)`` — the
    importance-sampling step that keeps high-quality (high-weight)
    documents preferentially while hitting an expected sample size of
    ``target_k`` (items with weight above ``total_weight/target_k``
    are always kept, the standard weighted-Bernoulli behavior).

    Content-addressed and EXACT-INTEGER: the acceptance test is
    ``hash60(id) * total_weight < weight * target_k * 2^60`` computed
    in DECIMAL(38,0) — no float probability, no RNG, so the sample is
    stable under reordering/reruns and bit-identical in any engine
    (DuckDB runs the same comparison in HUGEINT). ``total_weight`` is
    passed in (one prior aggregate, a bounded scalar) so the filter
    itself stays a zero-shuffle pure predicate over the scan.
    """
    h60 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    # constants ride as string literals: k * 2^60 exceeds int64, and
    # py4j marshals a bare Python int through Long.parseLong
    lhs = h60 * F.lit(str(int(total_weight))).cast("decimal(38,0)")
    rhs = (
        F.col(weight_col).cast("decimal(38,0)")
        * F.lit(str(int(target_k) * (1 << 60))).cast("decimal(38,0)")
    )
    return docs.filter(lhs < rhs)


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    stream_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Greedy quality-first selection under a per-stream token budget:
    order each stream's documents by quality (descending, doc_id
    tie-break) and keep them while the running token total stays
    within ``budget_tokens``.

    Quality is the integer alpha-ratio per-mille (exact in any
    engine). The running total is the same two-phase prefix sum as
    :func:`pack_sequences`, with the quality value itself as the chunk
    key (≤1001 distinct values): per-(stream, quality) subtotals feed
    a tiny prefix-sum window, offsets broadcast back, and the per-row
    window partitions by (stream, quality) — no whole-stream sort on
    one executor.

    Output: ``doc_id, source, quality_pm, n_tokens`` for selected
    documents only.
    """
    from pyspark.sql import Window as W

    n_tok = F.size(tokens(F.col(text_col)))
    # integer division: exact and identical in Spark (DIV) and DuckDB (//)
    q = F.expr(
        f"1000 * length(regexp_replace({text_col}, '[^A-Za-z]', '')) "
        f"DIV greatest(length({text_col}), 1)"
    )
    base = docs.select(
        F.col("doc_id"),
        F.col(stream_col),
        n_tok.alias("n_tokens"),
        q.cast("long").alias("quality_pm"),
    )
    chunk_sums = base.groupBy(stream_col, "quality_pm").agg(
        F.sum("n_tokens").alias("_chunk_tok")
    )
    w_chunks = (
        W.partitionBy(stream_col)
        .orderBy(F.col("quality_pm").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = chunk_sums.select(
        stream_col,
        "quality_pm",
        (F.sum("_chunk_tok").over(w_chunks) - F.col("_chunk_tok")).alias("_offset"),
    )
    w_local = (
        W.partitionBy(stream_col, "quality_pm")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.col("_offset") + F.sum("n_tokens").over(w_local)
    # offsets is bounded (≤1001 quality values per stream) but the
    # hint is still left to AQE for uniformity with pack_sequences
    return (
        base.join(offsets, [stream_col, "quality_pm"])
        .select(
            "doc_id", stream_col, "quality_pm", "n_tokens", cum.alias("_cum")
        )
        .filter(F.col("_cum") <= budget_tokens)
        .drop("_cum")
    )


def curation_funnel(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    min_alpha_pm: int = 500,
) -> DataFrame:
    """Per-stage survivor counts of a minimal curation pipeline:
    total → length filter → alpha-ratio filter → exact dedup.

    Output: ``stage, n_docs`` (stage names ordered ``0_total`` …
    ``3_dedup`` so the funnel reads top-down when sorted). Integer
    arithmetic only (``n_alpha * 1000 >= min_alpha_pm * n_chars``)
    keeps the predicate exact in any engine.

    ONE scan, one aggregate: every stage is a conditional count over
    the same pass (cumulative predicates; the dedup stage is a
    ``count_distinct`` of surviving texts, which ignores the NULLs the
    ``when`` leaves for filtered docs). The union-of-four-counts form
    scanned the corpus once per stage — 4x the dominant cost.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    p1 = n_chars >= min_chars
    p2 = p1 & (n_alpha * 1000 >= min_alpha_pm * n_chars)
    agg = docs.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(p1.cast("long")).alias("n1"),
        F.sum(p2.cast("long")).alias("n2"),
        F.count_distinct(F.when(p2, t)).alias("n3"),
    )
    return agg.select(
        F.expr(
            "stack(4, '0_total', n0, '1_minlen', n1,"
            " '2_alpha', n2, '3_dedup', n3) AS (stage, n_docs)"
        )
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking for context-length-bounded
    training examples: overlapping windows of ``chunk_tokens``
    whitespace tokens, stride ``chunk_tokens - overlap``.

    Zero-shuffle: tokenize → ``sequence`` of starts → ``explode`` →
    ``slice`` are all per-row expressions, so the plan is one codegen'd
    projection over the scan — at 100 TB, chunking is a map-only pass
    that keeps the input partitioning for whatever shuffles follow.

    Output one row per chunk: ``doc_id, chunk_idx, start_tok,
    n_tok_chunk, chunk_fp`` (md5 of the chunk text — downstream
    dedup/packing key material without carrying the text twice).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    tk = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("doc_id"), tk.alias("_tk"), F.size(tk).alias("_n")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)
    )
    chunked = base.select(
        "doc_id",
        "_tk",
        "_n",
        F.explode(starts).alias("start_tok"),
    )
    piece = F.slice(F.col("_tk"), F.col("start_tok") + 1, chunk_tokens)
    return chunked.select(
        "doc_id",
        (F.col("start_tok") / stride).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tok_chunk"),
        F.md5(F.array_join(piece, " ")).alias("chunk_fp"),
    )


def chunk_documents_sql(
    chunk_tokens: int = 50, overlap: int = 10
) -> str:
    """DuckDB oracle twin of :func:`chunk_documents` (same rule)."""
    stride = chunk_tokens - overlap
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    starts AS (
      SELECT doc_id, tk,
             unnest(range(0, greatest(len(tk), 1), {stride})) AS start_tok
      FROM toks)
    SELECT doc_id,
           CAST(start_tok / {stride} AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least({chunk_tokens}, len(tk) - start_tok) AS BIGINT)
             AS n_tok_chunk,
           md5(array_to_string(
                 list_slice(tk, start_tok + 1, start_tok + {chunk_tokens}), ' '))
             AS chunk_fp
    FROM starts
    """


def mix_weights(
    docs: DataFrame,
    group_col: str = "lang",
    target_ppm: dict[str, int] | None = None,
    cap_ppm: int = 3_000_000,
    text_col: str = "text",
) -> DataFrame:
    """Domain-mixing weights: per-group sampling weight that moves the
    corpus token distribution toward a target mix.

    ``weight = min(cap, target_share / natural_share)`` — groups under
    their target get up-weighted (epochs > 1), over-represented groups
    get down-sampled. All ratios are scaled-ppm BIGINT arithmetic
    (``floor`` division), so results are bit-identical in any engine —
    the usual float shares would hash-mismatch across engines.

    One aggregation (tokens per group) + one tiny cross join against
    the single-row total: group cardinality is the number of domains
    (tens), so every post-agg step is driver-trivial at any corpus
    size; the only data-sized pass is the token count scan.
    """
    target_ppm = target_ppm or {}
    t = F.col(text_col)
    per = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(t))).alias("grp_tokens"),
    )
    total = per.agg(F.sum("grp_tokens").alias("tot_tokens"))
    tgt = F.lit(0)
    for k, v in target_ppm.items():
        tgt = F.when(F.col("grp") == k, F.lit(v)).otherwise(tgt)
    joined = per.crossJoin(F.broadcast(total))
    natural_ppm = F.floor(
        F.col("grp_tokens") * F.lit(1_000_000) / F.col("tot_tokens")
    ).cast("long")
    # a group under 1 ppm of corpus tokens floors natural_ppm to 0; with
    # ANSI enabled a raw division would raise DIVIDE_BY_ZERO at runtime,
    # so clamp the divisor — the tiny group then deterministically hits
    # cap_ppm, which is the intended "up-weight as far as allowed" rule
    weight_ppm = F.least(
        F.lit(cap_ppm).cast("long"),
        F.floor(
            tgt.cast("long")
            * F.lit(1_000_000)
            / F.greatest(natural_ppm, F.lit(1).cast("long"))
        ).cast("long"),
    )
    return joined.select(
        "grp",
        "n_docs",
        "grp_tokens",
        natural_ppm.alias("natural_ppm"),
        tgt.cast("long").alias("target_ppm"),
        weight_ppm.alias("weight_ppm"),
        F.floor(F.col("grp_tokens") * weight_ppm / F.lit(1_000_000))
        .cast("long")
        .alias("effective_tokens"),
    )


def content_defined_chunks(
    docs: DataFrame,
    window: int = 8,
    mask: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (Rabin-style): a chunk boundary falls
    wherever the hash of the trailing ``window`` characters is 0 mod
    ``mask`` — so chunk boundaries move WITH the content, and an
    insertion near the start of a document re-chunks only its
    neighborhood instead of shifting every downstream fixed-size chunk
    (the property that makes chunk-level dedup of near-identical
    documents work; fixed-size chunking gets zero hits after a 1-char
    shift). Average chunk length ≈ ``mask`` characters; the textbook
    parallel formulation (no min/max clamp — FastCDC's clamps need a
    sequential pass by design).

    Scale shape: the position explode (one row per character) is the
    rolling-hash scan cost and is map-local; the boundary filter keeps
    ~1/mask of it before anything shuffles. Engine-portable: the
    rolling hash is md5 of the window substring, so an ANSI oracle
    reproduces the exact boundary set.

    Output: ``doc_id, chunk_idx, start_pos, chunk_len, chunk_md5``
    (1-based positions; every document ends with a sentinel boundary,
    so chunks tile the text exactly)."""
    d = docs.filter(F.length(text_col) >= 1).select(id_col, text_col)
    pos = d.select(
        id_col,
        F.explode(
            F.when(
                F.length(text_col) >= window,
                F.sequence(F.lit(window), F.length(text_col)),
            ).otherwise(F.array())
        ).alias("i"),
        F.col(text_col),
    )
    roll = F.conv(
        F.substring(
            F.md5(F.expr(f"substring({text_col}, i - {window - 1}, {window})")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    bounds = pos.filter(roll % mask == 0).select(id_col, "i")
    sentinel = d.select(id_col, F.length(text_col).alias("i"))
    be = bounds.unionByName(sentinel).distinct()
    from pyspark.sql.window import Window as W

    w = W.partitionBy(id_col).orderBy("i")
    spans = be.select(
        id_col,
        F.col("i").alias("end_pos"),
        (F.coalesce(F.lag("i").over(w), F.lit(0)) + 1).alias("start_pos"),
    )
    out = spans.join(d, id_col).select(
        id_col,
        F.row_number()
        .over(W.partitionBy(id_col).orderBy("start_pos"))
        .alias("chunk_idx"),
        "start_pos",
        (F.col("end_pos") - F.col("start_pos") + 1).alias("chunk_len"),
        F.md5(
            F.expr(f"substring({text_col}, start_pos, end_pos - start_pos + 1)")
        ).alias("chunk_md5"),
    )
    return out


def chunk_overlap_pairs(
    docs: DataFrame,
    window: int = 8,
    mask: int = 64,
    min_chunk_len: int = 16,
    max_docs_per_chunk: int = 20,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-level exact-substring overlap pairs — the dedup primitive
    ``content_defined_chunks`` exists for: because boundaries move with
    the content, two documents sharing any sufficiently long substring
    share the full chunks inside it REGARDLESS of where the substring
    sits in each document (fixed-stride windows only match when the
    two occurrences happen to be grid-aligned).

    Same hub-guard join shape as ``winnow_overlap_pairs``: distinct
    (doc, chunk) rows, chunk frequency as a window count over the SAME
    chunk key the self-join shuffles on (exchange reuse — no second
    scan), chunks in > ``max_docs_per_chunk`` docs dropped (boilerplate
    guard; every join group bounded at ``max_docs_per_chunk``²), tiny
    chunks below ``min_chunk_len`` dropped as noise.

    Output: ``doc_a, doc_b, shared_chunks, shared_len`` (total
    characters of shared chunk content).
    """
    from pyspark.sql.window import Window as W

    chunks = content_defined_chunks(docs, window, mask, text_col, id_col)
    ch = (
        chunks.filter(F.col("chunk_len") >= min_chunk_len)
        .select(F.col(id_col).alias("doc_id"), "chunk_md5", "chunk_len")
        .distinct()
    )
    wspec = W.partitionBy("chunk_md5")
    rare = (
        ch.withColumn("_n", F.count(F.lit(1)).over(wspec))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_docs_per_chunk))
        .drop("_n")
        .hint("merge")
    )
    a = rare.select("chunk_md5", F.col("doc_id").alias("doc_a"), "chunk_len")
    b = rare.select("chunk_md5", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "chunk_md5")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("shared_chunks"),
            F.sum("chunk_len").alias("shared_len"),
        )
        .filter(F.col("shared_chunks") >= min_shared)
    )


def token_waterfill(
    docs: DataFrame,
    budget_num: int = 3,
    budget_den: int = 5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Water-filling token allocation across sources: given a global
    token budget ``B = total * budget_num DIV budget_den``, find the
    common cap level ``L`` such that ``Σ min(tokens_s, L)`` spends the
    budget — small sources keep everything, large sources are capped
    at the same level — the fair-share mixing algorithm used to stop
    one giant crawl from dominating a training mix.

    Exact integers throughout: sources sort ascending by token count,
    the valid prefix ``m`` is the largest rank whose source fits under
    its candidate level ``(B - prefix_m) DIV (n - m)``, and the final
    level divides the residual budget among the capped sources.
    Candidate levels are guarded to non-negative operands so truncating
    DIV (Spark) and flooring ``//`` (DuckDB) agree.

    Scale: one map-side-combinable token-count aggregate over the
    corpus; everything after operates on the SOURCES table (bounded —
    tens of rows at any corpus size), so the windows and cross joins
    are driver-trivial by construction.

    Output: ``source, n_tokens, allocated, capped``.
    """
    from pyspark.sql import Window as W

    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("t")
    )
    wr = W.orderBy("t", "source")
    r = (
        per.withColumn("k", F.row_number().over(wr))
        .withColumn(
            "prefix",
            F.sum("t").over(wr.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    tot = r.agg(
        F.max("k").alias("n"), F.sum("t").alias("t_tot")
    ).withColumn("b", F.expr(f"t_tot * {budget_num} DIV {budget_den}"))
    j = r.crossJoin(F.broadcast(tot))
    cand = j.withColumn(
        "l_k",
        F.expr("CASE WHEN n > k AND b >= prefix THEN (b - prefix) DIV (n - k) END"),
    )
    sel = cand.agg(
        F.max(F.expr("CASE WHEN t <= l_k THEN k END")).alias("m"),
        F.max(F.expr("CASE WHEN t <= l_k THEN prefix END")).alias("prefix_m"),
    ).select(
        F.coalesce("m", F.lit(0)).alias("m"),
        F.coalesce("prefix_m", F.lit(0)).alias("prefix_m"),
    )
    lvl = (
        sel.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "CASE WHEN b >= t_tot THEN NULL "
                "WHEN n > m THEN (b - prefix_m) DIV (n - m) END"
            ).alias("lvl"),
            "b",
            "t_tot",
        )
    )
    return (
        r.crossJoin(F.broadcast(lvl))
        .select(
            "source",
            F.col("t").alias("n_tokens"),
            F.expr(
                "CASE WHEN b >= t_tot OR lvl IS NULL THEN t "
                "ELSE least(t, lvl) END"
            ).alias("allocated"),
            F.expr(
                "CASE WHEN b >= t_tot OR lvl IS NULL THEN false "
                "ELSE t > lvl END"
            ).alias("capped"),
        )
    )


def isqrt_sql(arg: str) -> str:
    """Engine-portable EXACT integer square root of a non-negative
    BIGINT expression: the double ``sqrt`` corrected by one integer
    comparison on each side, so the result is ``floor(sqrt(n))``
    bit-for-bit on any engine regardless of libm (shared by
    :func:`temperature_mix`, its DuckDB oracle, and the hypothesis
    property test — one source of truth, the ``zorder16_sql``
    pattern).

    Overflow guards at the top of the BIGINT range: the ``+1`` probe
    is gated on ``s0 < 3037000499`` (the largest s where ``(s+1)^2``
    fits int64) — past it the square would wrap negative in non-ANSI
    Spark and silently return ``s0 + 1`` off by one. And for n within
    ~2.1e9 of 2^63-1 the double sqrt itself can land at 3037000500,
    whose own square also overflows — but floor(sqrt(n)) ≤ 3037000499
    for EVERY int64 n, so that case IS the answer, short-circuited
    before either multiply."""
    s0 = f"CAST(floor(sqrt(CAST({arg} AS DOUBLE))) AS BIGINT)"
    return (
        f"CASE WHEN {s0} > 3037000499 THEN CAST(3037000499 AS BIGINT) "
        f"WHEN {s0} < 3037000499 "
        f"AND ({s0} + 1) * ({s0} + 1) <= {arg} THEN {s0} + 1 "
        f"WHEN {s0} * {s0} > {arg} THEN {s0} - 1 "
        f"ELSE {s0} END"
    )


def temperature_mix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based source sampling weights at alpha = 1/2: the
    multilingual/multi-source mixing rule (p_s proportional to
    (n_s/N)^alpha) that flattens the natural distribution so small
    sources are upsampled relative to giant crawls — the standard
    sampling scheme of multilingual pretraining (XLM-R-style), sitting
    between natural sampling (alpha=1) and uniform (alpha=0).

    Exactness across engines: alpha = 1/2 makes the unnormalized
    weight an integer square root, computed EXACTLY — the double
    ``sqrt`` is corrected by one integer comparison on each side
    (``(s+1)^2 <= n`` / ``s^2 > n``), so the result is floor(sqrt(n))
    bit-for-bit on any engine regardless of libm. Normalization is
    scaled-ppm integer floor division over the exact BIGINT sum of
    roots. For arbitrary alpha at scale the weight becomes one double
    ``pow`` per SOURCE (a bounded relation), not per row.

    Scale: one map-side-combinable token-count aggregate over the
    corpus (the only full scan); everything after operates on the
    bounded SOURCES table, and the 1-row total joins back as a
    broadcast — no second scan, no driver collect.

    Output: ``source, n_tokens, natural_ppm, temp_ppm, boost_milli,
    effective_tokens`` — ``boost_milli`` > 1000 means the source is
    upsampled vs natural; ``effective_tokens`` is its share of the
    unchanged global token budget under temperature sampling.
    ``effective_tokens`` splits its product as
    ``(tot DIV 1e6)·ppm + ((tot % 1e6)·ppm) DIV 1e6`` — algebraically
    EQUAL to ``floor(tot·ppm/1e6)`` but overflow-free to the full
    BIGINT token range (the naive product wraps past ~9.2e12 total
    tokens). The per-source ppm ratios remain exact to ~9.2e12 tokens
    PER SOURCE (the ``n·1e6`` numerator); past that, widen them to
    DECIMAL(38,0) — same bound as ``mix_weights``.
    """
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens")
    )
    rooted = per.withColumn("s", F.expr(isqrt_sql("n_tokens")))
    tot = rooted.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("s").alias("tot_s")
    )
    return (
        rooted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            "tot_tokens",
            F.expr("n_tokens * 1000000 DIV tot_tokens").alias("natural_ppm"),
            F.expr("s * 1000000 DIV tot_s").alias("temp_ppm"),
        )
        .select(
            "source",
            "n_tokens",
            "natural_ppm",
            "temp_ppm",
            F.expr("temp_ppm * 1000 DIV greatest(natural_ppm, 1)").alias(
                "boost_milli"
            ),
            F.expr(
                "(tot_tokens DIV 1000000) * temp_ppm"
                " + ((tot_tokens % 1000000) * temp_ppm) DIV 1000000"
            ).alias("effective_tokens"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Duplicate-cluster-atomic train/val/test assignment: hash the
    duplicate GROUP's canonical id (not the document's own) into the
    split bucket, so every member of a near-dup cluster lands in the
    same split — the guard against train/test leakage through
    near-duplicates that plain per-document splitting
    (``split_assign``) cannot give. Documents in no cluster are their
    own singleton group (left join + coalesce), so the split remains
    total and content-addressed.

    ``groups`` is any (doc_id, group_id) relation with AT MOST ONE
    row per doc_id (connected components guarantees this; a
    many-rowed relation would fan the join out) — typically the
    MinHash→LSH→connected-components closure (``dedup_groups``) or
    the embedding closure; the operator is representation-agnostic.

    Scale: one doc_id-keyed equi-join (the groups relation is tiny
    relative to the corpus — only clustered docs appear) and a pure
    md5 bucket expression; no window, no extra shuffle beyond the
    join.

    Output: ``doc_id, group_id, bucket, split``.
    """
    g = groups.select(
        F.col(id_col).alias("_gid_doc"), F.col("group_id").alias("_gid")
    )
    assigned = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(g, F.col("doc_id") == F.col("_gid_doc"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_gid"), F.col("doc_id")).alias("group_id"),
        )
    )
    bucket = split_bucket("CAST(group_id AS STRING)")
    return assigned.select(
        "doc_id",
        F.col("group_id").cast("long").alias("group_id"),
        bucket.alias("bucket"),
    ).withColumn(
        "split",
        F.expr(
            f"CASE WHEN bucket < {train_pct} THEN 'train' "
            f"WHEN bucket < {train_pct + val_pct} THEN 'val' "
            "ELSE 'test' END"
        ),
    )


def doremi_step(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    chars_col: str = "n_chars",
    eta_x1000: int = 2000,
    smooth_ppm: int = 100_000,
) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023):
    multiplicative-weights update of per-source sampling weights by
    each source's EXCESS LOSS over the corpus reference, then smoothing
    toward uniform — the optimization loop that tunes pretraining
    mixture weights (DoReMi runs it per proxy-model step; here one
    relational step over the corpus).

    Engine-exact by construction: DoReMi's ``exp(eta * excess)`` is
    LINEARIZED to ``1 + eta * excess`` in scaled-ppm integer
    arithmetic (a libm ``exp`` per source would be the one
    non-portable op; for the small per-step excesses the loop feeds,
    the first-order update is the same algorithm family — and it is
    exactly reproducible in ANSI SQL). The loss proxy is pluggable; the
    registered query uses mean chars-per-token (a deterministic
    verbosity statistic) so the full update pipeline — proxy → excess
    → MW update → normalize → uniform smoothing — is oracle-verified
    end to end. Integer ranges: every product stays below 9.2e18 for
    corpora up to ~9e12 chars per source (the repo's documented ppm
    range).

    Scale shape: ONE map-side-combinable per-source aggregate (the
    SOURCES table is mixture-sized, not corpus-sized); everything
    after is arithmetic on that tiny relation.

    Output: ``grp, n_docs, grp_tokens, loss_proxy_ppm, excess_ppm,
    natural_ppm, doremi_ppm`` — exact integers, ``doremi_ppm`` the
    updated mixture weight (sums to ~1e6 up to floor drift).
    """
    per = docs.groupBy(F.col(source_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col(text_col), " ")))
        .cast("long")
        .alias("grp_tokens"),
        F.sum(F.col(chars_col)).cast("long").alias("grp_chars"),
    )
    tot = per.agg(
        F.sum("grp_tokens").alias("tot_tokens"),
        F.sum("grp_chars").alias("tot_chars"),
        F.count(F.lit(1)).alias("n_src"),
    )
    scored = per.crossJoin(F.broadcast(tot)).select(
        "grp",
        "n_docs",
        "grp_tokens",
        F.expr("grp_chars * CAST(1000000 AS BIGINT) DIV grp_tokens").alias(
            "loss_proxy_ppm"
        ),
        F.expr(
            "greatest(grp_chars * CAST(1000000 AS BIGINT) DIV grp_tokens"
            " - tot_chars * CAST(1000000 AS BIGINT) DIV tot_tokens,"
            " CAST(0 AS BIGINT))"
        ).alias("excess_ppm"),
        F.expr("grp_tokens * CAST(1000000 AS BIGINT) DIV tot_tokens").alias(
            "natural_ppm"
        ),
        "n_src",
    )
    raw = scored.withColumn(
        "_w1",
        F.expr(
            f"natural_ppm * (CAST(1000000 AS BIGINT)"
            f" + {eta_x1000} * excess_ppm DIV 1000) DIV 1000000"
        ),
    )
    norm = raw.crossJoin(
        F.broadcast(raw.agg(F.sum("_w1").alias("_sw")))
    ).select(
        "grp",
        "n_docs",
        "grp_tokens",
        "loss_proxy_ppm",
        "excess_ppm",
        "natural_ppm",
        F.expr(
            f"((CAST(1000000 AS BIGINT) - {smooth_ppm})"
            f" * (_w1 * CAST(1000000 AS BIGINT) DIV _sw)"
            f" + CAST({smooth_ppm} AS BIGINT)"
            f" * (CAST(1000000 AS BIGINT) DIV n_src)) DIV 1000000"
        ).alias("doremi_ppm"),
    )
    return norm
