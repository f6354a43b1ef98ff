"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Design for 100 TB:

- **Exact dedup** is a hash aggregation on the content key (or its md5
  for wide text) — map-side partial agg means the shuffle carries one
  row per distinct document per partition.
- **MinHash** signatures are computed scan-side with pure column
  expressions (``transform`` + ``md5`` + ``array_min``), no Python.
  md5 hex strings of equal length order lexicographically exactly like
  their numeric values, so ``min(md5(shingle || seed))`` is a valid,
  *engine-portable* minhash — the same computation is expressible in
  ANSI SQL for the oracle.
- **LSH banding** groups signatures into bands; candidate pairs come
  from a self-equi-join on (band_index, band_hash) — a shuffle on the
  band hash, never the O(n²) cross join. Skewed bands (boilerplate
  docs) are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from changedatacapture_spark.operators.layout import fan_out_scan


def _shingle_expr(text_col: str, k: int = 5) -> Column:
    """`transform(sequence(1, len-k+1), i -> substring(text, i, k))`."""
    return F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> substring({text_col}, i, {k}))"
    )


def minhash_signature(text_col: str, n_hashes: int = 8, k: int = 5) -> list[Column]:
    """``n_hashes`` MinHash values as columns ``mh0..mh{n-1}``.

    One md5 per shingle; hash family member ``j`` is the 8-hex-digit
    slice ``digest[8j .. 8j+8)`` (32 bits — ties across ~10³ shingles
    are negligible for min-selection). Deterministic, portable, and
    4× cheaper than hashing each shingle once per family member (the
    md5 is the dominant cost of the signature scan). ``n_hashes`` ≤ 4
    per digest; larger families chain ``md5(shingle || '#' || block)``.
    """
    sh = _shingle_expr(text_col, k)

    def digest_block(block: int):
        if block == 0:
            return F.transform(sh, lambda x: F.md5(x))
        return F.transform(sh, lambda x: F.md5(F.concat(x, F.lit(f"#{block}"))))

    def slicer(slot: int):
        # closure, NOT a default-arg lambda: PySpark reads a default
        # arg as the two-arg (element, index) transform form
        return lambda h: F.substring(h, slot * 8 + 1, 8)

    out = []
    for seed in range(n_hashes):
        block, slot = divmod(seed, 4)
        out.append(
            F.array_min(
                F.transform(digest_block(block), slicer(slot))
            ).alias(f"mh{seed}")
        )
    return out


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_hashes: int = 8, k: int = 5
) -> DataFrame:
    """Per-document MinHash signature table: doc_id, mh0..mh{n-1}.

    Two-phase plan so each digest block is computed ONCE per document
    (a single-select form would repeat the md5 transform per slice —
    HOFs are not common-subexpression-eliminated reliably): first
    materialize the digest arrays, then take the per-slice minima.
    """
    n_blocks = (n_hashes + 3) // 4
    # per-doc md5-per-shingle work dominates the scan: fan a narrow
    # source out first (no-op when the source already splits wide)
    docs = fan_out_scan(docs)
    sh = _shingle_expr(text_col, k)
    # build without default-arg lambdas (see minhash_signature)
    blocks = []
    for b in range(n_blocks):
        if b == 0:
            blocks.append(F.transform(sh, lambda x: F.md5(x)).alias("_dg0"))
        else:
            tag = f"#{b}"

            def hasher(t: str):
                return lambda x: F.md5(F.concat(x, F.lit(t)))

            blocks.append(F.transform(sh, hasher(tag)).alias(f"_dg{b}"))
    staged = docs.select("doc_id", *blocks)

    def slicer(slot: int):
        return lambda h: F.substring(h, slot * 8 + 1, 8)

    mh = []
    for seed in range(n_hashes):
        block, slot = divmod(seed, 4)
        mh.append(
            F.array_min(
                F.transform(F.col(f"_dg{block}"), slicer(slot))
            ).alias(f"mh{seed}")
        )
    return staged.select("doc_id", *mh)


def _first_shared_band(n_bands: int) -> Column:
    """True iff the current exploded band is the FIRST one the joined
    docs agree on: band_idx == 0, or every earlier band differs.
    Unrolled boolean chain (codegen-friendly) over the carried
    ``bands`` arrays of the ``a``/``b`` join sides — used by the
    UNCAPPED paths to emit each pair exactly once without a distinct
    (the capped paths dedup on the cap-bounded pair set instead, see
    :func:`_capped_banded`)."""
    idx = F.col("a.band_idx")
    cond = idx == 0
    prefix_differs = None
    for k in range(1, n_bands):
        ak = F.col("a.bands")[k - 1]
        bk = F.col("b.bands")[k - 1]
        neq = ak != bk
        prefix_differs = neq if prefix_differs is None else (prefix_differs & neq)
        cond = cond | ((idx == k) & prefix_differs)
    return cond


def _capped_banded(
    exploded: DataFrame, hash_col: str, max_bucket_size: int
) -> DataFrame:
    """Hub guard for LSH band self-joins: drop band buckets holding
    more than ``max_bucket_size`` docs before the self-join.

    A bucket with B docs emits B²/2 pairs from the self-join; one hot
    band (boilerplate shingles, near-constant signatures) turns the
    linear band join quadratic — measured 24× super-linear at 10× data
    before the cap. Hot buckets carry no dedup signal anyway: a band
    shared by thousands of documents identifies a boilerplate slice,
    not a duplicate pair (same rationale as the winnowing rare-fp
    guard, ``operators/text.py:winnow_overlap_pairs``). Use
    :func:`lsh_hot_buckets` to audit what a given cap drops.

    Plan: the bucket size is a window count partitioned by
    ``(band_idx, hash)`` — the SAME keys the sort-merge self-join
    shuffles and sorts on, so the window rides the join's own
    exchange+sort and the guard adds ZERO shuffles (the round-7
    aggregate→join-back→regroup→re-explode form cost three extra
    linear shuffles and measured 2-3× the uncapped wall). Both join
    sides are the identical subplan, so exchange reuse computes the
    signature scan once. Callers dedup the emitted pairs with a
    groupBy on the (cap-bounded) pair set — cheaper than shuffling
    docs×bands rows twice to maintain nulled min-band arrays.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("band_idx", hash_col)
    return (
        exploded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_bucket_n") <= max_bucket_size)
        .drop("_bucket_n")
        .hint("merge")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding.

    Docs sharing any band hash become a candidate pair (doc_a < doc_b).
    Planned as: explode to (band_idx, band_hash, doc_id) → self
    equi-join on the band — one shuffle keyed by band hash.

    ``max_bucket_size`` is the hub guard (see :func:`_capped_banded`):
    band buckets above it are dropped before the self-join, bounding
    every join group at cap²/2 pairs — without it one boilerplate-heavy
    bucket of B docs emits B²/2 pairs and a 100 TB corpus's hot band is
    a job-killer. ``None`` disables the guard (exact small-corpus use).
    """
    rows_per_band = n_hashes // bands

    def band_hashes() -> list[Column]:
        return [
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{j}")
                        for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]

    if max_bucket_size is not None:
        exploded = signatures.select(
            "doc_id",
            F.posexplode(F.array(*band_hashes())).alias("band_idx", "band_hash"),
        )
        banded = _capped_banded(exploded, "band_hash", max_bucket_size)
        a = banded.alias("a")
        b = banded.alias("b")
        # pair-set dedup: a pair colliding in several surviving bands
        # appears once per such band; the groupBy collapses them with
        # one shuffle of the pair set — bounded at cap²/2 per bucket by
        # the guard, and partial-agg combines band-local duplicates
        # before the wire
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    else:
        # The array is built INLINE in posexplode (not projected first
        # and exploded by reference): InferFiltersFromGenerate skips
        # literal CreateArray generator inputs, but for a column
        # reference it adds `size(bands) > 0`, which pushdown rewrites
        # into a per-row re-evaluation of the whole signature pipeline
        # at the scan (3.5× measured); the capped path above explodes
        # an inline array for the same reason. The `merge` hint forces
        # a sort-merge self-join
        # whose two identical shuffles collapse via exchange reuse —
        # the signature scan runs ONCE, not once per join side (2×
        # measured); SMJ also keeps AQE's skew-split available for
        # boilerplate bands.
        banded = signatures.select(
            "doc_id",
            F.array(*band_hashes()).alias("bands"),
            F.posexplode(F.array(*band_hashes())).alias("band_idx", "band_hash"),
        ).hint("merge")
    a = banded.alias("a")
    b = banded.alias("b")
    # min-band emission: a pair colliding in k bands would appear k
    # times; emit it ONLY from the first shared band (no earlier band
    # agrees) so the output is duplicate-free WITHOUT a distinct —
    # that distinct was a full extra shuffle of the pair set. The
    # band arrays ride along (bands × 32B per row) instead. Spelled as
    # explicit per-band booleans, not slice/zip_with/exists HOFs:
    # higher-order functions fall out of whole-stage codegen and
    # measured 5× slower than this unrolled form.
    first_shared = _first_shared_band(bands)
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(first_shared)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )


def lsh_hot_buckets(
    signatures: DataFrame,
    n_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Audit output of the LSH hub guard: the band buckets a given
    ``max_bucket_size`` would drop, with their sizes — what a pipeline
    reports ("N boilerplate buckets excluded, largest B docs") instead
    of silently truncating coverage.

    Output: ``band_idx, band_hash, n_docs`` (n_docs > cap), one
    band-key aggregate — no self-join, safe at any scale.
    """
    rows_per_band = n_hashes // bands
    hashes = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"mh{j}")
                    for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                ],
            )
        )
        for b in range(bands)
    ]
    return (
        signatures.select(
            F.posexplode(F.array(*hashes)).alias("band_idx", "band_hash")
        )
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket_size)
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard similarity for candidate pairs.

    Joins each side's distinct-shingle set sizes and their
    intersection size: |A∩B| / (|A| + |B| − |A∩B|). All counting is
    integer-exact; the returned ``jaccard_pct`` is an integer
    percentage (floor), keeping cross-engine results bit-identical.

    Scale shape: the exact verify only ever touches CANDIDATE docs —
    the pair list's doc ids prune the corpus before any shingle is
    computed, and the pruned shingle set is materialized ONCE
    (``localCheckpoint``) because it feeds three consumers on three
    different join keys (sizes, a-side, b-side) that no exchange reuse
    can unify. The unpruned/unmaterialized form re-scanned and
    re-shingled the whole corpus SEVEN times per query.
    """
    cand = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ex = (
        docs.join(cand, "doc_id")
        .select(
            "doc_id",
            F.explode(F.array_distinct(_shingle_expr(text_col, k))).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ex_a = ex.select(F.col("doc_id").alias("doc_a"), "sh")
    ex_b = ex.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh"))
    inter = (
        pairs.join(ex_a, "doc_a")
        .join(ex_b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # left join keeps zero-intersection pairs (jaccard 0), which an
    # inner join on shared shingles would silently drop
    inter = pairs.join(inter, ["doc_a", "doc_b"], "left").withColumn(
        "n_inter", F.coalesce(F.col("n_inter"), F.lit(0))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            "n_a",
            "n_b",
            F.floor(
                (F.col("n_inter") * 100)
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            )
            .cast("long")
            .alias("jaccard_pct"),
        )
    )


def simhash_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """SimHash duplicate groups: fingerprint, member count, canonical id.

    Same shape as :func:`exact_dedup` but keyed on the 63-bit SimHash —
    catches reordered/near-identical token sets that exact hashing
    misses. One partial-aggregated shuffle on the fingerprint.
    """
    from changedatacapture_spark.operators.text import simhash

    return (
        simhash(docs, text_col)
        .groupBy("simhash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = 500,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance ≤ ``max_hamming``.

    Candidate generation is LSH-style banding on the fingerprint's four
    16-bit slices (the top slice carries 15 bits of the 63-bit
    fingerprint): two docs within hamming distance 3 must agree on at
    least one band (pigeonhole, 4 bands > 3 differing bits), so the
    band equi-join is lossless for d ≤ 3 — and it replaces the O(n²)
    cross join with four shuffled self-joins. Band keys are 16-bit
    (65k values *per band position*), wide enough that buckets stay
    small at scale, unlike banding a 16-bit fingerprint whose 65k
    total key space degenerates at 100 TB.

    ``max_bucket_size`` is the hub guard (:func:`_capped_banded`): a
    boilerplate-heavy corpus piles near-identical fingerprints into one
    16-bit slice bucket, and that bucket's B²/2 pair emission is the
    scale-killer, not the band count. Capping trades the pigeonhole
    guarantee ONLY for pairs all of whose agreeing bands are hot —
    i.e. boilerplate clusters the dedup survivor step collapses
    wholesale anyway; ``None`` restores strict losslessness.

    Output: ``doc_a, doc_b, hamming`` (doc_a < doc_b).
    """
    from changedatacapture_spark.operators.text import simhash

    sigs = simhash(docs, text_col)

    def nibbles() -> list[Column]:
        return [
            F.shiftright("simhash", 16 * b).bitwiseAND(F.lit(65535))
            for b in range(4)
        ]

    if max_bucket_size is not None:
        exploded = sigs.select(
            "doc_id",
            "simhash",
            F.posexplode(F.array(*nibbles())).alias("band_idx", "nibble"),
        )
        bands = _capped_banded(exploded, "nibble", max_bucket_size)
        a = bands.alias("a")
        b = bands.alias("b")
        # pair-set dedup via distinct (see lsh_candidate_pairs):
        # hamming is a pure function of the pair, so including it in
        # the distinct keys keeps the partial-agg combine
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.nibble") == F.col("b.nibble"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )
    else:
        # inline CreateArray + merge hint: see lsh_candidate_pairs for
        # why (generator size-filter recompute; exchange reuse across
        # the self-join sides)
        bands = sigs.select(
            "doc_id",
            "simhash",
            F.array(*nibbles()).alias("bands"),
            F.posexplode(F.array(*nibbles())).alias("band_idx", "nibble"),
        ).hint("merge")
    a = bands.alias("a")
    b = bands.alias("b")
    # min-band emission (see lsh_candidate_pairs): emit each pair only
    # from its first agreeing band slice — no distinct shuffle
    first_shared = _first_shared_band(4)
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.nibble") == F.col("b.nibble"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(first_shared)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = 8,
    broadcast_benchmark: bool = False,
) -> DataFrame:
    """Benchmark contamination check: per document, how many of its
    distinct ``k``-gram shingles appear anywhere in ``benchmark``.

    The decontamination step every training-corpus pipeline runs
    before a model ships: documents overlapping an eval set must be
    dropped or the benchmark is meaningless. Output: ``doc_id,
    n_overlap`` for contaminated documents only (no row = clean).

    Scale: both sides reduce to DISTINCT shingle sets before the join —
    the shuffle carries k-byte shingle keys, never document text, and
    the benchmark side (eval suites are ≪ corpus) broadcasts when
    small. Equi-join on the shingle, linear in both inputs; the
    per-doc overlap count is a map-side-combinable aggregate.

    ``broadcast_benchmark=True`` forces the benchmark shingle set to
    the map side (the incremental change-feed probe's contract: the
    scored side must never shuffle); leave False when the eval suite
    might exceed broadcast size and let AQE decide.
    """
    # the per-character shingle explode is the heavy stage on the
    # scored side: fan a narrow corpus out first
    doc_sh = fan_out_scan(docs).select(
        "doc_id",
        F.explode(F.array_distinct(_shingle_expr(text_col, k))).alias("sh"),
    )
    bench_sh = (
        benchmark.select(
            F.explode(F.array_distinct(_shingle_expr(text_col, k))).alias("sh")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    return doc_sh.join(bench_sh, "sh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )


def contamination_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 8,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cross-source contamination matrix: for every pair of corpus
    sources, the number of distinct ``k``-gram shingles they share and
    the scaled-integer Jaccard of their shingle sets — the
    corpus-level leakage audit run before mixing sources into a
    training set (the per-document variant is :func:`contamination`).

    Output: ``source_a, source_b, n_shared_shingles, n_a, n_b,
    jaccard_scaled`` for ``source_a < source_b`` with at least one
    shared shingle; ``jaccard_scaled = shared * scale DIV
    (n_a + n_b - shared)`` — exact integer division, engine-portable.

    Scale: each side reduces to DISTINCT (source, shingle) before the
    self-join, so a shingle's join fanout is bounded by the NUMBER OF
    SOURCES (constant), not its corpus frequency — a stopword 8-gram
    contributes one row per source, never one per occurrence. The
    matrix itself is <= sources² rows. Shuffles carry k-byte shingle
    keys, never document text.
    """
    # the shingle explode dominates the scan: fan it out first
    src_sh = fan_out_scan(docs).select(
        F.col(source_col).alias("source"),
        F.explode(F.array_distinct(_shingle_expr(text_col, k))).alias("sh"),
    ).distinct()
    per_src = src_sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    a = src_sh.select(F.col("source").alias("source_a"), "sh")
    b = src_sh.select(F.col("source").alias("source_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )
    na = per_src.select(
        F.col("source").alias("source_a"), F.col("n_sh").alias("n_a")
    )
    nb = per_src.select(
        F.col("source").alias("source_b"), F.col("n_sh").alias("n_b")
    )
    return (
        shared.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_shingles",
            "n_a",
            "n_b",
            F.expr(
                f"(n_shared_shingles * CAST({scale} AS BIGINT)) DIV "
                "(n_a + n_b - n_shared_shingles)"
            ).alias("jaccard_scaled"),
        )
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its STRICTLY LARGER
    neighbors to the minimum of its closed neighborhood."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", F.col("mv")).alias("m"))
    # m <= u < v, so the emitted (v, m) edge is never a self-loop
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: every node connects its SMALLER-OR-EQUAL
    neighbors (and itself) to the minimum of that set."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    return (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 12,
) -> DataFrame:
    """Duplicate-group transitive closure: ``(doc_id, group_id)`` for
    every doc appearing in ``pairs``, where ``group_id`` is the MINIMUM
    doc id of the doc's connected component (the canonical survivor).

    Pairs alone don't dedup a corpus — A~B and B~C must collapse to one
    group of three. This is the alternating large-star / small-star
    algorithm (Kiveris et al., *Connected Components in MapReduce and
    Beyond*, SoCC'14): each round is two (groupBy-min + equi-join)
    passes over the edge set, and the edge set provably converges to a
    forest of stars rooted at component minima in O(log² n) rounds
    (observed: 2-3 rounds on dedup graphs, whose components are
    near-cliques).

    Scale: the driver loop is bounded by ``max_rounds`` and per round
    sees ONE (count, checksum) row for the fixpoint test — never edge
    data. Each round's lineage is truncated with ``localCheckpoint``
    (swap for reliable ``checkpoint`` against a checkpoint dir on a
    real cluster) so the plan doesn't grow with iterations. Edges
    shuffle by node id; boilerplate-heavy components skew-split via AQE.

    Block-retention caveat: each round's ``localCheckpoint`` blocks
    are reclaimed by Spark's async ContextCleaner only after their
    Python wrappers are garbage-collected, so many closure runs
    back-to-back in one JVM without an intervening ``gc.collect()``
    can see inflated walls from storage pressure (measured at sf1:
    13.5 s steady with a GC cycle between runs vs 95 s without —
    PERF_r11 §9). Retention is bounded (one round's edge set each)
    and self-heals; long-lived services should gc between closures.
    """
    # ONE materialization of the (possibly expensive) pair input: the
    # id projection is checkpointed before anything else reads it, and
    # both the edge set and the final node set derive from the
    # checkpoint — deriving nodes from `pairs` directly would recompute
    # the whole upstream pair generation (e.g. the LSH-bucket cosine
    # self-join) once per union branch at the end of the algorithm
    # (measured: 60 of 90 s at 10x data before this).
    base = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        base.filter(F.col("u") != F.col("v"))
        .localCheckpoint(eager=True)
    )
    prev = None
    converged = False
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # one-row fixpoint probe: (row count, order-insensitive hash)
        # bit_xor, not sum: order-insensitive over the distinct edge
        # set and immune to ANSI-mode long overflow
        state = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        cur = (state["n"], state["h"])
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # A non-fixpoint edge set can label two members of one component
        # with different minima — the groupBy-min below would then
        # SILENTLY split a duplicate group and a wrong survivor set
        # reaches deletion. Refuse instead: convergence is O(log² n)
        # rounds, so hitting the bound means max_rounds is mis-sized for
        # the graph, not a data problem.
        raise RuntimeError(
            f"connected_components did not reach a fixpoint within "
            f"max_rounds={max_rounds} rounds (last edge count: "
            f"{prev[0] if prev else 'unknown'}); raise max_rounds — "
            "convergence needs O(log² n) rounds"
        )
    # At the fixpoint every edge is (member, component-min); the min
    # node itself carries no out-edge, so re-attach it from the node
    # set. The groupBy-min collapses each member's single label.
    nodes = (
        base.select(F.col("u").alias("doc_id"))
        .unionByName(base.select(F.col("v").alias("doc_id")))
        .distinct()
    )
    mapping = edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("group_id")
    )
    return (
        nodes.join(mapping, "doc_id", "left")
        .groupBy("doc_id")
        .agg(F.min("group_id").alias("_g"))
        .select(
            "doc_id", F.coalesce("_g", F.col("doc_id")).alias("group_id")
        )
    )


def edit_distance_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_distance: int = 25,
    len_bucket: int = 32,
    prefix_chars: int = 200,
) -> DataFrame:
    """Near-duplicate pairs by bounded edit distance, with blocking.

    Levenshtein is quadratic per comparison, so the self-join is
    restricted to BLOCKS — documents sharing ``lang`` and the same
    ``n_chars DIV len_bucket`` length bucket — and the distance runs on
    a fixed ``prefix_chars`` prefix. The block key is an equi-join:
    shuffle is |docs|, comparisons are per-block-quadratic, never
    corpus-quadratic (at sf0.01 the block join evaluates 2,160 of the
    124,750 unordered pairs — 58x fewer; the ratio grows with corpus
    diversity). Standard blocking caveat applies and is the contract:
    a near-dup pair whose lengths straddle a bucket boundary is missed;
    pair this with the MinHash path (``lsh_candidate_pairs``) when
    recall matters more than the exact-distance guarantee.

    Block occupancy grows linearly with corpus size, so per-block
    candidate pairs grow QUADRATICALLY — at 100 TB either narrow the
    blocks (smaller ``len_bucket``, or extend the key with a content
    band such as a SimHash band) or add the LSH-style hub guard before
    the self-join. The distance itself uses Spark's bounded
    ``levenshtein(a, b, threshold)`` — banded DP, O(len·threshold) per
    pair instead of O(len²), returning the exact distance for every
    pair inside the threshold (and -1 beyond it, which the filter
    drops), so survivors are identical to the unbounded form.
    """
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang"),
        F.expr(f"n_chars DIV {len_bucket}").alias("len_b"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("text_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang"),
        F.expr(f"n_chars DIV {len_bucket}").alias("len_b"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("text_b"),
    )
    return (
        a.join(b, ["lang", "len_b"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(
                F.col("text_a"), F.col("text_b"), max_distance
            ).alias("edit_distance"),
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("edit_distance") <= max_distance)
        )
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    text_col: str = "text",
    key_chars: int = 40,
    neighborhood: int = 3,
    max_distance: int = 25,
    prefix_chars: int = 120,
) -> DataFrame:
    """Sorted-neighborhood method (SNM, Hernández/Stolfo): sort the
    corpus by a normalized sort key and compare each document only to
    its ``neighborhood`` successors in sort order — the classic
    entity-resolution blocking scheme for near-dups that share a
    PREFIX (titles, names, URLs), complementary to length-bucket
    blocking (``edit_distance_pairs``) and content blocking (LSH).

    The global rank is computed DISTRIBUTED-EXACT, not with a
    single-partition window: ranks within each leading-character
    bucket run in parallel, and each bucket's global offset is a
    running sum over the (tiny, ~alphabet-sized) bucket-count
    aggregate. The neighborhood join is then an EQUI-join on
    ``rank + offset`` (successors enumerated per row), so nothing in
    the plan is sequential — the one structural cost is the sort
    itself, which is what SNM buys its linear candidate count with.

    Output: ``doc_a, doc_b, rank_distance, edit_distance`` for pairs
    within ``max_distance`` (banded Levenshtein on a
    ``prefix_chars`` prefix).
    """
    from pyspark.sql.window import Window as W

    key = F.lower(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9 ]", ""))
    base = docs.select(
        "doc_id",
        F.substring(key, 1, key_chars).alias("k"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("p"),
    ).withColumn("b", F.substring(F.col("k"), 1, 1))
    # per-bucket parallel rank + broadcast running offsets = exact
    # global rank without a one-partition window
    local = base.withColumn(
        "lr", F.row_number().over(W.partitionBy("b").orderBy("k", "doc_id"))
    )
    offsets = (
        base.groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("n").over(
                    W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("b", "off")
    )
    ranked = local.join(F.broadcast(offsets), "b").select(
        "doc_id", "k", "p", (F.col("lr") + F.col("off")).alias("r")
    )
    succ = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("p").alias("p_b"),
        F.col("r").alias("r_b"),
    )
    probe = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("p").alias("p_a"),
        F.col("r").alias("r_a"),
        F.explode(
            F.sequence(F.col("r") + 1, F.col("r") + neighborhood)
        ).alias("r_b"),
    )
    return (
        probe.join(succ, "r_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("r_b") - F.col("r_a")).alias("rank_distance"),
            F.levenshtein(F.col("p_a"), F.col("p_b"), max_distance).alias(
                "edit_distance"
            ),
        )
        .filter(
            (F.col("edit_distance") >= 0)
            & (F.col("edit_distance") <= max_distance)
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: fingerprint, copy count, canonical id."""
    return (
        docs.groupBy(text_col)
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("canonical_id"))
        .select(
            F.md5(F.col(text_col)).alias("fp"), "n_copies", "canonical_id"
        )
    )


def jaccard_prefix_join(
    docs: DataFrame,
    t_pct: int = 95,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering (Bayardo et
    al. 2007 / Chaudhuri et al. 2006, the All-Pairs algorithm): find
    every document pair whose distinct-token Jaccard is >=
    ``t_pct``/100, WITHOUT LSH approximation and without the O(n²)
    cross product.

    Tokens order globally by (corpus frequency asc, token) — rarest
    first; each document keeps only its first ``|A| - ceil(t·|A|) + 1``
    tokens as its PREFIX, and candidate pairs must share a prefix
    token on BOTH sides. Completeness is a theorem: if the prefixes
    are disjoint, the intersection fits inside both suffixes, which
    are too small for Jaccard ≥ t (``⌈t·m⌉ - 1 < t(|A|+|B|)/(1+t)``
    for m the smaller set). Every candidate is then verified by the
    exact integer test ``|A∩B|·100 >= t_pct·|A∪B|`` — so the output
    EQUALS the brute-force definition, which is exactly what the
    oracle states (the oracle runs the O(n²) definition; this side
    never does).

    Scale: prefix emission keys the shuffle by the RAREST tokens —
    precisely the ones with short posting lists — so the candidate
    equi-join fans out on low-frequency keys while stopword-frequency
    tokens never leave their documents' suffixes. Verification carries
    each doc's distinct-token array through one broadcast-or-shuffle
    join, bounded by document length.

    Output: ``doc_a, doc_b, n_inter, n_union, jaccard_scaled``
    (scaled by 10^6, exact integer DIV).
    """
    from pyspark.sql import Window as W

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    per = toks.join(F.broadcast(freq), "tok")
    wd = W.partitionBy("doc_id").orderBy("n", "tok")
    ranked = (
        per.withColumn("r", F.row_number().over(wd))
        .withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("doc_id")))
    )
    # prefix length |A| - ceil(t|A|/100) + 1, all integer
    plen = F.col("sz") - F.expr(f"({t_pct} * sz + 99) DIV 100") + 1
    pref = ranked.filter(F.col("r") <= plen).select("doc_id", "tok")
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # filter len(tk) > 0 EXPLICITLY (mirrored in the oracle): a
    # zero-token document can never reach the prefix join, but without
    # the shared filter the brute-force oracle would admit
    # empty-vs-empty pairs (0 >= t·0) and then divide by n_union = 0 —
    # a latent parity break on corpora with empty texts.
    sets = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.array_sort(
                F.array_distinct(F.split(F.col(text_col), " "))
            ).alias("tk"),
        )
        .withColumn("tk", F.array_remove("tk", ""))
        .filter(F.size("tk") > 0)
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("tk").alias("ta"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("tk").alias("tb"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ta", "tb")).alias("n_inter"),
            F.size(F.array_union("ta", "tb")).alias("n_union"),
        )
        .filter(F.col("n_inter") * 100 >= F.lit(t_pct) * F.col("n_union"))
    )
    return verified.select(
        "doc_a",
        "doc_b",
        "n_inter",
        "n_union",
        F.expr("(n_inter * CAST(1000000 AS BIGINT)) DIV n_union").alias(
            "jaccard_scaled"
        ),
    )


def substring_dup_spans(
    docs: DataFrame,
    k: int = 25,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """EXACT cross-document substring-duplication spans — the
    suffix-array dedup of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better") in its relational form.

    A character position is part of a duplicated region iff some
    length-``k`` substring covering it also occurs in ANOTHER
    document; equivalently the duplicated region set is the interval
    union of ``[i, i+k)`` over every position ``i`` whose k-gram is
    cross-document shared. That identity turns the suffix-array scan
    into three data-parallel relational steps, with NO candidate pair
    enumeration anywhere (document pairs never appear — cost is
    linear in corpus characters, not in pair count):

    1. emit one row per k-gram position (explode over a per-doc
       position ``sequence`` — docs shorter than ``k`` contribute
       nothing, mirrored in the oracle);
    2. per distinct gram, count distinct source documents (map-side-
       combinable agg keyed on the gram) and keep positions whose
       gram's count is ≥ 2 — a shuffle keyed by gram, the analogue of
       the suffix sort, except partitionable and spillable;
    3. per doc, merge surviving ``[i, i+k)`` intervals into maximal
       spans (the islands pattern: sorted window per doc, a new span
       starts where ``i`` exceeds the previous position + k).

    ``hash_grams=True`` swaps the gram string for ``xxhash64(gram)``
    as the shuffle key — an 8-byte key instead of ``k`` bytes, the
    100 TB deployment setting (collision odds ~ positions²/2⁶⁴; a
    collision can only ADD a span, never lose one). The registered
    query keeps exact grams so the DuckDB oracle is definitionally
    identical.

    Output: ``doc_id, span_start, span_end, span_len`` — 1-based
    start, exclusive end, one row per maximal duplicated span.

    Reference parity: the reference has no substring dedup (its dedup
    surface is row-identity only); this is part of the
    training-data-pipeline extension surface.
    """
    from pyspark.sql import Window as W

    # the per-position k-gram explode is linear in corpus characters
    # and rides the scan: fan a narrow source out first
    base = fan_out_scan(docs).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).filter(F.length("text") >= k)
    pos = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (k - 1))
        ).alias("i"),
        "text",
    ).select("doc_id", "i", F.expr(f"substring(text, i, {k})").alias("gram"))
    key = F.xxhash64("gram").alias("gk") if hash_grams else F.col("gram").alias("gk")
    pos = pos.select("doc_id", "i", key)
    shared = (
        pos.groupBy("gk")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gk")
    )
    hits = pos.join(shared, "gk").select("doc_id", "i")
    w = W.partitionBy("doc_id").orderBy("i")
    spans = (
        hits.withColumn("prev", F.lag("i").over(w))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev").isNull() | (F.col("i") > F.col("prev") + k),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "span_id",
            F.sum("new_span").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("doc_id", "span_id")
        .agg(
            F.min("i").alias("span_start"),
            (F.max("i") + k).alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )
    return spans


def _banded_flat(
    sigs: DataFrame, n_hashes: int, bands: int
) -> DataFrame:
    """(doc_id, band_idx, band_hash) band relation of a signature
    table — the probe/index rows LSH joins run on."""
    rows_per_band = n_hashes // bands
    band_hashes = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.col(f"mh{j}")
                    for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                ],
            )
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id",
        F.posexplode(F.array(*band_hashes)).alias("band_idx", "band_hash"),
    )


def lsh_incremental_candidates(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    text_col: str = "text",
    n_hashes: int = 4,
    bands: int = 2,
    k: int = 5,
    max_bucket_size: int = 500,
    corpus_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup probe — the daily-crawl production shape:
    only the NEW documents (e.g. the insert set of a snapshot change
    feed, ``SnapshotTable.changes_between``) SHUFFLE and self-join;
    the corpus is never self-joined and never shuffles for the probe.

    Candidate and shuffle volume are bounded by the DELTA: the delta's
    band relation BROADCASTS to the corpus side (plan: one
    BroadcastHashJoin), so each corpus row is looked up against the
    small hash set once, map-side. New-vs-new candidates come from a
    delta-sized self-join. Hub guards apply per side against its own
    population — the corpus bucket census is a map-side-combinable
    aggregate whose distinct (band, hash) output broadcasts back as an
    anti-join.

    Honest cost note: with the default ``corpus_sigs=None`` the corpus
    still pays ONE signature scan per probe (shingle + md5 minhash, a
    map-only projection — no shuffle, but corpus-, not delta-, sized
    CPU). A production deployment maintains the SIGNATURE relation —
    ``(doc_id, mh0..mh{n_hashes-1})``, exactly
    :func:`minhash_signatures`' output — as a stored table next to the
    corpus (append the delta's signatures each day, like
    ``build_label_ann_index(mode="append")``) and passes it via
    ``corpus_sigs``; banding and the census derive from it map-side
    here. Then the probe's corpus-side cost is the stored relation's
    scan alone — far cheaper than re-shingling, since signatures are
    a few fixed-width columns instead of the text.

    Output: one row per new document — ``doc_id, n_candidates,
    first_partner`` (min candidate partner id; NULL when the document
    collides with nothing — the keep set).
    """
    sigs_new = minhash_signatures(new_docs, text_col, n_hashes, k)
    sigs_corp = (
        corpus_sigs
        if corpus_sigs is not None
        else minhash_signatures(corpus_docs, text_col, n_hashes, k)
    )
    nb0 = _banded_flat(sigs_new, n_hashes, bands)
    cb0 = _banded_flat(sigs_corp, n_hashes, bands)
    keys = ["band_idx", "band_hash"]

    def hot(banded: DataFrame) -> DataFrame:
        return (
            banded.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .select(*keys)
        )

    cb = cb0.join(F.broadcast(hot(cb0)), keys, "left_anti")
    nb = nb0.join(F.broadcast(hot(nb0)), keys, "left_anti")
    # doc_id != partner guard, mirroring the new-vs-new join below: a
    # delta doc whose id already exists in the corpus — exactly the
    # re-crawl / update change-feed shape this targets — must not
    # count itself as its own duplicate partner
    cross = (
        cb.join(F.broadcast(nb), keys)
        .filter(nb["doc_id"] != cb["doc_id"])
        .select(nb["doc_id"].alias("doc_id"), cb["doc_id"].alias("partner"))
    )
    a, b = nb.alias("a"), nb.alias("b")
    nn = a.join(
        F.broadcast(b),
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col("a.doc_id") != F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("b.doc_id").alias("partner"),
    )
    cands = cross.unionByName(nn).distinct()
    return (
        new_docs.select("doc_id")
        .join(cands, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            F.count("partner").alias("n_candidates"),
            F.min("partner").alias("first_partner"),
        )
    )
