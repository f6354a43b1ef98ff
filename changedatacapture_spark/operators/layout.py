"""Physical-layout expressions: z-order interleaving for data skipping.

Sorting a file by one column gives parquet row-group min/max stats
selectivity on that column only. Interleaving the bits of two columns
(Morton / z-order curve) gives BOTH columns partial locality: a sort by
the z-value keeps rows close in (a, b) space close in the file, so
row-group stats stay tight on each dimension — the technique behind
Delta's ``OPTIMIZE ZORDER BY`` and the classic UB-tree layout.

These are pure column expressions (shift/mask/or — whole-stage
codegen'd, no UDF): pass ``zorder16_sql(...)`` to
``SnapshotTable(cluster_cols=[...])`` and every bucket write sorts by
the curve with zero extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out_scan(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Spread a narrow batch scan across the cluster before CPU-heavy
    per-row work (the batch twin of ``streaming.pipeline.fan_out``).

    A parquet file with a single row group is unsplittable: the scan
    runs as ONE task, and every narrow transform chained on it (md5
    shingling, per-row array math, ``explode`` fan-outs) executes on
    one core no matter how many the cluster has. Operators whose
    per-row compute dominates their scan call this before that work:
    a keyless ``repartition`` moves only the projected input bytes
    once and buys full-width parallelism for everything after.

    Scale-adaptive by the same metadata probe the streaming fan-out
    uses: a source that already exposes enough files (a 100 TB table)
    keeps its own split parallelism and this is a no-op — the
    repartition only fires when the file count alone cannot fill the
    cluster (``inputFiles()`` reads the plan's FileIndex on the
    driver; no job runs). Non-file plans (in-memory test frames,
    post-shuffle intermediates) fan out unconditionally: a shuffle of
    a frame that small is noise next to the compute it parallelizes.
    """
    spark = df.sparkSession
    target = parts or spark.sparkContext.defaultParallelism
    floor = max(2, target // 4)
    try:
        n_in = len(df.inputFiles())
    except Exception:  # noqa: BLE001 - plans that refuse file listing
        n_in = 0
    if n_in >= floor:
        return df
    # few/no files doesn't prove the plan is narrow (a post-shuffle
    # intermediate is already wide): confirm with the real partition
    # count — one driver-side plan conversion, no job — and leave
    # already-parallel inputs untouched
    try:
        n_parts = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - plans that refuse RDD conversion
        # a failed probe proves nothing about the plan's width: adding
        # an unconditional exchange to an already-wide plan costs a
        # full shuffle, so leave the frame untouched (ADVICE r18)
        return df
    if n_parts >= floor:
        return df
    return df.repartition(target)


def zorder16(a: Column, b: Column) -> Column:
    """Interleave the low 16 bits of two non-negative integral columns
    into a 32-bit Morton code (``a`` on even bits, ``b`` on odd).

    Callers scale raw values into [0, 65535] first (e.g. rank-bucket or
    min-max scale): the curve orders the *scaled* space. Built as an
    unrolled shift/mask OR-chain — 32 bitwise ops, constant-folded into
    one codegen'd projection.
    """
    z = F.lit(0).cast("long")
    for i in range(16):
        z = (
            z.bitwiseOR(
                F.shiftleft(a.cast("long").bitwiseAND(F.lit(1 << i)), i)
            ).bitwiseOR(
                F.shiftleft(b.cast("long").bitwiseAND(F.lit(1 << i)), i + 1)
            )
        )
    return z


def zorder16_sql(a: str, b: str) -> str:
    """SQL-string twin of :func:`zorder16` for
    ``SnapshotTable(cluster_cols=[...])`` (which stores expressions as
    strings in the commit pointer)."""
    parts = [
        f"shiftleft(CAST({a} AS BIGINT) & {1 << i}, {i}) | "
        f"shiftleft(CAST({b} AS BIGINT) & {1 << i}, {i + 1})"
        for i in range(16)
    ]
    return "(" + " | ".join(parts) + ")"


def minmax_scale16(col: Column, lo: int, hi: int) -> Column:
    """Scale an integral column from [lo, hi] into [0, 65535] for
    :func:`zorder16` (caller supplies the bounds — at scale they come
    from table stats, not a per-write aggregate)."""
    span = max(hi - lo, 1)
    return (
        (col.cast("long") - F.lit(lo)) * F.lit(65535) / F.lit(span)
    ).cast("long")


def layout_scan_compare(
    df,
    x: Column,
    y: Column,
    order_col: str,
    n_files: int = 64,
    box: tuple[int, int, int, int] = (32, 47, 32, 47),
    natural_chunk: int = 4096,
):
    """Data-skipping audit: simulate writing the table under three
    physical layouts — ``natural`` (insertion order), ``single``
    (sorted by x only), ``zorder`` (sorted by the Morton interleave of
    x and y) — split each into ``n_files`` equal row ranges, keep
    per-file min/max zone stats on BOTH dimensions, and count how many
    files a 2-D box predicate must scan under each layout. This is the
    measurement behind ``OPTIMIZE ZORDER BY``: a single-column sort
    gives perfect stats on x and useless stats on y; the z-curve keeps
    both dimensions partially local so 2-D predicates prune.

    ``x`` and ``y`` must already be scaled into [0, 255] (8-bit cells;
    the interleave itself handles 16). Everything is exact integer
    arithmetic — ranks are deterministic via the (key, order_col)
    total order, file id is ``(rn-1) DIV ceil(n/n_files)``.

    Scale: the exact global rank is a TWO-PHASE prefix sum, never a
    single-partition window over the whole relation. The zorder and
    single layouts bucket on their sort key, bounded by construction
    (z-value < 2^16, single column < 2^8); the natural layout — whose
    key is constant — chunks on ``order_col DIV natural_chunk``, so
    its bucket relation is n/natural_chunk rows: METADATA-scale, not
    bounded — size ``natural_chunk`` so that stays small (the same
    knob and rationale as ``curation.pack_by_weight``'s chunk_size;
    the default 4096 suits the test fixtures, a 1e12-row table wants
    ~1e7). Per-(layout, bucket) row counts — a map-side-combinable
    aggregate — feed a prefix-sum window over the bucket relation,
    offsets join back (AQE broadcasts them), and the per-row rank is
    a window partitioned by (layout, bucket): parallel across
    buckets, exactly equal to the global ``row_number`` because
    bucket order extends the (key, order_col) total order. Production writes cluster per
    bucket via ``SnapshotTable(cluster_cols=[zorder16_sql(...)])``
    with no rank at all; the audit needs the rank only to make file
    boundaries deterministic for the DuckDB oracle.

    Output: one row per layout — ``layout, n_files, files_scanned,
    rows_scanned, true_rows``.
    """
    from pyspark.sql import Window as W

    x1, x2, y1, y2 = box
    base = df.select(
        F.col(order_col).alias("eid"), x.alias("bx"), y.alias("by_")
    )
    z = base.withColumn("zv", zorder16(F.col("bx"), F.col("by_")))
    lay = z.select(
        "*",
        F.explode(
            F.array(F.lit("natural"), F.lit("single"), F.lit("zorder"))
        ).alias("layout"),
    ).withColumn(
        "k1",
        F.expr(
            "CASE layout WHEN 'natural' THEN CAST(0 AS BIGINT) "
            "WHEN 'single' THEN CAST(bx AS BIGINT) ELSE zv END"
        ),
    ).withColumn(
        # coarse bucket, monotone in (k1, eid): the bounded sort key
        # itself where one exists, an order-chunk where k1 is constant
        "bkt",
        F.expr(
            f"CASE WHEN layout = 'natural' THEN eid DIV {natural_chunk} "
            "ELSE k1 END"
        ),
    )
    bucket_counts = lay.groupBy("layout", "bkt").agg(
        F.count(F.lit(1)).alias("bn")
    )
    w_bkt = (
        W.partitionBy("layout")
        .orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    offsets = bucket_counts.select(
        "layout",
        "bkt",
        (F.sum("bn").over(w_bkt) - F.col("bn")).alias("off"),
        F.sum("bn").over(W.partitionBy("layout")).alias("n"),
    )
    w_local = W.partitionBy("layout", "bkt").orderBy("k1", "eid")
    ranked = (
        lay.join(offsets, ["layout", "bkt"])
        .select(
            "layout",
            "bx",
            "by_",
            (F.col("off") + F.row_number().over(w_local)).alias("rn"),
            "n",
        )
    )
    files = ranked.select(
        "layout",
        "bx",
        "by_",
        F.expr(f"(rn - 1) DIV ((n + {n_files - 1}) DIV {n_files})").alias("f"),
    )
    stats = files.groupBy("layout", "f").agg(
        F.min("bx").alias("min_bx"),
        F.max("bx").alias("max_bx"),
        F.min("by_").alias("min_by"),
        F.max("by_").alias("max_by"),
        F.count(F.lit(1)).alias("cnt"),
    )
    hit = (
        f"min_bx <= {x2} AND max_bx >= {x1} "
        f"AND min_by <= {y2} AND max_by >= {y1}"
    )
    agg = stats.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum(F.expr(f"CASE WHEN {hit} THEN 1 ELSE 0 END")).alias(
            "files_scanned"
        ),
        F.sum(F.expr(f"CASE WHEN {hit} THEN cnt ELSE 0 END")).alias(
            "rows_scanned"
        ),
    )
    tr = base.agg(
        F.sum(
            F.expr(
                f"CASE WHEN bx BETWEEN {x1} AND {x2} "
                f"AND by_ BETWEEN {y1} AND {y2} THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("true_rows")
    )
    return agg.crossJoin(F.broadcast(tr))
