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

from pyspark.sql import Column
from pyspark.sql import functions as F


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

    Scale: the per-layout rank is a window over the full relation — a
    real layout rewrite IS a global sort, and at cluster scale the
    file assignment comes from ``repartitionByRange`` + in-partition
    ranks (the two-phase prefix-sum used by
    ``curation.pack_sequences``); production writes cluster per bucket
    via ``SnapshotTable(cluster_cols=[zorder16_sql(...)])`` with no
    global window at all. The audit keeps the deterministic window so
    the DuckDB oracle reproduces file boundaries bit-for-bit.

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
    )
    w = W.partitionBy("layout").orderBy("k1", "eid")
    ranked = lay.select(
        "layout",
        "bx",
        "by_",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("layout")).alias("n"),
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
