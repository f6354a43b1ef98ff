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
