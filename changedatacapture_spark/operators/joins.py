"""Join operators Spark lacks natively: bucketed range join.

A point-in-interval join (`p.t BETWEEN i.start AND i.end`) compiles to
a broadcast-nested-loop or cartesian product in vanilla Spark — a
scale-killer when neither side broadcasts. The bucketed rewrite turns
it into an equi-join: intervals explode into the coarse time buckets
they cover, points map to their bucket, the join runs on
(key, bucket), and the exact BETWEEN predicate filters the candidates.
Shuffle volume is |points| + |intervals| · avg-buckets-per-interval,
never the cross product. ``bucket_width`` should be ≥ the typical
interval length so intervals explode into O(1) buckets.

(As-of joins live in queries.py as a last_value window composition;
this module covers the overlap/containment family.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_width: int = 3_600_000_000,
) -> DataFrame:
    """Inner join ``points`` to every interval containing them.

    ``points`` and ``intervals`` must have disjoint column names apart
    from ``keys`` (equi-join keys applied alongside the range
    predicate). Returns all columns of both inputs.
    """
    keys = keys or []
    pb = points.withColumn("_rb", (F.col(point_col) / bucket_width).cast("long"))
    ib = intervals.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("long"),
                (F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    joined = pb.join(ib, [*keys, "_rb"]).filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_rb")
