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


def skew_split_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    hot_keys: int = 100,
) -> DataFrame:
    """Explicit skew-mitigated equi-join: the ``hot_keys`` heaviest
    join keys of the big side take a BROADCAST path (their dimension
    rows broadcast, so a hot key's rows never converge on one reducer)
    while the remaining keys take the ordinary shuffle path; the union
    is exactly the plain inner join — the oracle states that equality.

    This is the manual form of AQE's skew-join split, useful when the
    skew is known ahead of time (a stable hot-entity list) or when AQE
    is off (streaming micro-batches disable it). The hot-key list is a
    bounded artifact by construction — top-``hot_keys`` by count via
    TakeOrderedAndProject, ties broken by key — so the broadcast side
    is at most ``hot_keys`` dimension rows regardless of corpus size,
    and detection costs one map-side-combinable count aggregate.

    Returns ``big ⋈ small`` with the small side's columns appended
    (inner join on ``big_key = small_key``).
    """
    hot = (
        big.groupBy(big_key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), big_key)
        .limit(hot_keys)
        .select(F.col(big_key).alias("_hot_key"))
    )
    is_hot = F.col(big_key) == F.col("_hot_key")
    big_tagged = big.join(
        F.broadcast(hot), on=is_hot, how="left"
    )
    big_hot = big_tagged.filter(F.col("_hot_key").isNotNull()).drop("_hot_key")
    big_cold = big_tagged.filter(F.col("_hot_key").isNull()).drop("_hot_key")
    # the broadcast side is small's HOT ROWS only — at most hot_keys
    # dimension rows, bounded no matter how large the dimension is
    small_hot = small.join(
        F.broadcast(hot), small[small_key] == F.col("_hot_key"), "semi"
    )
    hot_join = big_hot.join(
        F.broadcast(small_hot), big_hot[big_key] == small_hot[small_key]
    )
    cold_join = big_cold.join(small, big_cold[big_key] == small[small_key])
    return hot_join.unionByName(cold_join)
