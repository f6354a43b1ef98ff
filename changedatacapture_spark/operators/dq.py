"""Declarative data-quality expectations (Deequ-style), compiled to
single-pass aggregates.

A rule suite over a table — not-null, value range, accepted values,
composite-key uniqueness — compiles into ONE map-side-combinable
aggregate over one scan: each row rule becomes a summed violation
indicator, uniqueness becomes an exact count-distinct, and the
one-row aggregate explodes into the long-format report
``(check_id, check, target, n_rows, n_violations, passed)``.
Referential-integrity checks join a deduplicated parent key set and
count orphans in the same pass as the child row count.

Scale design (100 TB): row rules cost exactly one scan regardless of
how many rules the suite carries (violation sums are associative —
partial aggregation stays on); uniqueness adds the one distinct
shuffle it provably needs; RI is an equi-join on the key, skew-safe
under AQE. Nothing collects to the driver; the report is O(rules).

Reference parity: the reference's only validation surface is the
consistency count in spark_client/src/cdc_stream.py (cdc_validate
covers it); this module is part of the training-data curation
extension surface — a pipeline that feeds a trainer needs executable
expectations, not ad-hoc asserts.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_COLS = ("check_id", "check_type", "target", "n_rows", "n_violations", "passed")


def _row_rule_violation(rule: Mapping[str, Any]) -> Column:
    """Boolean column: this row violates the rule.

    ``range``/``accepted`` violations count NON-NULL offenders only —
    nulls are the ``not_null`` rule's job, so the two never double-
    count a row between them."""
    kind = rule["type"]
    c = F.col(rule["col"])
    if kind == "not_null":
        return c.isNull()
    if kind == "range":
        v = F.lit(False)
        if "min" in rule:
            v = v | (c < F.lit(rule["min"]))
        if "max" in rule:
            v = v | (c > F.lit(rule["max"]))
        return c.isNotNull() & v
    if kind == "accepted":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    raise ValueError(f"unknown row rule type: {kind}")


def check_rules(
    df: DataFrame, target: str, rules: Sequence[Mapping[str, Any]]
) -> DataFrame:
    """Evaluate a rule list against one table in one scan.

    Row rules (not_null / range / accepted) and ``unique`` rules all
    land in the same ``agg``; the single result row then explodes to
    one report row per rule, so adding a rule never adds a scan.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, rule in enumerate(rules):
        if rule["type"] == "unique":
            cols = [F.col(c) for c in rule["cols"]]
            # exact: rows beyond the first per key = n - n_distinct
            aggs.append(
                (F.count(F.lit(1)) - F.count_distinct(*cols)).alias(f"v{i}")
            )
        else:
            aggs.append(
                F.sum(_row_rule_violation(rule).cast("long")).alias(f"v{i}")
            )
    agg = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(rule["id"]).alias("check_id"),
            F.lit(rule["type"]).alias("check_type"),
            F.lit(f"{target}.{rule.get('col') or ','.join(rule.get('cols', []))}")
            .alias("target"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"v{i}").alias("n_violations"),
            F.when(F.col(f"v{i}") == 0, F.lit(1)).otherwise(F.lit(0))
            .cast("int")
            .alias("passed"),
        )
        for i, rule in enumerate(rules)
    ]
    return agg.select(F.explode(F.array(*structs)).alias("r")).select(
        *[F.col(f"r.{c}").alias(c) for c in REPORT_COLS]
    )


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    check_id: str,
    target: str,
) -> DataFrame:
    """Orphan count: child keys with no parent row.

    Left join against the DEDUPLICATED parent key set (dedup first so
    the join can't multiply child rows), then one aggregate counts
    rows and null-parent orphans together — child scanned once.
    """
    pk = parent.select(F.col(parent_col).alias("__pk")).distinct()
    j = child.select(F.col(child_col).alias("__ck")).join(
        pk, F.col("__ck") == F.col("__pk"), "left"
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("__pk").isNull().cast("long")).alias("v"),
    )
    return agg.select(
        F.lit(check_id).alias("check_id"),
        F.lit("ref_integrity").alias("check_type"),
        F.lit(target).alias("target"),
        "n_rows",
        F.col("v").alias("n_violations"),
        F.when(F.col("v") == 0, F.lit(1)).otherwise(F.lit(0)).cast("int")
        .alias("passed"),
    )


def dq_report(parts: Sequence[DataFrame]) -> DataFrame:
    """Union the per-table/per-RI reports into one suite result."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_columns(df: DataFrame, cols: Sequence[str], target: str) -> DataFrame:
    """ANALYZE-style per-column profile in ONE aggregate pass:
    ``(col_name, n_rows, n_null, n_distinct)`` for every listed
    column — the statistics a cost-based optimizer (or a data-quality
    baseline) collects per table.

    Exact ``count_distinct`` per column makes Spark plan an Expand
    (one duplicated stream per distinct aggregate) — correct and
    oracle-exact here; at 100 TB swap in ``approx_count_distinct``
    for one-pass HLL statistics (same report shape, documented
    estimate). Null counts and row count ride the same aggregate
    for free.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd{i}"))
    agg = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(f"{target}.{c}").alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"nn{i}").alias("n_null"),
            F.col(f"nd{i}").alias("n_distinct"),
        )
        for i, c in enumerate(cols)
    ]
    return agg.select(F.explode(F.array(*structs)).alias("r")).select(
        "r.col_name", "r.n_rows", "r.n_null", "r.n_distinct"
    )
