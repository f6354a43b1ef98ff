"""Physical-plan inspection helpers.

The engine's performance contract is expressed as assertions on the
executed plan — filters reach the parquet scan, small dims broadcast,
the core compaction is a partial-aggregation, shuffles are bounded.
Tests use these instead of eyeballing ``explain()`` output, so a
regression in plan shape fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """String form of the (possibly adaptive) executed physical plan.

    AQE prints both the final and the initial plan; only the final one
    executed, so the initial section is dropped — otherwise every
    exchange/operator would be counted twice.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = executed_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))
