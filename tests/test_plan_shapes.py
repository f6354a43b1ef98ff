"""Plan-shape assertions: the 100 TB performance contract.

These tests pin the physical properties that matter at scale:
pushdown reaching the scan, broadcasts for small dims, partial
aggregation for the core compact, bounded shuffle counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from changedatacapture_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    has_broadcast_join,
    pushed_filters,
)
from changedatacapture_spark.queries import SPARK_QUERIES


def _run(spark, sf_dir, name):
    df = SPARK_QUERIES[name](spark, sf_dir)
    df.collect()  # materialize so AQE finalizes the executed plan
    return df


def test_q1_filter_pushdown_and_partial_agg(spark, sf_dir):
    df = _run(spark, sf_dir, "q1_pricing_summary")
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf, f"shipdate filter not pushed: {pf}"
    plan = executed_plan(df)
    assert "partial" in plan.lower(), "no map-side partial aggregation"


def test_q1_column_pruning(spark, sf_dir):
    from changedatacapture_spark.sources.tables import load_table

    df = SPARK_QUERIES["q1_pricing_summary"](spark, sf_dir)
    df.collect()
    plan = executed_plan(df)
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m, "no ReadSchema in scan"
    # 16-column lineitem must be pruned to the 7 columns q1 touches
    assert "l_orderkey" not in m[0] and "l_partkey" not in m[0]


def test_q3_broadcasts_customer_dim(spark, sf_dir):
    df = _run(spark, sf_dir, "q3_top_revenue_orders")
    assert has_broadcast_join(df)
    pf = " ".join(pushed_filters(df))
    assert "c_mktsegment" in pf, f"segment filter not pushed: {pf}"


def test_compact_shuffles_once(spark, sf_dir):
    df = _run(spark, sf_dir, "cdc_compact")
    assert count_exchanges(df) == 1, executed_plan(df)
    assert "Window" not in executed_plan(df)


def test_knn_brute_broadcasts_probes(spark, sf_dir):
    df = _run(spark, sf_dir, "knn_brute_topk")
    assert has_broadcast_join(df), "probe side must broadcast, not shuffle"


def test_exact_dedup_is_partial_agg(spark, sf_dir):
    df = _run(spark, sf_dir, "dedup_exact")
    plan = executed_plan(df)
    assert "partial" in plan.lower()
    assert count_exchanges(df) == 1, plan
