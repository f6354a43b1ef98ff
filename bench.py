"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

``value`` is total wall-clock seconds across the headline queries
(lower is better). Each query is timed as a full
plan-build → execute → collect cycle after a shared warm-up of the
session (JVM + parquet footer reads are amortized, matching how a
long-running engine behaves).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: CDC core + analytics + pipeline extensions.
HEADLINE = [
    "cdc_compact",
    "cdc_apply",
    "cdc_window_compact",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "q_topk_orders_per_segment",
    "dedup_exact",
    "text_stats",
    "knn_brute_topk",
]


def main() -> None:
    from __spark_entry__ import queries
    from changedatacapture_spark.session import get_spark

    spark = get_spark(app_name="cdc-bench")
    qs = queries()
    names = [n for n in HEADLINE if n in qs]
    # warm-up: touch every table once so first-query costs are session
    # constants, not attributed to one query
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).count()
        except Exception:  # noqa: BLE001
            pass

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count() if name != "knn_brute_topk" else len(df.collect())
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)

    # scale-path operators outside the (frozen, round-comparable)
    # headline set — timed under a separate key
    extra_timings: dict[str, float] = {}
    for name in ("knn_lsh_topk", "knn_ivf_topk", "dedup_minhash_pairs",
                 "dedup_simhash_pairs", "seq_packing_bins", "events_range_join"):
        if name not in qs:
            continue
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        extra_timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {extra_timings[name]}s rows={n}", file=sys.stderr)

    # streaming CDC apply throughput (BASELINE.md 'Measured' workload),
    # reported alongside the per-query walls
    from changedatacapture_spark.streaming.bench import run as stream_run

    stream = stream_run(spark, n_events=50_000, batch_size=10_000)
    print(f"# cdc_stream_apply: {stream['events_per_sec']} events/s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_extra": extra_timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "stream_apply": {
            "events_per_sec": stream["events_per_sec"],
            "sec_per_batch": stream["sec_per_batch"],
            "n_events": stream["n_events"],
            "batch_size": stream["batch_size"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
