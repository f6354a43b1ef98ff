"""Round-17 perf evidence: large-IN planning cost and deep-fsck pooling.

Two measurements, one JSON line each:

1. ``large_in``: a table with zone+bloom stats probed by an N-value
   membership list through (a) the literal ``read_where`` IN path —
   whose driver-side pruning tests every zone against every value and
   whose plan carries an N-literal predicate — and (b) the round-17
   ``read_in_values`` broadcast-semi-join route (one sorted-bisect per
   zone bound, values shipped as one Arrow batch). Identical results
   asserted; the walls separate DRIVER planning cost (lazy plan
   construction, where the literal path's linear-in-N work lives) from
   the full action.

2. ``deep_fsck``: the pooled footer audit vs a single-thread pool on
   the same multi-hundred-file manifest. Local disk is page-cache-hot,
   so the local ratio UNDERSTATES the object-store win (where each
   footer is a 10-30 ms round-trip and the 16-wide pool is the
   difference between minutes and an hour at 10^5 files) — reported
   as-is, not extrapolated.

Usage: python tools/perf_round17.py [n_values ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from changedatacapture_spark.session import get_spark
    from changedatacapture_spark.streaming.sink import SnapshotTable

    counts = [int(a) for a in sys.argv[1:]] or [100_000, 300_000]
    spark = get_spark(app_name="perf-round17")
    work = tempfile.mkdtemp(prefix="perf_r17_")

    # ~200k-row table, clustered + bloom'd so both routes have real
    # stats to prune with; v is sparse (every 3rd int) so probe lists
    # mix hits and misses like a real blocklist
    t = SnapshotTable(
        spark, os.path.join(work, "t"), ["k"], n_buckets=16,
        cluster_cols=["v"], max_records_per_file=4096, bloom_cols=["v"],
    )
    t.overwrite(
        spark.range(200_000).selectExpr("id AS k", "id * 3 AS v"),
        batch_id=0,
    )
    out: dict = {"large_in": []}
    for n in counts:
        vals = list(range(0, n * 3, 3))  # n values, all present
        # warm both paths once at a small size to keep JIT out of the A/B
        t.read_where([("v", "in", vals[:100])]).count()
        t.read_in_values("v", vals[:100]).count()

        # the literal arm must measure the PRE-round-17 plan:
        # read_where itself now routes oversized INs to the semi-join,
        # so disable the threshold for this arm only
        from changedatacapture_spark.streaming import sink as _sink

        saved = _sink.SEMI_JOIN_IN_THRESHOLD
        _sink.SEMI_JOIN_IN_THRESHOLD = 10**12
        try:
            t0 = time.time()
            lit_df = t.read_where([("v", "in", vals)])
            lit_plan = time.time() - t0
            lit_n = lit_df.count()
            lit_total = time.time() - t0
        finally:
            _sink.SEMI_JOIN_IN_THRESHOLD = saved

        t1 = time.time()
        semi_df = t.read_in_values("v", vals)
        semi_plan = time.time() - t1
        semi_n = semi_df.count()
        semi_total = time.time() - t1

        # values past the table's 200k-row domain are absent by design
        assert lit_n == semi_n == min(n, 200_000), (lit_n, semi_n, n)
        out["large_in"].append(
            {
                "n_values": n,
                "literal_plan_sec": round(lit_plan, 2),
                "literal_total_sec": round(lit_total, 2),
                "semi_plan_sec": round(semi_plan, 2),
                "semi_total_sec": round(semi_total, 2),
                "rows": lit_n,
                "scan_report_semi": dict(t.last_scan_report),
            }
        )

    # deep fsck: fragment into ~hundreds of files, then audit with the
    # 16-wide pool vs max_workers=1 (monkeypatched) on identical state
    f = SnapshotTable(
        spark, os.path.join(work, "fsck"), ["k"], n_buckets=8,
        stats_on_merge=True, max_records_per_file=512,
    )
    f.overwrite(
        spark.range(150_000).selectExpr("id AS k", "id AS v"), batch_id=0
    )
    ptr = f._read_pointer()
    n_files = sum(len(m) for m in (ptr.get("fstats") or {}).values())
    t2 = time.time()
    rep_pool = f.fsck(deep=True)
    pooled = time.time() - t2

    import concurrent.futures as _cf

    real_tpe = _cf.ThreadPoolExecutor

    class _OneThread(real_tpe):
        def __init__(self, *a, **kw):
            super().__init__(max_workers=1)

    _cf.ThreadPoolExecutor = _OneThread
    try:
        t3 = time.time()
        rep_serial = f.fsck(deep=True)
        serial = time.time() - t3
    finally:
        _cf.ThreadPoolExecutor = real_tpe
    assert rep_pool == rep_serial
    out["deep_fsck"] = {
        "files": n_files,
        "pooled_sec": round(pooled, 3),
        "single_thread_sec": round(serial, 3),
        "ok": rep_pool["ok"],
    }

    # pointer-parse cache: every operation plans from one pointer
    # read; measure a cold parse vs 1000 identity-keyed cache hits on
    # the multi-hundred-file manifest above (at 10^5 files the
    # pointer is tens of MB and the cold parse is seconds — the cache
    # turns per-micro-batch parse cost into a stat call)
    ptr_bytes = os.path.getsize(f._pointer_path())
    f._ptr_cache = None
    t4 = time.time()
    f._read_pointer()
    cold = time.time() - t4
    t5 = time.time()
    for _ in range(1000):
        f._read_pointer()
    warm_1000 = time.time() - t5
    out["pointer_cache"] = {
        "pointer_bytes": ptr_bytes,
        "cold_parse_sec": round(cold, 5),
        "warm_1000_reads_sec": round(warm_1000, 5),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
