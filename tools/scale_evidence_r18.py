"""Round-18 scale evidence: flagship CDC paths at sf0.1 → sf1 → sf10.

The 100 TB claim's best local proxy is the empirical scaling curve:
two decades of data (12 MB → 2 GB of events) through the SAME query
callables the driver verifies, with the scan reports (buckets/files/
ROWS kept vs total) captured per query so the reader can separate
"the engine scheduled more work" from "the host ran it slower". A
single-core calibration probe runs before every query (the r16 rule:
a wall spike with a flat probe belongs to the code; with an inflated
probe, to the host).

One sf per process (fresh JVM — bench.py's sf1 section showed the
long-lived session's heap/GC state dominating cross-section walls).
Prints ONE JSON line.

Usage: python tools/scale_evidence_r18.py <sf_dir> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "cdc_apply",
    "cdc_pruned_scan",
    "cdc_semi_in_scan",
    "cdc_mor_merge_e2e",
]


def _calib() -> float:
    t0 = time.time()
    x = 0
    for i in range(4_000_000):
        x += i * i
    return round(time.time() - t0, 3)


def main() -> None:
    from changedatacapture_spark.queries import SPARK_QUERIES
    from changedatacapture_spark.session import get_spark
    from changedatacapture_spark.streaming.sink import capture_scan_reports

    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="scale-evidence-r18")
    try:
        load0 = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load0 = None
    # warm-up: parquet footers + JVM
    for t in ("events", "lineitem"):
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).count()
        except Exception:  # noqa: BLE001
            pass
    out: dict = {"sf_dir": sf_dir, "loadavg_start": load0, "queries": {}}
    for name in names:
        fn = SPARK_QUERIES[name]
        calib = _calib()
        t0 = time.time()
        with capture_scan_reports() as caps:
            n = fn(spark, sf_dir).count()
        wall = round(time.time() - t0, 3)
        out["queries"][name] = {
            "wall_sec": wall,
            "rows": n,
            "calib_sec": calib,
            "scan": dict(caps[-1][1]) if caps else None,
        }
        print(f"# {name}@{sf_dir}: {wall}s rows={n} calib={calib}",
              file=sys.stderr)
    try:
        out["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        out["loadavg_end"] = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
