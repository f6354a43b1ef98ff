"""Streaming CDC apply benchmark — the BASELINE.md 'Measured' workload.

Thin CLI over ``changedatacapture_spark.streaming.bench``.

Usage: python tools/bench_stream.py [n_events] [batch_size] [n_buckets]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from changedatacapture_spark.session import get_spark
    from changedatacapture_spark.streaming.bench import run

    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(app_name="cdc-stream-bench")
    print(json.dumps(run(spark, n_events, batch_size, n_buckets)))


if __name__ == "__main__":
    main()
