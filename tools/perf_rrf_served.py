"""Measure build-vs-probe for the index-served hybrid RRF retrieval.

The r14 finding: ``text_hybrid_rrf_indexed`` rebuilt its BM25 segments
and IVF assignment inline, so its sf10 wall was index BUILD, not
probe. ``text_hybrid_rrf_served`` amortizes the build through the two
CDF maintenance paths; this harness times the phases separately —

- ``build_sec``: the maintenance phase (two merges per store + CDF
  delta index appends),
- ``probe_sec``: the served probe alone (skinny BM25 segments + the
  probe's top-2 IVF cells via pruned ``read_where`` + RRF fusion),
- ``inline_sec``: the old inline-build query end-to-end for the same
  corpus, as the comparison point —

and prints one JSON line per sf directory argument.

Usage: python tools/perf_rrf_served.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from changedatacapture_spark.session import get_spark
    from changedatacapture_spark.queries import (
        SPARK_QUERIES,
        _rrf_served_build,
        _rrf_served_probe,
    )

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark(app_name="perf-rrf-served")
    for sf_dir in sf_dirs:
        t0 = time.time()
        idx, cells = _rrf_served_build(spark, sf_dir)
        build = time.time() - t0
        # probe twice: cold (first plan over the committed segments)
        # and warm (steady-state serving cost)
        t1 = time.time()
        rows = _rrf_served_probe(spark, sf_dir, idx, cells).collect()
        probe_cold = time.time() - t1
        t2 = time.time()
        _rrf_served_probe(spark, sf_dir, idx, cells).collect()
        probe_warm = time.time() - t2
        t3 = time.time()
        SPARK_QUERIES["text_hybrid_rrf_indexed"](spark, sf_dir).collect()
        inline = time.time() - t3
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "build_sec": round(build, 2),
                    "probe_cold_sec": round(probe_cold, 2),
                    "probe_warm_sec": round(probe_warm, 2),
                    "inline_total_sec": round(inline, 2),
                    "rows": len(rows),
                }
            )
        )


if __name__ == "__main__":
    main()
