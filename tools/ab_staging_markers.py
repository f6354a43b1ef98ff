"""Paired A/B: staging-marker cost on the streaming apply hot path.

The r14 verdict flagged a two-round stream-throughput drift
(7,397 → 6,648 ev/s) and named the round-14 staging-marker create +
remove (one O(1) file create at physical-id allocation, one remove at
commit — ``sink.py:_new_data_version`` / ``_clear_staging``) as the
only hot-path change. This harness settles it with paired evidence
instead of calibration hand-waving: the SAME process alternates
marker/no-marker arms of the full 100k-event streaming apply
(``streaming/bench.py:run``), interleaved A/B/A/B so host drift hits
both arms equally, each arm bracketed by the single-core busy-loop
calibration probe.

The no-marker arm monkeypatches allocation to skip the marker file
and clearing to a no-op — crash-safety off, which is why it is an
EXPERIMENT ARM, never a mode.

Usage: python tools/ab_staging_markers.py [trials] [n_events]
"""

from __future__ import annotations

import json
import os
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _calib() -> float:
    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i * i
    return round(time.time() - t0, 3)


def main() -> None:
    from changedatacapture_spark.session import get_spark
    from changedatacapture_spark.streaming import sink as sink_mod
    from changedatacapture_spark.streaming.bench import run

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    orig_new = sink_mod.SnapshotTable._new_data_version
    orig_clear = sink_mod.SnapshotTable._clear_staging

    def _new_nomarker(self):
        return (time.time_ns() << 10) | secrets.randbits(10)

    def _clear_nomarker(self, data_version):
        return None

    spark = get_spark(app_name="ab-staging-markers")
    # warm-up: JIT + codegen caches must not land in either arm
    run(spark, 20_000, 10_000, 32)

    rows = []
    for trial in range(trials):
        for arm in ("marker", "nomarker"):
            if arm == "nomarker":
                sink_mod.SnapshotTable._new_data_version = _new_nomarker
                sink_mod.SnapshotTable._clear_staging = _clear_nomarker
            else:
                sink_mod.SnapshotTable._new_data_version = orig_new
                sink_mod.SnapshotTable._clear_staging = orig_clear
            c0 = _calib()
            r = run(spark, n_events, 10_000, 32)
            c1 = _calib()
            rows.append(
                {
                    "trial": trial,
                    "arm": arm,
                    "events_per_sec": r["events_per_sec"],
                    "wall_sec": r["wall_sec"],
                    "calib_before": c0,
                    "calib_after": c1,
                }
            )
            print(json.dumps(rows[-1]), file=sys.stderr)
    sink_mod.SnapshotTable._new_data_version = orig_new
    sink_mod.SnapshotTable._clear_staging = orig_clear

    def _avg(arm):
        xs = [r["events_per_sec"] for r in rows if r["arm"] == arm]
        return round(sum(xs) / len(xs), 1)

    print(
        json.dumps(
            {
                "ab_staging_markers": rows,
                "mean_marker_ev_s": _avg("marker"),
                "mean_nomarker_ev_s": _avg("nomarker"),
            }
        )
    )


if __name__ == "__main__":
    main()
