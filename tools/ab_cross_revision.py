"""Cross-revision paired A/B: streaming-apply throughput, r13 vs HEAD.

The committed stream number declined three driver rounds straight
(7,397 → 6,648 → 6,274 ev/s, r13→r15) while the single-core
calibration got FASTER each round — either a code mover landed
somewhere in r14/r15, or the driver hosts got quicker at arithmetic
and slower at this workload. The r15 marker A/B exonerated one
hypothesis on one revision; this harness tests the only thing that
can settle it: THE TWO REVISIONS, same box, same session window,
interleaved.

Arms are git worktrees (default: r13 HEAD ``ba971a2`` vs the current
checkout). Each (trial, arm) cell runs in a FRESH subprocess — two
revisions of the same package cannot share one interpreter — with an
identical protocol: single-core calibration probe, a warm-up apply
(JVM + codegen, excluded), the measured 100k-event apply
(``streaming/bench.py:run``), calibration again. Arms alternate
A/B/A/B inside each trial so host drift lands on both equally; the
fresh-JVM cost is symmetric by construction. Paired per-trial deltas
are the output — read them against the calib columns before believing
either direction.

Usage: python tools/ab_cross_revision.py [trials] [n_events] [old_rev]
Writes /tmp/ab_cross_revision.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEAD_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
root = sys.argv[1]
n_events = int(sys.argv[2])
warm_events = int(sys.argv[3])
sys.path.insert(0, root)

def calib():
    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i * i
    return round(time.time() - t0, 3)

from changedatacapture_spark.session import get_spark
from changedatacapture_spark.streaming.bench import run

spark = get_spark(app_name="ab-cross-revision")
run(spark, warm_events, 10_000, 32)  # JIT/codegen warm-up, excluded
c0 = calib()
r = run(spark, n_events, 10_000, 32)
c1 = calib()
print(json.dumps({
    "events_per_sec": r["events_per_sec"],
    "wall_sec": r.get("wall_sec"),
    "calib_before": c0,
    "calib_after": c1,
}))
"""


def _run_arm(root: str, n_events: int, warm: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, root, str(n_events), str(warm)],
        capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"arm {root} failed:\n{out.stderr[-2000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    old_rev = sys.argv[3] if len(sys.argv) > 3 else "ba971a2"
    warm = 20_000

    old_root = f"/tmp/ab_arm_{old_rev}"
    if not os.path.isdir(old_root):
        subprocess.run(
            ["git", "worktree", "add", "--detach", old_root, old_rev],
            cwd=HEAD_ROOT, check=True,
        )

    rows = []
    for trial in range(trials):
        for arm, root in (("r13", old_root), ("head", HEAD_ROOT)):
            t0 = time.time()
            r = _run_arm(root, n_events, warm)
            r.update(trial=trial, arm=arm,
                     subprocess_wall=round(time.time() - t0, 1))
            rows.append(r)
            print(
                f"# trial {trial} {arm}: {r['events_per_sec']} ev/s "
                f"calib {r['calib_before']}/{r['calib_after']}",
                file=sys.stderr, flush=True,
            )

    paired = []
    for t in range(trials):
        a = next(r for r in rows if r["trial"] == t and r["arm"] == "r13")
        b = next(r for r in rows if r["trial"] == t and r["arm"] == "head")
        paired.append({
            "trial": t,
            "r13_ev_s": a["events_per_sec"],
            "head_ev_s": b["events_per_sec"],
            "head_minus_r13_ev_s": round(
                b["events_per_sec"] - a["events_per_sec"], 1
            ),
            "head_over_r13": round(
                b["events_per_sec"] / a["events_per_sec"], 4
            ),
            "r13_calib": (a["calib_before"], a["calib_after"]),
            "head_calib": (b["calib_before"], b["calib_after"]),
        })
    result = {"n_events": n_events, "old_rev": old_rev,
              "rows": rows, "paired": paired}
    with open("/tmp/ab_cross_revision.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(paired, indent=1))


if __name__ == "__main__":
    main()
