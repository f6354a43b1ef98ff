"""Round-18 perf evidence: commit cost vs table file count (sidecar).

The r17 pointer carried every file's zone stats INLINE, so each commit
serialized O(total table files) of JSON twice (pointer + log append) —
the last O(table)-per-commit cost (VERDICT r17 #1). With the stats
sidecar, the pointer carries {bucket: version} references and a commit
writes only the buckets it touched.

One measurement, one JSON line: tables at 1x / ~10x / ~30x the file
count, each hit with the SAME 1-key merge, reporting

- ``files``: committed file count (manifest-derived),
- ``pointer_bytes``: on-disk pointer size after the merge — the bytes
  every subsequent commit re-serializes; must be FLAT across scales,
- ``inline_stats_bytes``: what the composed stats/fstats payload
  measures — the bytes the OLD scheme would have written per commit
  (twice); grows linearly with files,
- ``merge_wall_sec``: median of 3 identical 1-key merges (the commit
  is driver work + one tiny Spark job; the flat curve is the claim,
  not the absolute wall).

Usage: python tools/perf_round18.py [rows ...]   (default 2k 20k 60k)
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

    sizes = [int(a) for a in sys.argv[1:]] or [2_000, 20_000, 60_000]
    spark = get_spark(app_name="perf-round18")
    work = tempfile.mkdtemp(prefix="perf_r18_")
    out: dict = {"commit_vs_files": []}

    for n_rows in sizes:
        t = SnapshotTable(
            spark, os.path.join(work, f"t{n_rows}"), ["k"],
            n_buckets=16, cluster_cols=["v"], max_records_per_file=64,
        )
        t.overwrite(
            spark.range(n_rows).selectExpr("id AS k", "id * 7 AS v"),
            batch_id=0,
        )
        ptr = t._read_pointer()
        n_files = sum(len(m) for m in (ptr.get("fstats") or {}).values())
        inline_bytes = len(
            json.dumps({"stats": ptr["stats"], "fstats": ptr["fstats"]})
        )
        one = spark.createDataFrame(
            [(1, 999_999, "u")], "k long, v long, op string"
        )
        walls = []
        for i in range(1, 4):
            t0 = time.time()
            t.merge(one, batch_id=i)
            walls.append(time.time() - t0)
        # isolate the driver serialization the sidecar removed from
        # the merge wall (locally the Spark job dominates; at 10^5
        # files the inline payload is tens of MB serialized twice per
        # micro-batch): time json.dumps of the OLD inline payload vs
        # the NEW ref-carrying pointer, median of 5
        def _ser(obj):
            ws = []
            for _ in range(5):
                s0 = time.time()
                json.dumps(obj)
                ws.append(time.time() - s0)
            return round(sorted(ws)[2] * 1000, 3)

        with open(t._pointer_path()) as f:
            new_entry = json.load(f)
        old_entry = dict(new_entry)
        old_entry.pop("stats_ref", None)
        old_entry.pop("fstats_ref", None)
        old_entry["stats"], old_entry["fstats"] = ptr["stats"], ptr["fstats"]
        row = {
            "rows": n_rows,
            "files": n_files,
            "pointer_bytes": os.path.getsize(t._pointer_path()),
            "inline_stats_bytes": inline_bytes,
            "serialize_new_ms": _ser(new_entry),
            "serialize_old_inline_ms": _ser(old_entry),
            "merge_wall_sec": round(sorted(walls)[1], 3),
        }
        out["commit_vs_files"].append(row)
        print(f"# {row}", file=sys.stderr)

    base = out["commit_vs_files"][0]
    top = out["commit_vs_files"][-1]
    out["pointer_growth_ratio"] = round(
        top["pointer_bytes"] / base["pointer_bytes"], 3
    )
    out["inline_growth_ratio"] = round(
        top["inline_stats_bytes"] / base["inline_stats_bytes"], 3
    )
    out["file_growth_ratio"] = round(top["files"] / base["files"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
