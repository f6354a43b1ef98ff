"""Property-based differential test for the pointer stats sidecar.

The sidecar invariant: for ANY changelog, ANY batch split, ANY
per-batch stats policy (stats-committing merge, stats-dropping merge,
MoR append), and ANY interleaving of maintenance ops (compact,
compact_runs, rebucket), the REF-COMPOSED stats are indistinguishable
from inline stats in every observable way:

1. the on-disk pointer NEVER carries inline ``stats``/``fstats``
   (every commit path serializes refs + sidecars only);
2. every composed per-file ``__rows`` equals the actual parquet
   footer row count of that file (stats describe exactly the bytes on
   disk, whatever op wrote them and whatever ref carried them);
3. a pruned ``read_where`` equals the unpruned full-scan filter
   (absent/present stats change the SCHEDULE, never the result);
4. a FRESH instance (cold sidecar cache, pooled multi-version load)
   composes byte-identical stats to the long-lived writer.

Hypothesis drives the adversarial sequences: stats-dropping merges
sandwiched between stats-committing ones (refs with holes), rebuckets
that orphan every carried ref, folds that consolidate many sidecar
versions into one.
"""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),    # key
        st.integers(min_value=0, max_value=3),    # ts ties
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=-50, max_value=50),  # value
    ),
    min_size=4,
    max_size=24,
)

# per-batch: (merge mode, stats_on_merge, post-batch maintenance)
_PLAN = st.lists(
    st.tuples(
        st.sampled_from(["cow", "mor"]),
        st.booleans(),
        st.sampled_from(["none", "minor", "major", "rebucket"]),
    ),
    min_size=1,
    max_size=3,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _footer_rows(path: str) -> dict[str, dict[str, int]]:
    """Actual parquet footer rows for every committed bucket file,
    keyed like fstats: {bucket: {fname: rows}}."""
    import pyarrow.parquet as pq

    with open(f"{path}/_LATEST") as f:
        ptr = json.load(f)
    out: dict[str, dict[str, int]] = {}
    for b, v in ptr["buckets"].items():
        d = f"{path}/v={v}/bucket={b}"
        try:
            names = [n for n in os.listdir(d) if n.endswith(".parquet")]
        except FileNotFoundError:
            continue
        out[b] = {
            n: pq.ParquetFile(f"{d}/{n}").metadata.num_rows for n in names
        }
    return out


@given(_EVENTS, _PLAN, st.integers(min_value=0, max_value=2**31 - 1))
@_SETTINGS
def test_sidecar_refs_indistinguishable_from_inline_stats(
    spark, tmp_path_factory, events, plan, cut_seed
):
    import random

    from changedatacapture_spark.operators.cdc import compact_latest
    from changedatacapture_spark.streaming.sink import SnapshotTable

    rows = sorted(
        (ts, seq, key, op, value)
        for seq, (key, ts, op, value) in enumerate(events)
    )
    rng = random.Random(cut_seed)
    cuts = sorted(rng.randint(0, len(rows)) for _ in range(len(plan) - 1))
    bounds = [0] + cuts + [len(rows)]

    path = str(tmp_path_factory.mktemp("side_prop") / "t")
    t = SnapshotTable(
        spark, path, ["key_id"], n_buckets=4,
        cluster_cols=["value"], max_records_per_file=2,
    )
    for i, (mode, stats_on_merge, maint) in enumerate(plan):
        chunk = rows[bounds[i]:bounds[i + 1]]
        if not chunk:
            continue
        t.stats_on_merge = stats_on_merge
        df = spark.createDataFrame(
            [(k, ts, seq, op, v) for ts, seq, k, op, v in chunk],
            "key_id long, ts long, seq long, op string, value long",
        )
        compacted = compact_latest(df, ["key_id"], ["ts", "seq"])
        if mode == "cow" and (t._read_pointer() or {}).get("runs"):
            t.compact()
        t.merge(compacted, batch_id=i, mode=mode)
        if maint == "minor":
            t.compact_runs()
        elif maint == "major":
            t.compact()
        elif maint == "rebucket":
            t.rebucket(2 if t.n_buckets != 2 else 4)

        # (1) the raw pointer is ref-only after EVERY commit path
        with open(f"{path}/_LATEST") as f:
            raw = json.load(f)
        assert "stats" not in raw and "fstats" not in raw
        assert "stats_ref" in raw and "fstats_ref" in raw

    assert t.exists()
    # (2) composed __rows == parquet footers, file by file
    actual = _footer_rows(path)
    composed = t._read_pointer()["fstats"]
    for b, fmap in composed.items():
        for fname, zone in fmap.items():
            assert zone["__rows"] == actual[b][fname], (b, fname)

    # (3) pruned read == unpruned filter (exactness under any ref state)
    lo, hi = -20, 20
    pruned = sorted(
        (r.key_id, r.value)
        for r in t.read_where(
            [("value", "between", lo, hi)]
        ).select("key_id", "value").collect()
    )
    full = sorted(
        (r.key_id, r.value)
        for r in t.read().where(f"value between {lo} and {hi}")
        .select("key_id", "value").collect()
    )
    assert pruned == full

    # (4) a fresh instance (cold cache, pooled load) composes the same
    t2 = SnapshotTable(spark, path, ["key_id"], n_buckets=t.n_buckets)
    p1, p2 = t._read_pointer(), t2._read_pointer()
    assert p2["fstats"] == p1["fstats"]
    assert p2["stats"] == p1["stats"]
