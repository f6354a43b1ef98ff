"""Round-11 second-batch operator tests: temperature mixing, z-order
scan audit, HyperLogLog, and DSIR importance selection."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F


def test_temperature_mix_exact_isqrt(spark):
    """The alpha=1/2 weight must be the exact integer square root —
    including at perfect squares and one-off-square counts where a
    naive double sqrt can land on the wrong side of floor."""
    from changedatacapture_spark.operators.curation import temperature_mix

    # token counts: 1, 4 (square), 5 (square+1), 99 (square-1... 10^2-1)
    rows = [
        ("s1", "a"),
        ("s2", "a b c d"),
        ("s3", "a b c d e"),
        ("s4", " ".join(["t"] * 99)),
    ]
    docs = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in temperature_mix(docs).collect()}
    n = {"s1": 1, "s2": 4, "s3": 5, "s4": 99}
    tot_s = sum(math.isqrt(v) for v in n.values())
    tot_n = sum(n.values())
    for s, cnt in n.items():
        assert got[s]["n_tokens"] == cnt
        assert got[s]["temp_ppm"] == math.isqrt(cnt) * 1_000_000 // tot_s
        assert got[s]["natural_ppm"] == cnt * 1_000_000 // tot_n
    # temperature flattens: smallest source upsampled, largest downsampled
    assert got["s1"]["boost_milli"] > 1000 > got["s4"]["boost_milli"]


def test_layout_scan_compare_zorder_prunes(spark, sf_dir):
    """Under the 2-D box predicate the natural layout must scan every
    file while the z-order layout prunes; every layout's scanned rows
    must cover the true matches."""
    from changedatacapture_spark.operators.layout import layout_scan_compare
    from changedatacapture_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    out = {
        r["layout"]: r
        for r in layout_scan_compare(
            ev,
            x=(F.col("user_id") * 37) % 256,
            y=F.greatest(F.floor(F.col("value") * 100).cast("long"), F.lit(0))
            % 256,
            order_col="event_id",
        ).collect()
    }
    assert set(out) == {"natural", "single", "zorder"}
    true_rows = out["natural"]["true_rows"]
    n = ev.count()
    # ceil split: the last row range may be empty, so <= 64 files,
    # but the same count under every layout
    n_files = out["natural"]["n_files"]
    assert 32 <= n_files <= 64
    for r in out.values():
        assert r["n_files"] == n_files
        assert r["true_rows"] == true_rows
        assert r["rows_scanned"] >= true_rows
    # the probe box must actually select something at this SF
    assert 0 < true_rows < n
    # unsorted data has no locality; the z-curve must prune strictly
    assert out["zorder"]["files_scanned"] < out["natural"]["files_scanned"]
    assert out["zorder"]["rows_scanned"] <= out["natural"]["rows_scanned"]


def test_hll_distinct_matches_reference_registers(spark):
    """Registers and the scaled harmonic sum must equal a pure-python
    HLL replaying the identical md5 arithmetic; exact counts exact."""
    from changedatacapture_spark.operators.stats import hll_distinct

    keys = list(range(500))
    df = spark.createDataFrame(
        [("g", k) for k in keys], "grp_in string, key long"
    )
    row = hll_distinct(df, "grp_in", "key").collect()[0]
    regs = [0] * 64
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:12], 16)
        j, w = h % 64, h // 64
        rank = 43 - w.bit_length()
        regs[j] = max(regs[j], rank)
    s_scaled = sum(1 << (43 - m) for m in regs)
    assert row["s_scaled"] == s_scaled
    assert row["n_zero"] == sum(1 for m in regs if m == 0)
    assert row["exact_keys"] == 500
    # HLL with m=64 has ~13% std error; 500 distinct is far past the
    # linear-counting regime, so est == est_hll and within 3 sigma
    assert abs(row["est"] - 500) < 500 * 0.4


def test_hll_map_side_combinable_partition_invariant(spark):
    """The register max must be partitioning-independent (the property
    that makes HLL mergeable with no distinct shuffle)."""
    from changedatacapture_spark.operators.stats import hll_distinct

    rows = [("g", k % 37) for k in range(1000)]  # heavy duplication
    df = spark.createDataFrame(rows, "grp_in string, key long")
    a = hll_distinct(df.coalesce(1), "grp_in", "key").collect()[0]
    b = hll_distinct(df.repartition(32), "grp_in", "key").collect()[0]
    assert a["s_scaled"] == b["s_scaled"]
    assert a["est"] == b["est"]
    assert a["exact_keys"] == 37


def test_dsir_select_ranks_target_like_docs_first(spark):
    """Raw docs sharing the target's n-grams must outscore raw docs
    that don't; selection keeps the top ceil(n/5); a single-token doc
    contributes exactly one (unigram) feature — the descending
    sequence(0,-1) pitfall."""
    from changedatacapture_spark.operators.text import dsir_select

    rows = (
        # target (fits p): distinctive phrase
        [(i, "en", "alpha beta alpha beta gamma") for i in range(5)]
        # raw, target-like
        + [(10 + i, "de", "alpha beta gamma alpha") for i in range(2)]
        # raw, off-distribution
        + [(20 + i, "de", "omega psi chi phi omega psi") for i in range(7)]
        # raw, single token (bigram arm must emit nothing)
        + [(30, "de", "omega")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in dsir_select(docs, F.col("lang") == "en").collect()}
    assert set(out) == {10, 11, 20, 21, 22, 23, 24, 25, 26, 30}
    assert out[30]["n_feats"] == 1
    # target-like raw docs take ranks 1-2 and the selected flag
    assert {out[10]["sel_rank"], out[11]["sel_rank"]} == {1, 2}
    assert out[10]["selected"] and out[11]["selected"]
    # 10 scored docs -> top ceil(10/5) = 2 selected
    assert sum(1 for r in out.values() if r["selected"]) == 2
    assert all(
        out[d]["logw_milli"] < out[10]["logw_milli"] for d in (20, 30)
    )


def test_dsir_weight_table_broadcasts(spark):
    """The scoring join must broadcast the bounded weight table, not
    shuffle the occurrence stream."""
    from changedatacapture_spark.operators.text import dsir_select

    docs = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "de", "a c d")],
        "doc_id long, lang string, text string",
    )
    plan = (
        dsir_select(docs, F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_leakage_safe_split_is_group_atomic(spark, sf_dir):
    """No duplicate cluster may straddle splits, the assignment must
    cover every document exactly once, and the split must be the md5
    bucket of the GROUP id (not the member's own id)."""
    from changedatacapture_spark.operators.curation import (
        leakage_safe_split,
        split_bucket,
    )
    from changedatacapture_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from changedatacapture_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    sigs = minhash_signatures(docs, n_hashes=4, k=5)
    groups = connected_components(lsh_candidate_pairs(sigs, n_hashes=4, bands=2))
    out = leakage_safe_split(docs, groups)
    assert out.count() == docs.count()
    straddlers = (
        out.groupBy("group_id")
        .agg(F.count_distinct("split").alias("ns"))
        .filter("ns > 1")
        .count()
    )
    assert straddlers == 0
    # bucket column really is md5(group_id), not md5(doc_id)
    mismatch = out.withColumn(
        "expect", split_bucket("CAST(group_id AS STRING)")
    ).filter("bucket <> expect").count()
    assert mismatch == 0


def test_hll_partials_merge_law(spark):
    """Partial registers from arbitrary row subsets folded by max must
    give the identical summary as the one-pass sketch — the merge law
    the streaming twin (events_stream_hll) relies on."""
    from changedatacapture_spark.operators.stats import (
        hll_distinct,
        hll_finalize,
        hll_partial_registers,
    )

    rows = [("g", k % 211) for k in range(2000)]
    df = spark.createDataFrame(rows, "grp_in string, key long")
    whole = hll_distinct(df, "grp_in", "key").collect()[0]
    parts = [
        hll_partial_registers(
            df.filter(F.col("key") % 3 == i), "grp_in", "key"
        )
        for i in range(3)
    ]
    merged = parts[0].unionByName(parts[1]).unionByName(parts[2])
    exact = df.groupBy(F.col("grp_in").alias("grp")).agg(
        F.count_distinct("key").alias("exact_keys")
    )
    folded = hll_finalize(merged, exact).collect()[0]
    assert folded["s_scaled"] == whole["s_scaled"]
    assert folded["est"] == whole["est"]
    assert folded["exact_keys"] == whole["exact_keys"] == 211


def test_layout_rank_is_two_phase(spark, sf_dir):
    """The per-row rank window must partition by (layout, bucket) —
    never a whole-layout single partition (the 100 TB straggler)."""
    from changedatacapture_spark.operators.layout import layout_scan_compare
    from changedatacapture_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    plan = (
        layout_scan_compare(
            ev,
            x=(F.col("user_id") * 37) % 256,
            y=F.greatest(F.floor(F.col("value") * 100).cast("long"), F.lit(0))
            % 256,
            order_col="event_id",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    row_windows = [
        ln for ln in plan.splitlines() if "row_number()" in ln
    ]
    assert row_windows, plan
    for ln in row_windows:
        assert "bkt" in ln, ln


def test_hll_null_keys_ignored(spark):
    """NULL keys must not perturb registers, and a group of only NULL
    keys must be omitted (count_distinct semantics) rather than reach
    the estimate divide with exact_keys = 0."""
    from changedatacapture_spark.operators.stats import hll_distinct

    rows = [("g", k) for k in range(100)] + [("g", None)] * 5 + [
        ("allnull", None)
    ] * 3
    df = spark.createDataFrame(rows, "grp_in string, key long")
    clean = spark.createDataFrame(
        [("g", k) for k in range(100)], "grp_in string, key long"
    )
    got = {r["grp"]: r for r in hll_distinct(df, "grp_in", "key").collect()}
    want = hll_distinct(clean, "grp_in", "key").collect()[0]
    assert set(got) == {"g"}
    assert got["g"]["s_scaled"] == want["s_scaled"]
    assert got["g"]["est"] == want["est"]
    assert got["g"]["exact_keys"] == 100


def test_zorder_clustered_store_prunes_files(spark, sf_dir, tmp_path):
    """A SnapshotTable clustered on the Morton curve must keep strictly
    fewer files for a 2-D box read_where than an unclustered twin of
    identical content, and both reads must return identical rows."""
    from changedatacapture_spark.operators.layout import zorder16_sql
    from changedatacapture_spark.sources.tables import load_table
    from changedatacapture_spark.streaming.sink import SnapshotTable

    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "value"
    )
    state = ev.withColumn(
        "bx", ((F.col("user_id") * 37) % 256).cast("long")
    ).withColumn(
        "by_",
        F.greatest(F.floor(F.col("value") * 100).cast("long"), F.lit(0)) % 256,
    )
    preds = [("bx", "between", 32, 47), ("by_", "between", 32, 47)]
    reports, results = {}, {}
    for tag, cluster in (("zorder", [zorder16_sql("bx", "by_")]), ("flat", None)):
        t = SnapshotTable(
            spark,
            str(tmp_path / tag),
            ["event_id"],
            n_buckets=4,
            cluster_cols=cluster,
            max_records_per_file=32,
        )
        t.overwrite(state, batch_id=0)
        results[tag] = sorted(
            tuple(r) for r in t.read_where(preds).select(
                "event_id", "bx", "by_"
            ).collect()
        )
        reports[tag] = dict(t.last_scan_report)
    assert results["zorder"] == results["flat"]
    assert len(results["zorder"]) > 0
    # the clustered maintenance write range-partitions across the full
    # cluster (write parallelism is no longer capped at n_buckets), so
    # each write task may close one partial boundary file per bucket it
    # touches: allow that bounded overhead, keep the pruning pin strict
    import os as _os

    slack = max(_os.cpu_count() or 1, 2)
    assert (
        reports["flat"]["files_total"]
        <= reports["zorder"]["files_total"]
        <= reports["flat"]["files_total"] + slack
    ), reports
    assert reports["zorder"]["files_kept"] < reports["flat"]["files_kept"], reports


def test_mrl_full_prefix_equals_brute(spark, sf_dir):
    """With prefix_dim = the full dimension, the coarse pass IS the
    exact score, so the 50-candidate shortlist contains the true
    top-5 and the MRL result must equal brute force row for row."""
    from changedatacapture_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_mrl,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    cols = ["probe_id", "neighbor_id", "score_scaled", "rk"]
    brute = sorted(tuple(r) for r in cosine_topk(emb, probes, k=5).select(*cols).collect())
    mrl = sorted(
        tuple(r)
        for r in cosine_topk_mrl(
            emb, probes, k=5, shortlist=50, prefix_dim=64
        ).select(*cols).collect()
    )
    assert mrl == brute


def test_welch_ttest_matches_python_reference(spark):
    """t statistic and Welch-Satterthwaite df must match a pure-python
    computation over the same quantized values."""
    import math

    from changedatacapture_spark.operators.stats import welch_ttest

    a = [1.0, 2.0, 3.0, 4.0, 10.0]
    b = [2.5, 2.6, 2.4, 2.5, 2.7, 2.5]
    rows = [("click", v) for v in a] + [("view", v) for v in b]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = welch_ttest(df, "event_type", "value", "click", "view").collect()[0]

    def q(vals):
        return [math.floor(v * 1_000_000) / 1_000_000 for v in vals]

    qa, qb = q(a), q(b)
    ma, mb = sum(qa) / len(qa), sum(qb) / len(qb)
    va = sum((v - ma) ** 2 for v in qa) / (len(qa) - 1)
    vb = sum((v - mb) ** 2 for v in qb) / (len(qb) - 1)
    se2 = va / len(qa) + vb / len(qb)
    t = (ma - mb) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / len(qa)) ** 2 / (len(qa) - 1) + (vb / len(qb)) ** 2 / (len(qb) - 1)
    )
    assert got["n_a"] == 5 and got["n_b"] == 6
    assert abs(got["t_stat"] - t) < 1e-9
    assert abs(got["df_welch"] - dof) < 1e-9
    assert got["significant"] == (abs(t) > 1.96)


def test_welch_degenerate_single_row_cohort_nulls_on_both_engines(spark):
    """A cohort of exactly 1 row makes the (n-1) variance denominator
    zero. The NULLIF-guarded shared formulas must yield NULL — on
    Spark AND on DuckDB, where a bare /0.0 would diverge to Inf/NaN
    and break the bit-exactness contract (ADVICE r11)."""
    import duckdb

    from changedatacapture_spark.operators.stats import (
        welch_exprs,
        welch_ttest,
    )

    rows = [("click", 3.0), ("view", 2.0), ("view", 4.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = welch_ttest(df, "event_type", "value", "click", "view").collect()[0]
    assert got["n_a"] == 1
    assert got["var_a"] is None
    assert got["t_stat"] is None
    assert got["df_welch"] is None

    # same formula trees over the same exact moments in DuckDB
    e = welch_exprs()
    moments = (
        "SELECT CAST(1 AS BIGINT) AS n_a, CAST(3000000 AS DECIMAL(38,0)) "
        "AS sx_a, CAST(9000000000000 AS DECIMAL(38,0)) AS sxx_a, "
        "CAST(2 AS BIGINT) AS n_b, CAST(6000000 AS DECIMAL(38,0)) AS sx_b, "
        "CAST(20000000000000 AS DECIMAL(38,0)) AS sxx_b"
    )
    r = duckdb.sql(
        f"SELECT {e['var_a']} AS var_a, {e['t_stat']} AS t_stat, "
        f"{e['df_welch']} AS df_welch FROM ({moments})"
    ).fetchone()
    assert r == (None, None, None)


def test_bootstrap_ci_deterministic_and_ordered(spark):
    """The CI must be identical under any partitioning (deterministic
    md5 weights), lo <= hi, and built from exactly 100 replicates."""
    from changedatacapture_spark.operators.stats import bootstrap_ci

    rows = [("g", i, 10.0 + (i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, event_id long, value double")
    a = bootstrap_ci(df.coalesce(1), "grp", "value", "event_id").collect()[0]
    b = bootstrap_ci(df.repartition(16), "grp", "value", "event_id").collect()[0]
    assert tuple(a) == tuple(b)
    assert a["n_replicates"] == 100
    assert a["ci_lo_scaled"] <= a["ci_hi_scaled"]
    # point estimate of 10..16 cycle sits inside the interval
    assert a["ci_lo_scaled"] <= a["mean_scaled"] <= a["ci_hi_scaled"]
