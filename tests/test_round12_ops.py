"""Round-12 operator tests: label-partitioned filtered ANN."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_label_partitioned_equals_prefilter_when_shortlist_covers(
    spark, sf_dir, tmp_path
):
    """With shortlist >= the eligible-label population, the coarse
    stage cannot drop a true neighbor, so the label-partitioned search
    must equal the exact pre-filtered top-5 row for row — the recall
    1.0 the partitioned layout exists to restore (post-filtering an
    unpartitioned shortlist measurably cannot)."""
    from changedatacapture_spark.operators.similarity import (
        build_label_ann_index,
        cosine_topk,
        cosine_topk_label_partitioned,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    eligible = emb.filter(F.col("label") == 3)
    n_eligible = eligible.count()
    assert n_eligible > 5

    idx = str(tmp_path / "label_ann")
    build_label_ann_index(emb, idx, prefix_dim=16)

    cols = ["probe_id", "neighbor_id", "score_scaled", "rk"]
    exact = sorted(
        tuple(r)
        for r in cosine_topk(eligible, probes, k=5).select(*cols).collect()
    )
    lp = sorted(
        tuple(r)
        for r in cosine_topk_label_partitioned(
            spark,
            idx,
            emb,
            probes,
            label_value=3,
            k=5,
            shortlist=n_eligible,
            prefix_dim=16,
        )
        .select(*cols)
        .collect()
    )
    assert lp == exact


def test_label_partitioned_index_never_reads_other_labels(
    spark, sf_dir, tmp_path
):
    """Physically delete every OTHER label's partition from the index:
    the filtered probe must still run — proof the scan touches only
    its label's directory, the property that bounds cost at 100 TB."""
    import shutil
    import os

    from changedatacapture_spark.operators.similarity import (
        build_label_ann_index,
        cosine_topk_label_partitioned,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "label_ann")
    build_label_ann_index(emb, idx, prefix_dim=16)
    for d in os.listdir(idx):
        if d.startswith("label=") and d != "label=3":
            shutil.rmtree(os.path.join(idx, d))
    out = cosine_topk_label_partitioned(
        spark, idx, emb, probes, label_value=3, k=5, shortlist=100,
        prefix_dim=16,
    ).collect()
    assert len(out) > 0
    labels = {
        r.label
        for r in emb.join(
            spark.createDataFrame(
                [(r.neighbor_id,) for r in out], "vec_id long"
            ),
            "vec_id",
        )
        .select("label")
        .collect()
    }
    assert labels == {3}


def test_qsketch_merge_law_exact_under_any_split(spark, sf_dir):
    """Bottom-k of a union == bottom-k of the parts' bottom-k's: the
    sketch folded from arbitrary disjoint batch partials must equal
    the one-pass sketch bit for bit — the mergeability that lets
    partials cross micro-batches/days/workers."""
    from changedatacapture_spark.operators.stats import (
        qsketch_finalize,
        qsketch_partial,
        quantile_sketch,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("long")
    )
    one_pass = sorted(
        tuple(r)
        for r in quantile_sketch(
            ev, "event_type", "value", "event_id"
        ).collect()
    )
    parts = [
        qsketch_partial(
            ev.filter(F.col("event_id") % 3 == i),
            "event_type",
            "value",
            "event_id",
        )
        for i in range(3)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    folded = sorted(
        tuple(r)
        for r in qsketch_finalize(u, ev, "event_type", "value", "event_id").collect()
    )
    assert folded == one_pass


def test_qsketch_rank_error_within_sample_bound(spark, sf_dir):
    """The k=256 sample's rank error must stay within a loose 4/sqrt(k)
    bound (~25% ppm) for every quantile — the quality loop the sketch
    ships with; exact values are NOT expected (that is the trade for
    O(k) state)."""
    from changedatacapture_spark.operators.stats import quantile_sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = quantile_sketch(ev, "event_type", "value", "event_id").collect()
    assert rows
    for r in rows:
        assert r.m_sample <= 256
        assert abs(r.err_ppm) <= 250_000, (r.grp, r.q_pct, r.err_ppm)
        # est_rank_ppm is the measured truth: 0 < rank <= 1e6
        assert 0 < r.est_rank_ppm <= 1_000_000


def test_png_roundtrip_property():
    """encode_png -> decode_png must be the identity on arbitrary
    rasters and shapes — heights >= 5 exercise all five scanline
    filters (the encoder cycles them per row), so a broken
    Sub/Up/Average/Paeth unfilter cannot pass. The scalar reference
    is the raw raster itself."""
    import random

    from changedatacapture_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = random.Random(12)
    for w, h in [(1, 1), (1, 7), (2, 5), (3, 6), (8, 8), (13, 5), (24, 1)]:
        raster = bytes(rng.randrange(256) for _ in range(w * h))
        payload = encode_png(raster, w, h)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert decode_png(payload) == (w, h, raster)
        # the dispatch must route PNG by magic bytes too
        assert decode_image(payload) == (w, h, raster)
    # adversarial extremes: constant and sawtooth rasters hit the
    # Average/Paeth tie-break branches
    for fill in (b"\x00" * 30, b"\xff" * 30, bytes(range(30)) * 1):
        assert decode_png(encode_png(fill, 6, 5)) == (6, 5, fill)


def test_png_rejects_corruption():
    """A flipped payload byte must fail the chunk CRC loudly, never
    silently mis-decode."""
    import pytest as _pytest

    from changedatacapture_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    payload = bytearray(encode_png(bytes(range(24)), 4, 6))
    payload[40] ^= 0xFF  # inside a chunk body
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_mg_candidate_union_superset_under_any_split(spark, sf_dir):
    """The streaming exact-heavy-hitter guarantee: however the rows
    split, the union of per-subset Misra-Gries candidate sets contains
    every global heavy hitter (averaging + MG's local guarantee), so
    the exact verify produces the plain groupBy answer."""
    from changedatacapture_spark.operators.stats import (
        exact_heavy_hitters,
        mg_candidates,
        verify_heavy_hitters,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    one_pass = sorted(
        tuple(r) for r in exact_heavy_hitters(ev, "user_id", k=50).collect()
    )
    assert one_pass, "fixture must contain heavy hitters at k=50"
    parts = [
        mg_candidates(
            ev.filter(F.col("event_id") % 3 == i), "user_id", capacity=64
        )
        for i in range(3)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    folded = sorted(
        tuple(r)
        for r in verify_heavy_hitters(ev, u, "user_id", k=50).collect()
    )
    assert folded == one_pass


def test_doremi_step_update_direction_and_normalization(spark, sf_dir):
    """Sources with above-reference proxy loss gain weight relative to
    their natural share; the smoothed mixture still sums to ~1e6."""
    from changedatacapture_spark.operators.curation import doremi_step

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = doremi_step(docs).collect()
    assert rows
    total = sum(r.doremi_ppm for r in rows)
    assert abs(total - 1_000_000) <= len(rows) + 1  # floor drift only
    n = len(rows)
    uniform = 1_000_000 // n
    for r in rows:
        # smoothing bounds: never below 10% of uniform share
        assert r.doremi_ppm >= 100_000 * uniform // 1_000_000
        if r.excess_ppm == 0:
            # zero-excess sources cannot gain weight beyond smoothing
            assert r.doremi_ppm <= (900_000 * r.natural_ppm
                                    * 1_000_000 // 1_000_000) // 900_000 \
                + 100_000 * uniform // 1_000_000 + 2


def test_incremental_index_append_touches_only_delta(spark, sf_dir, tmp_path):
    """Appending a delta into the label index must add exactly the
    delta's rows — pre-existing partitions' files stay untouched."""
    import glob
    import os

    from changedatacapture_spark.operators.similarity import (
        build_label_ann_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "idx")
    day0 = emb.filter(F.col("vec_id") % 2 == 0)
    build_label_ann_index(day0, idx, prefix_dim=16)
    before = {
        f: os.path.getmtime(f) for f in glob.glob(f"{idx}/label=*/*.parquet")
    }
    n0 = spark.read.parquet(idx).count()
    delta = emb.filter(F.col("vec_id") % 2 == 1)
    build_label_ann_index(delta, idx, prefix_dim=16, mode="append")
    after = {
        f: os.path.getmtime(f) for f in glob.glob(f"{idx}/label=*/*.parquet")
    }
    assert spark.read.parquet(idx).count() == n0 + delta.count()
    for f, mt in before.items():
        assert after.get(f) == mt, f"pre-existing index file rewritten: {f}"


def test_verify_heavy_hitters_with_key_named_key(spark):
    """The public mg/verify split must work when the caller's key
    column is literally named 'key' — the candidate relation renames
    internally so the join condition stays unambiguous."""
    from changedatacapture_spark.operators.stats import (
        exact_heavy_hitters,
    )

    rows = [(1,)] * 60 + [(2,)] * 30 + [(i,) for i in range(100, 110)]
    df = spark.createDataFrame(rows, "key long")
    got = sorted(
        (r.key, r.n_rows)
        for r in exact_heavy_hitters(df, "key", k=4, capacity=16).collect()
    )
    assert got == [(1, 60), (2, 30)]


def test_content_digest_injective_encodings(spark):
    """The digest must distinguish the classic canonicalization traps:
    NULL vs a sentinel-looking literal, and separator characters that
    would shift field boundaries under a concat-with-separator
    encoding."""
    from changedatacapture_spark.operators.cdc import content_digest

    def dg(rows):
        df = spark.createDataFrame(rows, "a string, b string")
        r = content_digest(df, ["a", "b"]).collect()[0]
        return (r.n_rows, str(r.digest))

    assert dg([("x", None)]) != dg([("x", " ")])
    assert dg([("a|b", "c")]) != dg([("a", "b|c")])
    assert dg([("a", "bc")]) != dg([("ab", "c")])
    # order independence and duplicate sensitivity
    rows = [("r1", "v1"), ("r2", "v2"), ("r3", None)]
    assert dg(rows) == dg(list(reversed(rows)))
    assert dg(rows) != dg(rows + [("r1", "v1")])
