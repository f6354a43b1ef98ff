"""Round-10 operator tests: vectorized average-hash parity, PGM codec,
and the de-skewed inverted-index equivalence."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=1, max_size=63))
def test_average_hash_batch_matches_scalar(pix):
    """The numpy batch hash must equal the scalar oracle bit for bit
    on every raster length/content the codec path can produce."""
    import numpy as np

    from changedatacapture_spark.operators.multimodal import (
        average_hash,
        average_hash_batch,
    )

    arr = np.array([pix, pix[::-1]], dtype=np.uint8)
    got = average_hash_batch(arr)
    assert int(got[0]) == average_hash(bytes(pix))
    assert int(got[1]) == average_hash(bytes(pix[::-1]))


def test_bmp_ahash_unchanged_by_vectorization(spark):
    """End-to-end: the mapInPandas hash path emits the same
    (doc_id, ahash) rows as the scalar reference for every raster
    shape in the widths table."""
    from changedatacapture_spark.operators.multimodal import (
        _bmp_raster,
        average_hash,
        bmp_ahash,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"]: r["ahash"] for r in bmp_ahash(docs).collect()}
    want = {i: average_hash(_bmp_raster(i)) for i in range(12)}
    assert got == want


def _vec(seed, dim=64):
    return [(((seed * 31 + d) * 2654435761) % 2000) / 1000.0 - 1.0 for d in range(dim)]


def test_pq_refine_with_full_shortlist_equals_exact_l2(spark):
    """With shortlist >= corpus size the refine stage re-ranks EVERY
    candidate by exact scaled-integer L2, so the result must equal
    brute-force L2 top-k regardless of how lossy the codes are — the
    property that makes the refine recall claim trustworthy."""
    import math

    from changedatacapture_spark.operators.similarity import (
        PQ_SCALE,
        pq_refine_topk,
    )

    rows = [(i, _vec(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = df.filter("vec_id < 2")
    got = {
        (r["probe_id"], r["rk"]): (r["neighbor_id"], r["dist_scaled"])
        for r in pq_refine_topk(df, probes, k=3, shortlist=25).collect()
    }
    xs = {i: [math.floor(x * PQ_SCALE) for x in v] for i, v in rows}
    for p in (0, 1):
        exact = sorted(
            (sum((a - b) ** 2 for a, b in zip(xs[p], xs[i])), i)
            for i, _ in rows
            if i != p
        )
        for rk in (1, 2, 3):
            d, i = exact[rk - 1]
            assert got[(p, rk)] == (i, d), (p, rk)


def test_pq_refine_broadcasts_shortlist_not_corpus(spark, sf_dir):
    """The refine fetch must be a broadcast point-lookup: the tiny
    (probe x shortlist) candidate set broadcasts into the corpus scan,
    never a second shuffled corpus pass."""
    from changedatacapture_spark.plans.inspect import (
        executed_plan,
        has_broadcast_join,
    )
    from changedatacapture_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["knn_pq_refine_topk"](spark, sf_dir)
    df.collect()
    assert has_broadcast_join(df), executed_plan(df)
