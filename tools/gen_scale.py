"""Generate a 10x-scale (sf1-equivalent) corpus from the sf0.1 fixture.

The driver ships sf{0.001,0.01,0.1}; the scaling claims (two-phase
prefix sum, band/bucket join linearity) deserve an empirical point one
decade up. This tool replicates every sf0.1 table ``mult`` times with
disjoint key ranges so joins, sessions, and dedup structure scale
LINEARLY — replication alone would be wrong for content tables:

- ``documents.text``: replica ``i`` applies a character bijection
  (alphabet/digit rotation by ``i``). A bijection on characters maps
  the k-shingle set bijectively, so every intra-replica Jaccard — and
  therefore MinHash/SimHash/exact-dup structure — is preserved
  EXACTLY, while any shingle containing a letter or digit differs
  across replicas (disjoint candidate spaces → pair counts scale ~10x,
  not ~100x; verified: a word-suffix tag scheme left in-word character
  shingles shared and exploded candidates 258x).
- ``embeddings.embedding``: replica ``i`` applies an orthogonal map
  (circular dimension shift + deterministic sign flips). Orthogonal ⇒
  all intra-replica cosines preserved exactly; cross-replica cosines
  decorrelate to ~0, so near-dup pairs stay ~linear.
- TPC-H fact/dim keys shift by ``replica * (max_key + 1)`` so FK joins
  resolve within a replica only. ``nation``/``region`` stay shared
  dims (they're broadcast everywhere; scaling them would be wrong).

Output is parquet under ``--out`` (default ``.scaledata/sf1`` in the
repo — gitignored; ~10x sf0.1 ≈ 700 MB). Usage::

    python tools/gen_scale.py [--mult 10] [--src /root/testdata/sf0.1] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: key columns shifted per replica, per table (disjoint id spaces)
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: which source table's max defines each key family's stride
STRIDE_OF = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

SHARED_DIMS = ("nation", "region")


def replicate(df: DataFrame, mult: int, shifts: dict[str, int]) -> DataFrame:
    """One scan: explode a replica-id array, shift keys by replica*stride."""
    out = df.withColumn(
        "_rep", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
    )
    for col, stride in shifts.items():
        out = out.withColumn(col, F.col(col) + F.col("_rep") * F.lit(stride))
    return out


def open_vocab_text(text_col: str = "text", variants: int = 1600) -> F.Column:
    """Rewrite a document's text with an OPEN (realistic) vocabulary.

    Why: the synthetic corpus has a 31-token vocabulary, which makes
    every exact similarity join's OUTPUT quadratic (near-identical
    distinct-token sets everywhere) and masks prefix/LSH selectivity
    (PERF_r10 §7). This map splits each base token into up to
    ``variants`` context-addressed variants (~31 × 1600 ≈ 50k distinct
    tokens) with a Zipf-like frequency profile, while PRESERVING
    duplicate structure: the variant of an occurrence is a
    deterministic function of its (prev, tok, next) trigram, so
    identical passages — the actual near-dups — map identically and
    keep their shared tokens/shingles, but unrelated documents that
    merely share common words no longer collide.

    Zipf-like: variant = floor(variants^u) with u uniform from the
    trigram hash ⇒ P(variant = v) ∝ 1/v (exponent-1 Zipf), the
    natural-language frequency shape.
    """
    return F.expr(
        f"""
        array_join(
          transform(split({text_col}, ' '), (tk, i) ->
            CASE WHEN tk = '' THEN tk ELSE concat(
              tk, '~',
              CAST(floor(pow({variants},
                pmod(xxhash64(
                  element_at(split({text_col}, ' '), greatest(i, 1)),
                  tk,
                  element_at(split({text_col}, ' '),
                    least(i + 2, size(split({text_col}, ' ')))),
                  42), 1000000) / 1000000.0)) AS BIGINT)) END),
          ' ')
        """
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, ".scaledata", "sf1"))
    ap.add_argument(
        "--vocab",
        choices=["closed", "open"],
        default="closed",
        help="open = context-addressed Zipfian ~50k-token vocabulary "
        "for documents.text (similarity-join realism); closed = the "
        "original 31-token corpus",
    )
    args = ap.parse_args()

    from changedatacapture_spark.session import get_spark

    spark: SparkSession = get_spark(app_name="gen-scale")

    strides: dict[str, int] = {}
    for key, (tbl, col) in STRIDE_OF.items():
        strides[key] = (
            spark.read.parquet(f"{args.src}/{tbl}.parquet")
            .agg(F.max(col))
            .first()[0]
            + 1
        )

    os.makedirs(args.out, exist_ok=True)
    for t in SHARED_DIMS:
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{t}.parquet")
        print(f"# {t}: copied (shared dim)", file=sys.stderr)

    for t, keys in SHIFT_KEYS.items():
        df = spark.read.parquet(f"{args.src}/{t}.parquet")
        rep = replicate(df, args.mult, {k: strides[k] for k in keys})
        if t == "documents":
            # per-replica character bijection: rotate lowercase,
            # uppercase, and digits each by the replica id. translate()
            # is a bijection on the text, so shingle sets map
            # bijectively (intra-replica Jaccard exact) while being
            # disjoint across replicas.
            lo = "abcdefghijklmnopqrstuvwxyz"
            up = lo.upper()
            dg = "0123456789"
            src = lo + up + dg
            cases = F.col("text")
            for i in range(1, args.mult):
                dst = (
                    lo[i:] + lo[:i] + up[i:] + up[:i]
                    + dg[i % 10:] + dg[: i % 10]
                )
                cases = F.when(
                    F.col("_rep") == i, F.translate(F.col("text"), src, dst)
                ).otherwise(cases)
            rep = rep.withColumn("text", cases)
            if args.vocab == "open":
                rep = rep.withColumn("text", open_vocab_text("text"))
            rep = rep.withColumn("n_chars", F.length("text"))
        elif t == "embeddings":
            # per-replica orthogonal map: circular shift of dimensions
            # by a replica-dependent stride plus deterministic sign
            # flips. Orthogonal ⇒ intra-replica cosines exact;
            # cross-replica cosines ~0.
            dims = df.select(F.size("embedding").alias("n")).first()["n"]
            shift = F.pmod(
                F.col("_rep") * F.lit(max(1, dims // args.mult)), F.lit(dims)
            )
            shifted = F.concat(
                F.slice(F.col("embedding"), shift + 1, F.lit(dims) - shift),
                F.slice(F.col("embedding"), F.lit(1), shift),
            )
            flipped = F.transform(
                shifted,
                lambda v, j: v
                * (
                    F.lit(1)
                    - F.lit(2) * F.pmod(F.xxhash64(F.col("_rep"), j), F.lit(2))
                ).cast("float"),
            )
            rep = rep.withColumn(
                "embedding",
                F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(flipped),
            )
        n_parts = spark.sparkContext.defaultParallelism
        rep.drop("_rep").repartition(n_parts).write.mode("overwrite").parquet(
            f"{args.out}/{t}.parquet"
        )
        n = spark.read.parquet(f"{args.out}/{t}.parquet").count()
        print(f"# {t}: {n} rows ({args.mult}x)", file=sys.stderr)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
