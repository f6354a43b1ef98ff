"""Iterative graph algorithms as fixed-point DataFrame loops.

PageRank here is the distributed textbook formulation — edges are the
big, shuffled-once relation; the rank vector is the small relation that
broadcasts to the edge join every iteration — with all arithmetic in
SCALED INTEGERS (rank mass = RANK_SCALE, integer floor division) so a
DuckDB oracle that unrolls the same iterations as chained CTEs is
bit-exact: integer sums are order-independent where float sums are not.

Scale design (100 TB): per iteration the plan is
    edges ⋈ broadcast(ranks) → groupBy(dst) partial-sum → join nodes,
i.e. linear in |E| with exactly one shuffle keyed on dst, and state
that is O(|V|) — valid whenever the node set (nations, domains, repos)
is orders of magnitude smaller than the edge set, which is the regime
pagerank-over-aggregated-entities lives in. The fixed iteration count
keeps the plan a static DAG — no driver-side convergence collect.

Reference parity: no graph surface exists in the reference
(spark_client/src has no iterative operators); this extends the
duplicate-closure family (operators/dedup.py large-star/small-star)
with a weighted-centrality op the curation pipeline uses for source
weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Total rank mass as a scaled integer; 1e12 keeps 12 digits of rank
#: resolution. The rank*weight product is formed in DECIMAL(38,0)
#: (HUGEINT on the oracle side), so edge weights are NOT bounded by
#: int64/RANK_SCALE ≈ 9e6 — at sf1000 a nation-pair lineitem count
#: passes that bound and the old int64 product would overflow (an
#: ANSI error in Spark 4, a silent wrap in non-ANSI Spark 3).
RANK_SCALE = 1_000_000_000_000


def pagerank(
    edges: DataFrame,
    n_iter: int = 2,
    damping_pct: int = 85,
    materialize: bool = True,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, w)`` for ``n_iter``
    fixed iterations; returns ``(node, rank_scaled, rank)``.

    ``w`` must be a positive integral column. Damping is expressed as
    an integer percentage so the teleport term and the damped
    contribution are both exact integer expressions:

        rank'[v] = (RANK_SCALE * (100 - d)) DIV 100 DIV n_nodes
                 + (d * sum_u (rank[u] * w_uv DIV outw_u)) DIV 100

    Nodes with no inbound edges keep the teleport term (left join +
    coalesce); dangling rank mass is dropped, as in the classic
    formulation.
    """
    # The edge relation is referenced by nodes, outw and EVERY
    # iteration's join; if it is the output of an expensive upstream
    # aggregation (the usual case — edges are aggregated from a fact
    # table), each reference would recompute that aggregation. The
    # aggregated edge table is at most |V|^2 rows, so caching it is
    # always cheap relative to recomputing its lineage. The cache is
    # released before returning (see the localCheckpoint below), so
    # repeated calls in a long-lived session do not accumulate pinned
    # relations.
    edges = edges.cache()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # one bounded scalar (|V|), same budget class as the k-means
    # centroid collect — never O(rows)
    n_nodes = nodes.count()
    base = RANK_SCALE * (100 - damping_pct) // 100 // n_nodes
    init = RANK_SCALE // n_nodes

    outw = edges.groupBy("src").agg(F.sum("w").alias("outw"))
    e = edges.join(outw, "src").select("src", "dst", "w", "outw")

    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(F.broadcast(ranks), e.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                # Widen the product to DECIMAL(38,0) before the
                # integer division: rank approaches RANK_SCALE=1e12,
                # so an int64 product caps w at ~9.2e6 (ARITHMETIC_
                # OVERFLOW under ANSI, silent wrap otherwise). The
                # quotient itself is <= rank, so the DIV result fits
                # a long exactly; the oracle widens via HUGEINT to
                # the same integral quotient.
                F.expr("CAST(rank AS DECIMAL(38,0)) * w DIV outw").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_pct} * coalesce(contrib, 0L) DIV 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
    result = ranks.select(
        "node",
        F.col("rank").alias("rank_scaled"),
        (F.col("rank").cast("double") / F.lit(float(RANK_SCALE))).alias("rank"),
    )
    # Materialize the O(|V|) result eagerly (lineage-free, distributed
    # — never a driver collect), then release the cached edge relation
    # so callers in long-lived sessions do not leak a pinned cache per
    # invocation. The checkpointed rank blocks are O(|V|) and are
    # released by Spark's ContextCleaner when the returned DataFrame
    # is garbage collected. ``materialize=False`` returns the lazy
    # plan instead (cache stays pinned — caller releases); plan-shape
    # tests use it because localCheckpoint truncates lineage.
    if materialize:
        result = result.localCheckpoint(eager=True)
        edges.unpersist()
    return result


def pagerank_oracle_sql(edges_cte: str, n_iter: int = 2, damping_pct: int = 85) -> str:
    """DuckDB SQL computing the identical fixed-point iteration by
    unrolling ``n_iter`` chained CTEs over ``edges_cte`` (which must
    select ``src, dst, w``). Kept beside the operator so the two
    integer expression trees can be reviewed as one unit."""
    d = damping_pct
    parts = [
        f"WITH edges AS ({edges_cte}),",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),",
        "params AS (SELECT count(*) AS n FROM nodes),",
        "outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM edges GROUP BY src),",
        f"r0 AS (SELECT node, CAST({RANK_SCALE} // p.n AS BIGINT) AS rank"
        "  FROM nodes, params p),",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            # HUGEINT (int128) product mirrors the Spark side's
            # DECIMAL(38,0) widening — both floor-divide the exact
            # product, so the BIGINT quotients are identical.
            f" CAST(sum((CAST(r.rank AS HUGEINT) * e.w) // o.outw) AS BIGINT) AS contrib"
            f" FROM edges e JOIN {prev} r ON e.src = r.node"
            f" JOIN outw o ON e.src = o.src GROUP BY e.dst),"
        )
        parts.append(
            f"r{i} AS (SELECT n.node,"
            f" CAST(({RANK_SCALE} * {100 - d} // 100) // p.n"
            f" + ({d} * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank"
            f" FROM nodes n LEFT JOIN c{i} c ON n.node = c.node, params p),"
        )
        prev = f"r{i}"
    parts.append(
        f"fin AS (SELECT node, rank FROM {prev})"
        f" SELECT node, rank AS rank_scaled,"
        f" CAST(rank AS DOUBLE) / {float(RANK_SCALE)} AS rank FROM fin"
    )
    return "\n".join(parts)


def triangle_counts(edges: DataFrame, materialize: bool = True) -> DataFrame:
    """Per-node triangle counts via degree-ordered wedge closure.

    ``edges(src, dst)`` is symmetrized/deduplicated to undirected
    edges, then ORIENTED from the (degree, node)-smaller endpoint to
    the larger. Each triangle {a,b,c} is then generated exactly once:
    the wedge join pairs the two out-edges of its order-minimal vertex
    and the closure join checks the third edge in its oriented
    direction — the classic degree-ordered formulation whose wedge
    work per vertex is bounded by its ORIENTED out-degree, O(sqrt(|E|))
    on skewed graphs, instead of the raw degree a hub would explode.

    All joins are equi-joins on node keys (wedges share their center,
    closure matches the (b,c) edge); the order comparison rides along
    as a join filter, never a join condition — no cartesian, no global
    rank. Returns ``(node, n_triangles)`` for nodes in >= 1 triangle;
    counts are exact integers, so the DuckDB twin is bit-exact.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # und is referenced by deg (twice via the union), orient, and —
    # through oriented — the wedge and closure joins: ~6 references.
    # If edges is an expensive upstream join (the trade graph is a
    # 6-way lineitem chain), each reference would recompute it, so pin
    # the deduplicated |E|-row relation and release it before
    # returning (same lifecycle as pagerank's edge cache).
    und = und.cache()
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient: (deg, node) lexicographic — a total order, so exactly
    # one direction survives per undirected edge
    j = (
        und.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = j.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("du")).otherwise(F.col("dv")).alias("da"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    if materialize:
        # oriented is referenced THREE times (both wedge legs + the
        # closure); lazily each reference re-derives the und⋈deg⋈deg
        # subtree, and under AQE every one of those joins materializes
        # its broadcast side as its own job — a warm sf0.1 run showed
        # 46 jobs for one query (r19 event-log attribution). The
        # oriented relation is O(|E|) rows; one eager checkpoint makes
        # the three references scans of a computed artifact and lets
        # the edge cache release early. materialize=False keeps the
        # full lazy lineage for plan-shape tests.
        oriented = oriented.localCheckpoint(eager=True)
        und.unpersist()
    e1 = oriented.select(
        F.col("a"), F.col("b"), F.col("db").alias("db1")
    )
    e2 = oriented.select(
        F.col("a"), F.col("b").alias("c"), F.col("db").alias("db2")
    )
    # wedge at center a; order the two legs so each unordered leg pair
    # appears once, with b the (deg, node)-smaller leg
    wedges = e1.join(e2, "a").filter(
        (F.col("db1") < F.col("db2"))
        | ((F.col("db1") == F.col("db2")) & (F.col("b") < F.col("c")))
    )
    closure = oriented.select(
        F.col("a").alias("b"), F.col("b").alias("c")
    )
    tri = wedges.join(closure, ["b", "c"]).select("a", "b", "c")
    result = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # O(|V|) result: materialize eagerly (ContextCleaner frees the
    # checkpointed blocks when the returned DataFrame is garbage
    # collected; the edge cache was already released at the oriented
    # checkpoint above). materialize=False returns the lazy plan for
    # plan-shape tests (cache stays pinned — caller releases).
    if materialize:
        result = result.localCheckpoint(eager=True)
    return result
