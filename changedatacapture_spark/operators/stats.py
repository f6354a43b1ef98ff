"""Exact-portable numeric statistics: profiling and correlation.

A distributed sum of doubles is order-dependent, so naive
``stddev``/``corr`` builtins are not reproducible across engines (or
even across runs with a different partitioning). These operators use
the scaled-integer recipe the repo's other numeric surfaces use (see
``operators/similarity.py`` k-means): quantize each measure to
``floor(x * SCALE)`` as a 64-bit integer, accumulate with exact
``DECIMAL(38,0)`` sums — associative, commutative, order-independent,
so map-side partial aggregation stays enabled and the shuffle carries
one row per group — then do the final O(groups) scalar math in IEEE
doubles with an expression tree written identically in the DuckDB
oracle. At 100 TB this is a single map-side-combinable hash aggregate:
no second pass, no driver-side math, no float accumulation anywhere.

Reference parity: the reference engine exposes no statistics surface
beyond count/min/max (spark_client/src/cdc_stream.py caps at
consistency counts); this module is part of the training-data
profiling extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from changedatacapture_spark.operators.layout import fan_out_scan

#: Fixed-point scale: six decimal digits survive quantization. The
#: quantized statistics are deterministic and engine-identical; the
#: quantization error on mean/stddev is bounded by 1e-6 of the raw
#: unit, which profiling does not care about.
SCALE = 1_000_000


def _scaled(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(SCALE)).cast("long")


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _dprod(a: Column, b: Column) -> Column:
    """Exact product of two scaled-integer columns as DECIMAL(38,0).

    The operands are widened to DECIMAL(19,0) BEFORE multiplying so a
    price-magnitude measure (1e11 after scaling) squares without
    touching int64 range; the result is exact up to 38 digits."""
    return a.cast("decimal(19,0)") * b.cast("decimal(19,0)")


def numeric_profile(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group count / min / max / mean / population variance,
    stddev and coefficient of variation.

    One hash aggregate over ``(group, x, x*x)`` with decimal sums;
    the per-group finals divide exact integers in IEEE doubles —
    ``var = E[x^2] - E[x]^2`` clamped at zero against representation
    jitter (``greatest`` keeps sqrt off negative inputs identically in
    both engines).
    """
    x = _scaled(value_col)
    agg = (
        df.select(F.col(group_col), x.alias("x"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.sum(_dec(F.col("x"))).alias("sx"),
            F.sum(_dprod(F.col("x"), F.col("x"))).alias("sxx"),
        )
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / nd / F.lit(float(SCALE))
    ex2 = F.col("sxx").cast("double") / nd / F.lit(float(SCALE) * float(SCALE))
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    return agg.select(
        group_col,
        "n",
        (F.col("min_x").cast("double") / F.lit(float(SCALE))).alias("min_value"),
        (F.col("max_x").cast("double") / F.lit(float(SCALE))).alias("max_value"),
        mean.alias("mean_value"),
        var.alias("var_pop"),
        std.alias("stddev_pop"),
        # NULLIF guard: Spark returns NULL on double x/0 while DuckDB
        # (ieee_floating_point_ops default) returns Inf/NaN — guarding
        # the denominator identically in BOTH trees makes a zero-mean
        # group emit NULL in both engines instead of diverging.
        (std / F.nullif(mean, F.lit(0.0))).alias("cv"),
    )


def pearson_corr(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group Pearson correlation and population covariance of two
    measures, engine-portable.

    Accumulates the five exact moments (sx, sy, sxx, syy, sxy) as
    ``DECIMAL(38,0)`` sums of scaled integers in ONE map-side-
    combinable aggregate, then forms

        corr = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))

    in doubles. Per-row cross-products are formed in DECIMAL(19,0)
    operands (price-magnitude measures square past int64), and the
    SUMS are DECIMAL(38,0), so neither row values nor group sizes can
    overflow.
    """
    x = _scaled(x_col)
    y = _scaled(y_col)
    agg = (
        df.select(F.col(group_col), x.alias("x"), y.alias("y"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("x"))).alias("sx"),
            F.sum(_dec(F.col("y"))).alias("sy"),
            F.sum(_dprod(F.col("x"), F.col("x"))).alias("sxx"),
            F.sum(_dprod(F.col("y"), F.col("y"))).alias("syy"),
            F.sum(_dprod(F.col("x"), F.col("y"))).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov_n = F.col("sxy").cast("double") * nd - sx * sy
    varx_n = F.col("sxx").cast("double") * nd - sx * sx
    vary_n = F.col("syy").cast("double") * nd - sy * sy
    return agg.select(
        group_col,
        "n",
        (cov_n / (nd * nd) / F.lit(float(SCALE) * float(SCALE))).alias("cov_pop"),
        # NULLIF guard (see numeric_profile.cv): a constant-valued x or
        # y makes the variance product zero; Spark's x/0.0 is NULL but
        # DuckDB's is Inf/NaN, so both trees guard the denominator and
        # emit NULL for degenerate groups.
        (cov_n / F.nullif(F.sqrt(varx_n * vary_n), F.lit(0.0))).alias("corr"),
    )


def mad_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cutoff: float = 4.4478,
) -> DataFrame:
    """Robust per-group outlier profile via the median absolute
    deviation: median, MAD, and the count/rate of values whose
    absolute deviation exceeds ``cutoff * MAD`` (the default 4.4478 =
    3 / 0.6745 is the classic "3 robust sigmas").

    Exact distributed medians over VALUE-FREQUENCY HISTOGRAMS: the
    first pass is a map-side-combinable ``groupBy(g, value)`` count,
    so the shuffle carries one row per distinct value per group and
    the per-group median sort runs on distinct values, not raw rows —
    at 100 TB a heavy-duplicate measure collapses by orders of
    magnitude before anything is sorted, and no task ever buffers a
    group (the rank is a running-sum window, not a percentile
    aggregate). The deviation median reuses the same histogram (a
    second small aggregate), never the raw rows. The per-group
    median/MAD maps join back WITHOUT a broadcast hint: a forced
    broadcast is O(groups) on the driver, which a high-cardinality
    group column would blow; AQE still picks broadcast at runtime
    whenever the map side is actually small. Values quantize to
    1e6 fixed point; the <= 2 middle values average in one exact
    double operation, so the DuckDB twin is bit-identical.

    Returns ``(group, n, median_value, mad_value, n_outliers,
    outlier_ppm)``.
    """
    from pyspark.sql import Window as W

    def median_col(val: str) -> F.Column:
        """Per-group exact median ATTACHED AS A WINDOW COLUMN over a
        (g, val, cnt) histogram: the average of the values at global
        positions (n+1) DIV 2 and (n+2) DIV 2, found by running-count
        containment (a row holds position p iff cum-cnt < p <= cum).
        The whole-group sum keeps only the <= 2 middle rows' terms
        nonzero; adding the other rows' exact +0.0 terms leaves the
        IEEE double bit-identical to the old filter-then-aggregate
        form, so the oracle hash is unchanged by construction.

        Round-19 fusion (guide §2.4): the old shape computed each
        median with its own aggregate and JOINED it back (per median:
        one groupBy plus a join whose probe side was partitioned on a
        different key), costing ~5 exchanges end to end. Every window
        here partitions by ``g`` — and the (g, d) histogram re-
        aggregation below clusters on a superset of {g} — so after the
        first histogram shuffle ONE exchange on ``g`` carries the
        entire remaining plan."""
        cum = F.sum("cnt").over(W.partitionBy("g").orderBy(val))
        n = F.sum("cnt").over(W.partitionBy("g"))
        prev = cum - F.col("cnt")
        # (n + k) DIV 2 as an exact long shift — n >= 1 always
        p1 = F.shiftright(n + F.lit(1), 1)
        p2 = F.shiftright(n + F.lit(2), 1)
        h = (
            ((prev < p1) & (p1 <= cum)).cast("int")
            + ((prev < p2) & (p2 <= cum)).cast("int")
        )
        term = F.col(val).cast("double") * h
        return F.sum(term).over(W.partitionBy("g")) / F.lit(2.0)

    sc = df.select(
        F.col(group_col).alias("g"), _scaled(value_col).alias("x")
    )
    vc = sc.groupBy("g", "x").agg(F.count(F.lit(1)).alias("cnt"))
    with_med = vc.withColumn("med", median_col("x"))
    dvc = (
        with_med.select(
            "g",
            "med",
            F.abs(F.col("x").cast("double") - F.col("med")).alias("d"),
            "cnt",
        )
        .groupBy("g", "d")
        .agg(F.sum("cnt").alias("cnt"), F.min("med").alias("med"))
    )
    flagged = dvc.withColumn("mad", median_col("d"))
    return (
        flagged.groupBy("g")
        .agg(
            F.sum("cnt").alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("d") > F.lit(cutoff) * F.col("mad"), F.col("cnt")
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .select(
            F.col("g").alias(group_col),
            "n",
            (F.col("med") / F.lit(float(SCALE))).alias("median_value"),
            (F.col("mad") / F.lit(float(SCALE))).alias("mad_value"),
            "n_outliers",
            F.expr("n_outliers * 1000000 DIV n").alias("outlier_ppm"),
        )
    )


def exact_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 400,
    capacity: int = 512,
) -> DataFrame:
    """EXACT heavy hitters — every key with ``count · k > total`` —
    WITHOUT shuffling the key universe (the Misra-Gries
    candidate-then-verify pattern; mergeable-summaries form of
    Agarwal et al. 2012).

    Pass 1 builds a bounded Misra-Gries summary per partition inside
    ``mapInPandas`` (pandas ``value_counts`` per Arrow chunk, then the
    vectorized merge: sum counters, subtract the (capacity+1)-th
    largest, drop non-positives — C-speed throughout, never a per-row
    Python loop). A key with global frequency above ``total/k`` must
    be locally frequent in some partition (pigeonhole), and MG with
    ``capacity + 1 > k`` guarantees locally-frequent keys survive —
    so the candidate union (≤ capacity rows per partition) provably
    contains every true heavy hitter. Pass 2 recounts ONLY the
    candidates exactly (broadcast semi-join + map-side-combinable
    count) and applies the exact integer threshold, discarding false
    candidates — so the OUTPUT is deterministic and partitioning-
    independent even though the intermediate summaries are not.

    Why it matters at 100 TB: a plain groupBy-count shuffles one row
    per DISTINCT KEY (billions for user-id-like columns); this
    shuffles ``capacity × n_partitions`` candidate rows plus one
    filtered count over the scan.

    Output: ``key, n_rows, total_rows, share_ppm`` (exact integers).

    NULL-key contract (whole family): heavy hitters are defined over
    NON-NULL keys — NULL never equi-joins, so the broadcast-semi
    verify could never recount it and a SQL ``GROUP BY`` oracle WOULD
    emit it, silently diverging. Every entry point filters
    ``key_col IS NOT NULL`` first (totals, thresholds, and shares are
    all over the non-null row population); pair oracles with the same
    ``WHERE key IS NOT NULL``.
    """
    if capacity <= k:
        raise ValueError("capacity must exceed k for the MG guarantee")
    df = df.filter(F.col(key_col).isNotNull())
    cands = mg_candidates(df, key_col, capacity)
    return verify_heavy_hitters(df, cands, key_col, k)


def mg_candidates(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Bounded Misra-Gries candidate keys per partition (the sketch
    half of :func:`exact_heavy_hitters`, exposed so the streaming twin
    can emit per-micro-batch candidate sets). MG summaries are
    MERGEABLE in the only sense the exact pattern needs: if a key's
    count over any row SUBSET (a partition, a micro-batch cell)
    exceeds that subset's ``size/(capacity+1)``, it survives that
    subset's summary — and by averaging, a key above the GLOBAL
    threshold must exceed the local threshold in at least one subset,
    so the union of per-subset candidates provably contains every true
    heavy hitter however the rows are split. Output: ``key`` rows
    (<= capacity per partition, duplicates possible — callers
    distinct)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    # candidate schema follows the key column's ACTUAL type (long,
    # string, ...) — hardcoding 'key long' would break or silently
    # coerce non-integer keys inside mapInPandas despite the generic
    # key_col signature
    key_type = df.schema[key_col].dataType
    cand_schema = T.StructType([T.StructField("key", key_type)])
    # NULL keys are outside the heavy-hitter domain (see
    # exact_heavy_hitters): filter explicitly rather than rely on
    # value_counts dropping NaN, so the contract is visible here too
    df = df.filter(F.col(key_col).isNotNull())

    def mg_summaries(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="int64")
        for pdf in it:
            vc = pdf[key_col].value_counts()
            acc = acc.add(vc, fill_value=0).astype("int64")
            if len(acc) > capacity:
                cut = acc.nlargest(capacity + 1).iloc[-1]
                acc = (acc - cut)[lambda s: s > 0]
        # index dtype is whatever pandas inferred from the Arrow batch
        # (int64 for integral keys, object for strings) — hand it back
        # untouched; Arrow converts it to cand_schema's type
        yield pd.DataFrame({"key": acc.index.to_numpy()})

    return df.select(key_col).mapInPandas(mg_summaries, cand_schema)


def verify_heavy_hitters(
    df: DataFrame, cands: DataFrame, key_col: str, k: int
) -> DataFrame:
    """The exact half of :func:`exact_heavy_hitters`: recount ONLY
    the candidate keys (broadcast semi-join + map-side-combinable
    count) and apply the exact integer threshold — output is
    deterministic and identical to the plain groupBy definition as
    long as ``cands`` is a superset of the true heavy hitters.
    NULL keys are excluded (family contract, :func:`exact_heavy_hitters`)
    so ``total_rows`` matches what the semi-join can ever recount."""
    # rename the candidate column before joining: a caller whose
    # key_col is literally "key" would otherwise make the join
    # condition ambiguous between the two sides
    df = df.filter(F.col(key_col).isNotNull())
    cands = cands.select(F.col("key").alias("_hh_key")).distinct()
    total = df.agg(F.count(F.lit(1)).alias("total_rows"))
    counted = (
        df.join(
            F.broadcast(cands), df[key_col] == F.col("_hh_key"), "left_semi"
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * k > F.col("total_rows"))
    )
    return counted.select(
        F.col(key_col).alias("key"),
        "n_rows",
        "total_rows",
        F.expr("(n_rows * CAST(1000000 AS BIGINT)) DIV total_rows").alias(
            "share_ppm"
        ),
    )


def heavy_hitter_calibration(
    df: DataFrame, key_col: str, sample_mod: int = 100
) -> tuple[int, int]:
    """Measure the corpus's own skew for a scale-independent
    heavy-hitter threshold: deterministically hash-sample ``1 /
    sample_mod`` of the KEYS (md5 ppm bucket — every row of a sampled
    key is counted, so sampled counts are exact), and return
    ``(threshold_rows, total_rows)`` where ``threshold_rows`` is the
    busiest sampled key's exact count.

    Why: a FIXED k (count·k > total) degenerates as the corpus scales
    — dilution pushes every key below 1/k and the answer goes empty
    (measured at sf1/sf10 for k=400). Calibrating the threshold to the
    sample max keeps the answer non-degenerate at ANY scale: the
    busiest sampled key itself always qualifies, and the output is
    "every key at least as heavy as the heaviest 1%-sample key" — a
    top-of-the-skew cut, not an arbitrary constant.

    Cost: the sample groupBy shuffles ~1/sample_mod of the distinct
    keys; the two returned longs are bounded driver metadata (the same
    class as zone-map stats). If the sample is empty (tiny corpora),
    returns ``(total_rows + 1, total_rows)`` — an impossible threshold
    that yields the empty set on BOTH engines deterministically.
    NULL keys are excluded up front (the family's non-null contract,
    see :func:`exact_heavy_hitters`) — total, threshold, and shares
    are all over the non-null population.
    """
    df = df.filter(F.col(key_col).isNotNull())
    total = df.count()
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
        % sample_mod
    )
    row = (
        df.filter(bucket == 0)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("t"))
        .first()
    )
    t = row["t"]
    if t is None:
        return total + 1, total
    return int(t), total


def calibrated_heavy_hitters(
    df: DataFrame,
    key_col: str,
    sample_mod: int = 100,
) -> DataFrame:
    """EXACT heavy hitters at a skew-CALIBRATED threshold — the
    scale-realistic form of :func:`exact_heavy_hitters`: every key
    whose exact count reaches the busiest 1%-hash-sample key's count
    (:func:`heavy_hitter_calibration`). Same candidate-then-verify
    shape: Misra-Gries summaries sized from the measured threshold
    (``capacity = 2·(total div t) + 2``, which makes ``capacity + 1 >
    total / t`` — pigeonhole then guarantees every key with count ≥ t
    survives some partition summary), then one exact recount of the
    candidates. The key universe never shuffles in full; MG state is
    O(total/t), i.e. sized by how heavy "heavy" actually is in THIS
    corpus.

    Output: ``key, n_rows, total_rows, threshold_rows, share_ppm``
    (exact integers; non-empty whenever the key sample is non-empty,
    since the calibrating key itself qualifies).
    """
    t, total = heavy_hitter_calibration(df, key_col, sample_mod)
    capacity = 2 * (total // t) + 2
    cands = mg_candidates(df, key_col, capacity)
    # total is already a driver-side exact count from the calibration
    # pass — reuse it instead of a fourth full scan in the verify
    return verify_heavy_hitters_at(df, cands, key_col, t, total_rows=total)


def verify_heavy_hitters_at(
    df: DataFrame,
    cands: DataFrame,
    key_col: str,
    threshold_rows: int,
    total_rows: int | None = None,
) -> DataFrame:
    """Exact verify at an ABSOLUTE row-count threshold (the calibrated
    twin of :func:`verify_heavy_hitters`): recount only the candidate
    keys and keep those with ``n_rows >= threshold_rows``. Exact as
    long as ``cands`` is a superset of the keys at the threshold.
    ``total_rows``, when the caller already holds the exact count
    (the calibration pass computes it), skips the extra full scan.
    NULL keys excluded (family contract, :func:`exact_heavy_hitters`)."""
    df = df.filter(F.col(key_col).isNotNull())
    cands = cands.select(F.col("key").alias("_hh_key")).distinct()
    counted = (
        df.join(
            F.broadcast(cands), df[key_col] == F.col("_hh_key"), "left_semi"
        )
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    if total_rows is None:
        total = df.agg(F.count(F.lit(1)).alias("total_rows"))
        counted = counted.crossJoin(F.broadcast(total))
    else:
        counted = counted.withColumn(
            "total_rows", F.lit(int(total_rows)).cast("long")
        )
    counted = counted.filter(F.col("n_rows") >= threshold_rows)
    return counted.select(
        F.col(key_col).alias("key"),
        "n_rows",
        "total_rows",
        F.lit(threshold_rows).cast("long").alias("threshold_rows"),
        F.expr("(n_rows * CAST(1000000 AS BIGINT)) DIV total_rows").alias(
            "share_ppm"
        ),
    )


def hll_partial_registers(
    df: DataFrame,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """Per-group HyperLogLog partial registers: ``(grp, j, mj)`` with
    ``mj = max(rank)`` over the rows seen — the mergeable state of the
    sketch. Partials from ANY row subsets (partitions, micro-batches,
    days) merge by another ``max`` per ``(grp, j)``: max is
    idempotent, commutative, and associative, which is the entire HLL
    scale story (64 longs per group at any input size, no distinct
    shuffle anywhere).

    48-bit md5-derived hash; low 6 bits pick the register, the 42-bit
    remainder w contributes rank ``43 - bitlen(w)`` (leading zeros +
    1; w=0 → 43). bitlen is relational (``size(filter(...))``) — no
    float log2 at power-of-two boundaries.

    NULL keys are dropped up front (matching ``count_distinct``'s
    NULL semantics): without the filter a NULL hash would park a
    phantom rank in register ``j = NULL``, and a group consisting
    ONLY of NULL keys would reach the finalize divide with
    ``exact_keys = 0`` — where Spark's x/0.0 is NULL but DuckDB's is
    Inf, an engine divergence.
    """
    m, B = 64, 42  # p=6; 48-bit hash = 6 register bits + 42-bit field
    hv = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10
    ).cast("long")
    df = df.filter(F.col(key_col).isNotNull())
    ranks = df.select(
        F.col(group_col).alias("grp"),
        (hv % m).alias("j"),
        (hv / m).cast("long").alias("w"),
    ).withColumn(
        "r",
        F.expr(
            f"CAST({B + 1} - size(filter(sequence(0, {B - 1}),"
            " k -> w >= shiftleft(CAST(1 AS BIGINT), k))) AS BIGINT)"
        ),
    )
    return ranks.groupBy("grp", "j").agg(F.max("r").alias("mj"))


def hll_finalize(partials: DataFrame, exact: DataFrame) -> DataFrame:
    """Fold partial registers (max per ``(grp, j)``), fill the 64-slot
    register file, and compute the HLL estimate with the standard
    linear-counting small-range correction — one double division /
    log of exact integers, bit-identical on any engine. ``exact`` is
    the ``(grp, exact_keys)`` quality-loop relation the caller
    computes however it likes (batch count-distinct, or a one-shot
    batch read over a replayed stream source).

    Output per group: ``grp, m, n_zero, s_scaled, est_hll, est,
    exact_keys, err_ppm``.
    """
    m, B = 64, 42
    maxes = partials.groupBy("grp", "j").agg(F.max("mj").alias("mj"))
    allregs = (
        maxes.select("grp")
        .distinct()
        .select("grp", F.explode(F.expr(f"sequence(0, {m - 1})")).alias("j"))
    )
    regs = allregs.join(maxes, ["grp", "j"], "left").select(
        "grp", "j", F.coalesce("mj", F.lit(0)).alias("mj")
    )
    summ = regs.groupBy("grp").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {B + 1} - mj)")
        ).alias("s_scaled"),
        F.sum(F.expr("CASE WHEN mj = 0 THEN 1 ELSE 0 END")).alias("n_zero"),
    )
    # alpha_m for m=64 as ppm: 0.7213/(1+1.079/64) = 0.709341.
    # Every literal is cast to DOUBLE explicitly: bare decimal literals
    # parse as DECIMAL on both engines and the product overflows
    # DECIMAL(18) — and decimal vs double arithmetic would round
    # differently anyway.
    c = (
        "(CAST(709341 AS DOUBLE) * CAST(4096 AS DOUBLE)"
        " * CAST(8796093022208 AS DOUBLE) / CAST(1000000 AS DOUBLE))"
    )
    return (
        summ.join(exact, "grp")
        .withColumn(
            "est_hll",
            F.expr(f"CAST(floor({c} / s_scaled) AS BIGINT)"),
        )
        .withColumn(
            "est",
            F.expr(
                f"CASE WHEN est_hll <= {5 * m // 2} AND n_zero > 0 "
                f"THEN CAST(floor(CAST({m} AS DOUBLE)"
                f" * ln(CAST({m} AS DOUBLE) / n_zero)) AS BIGINT) "
                "ELSE est_hll END"
            ),
        )
        .select(
            "grp",
            F.lit(m).cast("long").alias("m"),
            "n_zero",
            "s_scaled",
            "est_hll",
            "est",
            "exact_keys",
            F.expr(
                "CAST(floor((est - exact_keys) * CAST(1000000 AS DOUBLE)"
                " / exact_keys) AS BIGINT)"
            ).alias("err_ppm"),
        )
    )


def hll_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) with
    p=6 (m=64 registers), built from engine-portable exact integer
    arithmetic so a DuckDB oracle reproduces every register and the
    estimate bit-for-bit — unlike ``approx_count_distinct``, whose
    HLL++ register layout is engine-private.

    Composition of :func:`hll_partial_registers` (mergeable per-group
    register maxes — map-side combinable, no pre-distinct) and
    :func:`hll_finalize` (register fill + harmonic estimate + linear
    counting), with the exact count alongside as the quality loop.
    The streaming twin merges the SAME partials across micro-batches
    (``events_stream_hll``), so batch == stream by construction.
    """
    partials = hll_partial_registers(df, group_col, key_col)
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count_distinct(key_col).alias("exact_keys")
    )
    return hll_finalize(partials, exact)


def welch_exprs() -> dict[str, str]:
    """Shared Welch t-test formula trees, written ONCE and used
    textually by both the Spark projection and the DuckDB oracle so
    every IEEE operation matches bit-for-bit. Inputs are the exact
    decimal moments ``n_a, sx_a, sxx_a, n_b, sx_b, sxx_b`` of
    1e6-scaled integer values."""

    def mean(g: str) -> str:
        return f"(CAST(sx_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE) / 1000000.0)"

    def var(g: str) -> str:
        ex2 = (
            f"(CAST(sxx_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE)"
            " / 1000000000000.0)"
        )
        # sample variance = population variance * n/(n-1); the (n-1)
        # denominator rides NULLIF so a degenerate 1-row cohort yields
        # NULL on BOTH engines (bare /0.0 is NULL in Spark but Inf/NaN
        # in DuckDB — the same divergence the HLL code works around)
        return (
            f"(GREATEST({ex2} - {mean(g)} * {mean(g)}, 0.0)"
            f" * CAST(n_{g} AS DOUBLE)"
            f" / NULLIF(CAST(n_{g} AS DOUBLE) - 1.0, 0.0))"
        )

    va, vb = var("a"), var("b")
    sea = f"({va} / CAST(n_a AS DOUBLE))"
    seb = f"({vb} / CAST(n_b AS DOUBLE))"
    se2 = f"({sea} + {seb})"
    t = f"(({mean('a')} - {mean('b')}) / NULLIF(sqrt({se2}), 0.0))"
    df = (
        f"(({se2} * {se2}) / NULLIF("
        f"{sea} * {sea} / NULLIF(CAST(n_a AS DOUBLE) - 1.0, 0.0)"
        f" + {seb} * {seb} / NULLIF(CAST(n_b AS DOUBLE) - 1.0, 0.0), 0.0))"
    )
    return {
        "mean_a": mean("a"),
        "mean_b": mean("b"),
        "var_a": va,
        "var_b": vb,
        "t_stat": t,
        "df_welch": df,
    }


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between two groups —
    the A/B-testing staple — from ONE map-side-combinable aggregate of
    exact decimal moments (scaled-integer sums, no float
    accumulation), finalized in IEEE doubles whose formula trees
    (:func:`welch_exprs`) are shared textually with the DuckDB
    oracle. Includes the Welch-Satterthwaite degrees of freedom and a
    two-sided 5% significance flag (|t| > 1.96 — the normal
    approximation, appropriate at the sample sizes where a
    distributed engine is in play).

    Output: one row — ``n_a, n_b, mean_a, mean_b, var_a, var_b,
    t_stat, df_welch, significant``.
    """
    x = _scaled(value_col)
    sc = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        (F.col(group_col) == group_a).cast("int").alias("ia"),
        x.alias("x"),
    )
    agg = sc.agg(
        F.sum("ia").cast("long").alias("n_a"),
        F.sum(F.expr("1 - ia")).cast("long").alias("n_b"),
        F.sum(F.expr("CASE WHEN ia = 1 THEN CAST(x AS DECIMAL(38,0)) END"))
        .cast("decimal(38,0)")
        .alias("sx_a"),
        F.sum(F.expr("CASE WHEN ia = 0 THEN CAST(x AS DECIMAL(38,0)) END"))
        .cast("decimal(38,0)")
        .alias("sx_b"),
        F.sum(
            F.expr(
                "CASE WHEN ia = 1 THEN CAST(x AS DECIMAL(19,0))"
                " * CAST(x AS DECIMAL(19,0)) END"
            )
        )
        .cast("decimal(38,0)")
        .alias("sxx_a"),
        F.sum(
            F.expr(
                "CASE WHEN ia = 0 THEN CAST(x AS DECIMAL(19,0))"
                " * CAST(x AS DECIMAL(19,0)) END"
            )
        )
        .cast("decimal(38,0)")
        .alias("sxx_b"),
    )
    e = welch_exprs()
    return agg.select(
        "n_a",
        "n_b",
        F.expr(e["mean_a"]).alias("mean_a"),
        F.expr(e["mean_b"]).alias("mean_b"),
        F.expr(e["var_a"]).alias("var_a"),
        F.expr(e["var_b"]).alias("var_b"),
        F.expr(e["t_stat"]).alias("t_stat"),
        F.expr(e["df_welch"]).alias("df_welch"),
        F.expr(f"abs({e['t_stat']}) > 1.96").alias("significant"),
    )


#: cumulative Poisson(1) pmf thresholds in ppm: a uniform md5 bucket
#: below threshold[k] means bootstrap weight <= k (weights 0..4, the
#: >=5 tail folded into 4 — probability 0.37%, negligible for CI use
#: and identical on both engines by construction)
POISSON1_PPM = (367879, 735758, 919698, 981011)


def bootstrap_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_replicates: int = 100,
    lo_rank: int = 5,
    hi_rank: int = 95,
) -> DataFrame:
    """Poisson bootstrap confidence interval for the per-group mean —
    the one-pass distributed bootstrap (each row draws an independent
    Poisson(1) weight per replicate, approximating multinomial
    resampling without materializing resamples). Weights are
    DETERMINISTIC: an md5 bucket of (replicate, ``id_col``),
    thresholded at the exact cumulative Poisson(1) ppm constants — so
    the whole CI is reproducible and oracle-exact, unlike
    rand()-based resampling, and duplicate values still resample
    independently because the hash keys on the row id.

    Scale shape: the replicate dimension multiplies the scan by
    ``n_replicates`` (explode) but every aggregate stays map-side
    combinable with one row per (group, replicate) shuffled; the CI
    rank is a window over ``n_replicates`` rows per group. At 100 TB
    you run this on a subset per the Bag-of-Little-Bootstraps recipe
    (s subsets x r replicates, same machinery) rather than 100x the
    full corpus — the operator is the BLB inner loop.

    Output per group: ``grp, n_rows, n_replicates, mean_scaled,
    ci_lo_scaled, ci_hi_scaled`` (1e6-scaled integer means; lo/hi are
    the ``lo_rank``-th / ``hi_rank``-th of the replicate means —
    a 90% percentile interval at the defaults).
    """
    from pyspark.sql import Window as W

    x = _scaled(value_col)
    # the replicate explode multiplies per-row md5 work by n_replicates;
    # a single-row-group source would run all of it on one core — fan
    # the 3-column projection out first (scan-width probe, no-op when
    # the source already splits)
    base = fan_out_scan(
        df.select(
            F.col(group_col).alias("grp"),
            x.alias("x"),
            F.col(id_col).cast("string").alias("rid"),
        )
    )
    rep = base.select(
        "grp",
        "x",
        "rid",
        F.explode(F.expr(f"sequence(0, {n_replicates - 1})")).alias("r"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("r"), F.col("rid"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    t0, t1, t2, t3 = POISSON1_PPM
    w = F.expr(
        f"CASE WHEN b < {t0} THEN 0 WHEN b < {t1} THEN 1 "
        f"WHEN b < {t2} THEN 2 WHEN b < {t3} THEN 3 ELSE 4 END"
    )
    weighted = rep.withColumn("b", bucket).withColumn("w", w)
    per_rep = weighted.groupBy("grp", "r").agg(
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * x")).alias("swx"),
        F.sum("w").cast("long").alias("sw"),
    )
    rep_means = per_rep.select(
        "grp",
        "r",
        F.expr(
            "CAST(floor(CAST(swx AS DOUBLE) / NULLIF(sw, 0)) AS BIGINT)"
        ).alias("m_scaled"),
    ).filter(F.col("m_scaled").isNotNull())
    wr = W.partitionBy("grp").orderBy("m_scaled", "r")
    ranked = rep_means.withColumn("rk", F.row_number().over(wr))
    ci = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_replicates"),
        F.max(F.expr(f"CASE WHEN rk = {lo_rank} THEN m_scaled END")).alias(
            "ci_lo_scaled"
        ),
        F.max(F.expr(f"CASE WHEN rk = {hi_rank} THEN m_scaled END")).alias(
            "ci_hi_scaled"
        ),
    )
    # double-floor, not decimal DIV: Spark's IntegralDivide on decimals
    # rounds the intermediate quotient before truncating (observed +1
    # vs DuckDB's flooring //); the double path is identical on both
    # engines, like the replicate means above
    point = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "CAST(floor(CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE)"
            " / count(1)) AS BIGINT)"
        ).alias("mean_scaled"),
    )
    return point.join(ci, "grp").select(
        "grp",
        "n_rows",
        "n_replicates",
        "mean_scaled",
        "ci_lo_scaled",
        "ci_hi_scaled",
    )


def poisson_ppm_case(lam: int, bucket_col: str = "b") -> str:
    """SQL CASE mapping a uniform ppm bucket column to a deterministic
    Poisson(``lam``) draw: thresholds are the exact cumulative pmf in
    floored ppm, tail folded once the cdf passes 1 - 1e-5. The string
    is valid in BOTH Spark SQL and DuckDB, so interpolating it into
    the operator and its oracle guarantees identical weights — the
    same trick as :data:`POISSON1_PPM`, generalized to the λ = s
    resampling rate the Bag-of-Little-Bootstraps outer loop needs.
    Computed once per process from the same IEEE doubles on both
    paths, so the constants cannot drift between engines."""
    import math

    thresholds: list[int] = []
    cum = 0.0
    k = 0
    while True:
        cum += math.exp(-lam) * lam**k / math.factorial(k)
        t = int(math.floor(cum * 1_000_000))
        if t >= 999_990:
            break
        thresholds.append(t)
        k += 1
    arms = " ".join(
        f"WHEN {bucket_col} < {t} THEN {i}" for i, t in enumerate(thresholds)
    )
    return f"CASE {arms} ELSE {len(thresholds)} END"


def blb_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_subsets: int = 5,
    n_replicates: int = 40,
    lo_rank: int = 2,
    hi_rank: int = 38,
) -> DataFrame:
    """Bag-of-Little-Bootstraps confidence interval for the per-group
    mean (Kleiner et al. 2014) — the executable 100 TB recipe
    :func:`bootstrap_ci`'s docstring names: rows hash-partition into
    ``s = n_subsets`` deterministic subsets; each subset runs ``r``
    bootstrap replicates that resample at the FULL-n rate (per-row
    weights ~ Poisson(s), since each subset holds ~n/s rows — the
    multinomial(n, subset) approximation, exactly like the inner
    loop's Poisson(1) approximates multinomial(n, corpus)); each
    subset's replicate-mean percentile bounds estimate the n-level CI
    on their own, and BLB's outer step AVERAGES the s bounds.

    Everything is deterministic and oracle-exact: subset =
    md5('s:' || id) ppm bucket mod s, weights = md5(replicate || ':'
    || id) ppm buckets thresholded at the exact cumulative Poisson(s)
    pmf (:func:`poisson_ppm_case` — identical text interpolated into
    the DuckDB oracle).

    Scale shape vs the plain bootstrap: the scan multiplies by ``r``
    (40 here) instead of the inner loop's 100, and every aggregate
    stays map-side combinable with one row per (group, subset,
    replicate) shuffled; the rank windows touch s*r rows per group.
    Cost scales with r, confidence comes from the subset average — at
    100 TB raise s, not r.

    Output per group: ``grp, n_rows, n_subsets, n_replicates,
    mean_scaled, ci_lo_scaled, ci_hi_scaled`` (lo/hi are floored
    averages over the per-subset percentile bounds; a degenerate
    subset with no surviving replicate mean at the rank drops out of
    the average on both engines).
    """
    from pyspark.sql import Window as W

    x = _scaled(value_col)
    # the replicate explode multiplies per-row md5 work by n_replicates;
    # a single-row-group source would run all of it on one core — fan
    # the 3-column projection out first (scan-width probe, no-op when
    # the source already splits)
    base = fan_out_scan(
        df.select(
            F.col(group_col).alias("grp"),
            x.alias("x"),
            F.col(id_col).cast("string").alias("rid"),
        )
    )
    subset = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("s:"), F.col("rid"))), 1, 8),
            16,
            10,
        ).cast("long")
        % n_subsets
    )
    rep = base.withColumn("s", subset).select(
        "grp",
        "x",
        "rid",
        "s",
        F.explode(F.expr(f"sequence(0, {n_replicates - 1})")).alias("r"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("r"), F.col("rid"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    w = F.expr(poisson_ppm_case(n_subsets))
    weighted = rep.withColumn("b", bucket).withColumn("w", w)
    per_rep = weighted.groupBy("grp", "s", "r").agg(
        F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * x")).alias("swx"),
        F.sum("w").cast("long").alias("sw"),
    )
    rep_means = per_rep.select(
        "grp",
        "s",
        "r",
        F.expr(
            "CAST(floor(CAST(swx AS DOUBLE) / NULLIF(sw, 0)) AS BIGINT)"
        ).alias("m_scaled"),
    ).filter(F.col("m_scaled").isNotNull())
    wr = W.partitionBy("grp", "s").orderBy("m_scaled", "r")
    per_subset = (
        rep_means.withColumn("rk", F.row_number().over(wr))
        .groupBy("grp", "s")
        .agg(
            F.max(
                F.expr(f"CASE WHEN rk = {lo_rank} THEN m_scaled END")
            ).alias("s_lo"),
            F.max(
                F.expr(f"CASE WHEN rk = {hi_rank} THEN m_scaled END")
            ).alias("s_hi"),
        )
    )
    # BLB outer step: average the per-subset bounds (double-floor for
    # engine parity, as everywhere in this module)
    ci = per_subset.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_subsets"),
        F.expr(
            "CAST(floor(CAST(sum(CAST(s_lo AS DECIMAL(38,0))) AS DOUBLE)"
            " / count(s_lo)) AS BIGINT)"
        ).alias("ci_lo_scaled"),
        F.expr(
            "CAST(floor(CAST(sum(CAST(s_hi AS DECIMAL(38,0))) AS DOUBLE)"
            " / count(s_hi)) AS BIGINT)"
        ).alias("ci_hi_scaled"),
    )
    point = base.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "CAST(floor(CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE)"
            " / count(1)) AS BIGINT)"
        ).alias("mean_scaled"),
    )
    return point.join(ci, "grp").select(
        "grp",
        "n_rows",
        "n_subsets",
        F.lit(n_replicates).cast("long").alias("n_replicates"),
        "mean_scaled",
        "ci_lo_scaled",
        "ci_hi_scaled",
    )


def qsketch_partial(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 256,
    n_cells: int = 32,
) -> DataFrame:
    """Mergeable quantile-sketch partial: per group, the ``k`` rows
    whose md5-derived 60-bit row-id hash is smallest — a deterministic
    uniform sample whose merge law is EXACT (bottom-k of a union ==
    bottom-k of the parts' bottom-k's, the KMV law), completing the
    sketch family (KMV, count-min, Bloom, Misra-Gries, HLL) with its
    most-used member.

    Why not literal KLL: KLL's compactor flips coins, so two engines
    (or two runs) build different sketches — unverifiable by a
    relational oracle. The bottom-k-by-hash sample is the
    deterministic mergeable member: same O(k) state per group, rank
    error O(sqrt(ln(1/d)/k)) instead of KLL's O(ln(1/d)/k) — the
    price of bit-exact cross-engine replay, reported per query by
    ``err_ppm`` against the exact rank.

    Scale shape: the same two-level salted pre-rank as
    ``kmv_distinct_users`` — the first row_number runs per
    (group, hv mod n_cells) cell on the spillable external sort, keeps
    k per cell, and the global re-rank touches <= n_cells*k rows per
    group. Never an unbounded per-group sort.

    Output: ``grp, v, hv`` (<= k rows per group; ``v`` is the
    1e6-scaled integer value, ``hv`` the 60-bit sample hash).

    ``id_col`` must be row-unique for the sample to be uniform; the
    windows tie-break by ``(hv, v)`` so the sketch stays deterministic
    (cross-engine bit-exact) even under id reuse or 60-bit prefix
    collisions.
    """
    from pyspark.sql.window import Window

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        _scaled(value_col).alias("v"),
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        )
        .cast("long")
        .alias("hv"),
    )
    # bottom-k windows order by (hv, v), not hv alone: if id_col is
    # not row-unique (or two ids share the 60-bit md5 prefix) an
    # hv-only row_number breaks ties nondeterministically, and the
    # bit-exact cross-engine / stream==batch contract the sketch is
    # built around would not hold. id_col SHOULD be row-unique — the
    # sample is uniform only then — but the (hv, v) order keeps the
    # sketch deterministic even when it is not.
    wc = Window.partitionBy(
        "grp", F.pmod(F.col("hv"), F.lit(n_cells))
    ).orderBy("hv", "v")
    cand = (
        base.withColumn("cell_rn", F.row_number().over(wc))
        .filter(F.col("cell_rn") <= k)
        .select("grp", "v", "hv")
    )
    w = Window.partitionBy("grp").orderBy("hv", "v")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "v", "hv")
    )


def qsketch_finalize(
    partials: DataFrame,
    base: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str | None = None,
    k: int = 256,
    quantiles: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """Fold quantile-sketch partials (``qsketch_partial`` output, any
    batch split) into per-group quantile estimates plus the exact-rank
    quality loop.

    Merge = one more bottom-k re-rank over <= batches*k rows per
    group (the windows below touch only sketch-sized relations, never
    the corpus). Estimate for quantile q = the sample value at rank
    ``ceil(q*m/100)`` in (value, hv) order — deterministic, both
    engines. The quality loop then measures the TRUE rank of each
    estimate with one map-side-combinable aggregate over the base
    (count of v <= est_v; no per-group sort anywhere): ``err_ppm`` is
    the sketch's rank error in parts-per-million, the metric the
    epsilon-approximate-quantile guarantee is stated in. The ppm
    division bounds n at ~9.2e12 rows per group (int64 product), the
    repo's documented ppm range.

    Output: ``grp, q_pct, n_rows, m_sample, est_v, est_rank_ppm,
    target_ppm, err_ppm`` — all exact integers, hash-exact vs the
    DuckDB replay.
    """
    from pyspark.sql.window import Window

    # (hv, v) order for the same determinism reason as qsketch_partial
    w = Window.partitionBy("grp").orderBy("hv", "v")
    merged = (
        partials.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "v", "hv")
    )
    m = merged.groupBy("grp").agg(F.count(F.lit(1)).alias("m_sample"))
    wv = Window.partitionBy("grp").orderBy("v", "hv")
    sr = merged.withColumn("sr", F.row_number().over(wv))
    qdf = m.select(
        "grp",
        "m_sample",
        F.explode(
            F.array(*[F.lit(q) for q in quantiles])
        ).alias("q_pct"),
    ).withColumn(
        "target_rank",
        F.expr("(q_pct * m_sample + 99) DIV 100"),
    )
    est = (
        qdf.join(sr, ["grp"])
        .filter(F.col("sr") == F.col("target_rank"))
        .select("grp", "q_pct", "m_sample", F.col("v").alias("est_v"))
    )
    # the exact-rank base must apply the SAME row filter the sample
    # did (value AND sample-id non-null) — a null-id row can never
    # enter the sample, so counting it here would skew est_rank_ppm
    # relative to the oracle and the streaming twin
    cond = F.col(value_col).isNotNull()
    if id_col is not None:
        cond = cond & F.col(id_col).isNotNull()
    b = base.filter(cond).select(
        F.col(group_col).alias("grp"), _scaled(value_col).alias("bv")
    )
    n = b.groupBy("grp").agg(F.count(F.lit(1)).alias("n_rows"))
    cum = (
        b.join(F.broadcast(est), "grp")
        .groupBy("grp", "q_pct", "m_sample", "est_v")
        .agg(
            F.sum(
                F.when(F.col("bv") <= F.col("est_v"), 1).otherwise(0)
            )
            .cast("long")
            .alias("c")
        )
    )
    return cum.join(n, "grp").select(
        "grp",
        F.col("q_pct").cast("long").alias("q_pct"),
        "n_rows",
        "m_sample",
        "est_v",
        F.expr("c * 1000000 DIV n_rows").alias("est_rank_ppm"),
        F.expr("CAST(q_pct * 10000 AS BIGINT)").alias("target_ppm"),
        F.expr("c * 1000000 DIV n_rows - q_pct * 10000").alias("err_ppm"),
    )


def quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 256,
    quantiles: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """One-pass per-group quantile sketch with exact-rank error
    report: :func:`qsketch_partial` -> :func:`qsketch_finalize` on a
    single batch. See those for the construction, merge law, and
    scale shape."""
    return qsketch_finalize(
        qsketch_partial(df, group_col, value_col, id_col, k),
        df,
        group_col,
        value_col,
        id_col,
        k,
        quantiles,
    )
