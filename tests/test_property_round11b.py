"""Property-based tests for the round-11 second-batch primitives:
arbitrary inputs must match trivially-correct Python references.

- zorder16 vs a pure-python bit interleave (bijective on 16-bit
  pairs, monotone-in-box corner property);
- the temperature-mix integer square root vs math.isqrt across the
  float-boundary minefield (perfect squares and their neighbors);
- the HLL rank expression vs 43 - w.bit_length() over arbitrary
  42-bit fields, including 0 and powers of two.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _py_zorder16(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@_SETTINGS
def test_zorder16_matches_python_interleave(spark, pairs):
    from changedatacapture_spark.operators.layout import zorder16

    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder16(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _py_zorder16(a, b)


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=10**12),
            # the floor(sqrt) failure minefield: k^2 - 1, k^2, k^2 + 1
            st.integers(min_value=1, max_value=10**6).map(lambda k: k * k),
            st.integers(min_value=1, max_value=10**6).map(
                lambda k: k * k - 1
            ),
            st.integers(min_value=1, max_value=10**6).map(
                lambda k: k * k + 1
            ),
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@_SETTINGS
def test_corrected_isqrt_matches_math_isqrt(spark, values):
    # the PRODUCTION expression (shared helper), not a copy of it
    from changedatacapture_spark.operators.curation import isqrt_sql

    df = spark.createDataFrame([(v,) for v in values], "n_tokens long")
    isqrt = F.expr(isqrt_sql("n_tokens"))
    got = {
        r["n_tokens"]: r["s"]
        for r in df.select("n_tokens", isqrt.alias("s")).collect()
    }
    for v in values:
        assert got[v] == math.isqrt(v), v


def test_isqrt_top_of_bigint_range_no_overflow(spark):
    """The (s+1)^2 / s^2 correction probes overflow int64 for inputs in
    the top ~2.1e9 of the BIGINT range; the guarded expression must
    stay exact there instead of wrapping negative and answering off by
    one (ADVICE r11)."""
    from changedatacapture_spark.operators.curation import isqrt_sql

    s_max = 3037000499  # floor(sqrt(2^63 - 1))
    values = [
        2**63 - 1,
        s_max * s_max,  # the first input whose +1 probe would overflow
        s_max * s_max - 1,
        s_max * s_max + 1,
        (s_max * s_max + 2**63 - 1) // 2,
    ]
    df = spark.createDataFrame([(v,) for v in values], "n_tokens long")
    got = {
        r["n_tokens"]: r["s"]
        for r in df.select(
            "n_tokens", F.expr(isqrt_sql("n_tokens")).alias("s")
        ).collect()
    }
    for v in values:
        assert got[v] == math.isqrt(v), v


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=(1 << 42) - 1),
            st.integers(min_value=0, max_value=41).map(lambda k: 1 << k),
            st.integers(min_value=1, max_value=41).map(
                lambda k: (1 << k) - 1
            ),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@_SETTINGS
def test_hll_rank_expression_matches_bit_length(spark, ws):
    df = spark.createDataFrame([(w,) for w in ws], "w long")
    rank = F.expr(
        "CAST(43 - size(filter(sequence(0, 41),"
        " k -> w >= shiftleft(CAST(1 AS BIGINT), k))) AS BIGINT)"
    )
    got = {
        r["w"]: r["r"] for r in df.select("w", rank.alias("r")).collect()
    }
    for w in ws:
        assert got[w] == 43 - w.bit_length(), w
