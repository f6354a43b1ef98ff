"""Query registry: every implemented operator as a (Spark, oracle-SQL) pair.

Each entry is a named query from SURVEY.md §2.12 (the reference's CDC
semantics) or the engine's analytics / data-pipeline extension surface.
The Spark side is built from the operator library; the oracle side is
ANSI SQL that DuckDB runs on the same parquet tables. Both must produce
identical (bit-exact) results — numeric aggregates therefore use
decimal arithmetic with explicit final casts, never float sums.

Conventions:
- every computed column is aliased identically in both engines;
- queries with ``LIMIT`` carry a total deterministic ``ORDER BY``;
- doubles are only ever *passed through* (exact) or cast to decimals —
  never accumulated in floating point.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from changedatacapture_spark.operators import (
    apply_changes,
    compact_latest,
    derive_key,
    op_split,
    prune_columns,
    window_compact,
)
from changedatacapture_spark.sources.changelog import CHANGELOG_SQL, events_as_changelog
from changedatacapture_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

SPARK_QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}

_CHANGELOG_CTE = f"WITH changelog AS ({CHANGELOG_SQL})"


def _register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_changelog(load_table(spark, "events", sf_dir))


# ---------------------------------------------------------------------------
# CDC core (SURVEY §2.12)
# ---------------------------------------------------------------------------

@_register(
    "cdc_compact",
    f"""{_CHANGELOG_CTE},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
      FROM changelog)
    SELECT key_id, seq, op, ts, value, props FROM ranked WHERE rn = 1
    """,
)
def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-COMPACT: latest event per key, deterministic (ts, seq) order."""
    log = _changelog(spark, sf_dir)
    return compact_latest(log, ["key_id"], ["ts", "seq"]).select(
        "key_id", "seq", "op", "ts", "value", "props"
    )


@_register(
    "cdc_apply",
    f"""{_CHANGELOG_CTE},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
      FROM changelog)
    SELECT key_id, seq, op, ts, value, props FROM ranked WHERE rn = 1 AND op <> 'd'
    """,
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-APPLY: final materialized table state from the change log."""
    log = _changelog(spark, sf_dir)
    return apply_changes(log, ["key_id"], ["ts", "seq"]).select(
        "key_id", "seq", "op", "ts", "value", "props"
    )


@_register(
    "cdc_opsplit",
    f"""{_CHANGELOG_CTE}
    SELECT op, count(*) AS n_events FROM changelog GROUP BY op
    """,
)
def q_cdc_opsplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-OPSPLIT: events per operation class (c/u/d)."""
    return op_split(_changelog(spark, sf_dir))


@_register(
    "cdc_keyrule",
    f"""{_CHANGELOG_CTE},
    images AS (
      SELECT seq, op,
             CASE WHEN op = 'c' THEN NULL ELSE key_id END AS before_key,
             CASE WHEN op = 'd' THEN NULL ELSE key_id END AS after_key
      FROM changelog)
    SELECT seq, op,
           CASE WHEN op = 'd' THEN before_key
                WHEN after_key IS NOT NULL THEN after_key
                ELSE before_key END AS key_value
    FROM images
    """,
)
def q_cdc_keyrule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-KEYRULE: delete -> before-image key, else after-image key."""
    log = _changelog(spark, sf_dir)
    images = log.select(
        "seq",
        "op",
        F.when(F.col("op") == "c", F.lit(None).cast("long"))
        .otherwise(F.col("key_id"))
        .alias("before_key"),
        F.when(F.col("op") == "d", F.lit(None).cast("long"))
        .otherwise(F.col("key_id"))
        .alias("after_key"),
    )
    return images.select(
        "seq",
        "op",
        derive_key(F.col("op"), F.col("before_key"), F.col("after_key")).alias(
            "key_value"
        ),
    )


@_register(
    "cdc_window_compact",
    f"""{_CHANGELOG_CTE},
    ranked AS (
      SELECT date_trunc('hour', ts) AS window_start,
             date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
             key_id, seq, op, value,
             row_number() OVER (PARTITION BY date_trunc('hour', ts), key_id
                                ORDER BY ts DESC, seq DESC) AS rn
      FROM changelog)
    SELECT window_start, window_end, key_id, seq, op, value FROM ranked WHERE rn = 1
    """,
)
def q_cdc_window_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-WINDOW: latest event per key per tumbling 1-hour window."""
    log = _changelog(spark, sf_dir)
    return window_compact(
        log, ["key_id"], ["ts", "seq"], event_time_col="ts", window_duration="1 hour"
    ).select("window_start", "window_end", "key_id", "seq", "op", "value")


@_register(
    "cdc_prune",
    "SELECT user_id, event_type, value FROM events",
)
def q_cdc_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-PRUNE: column whitelist projection, key always retained."""
    ev = load_table(spark, "events", sf_dir)
    return prune_columns(ev, ["event_type", "value"], key_col="user_id")


@_register(
    "cdc_flatten",
    f"""{_CHANGELOG_CTE}
    SELECT seq,
           op AS operation,
           epoch_ms(ts) AS timestamp,
           CASE WHEN op = 'c' THEN NULL ELSE key_id END AS before_key_id,
           CASE WHEN op = 'c' THEN NULL ELSE value END AS before_value,
           CASE WHEN op = 'd' THEN NULL ELSE key_id END AS after_key_id,
           CASE WHEN op = 'd' THEN NULL ELSE value END AS after_value
    FROM changelog
    """,
)
def q_cdc_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-FLATTEN: Debezium envelope JSON -> flat before_*/after_* columns.

    Builds a real JSON envelope per event, parses it once with
    ``from_json`` against the typed envelope schema (P2), then projects
    the images flat (P5) — the full reference parse path, single scan.
    """
    from changedatacapture_spark.schema import debezium_envelope_schema
    from changedatacapture_spark.operators.cdc import flatten_envelope
    from pyspark.sql import types as T

    log = _changelog(spark, sf_dir)
    record = T.StructType(
        [
            T.StructField("key_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    image = F.struct(F.col("key_id"), F.col("value"))
    envelope_json = F.to_json(
        F.struct(
            F.struct(
                F.when(F.col("op") != "c", image).alias("before"),
                F.when(F.col("op") != "d", image).alias("after"),
                F.col("op").alias("op"),
                F.unix_millis(F.col("ts")).alias("ts_ms"),
            ).alias("payload")
        )
    )
    raw = log.select("seq", envelope_json.alias("value"))
    parsed = raw.select(
        "seq", F.from_json("value", debezium_envelope_schema(record)).alias("data")
    )
    flat = flatten_envelope(
        parsed.select("seq", "data.payload"),
        record_fields=["key_id", "value"],
        extra_cols=["seq"],
    )
    return flat.select(
        "seq",
        "operation",
        "timestamp",
        "before_key_id",
        "before_value",
        "after_key_id",
        "after_value",
    )


@_register(
    "cdc_audit",
    f"""{_CHANGELOG_CTE},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
      FROM changelog)
    SELECT key_id,
           CASE WHEN op = 'c' THEN
                  'INSERT INTO target (key_id, props) VALUES (' || CAST(key_id AS VARCHAR)
                  || ', ''' || replace(props, '''', '''''') || ''')'
                WHEN op = 'd' THEN
                  'DELETE FROM target WHERE key_id = ' || CAST(key_id AS VARCHAR)
                ELSE
                  'UPDATE target SET props = ''' || replace(props, '''', '''''')
                  || ''' WHERE key_id = ' || CAST(key_id AS VARCHAR)
           END AS stmt
    FROM ranked WHERE rn = 1
    """,
)
def q_cdc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-AUDIT: reconstructed SQL statements for the net change per key.

    The reference builds these strings in driver-side Python loops
    (archive/streaming_from_kafka_to_minio_2.py:242-357); here they are
    column expressions — distributed, codegen'd.
    """
    log = _changelog(spark, sf_dir)
    latest = compact_latest(log, ["key_id"], ["ts", "seq"])
    key_s = F.col("key_id").cast("string")
    props_esc = F.replace(F.col("props"), F.lit("'"), F.lit("''"))
    stmt = (
        F.when(
            F.col("op") == "c",
            F.concat(
                F.lit("INSERT INTO target (key_id, props) VALUES ("),
                key_s,
                F.lit(", '"),
                props_esc,
                F.lit("')"),
            ),
        )
        .when(
            F.col("op") == "d",
            F.concat(F.lit("DELETE FROM target WHERE key_id = "), key_s),
        )
        .otherwise(
            F.concat(
                F.lit("UPDATE target SET props = '"),
                props_esc,
                F.lit("' WHERE key_id = "),
                key_s,
            )
        )
    )
    return latest.select("key_id", stmt.alias("stmt"))


@_register(
    "cdc_validate",
    f"""{_CHANGELOG_CTE},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY key_id ORDER BY ts DESC, seq DESC) AS rn
      FROM changelog),
    state_a AS (
      SELECT key_id, seq, value FROM ranked WHERE rn = 1 AND op <> 'd'),
    maxed AS (
      SELECT key_id, max(row(ts, seq)) AS m FROM changelog GROUP BY key_id),
    state_b AS (
      SELECT c.key_id, c.seq, c.value
      FROM changelog c JOIN maxed t
        ON c.key_id = t.key_id AND row(c.ts, c.seq) = t.m
      WHERE c.op <> 'd')
    SELECT
      (SELECT count(*) FROM state_b b WHERE b.key_id NOT IN (SELECT key_id FROM state_a)) AS n_missing,
      (SELECT count(*) FROM state_a a WHERE a.key_id NOT IN (SELECT key_id FROM state_b)) AS n_extra,
      (SELECT count(*) FROM state_a a JOIN state_b b ON a.key_id = b.key_id
         WHERE a.value IS DISTINCT FROM b.value) AS n_mismatch
    """,
)
def q_cdc_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-VALIDATE: differential consistency check between two independent
    materializations (aggregation-based vs window-based) of the same log.

    Spark-native port of test/validate_cdc_data.py:130-188 — key-set
    diff both directions plus cell comparison over common keys — done
    with anti/inner joins instead of pandas.
    """
    from pyspark.sql import Window as W

    log = _changelog(spark, sf_dir).cache()
    state_a = apply_changes(log, ["key_id"], ["ts", "seq"]).select(
        "key_id", "seq", "value"
    )
    w = W.partitionBy("key_id").orderBy(F.col("ts").desc(), F.col("seq").desc())
    state_b = (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "d"))
        .select("key_id", "seq", "value")
    )
    missing = state_b.join(state_a, "key_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_missing")
    )
    extra = state_a.join(state_b, "key_id", "left_anti").agg(
        F.count(F.lit(1)).alias("n_extra")
    )
    mismatch = (
        state_a.alias("a")
        .join(state_b.alias("b"), "key_id")
        .filter(~F.col("a.value").eqNullSafe(F.col("b.value")))
        .agg(F.count(F.lit(1)).alias("n_mismatch"))
    )
    return missing.crossJoin(extra).crossJoin(mismatch)


@_register(
    "cdc_typemap",
    """
    SELECT event_id AS seq,
           CAST(json_extract_string(props, '$.k') AS INTEGER)  AS k_int32,
           CAST(json_extract_string(props, '$.k') AS BIGINT)   AS k_int64,
           CAST(json_extract_string(props, '$.k') AS DOUBLE)   AS k_double,
           json_extract_string(props, '$.k')                   AS k_string,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0 AS k_bool,
           CAST(value AS DECIMAL(18, 2))                       AS value_dec
    FROM events
    """,
)
def q_cdc_typemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-TYPEMAP: Debezium logical-type normalization of an event sample
    (int32/int64/double/string/boolean/decimal — SURVEY §1.2)."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        F.col("event_id").alias("seq"),
        k.cast("int").alias("k_int32"),
        k.cast("long").alias("k_int64"),
        k.cast("double").alias("k_double"),
        k.alias("k_string"),
        (k.cast("long") % 2 == 0).alias("k_bool"),
        F.col("value").cast("decimal(18,2)").alias("value_dec"),
    )

# ---------------------------------------------------------------------------
# Analytics over materialized tables (the "queryable with ordinary Spark SQL"
# half of the reference's value proposition, scaled to TPC-H-ish workloads).
# All money aggregates use exact decimal arithmetic with explicit final
# casts so results are engine-independent.
# ---------------------------------------------------------------------------

_DEC = "decimal(20,2)"


@_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DECIMAL(38,2)) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))) AS DECIMAL(38,2)) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))
                    * CAST(1 - l_discount AS DECIMAL(20,2))) AS DECIMAL(38,4)) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(20,2))
                    * CAST(1 - l_discount AS DECIMAL(20,2))
                    * CAST(1 + l_tax AS DECIMAL(20,2))) AS DECIMAL(38,6)) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan + filter + 2-key hash agg.

    The filter and the 7-column projection both push down to the
    parquet scan; aggregation is partial map-side.
    """
    li = load_table(spark, "lineitem", sf_dir)
    qty = F.col("l_quantity").cast(_DEC)
    price = F.col("l_extendedprice").cast(_DEC)
    disc = (F.lit(1) - F.col("l_discount")).cast(_DEC)
    tax = (F.lit(1) + F.col("l_tax")).cast(_DEC)
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(price).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(price * disc).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(price * disc * tax).cast("decimal(38,6)").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "q3_top_revenue_orders",
    """
    SELECT o.o_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * CAST(1 - l.l_discount AS DECIMAL(20,2))) AS DECIMAL(38,4)) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: dim-filtered 3-way join + top-k by revenue.

    ``customer`` is broadcast (small dim) so the orders/lineitem join is
    the only shuffle; the top-k is a TakeOrdered, not a full sort.
    """
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    rev = (
        F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_register(
    "q5_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(20,2))
                    * CAST(1 - l.l_discount AS DECIMAL(20,2))) AS DECIMAL(38,4)) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 5-way star join, dims broadcast, fact shuffled once."""
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    rev = (
        F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount")).cast(_DEC)
    )
    dims = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
    )


@_register(
    "q_topk_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey)
    WHERE rk <= 3
    """,
)
def q_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by total price per market segment (ranking window)."""
    from pyspark.sql import Window as W

    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@_register(
    "q_rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DECIMAL(38,2)) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (grouping-sets family) over lineitem."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).cast("decimal(38,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "q_distinct_parts_per_flag",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi distinct-aggregate (expand-based plan in Spark)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@_register(
    "q_anti_semi_join",
    """
    SELECT
      (SELECT count(*) FROM customer c
        WHERE c.c_custkey IN (SELECT o_custkey FROM orders)) AS n_with_orders,
      (SELECT count(*) FROM customer c
        WHERE c.c_custkey NOT IN (SELECT o_custkey FROM orders)) AS n_without_orders
    """,
)
def q_anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence joins: customers with / without orders (semi + anti)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_custkey")
    with_o = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n_with_orders")
    )
    without_o = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_without_orders")
    )
    return with_o.crossJoin(without_o)

# ---------------------------------------------------------------------------
# Training-data pipeline operators: dedup, text analysis, similarity.
# MinHash uses min(md5(shingle||seed)) — md5 hex strings of equal length
# order like their numeric values, so the signature is engine-portable.
# ---------------------------------------------------------------------------


@_register(
    "dedup_exact",
    """
    SELECT md5(text) AS fp, count(*) AS n_copies, min(doc_id) AS canonical_id
    FROM documents GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: duplicate groups by content hash (map-side combinable)."""
    from changedatacapture_spark.operators.dedup import exact_dedup

    return exact_dedup(load_table(spark, "documents", sf_dir))


@_register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint over normalized text (lower/strip/squeeze)."""
    from changedatacapture_spark.operators.text import fingerprint

    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@_register(
    "text_stats",
    """
    SELECT doc_id,
           length(text) AS n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS n_punct
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics (all JVM built-ins, no UDFs)."""
    from changedatacapture_spark.operators.text import text_stats

    return text_stats(load_table(spark, "documents", sf_dir))


@_register(
    "text_lang_profile",
    """
    SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS total_chars,
           min(doc_id) AS first_doc
    FROM documents GROUP BY lang, source
    """,
)
def q_text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by language and source."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@_register(
    "text_token_topk",
    """
    SELECT token, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
)
def q_text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 tokens (explode → count → top-k)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


_MINHASH_ORACLE = """
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i
      FROM documents),
    shingled AS (
      SELECT doc_id, seed,
             min(md5(substr(text, i, 5) || '#' || seed)) AS mh
      FROM pos, range(0, 4) s(seed)
      GROUP BY doc_id, seed)
    SELECT doc_id,
           min(CASE WHEN seed = 0 THEN mh END) AS mh0,
           min(CASE WHEN seed = 1 THEN mh END) AS mh1,
           min(CASE WHEN seed = 2 THEN mh END) AS mh2,
           min(CASE WHEN seed = 3 THEN mh END) AS mh3
    FROM shingled GROUP BY doc_id
"""


@_register("dedup_minhash_signatures", _MINHASH_ORACLE)
def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=4, 5-char shingles), engine-portable md5 form."""
    from changedatacapture_spark.operators.dedup import minhash_signatures

    return minhash_signatures(
        load_table(spark, "documents", sf_dir), n_hashes=4, k=5
    )


@_register(
    "dedup_minhash_pairs",
    f"""
    WITH sigs AS ({_MINHASH_ORACLE}),
    banded AS (
      SELECT doc_id, 0 AS band_idx, md5(mh0 || '|' || mh1) AS band_hash FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band_idx, md5(mh2 || '|' || mh3) AS band_hash FROM sigs)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    """,
)
def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-duplicate candidate pairs (2 bands × 2 rows)."""
    from changedatacapture_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(load_table(spark, "documents", sf_dir), n_hashes=4, k=5)
    return lsh_candidate_pairs(sigs, n_hashes=4, bands=2)


@_register(
    "dedup_ngram_jaccard",
    """
    WITH ex AS (
      SELECT DISTINCT doc_id, substr(text, i, 5) AS sh
      FROM (SELECT doc_id, text,
                   unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i
            FROM documents)),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
    pairs AS (
      SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
      FROM documents d1 JOIN documents d2
        ON d2.doc_id = d1.doc_id + 1 AND d1.doc_id % 10 = 0),
    inter0 AS (
      SELECT p.doc_a, p.doc_b, count(*) AS n_inter
      FROM pairs p JOIN ex a ON a.doc_id = p.doc_a
                  JOIN ex b ON b.doc_id = p.doc_b AND b.sh = a.sh
      GROUP BY p.doc_a, p.doc_b),
    inter AS (
      SELECT p.doc_a, p.doc_b, coalesce(i.n_inter, 0) AS n_inter
      FROM pairs p LEFT JOIN inter0 i
        ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b)
    SELECT i.doc_a, i.doc_b, i.n_inter,
           sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(floor(i.n_inter * 100 / (sa.n_sh + sb.n_sh - i.n_inter)) AS BIGINT)
             AS jaccard_pct
    FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
                 JOIN sizes sb ON sb.doc_id = i.doc_b
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard over a deterministic sample of doc pairs
    (every 10th doc paired with its successor)."""
    from changedatacapture_spark.operators.dedup import ngram_jaccard

    docs = load_table(spark, "documents", sf_dir)
    d1 = docs.select(F.col("doc_id").alias("doc_a"))
    d2 = docs.select(F.col("doc_id").alias("doc_b"))
    pairs = d1.filter(F.col("doc_a") % 10 == 0).join(
        d2, F.col("doc_b") == F.col("doc_a") + 1
    )
    return ngram_jaccard(docs, pairs)


@_register(
    "embedding_profile",
    """
    SELECT label, count(*) AS n_vecs, len(any_value(embedding)) AS dim,
           min(vec_id) AS first_vec
    FROM embeddings GROUP BY label
    """,
)
def q_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding corpus profile: count / dimensionality per label."""
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.size(F.any_value("embedding")).alias("dim"),
        F.min("vec_id").alias("first_vec"),
    )

# ---------------------------------------------------------------------------
# Similarity search. Dot products accumulate in float64 in index order in
# BOTH engines (Spark: aggregate-fold; DuckDB: list_zip->list_sum), so the
# scaled-integer scores are bit-identical; ties rank by neighbor id.
# ---------------------------------------------------------------------------

_COS_SQL = """
  list_sum(list_transform(list_zip({a}, {b}),
           z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
"""


def _cos_pair_sql(a: str, b: str) -> str:
    dp = _COS_SQL.format(a=a, b=b)
    na = _COS_SQL.format(a=a, b=a)
    nb = _COS_SQL.format(a=b, b=b)
    return f"({dp}) / (sqrt({na}) * sqrt({nb}))"


@_register(
    "knn_brute_topk",
    f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT p.probe_id, c.vec_id AS neighbor_id,
             CAST(floor(({_cos_pair_sql('p.pv', 'c.embedding')}) * 1000000) AS BIGINT)
               AS score_scaled
      FROM probes p, embeddings c
      WHERE c.vec_id <> p.probe_id)
    SELECT probe_id, neighbor_id, score_scaled,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY score_scaled DESC, neighbor_id) AS rk
    FROM scored
    QUALIFY rk <= 5
    """,
)
def q_knn_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as probes.

    Probe set broadcast; corpus scanned once; scores are scaled
    integers so ranking is engine-exact.
    """
    from changedatacapture_spark.operators.similarity import cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    probes = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, probes, k=5)


def _lsh_bucket_sql(vec: str, n_planes: int = 4, dim: int = 64) -> str:
    """DuckDB expression for the engine's LCG hyperplane bucket id —
    generated from the same constants as operators/similarity.py."""
    from changedatacapture_spark.operators.similarity import _lcg_plane

    parts = []
    for p in range(n_planes):
        terms = " + ".join(
            f"CAST({vec}[{d + 1}] AS DOUBLE) * ({_lcg_plane(p, d)!r})"
            for d in range(dim)
        )
        parts.append(f"(CASE WHEN ({terms}) >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(parts)


@_register(
    "knn_lsh_topk",
    f"""
    WITH bucketed AS (
      SELECT vec_id, embedding,
             {_lsh_bucket_sql('embedding')} AS bucket
      FROM embeddings),
    probes AS (
      SELECT vec_id AS probe_id, embedding AS pv, bucket
      FROM bucketed WHERE vec_id < 10),
    scored AS (
      SELECT p.probe_id, c.vec_id AS neighbor_id,
             CAST(floor(({_cos_pair_sql('p.pv', 'c.embedding')}) * 1000000) AS BIGINT)
               AS score_scaled
      FROM probes p JOIN bucketed c ON c.bucket = p.bucket
      WHERE c.vec_id <> p.probe_id)
    SELECT probe_id, neighbor_id, score_scaled,
           row_number() OVER (PARTITION BY probe_id
                              ORDER BY score_scaled DESC, neighbor_id) AS rk
    FROM scored
    QUALIFY rk <= 5
    """,
)
def q_knn_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5: candidates limited to the probe's LSH bucket
    (4 deterministic LCG hyperplanes) — the bucket equi-join replaces
    the cross product at scale."""
    from changedatacapture_spark.operators.similarity import cosine_topk_lsh

    emb = load_table(spark, "embeddings", sf_dir)
    probes = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_lsh(emb, probes, k=5, n_planes=4, dim=64)

# ---------------------------------------------------------------------------
# Mongo/BSON path: extended-JSON normalization as column expressions
# (replaces the reference's Python UDF, cdc_stream.py:728-739).
# The oracle builds the same wrapped documents and unwraps them with
# DuckDB JSON functions — both engines must land on identical scalars.
# ---------------------------------------------------------------------------


@_register(
    "bson_normalize",
    """
    WITH docs AS (
      SELECT event_id,
             '{"_id": {"$numberLong": "' || CAST(user_id AS VARCHAR) || '"}, '
             || '"when": {"$date": ' || CAST(epoch_ms(ts) AS VARCHAR) || '}, '
             || '"kind": "' || event_type || '"}' AS doc
      FROM events)
    SELECT event_id,
           json_extract_string(doc, '$._id."$numberLong"') AS _id,
           json_extract_string(doc, '$.when."$date"') AS when_ms,
           json_extract_string(doc, '$.kind') AS kind
    FROM docs
    """,
)
def q_bson_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build BSON extended-JSON documents from events, then normalize
    them with the engine's expression-based unwrapper (no UDF)."""
    from changedatacapture_spark.schema.bson import document_to_map

    ev = load_table(spark, "events", sf_dir)
    doc = F.concat(
        F.lit('{"_id": {"$numberLong": "'),
        F.col("user_id").cast("string"),
        F.lit('"}, "when": {"$date": '),
        F.unix_millis("ts").cast("string"),
        F.lit('}, "kind": "'),
        F.col("event_type"),
        F.lit('"}'),
    )
    m = document_to_map(doc)
    return ev.select(
        "event_id",
        F.element_at(m, "_id").alias("_id"),
        F.element_at(m, "when").alias("when_ms"),
        F.element_at(m, "kind").alias("kind"),
    )
