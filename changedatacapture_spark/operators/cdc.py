"""Core CDC operators: compaction, key derivation, op split, apply.

These re-express the reference's per-batch pipeline
(``spark_client/src/cdc_stream.py:545-708``) as pure
DataFrame→DataFrame transforms, independent of any particular source
(Kafka micro-batch, file batch, or a whole historical change log).

Scale notes (the reason these shapes were chosen):

- ``compact_latest`` is a hash aggregation with ``max_by`` over a
  packed struct. Spark plans it as partial-aggregate (map side) →
  shuffle by key → final aggregate, so the shuffle carries at most one
  row per key per input partition — on a 100 TB change log with hot
  keys this is the difference between shuffling the log and shuffling
  the distinct-key set. A ``row_number()`` window formulation would
  shuffle *every* event and sort each partition; we deliberately avoid
  it in the hot path.
- Ordering is by an explicit struct of order columns, e.g.
  ``(ts_ms, seq)``. Struct comparison is lexicographic, which gives a
  total, deterministic order — fixing the reference's
  same-millisecond nondeterminism (cdc_stream.py:599, SURVEY §7.6.1).
- No driver-side actions: no ``count()``/``collect()``/``first()``
  inside operators (the reference runs ≥6 extra jobs per batch —
  SURVEY §4 "eager actions").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OP_CREATE = "c"
OP_UPDATE = "u"
OP_DELETE = "d"
OP_READ = "r"  # snapshot read (initial load)
UPSERT_OPS = (OP_CREATE, OP_UPDATE, OP_READ)


def _cols(names: Sequence[str]) -> list[Column]:
    return [F.col(c) for c in names]


def compact_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Latest event per key — the engine's core operator (A1).

    Equivalent to the reference's
    ``groupBy(key).agg(max_by(struct(cols), ts))`` + re-flatten
    (cdc_stream.py:598-616), but ordered by the full ``order_cols``
    struct so ties are deterministic.

    Output columns: ``key_cols`` then ``payload_cols`` (default: every
    non-key column, original order). One row per distinct key.
    """
    keyset = set(key_cols)
    payload = list(payload_cols) if payload_cols is not None else [
        c for c in df.columns if c not in keyset
    ]
    packed = F.struct(*_cols(payload))
    ordering = F.struct(*_cols(order_cols))
    latest = df.groupBy(*_cols(key_cols)).agg(
        F.max_by(packed, ordering).alias("_latest")
    )
    return latest.select(
        *_cols(key_cols),
        *[F.col(f"_latest.{c}").alias(c) for c in payload],
    )


def apply_changes(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Materialize the final state of a table from its change log.

    Semantics of the reference's per-batch MERGE pipeline
    (cdc_stream.py:629-691) applied to an entire log at once: for each
    key, the latest event wins; if that event is a delete the key is
    absent from the result. c/u/r are all upserts (full row image in
    ``after``), so compact-then-filter is exactly merge-in-order.
    """
    payload = list(payload_cols) if payload_cols is not None else [
        c for c in df.columns if c not in set(key_cols)
    ]
    if op_col not in payload:
        payload = [op_col, *payload]
    compacted = compact_latest(df, key_cols, order_cols, payload)
    return compacted.filter(F.col(op_col) != OP_DELETE)


def derive_key(
    op: Column,
    before_key: Column,
    after_key: Column,
) -> Column:
    """Key-derivation rule (P9, cdc_stream.py:592-596).

    Deletes carry the key only in the ``before`` image; everything
    else in ``after``. Falls back to ``before`` when ``after`` is
    null (tombstone-adjacent events).
    """
    return (
        F.when(op == OP_DELETE, before_key)
        .when(after_key.isNotNull(), after_key)
        .otherwise(before_key)
    )


def op_split(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Rows per operation class (P8 / Q-OPSPLIT).

    The reference filters the batch three times (c / c,u / d —
    cdc_stream.py:630-676); a single grouped count is one pass and is
    what the engine's metrics use.
    """
    return df.groupBy(op_col).agg(F.count(F.lit(1)).alias("n_events"))


def flatten_envelope(
    parsed: DataFrame,
    record_fields: Sequence[str],
    envelope_col: str = "payload",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Envelope flattening (P5, cdc_stream.py:281-304).

    ``parsed`` has a struct column ``payload`` with ``before``/
    ``after`` row images; output is
    ``operation, timestamp, before_<f>..., after_<f>...`` — the
    reference's flat layout. Pure projection: Catalyst prunes any
    field a downstream query doesn't touch all the way into the scan.
    """
    p = envelope_col
    return parsed.select(
        *_cols(extra_cols),
        F.col(f"{p}.op").alias("operation"),
        F.col(f"{p}.ts_ms").alias("timestamp"),
        *[F.col(f"{p}.before.{f}").alias(f"before_{f}") for f in record_fields],
        *[F.col(f"{p}.after.{f}").alias(f"after_{f}") for f in record_fields],
    )


def prune_columns(
    df: DataFrame,
    columns_to_save: Sequence[str],
    key_col: str,
) -> DataFrame:
    """Config-driven column whitelist, key always retained (P6).

    Parity: cdc_stream.py:286-295 (and the Mongo variant :814-826,
    which force-includes the key). Semantic projection — physical
    pruning is Catalyst's job.
    """
    keep = [c for c in df.columns if c in set(columns_to_save) or c == key_col]
    ordered = [key_col, *[c for c in keep if c != key_col]]
    return df.select(*_cols(ordered))


def window_compact(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    event_time_col: str,
    window_duration: str,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Latest event per key per tumbling event-time window (W1+A1).

    The archived versions built this by hand with a ``future_data``
    carry-over union (archive/stable_v3.py:188-204); here it is one
    grouped aggregation keyed by ``window(event_time, dur)`` — in
    streaming mode the same expression composes with
    ``withWatermark`` and Spark's state store handles late data.

    Output: ``window_start, window_end, key_cols..., payload...``.
    """
    keyset = set(key_cols)
    payload = list(payload_cols) if payload_cols is not None else [
        c for c in df.columns if c not in keyset
    ]
    packed = F.struct(*_cols(payload))
    ordering = F.struct(*_cols(order_cols))
    win = F.window(F.col(event_time_col), window_duration)
    agg = df.groupBy(win.alias("_w"), *_cols(key_cols)).agg(
        F.max_by(packed, ordering).alias("_latest")
    )
    return agg.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *_cols(key_cols),
        *[F.col(f"_latest.{c}").alias(c) for c in payload],
    )


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] | None = None,
    delete_op: str = "d",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 materialization: instead of the
    latest row per key (A1/K2), keep EVERY version with its validity
    interval — the audit-style answer to "what did this row look like
    at time T?".

    Semantics: each non-delete change opens a version effective at its
    own order position; the NEXT change for the same key (update or
    delete) closes it. The last open version has a null ``valid_to``
    and ``is_current = 1``; deletes emit no version of their own, they
    only terminate the predecessor (matching how Debezium consumers
    build history tables from the reference's envelope stream,
    cdc_stream.py:629-691 — the reference itself materializes only the
    Type 1 latest-state table).

    Plan: ONE shuffle (hash by key) feeding a single window sort —
    per-key history is small and keys are many, so this parallelizes
    and survives 100x data. The first ``order_cols`` entry is the
    version's effective-from value (carry epoch micros for exactness).

    Output: ``key_cols..., payload..., valid_from, valid_to,
    is_current`` (valid_* typed as the first order col; is_current int).
    """
    from pyspark.sql.window import Window

    keyset = set(key_cols)
    payload = list(payload_cols) if payload_cols is not None else [
        c
        for c in df.columns
        if c not in keyset and c != op_col and c not in set(order_cols)
    ]
    w = Window.partitionBy(*_cols(key_cols)).orderBy(*_cols(order_cols))
    first_order = order_cols[0]
    hist = df.withColumn("_next_from", F.lead(F.col(first_order)).over(w))
    return (
        hist.filter(F.col(op_col) != delete_op)
        .select(
            *_cols(key_cols),
            *_cols(payload),
            F.col(first_order).alias("valid_from"),
            F.col("_next_from").alias("valid_to"),
            F.col("_next_from").isNull().cast("int").alias("is_current"),
        )
    )


def aggregate_delta(
    prev_snapshot: DataFrame,
    batch: DataFrame,
    key_cols: Sequence[str],
    group_expr: Column,
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Incremental-view-maintenance delta for a grouped COUNT/SUM over
    the materialized snapshot.

    Given the previous snapshot and one compacted batch (latest change
    per key), emit per-group deltas ``(grp, d_count, d_sum)`` such that
    ``agg(snapshot ⊕ batch) = agg(snapshot) + delta`` — the classic
    delta-propagation rule: every touched key retracts its old
    contribution (if it existed) and asserts its new one (unless the
    change is a delete).

    ``group_expr`` must be a function of the KEY columns (e.g.
    ``pmod(key_id, 8)``): an update's retraction and assertion then
    land in the same group and the delta decomposes per side. Value-
    derived grouping needs pre/post images joined per key — not
    implemented here.

    Plan: assert/retract decomposition, chosen because Spark cannot
    broadcast the PRESERVED side of an outer join (a batch-preserving
    left/right join would force the snapshot to be the build side —
    broadcasting the full table, a driver OOM at any real scale):

    - assertions come from the batch alone, no join: every non-delete
      contributes (+1, +value) to its group;
    - retractions read only the snapshot rows whose key the batch
      touched, via a LEFT SEMI join against the broadcast batch key
      set (semi joins DO support a broadcast build side): each
      contributes (−1, −old value).

    Both parts aggregate to group granularity (domains, tens of rows)
    before the final combine, so the only data-sized pass is the
    semi-joined snapshot scan — the snapshot-sized aggregate is never
    recomputed, which at 100 TB is the whole point of maintaining the
    view incrementally.
    """
    keys = list(key_cols)
    new_active = F.col(op_col) != "d"
    asserts = batch.groupBy(group_expr.alias("grp")).agg(
        F.sum(F.when(new_active, F.lit(1)).otherwise(F.lit(0))).alias("d_count"),
        F.sum(
            F.when(new_active, F.col(value_col)).otherwise(F.lit(0))
        ).alias("d_sum"),
    )
    touched_old = prev_snapshot.join(
        F.broadcast(batch.select(*_cols(keys))), keys, "semi"
    )
    retracts = touched_old.groupBy(group_expr.alias("grp")).agg(
        (-F.count(F.lit(1))).alias("d_count"),
        (-F.sum(F.col(value_col))).alias("d_sum"),
    )
    return (
        asserts.unionByName(retracts)
        .groupBy("grp")
        .agg(F.sum("d_count").alias("d_count"), F.sum("d_sum").alias("d_sum"))
    )


def merge_agg_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold one :func:`aggregate_delta` result into the maintained
    aggregate state ``(grp, cnt, total)``; groups whose count reaches
    zero drop out (so the state equals a fresh GROUP BY at all times).
    """
    return (
        state.select("grp", "cnt", "total")
        .unionByName(
            delta.select(
                "grp",
                F.col("d_count").alias("cnt"),
                F.col("d_sum").alias("total"),
            )
        )
        .groupBy("grp")
        .agg(F.sum("cnt").alias("cnt"), F.sum("total").alias("total"))
        .filter(F.col("cnt") > 0)
    )


def join_view_apply(
    mv: DataFrame,
    batch: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    join_cond,
    op_col: str = "op",
) -> DataFrame:
    """Incremental maintenance of a materialized equi-JOIN view
    ``MV = fact ⋈ dim`` under one compacted CDC batch on the fact
    side: ``MV' = (MV ⟕anti batch.keys) ∪ (batch.upserts ⋈ dim)``.

    The delta rule for joins: rows of the view whose fact key the
    batch touched are retracted (updates and deletes alike), and the
    batch's surviving images re-join the dimension to produce the
    assertions. The view is NEVER recomputed from the full fact table.

    Plan shape at 100 TB: the retraction is an anti join against the
    BROADCAST batch key set (batch-sized build side — the same
    broadcast-direction reasoning as aggregate_delta: the preserved
    side of the join is the big one, and anti joins support a
    broadcast build); the assertion joins a batch-sized relation
    against the dimension, so per-step work is O(view + batch ⋈ dim),
    independent of the fact table's history. A dim-side delta is the
    same rule transposed. In the snapshot store this pair is exactly
    one MERGE (delete-by-key + insert).
    """
    keys = list(key_cols)
    kept = mv.join(F.broadcast(batch.select(*_cols(keys))), keys, "anti")
    upserts = batch.filter(F.col(op_col) != "d").drop(op_col)
    # project the joined assertions back to the view's schema so the
    # operator is closed under application (mv' has mv's columns)
    added = upserts.join(dim, join_cond).select(
        *[F.col(c) for c in mv.columns]
    )
    return kept.unionByName(added, allowMissingColumns=False)


def content_digest(df, cols=None):
    """Order-independent table content digest - the replication /
    migration validation primitive: two relations hold the same BAG of
    rows iff their (n_rows, digest) pairs match, verified with ONE
    map-side-combinable aggregate per side and NO join, sort, or
    co-location (``cdc_validate``'s set-difference check is the
    row-level diagnosis tool; this is the O(1)-output fast path a
    100 TB replication check runs every cycle, where shipping either
    side to a join is already the expensive part).

    digest = SUM over rows of the 60-bit integer prefix of
    ``md5(canonical row string)``, accumulated in DECIMAL(38,0) -
    commutative/associative, so partitioning, partial aggregation, and
    any row order give the identical value; a single differing,
    missing, or duplicated row shifts the sum (md5 prefixes behave as
    independent 60-bit values, so cancellation between two DIFFERENT
    row multisets is astronomically unlikely, and equality of both
    count and sum is the check).

    The canonical row string is INJECTIVE by construction: each field
    contributes its own fixed-width md5 (NULL contributes a 32-char
    tag outside md5's hex alphabet), so field boundaries can never
    shift — a separator character inside a string value, or a NULL
    colliding with some sentinel literal, cannot make two different
    rows canonicalize identically (the failure mode a concat-with-
    separator encoding has). Callers must still canonicalize
    floating-point columns to scaled integers BEFORE passing ``cols``
    (engine string renderings of doubles differ; integer/string/ts
    casts do not).

    Output: one row - ``n_rows, digest``.
    """
    use = list(cols) if cols is not None else list(df.columns)
    canon = F.concat(
        *[
            F.coalesce(
                F.md5(F.col(c).cast("string")), F.lit("N" * 32)
            )
            for c in use
        ]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return df.select(h.alias("_h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_h").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("digest"),
    )


def point_in_time_join(
    facts: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    order_cols: Sequence[str],
    payload_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "d",
    prefix: str = "asof_",
) -> DataFrame:
    """Point-in-time-correct enrichment: each fact row picks up the
    changelog's payload AS OF the fact's own event time — the
    training-set construction rule of a feature store (no look-ahead
    leakage: a fact never sees a change that happened after it), and
    the temporal-join complement to ``scd2_history`` (which
    materializes the intervals; this probes them without building
    them).

    Semantics: for fact f, the effective change is the latest changelog
    row for f's key with ``time_col <= f.time_col`` (a change at
    exactly the fact's time IS visible; ties among changes break by
    ``order_cols``). If that change is a delete — or no change precedes
    the fact — every payload comes back null.

    Plan (the 100 TB shape): NOT a range/interval join — those explode
    on hot keys. One ``unionByName`` of the two relations and ONE
    window pass per key: sort by ``(time, is_fact, order_cols)`` and
    carry ``last(state, ignorenulls)`` — work is one shuffle of
    |facts| + |changes| rows hashed by key, the same cost class as the
    asof composition SURVEY §2 prescribes, and skew-safe because a hot
    key's rows sort within one partition without pair explosion.

    Output: every fact column, plus ``{prefix}{c}`` for each payload
    column (null when absent/deleted).
    """
    from pyspark.sql.window import Window

    state = F.struct(
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    ch = changes.select(
        *_cols(key_cols),
        F.col(time_col),
        F.lit(0).alias("_is_fact"),
        *_cols(order_cols),
        state.alias("_state"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(f"_f_{c}")
          for c in facts.columns],
    )
    order_types = {c: changes.schema[c].dataType for c in order_cols}
    fa = facts.select(
        *_cols(key_cols),
        F.col(time_col),
        F.lit(1).alias("_is_fact"),
        *[F.lit(None).cast(order_types[c]).alias(c)
          for c in order_cols],
        F.lit(None).cast(ch.schema["_state"].dataType).alias("_state"),
        *[F.col(c).alias(f"_f_{c}") for c in facts.columns],
    )
    w = (
        Window.partitionBy(*_cols(key_cols))
        .orderBy(F.col(time_col), F.col("_is_fact"), *_cols(order_cols))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = F.last("_state", ignorenulls=True).over(w)
    live = F.col("_asof").isNotNull() & (
        F.col("_asof")["_op"] != delete_op
    )
    return (
        ch.unionByName(fa)
        .withColumn("_asof", asof)
        .filter(F.col("_is_fact") == 1)
        .select(
            *[F.col(f"_f_{c}").alias(c) for c in facts.columns],
            *[
                F.when(live, F.col("_asof")[c]).alias(f"{prefix}{c}")
                for c in payload_cols
            ],
        )
    )
