"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's only stateful construct is its hand-rolled
``future_data`` carry-over dict for late events
(archive/stable_v3.py:188-204) — driver-side, single-process, lost on
restart. Spark's arbitrary-stateful-processing API gives the same
power with checkpointed, partitioned state: the state store shards by
key hash across executors, survives restarts, and the per-group
callback sees Arrow record batches (never single rows).

Sessionization with an inactivity gap is the canonical example — it
cannot be expressed as a windowed aggregate when sessions are
unbounded, so it is the honest test of the stateful path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output of :func:`stateful_sessionize` — closed sessions carry
#: ``closed=true``; the trailing open session of each batch is emitted
#: with ``closed=false`` (update-mode semantics: downstream sinks
#: upsert by (user_id, session_start)).
SESSION_OUTPUT_DDL = (
    "user_id long, session_start long, session_end long, "
    "n_events long, closed boolean"
)

#: Per-key state: (session_start, last_ts, n_events) epoch-micros.
SESSION_STATE_DDL = "session_start long, last_ts long, n_events long"


def _fold_session(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (uid,) = key
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0
    out: list[tuple[Any, ...]] = []
    # Materialize the key's WHOLE micro-batch before sorting: the group
    # arrives as multiple Arrow chunks when it exceeds
    # spark.sql.execution.arrow.maxRecordsPerBatch rows, and sorting
    # per-chunk would let `last` move backwards across chunk boundaries
    # (wrong session_end / missed gap closures). Within-batch event-time
    # order; cross-batch order is the source's (micro-batches arrive in
    # order per key).
    for t in sorted(int(v) for pdf in pdf_iter for v in pdf["ts_us"]):
        if last is not None and t - last > gap_us:
            out.append((uid, start, last, n, True))
            start, n = None, 0
        if start is None:
            start = t
        n += 1
        last = t
    state.update((start, last, n))
    out.append((uid, start, last, n, False))
    yield pd.DataFrame(
        out,
        columns=["user_id", "session_start", "session_end", "n_events", "closed"],
    )


def stateful_sessionize(
    changes: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Gap-based sessionization over a stream of (user, event-time) rows.

    ``changes`` must carry ``user_id`` and epoch-micros ``ts_us``
    columns (rename upstream). State shards by ``user_id`` hash — at
    scale each executor holds only its keys' open sessions, and the
    state store checkpoints with the query. Output mode: update.
    """
    gap_us = gap_seconds * 1_000_000
    grouped = changes.select(
        changes[key_col].alias("user_id"), changes[ts_us_col].alias("ts_us")
    ).groupBy("user_id")
    return grouped.applyInPandasWithState(
        lambda key, it, state: _fold_session(key, it, state, gap_us),
        outputStructType=SESSION_OUTPUT_DDL,
        stateStructType=SESSION_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Output of :func:`stateful_rate_limit` — one row per (key, window)
#: per emission; update-mode semantics, downstream folds by max.
RATE_OUTPUT_DDL = (
    "user_id long, window_start long, n_seen long, n_admitted long, "
    "last_admitted_ts long"
)

#: Per-key state: the OPEN window only (tumbling windows close in
#: event-time order per key, so one window of state per key suffices —
#: the property that keeps state O(keys), not O(keys × windows)).
RATE_STATE_DDL = "window_start long, n_seen long, last_admitted_ts long"


def _fold_rate(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
    window_us: int,
    cap: int,
) -> Iterator[pd.DataFrame]:
    (uid,) = key
    if state.exists:
        wstart, n_seen, last_adm = state.get
    else:
        wstart, n_seen, last_adm = None, 0, None
    out: list[tuple[Any, ...]] = []
    # whole-batch sort for the same chunk-boundary reason as
    # _fold_session; equal timestamps admit by value, so the k-th
    # order statistic (the emitted last_admitted_ts) is deterministic
    # regardless of tie order
    for t in sorted(int(v) for pdf in pdf_iter for v in pdf["ts_us"]):
        w = (t // window_us) * window_us
        if wstart is not None and w < wstart:
            # LATE event (window already flushed): drop it rather than
            # corrupt the open window's counters — re-opening the old
            # window would reset n_seen and emit undercounted rows that
            # the downstream max-fold keeps. The single-open-window
            # state contract requires per-key in-window-order arrival
            # across micro-batches; see the docstring. The
            # transformWithStateInPandas port (stateful_v2.py) keeps
            # bounded multi-window MapState instead and counts late
            # events exactly.
            continue
        if wstart is not None and w != wstart:
            out.append((uid, wstart, n_seen, min(n_seen, cap), last_adm))
            wstart, n_seen, last_adm = None, 0, None
        if wstart is None:
            wstart = w
        n_seen += 1
        if n_seen <= cap:
            last_adm = t
    state.update((wstart, n_seen, last_adm))
    if wstart is not None:
        out.append((uid, wstart, n_seen, min(n_seen, cap), last_adm))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id",
            "window_start",
            "n_seen",
            "n_admitted",
            "last_admitted_ts",
        ],
    )


def stateful_rate_limit(
    changes: DataFrame,
    window_seconds: int = 3600,
    cap: int = 5,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Per-key admission control over a stream: within each epoch-
    aligned tumbling window a key may emit at most ``cap`` events (the
    FIRST ``cap`` by event time); the rest are counted as dropped —
    the ingest-protection primitive in front of a hot-key-prone sink.

    Batching-invariant by construction — GIVEN per-key window-ordered
    arrival across micro-batches (a log-compacted source's contract):
    counts are associative and the admitted set is "the cap smallest
    timestamps of the window", so any micro-batch cut yields the same
    final (key, window) rows as one global pass — the oracle checks
    exactly that. An event for an already-flushed window (late data)
    is DROPPED, never folded into the open window — the late-data
    policy that keeps emitted counts monotone; use the
    ``transformWithStateInPandas`` port (``stateful_v2.py``), which
    keeps bounded multi-window state, when late arrivals must be
    counted exactly. State is one
    open window per key (closed windows flush as soon as a later
    window's event arrives for the key), sharded by key hash across
    executors, checkpointed with the query. Output mode: update;
    downstream folds by max per (key, window) since every emitted
    measure is monotone within a window.
    """
    window_us = window_seconds * 1_000_000
    grouped = changes.select(
        changes[key_col].alias("user_id"), changes[ts_us_col].alias("ts_us")
    ).groupBy("user_id")
    return grouped.applyInPandasWithState(
        lambda key, it, state: _fold_rate(key, it, state, window_us, cap),
        outputStructType=RATE_OUTPUT_DDL,
        stateStructType=RATE_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
