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
