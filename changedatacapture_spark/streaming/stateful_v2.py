"""Custom stateful streaming operators on Spark 4's arbitrary-state
API v2 (``transformWithStateInPandas``).

The ``applyInPandasWithState`` twins in ``stateful.py`` are the legacy
API: one untyped tuple of state per key, no timers, no TTL. The v2
operator adds typed ValueState/ListState/MapState, per-key event-time
timers, and state TTL — which buys two semantics the old API cannot
express:

- **idle-key session expiry by TIMER** (:class:`SessionProcessor`):
  a session whose key never produces another event still CLOSES when
  the watermark passes ``last_ts + gap`` — emitted from
  ``handleExpiredTimer``, not from the next event. Under the legacy
  API such sessions stay open forever (state never revisited).
- **exact late-data accounting with bounded multi-window state**
  (:class:`RateLimitProcessor`): per-window admission stats live in a
  ``MapState`` keyed by window start, so out-of-order arrival folds
  into the RIGHT window instead of being dropped (the legacy
  single-open-window operator's documented late-data policy). The
  admitted set is defined ORDER-INVARIANTLY as "the ``cap`` smallest
  timestamps of the window" (a bounded top-k kept in state), so the
  final (key, window) rows equal one global batch pass no matter how
  arrival interleaves — the differential oracle checks exactly that.

Both processors shard state by key hash across executors and
checkpoint through the RocksDB state store (multi-column-family state
requires it; the query builders in ``queries.py`` set
``spark.sql.streaming.stateStore.providerClass`` around query start).

Requires a ``google.protobuf`` runtime in driver AND python workers
(the v2 state client speaks protobuf to the JVM state server) — see
``compat.ensure_protobuf_env``; callers gate on
``compat.has_tws_support`` and fall back to the legacy twins.

Reference parity: the reference's only stateful construct is the
driver-side ``future_data`` carry-over dict (archive/stable_v3.py:
188-204); both operators here strictly generalize it with
partitioned, fault-tolerant state.
"""

from __future__ import annotations

import bisect
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:  # pragma: no cover
    from collections.abc import Iterator

    import pandas as pd

#: Output of :class:`SessionProcessor` — v1 columns plus ``via_timer``
#: (True only for rows emitted from ``handleExpiredTimer``).
SESSION_V2_OUTPUT_DDL = (
    "user_id long, session_start long, session_end long, "
    "n_events long, closed boolean, via_timer boolean"
)

#: Output of :class:`RateLimitProcessor` — v1 columns plus the key's
#: running count of events that arrived after their window was evicted
#: (always 0 unless ``lateness_windows`` is bounded).
RATE_V2_OUTPUT_DDL = (
    "user_id long, window_start long, n_seen long, n_admitted long, "
    "last_admitted_ts long, n_late_dropped long"
)


def _lazy_imports():
    # deferred so the module imports (and the legacy twins keep
    # working) on hosts with no protobuf runtime
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    return pd, StatefulProcessor, StatefulProcessorHandle


def make_session_processor(gap_seconds: int):
    """Build a :class:`SessionProcessor` class instance for ``gap_seconds``.

    Factory (rather than a module-level class with __init__ args only)
    keeps the pickled closure minimal for the worker.
    """
    pd, StatefulProcessor, _ = _lazy_imports()
    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1_000
    cols = [
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        "closed",
        "via_timer",
    ]

    class SessionProcessor(StatefulProcessor):
        """Gap sessionization with typed ValueState + event-time timers.

        State: ``(session_start, last_ts, n_events)`` epoch-micros in a
        ValueState. On every input batch the open session's extent is
        re-emitted (update-mode; downstream folds by max per (user,
        session_start)); sessions that close because the NEXT event is
        > gap away emit ``closed=true, via_timer=false``. A timer at
        ``last_ts + gap`` (ms) is (re)registered per batch; if the key
        goes idle and the WATERMARK passes that point first, the
        session closes from ``handleExpiredTimer`` with
        ``via_timer=true`` and state clears — the row the legacy API
        can never produce. Because the timer only fires once the
        watermark proves no same-session event can still arrive, the
        folded final output is identical either way; the timer changes
        LATENCY-TO-CLOSE, not the result — which is what makes the
        differential oracle valid.
        """

        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "sess", "session_start long, last_ts long, n_events long"
            )
            self._handle = handle

        def _emit(self, rows):
            return iter([pd.DataFrame(rows, columns=cols)])

        def handleInputRows(self, key, rows, timerValues):
            (uid,) = key
            if self._state.exists():
                start, last, n = self._state.get()
                old_expiry_ms = last // 1000 + gap_ms
            else:
                start, last, n = None, None, 0
                old_expiry_ms = None
            out: list[tuple[Any, ...]] = []
            # whole-batch sort: the key's batch arrives as multiple
            # Arrow chunks; per-chunk sorting would let `last` move
            # backwards across chunk boundaries
            for t in sorted(int(v) for pdf in rows for v in pdf["ts_us"]):
                if last is not None and t - last > gap_us:
                    out.append((uid, start, last, n, True, False))
                    start, n = None, 0
                if start is None:
                    start = t
                n += 1
                last = t
            self._state.update((start, last, n))
            if old_expiry_ms is not None:
                self._handle.deleteTimer(old_expiry_ms)
            self._handle.registerTimer(last // 1000 + gap_ms)
            out.append((uid, start, last, n, False, False))
            return self._emit(out)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (uid,) = key
            if not self._state.exists():
                return iter([])
            start, last, n = self._state.get()
            # stale timer (an input batch re-registered a later one
            # but deletion raced): only close when genuinely idle
            if expiredTimerInfo.getExpiryTimeInMs() < last // 1000 + gap_ms:
                return iter([])
            self._state.clear()
            return self._emit([(uid, start, last, n, True, True)])

        def close(self) -> None:
            pass

    return SessionProcessor()


def make_rate_limit_processor(
    window_seconds: int, cap: int, lateness_windows: int | None = None
):
    """Build a :class:`RateLimitProcessor` for (window, cap, lateness).

    ``lateness_windows=None`` keeps every window in the MapState for
    the life of the query (exact mode — the differential oracle's
    setting). A bounded value evicts windows older than
    ``lateness_windows`` behind the key's max-seen event time; events
    arriving for an evicted window are counted in the key's
    ``n_late_dropped`` total instead of corrupting closed stats —
    the exact-accounting upgrade over the legacy single-window twin.
    """
    pd, StatefulProcessor, _ = _lazy_imports()
    window_us = window_seconds * 1_000_000
    cols = [
        "user_id",
        "window_start",
        "n_seen",
        "n_admitted",
        "last_admitted_ts",
        "n_late_dropped",
    ]

    class RateLimitProcessor(StatefulProcessor):
        """Multi-window admission stats in MapState, order-invariant.

        MapState value per window: ``n_seen`` plus the window's ``cap``
        SMALLEST timestamps so far (array state — the bounded top-k
        that makes "admitted = first cap by event time" arrival-order-
        invariant: folding a new timestamp into the k-smallest set is
        commutative). ValueState ``meta`` carries the key's max-seen
        event time (its private watermark for eviction) and the
        late-dropped total.
        """

        def init(self, handle) -> None:
            self._win = handle.getMapState(
                "win", "window_start long", "n_seen long, adm array<long>"
            )
            self._meta = handle.getValueState(
                "meta", "max_ts long, n_late long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (uid,) = key
            if self._meta.exists():
                max_ts, n_late = self._meta.get()
            else:
                max_ts, n_late = None, 0
            # fold the batch per window first (C-speed groupby), then
            # touch each MapState entry once
            touched: dict[int, list[int]] = {}
            for pdf in rows:
                for w, grp in pdf.groupby(pdf["ts_us"] // window_us * window_us):
                    touched.setdefault(int(w), []).extend(
                        int(v) for v in grp["ts_us"]
                    )
            evict_before = None
            if lateness_windows is not None:
                batch_max = max((max(ts) for ts in touched.values()), default=None)
                horizon = max(
                    v for v in (max_ts, batch_max) if v is not None
                )
                evict_before = (
                    horizon // window_us - lateness_windows
                ) * window_us
            out: list[tuple[Any, ...]] = []
            for w in sorted(touched):
                ts_list = touched[w]
                if evict_before is not None and w < evict_before:
                    # window already evicted (or would be): count as
                    # late, never re-open — re-opening would emit
                    # undercounted rows the downstream argmax keeps
                    if not self._win.containsKey((w,)):
                        n_late += len(ts_list)
                        continue
                if self._win.containsKey((w,)):
                    n_seen, adm = self._win.getValue((w,))
                    adm = list(adm)
                else:
                    n_seen, adm = 0, []
                n_seen += len(ts_list)
                for t in ts_list:
                    if len(adm) < cap:
                        bisect.insort(adm, t)
                    elif t < adm[-1]:
                        bisect.insort(adm, t)
                        adm.pop()
                self._win.updateValue((w,), (n_seen, adm))
                out.append((uid, w, n_seen, len(adm), adm[-1], n_late))
                # ts_list is in ARRIVAL order — guard on its max, not
                # its last element, or the stored horizon understates
                # when the window's maximum arrives mid-batch. (The
                # understatement is bounded within one window, so the
                # window-granular evict_before happens to come out the
                # same — but "meta holds the key's true max-seen ts" is
                # the invariant later readers must be able to rely on.)
                m = max(ts_list)
                if max_ts is None or m > max_ts:
                    max_ts = m
            # evict state for windows that fell behind the horizon
            if evict_before is not None:
                stale = [
                    wk for (wk,) in self._win.keys() if wk < evict_before
                ]
                for wk in stale:
                    self._win.removeKey((wk,))
            self._meta.update((max_ts, n_late))
            return iter([pd.DataFrame(out, columns=cols)])

        def close(self) -> None:
            pass

    return RateLimitProcessor()


def tws_sessionize(
    changes,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    delay_seconds: int = 1,
):
    """Gap sessionization via ``transformWithStateInPandas`` with
    event-time timers (timeMode=EventTime).

    ``changes`` must carry the key column and a TIMESTAMP column
    ``ts_col`` (the watermark column; epoch-micros are derived from
    it). With time-range-bucketed replay every unseen event is newer
    than the watermark, so a firing timer PROVES no same-session event
    can still arrive (if ``ts' ≤ last+gap < wm ≤ max_seen`` then
    ``ts'`` was already seen) — closing by timer is safe for any
    watermark delay ≥ 0.
    """
    from pyspark.sql import functions as F

    src = (
        changes.select(
            F.col(key_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
        )
        .withWatermark("ts", f"{delay_seconds} seconds")
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_session_processor(gap_seconds),
        outputStructType=SESSION_V2_OUTPUT_DDL,
        outputMode="Update",
        timeMode="EventTime",
    )


def tws_rate_limit(
    changes,
    window_seconds: int = 3600,
    cap: int = 5,
    key_col: str = "user_id",
    ts_us_col: str = "ts_us",
    lateness_windows: int | None = None,
):
    """Per-key admission accounting via ``transformWithStateInPandas``
    with MapState-per-window (timeMode=None — no watermark contract on
    the input, which is the point: arbitrary out-of-order arrival
    folds into the right window exactly)."""
    from pyspark.sql import functions as F

    src = changes.select(
        F.col(key_col).alias("user_id"), F.col(ts_us_col).alias("ts_us")
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_rate_limit_processor(
            window_seconds, cap, lateness_windows
        ),
        outputStructType=RATE_V2_OUTPUT_DDL,
        outputMode="Update",
        timeMode="None",
    )
