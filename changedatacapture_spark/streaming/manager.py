"""Stream supervision: config hot-reload, trigger restart, graceful stop.

Re-architecture of the reference's ConfigManager + supervision loop
(config_manager.py:20-238, cdc_stream.py:954-1006): the reference uses
module-level globals (``restart_required`` / ``batch_in_progress``)
polled from the foreachBatch callback; here the same behavior lives in
one object with explicit state, and "restart on trigger change" is a
stop-at-batch-boundary + start with the new trigger.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQuery

#: Config sections mirrored from the reference (config_manager.py:117-128)
REQUIRED_SECTIONS = (
    "kafka_config",
    "processing_config",
)

DEFAULTS: dict = {
    "kafka_config": {
        "bootstrap_servers": "localhost:9092",
        "topic": "dbserver1.public.table",
        "fail_on_data_loss": False,
        "max_offsets_per_trigger": 10000,
    },
    "processing_config": {
        "process_time_seconds": 30,
        "key_column": "id",
    },
}


@dataclass
class ConfigManager:
    """JSON file config with mtime-based hot reload (60 s default)."""

    path: str
    refresh_interval: float = 60.0
    _config: dict = field(default_factory=dict)
    _loaded_at: float = 0.0
    _mtime: float = 0.0

    def _merge_defaults(self, cfg: dict) -> dict:
        out = {k: dict(v) for k, v in DEFAULTS.items()}
        for section, values in cfg.items():
            out.setdefault(section, {}).update(values)
        return out

    def get_config(self, force: bool = False) -> dict:
        now = time.time()
        if not force and self._config and now - self._loaded_at < self.refresh_interval:
            return self._config
        try:
            mtime = os.path.getmtime(self.path)
            if force or mtime != self._mtime or not self._config:
                with open(self.path) as f:
                    self._config = self._merge_defaults(json.load(f))
                self._mtime = mtime
        except FileNotFoundError:
            if not self._config:
                self._config = self._merge_defaults({})
        self._loaded_at = now
        return self._config

    def process_time(self) -> int:
        return int(self.get_config()["processing_config"]["process_time_seconds"])


class StreamManager:
    """Run a restartable streaming query under config supervision.

    ``start_fn(trigger_seconds)`` builds and starts the query; the
    supervisor polls config and, when the trigger interval changes,
    stops the query *after the in-flight batch completes* and restarts
    it with the new trigger (T3). ``stop()`` is the graceful-shutdown
    path (T4): stop processing, wait for termination.
    """

    def __init__(
        self,
        config: ConfigManager,
        start_fn: Callable[[int], StreamingQuery],
        poll_seconds: float = 5.0,
    ) -> None:
        self.config = config
        self.start_fn = start_fn
        self.poll_seconds = poll_seconds
        self.query: StreamingQuery | None = None
        self._current_trigger: int | None = None
        self._stop_evt = threading.Event()
        self._thread: threading.Thread | None = None

    def _ensure_running(self) -> None:
        trigger = self.config.process_time()
        if self.query is not None and trigger == self._current_trigger:
            return
        if self.query is not None:
            # stop() waits for the in-flight foreachBatch to finish —
            # batch boundaries are the only restart points.
            self.query.stop()
            self.query.awaitTermination()
        self.query = self.start_fn(trigger)
        self._current_trigger = trigger

    def run_supervised(self, block: bool = False) -> None:
        self._ensure_running()

        def loop() -> None:
            while not self._stop_evt.wait(self.poll_seconds):
                try:
                    self._ensure_running()
                except Exception:  # noqa: BLE001 - supervisor must survive
                    pass

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        if block and self.query is not None:
            self.query.awaitTermination()

    def stop(self, timeout: float | None = None) -> None:
        """Graceful shutdown: no new batches, wait for the current one."""
        self._stop_evt.set()
        if self._thread is not None:
            self._thread.join(timeout=self.poll_seconds + 1)
        if self.query is not None:
            self.query.stop()
            self.query.awaitTermination(int(timeout) if timeout else None)
            self.query = None


def next_aligned_fire(
    now: float, period_seconds: float, offset_seconds: float = 0.0
) -> float:
    """Next wall-clock-aligned fire time strictly after ``now``.

    Boundaries are ``offset + k * period`` in epoch seconds — e.g.
    ``period=1800, offset=0`` fires at :00 and :30 of every hour
    regardless of when the runner started (the property the reference's
    cron alignment provides, archive/stable_v3.py:322-363, and a plain
    ``processingTime`` trigger does not: that one ticks relative to
    query start).
    """
    if period_seconds <= 0:
        raise ValueError("period_seconds must be positive")
    k = int((now - offset_seconds) // period_seconds) + 1
    return offset_seconds + k * period_seconds


class CronAlignedRunner:
    """Cron-aligned micro-batching (W4): one ``availableNow`` drain per
    wall-clock boundary.

    Spark has no cron trigger; the idiomatic equivalent is a scheduled
    sequence of ``availableNow`` runs against the same checkpoint —
    each cycle processes everything available, then the query shuts
    down until the next boundary (same cost model as the reference's
    sleep-until-aligned loop, with Spark's checkpoint providing
    exactly-once across cycles).

    ``start_fn()`` must build and start an ``availableNow`` query each
    cycle. ``clock``/``sleeper`` are injectable for tests.
    """

    def __init__(
        self,
        start_fn: Callable[[], StreamingQuery],
        period_seconds: float,
        offset_seconds: float = 0.0,
        clock: Callable[[], float] = time.time,
        sleeper: Callable[[float], None] | None = None,
    ) -> None:
        self.start_fn = start_fn
        self.period_seconds = period_seconds
        self.offset_seconds = offset_seconds
        self.clock = clock
        self._stop_evt = threading.Event()
        self.sleeper = sleeper or (lambda s: self._stop_evt.wait(s))
        self.cycles_run = 0

    def run(self, max_cycles: int | None = None) -> None:
        """Fire at each aligned boundary until stopped (or max_cycles)."""
        while not self._stop_evt.is_set():
            if max_cycles is not None and self.cycles_run >= max_cycles:
                return
            fire_at = next_aligned_fire(
                self.clock(), self.period_seconds, self.offset_seconds
            )
            delay = fire_at - self.clock()
            if delay > 0:
                self.sleeper(delay)
            if self._stop_evt.is_set():
                return
            q = self.start_fn()
            q.awaitTermination()
            self.cycles_run += 1

    def stop(self) -> None:
        self._stop_evt.set()


class MetricsRecorder:
    """Per-micro-batch metrics sink: one JSONL line per completed batch.

    The reference logs per-batch progress ad hoc (cdc_stream.py's
    logger calls throughout ``process_batch``); here the engine
    subscribes a ``StreamingQueryListener`` once and every query on the
    session reports uniformly — batch id, input rows, processed rows
    per second, batch duration, and state-store rows for stateful
    operators. Driver-side JSONL append: metrics must not cost a Spark
    job per batch.

    Use :meth:`attach` / :meth:`detach`; read back with
    :meth:`load` (a DataFrame over the JSONL, ready for the same
    analytics queries as any other table).
    """

    def __init__(self, spark, path: str) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        self.spark = spark
        self.path = path

        recorder = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:  # noqa: N802
                pass

            def onQueryProgress(self, event) -> None:  # noqa: N802
                p = event.progress
                row = {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "timestamp": p.timestamp,
                    "num_input_rows": p.numInputRows,
                    "input_rows_per_second": p.inputRowsPerSecond,
                    "processed_rows_per_second": p.processedRowsPerSecond,
                    "batch_duration_ms": p.batchDuration,
                    "state_rows": sum(
                        (s.numRowsTotal or 0) for s in (p.stateOperators or [])
                    ),
                }
                recorder._append(row)

            def onQueryTerminated(self, event) -> None:  # noqa: N802
                pass

            def onQueryIdle(self, event) -> None:  # noqa: N802
                pass

        self._listener = _Listener()

    def _append(self, row: dict) -> None:
        import json as _json
        import os as _os

        _os.makedirs(_os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(_json.dumps(row) + "\n")

    def attach(self) -> "MetricsRecorder":
        self.spark.streams.addListener(self._listener)
        return self

    def detach(self) -> None:
        self.spark.streams.removeListener(self._listener)

    def load(self):
        """Metrics as a DataFrame (schema-stable JSONL read)."""
        return self.spark.read.schema(
            "query_id string, batch_id long, timestamp string, "
            "num_input_rows long, input_rows_per_second double, "
            "processed_rows_per_second double, batch_duration_ms long, "
            "state_rows long"
        ).json(self.path)
