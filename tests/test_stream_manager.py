"""ConfigManager hot-reload and StreamManager restart behavior."""

from __future__ import annotations

import json
import time

from changedatacapture_spark.streaming.manager import ConfigManager, StreamManager


def _write(path, cfg):
    with open(path, "w") as f:
        json.dump(cfg, f)


def test_config_defaults_and_merge(tmp_path):
    p = str(tmp_path / "config.json")
    _write(p, {"processing_config": {"process_time_seconds": 5}})
    cm = ConfigManager(p, refresh_interval=0.0)
    cfg = cm.get_config()
    assert cfg["processing_config"]["process_time_seconds"] == 5
    # defaults filled in for unspecified keys/sections
    assert cfg["processing_config"]["key_column"] == "id"
    assert cfg["kafka_config"]["max_offsets_per_trigger"] == 10000


def test_config_hot_reload_on_mtime_change(tmp_path):
    p = str(tmp_path / "config.json")
    _write(p, {"processing_config": {"process_time_seconds": 5}})
    cm = ConfigManager(p, refresh_interval=0.0)
    assert cm.process_time() == 5
    time.sleep(0.05)
    _write(p, {"processing_config": {"process_time_seconds": 9}})
    import os

    os.utime(p, (time.time() + 2, time.time() + 2))
    assert cm.process_time() == 9


def test_config_missing_file_uses_defaults(tmp_path):
    cm = ConfigManager(str(tmp_path / "nope.json"), refresh_interval=0.0)
    assert cm.process_time() == 30


class _FakeQuery:
    def __init__(self, trigger):
        self.trigger = trigger
        self.stopped = False

    def stop(self):
        self.stopped = True

    def awaitTermination(self, timeout=None):
        return True


def test_stream_manager_restarts_on_trigger_change(tmp_path):
    p = str(tmp_path / "config.json")
    _write(p, {"processing_config": {"process_time_seconds": 5}})
    cm = ConfigManager(p, refresh_interval=0.0)
    started = []

    def start_fn(trigger):
        q = _FakeQuery(trigger)
        started.append(q)
        return q

    mgr = StreamManager(cm, start_fn, poll_seconds=0.05)
    mgr.run_supervised(block=False)
    assert started[-1].trigger == 5
    time.sleep(0.1)
    _write(p, {"processing_config": {"process_time_seconds": 11}})
    import os

    os.utime(p, (time.time() + 2, time.time() + 2))
    deadline = time.time() + 3
    while time.time() < deadline and started[-1].trigger != 11:
        time.sleep(0.05)
    mgr.stop()
    assert started[-1].trigger == 11
    assert started[0].stopped  # old query stopped at batch boundary


def test_next_aligned_fire_math():
    from changedatacapture_spark.streaming.manager import next_aligned_fire

    # :00/:30 alignment — 10:07:13 fires next at 10:30:00
    assert next_aligned_fire(1800 * 3 + 433, 1800) == 1800 * 4
    # exactly on a boundary -> strictly the NEXT one
    assert next_aligned_fire(3600, 1800) == 5400
    # offset shifts the grid
    assert next_aligned_fire(100, 60, offset_seconds=15) == 135
    import pytest

    with pytest.raises(ValueError):
        next_aligned_fire(0, 0)


def test_cron_aligned_runner_fires_on_grid():
    from changedatacapture_spark.streaming.manager import CronAlignedRunner

    now = {"t": 1000.0}
    fired_at = []
    slept = []

    class _Q:
        def awaitTermination(self, timeout=None):
            return True

    def clock():
        return now["t"]

    def sleeper(s):
        slept.append(round(s, 6))
        now["t"] += s

    def start_fn():
        fired_at.append(now["t"])
        return _Q()

    r = CronAlignedRunner(
        start_fn, period_seconds=30, clock=clock, sleeper=sleeper
    )
    r.run(max_cycles=3)
    # grid: 1020, 1050, 1080 — aligned to period regardless of start time
    assert fired_at == [1020.0, 1050.0, 1080.0]
    assert r.cycles_run == 3


def test_cron_aligned_runner_stop_breaks_sleep():
    from changedatacapture_spark.streaming.manager import CronAlignedRunner

    r = CronAlignedRunner(lambda: None, period_seconds=3600)
    import threading

    t = threading.Thread(target=r.run)
    t.start()
    time.sleep(0.2)
    r.stop()
    t.join(timeout=2)
    assert not t.is_alive()


def test_metrics_recorder_captures_batches(spark, tmp_path):
    import json, os, time, uuid

    from changedatacapture_spark.streaming.manager import MetricsRecorder
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(3):
        p = f"{src}/b{i}.json"
        with open(p, "w") as f:
            for j in range(5):
                f.write(json.dumps({"v": i * 5 + j}) + "\n")
        os.utime(p, (1_000_000 + i * 10, 1_000_000 + i * 10))

    metrics_path = str(tmp_path / "metrics.jsonl")
    rec = MetricsRecorder(spark, metrics_path).attach()
    try:
        sink = f"m_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema("v long")
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener delivery is async — wait briefly for the last event
        for _ in range(40):
            if (
                os.path.exists(metrics_path)
                and sum(1 for _ in open(metrics_path)) >= 3
            ):
                break
            time.sleep(0.25)
    finally:
        rec.detach()

    got = rec.load().filter(F.col("num_input_rows") > 0).collect()
    assert len(got) >= 3
    assert sum(r.num_input_rows for r in got) == 15
    assert all(r.batch_duration_ms >= 0 for r in got)
