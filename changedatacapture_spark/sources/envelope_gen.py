"""Synthetic Debezium envelope generator (hermetic test source).

Builds JSONL change-log files shaped exactly like the reference's
Kafka values (``{payload: {before, after, op, ts_ms}}``) from plain
row dicts — replacing the reference's Postgres+Debezium+Kafka stack
for tests (SURVEY §5 "make the differential oracle hermetic").
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable


def envelope(
    op: str,
    before: dict | None,
    after: dict | None,
    ts_ms: int,
) -> dict:
    return {"payload": {"before": before, "after": after, "op": op, "ts_ms": ts_ms}}


def write_envelope_jsonl(
    path: str,
    ops: Iterable[tuple[str, dict | None, dict | None, int]],
    start_seq: int = 0,
    file_name: str = "part-0000.jsonl",
) -> int:
    """Write ``(op, before, after, ts_ms)`` tuples as one JSONL file of
    ``{"value": <envelope json>, "seq": n}`` rows; returns next seq."""
    os.makedirs(path, exist_ok=True)
    seq = start_seq
    with open(os.path.join(path, file_name), "w") as f:
        for op, before, after, ts_ms in ops:
            rec = {"value": json.dumps(envelope(op, before, after, ts_ms)), "seq": seq}
            f.write(json.dumps(rec) + "\n")
            seq += 1
    return seq
