"""Streaming observability (SURVEY §2.10 heart-beat parity).

The reference writes a liveness row per worker into MySQL
(/root/reference tasks/backend/orm.py:38-91). Streaming-native form: a
StreamingQueryListener capturing per-batch progress — rows/sec, batch
durations, state-store size — queryable as a DataFrame for the audit suite.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class HeartbeatListener(StreamingQueryListener):
    """Collects query progress events in-memory (bounded ring)."""

    def __init__(self, max_events: int = 1000):
        self._lock = threading.Lock()
        self._events: list[dict] = []
        self._max = max_events

    def _append(self, event: dict) -> None:
        # every handler trims — started/terminated events from a
        # supervisor restart loop must honor the bound too, not just
        # progress events
        with self._lock:
            self._events.append(event)
            del self._events[:-self._max]

    def onQueryStarted(self, event) -> None:
        self._append({"kind": "started", "id": str(event.id),
                      "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = json.loads(event.progress.json)
        self._append({
            "kind": "progress",
            "id": p.get("id"),
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows"),
            "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        })

    def onQueryTerminated(self, event) -> None:
        self._append({"kind": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # pragma: no cover - depends on timing
        pass

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self._events)

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = [(e.get("kind"), e.get("id"), e.get("batch_id"),
                 e.get("num_input_rows"), e.get("duration_ms"))
                for e in self.snapshot()]
        return spark.createDataFrame(
            rows, "kind string, id string, batch_id long, "
                  "num_input_rows long, duration_ms long")
