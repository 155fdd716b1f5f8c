"""Streaming observability: per-epoch query metrics to JSONL.

The reference's operational surface is Grafana dashboards over the
result tables (``/root/reference/README.md:350`` — the whole point of the
system is watching the binlog pipeline). The pipeline itself needs the
same treatment: this module attaches a ``StreamingQueryListener`` that
appends one JSON line per completed micro-batch — rows in, processing
rate, trigger/addBatch durations, state-store sizes, the event-time
watermark — so the ingest/upsert/rollup/window jobs can be charted (or
alerted on) without touching Spark's UI (disabled in production-like
headless runs, ``session.py``).

Scale notes: metrics volume is one small dict per EPOCH per query —
driver-side appends to a local JSONL file are exactly the right tool;
no executor involvement, no extra jobs. At 1000 executors the progress
event is already aggregated by Spark before it reaches the listener.
"""

from __future__ import annotations

import json
import os
import re
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_SAFE = re.compile(r"[^A-Za-z0-9_.-]+")


class EpochMetricsListener(StreamingQueryListener):
    """Append one JSON line per finished micro-batch to
    ``<dir>/<query name or id>.jsonl``.

    Fields: ``ts`` (progress timestamp), ``batch_id``, ``num_input_rows``,
    ``input_rows_per_second``, ``processed_rows_per_second``,
    ``trigger_ms`` / ``add_batch_ms``, ``watermark`` (when any), and
    ``state_rows`` / ``state_bytes`` totals over the stateful operators.
    Listener callbacks run on a driver background thread — writes are
    lock-guarded and flushed per line so a crash loses at most the
    in-flight epoch's line.
    """

    def __init__(self, metrics_dir: str) -> None:
        self._dir = metrics_dir
        self._lock = threading.Lock()
        os.makedirs(metrics_dir, exist_ok=True)

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        durations = p.durationMs or {}
        line = {
            "ts": p.timestamp,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "trigger_ms": durations.get("triggerExecution"),
            "add_batch_ms": durations.get("addBatch"),
            "watermark": (p.eventTime or {}).get("watermark"),
            "state_rows": sum(
                s.numRowsTotal for s in (p.stateOperators or [])
            ),
            "state_bytes": sum(
                s.memoryUsedBytes for s in (p.stateOperators or [])
            ),
        }
        name = _SAFE.sub("_", p.name or str(p.id))
        path = os.path.join(self._dir, f"{name}.jsonl")
        with self._lock, open(path, "a", encoding="utf-8") as f:
            f.write(json.dumps(line) + "\n")
            f.flush()


def attach_metrics(spark: SparkSession, metrics_dir: str) -> EpochMetricsListener:
    """Attach an :class:`EpochMetricsListener` to every streaming query on
    this session; returns the listener (pass to :func:`detach_metrics`)."""
    listener = EpochMetricsListener(metrics_dir)
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark: SparkSession, listener: EpochMetricsListener) -> None:
    spark.streams.removeListener(listener)
