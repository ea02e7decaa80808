"""Per-batch streaming lineage/metrics (§2.10 last row).

A ``StreamingQueryListener`` that captures every micro-batch's progress —
rows in, processing rate, trigger latency, per-stateful-operator state rows
and memory — and appends them as JSON lines to a metrics log, queryable as a
DataFrame. The graft of the reference's per-site/run count logging
(audio_side.sh:31-35, every pipeline stage echoes row counts into run logs):
an ops team at 100 TB needs the same counts per micro-batch, per operator,
continuously, not in shell logs.

JSON-lines + append is deliberate: the listener fires on the driver between
batches, so the write path must be cheap and crash-tolerant (each line is
self-contained; a torn final line is ignored on read).
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType(), False),
        T.StructField("query_name", T.StringType(), True),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("event_ts", T.StringType(), True),
        T.StructField("num_input_rows", T.LongType(), True),
        T.StructField("processed_rows_per_sec", T.DoubleType(), True),
        T.StructField("trigger_ms", T.LongType(), True),
        T.StructField("watermark", T.StringType(), True),
        T.StructField("state_rows_total", T.LongType(), True),
        T.StructField("state_rows_updated", T.LongType(), True),
        T.StructField("state_memory_bytes", T.LongType(), True),
        T.StructField("n_state_operators", T.IntegerType(), True),
    ]
)


class BatchMetricsListener(StreamingQueryListener):
    def __init__(self, log_path: str):
        self.log_path = log_path
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        self._lock = threading.Lock()

    # -- listener contract -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        ops = p.stateOperators or []
        row = {
            "query_id": str(p.id),
            "query_name": p.name,
            "batch_id": int(p.batchId),
            "event_ts": p.timestamp,
            "num_input_rows": int(p.numInputRows),
            "processed_rows_per_sec": float(p.processedRowsPerSecond)
            if p.processedRowsPerSecond is not None
            else None,
            "trigger_ms": int(p.durationMs.get("triggerExecution", 0))
            if p.durationMs
            else None,
            "watermark": (p.eventTime or {}).get("watermark"),
            "state_rows_total": sum(int(o.numRowsTotal) for o in ops) if ops else None,
            "state_rows_updated": sum(int(o.numRowsUpdated) for o in ops) if ops else None,
            "state_memory_bytes": sum(int(o.memoryUsedBytes) for o in ops) if ops else None,
            "n_state_operators": len(ops),
        }
        line = json.dumps(row)
        with self._lock:
            with open(self.log_path, "a") as f:
                f.write(line + "\n")


def attach_metrics(spark: SparkSession, log_path: str) -> BatchMetricsListener:
    """Register a per-batch metrics listener on the session."""
    listener = BatchMetricsListener(log_path)
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark: SparkSession, listener: BatchMetricsListener) -> None:
    spark.streams.removeListener(listener)


def read_metrics(spark: SparkSession, log_path: str) -> DataFrame:
    """The metrics log as a typed DataFrame (torn trailing lines skipped)."""
    rows = []
    if os.path.isfile(log_path):
        with open(log_path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue  # torn line from a crash mid-append
    return spark.createDataFrame(rows, schema=METRICS_SCHEMA)
