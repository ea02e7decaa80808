#!/usr/bin/env python
"""Continuous-trigger latency benchmark: the deployed CEP mode.

The availableNow benches measure DRAIN throughput; a production stream
instead runs a processing-time trigger against files that keep arriving.
This harness feeds time-ordered slices into the input dir WHILE the
session-QC query runs with a short trigger, then reports the per-batch
latency distribution from the engine's own metrics listener
(streaming/metrics.py): trigger wall, rows/batch, and end-of-feed
catch-up time.

Optionally A/Bs async progress tracking
(spark.sql.streaming.asyncProgressTracking.enabled) — it trades offset-log
durability for lower per-trigger commit latency and only applies to
processing-time triggers; the exactly-once replay tests rely on the
synchronous log, so this stays an opt-in experiment, not the default.

Usage:
  python scripts/continuous_latency_bench.py [replicas] [trigger_s] [feed_interval_s] [async01]

Prints one JSON line: {"batches": N, "rows": R, "latency_ms": {p50, p95, max},
"feed_files": F, "catchup_s": ..., "async_progress": bool}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from daily_journal_dataflow_qc_spark.config import PipelineConfig
    from daily_journal_dataflow_qc_spark.datagen import write_parquet_scaled
    from daily_journal_dataflow_qc_spark.session import get_spark
    from daily_journal_dataflow_qc_spark.streaming.job import start_session_qc_query
    from daily_journal_dataflow_qc_spark.streaming.metrics import (
        attach_metrics,
        detach_metrics,
        read_metrics,
    )

    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    trigger_s = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    feed_s = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    use_async = len(sys.argv) > 4 and sys.argv[4] == "1"

    bench_dir = f"/tmp/djdq_bench_b120_r{replicas}"
    write_parquet_scaled(bench_dir, base_convs=120, replicas=replicas)
    extra = {"spark.sql.files.maxPartitionBytes": "16m"}
    if use_async:
        extra["spark.sql.streaming.asyncProgressTracking.enabled"] = "true"
    spark = get_spark(app_name="djdq-latency", extra_conf=extra)

    # 8 event-time slices, staged to a spool; the feeder moves one slice
    # into the live input dir every feed_interval seconds
    tr = spark.read.parquet(f"{bench_dir}/transcripts.parquet")
    n_turns = tr.count()
    spool = "/tmp/djdq_latency_spool"
    live = "/tmp/djdq_latency_in"
    for d in (spool, live):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    qs = [i / 8.0 for i in range(1, 8)]
    bounds = tr.selectExpr(
        f"percentile(cast(ts as double), array({','.join(str(q) for q in qs)})) p"
    ).head()[0]
    prev = None
    slices = []
    for i, b in enumerate(list(bounds) + [None]):
        part = tr
        if prev is not None:
            part = part.filter(F.col("ts").cast("double") >= prev)
        if b is not None:
            part = part.filter(F.col("ts").cast("double") < b)
        p = os.path.join(spool, f"slice{i}")
        part.repartition(4, "conv_id").write.mode("overwrite").parquet(p)
        slices.append(p)
        prev = b
    sent_dir = os.path.join(spool, "sentinel")
    tr.limit(1).select(
        F.lit("__sentinel__").alias("conv_id"),
        F.lit(1).cast("int").alias("turn_idx"),
        F.lit("S1").alias("role"),
        F.lit("end").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2090-01-01 00:00:00")).alias("ts"),
    ).coalesce(1).write.mode("overwrite").parquet(sent_dir)
    slices.append(sent_dir)

    feed_done = threading.Event()
    last_feed_ts = [0.0]

    def feeder():
        for i, src in enumerate(slices):
            for name in sorted(os.listdir(src)):
                if name.endswith(".parquet"):
                    shutil.copy(
                        os.path.join(src, name), os.path.join(live, f"s{i}_{name}")
                    )
            last_feed_ts[0] = time.time()
            time.sleep(feed_s)
        feed_done.set()

    out_root = "/tmp/djdq_latency_out"
    shutil.rmtree(out_root, ignore_errors=True)
    log = os.path.join(out_root, "metrics.jsonl")
    os.makedirs(out_root)
    listener = attach_metrics(spark, log)
    conv_meta = spark.read.parquet(f"{bench_dir}/conv_meta.parquet")

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    q, sinks = start_session_qc_query(
        spark, live, out_root, conv_meta, PipelineConfig(),
        trigger_seconds=trigger_s,
    )
    # run until the feed is done AND the stream has drained (no new rows
    # for ~4 triggers), then stop
    idle = 0
    last_rows = -1
    deadline = time.time() + 1800
    while time.time() < deadline:
        time.sleep(max(trigger_s, 1.0))
        p = q.lastProgress
        rows = (p or {}).get("numInputRows", 0)
        if feed_done.is_set():
            if rows == 0:
                idle += 1
            else:
                idle = 0
            if idle >= 4:
                break
    catchup = time.time() - last_feed_ts[0]
    q.stop()
    q.awaitTermination(120)
    time.sleep(2)  # listener drain
    detach_metrics(spark, listener)

    m = read_metrics(spark, log).toPandas()
    m = m[m.query_id == str(q.id)]
    data = m[m.num_input_rows > 0]
    lat = data.trigger_ms.astype(float)
    rows_total = int(data.num_input_rows.sum())
    print(
        json.dumps(
            {
                "turns": n_turns,
                "rows_seen": rows_total,
                "batches": int(len(data)),
                "trigger_s": trigger_s,
                "feed_interval_s": feed_s,
                "latency_ms": {
                    "p50": float(lat.quantile(0.5)) if len(lat) else None,
                    "p95": float(lat.quantile(0.95)) if len(lat) else None,
                    "max": float(lat.max()) if len(lat) else None,
                },
                "rows_per_batch_max": int(data.num_input_rows.max()) if len(data) else 0,
                "catchup_s_after_last_feed": round(catchup, 1),
                "async_progress": use_async,
                "audio_qc_rows": sinks["audio_qc"].read(spark).count(),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
