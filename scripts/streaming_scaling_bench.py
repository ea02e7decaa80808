#!/usr/bin/env python
"""Two-cluster-size scaling evidence for the STREAMING tier.

Same protocol as scripts/scaling_bench.py (taskset-pinned fresh JVMs,
identical input, N vs 4N cores) but the job under test is the full
Structured Streaming topology: time-ordered file replay -> watermarked
dedup -> session_window aggregate -> foreachBatch identity/acceptance ->
exactly-once sinks. State partition count is a FIXED job config at both
levels (like the batch bench's static shuffle width): the comparison
varies hardware only.

Usage: python scripts/streaming_scaling_bench.py [replicas] [N] [state_partitions]
Prints one JSON line per level plus the efficiency; results are appended
to BENCH/BASELINE.md by hand (this script does not overwrite it).
"""

from __future__ import annotations

import json
import os
import shutil as _sh
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_LEVEL = r"""
import os, sys, time, shutil
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from daily_journal_dataflow_qc_spark.config import PipelineConfig
from daily_journal_dataflow_qc_spark.session import get_spark
from daily_journal_dataflow_qc_spark.streaming.job import start_session_qc_query

spark = get_spark(app_name="stream-scaling", master={master!r},
                  shuffle_partitions={parts},
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "16m",
                               "spark.local.dir": "/dev/shm/djdq_spark_local"}})
import bench as B
B.warmup(spark)
bench_dir = {bench_dir!r}
stream_in = {stream_in!r}
n = spark.read.parquet(bench_dir + "/transcripts.parquet").count()
out_root = "/dev/shm/djdq_stream_scaling_" + str(os.getpid())
shutil.rmtree(out_root, ignore_errors=True)
conv_meta = spark.read.parquet(bench_dir + "/conv_meta.parquet")
t0 = time.time()
q, sinks = start_session_qc_query(spark, stream_in, out_root, conv_meta,
                                  PipelineConfig(), max_files_per_trigger=4)
ok = q.awaitTermination(3000)
wall = time.time() - t0
rows = sinks["audio_qc"].read(spark).count() if ok else -1
import json
print(json.dumps({{"master": {master!r}, "finished": ok, "turns": n,
                   "wall_sec": round(wall, 1),
                   "turns_per_sec": round(n / wall, 1),
                   "audio_qc_rows": rows}}))
shutil.rmtree(out_root, ignore_errors=True)
"""


def build_stream_input(bench_dir: str, stream_in: str) -> None:
    """Time-ordered 8-slice replay copy (event-time-ordered progression —
    a non-time-ordered sequence would watermark-drop late batches)."""
    if os.path.isdir(os.path.join(stream_in, "_READY")):
        return
    import time

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from daily_journal_dataflow_qc_spark.session import get_spark

    spark = get_spark(app_name="stream-input-prep", master="local[8]")
    _sh.rmtree(stream_in, ignore_errors=True)
    tr = spark.read.parquet(bench_dir + "/transcripts.parquet")
    qs = [i / 8.0 for i in range(1, 8)]
    bounds = tr.selectExpr(
        f"percentile(cast(ts as double), array({','.join(str(q) for q in qs)})) p"
    ).head()[0]
    prev = None
    for b in list(bounds) + [None]:
        part = tr
        if prev is not None:
            part = part.filter(F.col("ts").cast("double") >= prev)
        if b is not None:
            part = part.filter(F.col("ts").cast("double") < b)
        part.repartition(4, "conv_id").write.mode("append").parquet(stream_in)
        time.sleep(1.2)
        prev = b
    sent = tr.limit(1).select(
        F.lit("__sentinel__").alias("conv_id"),
        F.lit(1).cast("int").alias("turn_idx"),
        F.lit("S1").alias("role"),
        F.lit("end").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2090-01-01 00:00:00")).alias("ts"),
    )
    sent.coalesce(1).write.mode("append").parquet(stream_in)
    os.makedirs(os.path.join(stream_in, "_READY"), exist_ok=True)
    spark.stop()


def run_level(master: str, parts: int, bench_dir: str, stream_in: str) -> dict:
    cores = int(master[master.index("[") + 1 : -1])
    code = RUN_LEVEL.format(
        repo=REPO, master=master, parts=parts, bench_dir=bench_dir, stream_in=stream_in
    )
    cmd = [sys.executable, "-c", code]
    if _sh.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    sys.path.insert(0, REPO)
    from daily_journal_dataflow_qc_spark.datagen import write_parquet_scaled

    bench_dir = f"/tmp/djdq_bench_b120_r{replicas}"
    write_parquet_scaled(bench_dir, base_convs=120, replicas=replicas)
    stream_in = os.path.join(bench_dir, "stream_transcripts_timed")
    build_stream_input(bench_dir, stream_in)

    r1 = run_level(f"local[{n}]", parts, bench_dir, stream_in)
    r4 = run_level(f"local[{4 * n}]", parts, bench_dir, stream_in)
    eff = r4["turns_per_sec"] / (4.0 * r1["turns_per_sec"])
    print(json.dumps(r1))
    print(json.dumps(r4))
    print(
        json.dumps(
            {
                "streaming_scaling_efficiency": round(eff, 3),
                "rows_match": r1["audio_qc_rows"] == r4["audio_qc_rows"] != -1,
            }
        )
    )


if __name__ == "__main__":
    main()
