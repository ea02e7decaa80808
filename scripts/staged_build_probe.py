#!/usr/bin/env python
"""Time ONLY the run_batch_staged build phase (staged write + persists),
best-of-N in one process. Diagnostic for the r07 lifecycle A/B."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daily_journal_dataflow_qc_spark.config import PipelineConfig
from daily_journal_dataflow_qc_spark.datagen import write_parquet_scaled
from daily_journal_dataflow_qc_spark.pipeline import load_inputs, run_batch_staged
from daily_journal_dataflow_qc_spark.session import get_spark


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    bench_dir = f"/tmp/djdq_bench_b120_r{replicas}"
    write_parquet_scaled(bench_dir, base_convs=120, replicas=replicas)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    conf = {
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.local.dir": os.path.join(scratch, "djdq_spark_local"),
    }
    spark = get_spark(app_name="djdq-staged-probe", extra_conf=conf)
    transcripts, tool_calls, conv_meta = load_inputs(spark, bench_dir)
    staging_dir = os.path.join(scratch, f"djdq_staging_sp_{os.getpid()}")
    walls = []
    for rep in range(reps):
        spark.catalog.clearCache()
        t0 = time.time()
        run_batch_staged(
            spark, transcripts, tool_calls, conv_meta, staging_dir, PipelineConfig()
        )
        walls.append(round(time.time() - t0, 3))
    import shutil

    shutil.rmtree(staging_dir, ignore_errors=True)
    print(f"staged-build walls: {walls}  best={min(walls[1:]):.3f}")


if __name__ == "__main__":
    main()
