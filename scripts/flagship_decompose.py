#!/usr/bin/env python
"""One-off decomposition of run_batch_staged for the r07 tail: time the
staged write and each output materialization separately (warm process,
same conf as bench.py), and dump the issues plan. Diagnostic only — the
timed surface stays bench.py."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from daily_journal_dataflow_qc_spark.config import PipelineConfig
from daily_journal_dataflow_qc_spark.datagen import write_parquet_scaled
from daily_journal_dataflow_qc_spark.pipeline import load_inputs, run_batch_staged
from daily_journal_dataflow_qc_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    bench_dir = f"/tmp/djdq_bench_b120_r{replicas}"
    write_parquet_scaled(bench_dir, base_convs=120, replicas=replicas)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    conf = {
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.local.dir": os.path.join(scratch, "djdq_spark_local"),
    }
    spark = get_spark(app_name="djdq-flagship-decompose", extra_conf=conf)
    transcripts, tool_calls, conv_meta = load_inputs(spark, bench_dir)
    staging_dir = os.path.join(scratch, f"djdq_staging_dec_{os.getpid()}")

    concurrent = len(sys.argv) > 2 and sys.argv[2] == "concurrent"
    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        out = run_batch_staged(
            spark, transcripts, tool_calls, conv_meta, staging_dir, PipelineConfig()
        )
        t_build = time.time()
        names = ("accepted", "rejected", "turn_stats", "issues")
        if concurrent:
            # bench.py's ThreadPool fan-out, but with per-output finish times
            from concurrent.futures import ThreadPoolExecutor

            def timed(name):
                noop(getattr(out, name))
                return name, time.time() - t_build

            with ThreadPoolExecutor(4) as pool:
                for name, sec in pool.map(timed, names):
                    print(f"rep{rep} {name} finished at +{sec:.3f}s", flush=True)
        else:
            for name in names:
                t = time.time()
                noop(getattr(out, name))
                print(f"rep{rep} {name}: {time.time() - t:.3f}s", flush=True)
        print(
            f"rep{rep} staged-build(plan+qc persist+staged write+flags+rollup): "
            f"{t_build - t0:.3f}s  total: {time.time() - t0:.3f}s",
            flush=True,
        )

    import contextlib
    import io
    import shutil

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.issues.explain(mode="formatted")
    with open("/tmp/issues_plan.txt", "w") as f:
        f.write(buf.getvalue())
    shutil.rmtree(staging_dir, ignore_errors=True)
    print("issues plan -> /tmp/issues_plan.txt")


if __name__ == "__main__":
    main()
