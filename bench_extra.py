#!/usr/bin/env python
"""Round-7 optimization measurement harness (guide §1: measure first).

Isolates each declared bench query with the noop sink (same methodology as
the frozen bench.py: one untimed warm pass, then best-of-N timed), labels
jobs, and optionally dumps .explain("formatted") to plans/r07/.

Usage:
  python bench_extra.py                      # time all bench queries
  python bench_extra.py --queries a,b        # subset
  python bench_extra.py --explain-dir plans/r07 --suffix before
  python bench_extra.py --runs 3
Never run concurrently with bench.py or pytest (shared host).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "tpch_pricing",
    "type_rollup",
    "join_left_rollup",
    "topk_per_group",
    "sessionization",
    "lead_gaps",
    "tumbling_4am",
    "text_metrics",
    "text_analysis",
    "minhash_signature",
    "embedding_nn",
    "dedup_exact_docs",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true", help="explain only")
    args = ap.parse_args()

    from daily_journal_dataflow_qc_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scratch = os.environ.get(
        "SPARK_GRAFT_SCRATCH", "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    )
    conf = {
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.local.dir": os.path.join(scratch, "djdq_spark_local"),
    }
    spark = get_spark(app_name="djdq-bench-extra", extra_conf=conf)

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else BENCH_QUERIES
    load1 = os.getloadavg()[0]

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"warm:{name}")
        materialize(qs[name](spark, sf_dir))
        best = float("inf")
        samples[name] = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.time()
            materialize(qs[name](spark, sf_dir))
            sec = time.time() - t0
            samples[name].append(round(sec, 3))
            best = min(best, sec)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)

    print(
        json.dumps(
            {
                "metric": "bench_extra_noop_isolated",
                "queries": timings,
                "samples": samples,
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf_dir": sf_dir,
                "load1_at_start": round(load1, 2),
                "load1_at_end": round(os.getloadavg()[0], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
