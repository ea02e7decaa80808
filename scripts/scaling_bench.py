#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol).

Runs the identical flagship QC pipeline on the same input at N and 4N local
cores (fresh JVM per level via subprocess), reports throughput at both and
the scaling efficiency  eff = (turns/s at 4N) / (4 * turns/s at N), target
>= 0.8. Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(master: str, replicas: int) -> dict:
    """One fresh-JVM bench run, CPU-PINNED to exactly the core count of the
    level: unpinned local[N] leaks extra host cores to GC / Python UDF
    workers / shuffle IO threads, inflating the small-N baseline and
    understating scaling efficiency. taskset emulates an N-core executor
    faithfully (all of the executor's threads share its N cores)."""
    import shutil as _sh

    cores = int(master[master.index("[") + 1 : -1])
    cmd = [
        sys.executable,
        os.path.join(REPO, "bench.py"),
        "--master",
        master,
        "--flagship-only",
        "--replicas",
        str(replicas),
    ]
    if _sh.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n4 = 4 * n
    # best-of-N per level: the sandbox host is shared (load avg ~10 from
    # other tenants), so single runs are noisy — best-of filters the noise
    def best(master):
        runs = [run_level(master, replicas) for _ in range(repeats)]
        return max(runs, key=lambda r: r["turns_per_sec"])

    r8 = best(f"local[{n}]")
    r32 = best(f"local[{n4}]")
    tps8, tps32 = r8["turns_per_sec"], r32["turns_per_sec"]
    eff = tps32 / (4.0 * tps8)
    md = f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Protocol (BASELINE.md): identical flagship QC-pipeline job (single-pass
staged plan), identical input ({r8['bench_turns']:,} turns of deterministic
seeded transcripts), run at two parallelism levels in fresh JVMs.
`spark.sql.shuffle.partitions` is a STATIC 256 at both levels with AQE
partition coalescing (a static width scaled to the core count capped the
large window sorts below per-task memory and spilled — see round-1 notes);
`spark.sql.files.maxPartitionBytes` is lowered to 16m so leaf-scan
parallelism is set by the data, not by the single-file bench layout; scratch
(shuffle dirs + the staged turn-stats table) lives on tmpfs because this
single-host bench shares ONE disk across every core, whereas a real
cluster's per-executor scratch I/O scales with executor count. Each level is
CPU-PINNED (taskset) to exactly its core count so GC / Python-worker /
shuffle-IO threads cannot leak onto idle host cores and inflate the small-N
baseline.

| level | master | wall (s) | throughput (turns/s) |
|---|---|---|---|
| N | local[{n}] | {r8['queries']['qc_pipeline']} | {tps8:,.1f} |
| 4N | local[{n4}] | {r32['queries']['qc_pipeline']} | {tps32:,.1f} |

**Scaling efficiency** `eff = (turns/s at 4N) / (4 x turns/s at N)` =
**{eff:.3f}** (target >= 0.8).

Caveats: single-host local mode shares one memory bus and disk, so this
understates true multi-executor scaling for shuffle-heavy stages; the
pipeline is one conv_id-partitioned shuffle + one diary-keyed shuffle, both
of which scale with executors on a real cluster.

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    target = os.path.join(REPO, "BENCH", "BASELINE.md")
    # REPLACE only the headline two-cluster-size section; every appended
    # "### ..." section (dedup/ANN scale-out, per-round measurement notes)
    # is preserved verbatim below it
    tail = ""
    if os.path.isfile(target):
        old = open(target).read()
        idx = old.find("\n### ")
        if idx != -1:
            tail = old[idx:]
    with open(target, "w") as f:
        f.write(md + tail)
    print(md)


if __name__ == "__main__":
    main()
