"""Incrementally-maintained compact key store over a growing file directory.

Replaces the "re-read the whole side table every micro-batch" anti-pattern
(O(batches x table) scans) with incremental ingestion: each micro-batch reads
ONLY files not yet ingested (tracked transactionally in the per-batch commit
manifest), projects them to the few key columns, and appends them to a
compact parquet store. Consumers read the accumulated key set — one row per
logical key, orders of magnitude smaller than the source table — instead of
the full-width source.

Exactly-once: ingestion piggybacks on IdempotentBatchSink's atomic per-batch
manifest, so a replayed batch neither re-ingests nor double-counts; files
that appear between crash and replay are picked up by the next live batch.

At 100-TB scale the store stays proportional to the number of DISTINCT keys
(here: one row per tool-call round trip, ~1000x fewer than turns); periodic
compaction of batch files into one sorted store is the standard follow-up.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .sink import IdempotentBatchSink


class IncrementalKeyStore:
    def __init__(self, root: str, name: str):
        self.sink = IdempotentBatchSink(root, name)

    def _ingested_files(self) -> set[str]:
        files: set[str] = set()
        mdir = self.sink.manifest_dir
        for m in os.listdir(mdir):
            if not (m.startswith("batch-") and m.endswith(".json")):
                continue
            try:
                files.update(json.load(open(os.path.join(mdir, m))).get("files", []))
            except (json.JSONDecodeError, OSError):
                continue  # uncommitted/truncated manifest: not ingested
        return files

    @staticmethod
    def _list_parquet(src_dir: str) -> list[str]:
        if not os.path.isdir(src_dir):
            return []
        return sorted(
            os.path.join(src_dir, f)
            for f in os.listdir(src_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )

    def ingest(
        self,
        spark: SparkSession,
        src_dir: str,
        batch_id: int,
        schema,
        project,
    ) -> None:
        """Ingest files of ``src_dir`` not yet seen; ``project`` maps the raw
        DataFrame to the compact key frame to store. No-op on replayed
        batches (manifest already committed)."""
        if self.sink.committed(batch_id):
            return
        new = [f for f in self._list_parquet(src_dir) if f not in self._ingested_files()]
        if new:
            keys = project(spark.read.schema(schema).parquet(*new)).distinct()
        else:
            keys = project(spark.createDataFrame([], schema)).limit(0)
        self.sink.write(keys, batch_id, extra={"files": new})

    def read(self, spark: SparkSession) -> DataFrame:
        """Accumulated distinct key set across all committed batches."""
        return self.sink.read(spark).distinct()
