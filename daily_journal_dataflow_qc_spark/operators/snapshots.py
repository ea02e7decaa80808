"""S7/O5/U4: replace-latest snapshot sink + schema-aligned union.

Graft of the reference's DPDash copy protocol (audio_diary_qc.py:213-227,
transcript_diary_qc.py:271-286): delete the previous ``*-day{a}to{b}`` copy,
drop (day, timeofday) duplicates, and write a renamed latest snapshot whose
name carries the min/max day range. Here the "filename" is a partition-style
snapshot directory; the overwrite is atomic per snapshot dir.

``union_align`` is the reference's fill-missing-columns concat
(diary_qc_compilation.py:140-158): union frames whose schemas drifted,
null-filling absent columns on either side (U4).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_snapshot(df: DataFrame, day_col: str = "day") -> tuple[DataFrame, str]:
    """(deduped snapshot df, 'day{min}to{max}' range tag)."""
    bounds = df.agg(
        F.min(day_col).alias("lo"), F.max(day_col).alias("hi")
    ).head()
    tag = f"day{bounds['lo']}to{bounds['hi']}"
    snap = df.dropDuplicates([day_col, "timeofday"]).orderBy(day_col)
    return snap, tag


def write_latest_snapshot(
    df: DataFrame, root: str, name: str, day_col: str = "day"
) -> str:
    """Replace any previous snapshot of ``name`` with the current one
    (reference deletes old ``*-day*to*.csv`` before writing the new copy)."""
    snap, tag = latest_snapshot(df, day_col)
    base = os.path.join(root, name)
    os.makedirs(base, exist_ok=True)
    for old in os.listdir(base):
        if old.startswith("day"):
            shutil.rmtree(os.path.join(base, old), ignore_errors=True)
    out = os.path.join(base, tag)
    snap.write.mode("overwrite").parquet(out)
    return out


def union_align(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ALL with schema alignment (missing columns null-filled)."""
    return a.unionByName(b, allowMissingColumns=True)
