import os

import pandas as pd
from pyspark.sql import functions as F

from daily_journal_dataflow_qc_spark.operators.snapshots import (
    union_align,
    write_latest_snapshot,
)


def test_replace_latest_snapshot(spark, tmp_path):
    root = str(tmp_path)
    df1 = spark.createDataFrame(
        pd.DataFrame({"day": [3, 1, 1], "timeofday": ["10:00:00", "09:00:00", "09:00:00"], "v": [1, 2, 3]})
    )
    p1 = write_latest_snapshot(df1, root, "diaryAudioQC")
    assert p1.endswith("day1to3")
    got = spark.read.parquet(p1).toPandas()
    assert len(got) == 2  # (day,timeofday) dedup kept one of the day-1 rows

    # a later snapshot REPLACES the old day-range directory
    df2 = spark.createDataFrame(
        pd.DataFrame({"day": [1, 5], "timeofday": ["09:00:00", "11:00:00"], "v": [2, 9]})
    )
    p2 = write_latest_snapshot(df2, root, "diaryAudioQC")
    assert p2.endswith("day1to5")
    remaining = os.listdir(os.path.join(root, "diaryAudioQC"))
    assert remaining == ["day1to5"]


def test_union_align(spark):
    a = spark.createDataFrame(pd.DataFrame({"x": [1], "y": ["a"]}))
    b = spark.createDataFrame(pd.DataFrame({"x": [2], "z": [0.5]}))
    out = union_align(a, b).toPandas().sort_values("x").reset_index(drop=True)
    assert list(out.columns) == ["x", "y", "z"]
    assert out.y.iloc[0] == "a" and pd.isna(out.y.iloc[1])
    assert pd.isna(out.z.iloc[0]) and out.z.iloc[1] == 0.5
