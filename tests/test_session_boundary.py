"""Sessionization boundary semantics: batch lag-based sessionize, Spark's own
session_window, and the pandas oracle must agree at sub-second (microsecond)
precision and at the exact-gap boundary. Spark merges a session INCLUSIVELY
(next_start <= last_ts + gap): a turn arriving exactly `gap` after the
previous one stays in the SAME session; only a strictly larger gap splits."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from daily_journal_dataflow_qc_spark import schemas
from daily_journal_dataflow_qc_spark.operators.diaries import sessionize


def _turns_pdf():
    t0 = pd.Timestamp("2023-03-01 10:00:00", tz="UTC")
    offsets = [
        0.0,             # session 1
        1799.999999,     # still session 1 (just under the 1800s gap)
        1799.999999 + 1800.0,            # exactly 1800s later -> SAME session
        1799.999999 + 1800.0 + 1800.000001,  # 1800.000001s later -> session 2
        1799.999999 + 1800.0 + 1800.000001 + 0.25,  # sub-second follow-up
    ]
    return pd.DataFrame(
        {
            "conv_id": ["cA"] * len(offsets),
            "turn_idx": pd.array(range(1, len(offsets) + 1), dtype="int32"),
            "role": ["S1"] * len(offsets),
            "text": ["hello there"] * len(offsets),
            "tool": [None] * len(offsets),
            "ts": [t0 + dt.timedelta(seconds=s) for s in offsets],
        }
    )


def test_batch_sessionize_matches_session_window_and_oracle(spark, cfg):
    pdf = _turns_pdf()
    sdf = spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)

    got = (
        sessionize(sdf, cfg)
        .select("turn_idx", "session_id")
        .toPandas()
        .sort_values("turn_idx")["session_id"]
        .tolist()
    )
    assert got == [1, 1, 1, 2, 2], got

    # Spark's own session_window on the same (batch) frame: window membership
    # must partition the turns identically (this pins the engine to Spark's
    # actual merge rule — a unix_timestamp()-truncated or >=-boundary
    # implementation fails here)
    sw = (
        sdf.groupBy("conv_id", F.session_window("ts", f"{cfg.session_gap_minutes} minutes"))
        .agg(F.sort_array(F.collect_list("turn_idx")).alias("turns"))
        .orderBy("session_window.start")
        .toPandas()
    )
    assert [list(t) for t in sw["turns"]] == [[1, 2, 3], [4, 5]], sw

    # pandas oracle boundary rule (gap > gap_sec starts a session)
    gaps = pdf["ts"].diff().dt.total_seconds()
    oracle_sid = ((gaps.isna()) | (gaps > cfg.session_gap_minutes * 60)).astype(int).cumsum()
    assert oracle_sid.tolist() == got
