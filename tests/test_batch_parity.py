"""Golden-parity suite: the Spark batch pipeline must reproduce the pandas
oracle's accepted / rejected / flagged / per-turn row sets exactly
(BASELINE.json invariant: per-turn text equality under stable
(conv_id, turn_idx) ordering)."""

import pandas as pd
import pytest

from daily_journal_dataflow_qc_spark.oracle import pandas_oracle
from daily_journal_dataflow_qc_spark.pipeline import run_batch_from_dir

from .compare_util import compare_frames

ROUNDED = {
    "length_minutes": 2e-3,
    "final_timestamp_minutes": 2e-3,
    "min_timestamp_space_seconds": 2e-3,
    "max_timestamp_space_seconds": 2e-3,
    "min_timestamp_space_per_word": 2e-3,
    "max_timestamp_space_per_word": 2e-3,
}


@pytest.fixture(scope="module")
def outputs(spark, synth_dir, cfg):
    return run_batch_from_dir(spark, synth_dir, cfg)


@pytest.fixture(scope="module")
def golden(synth_pdfs, cfg):
    transcripts, tool_calls, conv_meta = synth_pdfs
    return pandas_oracle.compute(transcripts, tool_calls, conv_meta, cfg)


def test_accepted_parity(outputs, golden):
    got = outputs.accepted.toPandas()
    assert len(got) > 10, "accepted set suspiciously small"
    compare_frames(got, golden["accepted"], ["conv_id", "day"], rounded_atol_cols=ROUNDED)


def test_rejected_parity(outputs, golden):
    got = outputs.rejected.toPandas()
    assert len(got) > 10, "rejected set suspiciously small"
    compare_frames(
        got,
        golden["rejected"],
        ["conv_id", "day", "daily_submission_number"],
        rounded_atol_cols=ROUNDED,
    )


def test_issues_parity(outputs, golden):
    got = outputs.issues.toPandas()
    assert len(got) > 0, "issues log empty — anomaly fixtures not firing"
    # all six flag families must fire on the fixture data
    assert golden["issues"]["error_message"].nunique() >= 5
    from daily_journal_dataflow_qc_spark.operators.compile import MSG_UPLOAD_FAILED

    assert MSG_UPLOAD_FAILED in set(golden["issues"]["error_message"]), (
        "S8 exhausted-retries fixture not firing"
    )
    compare_frames(
        got,
        golden["issues"],
        ["conv_id", "filename", "file_stage", "error_message"],
    )


def test_turn_stats_parity(outputs, golden):
    got = outputs.turn_stats.toPandas()
    want = golden["turn_stats"]
    assert len(got) > 1000
    compare_frames(got, want, ["conv_id", "turn_idx"])


def test_per_turn_text_equality(outputs, golden):
    """The north-rule invariant, asserted directly."""
    got = (
        outputs.turn_stats.toPandas()[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        golden["turn_stats"][["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_acceptance_predicate_split(outputs, golden):
    """Accepted + rejected partition the diary set; no diary in both."""
    acc = outputs.accepted.toPandas()
    rej = outputs.rejected.toPandas()
    a = set(zip(acc["conv_id"], acc["day"], acc["daily_submission_number"]))
    r = set(zip(rej["conv_id"], rej["day"], rej["daily_submission_number"]))
    assert not (a & r)
    # every accepted diary is a first submission
    assert (acc["daily_submission_number"] == 1).all()
