"""End-to-end batch QC pipeline (the flagship DAG).

One declarative Spark plan replacing the reference's three bash branches
(audio_side.sh -> transcript_side.sh -> subject_summaries_update.sh):

    transcripts --dedup--> sessionize --> diary identity --> audio QC --+--> rejected
    tool_calls  --dedup requests/returns--------------------------------+--> issues
    accepted x returned --> redact --> turn stats --> transcript QC ----+--> accepted
                                               \\--> disfluencies ------/

The per-subject bash loop disappears into hash partitioning by conv_id; the
whole identity stage is one shuffle; conv_meta is broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT_CONFIG, PipelineConfig
from .operators import compile as compile_ops
from .operators import diaries as diary_ops
from .operators import transcript as transcript_ops


@dataclass
class PipelineOutputs:
    accepted: DataFrame
    rejected: DataFrame
    issues: DataFrame
    turn_stats: DataFrame
    audio_qc: DataFrame
    transcript_qc: DataFrame
    disfluencies: DataFrame


def load_inputs(spark: SparkSession, data_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    transcripts = spark.read.parquet(f"{data_dir}/transcripts.parquet")
    tool_calls = spark.read.parquet(f"{data_dir}/tool_calls.parquet")
    conv_meta = spark.read.parquet(f"{data_dir}/conv_meta.parquet")
    return transcripts, tool_calls, conv_meta


def run_batch(
    transcripts: DataFrame,
    tool_calls: DataFrame,
    conv_meta: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    persist_intermediates: bool = False,
) -> PipelineOutputs:
    """Build the four output row sets.

    persist_intermediates: cache the shared turn-level stages (sessionized
    turns, per-turn stats) so materializing all four outputs computes the
    expensive windows + redaction UDF once — the batch analogue of the
    streaming job's single-pass fan-out to multiple sinks.
    """
    # identity stage (single shuffle by conv_id)
    turns = diary_ops.dedup_turns(transcripts)
    sessioned = diary_ops.sessionize(turns, cfg)
    if persist_intermediates:
        sessioned = sessioned.persist()
    diaries = diary_ops.diary_identity(sessioned, conv_meta, cfg)
    qc = diary_ops.audio_qc(diaries, cfg)
    if persist_intermediates:
        qc = qc.persist()

    # tool-call round trip (J8 batch form)
    requests = transcript_ops.dedup_tool_calls(tool_calls, "request")
    returns = transcript_ops.dedup_tool_calls(tool_calls, "return")
    returned = transcript_ops.returned_accepted_diaries(qc, requests, returns)

    # transcript side
    red = transcript_ops.redacted_turns(sessioned, returned)
    if persist_intermediates:
        red = red.persist()  # the Python (Arrow) boundary — evaluate once
    clean_turns, violated = transcript_ops.split_violations(red)
    stats = transcript_ops.turn_stats(clean_turns)
    if persist_intermediates:
        stats = stats.persist()
    tqc = transcript_ops.transcript_qc(stats)
    disf = transcript_ops.disfluencies(stats)

    # final row sets
    accepted = compile_ops.accepted_set(qc, tqc, disf)
    rejected = compile_ops.rejected_set(qc)
    issues = compile_ops.issues_set(qc, requests, returns, violated, cfg)

    turn_stats_out = stats.select(
        "conv_id",
        "turn_idx",
        "day",
        "daily_submission_number",
        "role",
        "text",
        "word_count",
        "inaudibles_and_questionables",
        "other_bracketed_words",
        "redactions",
        "estimated_sentence_seconds",
        "nonverbal_edits",
        "verbal_edits",
        "stutter_repeats",
        "word_repeats",
        "repeats",
        "restarts",
    )  # no global sort: the (conv_id, turn_idx) parity ordering is applied
    # by consumers/tests; a range shuffle of the widest output is wasted work

    return PipelineOutputs(
        accepted=accepted,
        rejected=rejected,
        issues=issues,
        turn_stats=turn_stats_out,
        audio_qc=qc,
        transcript_qc=tqc,
        disfluencies=disf,
    )


def run_batch_from_dir(
    spark: SparkSession,
    data_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    persist_intermediates: bool = False,
) -> PipelineOutputs:
    transcripts, tool_calls, conv_meta = load_inputs(spark, data_dir)
    return run_batch(
        transcripts, tool_calls, conv_meta, cfg, persist_intermediates=persist_intermediates
    )
