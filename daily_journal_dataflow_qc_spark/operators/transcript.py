"""Transcript-side operators: redaction, per-turn sentence stats, per-diary
transcript QC, and the disfluency summary.

Graft of the reference's transcript branch (phone_transcript_redaction.py,
transcript_diary_qc.py, phone_transcript_sentence_stats.py). A transcript
exists for a diary iff the diary was accepted AND its tool-call round trip
returned (reference: file reached completed_audio via SFTP pull).

Parity traps honored (SURVEY.md §7.3):
* the reference passes ``overall_db`` where ``audio_duration`` (minutes) is
  expected (phone_transcript_sentence_stats.py:74,76) — the last-sentence
  duration estimate and the disfluency table's ``length_minutes`` /
  ``disfluencies_per_minute`` inherit that bug; we reproduce it faithfully,
* min/max timestamp-space stats exclude the appended last-sentence duration
  (transcript_diary_qc.py:207 computes inner gaps only),
* per-word gap normalizes by the EARLIER sentence's word count
  (transcript_diary_qc.py:218).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.naming import with_language_marker
from ..functions.redaction import redact_udf
from ..functions.text_metrics import normalize_text, with_sentence_metrics

DIARY_KEY = ["conv_id", "session_id"]


def dedup_tool_calls(tool_calls: DataFrame, kind: str) -> DataFrame:
    """First-arrival per (conv_id, request_key) for one kind (request|return)."""
    w = Window.partitionBy("conv_id", "request_key").orderBy("ts")
    return (
        tool_calls.filter(F.col("kind") == kind)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def returned_accepted_diaries(
    audio_qc_df: DataFrame, requests: DataFrame, returns: DataFrame
) -> DataFrame:
    """Accepted diaries whose transcript round-trip completed (J8 inner path).

    Join key: the TOOL-SIDE name — the canonical diary filename with the
    conversation's language marker inserted before "submission" (S10 push
    rename, journal_transcribeme_sftp_push.py:177; the pull looks the
    finished transcript up under the same marked name,
    journal_transcribeme_sftp_pull.py:52-53).
    """
    accepted = audio_qc_df.filter(F.col("audio_approved_bool") == 1).withColumn(
        "_tool_key", with_language_marker(F.col("filename"), F.col("language"))
    )
    req_keys = requests.select("conv_id", F.col("request_key").alias("_tool_key"))
    ret_keys = returns.select("conv_id", F.col("request_key").alias("_tool_key"))
    round_trip = req_keys.join(ret_keys, ["conv_id", "_tool_key"], "inner")
    return accepted.join(round_trip, ["conv_id", "_tool_key"], "left_semi").drop(
        "_tool_key"
    )


def redacted_turns(sessioned_turns: DataFrame, diaries: DataFrame) -> DataFrame:
    """Per-turn redaction over the turns of the given diaries.

    Returns turn rows with ``text`` (redacted), ``violated`` (bool), plus the
    diary identity columns. Callers must exclude every turn of any diary with
    a violated line (reference deletes the whole output file,
    phone_transcript_redaction.py:69-72).
    """
    diary_cols = diaries.select(
        "conv_id",
        "session_id",
        "day",
        "daily_submission_number",
        "session_start",
        "overall_db",
        "filename",
        "timeofday",
        "weekday",
    )
    # broadcast the diary side: it is 10-1000x smaller than the turn stream
    # (one row per accepted+returned diary) — a sort-merge join here would
    # re-sort the whole cached turn stream (the dominant non-scaling cost at
    # 27M turns). At extreme diary counts, drop the hint and bucket instead.
    turns = sessioned_turns.join(F.broadcast(diary_cols), DIARY_KEY, "inner")
    red = redact_udf(normalize_text(F.col("text")))
    return turns.withColumns(
        {"text": red.getField("redacted"), "violated": red.getField("violated")}
    )


def split_violations(red_turns: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_turns, violated_diaries): poison whole diaries on any violation.

    Single-pass: the per-diary violation flag is a window max (one shuffle on
    the diary key the downstream stats need anyway) — no self-join, and the
    redaction UDF upstream is evaluated once.
    """
    # same partitioning AND ordering as the turn_stats windows, so Catalyst
    # plans ONE sort for the whole per-diary window chain
    w = Window.partitionBy(*DIARY_KEY).orderBy("ts", "turn_idx").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    flagged = red_turns.withColumn("_any_violated", F.max("violated").over(w))
    clean = flagged.filter(~F.col("_any_violated")).drop("_any_violated")
    violated = (
        flagged.filter(F.col("_any_violated"))
        .select(*DIARY_KEY, "filename")
        .distinct()
    )
    return clean, violated


def turn_stats(clean_turns: DataFrame) -> DataFrame:
    """Per-turn sentence stats (phone_transcript_sentence_stats.py:147-217)."""
    w = Window.partitionBy(*DIARY_KEY).orderBy("ts", "turn_idx")
    df = clean_turns.withColumn("text_lc", F.lower(F.col("text")))
    df = with_sentence_metrics(df, "text_lc")
    sec = F.col("ts").cast("double") - F.col("session_start").cast("double")
    df = df.withColumn("sec_from_start", sec).withColumn(
        "minutes_from_start", sec / 60.0
    )
    lead_sec = F.lead("sec_from_start").over(w)
    # inner gap: next sentence start - this start; for the LAST sentence the
    # reference substitutes audio_duration*60 - last_start, where
    # "audio_duration" is actually overall_db (reproduced bug, see module doc)
    df = df.withColumn(
        "estimated_sentence_seconds",
        F.when(lead_sec.isNotNull(), lead_sec - F.col("sec_from_start")).otherwise(
            F.col("overall_db") * 60.0 - F.col("sec_from_start")
        ),
    ).withColumn("inner_gap_seconds", lead_sec - F.col("sec_from_start"))
    return df.withColumns(
        {
            "inaudibles_and_questionables": (
                F.col("inaudible_count") + F.col("questionable_count")
            ).cast("int"),
            "repeats": (F.col("stutter_repeats") + F.col("word_repeats")).cast("int"),
            "is_ascii": F.col("text").rlike("^[\\x00-\\x7F]*$"),
        }
    )


def transcript_qc(stats: DataFrame) -> DataFrame:
    """Per-diary transcript QC row (transcript_diary_qc.py:174-242, A2-A4, W2-W4)."""
    gap_per_word = F.col("inner_gap_seconds") / F.col("word_count")
    return (
        stats.groupBy(
            "conv_id",
            "session_id",
            "day",
            "timeofday",
            "weekday",
            "daily_submission_number",
            "filename",
        )
        .agg(
            F.countDistinct("role").alias("speakerID_count"),
            F.sum(F.when(F.col("role") == "S1", 1).otherwise(0))
            .cast("int")
            .alias("S1_sentence_count"),
            F.count("*").cast("int").alias("total_sentence_count"),
            F.sum("word_count").cast("int").alias("word_count"),
            F.min("word_count").alias("min_words_in_sen"),
            F.max("word_count").alias("max_words_in_sen"),
            F.sum("inaudible_count").cast("int").alias("inaudible_count"),
            F.sum("questionable_count").cast("int").alias("questionable_count"),
            F.sum("other_bracketed_words")
            .cast("int")
            .alias("other_bracketed_notation_count"),
            F.sum("redactions").cast("int").alias("redacted_count"),
            F.round(F.max("minutes_from_start"), 3).alias("final_timestamp_minutes"),
            F.round(F.min("inner_gap_seconds"), 3).alias("min_timestamp_space_seconds"),
            F.round(F.max("inner_gap_seconds"), 3).alias("max_timestamp_space_seconds"),
            F.round(F.min(gap_per_word), 3).alias("min_timestamp_space_per_word"),
            F.round(F.max(gap_per_word), 3).alias("max_timestamp_space_per_word"),
            F.when(F.min("is_ascii"), F.lit("ASCII"))
            .otherwise(F.lit("UTF-8"))
            .alias("txt_encoding_type"),
        )
        .withColumn(
            "redacted_csv_filename",
            F.concat(
                F.regexp_replace("filename", "\\.wav$", ""), F.lit("_REDACTED.csv")
            ),
        )
        .withColumn("speakerID_count", F.col("speakerID_count").cast("int"))
    )


def disfluencies(stats: DataFrame) -> DataFrame:
    """Per-diary disfluency summary (phone_transcript_sentence_stats.py:97-118).

    Count columns are doubles (reference builds them with np.nansum) and
    ``length_minutes`` carries the overall_db value (reproduced bug).
    """
    agg = stats.groupBy(
        "conv_id", "session_id", "day", "daily_submission_number", "filename"
    ).agg(
        F.first("overall_db").alias("length_minutes"),
        F.sum("word_count").cast("double").alias("total_word_count"),
        F.sum("nonverbal_edits").cast("double").alias("nonverbal_edits_count"),
        F.sum("verbal_edits").cast("double").alias("verbal_edits_count"),
        F.sum("repeats").cast("double").alias("repeats_count"),
        F.sum("restarts").cast("double").alias("restarts_count"),
    )
    total = (
        F.col("nonverbal_edits_count")
        + F.col("verbal_edits_count")
        + F.col("repeats_count")
        + F.col("restarts_count")
    )
    return (
        agg.withColumn(
            "transcript_csv_name",
            F.concat(
                F.regexp_replace("filename", "\\.wav$", ""),
                F.lit("_REDACTED_withSentenceStats.csv"),
            ),
        )
        .withColumn("total_disfluencies", total)
        .withColumns(
            {
                "nonverbal_edits_per_word": F.col("nonverbal_edits_count")
                / F.col("total_word_count"),
                "verbal_edits_per_word": F.col("verbal_edits_count")
                / F.col("total_word_count"),
                "repeats_per_word": F.col("repeats_count") / F.col("total_word_count"),
                "restarts_per_word": F.col("restarts_count")
                / F.col("total_word_count"),
                "disfluencies_per_minute": F.col("total_disfluencies")
                / F.col("length_minutes"),
            }
        )
    )
