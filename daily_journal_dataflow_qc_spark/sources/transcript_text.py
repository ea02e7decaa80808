"""S4: raw transcript-line scan -> structured sentence rows.

Graft of the reference's awk/sed conversion (transcript_side.sh:185-217):
a transcript line is ``speakerID timestamp text`` where the timestamp is
``MM:SS.mmm`` with optional hours field and optional millis. Lines are
normalized (tab->space, CR stripped, surrounding quotes stripped) before
splitting; T5 converts the timestamp string to float minutes with the
reference's two-branch parse (transcript_diary_qc.py:199-202).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LINE_PATTERN = r"^(\S+):?\s((?:\d+:)?\d{1,2}:\d{2}(?:\.\d{1,3})?)\s(.*)$"


def normalize_line(col: Column) -> Column:
    """F14: tab->space, strip CR, strip wrapping double quotes."""
    c = F.regexp_replace(col, "\r", "")
    c = F.translate(c, "\t", " ")
    return F.regexp_replace(c, '^"(.*)"$', "$1")


def timestamp_to_minutes(ts_str: Column) -> Column:
    """T5: 'HH:MM:SS.mmm' -> minutes, fallback 'MM:SS.mmm' when no hours."""
    parts = F.split(ts_str, ":", -1)
    three = (
        parts.getItem(0).cast("double") * 60.0
        + parts.getItem(1).cast("double")
        + parts.getItem(2).cast("double") / 60.0
    )
    two = parts.getItem(0).cast("double") + parts.getItem(1).cast("double") / 60.0
    return F.when(F.size(parts) == 3, three).otherwise(two)


def drop_unparseable(parsed: DataFrame) -> DataFrame:
    """P4 explicit null-row purge — graft of transcript_diary_qc.py:131
    (``cur_trans.dropna(how='any')`` over speakerID/timefromstart/text):
    the parser deliberately emits null rows for unparseable lines so they
    are COUNTABLE, but QC must never see them. Null-safe filter pushes to
    the scan; no shuffle."""
    return parsed.na.drop(how="any", subset=["speakerID", "timefromstart", "text"])


def transcript_rows_from_lines(
    lines: DataFrame,
    line_col: str = "value",
    conv_col: str = "conv_id",
    idx_col: str = "line_no",
    base_ts_col: str = "base_ts",
) -> DataFrame:
    """S4 -> pipeline bridge: parse raw transcript lines, PURGE unparseable
    rows (P4), and shape the survivors into the transcripts schema the QC
    engine consumes (role = speakerID, event time = base_ts + the parsed
    minutes offset)."""
    parsed = drop_unparseable(parse_transcript_lines(lines, line_col))
    return parsed.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).cast("int").alias("turn_idx"),
        F.col("speakerID").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.col(base_ts_col).cast("double") + F.col("minutes") * 60.0)
        .cast("timestamp")
        .alias("ts"),
    )


def parse_transcript_lines(
    df: DataFrame, line_col: str = "value"
) -> DataFrame:
    """One sentence row per parseable line; unparseable lines get null
    speakerID (the reference's bash loop would skip them). All input
    columns other than ``line_col`` pass through (e.g. a line number).
    Feed QC through ``drop_unparseable`` (P4) — null rows are for
    accounting only."""
    line = normalize_line(F.col(line_col))
    speaker = F.regexp_extract(line, LINE_PATTERN, 1)
    stamp = F.regexp_extract(line, LINE_PATTERN, 2)
    text = F.regexp_extract(line, LINE_PATTERN, 3)
    passthrough = [c for c in df.columns if c != line_col]
    return df.select(
        *passthrough,
        F.when(speaker != "", F.regexp_replace(speaker, ":$", "")).alias("speakerID"),
        F.when(stamp != "", stamp).alias("timefromstart"),
        F.when(stamp != "", text).alias("text"),
        F.when(stamp != "", F.round(timestamp_to_minutes(stamp), 6)).alias("minutes"),
    )
