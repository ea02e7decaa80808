"""Sentence-level text metrics as Spark built-in (JVM-side, codegen'd) columns.

Each function reproduces one scalar operator of the reference
(SURVEY.md §2.8, F3-F10) with exact parity semantics:

* words are split on a SINGLE LITERAL SPACE — consecutive spaces create empty
  "words" that still count (reference transcript_diary_qc.py:181),
* substring counts are non-overlapping occurrence counts
  (reference ``str.count``, transcript_diary_qc.py:187-190),
* the nonverbal-edit regex is applied to ``" " + "  ".join(words) + " "``
  (double-space hack so adjacent matches can't overlap,
  phone_transcript_sentence_stats.py:189-195).

All functions expect an ALREADY-LOWERCASED text column (reference lowercases
once before all counting, transcript_diary_qc.py:179).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .arrays import bind_array

NONVERBAL_EDIT_PATTERN = "[^a-z]u+[hm]+[^a-z]"


def substr_count(col: Column, pat: str) -> Column:
    """Non-overlapping occurrence count of literal ``pat`` (F5)."""
    return ((F.length(col) - F.length(F.replace(col, F.lit(pat), F.lit("")))) / len(pat)).cast("int")


def words(col: Column) -> Column:
    """Split on a single literal space, keeping empty tokens (F4)."""
    return F.split(col, " ", -1)


def word_count(col: Column) -> Column:
    return F.size(words(col))


def inaudible_count(col: Column) -> Column:
    return substr_count(col, "[inaudible]")


def questionable_count(col: Column) -> Column:
    # "?]": assume a bracket never follows '?' unless the word is bracketed
    # (transcript_diary_qc.py:188)
    return substr_count(col, "?]")


def other_bracket_count(col: Column) -> Column:
    # brackets besides inaudible/questionable (transcript_diary_qc.py:190)
    return (substr_count(col, "]") - substr_count(col, "?]") - substr_count(col, "[inaudible]")).cast("int")


def redacted_count(col: Column) -> Column:
    # counts the substring "redacted" in lowercased text (transcript_diary_qc.py:189)
    return substr_count(col, "redacted")


def nonverbal_edits(col: Column) -> Column:
    """Count of uh/um-style fillers via the reference's double-space hack (F6)."""
    padded = F.concat(F.lit(" "), F.array_join(words(col), "  "), F.lit(" "))
    return F.regexp_count(padded, F.lit(NONVERBAL_EDIT_PATTERN)).cast("int")


def verbal_edits(col: Column) -> Column:
    """count("like,") + count("you know,") + count("i mean,") (F7)."""
    return (substr_count(col, "like,") + substr_count(col, "you know,") + substr_count(col, "i mean,")).cast("int")


def stutter_repeats(col: Column) -> Column:
    """Tokens like ``w-word`` where the pre-dash prefix starts the post-dash
    segment (F8, phone_transcript_sentence_stats.py:208).

    Reference condition per token y: parts = y.split("-");
    len(parts) > 1 and parts[0] == parts[1][:len(parts[0])]
    — i.e. parts[1] startswith parts[0] (the length check is implied).
    """

    def is_stutter(y: Column) -> Column:
        parts = F.split(y, "-", -1)
        return (F.size(parts) > 1) & parts.getItem(1).startswith(parts.getItem(0))

    return F.size(F.filter(words(col), is_stutter)).cast("int")


def word_repeats(col: Column) -> Column:
    """Adjacent tokens equal after comma removal (F9, W7). The split array
    is bound once (bind_array): the two slices and their size arguments
    would otherwise each re-split the text (4 splits per row)."""

    def count_pairs(arr: Column) -> Column:
        pairs = F.zip_with(
            F.slice(arr, 1, F.size(arr) - 1),
            F.slice(arr, 2, F.size(arr) - 1),
            lambda a, b: (F.translate(a, ",", "") == F.translate(b, ",", "")).cast("int"),
        )
        return F.aggregate(pairs, F.lit(0), lambda acc, x: acc + x)

    return F.coalesce(bind_array(words(col), count_pairs), F.lit(0)).cast("int")


def restarts(col: Column) -> Column:
    """count("--") — sentence restarts / long pauses (F10)."""
    return substr_count(col, "--")


def normalize_text(col: Column) -> Column:
    """F14: tab -> space, strip CR, strip trailing whitespace
    (reference transcript_side.sh:185,214-215 + line.rstrip() in redaction)."""
    return F.rtrim(F.translate(col, "\t\r", "  "))


def with_sentence_metrics(df, text_col: str = "text_lc", prefix: str = ""):
    """Attach the full per-sentence metric set in one projection (single pass,
    whole-stage codegen; replaces the reference's 8 list comprehensions)."""
    c = F.col(text_col)
    return df.withColumns(
        {
            f"{prefix}word_count": word_count(c),
            f"{prefix}inaudible_count": inaudible_count(c),
            f"{prefix}questionable_count": questionable_count(c),
            f"{prefix}other_bracketed_words": other_bracket_count(c),
            f"{prefix}redactions": redacted_count(c),
            f"{prefix}nonverbal_edits": nonverbal_edits(c),
            f"{prefix}verbal_edits": verbal_edits(c),
            f"{prefix}stutter_repeats": stutter_repeats(c),
            f"{prefix}word_repeats": word_repeats(c),
            f"{prefix}restarts": restarts(c),
        }
    )
