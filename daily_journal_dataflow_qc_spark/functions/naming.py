"""Filename operators: the language-marker exchange rename (S10), canonical
filename field extraction (F1), and basename/dirname (F12).

Reference semantics:
* S10 — the SFTP push renames ``<root>_submission<N>.wav`` to
  ``<root>_<LANGUAGE>_submission<N>.wav`` on the exchange side
  (journal_transcribeme_sftp_push.py:177), and the pull constructs the same
  marked name to look up the finished transcript, storing it locally
  WITHOUT the marker (journal_transcribeme_sftp_pull.py:52-53). The marked
  name is therefore the tool-side join key of the round trip; the local
  name is the engine-side key.
* F1 — day/submission extraction from the canonical name
  (audio_diary_qc.py:93-94): ``int(name.split("_day")[-1].split("_")[0])``
  and ``int(name.split("_submission")[-1].split(".wav")[0])``.
* F12 — ``path.split("/")[-1]`` (mindlamp_accounting.py:157).

The split-index formulas are mirrored exactly — including the reference's
behavior of keeping only the first two ``split("submission")`` segments, so
a pathological name containing "submission" twice is truncated the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def with_language_marker(name: Column, language: Column) -> Column:
    """S10 push rename: insert ``<LANGUAGE>_`` before the first "submission".

    ``name.split("submission")[0] + language + "_submission" +
    name.split("submission")[1]`` — verbatim reference formula for canonical
    names. A name with NO "submission" segment passes through UNCHANGED
    (the reference raises IndexError there — a malformed name never reaches
    the push; passing through keeps the engine and the pandas oracle in
    agreement instead of diverging silently, see oracle._tool_key)."""
    parts = F.split(name, "submission")
    marked = F.concat(
        parts.getItem(0), language, F.lit("_submission"), F.element_at(parts, 2)
    )
    return F.when(F.size(parts) >= 2, marked).otherwise(name)


def strip_language_marker(name: Column, language: Column) -> Column:
    """S10 pull inverse: remove the ``<LANGUAGE>_`` marker before
    "submission", recovering the local engine-side name."""
    marked = F.concat(language, F.lit("_submission"))
    pos = F.instr(name, marked)
    return F.when(pos > 0, F.concat(
        F.substring(name, F.lit(1), pos - 1),
        F.substring(name, pos + F.length(language) + F.lit(1), F.length(name)),
    )).otherwise(name)


def filename_day(name: Column) -> Column:
    """F1: study day from the canonical diary name (last "_day" segment up to
    the next underscore), as an int."""
    tail = F.element_at(F.split(name, "_day"), -1)
    return F.split(tail, "_").getItem(0).cast("int")


def filename_submission(name: Column) -> Column:
    """F1: submission number from the canonical diary name (last
    "_submission" segment up to ".wav"), as an int."""
    tail = F.element_at(F.split(name, "_submission"), -1)
    return F.split(tail, "\\.wav").getItem(0).cast("int")


def basename(path: Column) -> Column:
    """F12: last path component (``x.split("/")[-1]``)."""
    return F.element_at(F.split(path, "/"), -1)


def dirname(path: Column) -> Column:
    """F12 companion: everything before the last "/" ('' when no slash)."""
    b = basename(path)
    return F.when(
        F.length(path) > F.length(b),
        F.substring(path, F.lit(1), F.length(path) - F.length(b) - F.lit(1)),
    ).otherwise(F.lit(""))
