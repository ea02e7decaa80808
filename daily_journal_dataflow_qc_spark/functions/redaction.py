"""PII redaction rewrite (F11) as a vectorized pandas/Arrow UDF.

Semantics re-derived from the reference algorithm
(phone_transcript_redaction.py:38-114), NOT copied: every ``{...}`` group has
each space-separated word inside replaced by ``REDACTED`` with braces
preserved; a brace-convention violation (a segment between two ``{`` whose
``}``-split does not yield exactly 2 parts) poisons the WHOLE transcript
(reference deletes the output file, :69-72,94-98) — callers must drop every
turn of a diary containing any violated line.

Quirks preserved for parity:
* word counting inside braces splits on single literal space, so a brace
  group ending in ``}`` counts the brace-bearing token as a word
  (reference :85-90 counts words of the raw tail including its ``}``),
* a line with no ``{`` passes through unchanged,
* output is built with a trailing ``{`` per inner group then the tail
  (:63,81), reproducing the reference's exact spacing.

This is Python-per-line inside an Arrow batch (pandas ``map``) — acceptable
because redaction is inherently a per-line rewrite with early-exit control
flow; the batch boundary (Arrow) keeps serde off the per-row path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RESULT_TYPE = T.StructType(
    [
        T.StructField("redacted", T.StringType(), True),
        T.StructField("violated", T.BooleanType(), False),
    ]
)


def redact_line(line: str) -> tuple[str | None, bool]:
    """Redact one line; returns (redacted_or_None, violated)."""
    if line is None:
        return None, False
    parts = line.split("{")
    if len(parts) == 1:
        return parts[0], False
    out = [parts[0], "{"]
    for contents in parts[1:-1]:
        sp = contents.split("}")
        if len(sp) != 2:
            return None, True
        n = len(sp[0].split(" "))
        out.append("REDACTED " * (n - 1) + "REDACTED}")
        out.append(sp[1] + "{")
    last = parts[-1]
    if last == "":
        # reference would raise on empty tail (:85 indexes [-1]); treat as a
        # convention violation so the diary is routed to the flagged set
        return None, True
    if last[-1] == "}":
        n = len(last.split(" "))
        out.append("REDACTED " * (n - 1) + "REDACTED}")
    else:
        sp = last.split("}")
        if len(sp) != 2:
            return None, True
        n = len(sp[0].split(" "))
        out.append("REDACTED " * (n - 1) + "REDACTED}" + sp[1])
    return "".join(out), False


#: structural brace-convention well-formedness (JVM regex form of the same
#: rule redact_line enforces): any prefix without '{' is unchecked (may hold
#: stray '}'), then each '{' group must contain exactly one '}' before the
#: next '{', and a trailing lone '{' (empty tail) violates. Verified
#: equivalent to redact_line's violated bit by a fuzz test
#: (tests/test_naming.py::test_jvm_violation_predicate_matches_udf).
#: inner '{' groups need exactly one '}' before the next '{'; the FINAL
#: group is laxer — reference accepts any tail that simply ends with '}'
#: (redact_line's last[-1] == '}' branch never counts braces)
_WELLFORMED_RE = "^[^{]*(\\{[^{}]*\\}[^{}]*)*(\\{[^{]*\\})?$"


def violated_line(col):
    """F11 violation flag as a pure JVM predicate (whole-stage codegen) —
    lets per-session violation flags be aggregated without routing text
    through the Python boundary a second time."""
    return F.coalesce(
        col.contains("{") & ~col.rlike(_WELLFORMED_RE), F.lit(False)
    )


@F.pandas_udf(_RESULT_TYPE)
def redact_udf(texts: pd.Series) -> pd.DataFrame:
    # fast path: lines with no '{' pass through unchanged (reference :58-60);
    # the per-line Python rewrite only runs on the brace-bearing minority
    out = pd.DataFrame({"redacted": texts, "violated": False})
    mask = texts.str.contains("{", regex=False).fillna(False)
    if mask.any():
        res = texts[mask].map(redact_line)
        out.loc[mask, "redacted"] = res.map(lambda t: t[0])
        out.loc[mask, "violated"] = res.map(lambda t: t[1])
    return out
