"""Alternative session backend on the Spark 4 state API v2
(``transformWithStateInPandas``): keyed per-conversation processor that
dedups, sessionizes, and aggregates diary QC sums with EXPLICIT state.

Why this variant exists (vs the declarative ``session_window`` aggregate in
streaming/job.py):

* state shape is under our control — scalar sums live in a ValueState, the
  per-turn (ts, word_count) pairs live in a ListState, which RocksDB stores
  as one KV entry PER ELEMENT: appends are O(1) and a hot session can never
  materialize one giant aggregation-buffer value,
* dedup (turn_idx high-watermark + count-min sketch, the streaming/state.py
  design) happens inside the same keyed pass — one stateful operator total,
* sessions flush EAGERLY: a turn arriving beyond the gap emits the previous
  session immediately (classic CEP close-on-next-event), and an event-time
  timer at ``session_end + gap`` closes the tail session when the watermark
  passes — so emission latency is min(next-turn, watermark), one trigger
  earlier than session_window's watermark-only emission.

Semantics note: with one open session per key, a sub-watermark-delay
out-of-order turn that would BRIDGE two already-split sessions does not
re-merge them (true session_window merges windows by overlap). The QC
fixtures — and the reference's daily diaries, 2h+ apart — never exercise
that corner; the keyed validator flags such arrivals as out_of_order.

Output schema and values match ``session_qc_aggregate`` + ``write_batch``'s
expectations, so the same ``compile_batch`` identity/acceptance stage runs
unchanged on either backend.

Environment note: transformWithStateInPandas spawns a Python runner that
imports google.protobuf; this container ships a broken protobuf (ImportError
on ``google.protobuf.descriptor``), so the end-to-end integration test is
import-gated (skips) while the processor logic itself is verified
handle-free in tests/test_streaming.py::test_tws_processor_logic_matches_sessions.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from ..config import DEFAULT_CONFIG, PipelineConfig
from .state import SKETCH_D, SKETCH_W, _PRIMES

DIARY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("has_tool_tag", T.BooleanType(), False),
        T.StructField("any_violated", T.BooleanType(), False),
        T.StructField("speakerID_count", T.IntegerType(), False),
        T.StructField("S1_sentence_count", T.IntegerType(), False),
        T.StructField("word_count", T.IntegerType(), False),
        T.StructField("min_words_in_sen", T.IntegerType(), True),
        T.StructField("max_words_in_sen", T.IntegerType(), True),
        T.StructField("inaudible_count", T.IntegerType(), False),
        T.StructField("questionable_count", T.IntegerType(), False),
        T.StructField("other_bracketed_notation_count", T.IntegerType(), False),
        T.StructField("redacted_count", T.IntegerType(), False),
        T.StructField("nonverbal_edits_count", T.DoubleType(), False),
        T.StructField("verbal_edits_count", T.DoubleType(), False),
        T.StructField("repeats_count", T.DoubleType(), False),
        T.StructField("restarts_count", T.DoubleType(), False),
        T.StructField("total_sentence_count", T.IntegerType(), False),
        T.StructField("final_timestamp_minutes", T.DoubleType(), True),
        T.StructField("min_timestamp_space_seconds", T.DoubleType(), True),
        T.StructField("max_timestamp_space_seconds", T.DoubleType(), True),
        T.StructField("min_timestamp_space_per_word", T.DoubleType(), True),
        T.StructField("max_timestamp_space_per_word", T.DoubleType(), True),
        T.StructField("txt_encoding_type", T.StringType(), False),
    ]
)

# open-session scalar sums (ValueState) — fixed size per key
_AGG_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("has_tool_tag", T.BooleanType(), False),
        T.StructField("any_violated", T.BooleanType(), False),
        T.StructField("s1_count", T.LongType(), False),
        T.StructField("word_sum", T.LongType(), False),
        T.StructField("min_words", T.LongType(), False),
        T.StructField("max_words", T.LongType(), False),
        T.StructField("inaudible", T.LongType(), False),
        T.StructField("questionable", T.LongType(), False),
        T.StructField("other_br", T.LongType(), False),
        T.StructField("redactions", T.LongType(), False),
        T.StructField("nonverbal", T.DoubleType(), False),
        T.StructField("verbal", T.DoubleType(), False),
        T.StructField("repeats", T.DoubleType(), False),
        T.StructField("restarts", T.DoubleType(), False),
        T.StructField("all_ascii", T.BooleanType(), False),
        T.StructField("roles", T.StringType(), False),  # '\x1f'-joined set
    ]
)

# per-turn compact pairs (ListState) — one RocksDB entry per element
_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType(), False),
        T.StructField("wc", T.LongType(), False),
    ]
)

# dedup sketch (ValueState): turn_idx HWM + count-min counters
_DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("hwm", T.LongType(), False),
        T.StructField("sketch", T.ArrayType(T.LongType()), False),
    ]
)


def _round3(x: float) -> float:
    return round(x, 3)


class SessionQcProcessor(StatefulProcessor):
    """Dedup + gap-sessionize + QC-aggregate one conversation's turn stream."""

    def __init__(self, gap_minutes: int):
        self.gap_us = gap_minutes * 60 * 1_000_000

    # -- StatefulProcessor contract -----------------------------------------
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.agg = handle.getValueState("agg", _AGG_SCHEMA)
        self.pairs = handle.getListState("pairs", _PAIR_SCHEMA)
        self.dedup = handle.getValueState("dedup", _DEDUP_SCHEMA)

    def close(self) -> None:
        pass

    # -- helpers -------------------------------------------------------------
    def _flush(self, conv_id: str):
        """Emit the open session as one diary row and clear its state."""
        if not self.agg.exists():
            return None
        a = self.agg.get()
        (
            start_us, end_us, n_turns, has_tool, any_viol, s1, wsum, wmin, wmax,
            inaud, quest, other, red, nonv, verb, reps, rest, all_ascii, roles,
        ) = a
        pairs = sorted(
            ((int(p[0]), int(p[1])) for p in self.pairs.get()), key=lambda p: p[0]
        )
        secs = [p[0] / 1e6 for p in pairs]
        gaps = [b - a_ for a_, b in zip(secs, secs[1:])]
        gpw = [g / pairs[i][1] if pairs[i][1] else math.nan for i, g in enumerate(gaps)]
        row = {
            "conv_id": conv_id,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(end_us, unit="us"),
            "n_turns": n_turns,
            "has_tool_tag": bool(has_tool),
            "any_violated": bool(any_viol),
            "speakerID_count": len(set(roles.split("\x1f"))) if roles else 0,
            "S1_sentence_count": int(s1),
            "word_count": int(wsum),
            "min_words_in_sen": int(wmin),
            "max_words_in_sen": int(wmax),
            "inaudible_count": int(inaud),
            "questionable_count": int(quest),
            "other_bracketed_notation_count": int(other),
            "redacted_count": int(red),
            "nonverbal_edits_count": float(nonv),
            "verbal_edits_count": float(verb),
            "repeats_count": float(reps),
            "restarts_count": float(rest),
            "total_sentence_count": int(n_turns),
            "final_timestamp_minutes": _round3((end_us - start_us) / 1e6 / 60.0),
            "min_timestamp_space_seconds": _round3(min(gaps)) if gaps else None,
            "max_timestamp_space_seconds": _round3(max(gaps)) if gaps else None,
            "min_timestamp_space_per_word": _round3(min(gpw)) if gpw else None,
            "max_timestamp_space_per_word": _round3(max(gpw)) if gpw else None,
            "txt_encoding_type": "ASCII" if all_ascii else "UTF-8",
        }
        self.agg.clear()
        self.pairs.clear()
        return row

    def _open(self, r) -> None:
        self.agg.update(
            (
                int(r.ts_us), int(r.ts_us), 1,
                bool(r.has_tool), bool(r.violated),
                int(r.is_s1), int(r.word_count), int(r.word_count), int(r.word_count),
                int(r.inaudible_count), int(r.questionable_count),
                int(r.other_bracketed_words), int(r.redactions),
                float(r.nonverbal_edits), float(r.verbal_edits),
                float(r.repeats), float(r.restarts),
                bool(r.is_ascii), str(r.role),
            )
        )
        self.pairs.appendValue((int(r.ts_us), int(r.word_count)))

    def _extend(self, r) -> None:
        a = self.agg.get()
        roles = a[18]
        if str(r.role) not in roles.split("\x1f"):
            roles = roles + "\x1f" + str(r.role)
        self.agg.update(
            (
                min(int(a[0]), int(r.ts_us)), max(int(a[1]), int(r.ts_us)),
                int(a[2]) + 1,
                bool(a[3]) or bool(r.has_tool), bool(a[4]) or bool(r.violated),
                int(a[5]) + int(r.is_s1),
                int(a[6]) + int(r.word_count),
                min(int(a[7]), int(r.word_count)), max(int(a[8]), int(r.word_count)),
                int(a[9]) + int(r.inaudible_count),
                int(a[10]) + int(r.questionable_count),
                int(a[11]) + int(r.other_bracketed_words),
                int(a[12]) + int(r.redactions),
                float(a[13]) + float(r.nonverbal_edits),
                float(a[14]) + float(r.verbal_edits),
                float(a[15]) + float(r.repeats),
                float(a[16]) + float(r.restarts),
                bool(a[17]) and bool(r.is_ascii),
                roles,
            )
        )
        self.pairs.appendValue((int(r.ts_us), int(r.word_count)))

    def _seen(self, idx: int) -> bool:
        """First-arrival dedup via the turn_idx HWM + count-min sketch."""
        if self.dedup.exists():
            hwm, sketch = self.dedup.get()
            sketch = np.array(sketch, dtype=np.int64)
        else:
            hwm, sketch = -1, np.zeros(SKETCH_D * SKETCH_W, dtype=np.int64)
        pos = (idx * _PRIMES[:SKETCH_D] + 17) % SKETCH_W
        slots = np.arange(SKETCH_D) * SKETCH_W + pos
        if idx <= hwm and sketch[slots].min() > 0:
            return True
        sketch[slots] += 1
        self.dedup.update((int(max(hwm, idx)), [int(x) for x in sketch]))
        return False

    # -- the keyed pass ------------------------------------------------------
    def handleInputRows(self, key, rows, timerValues):
        (conv_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "turn_idx"])
        out = []
        for r in pdf.itertuples():
            if self._seen(int(r.turn_idx)):
                continue  # re-delivery (verbatim duplicate)
            if not self.agg.exists():
                self._open(r)
            else:
                end_us = int(self.agg.get()[1])
                if int(r.ts_us) - end_us > self.gap_us:
                    out.append(self._flush(conv_id))  # close-on-next-event
                    self._open(r)
                else:
                    self._extend(r)
        # (re-)arm the tail timer: fire when watermark passes end + gap
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        if self.agg.exists():
            end_ms = int(self.agg.get()[1]) // 1000
            self.handle.registerTimer(end_ms + self.gap_us // 1000)
        if out:
            yield pd.DataFrame(out)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (conv_id,) = key
        row = self._flush(conv_id)
        if row is not None:
            yield pd.DataFrame([row])


def session_qc_aggregate_tws(
    projected: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """transformWithStateInPandas form of the session QC aggregate: same
    output contract as streaming/job.session_qc_aggregate (modulo the
    session_window struct and eager emission), same downstream
    compile_batch."""
    from pyspark.sql import functions as F

    compact = (
        projected.withWatermark("ts", cfg.watermark_delay)
        .select(
            "conv_id",
            F.unix_micros("ts").alias("ts_us"),
            F.col("turn_idx").cast("long").alias("turn_idx"),
            "role",
            (F.col("role") == "S1").cast("long").alias("is_s1"),
            F.col("tool").isNotNull().alias("has_tool"),
            "violated",
            F.col("word_count").cast("long").alias("word_count"),
            F.col("inaudible_count").cast("long").alias("inaudible_count"),
            F.col("questionable_count").cast("long").alias("questionable_count"),
            F.col("other_bracketed_words").cast("long").alias("other_bracketed_words"),
            F.col("redactions").cast("long").alias("redactions"),
            F.col("nonverbal_edits").cast("double").alias("nonverbal_edits"),
            F.col("verbal_edits").cast("double").alias("verbal_edits"),
            F.col("repeats").cast("double").alias("repeats"),
            F.col("restarts").cast("double").alias("restarts"),
            "is_ascii",
            "ts",
        )
    )
    return compact.groupBy("conv_id").transformWithStateInPandas(
        statefulProcessor=SessionQcProcessor(cfg.session_gap_minutes),
        outputStructType=DIARY_SCHEMA,
        outputMode="append",
        timeMode="eventTime",
    )
