"""Alternative session backend on the Spark 4 state API v2
(``transformWithStateInPandas``): keyed per-conversation processor that
dedups, sessionizes, and aggregates diary QC sums with EXPLICIT state.

Why this variant exists (vs the declarative ``session_window`` aggregate in
streaming/job.py):

* state shape is under our control — scalar sums live in a ValueState, the
  per-turn (ts, word_count) pairs live in a ListState, which RocksDB stores
  as one KV entry PER ELEMENT: appends are O(1) and a hot session can never
  materialize one giant aggregation-buffer value,
* dedup is EXACT and O(gaps): a turn_idx high-watermark plus a MapState of
  the MISSING indices below it (turn indices are per-conversation sequence
  numbers, so the gap set stays tiny — it grows only by genuinely dropped
  turns). A re-delivery is "at/below HWM and not missing"; a legitimate
  out-of-order arrival fills its gap and is KEPT. (The earlier count-min
  sketch variant saturated on long conversations and silently dropped
  legitimate late turns — an approximate structure is fine for flag
  emission, state.py, but not for deciding what enters the diary.)
* the keyed pass is vectorized: the batch is classified with numpy
  (dedup mask, session segmentation), interior sessions are aggregated
  straight from the Arrow batch without touching state, and the open
  session's state is read/written ONCE per batch — not once per row,
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

Environment note: transformWithStateInPandas spawns Python runners that
import google.protobuf for the state-server protocol; this container ships
none, so the package activates the vendored pure-Python runtime
(daily_journal_dataflow_qc_spark/_vendor, see protobuf_shim.py). The
backend runs END-TO-END against a real streaming query in
tests/test_streaming.py::test_tws_backend_matches_batch (batch parity),
with the processor logic additionally covered handle-free in
test_tws_processor_logic_matches_sessions.

Emission is WATERMARK-GATED (north rule): sessions close as soon as the
gap is observed, but their rows are buffered in ``pending`` ListState and
emitted by event-time timers when the watermark passes session_end + gap —
the exact cadence of groupBy(session_window). Eager emission would scramble
the per-batch submission rank against the batch tier (found by the e2e test
the first time it actually ran).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from ..config import DEFAULT_CONFIG, PipelineConfig

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

# largest tolerated single-advance of the turn-idx watermark: beyond this a
# "gap run" is corrupt data, not dropped turns (see _dedup_batch guard)
MAX_GAP_RUN = 1_000_000

# exact dedup: turn_idx high-watermark (ValueState) + the set of missing
# indices below it (MapState — one RocksDB entry per gap, O(1) fill/remove)
_HWM_SCHEMA = T.StructType([T.StructField("hwm", T.LongType(), False)])
_MISSING_KEY_SCHEMA = T.StructType([T.StructField("idx", T.LongType(), False)])
_MISSING_VAL_SCHEMA = T.StructType([T.StructField("one", T.LongType(), False)])

# WATERMARK-GATED emission buffer: sessions CLOSE as soon as the gap is
# observed, but their diary rows must not EMIT until the event-time
# watermark passes session_end + gap — the exact emission cadence of
# groupBy(session_window) (north rule: watermark-gated emission; eager
# emission would also scramble the per-batch submission rank vs the batch
# tier). One ListState row per closed-but-unemitted session: the finished
# diary scalars + the due timestamp; bounded by sessions closing within one
# watermark delay per conversation.
_PENDING_SCHEMA = T.StructType(
    [
        T.StructField("due_ms", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("has_tool_tag", T.BooleanType(), False),
        T.StructField("any_violated", T.BooleanType(), False),
        T.StructField("speaker_cnt", T.LongType(), False),
        T.StructField("s1", T.LongType(), False),
        T.StructField("word_count", T.LongType(), False),
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
        T.StructField("final_ts_min", T.DoubleType(), False),
        T.StructField("min_gap", T.DoubleType(), True),
        T.StructField("max_gap", T.DoubleType(), True),
        T.StructField("min_gpw", T.DoubleType(), True),
        T.StructField("max_gpw", T.DoubleType(), True),
        T.StructField("encoding", T.StringType(), False),
    ]
)


def _round3(x: float) -> float:
    return round(x, 3)


# Arrow-safe pandas dtypes for the emitted diary frame: the runner converts
# with safe casting on, so int columns must already be int32 where
# DIARY_SCHEMA says IntegerType (python ints infer as int64 and fail).
_EMIT_DTYPES = {
    f.name: "int32"
    for f in DIARY_SCHEMA.fields
    if isinstance(f.dataType, T.IntegerType)
}


def _emit_frame(rows: list[dict]) -> pd.DataFrame:
    return pd.DataFrame(rows).astype(_EMIT_DTYPES)


class SessionQcProcessor(StatefulProcessor):
    """Dedup + gap-sessionize + QC-aggregate one conversation's turn stream."""

    def __init__(self, gap_minutes: int):
        self.gap_us = gap_minutes * 60 * 1_000_000

    # -- StatefulProcessor contract -----------------------------------------
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.agg = handle.getValueState("agg", _AGG_SCHEMA)
        self.pairs = handle.getListState("pairs", _PAIR_SCHEMA)
        self.hwm = handle.getValueState("hwm", _HWM_SCHEMA)
        self.missing = handle.getMapState(
            "missing", _MISSING_KEY_SCHEMA, _MISSING_VAL_SCHEMA
        )
        self.pending = handle.getListState("pending", _PENDING_SCHEMA)

    def close(self) -> None:
        pass

    # -- row/aggregate builders ----------------------------------------------
    def _diary_row(self, conv_id: str, a: tuple, pairs: list[tuple[int, int]]) -> dict:
        """One diary output row from an agg tuple + (ts_us, wc) pairs.
        Gap stats run as numpy diffs over the pairs array (same shape as
        ``_seg_agg``) — no per-element Python loop at emission time."""
        (
            start_us, end_us, n_turns, has_tool, any_viol, s1, wsum, wmin, wmax,
            inaud, quest, other, red, nonv, verb, reps, rest, all_ascii, roles,
        ) = a
        arr = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
        arr = arr[np.argsort(arr[:, 0], kind="stable")]
        secs = arr[:, 0] / 1e6
        gaps = np.diff(secs)
        with np.errstate(divide="ignore", invalid="ignore"):
            gpw = np.where(arr[:-1, 1] != 0, gaps / arr[:-1, 1], math.nan)
        # JVM parity: gap/0 and gap/null are SQL NULL and array_min/max skip
        # nulls — drop the nan entries instead of letting Python min()/max()
        # see them (nan comparisons are position-dependent)
        gpw = gpw[~np.isnan(gpw)]
        gaps = gaps.tolist()
        gpw = gpw.tolist()
        return {
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

    def _flush(self, conv_id: str):
        """Emit the open session as one diary row and clear its state."""
        if not self.agg.exists():
            return None
        a = self._norm_agg(self.agg.get())
        pairs = [(int(p[0]), int(p[1])) for p in self.pairs.get()]
        self.agg.clear()
        self.pairs.clear()
        return self._diary_row(conv_id, a, pairs)

    # -- watermark-gated emission buffer -------------------------------------
    def _due_ms(self, end_us: int) -> int:
        return end_us // 1000 + self.gap_us // 1000

    def _defer(self, row: dict) -> None:
        """Buffer a CLOSED session's finished row until the event-time
        watermark passes session_end + gap (the session_window emission
        point), and arm a timer for that instant."""
        due = self._due_ms(int(row["session_end"].value) // 1000)
        self.pending.appendValue(
            (
                due,
                int(row["session_start"].value) // 1000,
                int(row["session_end"].value) // 1000,
                int(row["n_turns"]),
                bool(row["has_tool_tag"]),
                bool(row["any_violated"]),
                int(row["speakerID_count"]),
                int(row["S1_sentence_count"]),
                int(row["word_count"]),
                int(row["min_words_in_sen"]),
                int(row["max_words_in_sen"]),
                int(row["inaudible_count"]),
                int(row["questionable_count"]),
                int(row["other_bracketed_notation_count"]),
                int(row["redacted_count"]),
                float(row["nonverbal_edits_count"]),
                float(row["verbal_edits_count"]),
                float(row["repeats_count"]),
                float(row["restarts_count"]),
                float(row["final_timestamp_minutes"]),
                row["min_timestamp_space_seconds"],
                row["max_timestamp_space_seconds"],
                row["min_timestamp_space_per_word"],
                row["max_timestamp_space_per_word"],
                str(row["txt_encoding_type"]),
            )
        )
        self.handle.registerTimer(due)

    def _pending_to_row(self, conv_id: str, p: tuple) -> dict:
        def opt(v):
            return None if v is None or (isinstance(v, float) and math.isnan(v)) else float(v)

        return {
            "conv_id": conv_id,
            "session_start": pd.Timestamp(int(p[1]), unit="us"),
            "session_end": pd.Timestamp(int(p[2]), unit="us"),
            "n_turns": int(p[3]),
            "has_tool_tag": bool(p[4]),
            "any_violated": bool(p[5]),
            "speakerID_count": int(p[6]),
            "S1_sentence_count": int(p[7]),
            "word_count": int(p[8]),
            "min_words_in_sen": int(p[9]),
            "max_words_in_sen": int(p[10]),
            "inaudible_count": int(p[11]),
            "questionable_count": int(p[12]),
            "other_bracketed_notation_count": int(p[13]),
            "redacted_count": int(p[14]),
            "nonverbal_edits_count": float(p[15]),
            "verbal_edits_count": float(p[16]),
            "repeats_count": float(p[17]),
            "restarts_count": float(p[18]),
            "total_sentence_count": int(p[3]),
            "final_timestamp_minutes": float(p[19]),
            "min_timestamp_space_seconds": opt(p[20]),
            "max_timestamp_space_seconds": opt(p[21]),
            "min_timestamp_space_per_word": opt(p[22]),
            "max_timestamp_space_per_word": opt(p[23]),
            "txt_encoding_type": str(p[24]),
        }

    def _drain_due(self, conv_id: str, expiry_ms: int) -> list[dict]:
        """Emit every buffered row whose due time the watermark has passed
        (timer expiry == watermark crossing); keep the rest buffered."""
        if not self.pending.exists():
            return []
        held = [tuple(p) for p in self.pending.get()]
        due = [p for p in held if int(p[0]) <= expiry_ms]
        if not due:
            return []
        rest = [p for p in held if int(p[0]) > expiry_ms]
        if rest:
            self.pending.put(rest)
        else:
            self.pending.clear()
        due.sort(key=lambda p: (int(p[1]), int(p[2])))
        return [self._pending_to_row(conv_id, p) for p in due]

    @staticmethod
    def _norm_agg(a) -> tuple:
        return (
            int(a[0]), int(a[1]), int(a[2]), bool(a[3]), bool(a[4]),
            int(a[5]), int(a[6]), int(a[7]), int(a[8]), int(a[9]), int(a[10]),
            int(a[11]), int(a[12]), float(a[13]), float(a[14]), float(a[15]),
            float(a[16]), bool(a[17]), str(a[18]),
        )

    @staticmethod
    def _seg_agg(seg: pd.DataFrame) -> tuple:
        """Vectorized QC sums for one session segment of the batch.

        NULL metric columns (a redaction-violated turn has null text, so
        every text-derived metric is null and Arrow hands the batch over as
        float64+NaN) follow the JVM aggregate's skip-null semantics: pandas
        sum/min/max skip NaN natively; an ALL-null segment coerces min/max
        words to 0 (the agg state schema is non-nullable; such a diary is
        any_violated and excluded from the clean transcript outputs).
        Round-4 note: the previous ``to_numpy(dtype=int64)`` here and in
        _seg_pairs unsafe-cast NaN to INT64_MIN — garbage word stats on
        violated diaries, latent only because those diaries are excluded
        from every compared output."""
        ts = seg["ts_us"].to_numpy(dtype=np.int64)
        wcs = seg["word_count"]
        wmin, wmax = wcs.min(), wcs.max()
        ascii_nn = seg["is_ascii"].dropna()
        roles = "\x1f".join(dict.fromkeys(str(r) for r in seg["role"]))
        return (
            int(ts.min()), int(ts.max()), int(len(seg)),
            bool(seg["has_tool"].any()), bool(seg["violated"].any()),
            int(seg["is_s1"].sum()), int(wcs.sum()),
            0 if pd.isna(wmin) else int(wmin),
            0 if pd.isna(wmax) else int(wmax),
            int(seg["inaudible_count"].sum()), int(seg["questionable_count"].sum()),
            int(seg["other_bracketed_words"].sum()), int(seg["redactions"].sum()),
            float(seg["nonverbal_edits"].sum()), float(seg["verbal_edits"].sum()),
            float(seg["repeats"].sum()), float(seg["restarts"].sum()),
            bool(ascii_nn.all()) if len(ascii_nn) else False, roles,
        )

    @staticmethod
    def _merge_agg(a: tuple, b: tuple) -> tuple:
        roles = list(a[18].split("\x1f")) if a[18] else []
        for r in b[18].split("\x1f") if b[18] else []:
            if r not in roles:
                roles.append(r)
        return (
            min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2],
            a[3] or b[3], a[4] or b[4],
            a[5] + b[5], a[6] + b[6], min(a[7], b[7]), max(a[8], b[8]),
            a[9] + b[9], a[10] + b[10], a[11] + b[11], a[12] + b[12],
            a[13] + b[13], a[14] + b[14], a[15] + b[15], a[16] + b[16],
            a[17] and b[17], "\x1f".join(roles),
        )

    @staticmethod
    def _seg_pairs(seg: pd.DataFrame) -> list[tuple[int, int]]:
        """Python tuples are the ListState API FLOOR: PySpark 4.1's
        ListState.put/appendList signatures take ``List[Tuple]`` and the
        state client re-rows them into Arrow batches itself — there is no
        columnar payload entry point to hand a numpy array to. Measured
        cost of this boundary: Series.tolist() + zip converts numpy->int
        in C at ~195 ns/turn vs ~290 ns/turn for a per-element int()
        comprehension (2M-turn micro-bench, BENCH/BASELINE.md) — ~1.5x
        cheaper, and negligible against the per-batch Arrow transfer.

        NULL word_count (a redaction-violated turn's text is null) maps to
        0: the JVM backend's gap-per-word is ``gap / wc`` where BOTH null
        and zero divisors yield SQL NULL, excluded from array_min/max —
        _diary_row mirrors that by nan-masking wc == 0. (The pre-round-5
        ``to_numpy(dtype=int64)`` form silently unsafe-cast NaN to
        INT64_MIN here — garbage per-word stats on violated diaries,
        latent because violated diaries are excluded from the compared
        outputs; surfaced by the tolist change and fixed properly.)"""
        wc = seg["word_count"]
        if wc.isna().any():
            wc = wc.fillna(0)
        if wc.dtype.kind == "f":
            wc = wc.astype(np.int64)
        return list(zip(seg["ts_us"].tolist(), wc.tolist()))

    def _dedup_batch(self, idx: np.ndarray) -> np.ndarray:
        """EXACT first-delivery keep-mask over the (ts, turn_idx)-sorted
        batch. State: HWM + missing-gap MapState, O(#dropped turns) — turn
        indices are per-conversation sequence numbers, so gaps below the
        watermark are rare and the map stays tiny. keep iff first in-batch
        occurrence AND (above HWM, i.e. provably new, OR fills a known gap
        = legitimate out-of-order arrival). Everything else is a
        re-delivery."""
        hwm = int(self.hwm.get()[0]) if self.hwm.exists() else -1
        if self.missing.exists():
            missing = np.array([int(k[0]) for k in self.missing.keys()], dtype=np.int64)
        else:
            missing = np.empty(0, dtype=np.int64)
        first_occ = ~pd.Series(idx).duplicated(keep="first").to_numpy()
        keep = first_occ & ((idx > hwm) | np.isin(idx, missing))
        kept = idx[keep]
        if kept.size == 0:
            return keep
        for g in np.intersect1d(missing, kept):
            self.missing.removeKey((int(g),))
        new_hwm = max(hwm, int(idx.max()))
        if new_hwm > hwm:
            # guard the O(gaps) contract: turn indices are per-conversation
            # SEQUENCE numbers, so a jump of millions is corrupt data — fail
            # loudly (reference logs malformed inputs) instead of
            # materializing an index-jump-sized gap range / MapState
            lo = max(hwm + 1, 1)  # 1-based (datagen turn_counter starts at 1)
            if new_hwm - lo > MAX_GAP_RUN:
                raise ValueError(
                    f"turn_idx jumped from hwm={hwm} to {new_hwm} "
                    f"(> MAX_GAP_RUN={MAX_GAP_RUN}): corrupt turn index — "
                    "the missing-gap dedup state tracks one entry per "
                    "dropped turn and refuses unbounded jumps"
                )
            new_gaps = np.setdiff1d(np.arange(lo, new_hwm + 1, dtype=np.int64), kept)
            for g in new_gaps:
                self.missing.updateValue((int(g),), (1,))
            self.hwm.update((int(new_hwm),))
        return keep

    # -- the keyed pass ------------------------------------------------------
    def handleInputRows(self, key, rows, timerValues):
        """Vectorized: numpy dedup mask -> session segmentation by ts diffs
        (with open-session carry-in) -> per-segment aggregate. Interior
        segments never touch the open-session state; closed sessions are
        BUFFERED (``_defer``) and emitted by their event-time timer when the
        watermark passes session_end + gap — the session_window cadence —
        so this method itself emits nothing."""
        (conv_id,) = key
        chunks = [p for p in rows if len(p)]
        kept = pd.DataFrame()
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts_us", "turn_idx"], ignore_index=True)
            keep = self._dedup_batch(pdf["turn_idx"].to_numpy(dtype=np.int64))
            kept = pdf[keep]
        if len(kept):
            ts = kept["ts_us"].to_numpy(dtype=np.int64)
            b = np.diff(ts) > self.gap_us  # candidate boundaries (ts sorted)
            open_exists = self.agg.exists()
            open_end = int(self.agg.get()[1]) if open_exists else None
            if open_exists and int(ts[0]) - open_end > self.gap_us:
                row = self._flush(conv_id)  # close-on-next-event
                if row is not None:
                    self._defer(row)
                open_exists = False
            if open_exists:
                # while merged with the open session the running end is
                # max(open_end, prev ts): suppress candidate boundaries the
                # open session's end keeps alive (out-of-order carry-in)
                for i in np.nonzero(b)[0]:
                    if int(ts[i + 1]) - open_end > self.gap_us:
                        break
                    b[i] = False
            seg_id = np.concatenate(([0], np.cumsum(b)))
            n_seg = int(seg_id[-1]) + 1
            for s in range(n_seg):
                seg = kept[seg_id == s]
                agg = self._seg_agg(seg)
                pairs = self._seg_pairs(seg)
                last = s == n_seg - 1
                if s == 0 and open_exists:
                    merged = self._merge_agg(self._norm_agg(self.agg.get()), agg)
                    if last:
                        self.agg.update(merged)
                        self.pairs.appendList(pairs)
                    else:
                        state_pairs = [(int(p[0]), int(p[1])) for p in self.pairs.get()]
                        self.agg.clear()
                        self.pairs.clear()
                        self._defer(
                            self._diary_row(conv_id, merged, state_pairs + pairs)
                        )
                elif last:
                    self.agg.update(agg)
                    self.pairs.put(pairs)  # fresh open session
                else:
                    # pure in-batch session: aggregated and buffered without
                    # its per-turn payload ever transiting state
                    self._defer(self._diary_row(conv_id, agg, pairs))
        # arm the open-session tail timer (stale earlier timers fire as
        # harmless no-ops and auto-delete; deleting them here would also
        # kill the buffered sessions' emission timers)
        if self.agg.exists():
            self.handle.registerTimer(self._due_ms(int(self.agg.get()[1])))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        """Watermark crossed this timer's instant: emit every buffered
        session now due, plus the open session if its quiet period elapsed."""
        (conv_id,) = key
        expiry = int(expiredTimerInfo.getExpiryTimeInMs())
        out = self._drain_due(conv_id, expiry)
        if self.agg.exists() and self._due_ms(int(self.agg.get()[1])) <= expiry:
            row = self._flush(conv_id)
            if row is not None:
                out.append(row)
        if out:
            yield _emit_frame(out)


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
