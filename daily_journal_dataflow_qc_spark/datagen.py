"""Deterministic synthetic data generator for the transcripts graft.

Produces the three input tables of FIXTURES.md — ``transcripts``,
``tool_calls``, ``conv_meta`` — with controlled anomalies so the
accepted/rejected/flagged split is non-trivial:

* duplicate (conv_id, turn_idx) rows, out-of-order turn_idx, idx gaps
  (dedup / ordering / completeness QC fixtures),
* TranscribeMe-style notation in text: ``[inaudible]``, ``[word?]``,
  ``[laughs]``, ``{PII braces}`` (multi-word too), ``uh``/``um``, ``like,`` /
  ``you know,`` / ``i mean,``, ``w-word`` stutters, adjacent word repeats,
  ``--`` restarts, double spaces, and rare malformed braces
  (redaction-violation path, reference phone_transcript_redaction.py:69-72),
* pre-4am local submissions (day-shift fixture, mindlamp_accounting.py:118-121),
* multiple submissions per (conv, day) (one-per-day gate, diary_qc_compilation.py:176),
* hot conversations with ~50x the sessions (skew fixture),
* requests with no return / late returns (pending->flag path,
  journal_outputs_error_check.py:116-129).

Everything derives from one integer seed; no wall clock, no external data.
"""

from __future__ import annotations

import datetime as dt
import os
from zoneinfo import ZoneInfo

import numpy as np
import pandas as pd

TIMEZONES = [
    "America/Los_Angeles",
    "America/New_York",
    "Europe/London",
    "Europe/Madrid",
    "Asia/Seoul",
    "Australia/Melbourne",
]

_VOCAB = (
    "today i went to the park and saw some birds it was really nice weather "
    "then we talked about school work my family feels good about things "
    "sleep has been okay lately but sometimes hard thinking about plans "
    "music helps me relax when stress comes up during busy afternoons"
).split(" ")

_QUESTIONABLES = ["[maybe?]", "[garden?]", "[thursday?]"]
_BRACKETED = ["[laughs]", "[coughs]", "[sighs]", "[crying]"]
_PII = ["{john}", "{mary smith}", "{doctor brown}", "{el camino real}"]


def _make_sentence(rng: np.random.Generator) -> str:
    """Compose one synthetic diary sentence with notation anomalies."""
    n = int(rng.integers(4, 15))
    words = list(rng.choice(_VOCAB, size=n))
    r = rng.random(10)
    if r[0] < 0.18:  # nonverbal edits (uh/um/uhm)
        words.insert(int(rng.integers(0, len(words))), str(rng.choice(["uh", "um", "uhm", "uhh"])))
    if r[1] < 0.12:  # verbal edits
        words.insert(int(rng.integers(0, len(words))), str(rng.choice(["like,", "you know,", "i mean,"])))
    if r[2] < 0.05:
        words.insert(int(rng.integers(0, len(words))), "[inaudible]")
    if r[3] < 0.05:
        words.insert(int(rng.integers(0, len(words))), str(rng.choice(_QUESTIONABLES)))
    if r[4] < 0.05:
        words.insert(int(rng.integers(0, len(words))), str(rng.choice(_BRACKETED)))
    if r[5] < 0.04:
        words.insert(int(rng.integers(0, len(words))), str(rng.choice(_PII)))
    if r[6] < 0.05:  # stutter w-word
        i = int(rng.integers(0, len(words)))
        w = words[i]
        if w and w[0].isalpha():
            words[i] = w[0] + "-" + w
    if r[7] < 0.06:  # adjacent word repeat
        i = int(rng.integers(0, len(words)))
        words.insert(i, words[i])
    if r[8] < 0.06:  # restart
        words.insert(int(rng.integers(0, len(words))), "--")
    s = " ".join(words)
    if r[9] < 0.05:  # double space
        s = s.replace(" ", "  ", 1)
    if rng.random() < 0.01:  # non-ASCII word (UTF-8 encoding-type fixture)
        s = s + " café"
    return s


def generate(
    n_convs: int = 50,
    seed: int = 42,
    hot_convs: int = 2,
    hot_factor: int = 25,
    base_consent: dt.date = dt.date(2023, 2, 1),
    max_study_day: int = 40,
    turns_low: int = 3,
    turns_high: int = 18,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Return (transcripts, tool_calls, conv_meta) pandas DataFrames."""
    rng = np.random.default_rng(seed)

    conv_ids = [f"conv{idx:05d}" for idx in range(n_convs)]

    # ------------------------------------------------ conv_meta dimension
    consent_offsets = rng.integers(0, 30, size=n_convs)
    tzs = rng.choice(TIMEZONES, size=n_convs)
    db_levels = np.round(rng.uniform(40.0, 70.0, size=n_convs), 2)
    durations = np.round(rng.uniform(5.0, 300.0, size=n_convs), 1)
    short_mask = rng.random(n_convs) < 0.06  # length-cutoff rejection fixture
    durations[short_mask] = np.round(rng.uniform(0.1, 0.9, size=short_mask.sum()), 2)
    corrupt_mask = rng.random(n_convs) < 0.04  # unloadable-audio fixture
    db_levels_obj = db_levels.astype(object)
    durations_obj = durations.astype(object)
    for i in np.where(corrupt_mask)[0]:
        db_levels_obj[i] = None
        durations_obj[i] = None
    flatness = np.round(rng.uniform(0.01, 0.5, size=n_convs), 4)
    missing_consent = rng.random(n_convs) < 0.03  # skip-path fixture
    languages = rng.choice(
        ["ENGLISH", "ENGLISH", "ENGLISH", "SPANISH", "KOREAN"], size=n_convs
    )

    conv_meta = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "consent_date": [
                None if missing_consent[i] else base_consent + dt.timedelta(days=int(consent_offsets[i]))
                for i in range(n_convs)
            ],
            "timezone": tzs,
            "language": languages,
            "db_level": db_levels_obj,
            "duration_sec": durations_obj,
            "flatness": flatness,
        }
    )

    # ------------------------------------------------ sessions -> turns
    t_conv, t_idx, t_role, t_text, t_tool, t_ts = [], [], [], [], [], []
    tc_conv, tc_key, tc_kind, tc_tool, tc_ts, tc_payload = [], [], [], [], [], []

    for ci, conv in enumerate(conv_ids):
        crng = np.random.default_rng(seed * 1_000_003 + ci)
        tz = ZoneInfo(str(tzs[ci]))
        consent = None if missing_consent[ci] else base_consent + dt.timedelta(days=int(consent_offsets[ci]))
        anchor = consent or (base_consent + dt.timedelta(days=int(consent_offsets[ci])))
        is_hot = ci < hot_convs
        n_days = int(crng.integers(4, 20)) if not is_hot else max_study_day
        days = sorted(crng.choice(np.arange(1, max_study_day + 1), size=min(n_days, max_study_day), replace=False))
        multi_speaker = crng.random() < 0.07
        malformed_conv = crng.random() < 0.15  # ~1 malformed sentence somewhere

        turn_counter = 0
        for d in days:
            n_subs = int(crng.choice([1, 1, 1, 2, 2, 3]))
            if is_hot:
                n_subs = int(crng.integers(hot_factor // 2, hot_factor))
            # distinct start hours >= 2h apart so sessions never merge;
            # include pre-4am hours to exercise the day-shift rule
            hours = crng.choice(np.arange(0, 24, 2), size=min(n_subs, 12), replace=False)
            # chronological order WITHIN the assigned study day: pre-4am hours
            # fall on the next calendar date, so they come last
            # (submission rank follows local_time order, mindlamp_accounting.py:145-146)
            chrono = sorted((int(x) for x in hours), key=lambda h: (h < 4 and 1 or 0, h))
            for sub_i, h in enumerate(chrono):
                # literal local date: a pre-4am submission belongs to study day d,
                # so its wall-clock date is the NEXT day (mindlamp_accounting.py:120)
                local_date = anchor + dt.timedelta(days=int(d) - 1 + (1 if h < 4 else 0))
                minute = int(crng.integers(0, 60))
                second = int(crng.integers(0, 60))
                local_start = dt.datetime(
                    local_date.year, local_date.month, local_date.day, h, minute, second, tzinfo=tz
                )
                utc_start = local_start.astimezone(dt.timezone.utc).replace(tzinfo=None)

                n_turns = int(crng.integers(turns_low, turns_high + 1))
                if is_hot:
                    n_turns = int(crng.integers(turns_high, turns_high * 3))
                gaps = crng.integers(2, 16, size=n_turns).cumsum()
                # ground-truth acceptance (reference only pushes accepted audio):
                # first submission of the day, loadable, loud and long enough
                accepted_gt = (
                    db_levels_obj[ci] is not None
                    and float(db_levels_obj[ci]) >= 50.0
                    and float(durations_obj[ci]) >= 1.0
                    and sub_i == 0
                )
                if accepted_gt:
                    has_tool = True
                    emit_request = crng.random() < 0.97  # 3%: missing-request flag
                else:
                    has_tool = False
                    emit_request = crng.random() < 0.03  # spurious push -> no-QC flag
                for k in range(n_turns):
                    turn_counter += 1
                    role = "S1"
                    if multi_speaker and crng.random() < 0.1:
                        role = str(crng.choice(["S2", "S3"]))
                    text = _make_sentence(crng)
                    if malformed_conv and d == days[0] and sub_i == 0 and k == n_turns - 1:
                        text = text + " {oops unclosed brace"
                        malformed_conv = False
                    t_conv.append(conv)
                    t_idx.append(turn_counter)
                    t_role.append(role)
                    t_text.append(text)
                    t_tool.append("transcribeme" if has_tool else None)
                    t_ts.append(utc_start + dt.timedelta(seconds=int(gaps[k])))

                # tool-call request for this submission (graft of SFTP push;
                # key format per mindlamp_accounting.py:147)
                if emit_request:
                    local_key = f"{conv}_audioJournal_day{int(d):04d}_submission{sub_i + 1}.wav"
                    # tool-side key carries the language marker (S10 push
                    # rename, journal_transcribeme_sftp_push.py:177)
                    _p = local_key.split("submission")
                    key = _p[0] + str(languages[ci]) + "_submission" + _p[1]
                    req_ts = utc_start + dt.timedelta(hours=1)
                    # S8 retry fixtures (journal_transcribeme_sftp_push.py:
                    # 166-191): most pushes land on attempt 1; some retry
                    # transiently (5s backoff between attempts); a few
                    # exhaust all 10 attempts and never reach the tool
                    # (upload-failed flag + clear path)
                    r_att = crng.random()
                    if r_att < 0.03:
                        n_attempts, upload_failed = 10, True
                    elif r_att < 0.10:
                        n_attempts, upload_failed = int(crng.integers(2, 5)), False
                    else:
                        n_attempts, upload_failed = 1, False
                    for a in range(n_attempts):
                        tc_conv.append(conv)
                        tc_key.append(key)
                        tc_kind.append("request")
                        tc_tool.append("transcribeme")
                        tc_ts.append(req_ts + dt.timedelta(seconds=5 * a))
                        tc_payload.append(None)
                    r = crng.random()
                    if upload_failed:  # exhausted retries: nothing reached the tool
                        ret_delay = -1.0
                    elif r < 0.85:  # normal return in 1-5 days
                        ret_delay = float(crng.uniform(1, 5))
                    elif r < 0.90:  # late return (> 14-day deadline fixture)
                        ret_delay = float(crng.uniform(15, 20))
                    else:  # no return at all (pending flag path)
                        ret_delay = -1.0
                    if ret_delay > 0:
                        tc_conv.append(conv)
                        tc_key.append(key)
                        tc_kind.append("return")
                        tc_tool.append("transcribeme")
                        tc_ts.append(req_ts + dt.timedelta(days=ret_delay))
                        tc_payload.append("transcript-body")

        # anomaly: an orphan return with no request (~5% of convs)
        if crng.random() < 0.05 and len(days) > 0:
            key = f"{conv}_audioJournal_day{9999:04d}_{languages[ci]}_submission1.wav"
            tc_conv.append(conv)
            tc_key.append(key)
            tc_kind.append("return")
            tc_tool.append("transcribeme")
            tc_ts.append(dt.datetime(2023, 5, 1) + dt.timedelta(days=int(crng.integers(0, 10))))
            tc_payload.append("orphan-body")

    transcripts = pd.DataFrame(
        {
            "conv_id": t_conv,
            "turn_idx": np.array(t_idx, dtype=np.int32),
            "role": t_role,
            "text": t_text,
            "tool": t_tool,
            "ts": pd.to_datetime(t_ts),
        }
    )

    # ------------------------------------------------ turn-level anomalies
    rng2 = np.random.default_rng(seed + 7)
    n = len(transcripts)
    # out-of-order FIRST: swap turn_idx of ~1% adjacent same-conv pairs
    swap_at = np.where(rng2.random(n - 1) < 0.01)[0]
    idx_col = transcripts["turn_idx"].to_numpy().copy()
    conv_col = transcripts["conv_id"].to_numpy()
    for i in swap_at:
        if conv_col[i] == conv_col[i + 1]:
            idx_col[i], idx_col[i + 1] = idx_col[i + 1], idx_col[i]
    transcripts["turn_idx"] = idx_col
    # THEN duplicates: re-emit ~1% of (post-swap) rows verbatim — exact
    # re-delivery, so batch dedup (min ts) and streaming dedup (first
    # arrival) pick physically identical rows
    dup_rows = transcripts.iloc[rng2.random(n) < 0.01].copy()
    # gaps: drop ~0.5% of rows entirely
    keep = rng2.random(n) >= 0.005
    transcripts = pd.concat([transcripts[keep], dup_rows], ignore_index=True)
    # shuffle physical order (engine must not depend on input order)
    transcripts = transcripts.sample(frac=1.0, random_state=seed).reset_index(drop=True)

    tool_calls = pd.DataFrame(
        {
            "conv_id": tc_conv,
            "request_key": tc_key,
            "kind": tc_kind,
            "tool": tc_tool,
            "ts": pd.to_datetime(tc_ts),
            "payload": tc_payload,
        }
    )
    # tool-call RE-DELIVERIES: re-emit ~2% of rows VERBATIM (identical ts —
    # the transport redelivers the same event). This is the threat model the
    # distinct-ts attempt counting defends against (round-4 ADVICE): a
    # duplicated request row must NOT count as an extra push attempt and a
    # duplicated return row must NOT double-gate, in batch or streaming.
    dup_tc = tool_calls.iloc[rng2.random(len(tool_calls)) < 0.02].copy()
    tool_calls = pd.concat([tool_calls, dup_tc], ignore_index=True)
    tool_calls = tool_calls.sample(frac=1.0, random_state=seed + 1).reset_index(
        drop=True
    )
    return transcripts, tool_calls, conv_meta


def generate_scaled(
    base_convs: int = 120,
    replicas: int = 10,
    seed: int = 42,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Deterministically tile a base generation ``replicas`` times with
    distinct conv_id namespaces — cheap volume scale-out for benchmarking
    (key cardinality scales with replicas, so shuffle behavior stays honest).
    """
    tr, tc, cm = generate(n_convs=base_convs, seed=seed)
    trs, tcs, cms = [], [], []
    for r in range(replicas):
        pre = f"r{r:03d}"
        a = tr.copy()
        a["conv_id"] = pre + a["conv_id"]
        trs.append(a)
        b = tc.copy()
        b["conv_id"] = pre + b["conv_id"]
        b["request_key"] = pre + b["request_key"]
        tcs.append(b)
        c = cm.copy()
        c["conv_id"] = pre + c["conv_id"]
        cms.append(c)
    return (
        pd.concat(trs, ignore_index=True),
        pd.concat(tcs, ignore_index=True),
        pd.concat(cms, ignore_index=True),
    )


# bump when generation logic changes: busts the idempotency markers so stale
# cached fixtures regenerate
DATAGEN_VERSION = 4


def write_parquet_scaled(
    out_dir: str, base_convs: int = 120, replicas: int = 10, seed: int = 42
) -> dict[str, str]:
    """Generate-and-persist the scaled bench tables (idempotent)."""
    marker = os.path.join(out_dir, f"_GENERATED_v{DATAGEN_VERSION}_b{base_convs}_r{replicas}_s{seed}")
    paths = {
        t: os.path.join(out_dir, f"{t}.parquet")
        for t in ("transcripts", "tool_calls", "conv_meta")
    }
    if os.path.isfile(marker) and all(os.path.exists(p) for p in paths.values()):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    transcripts, tool_calls, conv_meta = generate_scaled(base_convs, replicas, seed)
    pq_opts = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True,
                   row_group_size=250_000)  # small row groups -> parallel scans
    transcripts["ts"] = transcripts["ts"].dt.tz_localize("UTC")
    transcripts.to_parquet(paths["transcripts"], **pq_opts)
    tool_calls["ts"] = tool_calls["ts"].dt.tz_localize("UTC")
    tool_calls.to_parquet(paths["tool_calls"], **pq_opts)
    conv_meta.to_parquet(paths["conv_meta"], **pq_opts)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def write_parquet(
    out_dir: str,
    n_convs: int = 50,
    seed: int = 42,
    **kwargs,
) -> dict[str, str]:
    """Generate and persist the three tables; returns table->path map.

    Idempotent: skips generation if the directory is already populated with
    the same parameters (marker file).
    """
    marker = os.path.join(out_dir, f"_GENERATED_v{DATAGEN_VERSION}_n{n_convs}_s{seed}")
    paths = {
        t: os.path.join(out_dir, f"{t}.parquet")
        for t in ("transcripts", "tool_calls", "conv_meta")
    }
    if os.path.isfile(marker) and all(os.path.exists(p) for p in paths.values()):
        return paths
    os.makedirs(out_dir, exist_ok=True)
    transcripts, tool_calls, conv_meta = generate(n_convs=n_convs, seed=seed, **kwargs)
    # Spark rejects parquet TIMESTAMP(NANOS); write microsecond instant
    # timestamps (UTC-localized -> Spark TimestampType, not TIMESTAMP_NTZ)
    pq_opts = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True,
                   row_group_size=250_000)  # small row groups -> parallel scans
    tr = transcripts.copy()
    tr["ts"] = tr["ts"].dt.tz_localize("UTC")
    tr.to_parquet(paths["transcripts"], **pq_opts)
    tc = tool_calls.copy()
    tc["ts"] = tc["ts"].dt.tz_localize("UTC")
    tc.to_parquet(paths["tool_calls"], **pq_opts)
    conv_meta.to_parquet(paths["conv_meta"], **pq_opts)  # consent_date -> date32
    with open(marker, "w") as f:
        f.write("ok")
    return paths
