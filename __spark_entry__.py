"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship QC pipeline over a transcripts-shaped
stream derived deterministically from the sf0.001 driver tables.

``queries()`` / ``oracle_sql()`` cover the SURVEY.md §2 operator inventory
over the driver's relational tables (events/documents/lineitem/... at the
given sf_dir), each with an ANSI-SQL DuckDB oracle. Column names and types
are aligned pairwise; double aggregates are rounded so the order-insensitive
value hash is stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from daily_journal_dataflow_qc_spark.functions import text_metrics as TM


# HLL precision for the dedup_exact_docs row's hll_est column — the ONE
# knob both the Spark query and the DuckDB mirror derive from
_HLL_P = 8


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full diary-QC pipeline over a transcript stream derived
    from the sf0.001 events+documents tables (conv=user, turn=event)."""
    from daily_journal_dataflow_qc_spark.config import PipelineConfig
    from daily_journal_dataflow_qc_spark.pipeline import run_batch
    from daily_journal_dataflow_qc_spark import schemas

    sf_dir = "/root/testdata/sf0.001"
    events = _t(spark, sf_dir, "events")
    documents = _t(spark, sf_dir, "documents")

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = (
        events.withColumn("turn_idx", F.row_number().over(w))
        .join(
            documents.select(
                (F.col("doc_id")).alias("_doc_join"), F.col("text").alias("_doc_text")
            ),
            F.pmod(F.col("event_id"), F.lit(500)) == F.col("_doc_join"),
            "left",
        )
        .select(
            F.concat(F.lit("conv"), F.col("user_id").cast("string")).alias("conv_id"),
            F.col("turn_idx").cast("int"),
            F.when(F.col("event_type") == "error", "S2").otherwise("S1").alias("role"),
            F.coalesce(F.col("_doc_text"), F.lit("empty sentence")).alias("text"),
            F.when(F.col("event_type") == "purchase", "transcribeme").alias("tool"),
            F.col("ts").cast("timestamp").alias("ts"),
        )
    )
    conv_meta = (
        events.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("consent_date"), F.avg("value").alias("_v"))
        .select(
            F.concat(F.lit("conv"), F.col("user_id").cast("string")).alias("conv_id"),
            F.col("consent_date"),
            F.lit("America/New_York").alias("timezone"),
            F.lit("ENGLISH").alias("language"),
            (F.lit(40.0) + F.pmod(F.col("user_id"), F.lit(30)).cast("double")).alias("db_level"),
            (F.lit(30.0) + F.round(F.col("_v"), 1)).alias("duration_sec"),
            F.round(F.pmod(F.col("user_id"), F.lit(100)) / 200.0, 4).alias("flatness"),
        )
    )
    tool_calls = spark.createDataFrame([], schemas.TOOL_CALLS)
    out = run_batch(transcripts, tool_calls, conv_meta, PipelineConfig())
    return out.audio_qc.select(
        "conv_id",
        "day",
        "daily_submission_number",
        "submit_hour_int",
        "length_minutes",
        "overall_db",
        "audio_approved_bool",
    )


# ---------------------------------------------------------------- helpers

def _hex_hash(col):
    """Portable 60-bit hash: first 15 hex chars of md5, base-16 -> bigint.
    DuckDB equivalent: CAST('0x' || substring(md5(x),1,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_HEX_SQL = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------- queries

def q_tpch_pricing(spark, sf):
    # A1: grouped sum/avg/count (TPC-H Q1 shape)
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1997-12-01")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_user_engagement(spark, sf):
    # A4 conditional counts + A5 clip(upper=1)-then-sum active days + A6
    # first/last submit day, merged to one user-grain driver row (the 50-row
    # driver gate makes registry slots scarce; every component keeps its own
    # column here)
    ev = _t(spark, sf, "events")
    per_day = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.least(F.count("*"), F.lit(1)).alias("active")
    )
    days = per_day.groupBy("user_id").agg(
        F.sum("active").cast("long").alias("active_days")
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("long").alias("clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("long").alias("purchases"),
        F.count("*").alias("n_events"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).cast("long").alias("span_days"),
    )
    return per_user.join(days, "user_id")


def q_type_rollup(spark, sf):
    # A1/A3/A7: per-type rollup with distinct count and rates
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 2).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_histogram(spark, sf):
    # A9: fixed-bin histogram with out-of-range buckets
    ev = _t(spark, sf, "events")
    bucket = (
        F.when(F.col("value") < 0, -1)
        .when(F.col("value") >= 100, 10)
        .otherwise(F.floor(F.col("value") / 10))
        .cast("long")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


def q_join_left_rollup(spark, sf):
    # J1: left equi-join then rollup
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .groupBy(F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("segment"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


def q_anti_join(spark, sf):
    # J6/U3: customers with no orders (left_anti)
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_semi_join(spark, sf):
    # J6: customers with at least one open order (left_semi)
    o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    c = _t(spark, sf, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_outer_fillna(spark, sf):
    # J9: full outer merge of two aggregates, fillna(0)
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(F.count("*").alias("clicks"))
    purch = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(F.count("*").alias("purchases"))
    return (
        clicks.join(purch, "user_id", "outer")
        .select(
            "user_id",
            F.coalesce("clicks", F.lit(0)).cast("long").alias("clicks"),
            F.coalesce("purchases", F.lit(0)).cast("long").alias("purchases"),
        )
    )


def q_cardinality_guard(spark, sf):
    # J5: 'exactly one matching record' check -> keys violating uniqueness
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines") != 1)
    )


def q_first_event(spark, sf):
    # W1: rank within key by time, keep first (submission-number shape)
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("first_event_id"), F.col("event_type").alias("first_type"))
    )


def q_lead_gaps(spark, sf):
    # W2/W3: lead-difference min/max per key (timestamp-space stats shape)
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, ts, lead_ts)")  # exact at parquet us precision
    return (
        ev.withColumn("lead_ts", F.lead("ts").over(w))
        .withColumn("gap_us", gap)
        .groupBy("user_id")
        .agg(
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") > 1)
        .drop("n")
    )


def q_daily_windows(spark, sf):
    # W5 rolling-7 mean (null head, pandas rolling(7)) + W6 cumulative count
    # over the same per-type daily counts — one window pass, two columns
    ev = _t(spark, sf, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("d")
    roll = F.when(
        F.row_number().over(w) >= 7,
        F.round(F.avg("n").over(w.rowsBetween(-6, 0)), 2),
    )
    cum = F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return daily.select("event_type", "d", roll.alias("roll7"), cum.alias("cum_n"))


def q_dedup_keep_first(spark, sf):
    # O4/O6: dedup keeping earliest arrival per key
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


def q_union_all(spark, sf):
    # U1/U2: union all of two filtered slices then rollup
    ev = _t(spark, sf, "events")
    a = ev.filter(F.col("value") > 50).select("event_type", "value")
    b = ev.filter(F.col("event_type") == "error").select("event_type", "value")
    return a.unionByName(b).groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v")
    )


def q_except_users(spark, sf):
    # U3: users with clicks EXCEPT users with purchases
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return clicks.join(purch, "user_id", "left_anti")


def q_topk_per_group(spark, sf):
    # top-K per group with deterministic tie-break
    ev = _t(spark, sf, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(F.round(F.sum("value"), 2).alias("total"))
    w = Window.partitionBy("event_type").orderBy(F.desc("total"), F.asc("user_id"))
    return (
        per_user.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("event_type", "user_id", "total", F.col("rk").cast("long").alias("rk"))
    )


def q_tumbling_4am(spark, sf):
    # T3/§2.10: tumbling 24h window with the 4am shift
    ev = _t(spark, sf, "events")
    day = F.to_date(F.col("ts") - F.expr("INTERVAL 4 HOURS")).alias("journal_day")
    return ev.groupBy(day, "event_type").agg(
        F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users")
    )


def q_sessionization(spark, sf):
    # §2.10 session windows: 30-min-gap sessions per user (batch form)
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "boundary",
            F.when(F.col("prev_ts").isNull() | (gap > 1800 * 1000000), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("boundary").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_session = sess.groupBy("user_id", "session_id").agg(F.count("*").alias("n_turns"))
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.max("n_turns").alias("max_session_turns")
    )


def q_unmatched_within_window(spark, sf):
    # J7 batch form: signups with no purchase by the same user within 14 days
    ev = _t(spark, sf, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("event_id").alias("s_id")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    cond = (
        (s.user_id == p.p_user)
        & (p.p_ts >= s.s_ts)
        & (p.p_ts <= F.col("s_ts") + F.expr("INTERVAL 14 DAYS"))
    )
    matched = s.join(p, cond, "left_outer")
    return (
        matched.groupBy("user_id", "s_id")
        .agg(F.max(F.col("p_ts").isNotNull()).alias("has_match"))
        .filter(~F.col("has_match"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pending"))
    )


def q_text_metrics(spark, sf):
    # F3/F4/F5 (literal-space word count + substring counts) + F6 (the
    # double-space-join nonverbal regex) + F8 (dash-prefix stutters over a
    # derived dashed column) + F9/W7 (adjacent-token repeats) + F10
    # (restarts) — every doc-grain disfluency primitive in ONE projection —
    # PLUS (round 6, registry cap: same-grain merge) the chunk_documents
    # operator (operators/packing.py) hash-checked end-to-end: each doc is
    # split into 8-token chunks with 2-token overlap and re-aggregated to
    # doc grain as (n_chunks, chunk_tokens_total, md5 digest of the
    # chunk_idx-ordered '|'-joined chunk texts) — the digest pins every
    # chunk BOUNDARY and every chunk's TEXT, not just counts
    # r07: the chunk aggregates are computed from ``chunk_structs`` — the
    # projection whose posexplode IS chunk_documents — so the row-local
    # chunk list never round-trips through explode -> groupBy -> join
    # back; n_chunks / chunk_tokens_total / chunks_digest are the same
    # values (the digest's chunk_idx order is the construction order of
    # the struct array), and the whole query is ONE scan projection with
    # no exchange at all. NULL-text docs keep the left-join convention
    # (all three chunk columns null).
    from daily_journal_dataflow_qc_spark.operators.packing import chunk_structs

    d = _t(spark, sf, "documents")
    lc = F.lower(F.col("text"))
    padded = F.concat(F.lit(" "), F.array_join(F.split(lc, " ", -1), "  "), F.lit(" "))
    dashed = F.replace(lc, F.lit("table"), F.lit("ta-table"))
    # materialize the chunk array in its own Project (CollapseProject keeps
    # non-cheap multi-referenced exprs apart) — three consumers below
    d = d.withColumn("_chunks", chunk_structs(max_tokens=8, overlap=2))
    chunks = F.col("_chunks")
    has_text = F.col("text").isNotNull()
    return d.select(
        "doc_id",
        TM.word_count(lc).cast("long").alias("word_count"),
        TM.substr_count(lc, "table").cast("long").alias("n_table"),
        TM.substr_count(lc, "the").cast("long").alias("n_the"),
        TM.restarts(lc).cast("long").alias("n_ddash"),
        F.regexp_count(padded, F.lit("[^a-z](a|the)[^a-z]")).cast("long").alias("n_matches"),
        TM.stutter_repeats(dashed).cast("long").alias("n_stutters"),
        TM.word_repeats(lc).cast("long").alias("n_repeats"),
        F.when(has_text, F.size(chunks).cast("long")).alias("n_chunks"),
        F.when(
            has_text,
            F.aggregate(
                chunks, F.lit(0).cast("long"), lambda a, c: a + c["k"]
            ).cast("long"),
        ).alias("chunk_tokens_total"),
        F.when(
            has_text,
            F.md5(F.array_join(F.transform(chunks, lambda c: c["t"]), "|")),
        ).alias("chunks_digest"),
    )


def q_dedup_exact_docs(spark, sf):
    # training-data DEDUP-tier source-grain row (cap: 50 — same-grain
    # merge): exact dedup via content hash, per source, PLUS (round 6) the
    # substring-level dedup family (operators/dedup.py duplicate_spans /
    # remove_duplicate_spans — Lee et al. 2022): total maximal duplicate
    # >=8-token spans, their token mass, docs touched, and the summed
    # length of the span-removed text. cleaned_chars pins the HOF token
    # filter + re-join end-to-end (the DuckDB mirror rebuilds kept-token
    # char sums relationally), so both detection AND removal are
    # hash-checked. Also carries dedup_lines (C4-style line-level dedup,
    # sep='\n' — the synthetic docs are single-line, so each duplicated
    # doc loses its one line: removal accounting differs from n_dupes,
    # which keeps one copy) as removed_lines / line_cleaned_chars.
    from daily_journal_dataflow_qc_spark.operators.dedup import (
        dedup_lines,
        duplicate_spans,
        remove_duplicate_spans,
    )

    # ... and (round 6) the HLL sketch tier: hll_est approximates
    # n_distinct per source from the mergeable register table
    # (operators/sketches.py, p=8) — the DuckDB mirror rebuilds the
    # registers bit-for-bit from the portable hash and replays the exact
    # scaled-integer estimate, so the sketch algebra is hash-checked
    # against the published formula, with the exact n_distinct column
    # sitting next to it as the accuracy witness.
    from daily_journal_dataflow_qc_spark.operators.sketches import hll_distinct

    d = _t(spark, sf, "documents")
    lines = dedup_lines(d).select(
        "doc_id",
        F.col("n_removed_lines").alias("_rl"),
        F.length("cleaned_text").alias("_lc"),
    )
    cleaned = remove_duplicate_spans(d, duplicate_spans(d, k=8)).join(
        lines, "doc_id"
    )
    hll = hll_distinct(d, "text", ["source"], p=_HLL_P)
    return cleaned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(F.col("text"))).alias("n_distinct"),
        (F.count("*") - F.countDistinct(F.md5(F.col("text")))).alias("n_dupes"),
        F.sum("n_dup_spans").cast("long").alias("dup_spans"),
        F.sum("dup_tokens").cast("long").alias("dup_span_tokens"),
        F.sum((F.col("n_dup_spans") > 0).cast("int")).cast("long").alias(
            "docs_with_dup_spans"
        ),
        F.sum(F.length("cleaned_text")).cast("long").alias("cleaned_chars"),
        F.sum("_rl").cast("long").alias("removed_lines"),
        F.sum("_lc").cast("long").alias("line_cleaned_chars"),
    ).join(hll, "source", "left").withColumn(
        "hll_est", F.coalesce("hll_est", F.lit(0.0))
    )


def q_minhash_signature(spark, sf):
    # training-data doc-grain ASSIGNMENTS row (cap: 50 — same-grain merge):
    # 4-permutation word-level minhash signature per doc, plus the
    # deterministic sampling family (operators/sampling.py): portable-hash
    # train/val/test split (90/5/5), 10% Bernoulli-by-hash membership flag,
    # the within-source stratified-draw rank, the greedy sequence-packing
    # assignment (operators/packing.py: shard/bin/pos at a 256-token budget)
    # the n-gram test-set decontamination flag (operators/dedup.py:
    # train∪val docs sharing any 3-shingle with the hash-split test corpus)
    # and (round 6) the domain-weighted mixture_sample survival flag
    # (operators/sampling.py:88 — per-source Bernoulli rates src0=0.9,
    # src1=0.5, src2=0.1, default 0.3) PLUS the multi-epoch UP-sampling
    # mixture (mixture_epochs: src0 x2.5, src1 x1.0, src2 x0.25, default
    # x0.5) hash-checked END-TO-END: n_epochs re-aggregates the operator's
    # exploded output back to doc grain (0 = dropped), pinning filter,
    # explode, and the floor+Bernoulli arithmetic — all reproduced
    # bit-exactly by the DuckDB mirror, so partition-independence is
    # hash-checked
    from daily_journal_dataflow_qc_spark.operators.dedup import contaminated_ids
    from daily_journal_dataflow_qc_spark.operators.packing import pack_sequences
    from daily_journal_dataflow_qc_spark.operators.sampling import (
        dsir_logweights,
        epoch_counts,
        hash_split,
        mixture_keep,
        stratified_sample,
    )

    d = _t(spark, sf, "documents")
    wds = F.split(F.lower(F.col("text")), " ", -1)

    def seed_hash(seed: str):
        # NB: must return a SINGLE-arg lambda — F.transform passes the array
        # index to a second parameter, which would corrupt the seed
        return lambda x: _hex_hash(F.concat(F.lit(seed), x))

    # r07 (guide §2.3/§2.4): the minhash columns and the token count are
    # PROJECTED AT THE SCAN and ``text`` dropped, so the two window
    # exchanges (stratified rank on source, packing on shard) shuffle 4
    # longs per row instead of the document body; mixture_kept and
    # n_epochs are the oracle's own pure per-row hash expressions — the
    # previous plan materialized each via a corpus scan + aggregate +
    # broadcast join (n_epochs even round-tripped through an explode whose
    # count is by construction the epoch_counts value), which the oracle
    # never needed. Plan: 4 scans/2 joins, was 7 scans/4 joins.
    # min over DISTINCT words == min over all words (the seeded hash is a
    # pure function of the word), and duplicates are the majority of tokens
    # in natural text — hashing each distinct word once cuts the md5 count
    # ~40% here (measured 1.46s -> 0.98s; HOF lambdas evaluate interpreted,
    # so every hash avoided counts double)
    uw = F.array_distinct(wds)
    base = d.select(
        "doc_id",
        "source",
        *[
            F.array_min(F.transform(uw, seed_hash(f"s{i}:"))).alias(f"mh{i}")
            for i in range(4)
        ],
        F.size(wds).alias("n_tokens"),
    )
    split_docs = hash_split(d, "doc_id")
    sampled = stratified_sample(
        hash_split(base, "doc_id"), "source", 0, "doc_id", rank_col="stratum_rank"
    )
    in_sample = (
        F.pmod(_hex_hash(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), F.lit(1_000_000))
        < 100_000
    )
    packed = pack_sequences(sampled, 256, n_shards=8)
    flagged = contaminated_ids(
        split_docs.filter(F.col("split") != "test"),
        split_docs.filter(F.col("split") == "test"),
    ).withColumn("_contam", F.lit(True))
    # (round 6) DSIR importance weight (operators/sampling.py: hashed
    # unigram+bigram target-vs-raw log-likelihood ratio, add-0.01 over 10k
    # buckets) against a deterministic target slice (doc_id % 10 == 0 — the
    # "curated reference" stand-in); zero-feature docs coalesce to 0.
    # r07: the slice is a row-subset of d, so target_filter derives BOTH
    # distributions from the one (doc, bucket) count pass — no target-side
    # re-scan/re-explode/re-hash (provably identical; see the operator doc)
    dsir = dsir_logweights(
        d, target_filter=F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    return (
        packed.join(F.broadcast(flagged), "doc_id", "left")
        .join(F.broadcast(dsir), "doc_id", "left")
        .select(
            "doc_id",
            "mh0",
            "mh1",
            "mh2",
            "mh3",
            "split",
            in_sample.alias("in_sample_10pct"),
            F.col("stratum_rank").cast("int").alias("stratum_rank"),
            "pack_shard",
            "pack_bin",
            "pack_pos",
            F.coalesce(F.col("_contam"), F.lit(False)).alias("contaminated"),
            mixture_keep({"src0": 0.9, "src1": 0.5, "src2": 0.1}, default_rate=0.3).alias(
                "mixture_kept"
            ),
            epoch_counts(
                {"src0": 2.5, "src1": 1.0, "src2": 0.25}, default_epochs=0.5
            ).alias("n_epochs"),
            F.coalesce(F.col("dsir_logweight"), F.lit(0.0)).alias("dsir_logweight"),
        )
    )


def q_embedding_nn(spark, sf):
    # training-data op: exact cosine nearest neighbor (top-1, excl self), two
    # engines under one driver row (registry cap: EXACTLY 50):
    #   bf  — broadcast candidate matrix + batched GEMM (no cross join — the
    #         interpreted higher-order-fold formulation was ~100x slower)
    #   ivf — the IVF-ANN operator at FULL probe (n_probe = n_cells): every
    #         query examines every candidate, so its output is provably
    #         identical to the exact kNN (pinned by
    #         test_ivf_full_probe_equals_brute_force) and the same DuckDB
    #         all-pairs oracle hash-validates the approximate operator's
    #         entire machinery (quantizer, assignment, per-cell GEMM, reduce)
    from daily_journal_dataflow_qc_spark.operators.similarity import (
        brute_force_knn,
        ivf_knn,
    )

    e = _t(spark, sf, "embeddings")
    # ONE count serves both engines' size guards (n_rows_hint — previously
    # each operator re-counted the same frame)
    n = e.count()
    bf = brute_force_knn(e, e, k=1, n_rows_hint=n).select(
        F.lit("bf").alias("method"), "vec_id", "nn_id", "cos_sim"
    )
    ivf = ivf_knn(e, n_cells=8, n_probe=8, k=1, seed=42, n_rows_hint=n).select(
        F.lit("ivf").alias("method"), "vec_id", "nn_id", "cos_sim"
    )
    return bf.unionAll(ivf)


def q_text_analysis(spark, sf):
    # training-data text-analysis tier in ONE doc-grain projection: quality
    # metrics (length/stopword ratios), whitespace + BPE-ish regex token
    # counting, content fingerprint (hash of normalized text), stopword-vote
    # language ID, the F13 encoding classification (is_ascii rlike —
    # streaming/job.py turn_projection — over a constructed non-ASCII tail),
    # and the Gopher-style repetition signals (top/dup n-gram shares; the
    # top-gram mass is a sorted-run F.aggregate fold — no explode/shuffle)
    # ... and the per-doc TF-IDF aggregates (corpus-statistics round-trip:
    # doc-frequency + N computed corpus-wide, joined back per doc)
    from daily_journal_dataflow_qc_spark.operators.textanalysis import (
        dup_frac_of,
        lang_id,
        ngram_lm_perplexity,
        ngram_list,
        tfidf_doc_scores,
        top_frac_of,
    )

    d = _t(spark, sf, "documents")
    lc = F.lower(F.col("text"))
    wds = F.split(lc, " ", -1)
    stop = F.size(F.filter(wds, lambda x: x.isin("the", "a", "of", "and", "to")))
    norm = F.array_join(F.filter(wds, lambda x: x != ""), " ")
    enc_t = F.when(
        F.pmod(F.col("doc_id"), F.lit(7)) == 0, F.concat(F.col("text"), F.lit(" café"))
    ).otherwise(F.col("text"))
    is_ascii = enc_t.rlike("^[\\x00-\\x7F]*$")
    # gram arrays materialized in their own Project so each is built once
    # per row (CollapseProject keeps non-cheap multi-referenced exprs apart)
    d = d.withColumns({"_gl2": ngram_list(wds, 2), "_gl3": ngram_list(wds, 3)})
    return d.select(
        "doc_id",
        F.length(lc).cast("long").alias("n_chars"),
        F.size(wds).cast("long").alias("n_words"),
        F.round(F.length(lc) / F.size(wds), 2).alias("chars_per_word"),
        F.round(stop / F.size(wds), 4).alias("stopword_ratio"),
        F.size(F.regexp_extract_all(lc, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
        .cast("long")
        .alias("re_tokens"),
        _hex_hash(norm).alias("fingerprint"),
        lang_id(lc).alias("lang_pred"),
        is_ascii.alias("all_ascii"),
        F.when(is_ascii, "ASCII").otherwise("UTF-8").alias("txt_encoding_type"),
        top_frac_of(F.col("_gl2")).alias("top_2gram_frac"),
        dup_frac_of(F.col("_gl2")).alias("dup_2gram_frac"),
        dup_frac_of(F.col("_gl3")).alias("dup_3gram_frac"),
    ).join(tfidf_doc_scores(_t(spark, sf, "documents")), "doc_id", "left").join(
        # CCNet-style LM-quality signal: perplexity under the add-k bigram
        # LM trained on this same corpus (self-train; train_df= for a
        # reference corpus). Zero-token docs coalesce to 0.
        ngram_lm_perplexity(_t(spark, sf, "documents")).drop("lm_tokens"),
        "doc_id",
        "left",
    ).withColumns(
        {
            "tfidf_mean": F.coalesce("tfidf_mean", F.lit(0.0)),
            "tfidf_max": F.coalesce("tfidf_max", F.lit(0.0)),
            "n_unique_terms": F.coalesce("n_unique_terms", F.lit(0)).cast("long"),
            "lm_logprob": F.coalesce("lm_logprob", F.lit(0.0)),
            "lm_ppl": F.coalesce("lm_ppl", F.lit(0.0)),
        }
    )


def q_lsh_candidates(spark, sf):
    # training-data op: banded minhash LSH candidate pairs (4 bands x 1 row)
    from daily_journal_dataflow_qc_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = _t(spark, sf, "documents")
    sig = minhash_signatures(d, n_hashes=4, shingle_k=3)
    return lsh_candidate_pairs(sig, bands=4, rows_per_band=1)


def q_near_dup_pairs(spark, sf):
    # training-data op: the WHOLE near-dup family under one driver row
    # (cap: 50) —
    #   text      — full MinHash+LSH pipeline w/ exact Jaccard verify
    #   embedding — embedding-cosine near-dup at FULL probe (n_probe =
    #               n_cells), which is provably the exact cosine threshold
    #               join, so the DuckDB all-pairs mirror hash-validates the
    #               IVF candidate generation + in-cell verify end to end.
    #               threshold 0.4 is corpus-calibrated: the synthetic
    #               embeddings are near-orthogonal (max off-diagonal cos
    #               ~0.51 at sf0.01), so a "near-dup" bar of 0.9 would make
    #               the leg vacuously empty
    #   cluster   — duplicate-CLUSTER resolution over the text pairs:
    #               alternating large-star/small-star connected components
    #               (node -> component-min rep, score = cluster size); the
    #               DuckDB mirror recomputes the transitive closure with a
    #               recursive CTE, so the iterative DataFrame algorithm is
    #               hash-validated end to end
    from daily_journal_dataflow_qc_spark.operators.dedup import (
        connected_components,
        near_dup_pairs,
    )
    from daily_journal_dataflow_qc_spark.operators.similarity import (
        embedding_near_dup,
    )

    d = _t(spark, sf, "documents")
    tp = near_dup_pairs(d, threshold=0.2, n_hashes=4, bands=4, shingle_k=3)
    text = tp.select(
        F.lit("text").alias("mode"), "id_a", "id_b", F.col("jaccard").alias("score")
    )
    e = _t(spark, sf, "embeddings")
    emb = embedding_near_dup(e, threshold=0.4, n_cells=8, n_probe=8, seed=42).select(
        F.lit("embedding").alias("mode"), "id_a", "id_b", F.col("cos_sim").alias("score")
    )
    cc = connected_components(tp.select("id_a", "id_b"))
    sizes = cc.groupBy("cluster_rep").agg(F.count("*").alias("n"))
    clus = cc.join(sizes, "cluster_rep").select(
        F.lit("cluster").alias("mode"),
        F.col("node_id").alias("id_a"),
        F.col("cluster_rep").alias("id_b"),
        F.col("n").cast("double").alias("score"),
    )
    return text.unionAll(emb).unionAll(clus)


def q_simhash_docs(spark, sf):
    # training-data doc-grain row (cap: 50 — same-grain merge): 16-bit
    # simhash per document PLUS (round 6) the global token-budget selection
    # (operators/sampling.py select_by_token_budget): rows ordered by a
    # stopword-density quality score, kept while the running token total
    # fits a budget of half the corpus tokens. The DuckDB mirror computes
    # the SAME rule with the naive global cumulative-sum window, so the
    # bucketed two-pass plan (which avoids that single-partition window at
    # scale) is hash-checked equivalent to its specification.
    from daily_journal_dataflow_qc_spark.operators.dedup import simhash
    from daily_journal_dataflow_qc_spark.operators.sampling import (
        select_by_token_budget,
    )

    d = _t(spark, sf, "documents")
    lc = F.lower(F.col("text"))
    wds = F.split(lc, " ", -1)
    scored = d.select(
        "doc_id",
        simhash(lc, 16).alias("simhash"),
        F.round(
            F.size(F.filter(wds, lambda x: x.isin("the", "a", "of", "and", "to")))
            / F.size(wds),
            6,
        ).alias("q_score"),
        F.size(wds).cast("long").alias("n_tokens"),
    )
    total = scored.agg(F.sum("n_tokens")).collect()[0][0] or 0
    return select_by_token_budget(
        scored, int(total) // 2, "q_score", "n_tokens", id_col="doc_id"
    )


def q_ngram_jaccard_adjacent(spark, sf):
    # training-data op: exact 3-gram Jaccard between consecutive doc ids
    from daily_journal_dataflow_qc_spark.operators.dedup import ngram_jaccard

    d = _t(spark, sf, "documents")
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    b = d.select((F.col("doc_id") - 1).alias("id_a"), F.col("text").alias("text_b"))
    pairs = a.join(b, "id_a")
    return ngram_jaccard(pairs, k=3).select("id_a", "jaccard")


def q_lsh_bucketed_ann(spark, sf):
    # training-data op: multi-table LSH-bucketed approximate NN (scale
    # path). The hyperplanes are seeded-deterministic, so the construction
    # is FULLY oracle-checkable: the DuckDB mirror embeds the same planes as
    # SQL literals and replays sign-bucketing + per-bucket top-1 + the
    # cross-table reduce (see _lsh_ann_oracle_sql). A recall>=0.9-vs-exact
    # quality gate lives in tests/test_training_ops.py.
    from daily_journal_dataflow_qc_spark.operators.similarity import lsh_bucketed_knn

    e = _t(spark, sf, "embeddings")
    # dim=64 is the oracle contract: _lsh_ann_oracle_sql embeds planes
    # generated for that shape as SQL literals. Declaring it here removes
    # the driver-side head() probe — every Arrow batch validates the
    # dimension in-plan and fails with the cause on a mismatch.
    return lsh_bucketed_knn(e, n_planes=3, n_tables=16, seed=42, dim=64)


def _lsh_ann_oracle_sql(dim: int = 64, n_planes: int = 3, n_tables: int = 16, seed: int = 42) -> str:
    """DuckDB mirror of q_lsh_bucketed_ann: the seeded hyperplanes are
    regenerated with the identical numpy rng and embedded as SQL literals
    (repr round-trips doubles bit-exactly), then sign-bucketing, the
    per-bucket exact top-1 (unrounded cos DESC, nn_id ASC — the engine sorts
    each bucket by vec_id and argmax keeps the first maximum), and the
    cross-table best-of reduce (ROUNDED cos DESC, nn_id ASC) are replayed
    relationally. Embeddings are cast to DOUBLE[] to match the engine's
    float64 GEMM."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((dim, n_planes * n_tables))
    branches = []
    for t in range(n_tables):
        terms = []
        for i in range(n_planes):
            vec = ", ".join(repr(float(v)) for v in planes[:, t * n_planes + i])
            terms.append(
                f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), [{vec}]) > 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        branches.append(
            f"SELECT vec_id, embedding, {t} AS tbl, ({' + '.join(terms)}) AS bucket FROM embeddings"
        )
    sig = " UNION ALL ".join(branches)
    return f"""
        WITH sig AS ({sig}),
        pairs AS (
            SELECT a.tbl, a.bucket, a.vec_id AS vec_id, b.vec_id AS nn_id,
                   list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) AS cos
            FROM sig a JOIN sig b
              ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id != b.vec_id
        ),
        per_tbl AS (
            SELECT vec_id, nn_id, round(cos, 2) AS cos_sim,
                   row_number() OVER (PARTITION BY tbl, vec_id
                                      ORDER BY cos DESC, nn_id) AS rk1
            FROM pairs
        ),
        best AS (
            SELECT vec_id, nn_id, cos_sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cos_sim DESC, nn_id) AS rn
            FROM per_tbl WHERE rk1 = 1
        )
        SELECT vec_id, nn_id, cos_sim, CAST(1 AS INT) AS rk FROM best WHERE rn = 1
    """


def q_redaction(spark, sf):
    # F11: the REAL redaction pandas-UDF over a constructed brace-bearing
    # text (well-formed groups by construction, so the DuckDB mirror is a
    # plain substring replacement)
    from daily_journal_dataflow_qc_spark.functions.redaction import redact_udf

    d = _t(spark, sf, "documents")
    braced = F.replace(F.lower(F.col("text")), F.lit("table"), F.lit("{john smith}"))
    red = redact_udf(braced)
    return d.select(
        "doc_id",
        red.getField("redacted").alias("redacted"),
        red.getField("violated").cast("int").alias("violated"),
    )


def q_datetime_rules(spark, sf):
    # T1/T2/T4/T7: per-row IANA timezone conversion + study day + 4am shift
    # + DPDash weekday + consent month over events (fixed-offset zones so
    # the oracle is pure interval arithmetic, independent of DuckDB's tz db)
    from daily_journal_dataflow_qc_spark.functions.datetime_rules import (
        with_day_assignment,
    )

    ev = _t(spark, sf, "events")
    consent = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("consent_date"))
    tz = F.element_at(
        F.array(
            F.lit("UTC"),
            F.lit("Asia/Seoul"),
            F.lit("Asia/Kolkata"),
            F.lit("America/Phoenix"),
        ),
        (F.pmod(F.col("user_id"), F.lit(4)) + 1).cast("int"),
    )
    df = ev.join(consent, "user_id").withColumn("timezone", tz)
    out = with_day_assignment(df, ts_col="ts")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("local_time", "yyyy-MM-dd HH:mm:ss").alias("local_time_str"),
        "timeofday",
        F.col("day").cast("long").alias("day"),
        F.col("submit_hour_int").cast("long").alias("submit_hour_int"),
        F.col("submit_minute_int").cast("long").alias("submit_minute_int"),
        F.col("weekday").cast("long").alias("weekday"),
        "subject_consent_month",
    )


def q_canonical_names(spark, sf):
    # F2 zero-padded name construction + S10 language-marker exchange rename
    # (both directions) + F1 day/submission extraction + F12 basename
    from daily_journal_dataflow_qc_spark.functions.datetime_rules import (
        proposed_processed_name,
    )
    from daily_journal_dataflow_qc_spark.functions.naming import (
        basename,
        filename_day,
        filename_submission,
        strip_language_marker,
        with_language_marker,
    )

    ev = _t(spark, sf, "events")
    day = (F.pmod(F.col("event_id"), F.lit(300)) + 1).cast("int")
    sub = (F.pmod(F.col("event_id"), F.lit(3)) + 1).cast("int")
    lang = F.when(F.pmod(F.col("user_id"), F.lit(2)) == 0, "ENGLISH").otherwise("KOREAN")
    name = proposed_processed_name(
        F.concat(F.lit("u"), F.col("user_id").cast("string")), day, sub
    )
    df = ev.select("event_id", name.alias("local_name"), lang.alias("lang"))
    marked = with_language_marker(F.col("local_name"), F.col("lang"))
    return df.select(
        "event_id",
        "local_name",
        marked.alias("tool_name"),
        strip_language_marker(marked, F.col("lang")).alias("restored"),
        filename_day(marked).cast("long").alias("day_extracted"),
        filename_submission(marked).cast("long").alias("sub_extracted"),
        basename(F.concat(F.lit("/data/raw/"), marked)).alias("base"),
    )


def q_parse_transcript(spark, sf):
    # S4 transcript-line parse + T5 timestamp->minutes (both branches) + F14
    # tab normalization, over lines constructed deterministically from docs
    from daily_journal_dataflow_qc_spark.sources.transcript_text import (
        parse_transcript_lines,
    )

    d = _t(spark, sf, "documents")
    mm = F.pmod(F.col("doc_id"), F.lit(60))
    ss = F.pmod(F.col("doc_id") * 7, F.lit(60))
    ms = F.pmod(F.col("doc_id") * 13, F.lit(1000))
    hh = F.pmod(F.col("doc_id"), F.lit(3))
    stamp = F.when(
        F.pmod(F.col("doc_id"), F.lit(5)) == 0,
        F.format_string("%d:%02d:%02d.%03d", hh, mm, ss, ms),
    ).otherwise(F.format_string("%02d:%02d.%03d", mm, ss, ms))
    line = F.concat(F.lit("S1\t"), stamp, F.lit(" "), F.col("text"))
    out = parse_transcript_lines(d.select("doc_id", line.alias("value")), "value")
    return out.select("doc_id", "speakerID", "timefromstart", "minutes", "text")


def q_media_features(spark, sf):
    # training-data op: multimodal binary->feature plumbing over media
    # derived from the documents table (text bytes as the opaque payload) —
    # the digest/byte-count/frame-count columns are oracle-checkable; the
    # fake-decoder feature moments stay pytest-verified
    from daily_journal_dataflow_qc_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
    )

    d = _t(spark, sf, "documents")
    feats = extract_features(media_from_documents(d), decoder="fake")
    return feats.select("media_id", "kind", "n_bytes", "digest", "n_frames")


def q_activity_summary(spark, sf):
    # A5 EMA/any-activity day counts per subject (clip(upper=1)-then-sum;
    # click ~ EMA record, purchase ~ journal record, any event ~ any app use)
    ev = _t(spark, sf, "events")
    one = F.lit(1)
    per_day = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.least(F.count("*"), one).alias("any1"),
        F.least(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)), F.lit(1)
        ).alias("ema1"),
        F.least(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)), F.lit(1)
        ).alias("journal1"),
    )
    return per_day.groupBy("user_id").agg(
        F.sum("any1").cast("long").alias("num_days_any_activity_submit"),
        F.sum("ema1").cast("long").alias("num_days_ema_submit"),
        F.sum("journal1").cast("long").alias("num_days_journal_submit"),
    )


def q_activity_group_counts(spark, sf):
    # A5 site-level 'any' rollup: subjects found / any-EMA / any-journal
    ev = _t(spark, sf, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "click").cast("int")).alias("any_ema"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("any_journal"),
    )
    site = F.pmod(F.col("user_id"), F.lit(7)).cast("long")
    return per_user.groupBy(site.alias("site")).agg(
        F.count("*").alias("num_subjects_found"),
        F.sum("any_ema").cast("long").alias("num_subjects_any_ema"),
        F.sum("any_journal").cast("long").alias("num_subjects_any_journal"),
    )


def q_flagship_events(spark, sf):
    # END-TO-END flagship semantics over the driver's events table:
    # dedup -> gap sessionization -> 4am-shifted study day -> submission
    # rank -> acceptance predicate (db/duration derived deterministically)
    ev = _t(spark, sf, "events")
    w_dedup = Window.partitionBy("user_id", "event_id").orderBy("ts")
    turns = ev.withColumn("_rn", F.row_number().over(w_dedup)).filter(F.col("_rn") == 1)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
    sess = (
        turns.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("b", F.when(F.col("prev_ts").isNull() | (gap > 1800 * 1000000), 1).otherwise(0))
        .withColumn("sid", F.sum("b").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    consent = turns.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("consent"))
    diaries = (
        sess.groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_turns"))
        .join(consent, "user_id")
    )
    literal_day = F.datediff(F.to_date("session_start"), F.col("consent")) + 1
    hour = F.hour("session_start")
    diaries = diaries.withColumns(
        {
            "day": F.when(hour < 4, literal_day - 1).otherwise(literal_day).cast("long"),
            "submit_hour_int": F.when(hour < 4, hour + 24).otherwise(hour).cast("long"),
        }
    )
    w2 = Window.partitionBy("user_id", "day").orderBy("session_start")
    diaries = diaries.withColumn("submission", F.row_number().over(w2).cast("long"))
    db = 40.0 + F.pmod(F.col("user_id"), F.lit(30)).cast("double")
    dur = F.col("n_turns").cast("double") * 7.0
    approved = F.when((db < 50.0) | (dur < 1.0) | (F.col("submission") > 1), 0).otherwise(1)
    return diaries.select(
        "user_id",
        "day",
        "submission",
        "submit_hour_int",
        F.col("n_turns").alias("n_turns"),
        approved.cast("long").alias("audio_approved_bool"),
    )


def q_push_lifecycle(spark, sf):
    # S8 attempt lifecycle via operators.transcript.push_attempt_stats over a
    # tool-call-shaped stream derived from events (clicks etc. = push
    # attempts, purchases = returns, key = event_id bucket per user)
    from daily_journal_dataflow_qc_spark.operators.transcript import (
        push_attempt_stats,
    )

    ev = _t(spark, sf, "events")
    tc = ev.select(
        F.concat(F.lit("conv"), F.col("user_id").cast("string")).alias("conv_id"),
        F.concat(F.lit("k"), F.pmod(F.col("event_id"), F.lit(50)).cast("string")).alias(
            "request_key"
        ),
        F.when(F.col("event_type") == "purchase", "return")
        .otherwise("request")
        .alias("kind"),
        F.col("ts"),
    )
    out = push_attempt_stats(tc)
    return out.select(
        "conv_id",
        "request_key",
        F.col("n_attempts").cast("long").alias("n_attempts"),
        F.date_format("first_attempt_ts", "yyyy-MM-dd HH:mm:ss").alias("first_attempt"),
        F.date_format("last_attempt_ts", "yyyy-MM-dd HH:mm:ss").alias("last_attempt"),
        "returned",
    )


def q_activity_scan(spark, sf):
    # S1 nested activity-JSON scan: payloads constructed deterministically
    # from events, parsed with the REAL from_json+explode operator
    # (sources/activity_json.py), rolled into the accounting shape; the
    # oracle computes the same per-file counts relationally
    from daily_journal_dataflow_qc_spark.sources.activity_json import (
        accounting_rows,
        parse_activity_json,
    )

    ev = _t(spark, sf, "events")
    obj = (
        F.when(
            F.col("event_type") == "purchase",
            F.format_string(
                '{"timestamp": %d, "static_data": {"url": "SOUND_%d"}}',
                F.unix_millis(F.col("ts").cast("timestamp")),
                F.pmod(F.col("event_id"), F.lit(100)),
            ),
        )
        .when(
            F.col("event_type") == "click",
            F.format_string('{"timestamp": %d, "static_data": {}}', F.unix_millis(F.col("ts").cast("timestamp"))),
        )
        .when(F.col("event_type") == "error", F.lit('{"static_data": {}}'))
        .otherwise(F.format_string('{"timestamp": %d}', F.unix_millis(F.col("ts").cast("timestamp"))))
    )
    files = ev.groupBy(
        F.concat(F.lit("u"), F.col("user_id").cast("string"), F.lit(".json")).alias(
            "json_filename"
        )
    ).agg(
        F.concat(F.lit("["), F.array_join(F.collect_list(obj), ","), F.lit("]")).alias(
            "payload"
        )
    )
    return accounting_rows(parse_activity_json(files))


def q_snapshot_latest(spark, sf):
    # S7/O2/O5 replace-latest snapshot dedup + U4 schema-aligned union of
    # two drifted slices (operators/snapshots.union_align)
    from daily_journal_dataflow_qc_spark.operators.snapshots import union_align

    ev = _t(spark, sf, "events")
    cond = F.col("event_type").isin("click", "purchase")
    a = ev.filter(cond).select("user_id", "event_id", "event_type", "ts", "value")
    b = ev.filter(~cond).select("user_id", "event_id", "ts")  # drifted schema
    u = union_align(a, b)
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.col("event_id").alias("last_event_id"),
            "event_type",
            F.round("value", 2).alias("v"),
        )
    )


def q_pending_age(spark, sf):
    # T6 elapsed days vs the injected compute date + T8 week bucketing
    ev = _t(spark, sf, "events")
    last = ev.groupBy("user_id").agg(F.max(F.to_date("ts")).alias("last_d"))
    age = F.datediff(F.to_date(F.lit("1998-06-01")), F.col("last_d"))
    return last.select(
        "user_id",
        "last_d",
        age.cast("long").alias("days_since_last"),
        F.floor(age / 7).cast("long").alias("weeks_since_last"),
        (age >= 14).alias("is_stale"),
    )


def q_disfluency_rates(spark, sf):
    # A8 disfluency-summary shape + M4 safe-divide rates, per source
    d = _t(spark, sf, "documents")
    lc = F.lower(F.col("text"))
    per_doc = d.select(
        "source",
        TM.word_count(lc).alias("wc"),
        TM.nonverbal_edits(lc).alias("nv"),
        TM.verbal_edits(lc).alias("ve"),
        TM.restarts(lc).alias("rs"),
        TM.word_repeats(lc).alias("wr"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("wc").cast("double").alias("total_word_count"),
        F.sum("nv").cast("double").alias("nonverbal_edits_count"),
        F.sum("ve").cast("double").alias("verbal_edits_count"),
        F.sum("rs").cast("double").alias("restarts_count"),
        F.sum("wr").cast("double").alias("repeats_count"),
    )
    def rate(num):  # M4: divide-by-zero -> null, not NaN/error
        return F.round(
            F.when(F.col("total_word_count") != 0, F.col(num) / F.col("total_word_count")),
            6,
        )
    return agg.select(
        "source",
        "total_word_count",
        "nonverbal_edits_count",
        "verbal_edits_count",
        "restarts_count",
        "repeats_count",
        rate("nonverbal_edits_count").alias("nonverbal_per_word"),
        rate("verbal_edits_count").alias("verbal_per_word"),
        rate("restarts_count").alias("restarts_per_word"),
        rate("repeats_count").alias("repeats_per_word"),
    )


def q_salted_counts(spark, sf):
    # skew-safe two-phase salted aggregate (operators/skew.salted_agg):
    # identical result set to a plain groupBy — which is exactly what the
    # oracle computes
    from daily_journal_dataflow_qc_spark.operators.skew import salted_agg

    ev = _t(spark, sf, "events")
    return salted_agg(
        ev,
        keys=["event_type"],
        partial_aggs={"n_p": F.count("*"), "v_p": F.sum("value")},
        final_aggs={
            "n": F.sum("n_p").cast("long"),
            "v": F.round(F.sum("v_p"), 2),
        },
        salt_on="event_id",
    )


def _accepted_shape(spark, sf):
    """accepted-diary-shaped frame derived deterministically from events
    (feeds the server-level summary operators at the driver gate)."""
    ev = _t(spark, sf, "events")
    consent = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("_c"))
    return ev.join(consent, "user_id").select(
        F.concat(F.lit("conv"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.datediff(F.to_date("ts"), F.col("_c")) + 1).cast("long").alias("day"),
        F.round(F.col("value") / 10.0, 3).alias("length_minutes"),
        F.date_format("_c", "yyyy-MM-dd").alias("consent_date_at_accounting"),
    )


def q_conv_summary(spark, sf):
    # A7/serverWide subjects-level engagement rollup
    # (operators/summaries.conv_level_summary) over an accepted-shaped frame
    from daily_journal_dataflow_qc_spark.config import PipelineConfig
    from daily_journal_dataflow_qc_spark.operators.summaries import (
        conv_level_summary,
    )

    import datetime as _dt

    cfg = PipelineConfig(compute_date=_dt.date(2024, 6, 1))  # after the events range
    out = conv_level_summary(_accepted_shape(spark, sf), cfg)
    return out.select(
        "conv_id",
        "num_days_journal_submit",
        "sum_minutes_audio_uploaded",
        "num_audio_files_uploaded",
        "first_submit_day",
        "last_submit_day",
        F.col("study_day_at_compute_time").cast("long").alias("study_day_at_compute_time"),
        F.col("time_since_last_submit").cast("long").alias("time_since_last_submit"),
    )


def q_site_summary(spark, sf):
    # A7/serverWide sites-level rollup with the two-week windows and
    # per-subject-week rates (operators/summaries.group_level_summary)
    from daily_journal_dataflow_qc_spark.config import PipelineConfig
    from daily_journal_dataflow_qc_spark.operators.summaries import (
        group_level_summary,
    )

    site = F.concat(F.lit("s"), F.substring("conv_id", 5, 1))
    import datetime as _dt

    cfg = PipelineConfig(compute_date=_dt.date(2024, 6, 1))  # after the events range
    out = group_level_summary(_accepted_shape(spark, sf), cfg, group_expr=site)
    return out.select(
        "site",
        "num_subjects_any_journal",
        "sum_minutes_audio_uploaded",
        F.col("num_audio_files_uploaded").cast("long").alias("num_audio_files_uploaded"),
        "num_subjects_within_first_two_weeks_of_enrollment",
        "num_subjects_submit_within_last_two_weeks",
        "fraction_diary_subjects_submit_after_two_weeks",
        "mean_minutes_per_diary_after_two_weeks",
        "mean_accepted_diaries_per_subject_week_after_two_weeks",
        "mean_accepted_diaries_per_subject_within_first_two_weeks",
        "mean_minutes_per_diary_first_two_weeks",
    )


def q_cube_rollup(spark, sf):
    # grouping-sets aggregation (monitoring rollup; SURVEY §2.4 optional)
    ev = _t(spark, sf, "events")
    return (
        ev.cube("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce(F.col("d").cast("string"), F.lit("ALL")).alias("d"),
            "n",
            "v",
        )
    )


def q_participation_timecourse(spark, sf):
    # weekly-monitoring participation timecourse (reference
    # create_shareable_visualizations.py:730-749): subjects reached per study
    # day (W6 reverse-cumulative over desc day), accepted diaries per day
    # (outer-merge + fillna(0)), response rate, rolling(7) mean/stdev with
    # the pandas null head
    import datetime as _dt

    from daily_journal_dataflow_qc_spark.config import PipelineConfig
    from daily_journal_dataflow_qc_spark.operators.summaries import (
        participation_timecourse,
    )

    cfg = PipelineConfig(compute_date=_dt.date(2024, 2, 15))  # just past events
    out = participation_timecourse(_accepted_shape(spark, sf), cfg)
    return out.select(
        "day",
        F.col("total_subjects_reached_day").cast("long").alias("total_subjects_reached_day"),
        F.col("total_accepted_diaries_submitted_on_day")
        .cast("long")
        .alias("total_accepted_diaries_submitted_on_day"),
        F.round("current_response_rate", 6).alias("response_rate"),
        F.round(
            "rolling_mean_week_window_daily_response_fraction_eligible_subjects", 6
        ).alias("rolling_mean_response_rate"),
        F.round("weekly_response_stdev_rolling", 6).alias("rolling_std_response_rate"),
    )


# the reference's predefined QC bin edges
# (create_shareable_visualizations.py:64-99: length_minutes and overall_db)
_LM_EDGES = [0.0, 0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 2.5, 3.0, 4.1]
_DB_EDGES = [40.0, 45.0, 50.0, 55.0, 60.0, 65.0, 70.0, 75.0, 80.0, 90.0, 100.0]


def q_qc_histogram_bins(spark, sf):
    # A9 with the reference's EXACT fixed bin edges + the out-of-range row
    # (bin_idx -1, the "N outside of range" axis label); np.histogram
    # semantics (upper-edge exclusive, last bin inclusive). Bins with no
    # observations are omitted (sparse) on both engines.
    from daily_journal_dataflow_qc_spark.operators.summaries import (
        fixed_bin_histogram,
    )

    ev = _t(spark, sf, "events")
    qc = ev.select(
        F.round(F.col("value") / 10.0, 3).alias("length_minutes"),
        (F.lit(40.0) + F.pmod(F.col("user_id"), F.lit(30)).cast("double")).alias(
            "overall_db"
        ),
    )
    lm = fixed_bin_histogram(qc, "length_minutes", _LM_EDGES)
    db = fixed_bin_histogram(qc, "overall_db", _DB_EDGES)
    return lm.unionByName(db)


def _hist_oracle_sql(feature_name: str, expr: str, edges: list[float]) -> str:
    """DuckDB mirror of fixed_bin_histogram over events: same CASE chain,
    same sparse output."""
    n = len(edges) - 1
    conds = " ".join(
        f"WHEN x >= {edges[i]!r} AND x < {edges[i + 1]!r} THEN {i}"
        for i in range(n - 1)
    )
    case = (
        f"CASE WHEN x IS NULL OR x < {edges[0]!r} OR x > {edges[-1]!r} THEN -1 "
        f"{conds} ELSE {n - 1} END"
    )
    lo = "[" + ", ".join(repr(float(e)) for e in edges[:-1]) + "]"
    hi = "[" + ", ".join(repr(float(e)) for e in edges[1:]) + "]"
    return f"""
        SELECT '{feature_name}' AS feature, bin_idx,
               CASE WHEN bin_idx >= 0 THEN {lo}[CAST(bin_idx AS INT) + 1] END AS bin_lo,
               CASE WHEN bin_idx >= 0 THEN {hi}[CAST(bin_idx AS INT) + 1] END AS bin_hi,
               count(*) AS n
        FROM (SELECT CAST({case} AS BIGINT) AS bin_idx
              FROM (SELECT {expr} AS x FROM events))
        GROUP BY bin_idx
    """


def q_email_summary(spark, sf):
    # the Monday email's per-site content tables
    # (finalize_server_summary_email_html.py:26-56) with the reference's
    # exact display column names; HTML rendering intentionally out of scope
    import datetime as _dt

    from daily_journal_dataflow_qc_spark.config import PipelineConfig
    from daily_journal_dataflow_qc_spark.operators.summaries import (
        activity_engagement_summary,
        email_summary_tables,
        group_level_summary,
    )

    cfg = PipelineConfig(compute_date=_dt.date(2024, 6, 1))
    site = F.concat(F.lit("s"), F.substring("conv_id", 5, 1))
    sites = group_level_summary(_accepted_shape(spark, sf), cfg, group_expr=site)
    ev = _t(spark, sf, "events")
    accounting = ev.groupBy(
        F.concat(F.lit("conv"), F.col("user_id").cast("string")).alias("conv_id"),
        F.to_date("ts").alias("_d"),
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "ema_records_count"
        ),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "diary_records_count"
        ),
    )
    _, act_site = activity_engagement_summary(
        accounting, group_expr=F.concat(F.lit("s"), F.substring("conv_id", 5, 1))
    )
    return email_summary_tables(sites, act_site)


def q_return_error_clear(spark, sf):
    # Issues-log MAINTENANCE, merged grain (driver 50-cap): (1) manual_update_
    # utilities/transcribeme_return_error_clear.py graft — stale pending-
    # return flags clear iff the file left the pending area AND its
    # transcript exists; (2) the three OUTPUT-RECONCILIATION flag families
    # (journal_outputs_error_check.py:76,84/:151,159; subject_summaries_
    # update.sh:264) over deterministically-drifted diary-grain outputs:
    # _h==0 duplicates the audio-QC identity, _h==3 has a redacted-CSV
    # product with no transcript QC, _h==5 completed its round trip but has
    # no per-turn rows (_h==7 never returned, so it must NOT flag).
    import datetime as _dt

    from daily_journal_dataflow_qc_spark.config import PipelineConfig
    from daily_journal_dataflow_qc_spark.operators.compile import (
        MSG_PENDING,
        issues_set,
    )
    from daily_journal_dataflow_qc_spark.operators.transcript import (
        clear_resolved_return_errors,
    )

    ev = _t(spark, sf, "events")
    rows = ev.select(
        F.concat(F.lit("conv"), F.col("user_id").cast("string")).alias("conv_id"),
        F.pmod(F.col("event_id"), F.lit(25)).alias("_i"),
        "user_id",
    ).distinct()
    h = F.pmod(F.col("user_id") + F.col("_i") * 3, F.lit(8))
    keyed = rows.select(
        "conv_id",
        F.col("_i"),
        F.format_string("d%02d.wav", F.col("_i")).alias("filename"),
        h.alias("_h"),
    )
    issues = keyed.select(
        "conv_id",
        "filename",
        F.when(F.col("_h") < 4, F.lit(MSG_PENDING))
        .otherwise(F.lit("other issue"))
        .alias("error_message"),
    )
    pending = keyed.filter(F.pmod(F.col("_h"), F.lit(2)) == 0).select(
        "conv_id", "filename"
    )
    transcripts = keyed.filter(F.pmod(F.col("_h"), F.lit(3)) == 0).select(
        "conv_id", "filename"
    )
    cleared = clear_resolved_return_errors(issues, pending, transcripts)

    # reconciliation leg: issues_set with ONLY the output-drift inputs live
    # (no tool tags / in-deadline requests, so the legacy families are empty)
    cfg = PipelineConfig(compute_date=_dt.date(2024, 6, 1))
    dk = [F.col("_i").alias("day"), F.lit(1).alias("daily_submission_number")]
    aqc_one = keyed.select(
        "conv_id", *dk, "filename",
        F.lit("ENGLISH").alias("language"),
        F.lit(1).alias("audio_approved_bool"),
        F.lit(False).alias("has_tool_tag"),
        "_h",
    )
    aqc = aqc_one.unionByName(aqc_one.filter(F.col("_h") == 0)).drop("_h")
    reqs = keyed.select(
        "conv_id",
        F.col("filename").alias("request_key"),
        F.to_timestamp(F.lit("2024-06-01")).alias("ts"),
    )
    rets = keyed.filter(F.col("_h") != 7).select(
        "conv_id", F.col("filename").alias("request_key")
    )
    violated = spark.createDataFrame([], "conv_id string, filename string")
    tqc = keyed.filter(F.pmod("_h", F.lit(2)) == 0).select("conv_id", *dk, "filename")
    disf = keyed.filter(F.pmod("_h", F.lit(3)) == 0).select("conv_id", *dk, "filename")
    turns = keyed.filter(F.col("_h") != 5).select("conv_id", *dk)
    recon = issues_set(
        aqc, reqs, rets, violated, cfg,
        transcript_qc=tqc, disfluencies=disf, turn_stats=turns,
    )
    return cleared.unionByName(recon.select("conv_id", "filename", "error_message"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 queries: the driver's CORRECTNESS gate records at most 50
    # rows per round (r01: 41 registered -> 41 rows, r02: 47 -> 47, r03:
    # 56 -> first 50 only). Same-grain micro-queries are merged
    # (user_engagement, daily_windows, text_metrics, text_analysis) so every
    # SURVEY §2 component keeps a driver-checked column while the registry
    # fits the gate.
    return {
        "tpch_pricing": q_tpch_pricing,
        "user_engagement": q_user_engagement,
        "type_rollup": q_type_rollup,
        "histogram": q_histogram,
        "join_left_rollup": q_join_left_rollup,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "outer_fillna": q_outer_fillna,
        "cardinality_guard": q_cardinality_guard,
        "first_event": q_first_event,
        "lead_gaps": q_lead_gaps,
        "daily_windows": q_daily_windows,
        "dedup_keep_first": q_dedup_keep_first,
        "union_all": q_union_all,
        "except_users": q_except_users,
        "topk_per_group": q_topk_per_group,
        "tumbling_4am": q_tumbling_4am,
        "sessionization": q_sessionization,
        "unmatched_within_window": q_unmatched_within_window,
        "text_metrics": q_text_metrics,
        "text_analysis": q_text_analysis,
        "dedup_exact_docs": q_dedup_exact_docs,
        "minhash_signature": q_minhash_signature,
        "embedding_nn": q_embedding_nn,
        "lsh_candidates": q_lsh_candidates,
        "near_dup_pairs": q_near_dup_pairs,
        "simhash_docs": q_simhash_docs,
        "ngram_jaccard_adjacent": q_ngram_jaccard_adjacent,
        "media_features": q_media_features,
        "lsh_bucketed_ann": q_lsh_bucketed_ann,
        "redaction": q_redaction,
        "datetime_rules": q_datetime_rules,
        "canonical_names": q_canonical_names,
        "parse_transcript": q_parse_transcript,
        "activity_summary": q_activity_summary,
        "activity_group_counts": q_activity_group_counts,
        "flagship_events": q_flagship_events,
        "push_lifecycle": q_push_lifecycle,
        "activity_scan": q_activity_scan,
        "snapshot_latest": q_snapshot_latest,
        "pending_age": q_pending_age,
        "conv_summary": q_conv_summary,
        "site_summary": q_site_summary,
        "disfluency_rates": q_disfluency_rates,
        "salted_counts": q_salted_counts,
        "cube_rollup": q_cube_rollup,
        "participation_timecourse": q_participation_timecourse,
        "qc_histogram_bins": q_qc_histogram_bins,
        "email_summary": q_email_summary,
        "return_error_clear": q_return_error_clear,
    }


def oracle_sql() -> dict[str, str]:
    mh = ", ".join(
        f"list_min(list_transform(string_split(lower(text), ' '), "
        f"x -> CAST(('0x' || substring(md5('s{i}:' || x), 1, 15)) AS BIGINT))) AS mh{i}"
        for i in range(4)
    )
    words = "string_split(lower(text), ' ')"

    # HLL mirror constants (dedup_exact_docs row) — every number below
    # derives from the ONE knob _HLL_P, exactly as sketches.hll_estimate
    # derives its own; the numerator is ONE python double shared with the
    # Spark side so both engines perform the same single division
    from daily_journal_dataflow_qc_spark.operators.sketches import (
        HASH_BITS,
        _alpha,
    )

    hm = 1 << _HLL_P  # registers
    hrmax = HASH_BITS - _HLL_P + 1  # scaled-sum exponent; rho = hrmax - bitlen
    hll_num = repr(_alpha(hm) * hm * hm * float(1 << hrmax))
    hll_lc_m = repr(float(hm))  # linear-counting m as a double literal
    hll_small = repr(2.5 * hm)  # small-range switch threshold
    hll_bitlen = (
        "CASE "
        + " ".join(
            f"WHEN w >= {1 << (k - 1)} THEN {k}"
            for k in range(HASH_BITS - _HLL_P, 0, -1)
        )
        + " ELSE 0 END"
    )

    def grams_sql(k: int) -> str:
        # contiguous k-grams WITH duplicates over the alias ``w`` (mirrors
        # operators/textanalysis.ngram_list incl. the short-doc fallback)
        return (
            f"CASE WHEN len(w) >= {k} THEN "
            f"list_transform(generate_series(1, len(w) - {k - 1}), "
            f"i -> array_to_string(list_slice(w, i, i + {k - 1}), ' ')) "
            f"ELSE [array_to_string(w, ' ')] END"
        )

    shingles = (
        f"list_distinct(CASE WHEN len({words}) >= 3 THEN "
        f"list_transform(generate_series(1, len({words}) - 2), "
        f"i -> array_to_string(list_slice({words}, i, i + 2), ' ')) "
        f"ELSE [array_to_string({words}, ' ')] END)"
    )
    sh_mh = ", ".join(
        f"list_min(list_transform(s, x -> CAST(('0x' || substring(md5('s{i}:' || x), 1, 15)) AS BIGINT))) AS mh{i}"
        for i in range(4)
    )
    simhash_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {j}) & 1) * 2 - 1)) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(16)
    )
    stop_en = "'the','a','of','and','to','is','in','it','that','was'"
    stop_es = "'el','la','de','y','que','en','un','una','los','es'"
    stop_fr = "'le','la','de','et','que','en','un','une','les','est'"
    extra = {
        "lsh_candidates": f"""
            WITH sh AS (SELECT doc_id, {shingles} AS s FROM documents),
            sig AS (SELECT doc_id, {sh_mh} FROM sh)
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
             AND (a.mh0 = b.mh0 OR a.mh1 = b.mh1 OR a.mh2 = b.mh2 OR a.mh3 = b.mh3)
        """,
        "near_dup_pairs": f"""
            WITH RECURSIVE sh AS (SELECT doc_id, {shingles} AS s FROM documents),
            sig AS (SELECT doc_id, s, {sh_mh} FROM sh),
            cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.s AS sa, b.s AS sb
                FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                 AND (a.mh0 = b.mh0 OR a.mh1 = b.mh1 OR a.mh2 = b.mh2 OR a.mh3 = b.mh3)
            ),
            tpairs AS (
                SELECT id_a, id_b, jaccard FROM (
                    SELECT id_a, id_b,
                           round(len(list_intersect(sa, sb)) /
                                 len(list_distinct(list_concat(sa, sb))), 4) AS jaccard
                    FROM cand
                ) WHERE jaccard >= 0.2
            ),
            -- transitive-closure mirror of connected_components: min
            -- reachable id = the component-min representative
            edges AS (
                SELECT id_a AS eu, id_b AS ev FROM tpairs
                UNION
                SELECT id_b, id_a FROM tpairs
            ),
            reach(u, r) AS (
                SELECT eu, eu FROM edges
                UNION
                SELECT e.eu, reach.r FROM edges e JOIN reach ON e.ev = reach.u
            ),
            comp AS (SELECT u AS node_id, MIN(r) AS rep FROM reach GROUP BY u),
            csize AS (SELECT rep, COUNT(*) AS n FROM comp GROUP BY rep)
            SELECT 'text' AS mode, id_a, id_b, jaccard AS score FROM tpairs
            UNION ALL
            SELECT 'embedding' AS mode, a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 2) AS score
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
            UNION ALL
            SELECT 'cluster' AS mode, comp.node_id AS id_a, comp.rep AS id_b,
                   CAST(csize.n AS DOUBLE) AS score
            FROM comp JOIN csize ON comp.rep = csize.rep
        """,
        "simhash_docs": f"""
            WITH h AS (
                SELECT doc_id,
                       list_transform({words},
                           x -> CAST(('0x' || substring(md5('sim:' || x), 1, 15)) AS BIGINT)) AS hs
                FROM documents
            ),
            sc AS (
                SELECT doc_id,
                       round(len(list_filter({words},
                                 x -> x IN ('the','a','of','and','to')))
                             / len({words}), 6) AS q_score,
                       CAST(len({words}) AS BIGINT) AS n_tokens
                FROM documents
            ),
            cum AS (
                SELECT doc_id, q_score, n_tokens,
                       sum(n_tokens) OVER (ORDER BY q_score DESC, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
                FROM sc
            )
            SELECT h.doc_id, CAST({simhash_terms} AS BIGINT) AS simhash,
                   cum.q_score, cum.n_tokens,
                   cum.c <= (SELECT CAST(sum(n_tokens) AS BIGINT) // 2 FROM sc)
                     AS budget_kept
            FROM h JOIN cum USING (doc_id)
        """,
        "ngram_jaccard_adjacent": f"""
            WITH sh AS (SELECT doc_id, {shingles} AS s FROM documents)
            SELECT a.doc_id AS id_a,
                   round(len(list_intersect(a.s, b.s)) /
                         len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
        "text_analysis": f"""
            WITH b0 AS (
                SELECT doc_id, lower(text) AS lc, {words} AS w,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' café' ELSE text END AS enc_t
                FROM documents
            ), b AS (
                SELECT *, {grams_sql(2)} AS gl2, {grams_sql(3)} AS gl3 FROM b0
            ), m2 AS (
                SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot
                FROM (SELECT doc_id, g, COUNT(*) AS c
                      FROM (SELECT doc_id, unnest(gl2) AS g FROM b)
                      GROUP BY doc_id, g)
                GROUP BY doc_id
            ), tcx AS (
                SELECT doc_id, term, COUNT(*) AS cnt
                FROM (SELECT doc_id, unnest(list_filter(w, x -> x != '')) AS term FROM b0)
                GROUP BY doc_id, term
            ), dl AS (
                SELECT doc_id, SUM(cnt) AS dlen FROM tcx GROUP BY doc_id
            ), dfq AS (
                SELECT term, COUNT(*) AS dft FROM tcx GROUP BY term
            ), tfi AS (
                SELECT tcx.doc_id,
                       round(avg((cnt / dlen) * (ln(((SELECT COUNT(*) FROM documents) + 1.0) / (dft + 1.0)) + 1)), 4) AS tfidf_mean,
                       round(max((cnt / dlen) * (ln(((SELECT COUNT(*) FROM documents) + 1.0) / (dft + 1.0)) + 1)), 4) AS tfidf_max,
                       COUNT(*) AS n_unique_terms
                FROM tcx JOIN dl USING (doc_id) JOIN dfq USING (term)
                GROUP BY tcx.doc_id
            ), sc AS (
                SELECT doc_id,
                       len(list_filter(w, x -> x IN ({stop_en}))) AS en,
                       len(list_filter(w, x -> x IN ({stop_es}))) AS es,
                       len(list_filter(w, x -> x IN ({stop_fr}))) AS fr
                FROM b
            ), lmw AS (
                SELECT doc_id, list_filter(w, x -> x != '') AS fw FROM b0
            ), lev AS (
                SELECT doc_id,
                       CASE WHEN i = 1 THEN '<s>' ELSE fw[i-1] END AS prev,
                       fw[i] AS cur
                FROM (SELECT doc_id, fw, unnest(generate_series(1, len(fw))) AS i
                      FROM lmw WHERE len(fw) >= 1)
            ), lbg AS (
                SELECT prev, cur, COUNT(*) AS cpc FROM lev GROUP BY prev, cur
            ), lcx AS (
                SELECT prev, SUM(cpc) AS cp FROM lbg GROUP BY prev
            ), lv AS (
                SELECT COUNT(DISTINCT cur) AS v FROM lbg
            ), lmsc AS (
                -- add-k bigram LM self-trained on the corpus (k = 0.1),
                -- mirror of operators/textanalysis.ngram_lm_perplexity
                -- k cast to DOUBLE: a bare 0.1 is DuckDB DECIMAL (exact
                -- base-10), which would diverge from Spark's binary double
                SELECT lev.doc_id,
                       round(SUM(ln((COALESCE(lbg.cpc, 0) + CAST(0.1 AS DOUBLE))
                                    / (COALESCE(lcx.cp, 0)
                                       + CAST(0.1 AS DOUBLE) * (lv.v + 1)))), 4)
                           AS lm_logprob,
                       round(exp(-SUM(ln((COALESCE(lbg.cpc, 0) + CAST(0.1 AS DOUBLE))
                                         / (COALESCE(lcx.cp, 0)
                                            + CAST(0.1 AS DOUBLE) * (lv.v + 1))))
                                 / COUNT(*)), 4) AS lm_ppl
                FROM lev LEFT JOIN lbg ON lev.prev = lbg.prev AND lev.cur = lbg.cur
                         LEFT JOIN lcx ON lev.prev = lcx.prev
                         CROSS JOIN lv
                GROUP BY lev.doc_id
            )
            SELECT b.doc_id,
                   CAST(length(lc) AS BIGINT) AS n_chars,
                   CAST(len(w) AS BIGINT) AS n_words,
                   round(length(lc) / len(w), 2) AS chars_per_word,
                   round(len(list_filter(w, x -> x IN ('the','a','of','and','to')))
                         / len(w), 4) AS stopword_ratio,
                   CAST(len(regexp_extract_all(lc, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
                   CAST(('0x' || substring(md5(array_to_string(
                        list_filter(w, x -> x != ''), ' ')), 1, 15)) AS BIGINT) AS fingerprint,
                   CASE WHEN greatest(en, es, fr) <= 0 THEN 'unknown'
                        WHEN en = greatest(en, es, fr) THEN 'en'
                        WHEN es = greatest(en, es, fr) THEN 'es'
                        ELSE 'fr' END AS lang_pred,
                   octet_length(encode(enc_t)) = length(enc_t) AS all_ascii,
                   CASE WHEN octet_length(encode(enc_t)) = length(enc_t)
                        THEN 'ASCII' ELSE 'UTF-8' END AS txt_encoding_type,
                   round(m2.mx / m2.tot, 4) AS top_2gram_frac,
                   round(1 - len(list_distinct(gl2)) / len(gl2), 4) AS dup_2gram_frac,
                   round(1 - len(list_distinct(gl3)) / len(gl3), 4) AS dup_3gram_frac,
                   COALESCE(tfi.tfidf_mean, 0.0) AS tfidf_mean,
                   COALESCE(tfi.tfidf_max, 0.0) AS tfidf_max,
                   CAST(COALESCE(tfi.n_unique_terms, 0) AS BIGINT) AS n_unique_terms,
                   COALESCE(lmsc.lm_logprob, 0.0) AS lm_logprob,
                   COALESCE(lmsc.lm_ppl, 0.0) AS lm_ppl
            FROM b JOIN sc ON b.doc_id = sc.doc_id JOIN m2 ON b.doc_id = m2.doc_id
                 LEFT JOIN tfi ON b.doc_id = tfi.doc_id
                 LEFT JOIN lmsc ON b.doc_id = lmsc.doc_id
        """,
        # lsh_bucketed_ann: planes are seeded-deterministic -> full relational
        # mirror with the planes embedded as SQL literals
        "lsh_bucketed_ann": _lsh_ann_oracle_sql(),
        "redaction": """
            SELECT doc_id,
                   replace(lower(text), 'table', '{REDACTED REDACTED}') AS redacted,
                   CAST(0 AS INT) AS violated
            FROM documents
        """,
        "datetime_rules": """
            WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS consent FROM events GROUP BY user_id),
            b AS (
                SELECT e.event_id, e.user_id, c.consent,
                       CASE e.user_id % 4
                            WHEN 0 THEN e.ts
                            WHEN 1 THEN e.ts + INTERVAL 9 HOUR
                            WHEN 2 THEN e.ts + INTERVAL 330 MINUTE
                            ELSE e.ts - INTERVAL 7 HOUR END AS lts
                FROM events e JOIN c ON e.user_id = c.user_id
            ), f AS (
                SELECT *, hour(lts) AS h,
                       date_diff('day', consent, CAST(lts AS DATE)) + 1 AS literal_day,
                       ((isodow(lts) + 1) % 7) + 1 AS wd
                FROM b
            )
            SELECT event_id, user_id,
                   strftime(lts, '%Y-%m-%d %H:%M:%S') AS local_time_str,
                   strftime(lts, '%H:%M:%S') AS timeofday,
                   CAST(CASE WHEN h < 4 THEN literal_day - 1 ELSE literal_day END AS BIGINT) AS day,
                   CAST(CASE WHEN h < 4 THEN h + 24 ELSE h END AS BIGINT) AS submit_hour_int,
                   CAST(minute(lts) AS BIGINT) AS submit_minute_int,
                   CAST(CASE WHEN h < 4 THEN (CASE WHEN wd > 1 THEN wd - 1 ELSE 7 END)
                             ELSE wd END AS BIGINT) AS weekday,
                   strftime(consent, '%m/%Y') AS subject_consent_month
            FROM f
        """,
        "canonical_names": """
            WITH b AS (
                SELECT event_id,
                       printf('u%d_audioJournal_day%04d_submission%d.wav',
                              user_id, (event_id % 300) + 1, (event_id % 3) + 1) AS local_name,
                       CASE WHEN user_id % 2 = 0 THEN 'ENGLISH' ELSE 'KOREAN' END AS lang
                FROM events
            ), m AS (
                SELECT *,
                       string_split(local_name, 'submission')[1] || lang || '_submission'
                           || string_split(local_name, 'submission')[2] AS tool_name
                FROM b
            )
            SELECT event_id, local_name, tool_name,
                   replace(tool_name, lang || '_submission', 'submission') AS restored,
                   CAST(string_split(string_split(tool_name, '_day')[-1], '_')[1] AS BIGINT) AS day_extracted,
                   CAST(string_split(string_split(tool_name, '_submission')[-1], '.wav')[1] AS BIGINT) AS sub_extracted,
                   string_split('/data/raw/' || tool_name, '/')[-1] AS base
            FROM m
        """,
        "parse_transcript": """
            WITH s AS (
                SELECT doc_id, text,
                       CASE WHEN doc_id % 5 = 0
                            THEN printf('%d:%02d:%02d.%03d', doc_id % 3, doc_id % 60,
                                        (doc_id * 7) % 60, (doc_id * 13) % 1000)
                            ELSE printf('%02d:%02d.%03d', doc_id % 60,
                                        (doc_id * 7) % 60, (doc_id * 13) % 1000)
                       END AS stamp
                FROM documents
            ), p AS (SELECT *, string_split(stamp, ':') AS parts FROM s)
            SELECT doc_id, 'S1' AS speakerID, stamp AS timefromstart,
                   round(CASE WHEN len(parts) = 3
                              THEN CAST(parts[1] AS DOUBLE) * 60.0 + CAST(parts[2] AS DOUBLE)
                                   + CAST(parts[3] AS DOUBLE) / 60.0
                              ELSE CAST(parts[1] AS DOUBLE) + CAST(parts[2] AS DOUBLE) / 60.0
                         END, 6) AS minutes,
                   text
            FROM p
        """,
        "media_features": """
            SELECT doc_id AS media_id,
                   ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS digest,
                   CAST(8 AS INT) AS n_frames
            FROM documents
        """,
        "activity_summary": """
            SELECT user_id,
                   CAST(sum(any1) AS BIGINT) AS num_days_any_activity_submit,
                   CAST(sum(ema1) AS BIGINT) AS num_days_ema_submit,
                   CAST(sum(journal1) AS BIGINT) AS num_days_journal_submit
            FROM (
                SELECT user_id, CAST(ts AS DATE) AS d,
                       least(count(*), 1) AS any1,
                       least(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 1) AS ema1,
                       least(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 1) AS journal1
                FROM events GROUP BY 1, 2
            ) GROUP BY user_id
        """,
        "activity_group_counts": """
            SELECT CAST(user_id % 7 AS BIGINT) AS site,
                   count(*) AS num_subjects_found,
                   CAST(sum(any_ema) AS BIGINT) AS num_subjects_any_ema,
                   CAST(sum(any_journal) AS BIGINT) AS num_subjects_any_journal
            FROM (
                SELECT user_id,
                       max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS any_ema,
                       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS any_journal
                FROM events GROUP BY user_id
            ) GROUP BY 1
        """,
        "flagship_events": """
            WITH turns AS (
                SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY user_id, event_id ORDER BY ts) AS rn
                    FROM events
                ) WHERE rn = 1
            ), g AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                            THEN 1 ELSE 0 END AS b
                FROM turns WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, ts,
                       sum(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM g
            ), consent AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS consent FROM turns GROUP BY user_id
            ), diaries AS (
                SELECT s.user_id, sid, min(ts) AS session_start, count(*) AS n_turns
                FROM s GROUP BY s.user_id, sid
            ), identity AS (
                SELECT d.user_id, d.n_turns, d.session_start,
                       CASE WHEN hour(session_start) < 4
                            THEN date_diff('day', consent, CAST(session_start AS DATE))
                            ELSE date_diff('day', consent, CAST(session_start AS DATE)) + 1 END AS day,
                       CASE WHEN hour(session_start) < 4 THEN hour(session_start) + 24
                            ELSE hour(session_start) END AS submit_hour_int
                FROM diaries d JOIN consent c ON d.user_id = c.user_id
            ), ranked AS (
                SELECT *, row_number() OVER (PARTITION BY user_id, day ORDER BY session_start) AS submission
                FROM identity
            )
            SELECT user_id, CAST(day AS BIGINT) AS day, CAST(submission AS BIGINT) AS submission,
                   CAST(submit_hour_int AS BIGINT) AS submit_hour_int,
                   n_turns,
                   CAST(CASE WHEN (40.0 + (user_id % 30)) < 50.0 OR n_turns * 7.0 < 1.0
                             OR submission > 1 THEN 0 ELSE 1 END AS BIGINT) AS audio_approved_bool
            FROM ranked
        """,
        "activity_scan": """
            SELECT 'u' || CAST(user_id AS VARCHAR) || '.json' AS json_filename,
                   CAST(sum(CASE WHEN event_type != 'error' THEN 1 ELSE 0 END) AS BIGINT) AS number_of_records,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS diary_records_count,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ema_records_count
            FROM events GROUP BY user_id
        """,
        "snapshot_latest": """
            WITH u AS (
                SELECT user_id, event_id, event_type, ts, value FROM events
                WHERE event_type IN ('click', 'purchase')
                UNION ALL
                SELECT user_id, event_id, CAST(NULL AS VARCHAR), ts, CAST(NULL AS DOUBLE)
                FROM events WHERE event_type NOT IN ('click', 'purchase')
            )
            SELECT user_id, d, event_id AS last_event_id, event_type, round(value, 2) AS v
            FROM (
                SELECT *, CAST(ts AS DATE) AS d,
                       row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM u
            ) WHERE rn = 1
        """,
        "pending_age": """
            SELECT user_id, last_d,
                   CAST(date_diff('day', last_d, DATE '1998-06-01') AS BIGINT) AS days_since_last,
                   CAST(floor(date_diff('day', last_d, DATE '1998-06-01') / 7.0) AS BIGINT) AS weeks_since_last,
                   date_diff('day', last_d, DATE '1998-06-01') >= 14 AS is_stale
            FROM (SELECT user_id, max(CAST(ts AS DATE)) AS last_d FROM events GROUP BY user_id)
        """,
        "conv_summary": """
            WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cd FROM events GROUP BY user_id),
            a AS (
                SELECT 'conv' || CAST(e.user_id AS VARCHAR) AS conv_id,
                       CAST(date_diff('day', cd, CAST(ts AS DATE)) + 1 AS BIGINT) AS day,
                       round(value / 10.0, 3) AS length_minutes,
                       cd
                FROM events e JOIN c ON e.user_id = c.user_id
            )
            SELECT conv_id,
                   count(DISTINCT day) AS num_days_journal_submit,
                   round(sum(length_minutes), 3) AS sum_minutes_audio_uploaded,
                   count(*) AS num_audio_files_uploaded,
                   min(day) AS first_submit_day,
                   max(day) AS last_submit_day,
                   CAST(date_diff('day', min(cd), DATE '2024-06-01') + 1 AS BIGINT) AS study_day_at_compute_time,
                   CAST(date_diff('day', min(cd), DATE '2024-06-01') + 1 - max(day) AS BIGINT) AS time_since_last_submit
            FROM a GROUP BY conv_id
        """,
        "site_summary": """
            WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cd FROM events GROUP BY user_id),
            a AS (
                SELECT 'conv' || CAST(e.user_id AS VARCHAR) AS conv_id,
                       's' || substring('conv' || CAST(e.user_id AS VARCHAR), 5, 1) AS site,
                       CAST(date_diff('day', cd, CAST(ts AS DATE)) + 1 AS BIGINT) AS day,
                       round(value / 10.0, 3) AS length_minutes,
                       cd
                FROM events e JOIN c ON e.user_id = c.user_id
            ), conv AS (
                SELECT conv_id, site,
                       round(sum(length_minutes), 3) AS sum_min,
                       count(*) AS n_files,
                       max(day) AS last_day,
                       CAST(date_diff('day', min(cd), DATE '2024-06-01') + 1 AS BIGINT) AS study_day
                FROM a GROUP BY conv_id, site
            ), base AS (
                SELECT site,
                       count(DISTINCT conv_id) AS num_subjects_any_journal,
                       round(sum(sum_min), 3) AS sum_minutes_audio_uploaded,
                       CAST(sum(n_files) AS BIGINT) AS num_audio_files_uploaded,
                       CAST(sum(CASE WHEN study_day <= 14 THEN 1 ELSE 0 END) AS BIGINT)
                           AS num_subjects_within_first_two_weeks_of_enrollment,
                       CAST(sum(CASE WHEN study_day - last_day <= 14 THEN 1 ELSE 0 END) AS BIGINT)
                           AS num_subjects_submit_within_last_two_weeks,
                       round(sum(CASE WHEN last_day > 14 THEN 1 ELSE 0 END)
                             / nullif(sum(CASE WHEN study_day > 14 THEN 1 ELSE 0 END), 0), 4)
                           AS fraction_diary_subjects_submit_after_two_weeks
                FROM conv GROUP BY site
            ), post_mins AS (
                SELECT site, round(avg(length_minutes), 4) AS mean_minutes_per_diary_after_two_weeks
                FROM a WHERE day > 14 GROUP BY site
            ), pre_rate AS (
                SELECT site,
                       round(count(*) / count(DISTINCT conv_id), 4)
                           AS mean_accepted_diaries_per_subject_within_first_two_weeks,
                       round(avg(length_minutes), 4) AS mean_minutes_per_diary_first_two_weeks
                FROM a WHERE day <= 14 GROUP BY site
            ), weeks AS (
                SELECT site, sum(ceil(study_day / 7.0) - 2) AS num_weeks
                FROM conv
                WHERE conv_id IN (SELECT DISTINCT conv_id FROM a WHERE day > 14)
                GROUP BY site
            ), post_rate AS (
                SELECT p.site,
                       round(p.n_post / w.num_weeks, 4)
                           AS mean_accepted_diaries_per_subject_week_after_two_weeks
                FROM (SELECT site, count(*) AS n_post FROM a WHERE day > 14 GROUP BY site) p
                JOIN weeks w ON p.site = w.site
            )
            SELECT b.*, pm.mean_minutes_per_diary_after_two_weeks,
                   pr.mean_accepted_diaries_per_subject_week_after_two_weeks,
                   q.mean_accepted_diaries_per_subject_within_first_two_weeks,
                   q.mean_minutes_per_diary_first_two_weeks
            FROM base b
            LEFT JOIN post_mins pm ON b.site = pm.site
            LEFT JOIN post_rate pr ON b.site = pr.site
            LEFT JOIN pre_rate q ON b.site = q.site
        """,
        "disfluency_rates": """
            WITH m AS (
                SELECT source,
                       len(string_split(lower(text), ' ')) AS wc,
                       len(regexp_extract_all(
                           ' ' || array_to_string(string_split(lower(text), ' '), '  ') || ' ',
                           '[^a-z]u+[hm]+[^a-z]')) AS nv,
                       CAST((length(lower(text)) - length(replace(lower(text), 'like,', ''))) / 5 AS INT)
                       + CAST((length(lower(text)) - length(replace(lower(text), 'you know,', ''))) / 9 AS INT)
                       + CAST((length(lower(text)) - length(replace(lower(text), 'i mean,', ''))) / 7 AS INT) AS ve,
                       CAST((length(lower(text)) - length(replace(lower(text), '--', ''))) / 2 AS INT) AS rs,
                       coalesce(list_sum(list_transform(
                           generate_series(2, len(string_split(lower(text), ' '))),
                           i -> CASE WHEN replace(string_split(lower(text), ' ')[i-1], ',', '')
                                        = replace(string_split(lower(text), ' ')[i], ',', '')
                                     THEN 1 ELSE 0 END)), 0) AS wr
                FROM documents
            ), agg AS (
                SELECT source,
                       CAST(sum(wc) AS DOUBLE) AS total_word_count,
                       CAST(sum(nv) AS DOUBLE) AS nonverbal_edits_count,
                       CAST(sum(ve) AS DOUBLE) AS verbal_edits_count,
                       CAST(sum(rs) AS DOUBLE) AS restarts_count,
                       CAST(sum(wr) AS DOUBLE) AS repeats_count
                FROM m GROUP BY source
            )
            SELECT source, total_word_count, nonverbal_edits_count, verbal_edits_count,
                   restarts_count, repeats_count,
                   round(nonverbal_edits_count / nullif(total_word_count, 0), 6) AS nonverbal_per_word,
                   round(verbal_edits_count / nullif(total_word_count, 0), 6) AS verbal_per_word,
                   round(restarts_count / nullif(total_word_count, 0), 6) AS restarts_per_word,
                   round(repeats_count / nullif(total_word_count, 0), 6) AS repeats_per_word
            FROM agg
        """,
        "salted_counts": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS v
            FROM events GROUP BY event_type
        """,
        "push_lifecycle": """
            SELECT conv_id, request_key,
                   CAST(count(DISTINCT CASE WHEN kind = 'request' THEN ts END) AS BIGINT) AS n_attempts,
                   strftime(min(CASE WHEN kind = 'request' THEN ts END), '%Y-%m-%d %H:%M:%S') AS first_attempt,
                   strftime(max(CASE WHEN kind = 'request' THEN ts END), '%Y-%m-%d %H:%M:%S') AS last_attempt,
                   bool_or(kind = 'return') AS returned
            FROM (
                SELECT 'conv' || CAST(user_id AS VARCHAR) AS conv_id,
                       'k' || CAST(event_id % 50 AS VARCHAR) AS request_key,
                       CASE WHEN event_type = 'purchase' THEN 'return' ELSE 'request' END AS kind,
                       ts
                FROM events
            ) GROUP BY conv_id, request_key
        """,
        "cube_rollup": """
            SELECT coalesce(event_type, 'ALL') AS event_type,
                   coalesce(CAST(d AS VARCHAR), 'ALL') AS d,
                   count(*) AS n, round(sum(value), 2) AS v
            FROM (SELECT event_type, CAST(ts AS DATE) AS d, value FROM events)
            GROUP BY CUBE (event_type, d)
        """,
        "participation_timecourse": """
            WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cd FROM events GROUP BY user_id),
            a AS (
                SELECT 'conv' || CAST(e.user_id AS VARCHAR) AS conv_id,
                       CAST(date_diff('day', cd, CAST(ts AS DATE)) + 1 AS BIGINT) AS day, cd
                FROM events e JOIN c ON e.user_id = c.user_id
            ), conv AS (
                SELECT conv_id,
                       CAST(date_diff('day', min(cd), DATE '2024-02-15') + 1 AS BIGINT) AS study_day
                FROM a GROUP BY conv_id
            ), spine AS (
                SELECT unnest(generate_series(1, (SELECT max(study_day) FROM conv))) AS day
            ), subj AS (
                SELECT study_day AS day, count(*) AS n_subj FROM conv GROUP BY study_day
            ), reached AS (
                SELECT s.day,
                       sum(coalesce(n_subj, 0)) OVER (ORDER BY s.day DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS reached
                FROM spine s LEFT JOIN subj ON s.day = subj.day
            ), di AS (SELECT day, count(*) AS n_d FROM a GROUP BY day),
            acct AS (
                SELECT r.day, r.reached, coalesce(n_d, 0) AS n_diaries,
                       coalesce(n_d, 0) / CAST(r.reached AS DOUBLE) AS rate
                FROM reached r LEFT JOIN di ON r.day = di.day
                WHERE r.reached > 0
            )
            SELECT day, CAST(reached AS BIGINT) AS total_subjects_reached_day,
                   CAST(n_diaries AS BIGINT) AS total_accepted_diaries_submitted_on_day,
                   round(rate, 6) AS response_rate,
                   round(CASE WHEN row_number() OVER (ORDER BY day) >= 7
                         THEN avg(rate) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) END, 6)
                       AS rolling_mean_response_rate,
                   round(CASE WHEN row_number() OVER (ORDER BY day) >= 7
                         THEN stddev_samp(rate) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) END, 6)
                       AS rolling_std_response_rate
            FROM acct
        """,
        "qc_histogram_bins": (
            _hist_oracle_sql("length_minutes", "round(value / 10.0, 3)", _LM_EDGES)
            + " UNION ALL "
            + _hist_oracle_sql(
                "overall_db", "40.0 + CAST(user_id % 30 AS DOUBLE)", _DB_EDGES
            )
        ),
        "email_summary": """
            WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cd FROM events GROUP BY user_id),
            a AS (
                SELECT 'conv' || CAST(e.user_id AS VARCHAR) AS conv_id,
                       's' || substring(CAST(e.user_id AS VARCHAR), 1, 1) AS site,
                       CAST(date_diff('day', cd, CAST(ts AS DATE)) + 1 AS BIGINT) AS day,
                       round(value / 10.0, 3) AS length_minutes,
                       cd
                FROM events e JOIN c ON e.user_id = c.user_id
            ), conv AS (
                SELECT conv_id, site,
                       round(sum(length_minutes), 3) AS sum_min,
                       count(*) AS n_files,
                       max(day) AS last_day,
                       CAST(date_diff('day', min(cd), DATE '2024-06-01') + 1 AS BIGINT) AS study_day
                FROM a GROUP BY conv_id, site
            ), base AS (
                SELECT site,
                       round(sum(sum_min), 3) AS smu,
                       CAST(sum(n_files) AS BIGINT) AS naf,
                       CAST(sum(CASE WHEN study_day - last_day <= 14 THEN 1 ELSE 0 END) AS BIGINT) AS last2w
                FROM conv GROUP BY site
            ), act AS (
                SELECT 's' || substring(CAST(user_id AS VARCHAR), 1, 1) AS site,
                       count(*) AS found,
                       CAST(sum(any_ema) AS BIGINT) AS any_ema,
                       CAST(sum(any_journal) AS BIGINT) AS any_journal,
                       CAST(sum(any_active) AS BIGINT) AS any_active
                FROM (
                    SELECT user_id,
                           max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS any_ema,
                           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS any_journal,
                           max(CASE WHEN event_type IN ('click', 'purchase') THEN 1 ELSE 0 END) AS any_active
                    FROM events GROUP BY user_id
                ) GROUP BY 1
            )
            SELECT substring(b.site, -2) AS "Site",
                   naf AS "Total Successful Audio Journal Submissions",
                   smu AS "Sum Minutes Uploaded to TranscribeMe",
                   CAST(found AS BIGINT) AS "Subject IDs Found",
                   any_ema AS "Subjects Submitting EMAs (>=1)",
                   any_journal AS "Subjects Submitting Journals (>=1)",
                   last2w AS "Subjects Recording a Journal in Last 2 Weeks"
            FROM base b JOIN act ON b.site = act.site
            WHERE smu IS NOT NULL AND naf IS NOT NULL AND any_active > 0
        """,
        "return_error_clear": """
            WITH r AS (
                SELECT DISTINCT 'conv' || CAST(user_id AS VARCHAR) AS conv_id,
                       user_id, event_id % 25 AS i
                FROM events
            ), k AS (
                SELECT conv_id, i, printf('d%02d.wav', i) AS filename,
                       (user_id + i * 3) % 8 AS hh
                FROM r
            ), aqc AS (
                SELECT conv_id, i AS day, 1 AS sub, filename FROM k
                UNION ALL
                SELECT conv_id, i, 1, filename FROM k WHERE hh = 0
            ), tqc AS (
                SELECT conv_id, i AS day, 1 AS sub, filename FROM k WHERE hh % 2 = 0
            ), disf AS (
                SELECT conv_id, i AS day, 1 AS sub, filename FROM k WHERE hh % 3 = 0
            ), turns AS (
                SELECT conv_id, i AS day, 1 AS sub FROM k WHERE hh <> 5
            ), completed AS (
                SELECT conv_id, i AS day, 1 AS sub, filename FROM k WHERE hh <> 7
            )
            SELECT conv_id, filename,
                   CASE WHEN hh < 4
                        THEN 'File has been pending return from TranscribeMe for over 2 weeks now'
                        ELSE 'other issue' END AS error_message
            FROM k
            WHERE NOT (hh < 4 AND hh % 2 = 1 AND hh % 3 = 0)
            UNION ALL
            SELECT t.conv_id, t.filename,
                   'File appears to have fully completed pipeline but can not find a unique entry in audio QC for it now'
            FROM tqc t LEFT JOIN (
                SELECT conv_id, day, sub, count(*) AS n FROM aqc GROUP BY ALL
            ) a ON t.conv_id = a.conv_id AND t.day = a.day AND t.sub = a.sub
            WHERE coalesce(a.n, 0) <> 1
            UNION ALL
            SELECT d.conv_id, replace(d.filename, '.wav', '_REDACTED.csv'),
                   'File has redacted CSV version available but transcript QC that should have been computed from that is not found'
            FROM disf d LEFT JOIN (
                SELECT conv_id, day, sub, count(*) AS n FROM tqc GROUP BY ALL
            ) t ON d.conv_id = t.conv_id AND d.day = t.day AND d.sub = t.sub
            WHERE coalesce(t.n, 0) <> 1
            UNION ALL
            SELECT c.conv_id, c.filename,
                   'Audio marked as completed but pulled transcript not found'
            FROM completed c
            WHERE NOT EXISTS (
                SELECT 1 FROM turns t
                WHERE t.conv_id = c.conv_id AND t.day = c.day AND t.sub = c.sub
            )
        """,
    }
    return extra | {
        "tpch_pricing": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-12-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "user_engagement": """
            WITH d AS (
                SELECT user_id, CAST(sum(active) AS BIGINT) AS active_days FROM (
                    SELECT user_id, CAST(ts AS DATE) AS dd, least(count(*), 1) AS active
                    FROM events GROUP BY 1, 2
                ) GROUP BY user_id
            ), u AS (
                SELECT user_id,
                       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
                       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
                       count(*) AS n_events,
                       min(CAST(ts AS DATE)) AS first_day,
                       max(CAST(ts AS DATE)) AS last_day,
                       CAST(date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) AS BIGINT) AS span_days
                FROM events GROUP BY user_id
            )
            SELECT u.user_id, clicks, purchases, n_events, first_day, last_day,
                   span_days, active_days
            FROM u JOIN d ON u.user_id = d.user_id
        """,
        "type_rollup": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value,
                   round(avg(value), 2) AS avg_value, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "histogram": """
            SELECT CAST(CASE WHEN value < 0 THEN -1 WHEN value >= 100 THEN 10
                        ELSE floor(value / 10) END AS BIGINT) AS bucket, count(*) AS n
            FROM events GROUP BY 1
        """,
        "join_left_rollup": """
            SELECT coalesce(c_mktsegment, 'UNKNOWN') AS segment, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "semi_join": """
            SELECT c_mktsegment, count(*) AS n_customers FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
            GROUP BY c_mktsegment
        """,
        "outer_fillna": """
            SELECT coalesce(a.user_id, b.user_id) AS user_id,
                   CAST(coalesce(a.clicks, 0) AS BIGINT) AS clicks,
                   CAST(coalesce(b.purchases, 0) AS BIGINT) AS purchases
            FROM (SELECT user_id, count(*) AS clicks FROM events WHERE event_type='click' GROUP BY 1) a
            FULL OUTER JOIN (SELECT user_id, count(*) AS purchases FROM events WHERE event_type='purchase' GROUP BY 1) b
            USING (user_id)
        """,
        "cardinality_guard": """
            SELECT l_orderkey, count(*) AS n_lines FROM lineitem
            GROUP BY l_orderkey HAVING count(*) != 1
        """,
        "first_event": """
            SELECT user_id, event_id AS first_event_id, event_type AS first_type FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "lead_gaps": """
            SELECT user_id, CAST(min(gap_us) AS BIGINT) AS min_gap_us, CAST(max(gap_us) AS BIGINT) AS max_gap_us FROM (
                SELECT user_id,
                       date_diff('microsecond', ts, lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
                FROM events
            ) GROUP BY user_id HAVING count(*) > 1
        """,
        "daily_windows": """
            SELECT event_type, d,
                   CASE WHEN row_number() OVER (PARTITION BY event_type ORDER BY d) >= 7
                        THEN round(avg(n) OVER (PARTITION BY event_type ORDER BY d
                                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2)
                   END AS roll7,
                   CAST(sum(n) OVER (PARTITION BY event_type ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
            FROM (SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n FROM events GROUP BY 1, 2)
        """,
        "dedup_keep_first": """
            SELECT user_id, event_type, event_id AS first_event_id FROM (
                SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "union_all": """
            SELECT event_type, count(*) AS n, round(sum(value), 2) AS v FROM (
                SELECT event_type, value FROM events WHERE value > 50
                UNION ALL
                SELECT event_type, value FROM events WHERE event_type = 'error'
            ) GROUP BY event_type
        """,
        "except_users": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        """,
        "topk_per_group": """
            SELECT event_type, user_id, total, CAST(rk AS BIGINT) AS rk FROM (
                SELECT event_type, user_id, round(sum(value), 2) AS total,
                       row_number() OVER (PARTITION BY event_type ORDER BY round(sum(value), 2) DESC, user_id) AS rk
                FROM events GROUP BY event_type, user_id
            ) WHERE rk <= 3
        """,
        "tumbling_4am": """
            SELECT CAST(ts - INTERVAL 4 HOUR AS DATE) AS journal_day, event_type,
                   count(*) AS n, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "sessionization": """
            WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
                            THEN 1 ELSE 0 END AS boundary
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id,
                       sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM g
            )
            SELECT user_id, count(*) AS n_sessions, max(n_turns) AS max_session_turns FROM (
                SELECT user_id, session_id, count(*) AS n_turns FROM s GROUP BY 1, 2
            ) GROUP BY user_id
        """,
        "unmatched_within_window": """
            SELECT s.user_id, count(*) AS n_pending FROM
                (SELECT user_id, ts AS s_ts, event_id AS s_id FROM events WHERE event_type = 'signup') s
            WHERE NOT EXISTS (
                SELECT 1 FROM events p
                WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
                  AND p.ts >= s.s_ts AND p.ts <= s.s_ts + INTERVAL 14 DAY
            )
            GROUP BY s.user_id
        """,
        "text_metrics": """
            SELECT doc_id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS word_count,
                   CAST((length(lower(text)) - length(replace(lower(text), 'table', ''))) / 5 AS BIGINT) AS n_table,
                   CAST((length(lower(text)) - length(replace(lower(text), 'the', ''))) / 3 AS BIGINT) AS n_the,
                   CAST((length(lower(text)) - length(replace(lower(text), '--', ''))) / 2 AS BIGINT) AS n_ddash,
                   CAST(len(regexp_extract_all(
                        ' ' || array_to_string(string_split(lower(text), ' '), '  ') || ' ',
                        '[^a-z](a|the)[^a-z]')) AS BIGINT) AS n_matches,
                   CAST(len(list_filter(
                        string_split(replace(lower(text), 'table', 'ta-table'), ' '),
                        y -> len(string_split(y, '-')) > 1
                             AND starts_with(string_split(y, '-')[2], string_split(y, '-')[1])
                   )) AS BIGINT) AS n_stutters,
                   CAST(coalesce(list_sum(list_transform(
                        generate_series(2, len(string_split(lower(text), ' '))),
                        i -> CASE WHEN replace(string_split(lower(text), ' ')[i-1], ',', '')
                                     = replace(string_split(lower(text), ' ')[i], ',', '')
                                  THEN 1 ELSE 0 END
                   )), 0) AS BIGINT) AS n_repeats,
                   ch.n_chunks, ch.chunk_tokens_total, ch.chunks_digest
            FROM documents
            LEFT JOIN (
                WITH w AS (
                    SELECT doc_id, string_split(text, ' ') AS w,
                           GREATEST(CAST(CEIL((len(string_split(text, ' ')) - 2) / 6.0) AS BIGINT), 1) AS k
                    FROM documents WHERE text IS NOT NULL
                ), c AS (
                    SELECT doc_id,
                           CAST(unnest(generate_series(0, k - 1)) AS INT) AS chunk_idx,
                           w, len(w) AS n
                    FROM w
                ), t AS (
                    SELECT doc_id, chunk_idx,
                           array_to_string(list_slice(w, chunk_idx * 6 + 1, chunk_idx * 6 + 8), ' ') AS chunk_text,
                           LEAST(8, n - (chunk_idx * 6 + 1) + 1) AS chunk_tokens
                    FROM c
                )
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_chunks,
                       CAST(sum(chunk_tokens) AS BIGINT) AS chunk_tokens_total,
                       md5(string_agg(chunk_text, '|' ORDER BY chunk_idx)) AS chunks_digest
                FROM t GROUP BY doc_id
            ) ch USING (doc_id)
        """,
        "dedup_exact_docs": f"""
            WITH w AS (
              SELECT doc_id, source, text, string_split(text, ' ') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, p, array_to_string(toks[p:p+7], ' ') AS gram
              FROM w, UNNEST(range(1, len(toks) - 6)) AS u(p)
              WHERE len(toks) >= 8
            ),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
            fl AS (SELECT doc_id, p FROM g WHERE gram IN (SELECT gram FROM dup)),
            isl AS (
              SELECT doc_id, p,
                     CASE WHEN p > coalesce(max(p + 7) OVER (
                            PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -8) + 1
                          THEN 1 ELSE 0 END AS ni
              FROM fl
            ),
            spans AS (
              SELECT doc_id, min(p) AS s, max(p) + 7 AS e
              FROM (SELECT doc_id, p, sum(ni) OVER (
                      PARTITION BY doc_id ORDER BY p) AS island FROM isl)
              GROUP BY doc_id, island
            ),
            doc_spans AS (
              SELECT doc_id, count(*) AS n_dup_spans, sum(e - s + 1) AS dup_tokens
              FROM spans GROUP BY doc_id
            ),
            tok AS (
              SELECT w.doc_id, u.p, w.toks[u.p] AS t
              FROM w, UNNEST(range(1, len(w.toks) + 1)) AS u(p)
            ),
            -- spans are disjoint per doc, so this LEFT JOIN never fans out;
            -- cleaned length = kept-token chars + (n_kept - 1) join spaces
            kept AS (
              SELECT tok.doc_id,
                     coalesce(sum(CASE WHEN sp.doc_id IS NULL THEN len(tok.t) END), 0)
                       + greatest(count(CASE WHEN sp.doc_id IS NULL THEN 1 END) - 1, 0)
                       AS cleaned_len
              FROM tok LEFT JOIN spans sp
                ON sp.doc_id = tok.doc_id AND tok.p BETWEEN sp.s AND sp.e
              GROUP BY tok.doc_id
            ),
            lnn AS (
              SELECT doc_id, u.p, ls[u.p] AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                    FROM documents) q,
                   UNNEST(range(1, len(ls) + 1)) AS u(p)
            ),
            ldup AS (SELECT line FROM lnn GROUP BY line HAVING count(*) >= 2),
            lkept AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY p) AS lct,
                     count(*) AS nk
              FROM lnn WHERE line NOT IN (SELECT line FROM ldup)
              GROUP BY doc_id
            ),
            hreg AS (
              SELECT source, h % {hm} AS bucket,
                     MAX({hrmax} - ({hll_bitlen})) AS register
              FROM (
                SELECT source, h, h >> {_HLL_P} AS w
                FROM (SELECT source,
                             CAST(('0x' || substring(md5('hll:' || text), 1, 15))
                               AS BIGINT) AS h
                      FROM documents WHERE text IS NOT NULL)
              )
              GROUP BY source, h % {hm}
            ),
            hest AS (
              SELECT source,
                     CAST(sum(CAST(1 AS BIGINT) << ({hrmax} - register))
                          + ({hm} - count(*)) * (CAST(1 AS BIGINT) << {hrmax})
                          AS BIGINT) AS total,
                     {hm} - count(*) AS v
              FROM hreg GROUP BY source
            ),
            hfin AS (
              SELECT source,
                     round(CASE WHEN {hll_num} / CAST(total AS DOUBLE)
                                       <= {hll_small} AND v > 0
                                THEN {hll_lc_m} * ln({hll_lc_m} / v)
                                ELSE {hll_num} / CAST(total AS DOUBLE) END,
                           4) AS hll_est
              FROM hest
            ),
            per_doc AS (
              SELECT w.source, w.text,
                     coalesce(ds.n_dup_spans, 0) AS n_dup_spans,
                     coalesce(ds.dup_tokens, 0) AS dup_tokens,
                     k.cleaned_len,
                     len(string_split(w.text, chr(10))) - coalesce(lk.nk, 0) AS rl,
                     len(coalesce(lk.lct, '')) AS lc
              FROM w
              LEFT JOIN doc_spans ds USING (doc_id)
              -- LEFT: a NULL-text doc has no tok rows at all; it must
              -- still be counted in n_docs (Spark's groupBy counts it)
              LEFT JOIN kept k USING (doc_id)
              LEFT JOIN lkept lk USING (doc_id)
            )
            SELECT source,
                   count(*) AS n_docs,
                   count(DISTINCT md5(text)) AS n_distinct,
                   count(*) - count(DISTINCT md5(text)) AS n_dupes,
                   CAST(sum(n_dup_spans) AS BIGINT) AS dup_spans,
                   CAST(sum(dup_tokens) AS BIGINT) AS dup_span_tokens,
                   CAST(sum(CASE WHEN n_dup_spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS docs_with_dup_spans,
                   CAST(sum(cleaned_len) AS BIGINT) AS cleaned_chars,
                   CAST(sum(rl) AS BIGINT) AS removed_lines,
                   CAST(sum(lc) AS BIGINT) AS line_cleaned_chars,
                   coalesce(any_value(hfin.hll_est), 0.0) AS hll_est
            FROM per_doc LEFT JOIN hfin USING (source)
            GROUP BY source
        """,
        "minhash_signature": f"""
            WITH b AS (
                SELECT doc_id, source, text, {mh},
                       len(string_split(lower(text), ' ')) AS n_tokens,
                       CAST(('0x' || substring(md5('split:'  || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS pb,
                       CAST(('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS sb,
                       CAST(('0x' || substring(md5('strat:'  || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS tb,
                       CAST(('0x' || substring(md5('pack:'   || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS ph,
                       CAST(('0x' || substring(md5('mix:' || coalesce(source, '') || ':' || coalesce(CAST(doc_id AS VARCHAR), '')), 1, 15)) AS BIGINT) % 1000000 AS mb
                FROM documents
            ), b2 AS (
                SELECT *,
                       CASE WHEN pb < 900000 THEN 'train'
                            WHEN pb < 950000 THEN 'val' ELSE 'test' END AS split,
                       CAST(ph % 8 AS INT) AS pack_shard
                FROM b
            ), c AS (
                SELECT *, COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY pack_shard ORDER BY ph, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
                FROM b2
            ), sh AS (
                SELECT doc_id, split, {shingles} AS s FROM b2
            ), tg AS (
                SELECT DISTINCT unnest(s) AS g FROM sh WHERE split = 'test'
            ), fl AS (
                SELECT DISTINCT tr.doc_id
                FROM (SELECT doc_id, unnest(s) AS g FROM sh WHERE split <> 'test') tr
                JOIN tg USING (g)
            ), dw AS (
                SELECT doc_id,
                       list_filter(string_split(lower(text), ' '), x -> x != '') AS fw
                FROM documents
            ), dfeat AS (
                -- DSIR hashed features: unigrams + bigrams -> 10k buckets
                SELECT doc_id,
                       CAST(('0x' || substring(md5('dsir:' || f), 1, 15)) AS BIGINT)
                           % 10000 AS bk
                FROM (
                    SELECT doc_id, unnest(fw) AS f FROM dw
                    UNION ALL
                    SELECT doc_id, fw[i] || ' ' || fw[i+1] AS f
                    FROM (SELECT doc_id, fw,
                                 unnest(generate_series(1, len(fw) - 1)) AS i
                          FROM dw WHERE len(fw) >= 2)
                )
            ), dtc AS (
                SELECT bk, COUNT(*) AS ct FROM dfeat WHERE doc_id % 10 = 0 GROUP BY bk
            ), drc AS (
                SELECT bk, COUNT(*) AS cr FROM dfeat GROUP BY bk
            ), dtt AS (SELECT SUM(ct) AS tt FROM dtc
            ), drt AS (SELECT SUM(cr) AS rt FROM drc
            ), dsir AS (
                -- add-alpha (0.01, double) target-vs-raw log-likelihood ratio
                SELECT dfeat.doc_id,
                       round(SUM(
                           ln((COALESCE(dtc.ct, 0) + CAST(0.01 AS DOUBLE))
                              / (dtt.tt + CAST(0.01 AS DOUBLE) * 10000))
                         - ln((COALESCE(drc.cr, 0) + CAST(0.01 AS DOUBLE))
                              / (drt.rt + CAST(0.01 AS DOUBLE) * 10000))), 4)
                           AS dsir_logweight
                FROM dfeat LEFT JOIN dtc USING (bk) LEFT JOIN drc USING (bk)
                     CROSS JOIN dtt CROSS JOIN drt
                GROUP BY dfeat.doc_id
            )
            SELECT c.doc_id, mh0, mh1, mh2, mh3, split,
                   sb < 100000 AS in_sample_10pct,
                   CAST(row_number() OVER (PARTITION BY source ORDER BY tb, c.doc_id) AS INT) AS stratum_rank,
                   pack_shard,
                   CAST(FLOOR(cum / 256) AS INT) AS pack_bin,
                   CAST(row_number() OVER (
                       PARTITION BY pack_shard, CAST(FLOOR(cum / 256) AS INT)
                       ORDER BY ph, c.doc_id) AS INT) AS pack_pos,
                   c.doc_id IN (SELECT doc_id FROM fl) AS contaminated,
                   mb < (CASE source WHEN 'src0' THEN 900000
                                     WHEN 'src1' THEN 500000
                                     WHEN 'src2' THEN 100000
                                     ELSE 300000 END) AS mixture_kept,
                   CAST((CASE source WHEN 'src0' THEN 2
                                     WHEN 'src1' THEN 1
                                     ELSE 0 END)
                        + CASE WHEN mb < (CASE source WHEN 'src0' THEN 500000
                                                      WHEN 'src1' THEN 0
                                                      WHEN 'src2' THEN 250000
                                                      ELSE 500000 END)
                               THEN 1 ELSE 0 END AS INT) AS n_epochs,
                   COALESCE(dsir.dsir_logweight, 0.0) AS dsir_logweight
            FROM c LEFT JOIN dsir ON c.doc_id = dsir.doc_id
        """,
        "embedding_nn": """
            WITH nn AS (
                SELECT vec_id, nn_id, round(cos, 2) AS cos_sim FROM (
                    SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
                           list_cosine_similarity(a.embedding, b.embedding) AS cos,
                           row_number() OVER (PARTITION BY a.vec_id
                                              ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                                                       b.vec_id) AS rk
                    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
                ) WHERE rk = 1
            )
            SELECT m.method, nn.vec_id, nn.nn_id, nn.cos_sim
            FROM nn, (SELECT 'bf' AS method UNION ALL SELECT 'ivf') m
        """,
    }
