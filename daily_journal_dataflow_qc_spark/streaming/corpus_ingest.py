"""Streaming corpus ingestion — the training-data front door as a
Structured Streaming job: documents land continuously (crawl output, log
drain), and each micro-batch is quality-gated, repetition-gated, and
content-deduped before it ever reaches the batch corpus-prep chain
(``operators/corpus.prepare_corpus`` then runs dedup-cluster resolution /
decontamination / packing over the admitted store on its own cadence —
those stages need corpus-global state and stay batch by design).

Streaming-safe by construction: the quality/repetition gate is the same
pure projection the batch tier uses (``with_text_analysis`` — no window,
no corpus statistic), and dedup is ``dropDuplicatesWithinWatermark`` on
the content hash, so state holds one hash per distinct doc inside the
lateness horizon, not the corpus.

Dedup semantics (documented divergence from batch): streaming keeps the
FIRST ARRIVAL of each content hash within the watermark horizon; the
batch tier's ``exact_dedup`` keeps the MIN-ID copy. The two agree when
arrival order follows id order (the parity test constructs exactly that),
and a re-delivery later than the watermark re-admits the content — the
same bounded-horizon contract as the QC tier's pending sink.

100-TB shape: gate before state (rejected docs never enter the dedup
store), hash-only state keys, RocksDB + changelog checkpointing via the
shared STREAM_CONF, exactly-once via the parquet FileStreamSink commit
log.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.textanalysis import with_text_analysis
from ..sources.table_format import read_table
from .job import _apply_stream_conf

DOC_STREAM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
        StructField("ts", TimestampType()),
    ]
)

#: columns the admitted store keeps. The analysis columns ride along for
#: audit/monitoring of the gate's decisions; NB the batch chain
#: (prepare_corpus) recomputes them from text — it takes raw corpora too
_OUT_COLS = [
    "doc_id",
    "text",
    "source",
    "ts",
    "quality_score",
    "top_2gram_frac",
    "lang_pred",
    "n_tokens",
]


def start_corpus_ingest_stream(
    spark: SparkSession,
    input_loc: str,
    output_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.66,
    max_top_2gram: float = 0.5,
    dedup_watermark: str = "1 hour",
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the ingest stream: parquet-dir or catalog-table source ->
    quality/repetition gate -> first-arrival content dedup -> exactly-once
    parquet append of the admitted docs. ``max_files_per_trigger`` caps the
    micro-batch size (file sources only) — production backpressure knob and
    the kill/resume test's lever for multi-batch replay."""
    _apply_stream_conf(spark)
    options = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger
        else None
    )
    docs = read_table(
        spark, input_loc, DOC_STREAM_SCHEMA, streaming=True, options=options
    )
    scored = with_text_analysis(docs)
    admitted = (
        scored.filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("top_2gram_frac") <= max_top_2gram)
        )
        .withColumn("n_tokens", F.col("ws_tokens"))
        .withColumn("content_hash", F.md5(F.col("text")))
        .withWatermark("ts", dedup_watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .select(*_OUT_COLS)
    )
    writer = (
        admitted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
