"""End-to-end corpus preparation (operators/corpus.py) on a fixture with
one planted defect per stage, plus the weighted mixture sampler."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from daily_journal_dataflow_qc_spark.operators.corpus import prepare_corpus
from daily_journal_dataflow_qc_spark.operators.sampling import mixture_sample

GOOD = (
    "the quick brown fox jumps over the lazy dog while the sun sets "
    "slowly behind the old wooden bridge near the quiet river bank"
)
NEAR = GOOD.replace("lazy dog", "sleepy dog")
LEAKED = "completely different content about spark shuffles and partition pruning"


def test_prepare_corpus_each_stage_fires(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "text": [
                    GOOD,            # survives everything
                    GOOD,            # exact dup of 0 -> dropped at stage 2
                    NEAR,            # near-dup of 0 -> dropped at stage 3
                    LEAKED,          # shares shingles with test -> stage 4
                    "spam " * 40,    # top_2gram_frac ~1 -> stage-1 repetition gate
                    "ok",            # < 2 words: whole-text gram fallback makes
                                     # top_2gram_frac = 1.0 -> same gate
                                     # (quality_score alone is 0.6667, above 0.66)
                ],
            }
        )
    )
    test_corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": [LEAKED]})
    )
    out = prepare_corpus(docs, test_corpus, near_dup_threshold=0.5).toPandas()
    assert sorted(out.doc_id) == [0]
    row = out.iloc[0]
    assert row.split in ("train", "val", "test")
    assert row.pack_bin == 0 and row.pack_pos == 1
    assert row.n_tokens == len(GOOD.split(" "))
    # without a test corpus the decontamination stage is skipped
    out2 = prepare_corpus(docs, None, near_dup_threshold=0.5).toPandas()
    assert sorted(out2.doc_id) == [0, 3]


def test_prepare_corpus_bins_never_mix_splits(spark):
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document number "),
            F.col("id").cast("string"),
            F.lit(" holds words the filter keeps easily today"),
        ).alias("text"),
    )
    out = prepare_corpus(docs, max_tokens=64, n_shards=4).toPandas()
    assert len(out) == 400, "unique quality docs must all survive"
    per_bin = out.groupby(["split", "pack_shard", "pack_bin"])
    # bin ids are unique per (split, shard): the same (shard, bin) pair may
    # appear under different splits but rows inside one group share a split
    assert (per_bin["split"].nunique() == 1).all()
    # budget semantics hold inside every group
    for _, g in per_bin:
        assert g.n_tokens.iloc[:-1].sum() < 64 or len(g) == 1


def test_mixture_sample_rates_and_determinism(spark):
    n = 6000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3)).alias("source"),
    )
    rates = {"s0": 0.8, "s1": 0.2}  # s2 -> default 0 (dropped)
    got = mixture_sample(d.repartition(7), rates).toPandas()
    again = mixture_sample(d.repartition(31), rates).toPandas()
    assert set(got.doc_id) == set(again.doc_id), "partition-independent"
    frac = got.groupby("source").size() / (n / 3)
    assert abs(frac["s0"] - 0.8) < 0.05
    assert abs(frac["s1"] - 0.2) < 0.05
    assert "s2" not in frac.index
    with pytest.raises(ValueError, match="rates"):
        mixture_sample(d, {"s0": 1.5})
    # NULL source rows take default_rate, never a silent drop
    dn = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "source": [None] * 20})
    )
    assert mixture_sample(dn, {"s0": 0.5}, default_rate=1.0).count() == 20
    assert mixture_sample(dn, {"s0": 0.5}, default_rate=0.0).count() == 0
    # NULL key at rate 1.0 must also never silently drop
    dk = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": pd.array([None] * 5, dtype="Int64"), "source": ["s0"] * 5}
        )
    )
    assert mixture_sample(dk, {"s0": 1.0}).count() == 5


def test_mixture_sample_matches_duckdb_arithmetic(spark):
    d = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2)).alias("source"),
    )
    got = mixture_sample(d, {"s0": 0.5, "s1": 0.1}).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    want = con.execute(
        """
        WITH d AS (
            SELECT range AS doc_id, 's' || CAST(range % 2 AS VARCHAR) AS source
            FROM range(2000)
        )
        SELECT doc_id, source FROM d
        WHERE CAST(('0x' || substring(md5('mix:' || source || ':' ||
                  CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
              < CASE source WHEN 's0' THEN 500000 ELSE 100000 END
        ORDER BY doc_id
        """
    ).df()
    assert got.doc_id.tolist() == want.doc_id.tolist()


def test_streaming_corpus_ingest(spark, tmp_path):
    """Streaming front door: quality/repetition gate + first-arrival content
    dedup, exactly-once across re-runs, and batch-tier agreement (dup rows
    are verbatim re-deliveries, so first-arrival == min-id)."""
    import time

    from daily_journal_dataflow_qc_spark.operators.dedup import exact_dedup
    from daily_journal_dataflow_qc_spark.operators.textanalysis import (
        with_text_analysis,
    )
    from daily_journal_dataflow_qc_spark.streaming.corpus_ingest import (
        start_corpus_ingest_stream,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ts0 = pd.Timestamp("2025-06-01 12:00:00", tz="UTC")

    def mk(rows, name):
        pdf = pd.DataFrame(rows)
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us, UTC]")
        pdf.to_parquet(in_dir / name)

    mk(
        {
            "doc_id": [0, 1, 4],
            "text": [GOOD, LEAKED, "spam " * 40],
            "source": ["s0"] * 3,
            "ts": [ts0] * 3,
        },
        "b0.parquet",
    )
    time.sleep(1.1)  # mtime order = arrival order
    mk(
        {
            "doc_id": [0, 2],  # 0 = verbatim re-delivery (same id/text/ts)
            "text": [GOOD, NEAR],
            "source": ["s0", "s1"],
            "ts": [ts0, ts0 + pd.Timedelta(minutes=5)],
        },
        "b1.parquet",
    )

    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = start_corpus_ingest_stream(
        spark, str(in_dir), out_dir, ck, available_now=True
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir).toPandas()
    assert sorted(got.doc_id) == [0, 1, 2], got
    assert (got.n_tokens > 0).all() and got.quality_score.min() >= 0.66

    # exactly-once: a restart with no new input appends nothing
    q2 = start_corpus_ingest_stream(
        spark, str(in_dir), out_dir, ck, available_now=True
    )
    q2.awaitTermination(180)
    again = spark.read.parquet(out_dir).toPandas()
    assert sorted(again.doc_id) == [0, 1, 2]

    # batch-tier agreement on the same input
    batch = spark.read.parquet(str(in_dir))
    gated = with_text_analysis(batch).filter(
        (F.col("quality_score") >= 0.66) & (F.col("top_2gram_frac") <= 0.5)
    )
    want = sorted(exact_dedup(gated).toPandas().doc_id)
    assert sorted(got.doc_id) == want


def test_prepare_corpus_empty_input(spark):
    """Zero-row corpora flow through every stage without a crash."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    empty = spark.createDataFrame(
        [],
        StructType(
            [StructField("doc_id", LongType()), StructField("text", StringType())]
        ),
    )
    assert prepare_corpus(empty).count() == 0
    assert prepare_corpus(empty, empty).count() == 0
