"""Deterministic sampling/splitting: partition-independence (the property
df.sample lacks), group-leakage safety, exact stratified counts, and DuckDB
hash-arithmetic parity (the same arithmetic the driver row mirrors)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from daily_journal_dataflow_qc_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
)

N = 4000


def _docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 40).alias("group_id"),
        F.concat(F.lit("s"), (F.col("id") % 5)).alias("source"),
    )


def test_hash_sample_partition_independent(spark):
    d = _docs(spark)
    a = set(hash_sample(d.repartition(3), 0.1, "doc_id").toPandas().doc_id)
    b = set(hash_sample(d.repartition(17), 0.1, "doc_id").toPandas().doc_id)
    assert a == b, "hash sample must not depend on partition layout"
    assert 0.07 < len(a) / N < 0.13
    # df.sample, by contrast, is layout-seeded — the motivating defect
    with pytest.raises(ValueError, match="rate"):
        hash_sample(d, 1.5, "doc_id")


def test_hash_split_group_leakage_safe(spark):
    out = hash_split(_docs(spark), "group_id").toPandas()
    per_group = out.groupby("group_id")["split"].nunique()
    assert (per_group == 1).all(), "a group must land wholly in one split"
    frac = out["split"].value_counts(normalize=True)
    # 40 groups only — coarse proportions; row-keyed split is tighter below
    assert frac.get("train", 0) > 0.6
    by_row = hash_split(_docs(spark), "doc_id").toPandas()["split"].value_counts(
        normalize=True
    )
    assert abs(by_row["train"] - 0.9) < 0.03
    assert abs(by_row.get("val", 0) - 0.05) < 0.02
    with pytest.raises(ValueError, match="weights"):
        hash_split(_docs(spark), "doc_id", weights={"a": -1.0, "b": 2.0})


def test_stratified_sample_exact_counts(spark):
    d = _docs(spark)
    got = stratified_sample(d, "source", 7, "doc_id").toPandas()
    assert got.groupby("source").size().tolist() == [7] * 5
    again = stratified_sample(d, "source", 7, "doc_id").toPandas()
    assert set(got.doc_id) == set(again.doc_id), "draw must be deterministic"
    # rank mode annotates every row; cutting at n reproduces the filter mode
    ranked = stratified_sample(d, "source", 0, "doc_id", rank_col="rk").toPandas()
    assert len(ranked) == N
    assert set(ranked[ranked.rk <= 7].doc_id) == set(got.doc_id)
    # a stratum smaller than n returns whole
    tiny = stratified_sample(d.filter("doc_id < 3"), "source", 7, "doc_id").count()
    assert tiny == 3


def test_sampling_matches_duckdb_arithmetic(spark):
    """The exact portable-hash bucket arithmetic reproduces in DuckDB —
    the property the merged minhash_signature driver row depends on."""
    d = _docs(spark)
    got = (
        hash_split(hash_sample(d, 0.25, "doc_id"), "doc_id")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.execute(
        """
        WITH d AS (SELECT range AS doc_id FROM range(4000)),
        b AS (
            SELECT doc_id,
                   CAST(('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS sb,
                   CAST(('0x' || substring(md5('split:'  || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS pb
            FROM d
        )
        SELECT doc_id,
               CASE WHEN pb < 900000 THEN 'train'
                    WHEN pb < 950000 THEN 'val' ELSE 'test' END AS split
        FROM b WHERE sb < 250000 ORDER BY doc_id
        """
    ).df()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.split.tolist() == want.split.tolist()
