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
    mixture_epochs,
    mixture_sample,
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


EPOCHS = {"s0": 2.5, "s1": 1.0, "s2": 0.25, "s3": 0.0}


def test_mixture_epochs_replication(spark):
    """Multi-epoch mixture: floor(e) guaranteed copies + a deterministic
    Bernoulli extra; e=1.0 is the identity, e=0 drops the source, e<=1
    reduces EXACTLY to mixture_sample's kept set (same hash draw)."""
    d = _docs(spark)
    out = mixture_epochs(d, EPOCHS, default_epochs=0.5).toPandas()
    n = out.groupby(["source", "doc_id"]).size()
    # per-row copy count is floor(e) or floor(e)+1, never anything else
    assert set(n.loc["s0"].unique()) <= {2, 3}
    assert (n.loc["s1"] == 1).all()
    assert set(n.loc["s2"].unique()) == {1}  # survivors of the 0.25 draw
    assert "s3" not in out.source.values
    assert set(n.loc["s4"].unique()) == {1}  # default_epochs=0.5 survivors
    # epoch numbering is dense 0..n-1 per doc
    mx = out.groupby("doc_id")["epoch"].agg(["min", "max", "size"])
    assert (mx["min"] == 0).all()
    assert ((mx["max"] + 1) == mx["size"]).all()
    # per-source totals track e * |source| (800 docs each)
    tot = out.groupby("source").size()
    assert abs(tot["s0"] / 800 - 2.5) < 0.15
    assert tot["s1"] == 800
    assert abs(tot["s2"] / 800 - 0.25) < 0.1
    # partition independence: identical (doc_id, epoch) multiset
    a = mixture_epochs(d.repartition(3), EPOCHS, default_epochs=0.5)
    b = mixture_epochs(d.repartition(17), EPOCHS, default_epochs=0.5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # e <= 1 everywhere == mixture_sample kept set, every epoch 0
    rates = {"s0": 0.3, "s1": 0.8}
    ep = mixture_epochs(d, rates).toPandas()
    ms = mixture_sample(d, rates).toPandas()
    assert (ep.epoch == 0).all()
    assert sorted(ep.doc_id) == sorted(ms.doc_id)
    with pytest.raises(ValueError, match="finite"):
        mixture_epochs(d, {"s0": -1.0})


def test_mixture_epochs_matches_duckdb(spark):
    """The exploded frame reproduces bit-exactly in DuckDB (generate_series
    over the same hash arithmetic) — replication is partition-independent
    by construction, and the n_epochs driver-row column mirrors this."""
    got = (
        mixture_epochs(_docs(spark), EPOCHS, default_epochs=0.5)
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.execute(
        """
        WITH d AS (SELECT range AS doc_id,
                          's' || CAST(range % 5 AS VARCHAR) AS source
                   FROM range(4000)),
        b AS (SELECT doc_id, source,
                     CAST(('0x' || substring(md5('mix:' || source || ':' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000 AS mb
              FROM d),
        c AS (SELECT doc_id, source,
                     (CASE source WHEN 's0' THEN 2 WHEN 's1' THEN 1 ELSE 0 END)
                     + CASE WHEN mb < (CASE source WHEN 's0' THEN 500000
                                                   WHEN 's1' THEN 0
                                                   WHEN 's2' THEN 250000
                                                   WHEN 's3' THEN 0
                                                   ELSE 500000 END)
                            THEN 1 ELSE 0 END AS n
              FROM b)
        SELECT doc_id, source, CAST(unnest(generate_series(0, n - 1)) AS INT) AS epoch
        FROM c WHERE n > 0 ORDER BY doc_id, epoch
        """
    ).df()
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.source.tolist() == want.source.tolist()
    assert got.epoch.tolist() == want.epoch.tolist()


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


def _dsir_mirror(raw_texts, target_texts, n_buckets=64, alpha=0.01):
    """Counter-based mirror of dsir_logweights: {doc_id: logweight}."""
    import math
    from collections import Counter

    from daily_journal_dataflow_qc_spark.functions.hashing import py_hex_hash

    def feats(t):
        w = [x for x in t.lower().split(" ") if x]
        grams = w + [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
        return [py_hex_hash(g, "dsir:") % n_buckets for g in grams]

    tc, rc = Counter(), Counter()
    for t in target_texts.values():
        tc.update(feats(t))
    for t in raw_texts.values():
        rc.update(feats(t))
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for i, t in raw_texts.items():
        fs = feats(t)
        if not fs:
            continue
        lw = sum(
            math.log((tc.get(b, 0) + alpha) / (tt + alpha * n_buckets))
            - math.log((rc.get(b, 0) + alpha) / (rt + alpha * n_buckets))
            for b in fs
        )
        out[i] = round(lw, 4)
    return out


def test_dsir_logweights_matches_python_mirror(spark):
    """Spark DSIR log importance weights == a Counter mirror of the same
    hashed-bigram add-alpha arithmetic; target-like docs outrank raw-like
    ones; zero-feature docs are absent."""
    from daily_journal_dataflow_qc_spark.operators.sampling import dsir_logweights

    target = {100: "formal prose with careful structure", 101: "formal careful writing"}
    raw = {
        0: "formal prose with careful structure",  # = a target doc
        1: "click here buy now cheap pills",  # spam-ish, unlike target
        2: "formal careful prose",
        3: "",  # zero features -> absent
    }
    rdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(raw), "text": list(raw.values())})
    )
    tdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(target), "text": list(target.values())})
    )
    got = (
        dsir_logweights(rdf, tdf, n_buckets=64)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert 3 not in got.index
    exp = _dsir_mirror(raw, target)
    for i, lw in exp.items():
        assert got.loc[i, "dsir_logweight"] == pytest.approx(lw, abs=2e-4)
    assert got.loc[0, "dsir_logweight"] > got.loc[1, "dsir_logweight"]


def test_dsir_select_deterministic_across_partitioning(spark):
    """Gumbel-top-k selection is reproducible under any input partitioning
    (hash-derived noise, not per-partition RNG) and returns exactly n rows
    biased toward the target distribution."""
    from daily_journal_dataflow_qc_spark.operators.sampling import dsir_select

    texts = {}
    for i in range(40):
        texts[i] = (
            "formal prose with careful structure and measured argument"
            if i % 4 == 0
            else f"random noise token{i} click buy now cheap offer {i}"
        )
    rdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    tdf = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [100], "text": ["formal prose with careful measured structure"]}
        )
    )
    a = sorted(r.doc_id for r in dsir_select(rdf, tdf, 8, n_buckets=64).collect())
    b = sorted(
        r.doc_id
        for r in dsir_select(rdf.repartition(7), tdf, 8, n_buckets=64).collect()
    )
    assert a == b
    assert len(a) == 8
    # the target-like quarter (doc_id % 4 == 0) dominates the selection
    assert sum(1 for i in a if i % 4 == 0) >= 6


# ------------------------------------------------------- token-budget selection


def _scored(spark, n=500):
    """Deterministic frame with a many-valued score, heavy score ties, and
    varying token counts — exercises the boundary bucket and tie-breaks."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37 % 97) / 97.0).alias("score"),
        (F.col("id") % 13 + 1).cast("long").alias("n_tokens"),
    )


def _naive_rule(pdf, budget):
    """The specification: global (score DESC, doc_id) order, keep while the
    running token total including the row stays <= budget."""
    pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True])
    return set(pdf.doc_id[pdf.n_tokens.cumsum() <= budget])


def test_select_by_token_budget_matches_global_rule(spark):
    from daily_journal_dataflow_qc_spark.operators.sampling import (
        select_by_token_budget,
    )

    d = _scored(spark)
    pdf = d.toPandas()
    for budget in (0, 1, 700, int(pdf.n_tokens.sum()) // 2, int(pdf.n_tokens.sum())):
        got = select_by_token_budget(d, budget, "score", "n_tokens")
        kept = set(got.filter("budget_kept").toPandas().doc_id)
        assert kept == _naive_rule(pdf, budget), f"budget={budget}"
    # full-budget run keeps everything (the no-boundary-bucket fast path)
    assert len(_naive_rule(pdf, int(pdf.n_tokens.sum()))) == len(pdf)


def test_select_by_token_budget_partition_independent(spark):
    from daily_journal_dataflow_qc_spark.operators.sampling import (
        select_by_token_budget,
    )

    budget = 900
    a = set(
        select_by_token_budget(_scored(spark).repartition(3), budget, "score", "n_tokens")
        .filter("budget_kept")
        .toPandas()
        .doc_id
    )
    b = set(
        select_by_token_budget(_scored(spark).repartition(17), budget, "score", "n_tokens")
        .filter("budget_kept")
        .toPandas()
        .doc_id
    )
    assert a == b


def test_select_by_token_budget_single_bucket_degenerate(spark):
    """All rows share one score -> one bucket holds the whole corpus (the
    documented worst case): still exactly the global rule, tie-broken by
    doc_id."""
    from daily_journal_dataflow_qc_spark.operators.sampling import (
        select_by_token_budget,
    )

    d = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.lit(0.5).alias("score"),
        F.lit(3).cast("long").alias("n_tokens"),
    )
    kept = set(
        select_by_token_budget(d, 10, "score", "n_tokens")
        .filter("budget_kept")
        .toPandas()
        .doc_id
    )
    assert kept == {0, 1, 2}  # 3+3+3 <= 10, the 4th would make 12


def test_select_by_token_budget_null_and_zero_edges(spark):
    from daily_journal_dataflow_qc_spark.operators.sampling import (
        select_by_token_budget,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "score": [0.9, None, 0.8, 0.7],
            "n_tokens": [5, 1, 0, 5],
        }
    )
    out = (
        select_by_token_budget(spark.createDataFrame(pdf), 5, "score", "n_tokens")
        .toPandas()
        .set_index("doc_id")["budget_kept"]
    )
    # null score never kept; zero-token doc rides along while within budget
    assert dict(out) == {0: True, 1: False, 2: True, 3: False}
    # everything-fits fast path still excludes the null score
    out2 = (
        select_by_token_budget(spark.createDataFrame(pdf), 100, "score", "n_tokens")
        .toPandas()
        .set_index("doc_id")["budget_kept"]
    )
    assert dict(out2) == {0: True, 1: False, 2: True, 3: True}


def test_select_by_token_budget_rejects_bad_args(spark):
    from daily_journal_dataflow_qc_spark.operators.sampling import (
        select_by_token_budget,
    )

    d = _scored(spark)
    with pytest.raises(ValueError, match="budget"):
        select_by_token_budget(d, -1, "score", "n_tokens")
    with pytest.raises(ValueError, match="n_buckets"):
        select_by_token_budget(d, 10, "score", "n_tokens", n_buckets=0)
    neg = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit(0.5).alias("score"),
        (F.col("id") - 1).cast("long").alias("n_tokens"),
    )
    with pytest.raises(ValueError, match="negative"):
        select_by_token_budget(neg, 10, "score", "n_tokens")
    # NULL token count on a scored row: contract violation, not a silent
    # path-dependent keep/drop
    nul = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "score": [0.5, 0.6],
                "n_tokens": pd.array([3, None], dtype="Int64"),
            }
        )
    )
    with pytest.raises(ValueError, match="null token"):
        select_by_token_budget(nul, 10, "score", "n_tokens")


def test_dsir_target_filter_equals_target_df(spark):
    """The self-referential ``target_filter`` form (one conditional
    aggregation over the shared (doc, bucket) counts) returns EXACTLY the
    weights of the equivalent ``target_df`` form — and rejects ambiguous
    calls."""
    from daily_journal_dataflow_qc_spark.operators.sampling import dsir_logweights

    texts = {
        i: ("formal prose with careful structure" if i % 3 == 0
            else f"click buy now cheap token{i}")
        for i in range(30)
    }
    rdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    pred = F.pmod(F.col("doc_id"), F.lit(3)) == 0
    a = (
        dsir_logweights(rdf, rdf.filter(pred), n_buckets=64)
        .toPandas().set_index("doc_id").sort_index()
    )
    b = (
        dsir_logweights(rdf, target_filter=pred, n_buckets=64)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert a["dsir_logweight"].tolist() == b["dsir_logweight"].tolist()
    with pytest.raises(ValueError, match="exactly one"):
        dsir_logweights(rdf, rdf, target_filter=pred)
    with pytest.raises(ValueError, match="exactly one"):
        dsir_logweights(rdf)
