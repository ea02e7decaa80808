"""Greedy sequence packing (operators/packing.py): documented bin semantics
(floor of cumulative tokens before the doc), partition-independence, a
pure-pandas mirror of the whole assignment, and DuckDB window-arithmetic
parity (what the merged minhash_signature driver row depends on)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from daily_journal_dataflow_qc_spark.functions.hashing import py_hex_hash
from daily_journal_dataflow_qc_spark.operators.packing import pack_sequences

N = 3000
MAX_TOK = 512


def _docs(spark, n=N):
    # token counts 1..200, deterministic per id
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(200)) + 1).alias("n_tokens"),
    )


def _pandas_mirror(pdf: pd.DataFrame, max_tokens: int, n_shards: int) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["_h"] = [py_hex_hash(str(i), "pack:") for i in pdf.doc_id]
    pdf["pack_shard"] = pdf._h % n_shards
    pdf = pdf.sort_values(["pack_shard", "_h", "doc_id"]).reset_index(drop=True)
    cum = pdf.groupby("pack_shard")["n_tokens"].cumsum() - pdf["n_tokens"]
    pdf["pack_bin"] = (cum // max_tokens).astype(int)
    pdf["pack_pos"] = pdf.groupby(["pack_shard", "pack_bin"]).cumcount() + 1
    return pdf.drop(columns="_h")


def test_pack_matches_pandas_mirror(spark):
    got = (
        pack_sequences(_docs(spark), MAX_TOK, n_shards=16)
        .orderBy("pack_shard", "pack_bin", "pack_pos")
        .toPandas()
    )
    want = _pandas_mirror(
        _docs(spark).toPandas(), MAX_TOK, 16
    ).sort_values(["pack_shard", "pack_bin", "pack_pos"])
    for c in ["doc_id", "pack_shard", "pack_bin", "pack_pos"]:
        assert got[c].tolist() == want[c].tolist(), c


def test_pack_bin_budget_and_overflow_bound(spark):
    """A doc's bin is floor(tokens before it / max): the tokens BEFORE any
    doc in its own bin are < max, so a bin overflows by at most its last
    (straddling) doc — never by a full extra doc."""
    got = pack_sequences(_docs(spark), MAX_TOK, n_shards=8).toPandas()
    got = got.sort_values(["pack_shard", "pack_bin", "pack_pos"])
    for (_, _), g in got.groupby(["pack_shard", "pack_bin"]):
        before_last = g.n_tokens.iloc[:-1].sum()
        assert before_last < MAX_TOK
        # positions are contiguous from 1
        assert g.pack_pos.tolist() == list(range(1, len(g) + 1))
    # density: if bin b has a successor, the tokens packed through the end
    # of b reach past (b+1)*max — no bin is left short while later bins exist
    for shard, g in got.groupby("pack_shard"):
        bins = g.groupby("pack_bin").n_tokens.sum().sort_index()
        prefix = bins.cumsum()
        for b, through_b in prefix.iloc[:-1].items():
            nxt = bins.index[bins.index.get_loc(b) + 1]
            assert through_b >= nxt * MAX_TOK


def test_pack_partition_independent(spark):
    d = _docs(spark)
    a = pack_sequences(d.repartition(3), MAX_TOK, n_shards=8).orderBy("doc_id").toPandas()
    b = pack_sequences(d.repartition(23), MAX_TOK, n_shards=8).orderBy("doc_id").toPandas()
    assert a.equals(b), "packing must not depend on partition layout"


def test_pack_long_doc_skips_bins(spark):
    """A doc longer than the budget advances the bin counter past several
    bins (it is not split); per shard, bins are non-decreasing in concat
    order and the straddler's successor jumps >= floor(len/max) bins."""
    pdf = pd.DataFrame({"doc_id": list(range(6)), "n_tokens": [100, 5000, 100, 100, 100, 100]})
    got = (
        pack_sequences(spark.createDataFrame(pdf), 512, n_shards=1)
        .orderBy("pack_pos", "pack_bin")
        .toPandas()
        .sort_values(["pack_bin", "pack_pos"])
    )
    assert (got.pack_bin.diff().dropna() >= 0).all()
    long_bin = int(got.loc[got.n_tokens == 5000, "pack_bin"].iloc[0])
    after = got[got.pack_bin > long_bin]
    if len(after):
        assert int(after.pack_bin.min()) >= long_bin + 5000 // 512


def test_pack_rejects_bad_args(spark):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(_docs(spark), 0)
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(_docs(spark), 512, n_shards=0)


def test_pack_matches_duckdb_window_arithmetic(spark):
    got = (
        pack_sequences(_docs(spark, 1000), 256, n_shards=4)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.execute(
        """
        WITH d AS (
            SELECT range AS doc_id, (range * 37 + 11) % 200 + 1 AS n_tokens
            FROM range(1000)
        ), h AS (
            SELECT *,
                CAST(('0x' || substring(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hh
            FROM d
        ), s AS (
            SELECT *, CAST(hh % 4 AS INT) AS pack_shard FROM h
        ), c AS (
            SELECT *, COALESCE(SUM(n_tokens) OVER (
                PARTITION BY pack_shard ORDER BY hh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
            FROM s
        )
        SELECT doc_id, n_tokens, pack_shard,
               CAST(FLOOR(cum / 256) AS INT) AS pack_bin,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY pack_shard, CAST(FLOOR(cum / 256) AS INT)
                   ORDER BY hh, doc_id) AS INT) AS pack_pos
        FROM c ORDER BY doc_id
        """
    ).df()
    for c in ["pack_shard", "pack_bin", "pack_pos"]:
        assert got[c].tolist() == want[c].tolist(), c


# ---- chunk_documents (the dual: split long docs) ----


def test_chunk_documents_known_values(spark):
    from daily_journal_dataflow_qc_spark.operators.packing import chunk_documents

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [" ".join(f"w{i}" for i in range(11)), "Short Doc"],
        }
    )
    got = (
        chunk_documents(spark.createDataFrame(pdf), max_tokens=4, overlap=1)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    d0 = got[got.doc_id == 0]
    # 11 tokens, window 4, step 3 -> ceil(10/3)=4 chunks starting 0,3,6,9
    assert d0.chunk_text.tolist() == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
        "w9 w10",
    ]
    assert d0.chunk_idx.tolist() == [0, 1, 2, 3]
    assert d0.chunk_tokens.tolist() == [4, 4, 4, 2]
    d1 = got[got.doc_id == 1]
    assert d1.chunk_text.tolist() == ["Short Doc"], "case preserved, one chunk"


def test_chunk_documents_reconstruction_property(spark):
    """Dropping each chunk's first `overlap` tokens (except chunk 0) and
    concatenating reproduces the original token stream exactly."""
    from daily_journal_dataflow_qc_spark.operators.packing import chunk_documents

    texts = [
        " ".join(f"t{i}" for i in range(n)) for n in (1, 2, 5, 16, 17, 31, 64, 100)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        chunk_documents(spark.createDataFrame(pdf), max_tokens=16, overlap=4)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    for i, t in enumerate(texts):
        chunks = got[got.doc_id == i].chunk_text.tolist()
        rebuilt = chunks[0].split(" ")
        for c in chunks[1:]:
            rebuilt += c.split(" ")[4:]
        assert rebuilt == t.split(" "), (i, chunks)
        # every chunk obeys the budget
        assert all(len(c.split(" ")) <= 16 for c in chunks)


def test_chunk_documents_rejects_bad_args(spark):
    from daily_journal_dataflow_qc_spark.operators.packing import chunk_documents

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark), max_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark), max_tokens=0)


def test_chunk_documents_matches_duckdb(spark):
    """Chunk boundaries reproduce in DuckDB (engine-agnostic semantics)."""
    from daily_journal_dataflow_qc_spark.operators.packing import chunk_documents

    texts = [" ".join(f"w{j}" for j in range((i * 13) % 57 + 1)) for i in range(40)]
    pdf = pd.DataFrame({"doc_id": range(40), "text": texts})
    got = (
        chunk_documents(spark.createDataFrame(pdf), max_tokens=8, overlap=2)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        """
        WITH b AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM docs
        ), n AS (
            SELECT *, GREATEST(CAST(CEIL((len(w) - 2) / 6.0) AS BIGINT), 1) AS k
            FROM b
        ), c AS (
            SELECT doc_id,
                   CAST(unnest(generate_series(0, k - 1)) AS INT) AS chunk_idx,
                   w, k
            FROM n
        )
        SELECT doc_id, chunk_idx,
               array_to_string(list_slice(w, chunk_idx * 6 + 1, chunk_idx * 6 + 8), ' ') AS chunk_text,
               len(string_split(array_to_string(list_slice(w, chunk_idx * 6 + 1, chunk_idx * 6 + 8), ' '), ' ')) AS chunk_tokens
        FROM c ORDER BY doc_id, chunk_idx
        """
    ).df()
    assert got.chunk_text.tolist() == want.chunk_text.tolist()
    assert got.chunk_tokens.tolist() == want.chunk_tokens.tolist()


def test_chunk_documents_null_text_yields_no_chunks(spark):
    from daily_journal_dataflow_qc_spark.operators.packing import chunk_documents

    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["two words", None]})
    got = chunk_documents(spark.createDataFrame(pdf), max_tokens=4).toPandas()
    assert got.doc_id.tolist() == [0]
    assert got.chunk_tokens.tolist() == [2]
