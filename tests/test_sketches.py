"""HyperLogLog sketch operators (operators/sketches.py): exact register
parity vs a pure-Python mirror, the merge-of-parts == sketch-of-whole
property, estimate accuracy, and edge handling."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from daily_journal_dataflow_qc_spark.functions.hashing import py_hex_hash
from daily_journal_dataflow_qc_spark.operators.sketches import (
    HASH_BITS,
    _alpha,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _py_registers(keys, p, seed="hll"):
    m = 1 << p
    regs: dict[int, int] = {}
    for k in keys:
        h = py_hex_hash(str(k), f"{seed}:")
        b = h % m
        rho = (HASH_BITS - p) - (h >> p).bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_estimate(regs, p):
    m = 1 << p
    rmax = HASH_BITS - p + 1
    num = _alpha(m) * m * m * float(1 << rmax)
    total = sum(1 << (rmax - r) for r in regs.values()) + (m - len(regs)) * (
        1 << rmax
    )
    e = num / total
    v = m - len(regs)
    if e <= 2.5 * m and v > 0:
        return round(m * math.log(m / v), 4)
    return round(e, 4)


def test_hll_registers_match_python_mirror(spark):
    keys = [f"key{i}" for i in range(300)] + ["key0", "key7"]  # dups no-op
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    got = {
        int(r["bucket"]): int(r["register"])
        for r in hll_registers(df, "k", p=6).collect()
    }
    assert got == _py_registers(keys, p=6)
    est = hll_estimate(hll_registers(df, "k", p=6), p=6).collect()[0][0]
    assert est == pytest.approx(_py_estimate(_py_registers(keys, p=6), 6), abs=1e-9)


def test_hll_estimate_accuracy_and_dup_invariance(spark):
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("doc"), F.col("id")).alias("k"))
    est = hll_distinct(df, "k", p=12).collect()[0][0]
    assert abs(est - n) / n < 0.05, est  # std err ~1.04/sqrt(4096) = 1.6%
    # exact duplicates cannot move a max-register sketch
    dup = df.union(df).union(df)
    assert hll_distinct(dup, "k", p=12).collect()[0][0] == est


def test_hll_merge_of_parts_equals_whole(spark):
    df = spark.range(2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"),
        F.concat(F.lit("s"), F.col("id") % 7).alias("source"),
    )
    per_source = hll_registers(df, "k", ["source"], p=8)
    merged = hll_merge(per_source, []).toPandas().set_index("bucket")
    whole = hll_registers(df, "k", p=8).toPandas().set_index("bucket")
    assert merged["register"].to_dict() == whole["register"].to_dict()
    # and the merged estimate equals the whole-corpus estimate exactly
    a = hll_estimate(hll_merge(per_source, []), [], p=8).collect()[0][0]
    b = hll_estimate(hll_registers(df, "k", p=8), [], p=8).collect()[0][0]
    assert a == b


def test_hll_edges(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a", None, "b"], "g": ["x", "x", "x"]})
    )
    regs = hll_registers(df, "k", ["g"], p=4)
    assert regs.count() <= 2  # NULL key ignored
    est = hll_estimate(regs, ["g"], p=4).collect()[0]
    assert est["hll_est"] > 0
    with pytest.raises(ValueError, match="p="):
        hll_registers(df, "k", p=2)
