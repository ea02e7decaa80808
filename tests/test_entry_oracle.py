"""Local mirror of the driver's DuckDB-oracle correctness gate: every
queries() entry must match its oracle_sql() on row count, column names, and
order-insensitive values at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype(str)
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None and not pd.isna(v) else None)
        else:
            out[c] = s
    n = pd.DataFrame(out)
    return n.sort_values(list(n.columns), kind="mergesort").reset_index(drop=True)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        # non-SQL-expressible op -> rows-only check (driver does the same)
        assert len(got) > 0, f"{name}: rows-only query returned no rows"
        return
    want = duck.execute(oracles[name]).df()
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            ga = pd.to_numeric(gv, errors="coerce").to_numpy(float)
            wa = pd.to_numeric(wv, errors="coerce").to_numpy(float)
            ok = np.isclose(ga, wa, rtol=0, atol=1e-6) | (np.isnan(ga) & np.isnan(wa))
        else:
            ok = (gv == wv) | (gv.isna() & wv.isna())
            ok = np.asarray(ok, dtype=bool)
        assert ok.all(), (
            f"{name}: column {c} mismatch, first: got={gv[~ok].iloc[0]!r} want={wv[~ok].iloc[0]!r}"
        )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert len(df.columns) >= 5
