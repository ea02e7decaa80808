#!/usr/bin/env python
"""Local mirror of the driver correctness gate for selected queries() rows.

Runs the Spark query AND its DuckDB oracle_sql() at a given sf dir, sorts
columns by name and rows by all columns (the driver's compare), and reports
row-count / schema / exact-value equality per query. Use before committing a
change to an already-green driver row.

    python scripts/check_driver_rows.py text_analysis minhash_signature
    python scripts/check_driver_rows.py --sf /root/testdata/sf0.01 all
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entry

    from daily_journal_dataflow_qc_spark.session import get_spark

    qs, oracles = entry.queries(), entry.oracle_sql()
    keys = list(qs) if args.queries == ["all"] else args.queries
    spark = get_spark(app_name="check-driver-rows")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for k in keys:
        if k not in oracles:
            print(f"{k}: NO ORACLE (rows-only driver check), skipping")
            continue
        got = normalize(qs[k](spark, args.sf).toPandas())
        exp = normalize(con.execute(oracles[k]).fetch_df())
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        detail = ""
        if ok_rows and ok_cols:
            ok_vals = True
            for c in got.columns:
                g, e = got[c], exp[c]
                if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                    eq = np.isclose(
                        g.astype(float), e.astype(float), rtol=0, atol=0, equal_nan=True
                    )
                else:
                    eq = (g.astype(str) == e.astype(str)) | (g.isna() & e.isna())
                if not eq.all():
                    ok_vals = False
                    i = int(np.argmin(eq.to_numpy() if hasattr(eq, "to_numpy") else eq))
                    detail += (
                        f"\n    col {c}: first mismatch row {i}: "
                        f"spark={g.iloc[i]!r} oracle={e.iloc[i]!r} "
                        f"({int((~eq).sum())} cells differ)"
                    )
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{k}: {status} rows={len(got)}/{len(exp)} "
            f"cols_match={ok_cols} vals_match={ok_vals}{detail}"
        )
        if not ok_cols:
            print(f"    spark cols: {list(got.columns)}")
            print(f"    oracle cols: {list(exp.columns)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
