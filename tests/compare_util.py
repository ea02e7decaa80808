"""DataFrame comparison helpers for the parity suite."""

from __future__ import annotations

import numpy as np
import pandas as pd


def compare_frames(
    got: pd.DataFrame,
    want: pd.DataFrame,
    keys: list[str],
    atol: float = 1e-9,
    rounded_atol_cols: dict[str, float] | None = None,
) -> None:
    """Assert two frames hold the same rows (sorted by keys), column by column."""
    rounded_atol_cols = rounded_atol_cols or {}
    assert set(got.columns) >= set(want.columns), (
        f"missing columns: {set(want.columns) - set(got.columns)}"
    )
    g = got[list(want.columns)].sort_values(keys, kind="mergesort").reset_index(drop=True)
    w = want.sort_values(keys, kind="mergesort").reset_index(drop=True)
    assert len(g) == len(w), f"row count: got {len(g)} want {len(w)}"
    for col in want.columns:
        gv, wv = g[col], w[col]
        if pd.api.types.is_float_dtype(wv) or pd.api.types.is_float_dtype(gv):
            ga = pd.to_numeric(gv, errors="coerce").to_numpy(dtype=float)
            wa = pd.to_numeric(wv, errors="coerce").to_numpy(dtype=float)
            tol = rounded_atol_cols.get(col, atol)
            ok = np.isclose(ga, wa, rtol=0, atol=tol) | (np.isnan(ga) & np.isnan(wa))
            assert ok.all(), _diff_msg(col, g, w, ~ok, keys)
        else:
            ga = gv.astype(object).where(gv.notna(), None)
            wa = wv.astype(object).where(wv.notna(), None)
            ok = (ga == wa) | (ga.isna() & wa.isna())
            ok = np.asarray(ok, dtype=bool)
            assert ok.all(), _diff_msg(col, g, w, ~ok, keys)


def _diff_msg(col, g, w, bad_mask, keys):
    idx = np.where(bad_mask)[0][:5]
    lines = [f"column {col!r} mismatch at {len(np.where(bad_mask)[0])} rows; first diffs:"]
    for i in idx:
        lines.append(
            f"  key={tuple(g.iloc[i][k] for k in keys)} got={g.iloc[i][col]!r} want={w.iloc[i][col]!r}"
        )
    return "\n".join(lines)
