"""Driver-style comparison: Spark query vs DuckDB oracle.

Mimics the driver's CORRECTNESS check: row count + schema + order-insensitive
value hash. Used by tests/test_oracle_parity.py so the driver gate never
surprises us.
"""

from __future__ import annotations

import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        if pd.api.types.is_float_dtype(out[c]):
            out[c] = out[c].round(9)
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif pd.api.types.is_bool_dtype(out[c]):
            out[c] = out[c].astype("int64")
        else:
            out[c] = out[c].astype("string")
    return out.sort_values(by=list(out.columns), ignore_index=True)


def diff(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    """None if equal, else a short human-readable mismatch description."""
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        return f"columns: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"rowcount: spark={len(a)} duck={len(b)}"
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        i = bad[bad].index[:3]
        return f"values differ on {int(bad.sum())}/{len(a)} rows; e.g.\nspark:\n{a.loc[i]}\nduck:\n{b.loc[i]}"
    return None
