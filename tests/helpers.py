"""Oracle-differential comparison mirroring the driver's check:
row-count + schema + order-insensitive value-hash (floats rounded to
6 dp, per FIXTURES.md)."""

from __future__ import annotations

import math

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None) if v.tzinfo else v
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cells, sort rows — makes two
    result sets comparable independent of row/column order."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_norm_cell)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def assert_same(spark_df, duck_con, oracle_sql: str, name: str = "query"):
    """Assert a Spark DataFrame and a DuckDB oracle produce the same
    multiset of rows (column names must match; order-insensitive)."""
    got = normalize(spark_df.toPandas())
    exp = normalize(duck_con.execute(oracle_sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch spark={list(got.columns)} duck={list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: row count spark={len(got)} duck={len(exp)}"
    for c in got.columns:
        gl, el = got[c].tolist(), exp[c].tolist()
        for i, (g, e) in enumerate(zip(gl, el)):
            gn, en = _norm_cell(g), _norm_cell(e)
            assert gn == en, (
                f"{name}: value mismatch col={c} row={i}: spark={gn!r} duck={en!r}"
            )
