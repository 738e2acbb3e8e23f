"""Oracle-differential comparison mirroring the driver's check:
row-count + schema + order-insensitive value-hash (floats rounded to
6 dp, per FIXTURES.md).

Cells are canonicalized to STRINGS before comparison, so type-level
divergence (e.g. Spark floor→BIGINT vs DuckDB floor→DOUBLE) fails here
the same way it would fail a stringify-then-hash driver check — a
plain ``5 == 5.0`` Python comparison would mask it.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if pd.isna(v):
        return None
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return None
        return repr(round(f, 6))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        v = v.tz_localize(None) if v.tzinfo else v
        return str(v)
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    """Sorted multiset of canonicalized rows (columns sorted by name)."""
    df = df[sorted(df.columns)]
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple("" if x is None else str(x) for x in r))


def assert_same(spark_df, duck_con, oracle_sql: str, name: str = "query"):
    """Assert a Spark DataFrame and a DuckDB oracle produce the same
    multiset of rows (column names must match; order-insensitive)."""
    gpdf = spark_df.toPandas()
    epdf = duck_con.execute(oracle_sql).fetchdf()
    assert sorted(gpdf.columns) == sorted(epdf.columns), (
        f"{name}: column mismatch spark={sorted(gpdf.columns)} "
        f"duck={sorted(epdf.columns)}"
    )
    assert len(gpdf) == len(epdf), (
        f"{name}: row count spark={len(gpdf)} duck={len(epdf)}"
    )
    got, exp = normalize(gpdf), normalize(epdf)
    for i, (g, x) in enumerate(zip(got, exp)):
        assert g == x, (
            f"{name}: row mismatch at sorted-index {i} "
            f"(cols {sorted(gpdf.columns)}):\n  spark={g}\n  duck ={x}"
        )
