"""Oracle-differential comparison mirroring the driver's check:
row-count + schema + order-insensitive value-hash (floats rounded to
6 dp, per FIXTURES.md).

Driver fidelity (round-4 verdict item 2): the driver canonicalizes
results with ``pandas.DataFrame.sort_values`` over ALL columns on the
RAW frame before hashing, so a list/array-valued cell kills the run
with ``TypeError: unhashable type: 'list'`` (observed in
CORRECTNESS_r04 for embedding_centroids / embedding_quantize_int8).
``normalize`` below reproduces that exact failure mode: it sorts the
raw frame first (no list→tuple pre-canonicalization — that masking is
precisely what made round 4's driver-sim "PASS" unpredictive), and
``_norm_cell`` hard-rejects any nested cell that slips past the sort.

Cells are then canonicalized to STRINGS before comparison, so
type-level divergence (e.g. Spark floor→BIGINT vs DuckDB
floor→DOUBLE) fails here the same way it would fail a
stringify-then-hash driver check — a plain ``5 == 5.0`` Python
comparison would mask it.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _norm_cell(v):
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        # the driver's pandas canonicalizer cannot hash nested cells;
        # never silently canonicalize them (round-4 lesson)
        raise TypeError(
            f"unhashable type: {type(v).__name__!r} — nested output cells "
            "break the driver's pandas sort/hash; flatten the column "
            "(melt to rows or array_join to a canonical string)"
        )
    if v is None:
        return None
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


def driver_sort(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization step, reproduced: columns ordered
    by name, then ``sort_values`` over ALL columns on the raw frame.
    Raises ``TypeError: unhashable type: 'list'`` on list-valued cells
    exactly as the driver's ``_canon`` does."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def normalize(df: pd.DataFrame) -> list[tuple]:
    """Sorted multiset of canonicalized rows (columns sorted by name).

    Two-stage: the raw-frame ``driver_sort`` first (driver-faithful —
    fails on nested cells), then a stable re-sort on the canonicalized
    strings so row comparison is deterministic even when 6-dp rounding
    merges raw-distinct floats."""
    df = driver_sort(df)
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
