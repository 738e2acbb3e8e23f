"""Oracle-differential test over the whole registry (SURVEY.md §5.2).

Runs every registered query on Spark and, where an oracle exists, the
equivalent SQL on DuckDB over the same parquet files; compares
row-count + column names + order-insensitive values (floats @ 6 dp).
This mirrors the driver's t2 check so a green run here predicts a green
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

import s3spark.queries  # noqa: F401  (registers everything)
from s3spark.registry import REGISTRY

from .helpers import assert_same

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        n = df.count()
        assert n >= 0
    else:
        assert_same(df, duck, q.oracle, name)
