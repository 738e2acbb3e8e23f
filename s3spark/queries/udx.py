"""UDF / UDAF / UDTF surface (SURVEY.md §2.3-I).

UDFs are the slow path (SURVEY.md guidance) — these exist to prove the
extension surface, each kept off hot paths and bounded to small inputs.
The pandas variants ride Arrow batches (vectorized, ~10-100× the
row-at-a-time Python UDF); the "UDTF" shape is the built-in
explode/posexplode (generator semantics without Python).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from s3spark.io import table
from s3spark.registry import register


@register(
    "udf_python",
    oracle="""
SELECT
  o_orderkey,
  CASE
    WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%' THEN 'expedite'
    WHEN o_orderpriority LIKE '5%' THEN 'defer'
    ELSE 'standard'
  END AS priority_class
FROM orders
WHERE o_orderkey <= 2000
""",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the correctness baseline for the UDx
    surface; semantically identical to a CASE expression)."""

    @F.udf(returnType=StringType())
    def classify(priority: str) -> str:
        if priority and priority[0] in ("1", "2"):
            return "expedite"
        if priority and priority[0] == "5":
            return "defer"
        return "standard"

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select("o_orderkey", classify("o_orderpriority").alias("priority_class"))


@register(
    "udf_pandas",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) * 1.08 AS taxed_price
FROM lineitem
WHERE l_orderkey <= 1000
""",
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF over Arrow batches: whole-column
    numpy arithmetic, no per-row Python.

    The 1.08 factor keeps results within 6 decimal digits (2dp price ×
    2dp discount × 2dp tax), so no in-kernel rounding is needed —
    numpy half-even vs DuckDB rounding would disagree at exact
    midpoints otherwise."""

    @F.pandas_udf(DoubleType())
    def taxed(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount) * 1.08

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        taxed("l_extendedprice", "l_discount").alias("taxed_price"),
    )


@register(
    "udaf_pandas",
    oracle="""
SELECT
  c_mktsegment,
  round(quantile_cont(c_acctbal, 0.5), 6) AS median_bal,
  COUNT(*) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate via applyInPandas: median balance per
    segment (pandas linear-interpolation median == DuckDB
    quantile_cont 0.5). Each group becomes one Arrow batch — at scale,
    group count must exceed parallelism and no group may exceed
    executor memory; medians over giant groups would use approx
    percentile instead."""
    c = table(spark, sf_dir, "customer")

    def med(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "median_bal": [round(float(pdf["c_acctbal"].median()), 6)],
                "n": [len(pdf)],
            }
        )

    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(med, schema="c_mktsegment string, median_bal double, n long")
        .orderBy("c_mktsegment")
    )


@register(
    "udtf_explode_like",
    oracle="""
SELECT
  doc_id,
  CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INTEGER) AS pos,
  unnest(string_split(text, ' ')) AS word
FROM documents
WHERE doc_id < 50
""",
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-function shape: posexplode (1 row in → N rows out with
    ordinal), the built-in generator that covers the UNNEST/UDTF
    surface without Python in the loop."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
