"""Sort / limit / top-k operators (SURVEY.md §2.3-F).

Global top-k compiles to TakeOrderedAndProject (per-partition heaps +
driver merge of k rows) — no global sort materializes, which is what
makes LIMIT k survive 100 TB.  Grouped top-k uses rank-filter, one
shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "sort_multi",
    oracle="""
SELECT
  c_custkey,
  NULLIF(c_mktsegment, 'MACHINERY') AS seg,
  c_acctbal
FROM customer
ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (nulls synthesized
    via NULLIF; Spark default ASC is NULLS FIRST, DuckDB's is NULLS
    LAST — both pinned explicitly)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg"),
        "c_acctbal",
    ).orderBy(
        F.asc_nulls_first("seg"), F.desc("c_acctbal"), F.asc("c_custkey")
    )


@register(
    "limit_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 orders by price (o_orderkey tie-break keeps the
    row set deterministic). Physical plan: TakeOrderedAndProject."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "topk_per_group",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal, rn
FROM (
  SELECT
    c_mktsegment, c_custkey, c_acctbal,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 3
ORDER BY c_mktsegment, rn
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment via rank-filter."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )
