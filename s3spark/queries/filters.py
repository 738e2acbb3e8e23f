"""Filter / predicate / projection operators (SURVEY.md §2.3-B).

The reference's only predicates are prefix + regex key matching
(SURVEY.md §2.1 R9/R10); this module generalizes to the full predicate
surface.  All predicates are plain Catalyst expressions, so they push
into the parquet scan (PushedFilters) and stay in whole-stage codegen —
at 100 TB these filters run at scan speed with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "filter_comparison",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity > 45 AND l_extendedprice <= 20000
""",
)
def filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric comparison predicates — pushed to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45) & (F.col("l_extendedprice") <= 20000)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "filter_compound",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus IN ('F', 'P') OR o_totalprice BETWEEN 100000 AND 150000)
  AND NOT o_orderpriority = '5-LOW'
""",
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN composition."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (
            F.col("o_orderstatus").isin("F", "P")
            | F.col("o_totalprice").between(100000, 150000)
        )
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "filter_null",
    oracle="""
SELECT
  c_custkey,
  NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null
FROM customer
WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL
   OR (NULLIF(c_mktsegment, 'BUILDING') IS NOT NULL AND c_acctbal < 0)
""",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL semantics (fixtures are null-free, so nulls are
    synthesized with NULLIF — three-valued logic still exercised)."""
    c = table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey", seg.alias("seg_or_null"), "c_acctbal"
    ).filter(
        F.col("seg_or_null").isNull()
        | (F.col("seg_or_null").isNotNull() & (F.col("c_acctbal") < 0))
    ).select("c_custkey", "seg_or_null")


@register(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_name LIKE '%widget%' OR p_brand LIKE 'Brand#1_'
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LIKE with % and _ wildcards."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%") | F.col("p_brand").like("Brand#1_")
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "project_arith",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  l_extendedprice * (1 - l_discount) AS disc_price,
  l_quantity * 2.5 + 1 AS scaled_qty,
  l_extendedprice / l_quantity AS unit_price,
  CAST(l_quantity AS BIGINT) % 7 AS qty_mod
FROM lineitem
WHERE l_orderkey <= 1000
""",
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression projection (+,-,*,/,%) — per-row IEEE
    double ops, identical across engines without decimal routing."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_quantity") * 2.5 + 1).alias("scaled_qty"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


@register(
    "project_case",
    oracle="""
SELECT
  o_orderkey,
  CASE
    WHEN o_totalprice >= 200000 THEN 'high'
    WHEN o_totalprice >= 100000 THEN 'mid'
    ELSE 'low'
  END AS price_band,
  CASE o_orderstatus WHEN 'F' THEN 1 WHEN 'O' THEN 2 ELSE 0 END AS status_code
FROM orders
""",
)
def project_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE WHEN projection."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", 1)
        .when(F.col("o_orderstatus") == "O", 2)
        .otherwise(0)
        .alias("status_code"),
    )
