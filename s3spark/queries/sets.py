"""Set operators (SURVEY.md §2.3-G) — bag and set semantics both.

``exceptAll``/``intersect`` shuffle both sides on the full row; at
scale prefer pre-projecting to the comparison columns (done here) so
the shuffled width is minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


def _cust_nations(spark, sf_dir):
    return table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "set_union_all",
    oracle="""
SELECT nationkey, COUNT(*) AS n
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
GROUP BY nationkey
ORDER BY nationkey
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (unionByName) — duplicates preserved, counted to keep
    the verified result compact."""
    u = _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))
    return (
        u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).orderBy("nationkey")
    )


@register(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = bag union + distinct."""
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .distinct()
        .orderBy("nationkey")
    )


@register(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: nations having both customers and suppliers."""
    return (
        _cust_nations(spark, sf_dir)
        .intersect(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "set_intersect_all",
    oracle="""
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
ORDER BY nationkey
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): each nationkey appears
    min(count_customer, count_supplier) times — the multiplicity-aware
    variant of set_intersect."""
    return (
        _cust_nations(spark, sf_dir)
        .intersectAll(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "set_except_all",
    oracle="""
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey < 200
  EXCEPT ALL
  SELECT s_nationkey AS nationkey FROM supplier
)
ORDER BY nationkey
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): removes one occurrence per match —
    distinct from set semantics (set_except), and the form that
    answers 'how many MORE customers than suppliers per nation'."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )


@register(
    "set_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT): nations with customers but no
    suppliers. ``subtract`` is set semantics — ``exceptAll`` would be
    bag difference (removes one occurrence per match), a different
    operator."""
    return (
        _cust_nations(spark, sf_dir)
        .subtract(_supp_nations(spark, sf_dir))
        .orderBy("nationkey")
    )
