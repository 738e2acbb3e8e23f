"""Aggregation operators (SURVEY.md §2.3-D).

All of these are new capability vs. the reference (which has no
aggregation anywhere — SURVEY.md §2.2); they are the batch-ETL surface
the north star mandates, built purely on Spark hash aggregation
(partial + final, whole-stage codegen, AQE partition coalescing).

Scale notes (100 TB): groupBy on low-cardinality keys (returnflag,
linestatus) partial-aggregates map-side, so the shuffle carries only
|groups| x |partitions| rows.  Decimal sums keep results bit-identical
across any partitioning (see s3spark.io).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import DEC, davg, dsum, sql_davg, sql_dsum, table
from s3spark.registry import register

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("agg_groupby", oracle=_Q1_ORACLE)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary.

    scan -> filter -> project -> hash-agg -> sort in one pipeline.
    Catalyst pushes the shipdate predicate into the parquet scan and
    prunes to the 7 referenced columns; the aggregation is partial
    map-side so the shuffle is 4 groups wide.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_global",
    oracle=f"""
SELECT
  COUNT(*) AS n_rows,
  {sql_dsum('o_totalprice')} AS sum_price,
  {sql_davg('o_totalprice')} AS avg_price,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price,
  MIN(o_orderdate) AS first_order,
  MAX(o_orderdate) AS last_order
FROM orders
""",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate over orders: one-row result, no shuffle of
    data rows (partial aggregates reduce to a single row per task)."""
    return table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("sum_price"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT
  o_orderpriority,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@register("agg_approx_distinct", oracle=None)  # approximate: rows-only check
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch (mergeable, shuffle-light —
    the 100 TB path where exact distinct would shuffle every key).
    Oracle impossible by construction: HLL++ register contents are
    engine-private (Spark's implementation vs DuckDB's), so the
    estimates differ by design on the same input; rows-only, with
    tests bounding the rsd against the exact count."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
  {sql_dsum('l_quantity')} AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, gid
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup with grouping_id disambiguation.

    Note Spark's grouping_id bit order: with cols (a, b), a is the HIGH
    bit — grouping_id() == GROUPING(a)*2 + GROUPING(b).  DuckDB's
    GROUPING(x) is per-column, so the oracle recomposes the same id with
    matching bit weights (flag=low bit here via explicit arithmetic).
    """
    li = table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).cast("long")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            gid.alias("gid"),
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.asc_nulls_first("l_returnflag"),
            F.asc_nulls_first("l_linestatus"),
            "gid",
        )
    )


@register(
    "agg_cube",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
  {sql_dsum('l_extendedprice')} AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, gid
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions (all 2^2 grouping sets)."""
    li = table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") + 2 * F.grouping("l_linestatus")).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(gid.alias("gid"), dsum("l_extendedprice").alias("sum_price"))
        .orderBy(
            F.asc_nulls_first("l_returnflag"),
            F.asc_nulls_first("l_linestatus"),
            "gid",
        )
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (the DataFrame API has no direct
    groupingSets; spark.sql on a temp view keeps the plan identical)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("s3spark_lineitem_gs")
    return spark.sql(
        f"""
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
        FROM s3spark_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@register(
    "agg_having",
    oracle=f"""
SELECT
  o_custkey,
  COUNT(*) AS n_orders,
  {sql_dsum('o_totalprice')} AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 5 AND {sql_dsum('o_totalprice')} > 100000
ORDER BY o_custkey
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — Catalyst places the filter
    above the final aggregate; no extra shuffle."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
        .filter((F.col("n_orders") >= 5) & (F.col("total_spent") > 100000))
    )
