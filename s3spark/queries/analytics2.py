"""Correlated-subquery and disjunctive-predicate analytics (TPC-H Q4/
Q14/Q19/Q22/Q2 shapes adapted to the fixture schema) plus the banded
range join — the decorrelation and join-strategy patterns that decide
whether a planner survives real analyst SQL at scale.

The reference repo has no query surface at all (SURVEY.md §2.2;
/root/reference/amazons3_blueprints/ is file-verb CLIs only), so these
are north-star capability, verified against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import dsum, sql_dsum, table
from s3spark.registry import register


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi correlate
    (l_shipdate > o_orderdate) decorrelated into a left-semi join whose
    condition carries both the key equality and the inequality.

    One shuffle on orderkey (or BHJ when the filtered orders quarter is
    small — AQE decides); the semi join short-circuits per probe row,
    so no lineitem fan-out ever materializes.  Scale note: the date
    filter reaches the orders scan as a pushed predicate, so at 100 TB
    the quarter's partitions are the only ones read."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_share",
    oracle=f"""
SELECT
  round(100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
        / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}, 6) AS promo_share_pct,
  {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")} AS promo_revenue,
  {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join —
    the share of revenue from PROMO-type parts in one quarter.

    The part side broadcasts (dim table), the CASE folds into the
    partial aggregate, and the whole query is one fact-table pass with
    zero fact shuffles: partial aggs produce exactly one row per task.
    The decimal-summed numerator/denominator divide as doubles only at
    the very end (round 6dp), keeping the hash stable."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * dsum(promo_rev) / dsum(rev), 6).alias(
                "promo_share_pct"
            ),
            dsum(promo_rev).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
        )
    )


@register(
    "q19_disjunctive",
    oracle=f"""
SELECT
  {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 40)
""",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicates spanning both join sides.

    Catalyst can't push the full disjunction below the join, but it
    *derives* single-side implications (p_brand IN the three brands;
    l_quantity within the hull [1,40]) and pushes those into each scan,
    shrinking the join inputs before the residual OR evaluates — the
    standard disjunctive-pushdown story, visible in the plan's
    PushedFilters."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(
        dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


@register(
    "q22_dormant_customers",
    oracle=f"""
SELECT
  c.c_nationkey,
  COUNT(*) AS n_custs,
  {sql_dsum('c.c_acctbal')} AS total_bal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + NOT EXISTS
    (anti join) — rich customers who never placed an urgent order.

    The scalar average is a 1-row aggregate broadcast into the filter
    (no recomputation per row); the NOT EXISTS decorrelates to a
    left-anti join against the pre-filtered orders side.  Both
    patterns are exactly what a planner must do at 100 TB: neither the
    subquery nor the anti probe ever re-scans."""
    c = table(spark, sf_dir, "customer")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q2_min_supplier_per_part",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_partkey, s.s_suppkey, s.s_acctbal
FROM part p
JOIN ps ON ps.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE p.p_size > 45
  AND s.s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    WHERE ps2.l_partkey = p.p_partkey
  )
ORDER BY p.p_partkey, s.s_suppkey
""",
)
def q2_min_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar MIN subquery ("the cheapest
    supplier for each part"), decorrelated into a window MIN.

    The naive form re-aggregates per outer row; the scalable rewrite
    computes MIN(s_acctbal) OVER (PARTITION BY partkey) in the same
    pass that carries the rows, then filters equality — one shuffle on
    partkey instead of an O(parts) family of subqueries.  Distinct
    part-supplier pairs come from the fact table itself (fixtures have
    no partsupp), which is the map-side-combine-friendly shape."""
    p = table(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    ps = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_partkey")
    return (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select("p_partkey", "s_suppkey", "s_acctbal")
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "join_range_bucketed",
    oracle="""
SELECT s.s_suppkey, COUNT(*) AS n_close_customers
FROM supplier s
JOIN customer c
  ON c.c_acctbal BETWEEN s.s_acctbal - 50 AND s.s_acctbal + 50
GROUP BY s.s_suppkey
ORDER BY s_suppkey
""",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join: identical semantics to ``join_theta_range``
    (customers within ±50 of each supplier's balance) but executed as
    an EQUI join on a derived band key + residual BETWEEN — the scale
    path for interval joins.

    Each supplier explodes into the ≤3 width-50 bands its window
    overlaps; each customer maps to exactly 1 band, so pairs are
    produced at most once (no dedup needed).  The O(n·m) broadcast
    nested loop of the theta form becomes a shuffled/broadcast HASH
    join on band — linear in matches, partitionable, AQE-skew-safe.
    tests/test_plans.py pins the no-nested-loop plan."""
    band_w = F.lit(50.0)
    s = table(spark, sf_dir, "supplier").withColumn(
        "band",
        F.explode(
            F.sequence(
                F.floor((F.col("s_acctbal") - 50) / band_w),
                F.floor((F.col("s_acctbal") + 50) / band_w),
            )
        ),
    )
    c = table(spark, sf_dir, "customer").withColumn(
        "band", F.floor(F.col("c_acctbal") / band_w)
    )
    return (
        s.join(c, "band")
        .filter(
            F.col("c_acctbal").between(
                F.col("s_acctbal") - 50, F.col("s_acctbal") + 50
            )
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_close_customers"))
        .orderBy("s_suppkey")
    )
