"""TPC-H Q13/Q15/Q17 shapes — the remaining classic decorrelation
patterns the fixture schema supports: outer-join distribution,
argmax-over-aggregate, and correlated-average filtering.

Q12/Q20 complete the 22/22 set, fixture-adapted like Q21: the
fixtures carry no l_shipmode/receiptdate/commitdate and no partsupp
table, so each keeps the reference query's operator shape (the part
TPC-H actually exercises) over the columns that exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import dsum, sql_dsum, table
from s3spark.registry import register


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the two-level aggregate — per-customer order counts
    (LEFT join so zero-order customers count as 0, with a join-side
    filter that must stay in the ON clause, not WHERE), then the
    distribution of those counts.

    First agg shuffles on custkey, second on the tiny count domain;
    the ON-vs-WHERE distinction is the classic outer-join trap the
    oracle pins."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: argmax over an aggregate — the supplier(s) whose
    quarterly revenue equals the maximum.

    The revenue view computes once and is reused for both the probe
    and the MAX scalar (Spark caches it explicitly; at cluster scale
    this is the materialized-CTE decision a planner must make, pinned
    here rather than recomputed).  Decimal-summed revenue makes the
    equality comparison exact — an argmax on raw double sums would be
    partition-order dependent."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
        .cache()
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
SELECT round(CAST({sql_dsum('l.l_extendedprice')} / 7.0 AS DOUBLE), 6)
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated per-part average ("lines below 20% of
    their part's mean quantity") decorrelated into a window AVG over
    partkey in the same pass — no per-row subquery, one shuffle.

    The brand filter applies after the window because the average is
    over ALL lineitems of the part, not just the brand-filtered ones —
    the classic correlation-scope subtlety this oracle pins."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    w = Window.partitionBy("l_partkey")
    with_avg = li.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
    return (
        with_avg.filter(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .agg(
            F.round((dsum(F.col("l_extendedprice")) / 7.0), 6).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q8_market_share",
    oracle=f"""
SELECT o_year,
       round(CAST({sql_dsum("CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END")}
             / {sql_dsum('volume')} AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND p.p_type = 'PROMO'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
)
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of a region's PROMO-part
    revenue per year — the conditional-numerator ratio over an
    8-relation join, the widest join graph in the registry.

    Every dimension leg (part, supplier, customer→nation→region,
    supplier→nation) broadcasts behind its filter; the fact table
    joins without shuffling and the CASE numerator folds into the
    same partial aggregate as the denominator — one pass, one 2-group
    exchange.  Ratio of two decimal-exact sums divides as double at
    the end."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    num = F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round((dsum(num) / dsum(vol)), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
WITH line_flags AS (
  SELECT l.l_orderkey,
         l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS has_late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey
),
order_stats AS (
  SELECT l_orderkey,
         COUNT(*) AS n_supps,
         SUM(has_late) AS n_late_supps
  FROM line_flags
  GROUP BY l_orderkey
)
SELECT f.l_suppkey AS s_suppkey, COUNT(*) AS numwait
FROM line_flags f
JOIN order_stats os ON os.l_orderkey = f.l_orderkey
WHERE f.has_late = 1
  AND os.n_supps > 1
  AND os.n_late_supps = 1
GROUP BY f.l_suppkey
ORDER BY numwait DESC, s_suppkey
""",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness = shipped >90 days after order date,
    the fixture's substitute for receipt/commit dates): suppliers who
    were the ONLY late supplier on a multi-supplier finished order.

    The textbook form is a double-correlated EXISTS + NOT EXISTS back
    into lineitem; the scalable rewrite replaces BOTH subqueries with
    one (orderkey, suppkey) aggregate and one orderkey aggregate —
    membership and lateness counts — turning four fact-table passes
    into one, with every later stage operating on the (much smaller)
    per-order summaries.  Both aggregates share the orderkey shuffle."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
    ).otherwise(0)
    line_flags = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("has_late"))
    )
    order_stats = line_flags.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("has_late").alias("n_late_supps"),
    )
    return (
        line_flags.join(order_stats, "l_orderkey")
        .filter(
            (F.col("has_late") == 1)
            & (F.col("n_supps") > 1)
            & (F.col("n_late_supps") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
    )


@register(
    "q12_shipmode_priority",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (returnflag standing in for the absent
    l_shipmode; lateness = shipped >60 days after order date, the
    fixture's substitute for receipt-after-commit): per ship group,
    how many late lines carried urgent orders vs everything else.

    The defining plan features survive the adaptation: a fact-fact
    equi-join whose lateness predicate correlates BOTH sides (a
    residual join filter, not pushable), a sargable shipdate window
    that DOES push to the lineitem scan, and the two-counter
    conditional aggregate folding into one partial+final agg on a
    3-value group domain.  One orderkey shuffle total at any SF.

    Reference shape: TPC-H Q12 (dbgen query templates, public spec).
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q20_part_promotion",
    oracle="""
WITH concentrated AS (
  SELECT l_suppkey
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt')
  GROUP BY l_partkey, l_suppkey
  HAVING COUNT(*) >= 3
     AND SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate <  TIMESTAMP '1998-01-01'
             THEN l_quantity ELSE 0 END) > 0.5 * SUM(l_quantity)
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (SELECT l_suppkey FROM concentrated)
ORDER BY s.s_name, s.s_suppkey
""",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (the fixtures have no partsupp, so availability
    vs shipped-quantity becomes recency concentration over lineitem's
    own per-(part, supplier) history): suppliers of '%bolt' parts
    whose established (>=3 line) part relationships shipped more than
    half their lifetime quantity inside 1997.

    Q20's defining structure is the doubly nested IN — a semi-join
    whose inner side is itself an aggregate gated by a semi-join —
    and that survives intact: part-name filter broadcasts LEFT SEMI
    into lineitem (fact rows never widen), one (partkey, suppkey)
    aggregate computes the conditional and total sums together,
    and the surviving suppkeys broadcast LEFT SEMI into supplier.
    Quantities are integral doubles, so both engines' sums are exact
    and the HAVING comparison cannot drift.  One fact shuffle total.

    Reference shape: TPC-H Q20 (dbgen query templates, public spec).
    """
    bolt = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem")
    in_97 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    concentrated = (
        li.join(F.broadcast(bolt), li.l_partkey == bolt.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(in_97, F.col("l_quantity")).otherwise(0.0)).alias("q97"),
            F.sum("l_quantity").alias("q_all"),
        )
        .filter((F.col("n_lines") >= 3) & (F.col("q97") > 0.5 * F.col("q_all")))
        .select("l_suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(
            F.broadcast(concentrated),
            s.s_suppkey == concentrated.l_suppkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name", "s_suppkey")
    )
