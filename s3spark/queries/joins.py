"""Join operators (SURVEY.md §2.3-C).

All equi-joins are declared via the DataFrame API so Catalyst/AQE pick
the physical strategy (broadcast-hash for dims under the threshold,
sort-merge otherwise, runtime skew splitting).  Scale notes per query
in the docstrings — at 100 TB the fact side (lineitem/orders) shuffles
on the join key once, dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import dsum, sql_dsum, table
from s3spark.registry import register


@register(
    "join_inner_equi",
    oracle=f"""
SELECT
  c.c_mktsegment,
  COUNT(*) AS n_orders,
  {sql_dsum('o.o_totalprice')} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c_mktsegment
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders⋈customer + aggregate. customer is tiny
    relative to orders at every SF → AQE picks broadcast-hash, so the
    orders side never shuffles for the join."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_left",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey
FROM customer c
LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON
    clause, so unmatched customers survive with NULL orders)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000), "left"
    ).select("c_custkey", "c_name", "o_orderkey")


@register(
    "join_right",
    oracle="""
SELECT n.n_name, s.s_suppkey, s.s_name
FROM supplier s
RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (nations with no suppliers keep NULL s_*)."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "n_name", "s_suppkey", "s_name"
    )


@register(
    "join_full",
    oracle="""
WITH cn AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     sn AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT cn.c_nationkey, sn.s_nationkey, cn.n_cust, sn.n_supp
FROM cn FULL JOIN sn ON cn.c_nationkey = sn.s_nationkey
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer vs supplier counts."""
    cn = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full").select(
        "c_nationkey", "s_nationkey", "n_cust", "n_supp"
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join ≡ IN subquery: customers with a big order.
    Semi-joins never duplicate the left side — at scale this avoids
    the join-then-distinct anti-pattern."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join ≡ NOT EXISTS: customers with no orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_broadcast",
    oracle=f"""
SELECT n.n_name, COUNT(*) AS n_customers, {sql_dsum('c.c_acctbal')} AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint on the 25-row nation dim: zero shuffle
    of the customer side regardless of SF — the canonical 100 TB dim
    join (same result as inner; the hint only fixes the physical plan)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "join_multiway",
    oracle=f"""
SELECT
  r.r_name,
  n.n_name,
  COUNT(DISTINCT o.o_orderkey) AS n_orders,
  {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY r.r_name, n.n_name
ORDER BY r_name, n_name
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (region→nation→customer→orders→lineitem).

    Only the BOUNDED dims broadcast: region⋈nation is ≤30 rows at any
    scale factor and is explicitly broadcast into customer.  Customer
    is NOT broadcast — |customers| = 150k·SF grows linearly with scale
    (≈15 B rows at the 100 TB design point, far past Spark's 8 GB
    broadcast-relation limit), so the customer⋈orders and
    orders⋈lineitem edges carry explicit MERGE hints: each fact
    sort-merges on its key regardless of stats quality.  The explicit
    hints matter in BOTH directions — compressed columnar stats can
    under-estimate a replicated fact below
    spark.sql.autoBroadcastJoinThreshold and Catalyst then builds a
    multi-million-row hash relation per task (observed 20× wall-clock
    at the 10× scale-stress step), while an unconditional broadcast of
    an unbounded dim is a guaranteed driver OOM at large SF.  The
    conf-pinned plan gate (tests/test_plans.py) asserts no fact and no
    customer row ever lands on a broadcast build side."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    dims = c.join(F.broadcast(rn), c.c_nationkey == F.col("n_nationkey"))
    fact = o.join(dims.hint("merge"), o.o_custkey == F.col("c_custkey"))
    return (
        li.join(fact.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            dsum(revenue).alias("revenue"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "join_theta_range",
    oracle="""
SELECT s.s_suppkey, COUNT(*) AS n_close_customers
FROM supplier s
JOIN customer c
  ON c.c_acctbal BETWEEN s.s_acctbal - 50 AND s.s_acctbal + 50
GROUP BY s.s_suppkey
ORDER BY s_suppkey
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) theta join: customers whose balance is within
    ±50 of each supplier's. Spark executes as broadcast nested-loop;
    the broadcast side must be the BOUNDED one — supplier is 15× smaller
    than customer in TPC-H proportions, so supplier is built/broadcast
    and the large customer side streams (plan-asserted BuildLeft in
    tests/test_plans.py). The true 100 TB path for this predicate is
    the banded equi-join form, ``join_range_bucketed`` (analytics2.py);
    this key is the declared BNLJ baseline for it."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        F.broadcast(s)
        .join(
            c.alias("c"),
            F.col("c_acctbal").between(
                F.col("s_acctbal") - 50, F.col("s_acctbal") + 50
            ),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_close_customers"))
        .orderBy("s_suppkey")
    )


@register(
    "join_asof",
    oracle="""
SELECT e.event_id, e.user_id, e.ts, p.ts AS last_purchase_ts
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts
ORDER BY e.event_id
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every event, the latest purchase at-or-before it
    for the same user (DuckDB ASOF LEFT JOIN semantics, inclusive <=).

    Spark has no native as-of join; the scalable emulation is
    union-then-window: tag reference rows, union with probe rows, and
    take ``last(purchase_ts, ignorenulls)`` over an ordered per-user
    frame.  One shuffle on user_id, no nested loop — O(n log n) vs the
    naive O(n·m) range join, and it survives 100 TB because state per
    key is a single running value.  Reference rows sort before probe
    rows on ties so an event that IS a purchase matches itself.
    """
    e = table(spark, sf_dir, "events")
    probes = e.select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(1).alias("kind"),
    )
    refs = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.col("ts").alias("ref_ts"),
            F.lit(0).alias("kind"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = probes.unionByName(refs).withColumn(
        "last_purchase_ts", F.last("ref_ts", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select("event_id", "user_id", "ts", "last_purchase_ts")
    )
