"""Window-function operators (SURVEY.md §2.3-E).

Window specs always carry a deterministic tie-break key (FIXTURES.md
harness note) so the row set is stable under any partitioning.  At
scale each window is one shuffle on its partition key; frames evaluate
streaming within the sorted partition (no materialization of the whole
partition for running/rank frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "window_ranking",
    oracle="""
SELECT
  c_custkey,
  c_mktsegment,
  c_acctbal,
  ROW_NUMBER()  OVER w AS rn,
  RANK()        OVER w AS rnk,
  DENSE_RANK()  OVER w AS drnk,
  NTILE(4)      OVER w AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per market segment."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "window_analytic",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  o_orderdate,
  LAG(o_totalprice)  OVER w AS prev_price,
  LEAD(o_totalprice) OVER w AS next_price,
  FIRST_VALUE(o_totalprice) OVER w AS first_price,
  LAST_VALUE(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first / last per customer order history.
    last_value needs the full-partition frame explicitly (both engines
    default LAST_VALUE's frame to ...AND CURRENT ROW)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@register(
    "window_running",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_spend,
  COUNT(*) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS running_orders
FROM orders
""",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate with an explicit ROWS frame (decimal-routed
    sum so every prefix is order-exact)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT
  user_id,
  event_id,
  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
  COUNT(*) OVER (
    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
  ) AS events_7d
FROM events
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch seconds: trailing-7-day event count per
    user — the sliding-window-per-row shape used for rate features."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-604800, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ts_sec"),
        F.count(F.lit(1)).over(w).alias("events_7d"),
    )
