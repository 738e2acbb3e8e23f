"""Bucketed-table co-located join (SURVEY.md §4.2 / prompt mandate:
"bucketing for co-located joins").

Both fact tables are written bucketed+sorted on the join key into the
session warehouse; the subsequent join then reads bucket-aligned files
and performs a sort-merge join with NO exchange on either side — the
layout decision that turns the biggest recurring shuffle at 100 TB
into a free join.  tests/test_plans.py asserts the exchange-free plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import dsum, sql_dsum, table
from s3spark.registry import register

_BUCKETS = 8


def _drop_table_and_location(spark: SparkSession, name: str) -> None:
    """Drop a managed table AND its warehouse directory.  A fresh
    session's in-memory catalog doesn't know tables a previous session
    wrote, but the directory persists — saveAsTable then fails with
    LOCATION_ALREADY_EXISTS unless the location is removed too."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    loc = f"{warehouse.rstrip('/')}/{name.lower()}"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(loc)
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(path.toUri(), conf)
    if fs.exists(path):
        fs.delete(path, True)


# Memo of (applicationId, sf_dir) pairs whose bucketed copies are
# already materialized — a plain module-level set, so no session conf
# is ever mutated as a side channel (policy: spark.conf.set only in
# session.py).  Keyed on the stable applicationId, NOT id(spark):
# CPython reuses object addresses after GC, so a fresh session at a
# recycled address could falsely hit an id()-keyed memo and skip
# re-materializing tables its catalog has never seen.
_BUCKETED_DONE: set = set()


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> None:
    """Materialize bucketed copies once per (session, sf_dir)."""
    marker = (spark.sparkContext.applicationId, sf_dir)
    if (
        marker in _BUCKETED_DONE
        and spark.catalog.tableExists("s3spark_orders_bucketed")
        and spark.catalog.tableExists("s3spark_lineitem_bucketed")
    ):
        return
    _drop_table_and_location(spark, "s3spark_orders_bucketed")
    _drop_table_and_location(spark, "s3spark_lineitem_bucketed")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    (
        o.write.bucketBy(_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("s3spark_orders_bucketed")
    )
    (
        li.write.bucketBy(_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("s3spark_lineitem_bucketed")
    )
    _BUCKETED_DONE.add(marker)


@register(
    "join_bucketed_colocated",
    oracle=f"""
SELECT
  o.o_orderpriority,
  COUNT(*) AS n_lines,
  {sql_dsum('l.l_extendedprice')} AS total_price
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o_orderpriority
""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem through bucket-aligned storage: both sides
    pre-bucketed (8 buckets) and pre-sorted on the join key, so the
    sort-merge join runs with zero Exchange and zero Sort — bucket i
    of orders joins bucket i of lineitem directly.  Results are
    identical to the plain join (the oracle computes it from the raw
    tables)."""
    _ensure_bucketed(spark, sf_dir)
    o = spark.table("s3spark_orders_bucketed")
    # the merge hint pins SMJ (a broadcast would also avoid the shuffle
    # at this SF, but the point is the bucket-aligned plan that still
    # works when BOTH sides are fact-scale)
    li = spark.table("s3spark_lineitem_bucketed").hint("merge")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )
