"""Mergeable-summary operators: bitmap exact-distinct and HLL sketch
union — the distributed-counting toolbox — plus the two remaining
classic TPC-H shapes (Q6, Q7) the fixture schema supports.

Mergeable partial state is THE 100 TB aggregation story: each
partition builds a small summary, summaries OR/union together
associatively, and no per-key row set ever concentrates on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import dsum, sql_dsum, table
from s3spark.registry import register


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_distinct_orders
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps, two-phase: keys map to
    (bucket, bit position), partitions build per-bucket bitmaps with
    ``bitmap_construct_agg``, bucket bitmaps merge and their popcounts
    sum — identical answer to COUNT(DISTINCT) but with bounded,
    mergeable state per task instead of a per-group hash set of raw
    keys.  This is how exact distinct survives when one group holds
    billions of keys (the bitmap shards across buckets; a hash-set
    COUNT DISTINCT concentrates per group)."""
    li = table(spark, sf_dir, "lineitem")
    per_bucket = (
        li.select(
            "l_returnflag",
            F.bitmap_bucket_number(F.col("l_orderkey")).alias("bucket"),
            F.bitmap_bit_position(F.col("l_orderkey")).alias("pos"),
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    return (
        per_bucket.select(
            "l_returnflag", F.bitmap_count(F.col("bm")).alias("c")
        )
        .groupBy("l_returnflag")
        .agg(F.sum("c").alias("n_distinct_orders"))
        .orderBy("l_returnflag")
    )


@register("agg_hll_partitioned_union", oracle=None)
def agg_hll_partitioned_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch lifecycle (Apache DataSketches, Spark 4 built-ins):
    one sketch per nation over customer keys, then ``hll_union_agg``
    merges the 25 sketches and estimates the global distinct count —
    the pre-aggregated-rollup pattern where per-segment sketches are
    stored once and unioned at query time at any grouping, never
    rescanning raw data.  Oracle impossible by construction: the
    estimate is read out of DataSketches HLL registers, and DuckDB's
    approx_count_distinct uses its own HLL implementation — the two
    sketches cannot agree bit-for-bit on any fixed input.  Rows-only
    key; tests/test_llm.py bounds the estimate within 5% of exact."""
    c = table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg(F.col("c_custkey")).alias("sk")
    )
    return per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias(
            "est_distinct_customers"
        ),
        F.count(F.lit(1)).alias("n_sketches"),
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the query that measures
    raw scan throughput.  Every predicate reaches the parquet reader
    (PushedFilters), only 4 columns are read, no shuffle at all except
    the single-row final agg."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         year(l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year —
    a 6-table join where the nation pair predicate is a disjunction
    across TWO dimension legs.

    Both nation legs broadcast after their selective filters, customer
    and supplier broadcast behind them, so the fact table again joins
    without shuffling; the pair filter applies as soon as both legs
    are bound.  Group-by cardinality is 2 pairs × 2 years."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, F.col("o_orderkey") == li.l_orderkey)
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(vol).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )
