"""TPC-H Q9/Q11/Q16 shapes, adapted to the fixture schema.

The fixtures carry no ``partsupp`` table (and no supplycost /
availqty / comment columns), so the classic forms are re-expressed on
the available star schema with the SAME decorrelation/plan shapes:
Q9's multi-dimension profit rollup over a 5-table join, Q11's
scalar-subquery share threshold over a grouped aggregate, and Q16's
count-distinct with a NOT-IN supplier exclusion.  Each docstring notes
the adaptation so the parity claim stays honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import dsum, sql_dsum, table
from s3spark.registry import register


@register(
    "q9_product_type_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year).

    Adaptation: no partsupp in the fixtures, so profit is
    revenue-only (l_extendedprice*(1-l_discount)) without the
    ps_supplycost*l_quantity term; the name filter keys on
    p_name LIKE '%widget%'.

    Plan shape is the point: one pass over the fact, all three dims
    (filtered part, supplier, nation) broadcast, and ONE fact-fact
    shuffle (lineitem⋈orders on orderkey) feeding the two-key rollup.
    At 100 TB the dims still broadcast and the rollup reuses the
    orderkey exchange."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_share",
    oracle=f"""
WITH pv AS (
  SELECT l_partkey AS p_partkey,
         {sql_dsum('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT p_partkey, part_value
FROM pv
WHERE part_value > (
  SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} * 0.001
  FROM lineitem
)
ORDER BY part_value DESC, p_partkey
""",
)
def q11_important_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose aggregate value
    exceeds a fraction of the corpus-wide total — a grouped aggregate
    probed by a scalar subquery over the SAME aggregate.

    Adaptation: value is lineitem revenue per partkey (no
    partsupp.availqty*supplycost in the fixtures); threshold fraction
    0.001 as in the spec's sf-scaled form.

    The per-part aggregate computes once; the global total reuses the
    decimal partial sums (one extra reduce, no second fact scan
    thanks to the cached frame), and the scalar joins back as a
    broadcast — no shuffle added by the threshold."""
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pv = (
        li.groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(dsum(rev).alias("part_value"))
        .cache()
    )
    total = pv.agg(
        F.sum(F.col("part_value").cast("decimal(25,6)")).cast("double").alias("t")
    ).select((F.col("t") * 0.001).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("p_partkey", "part_value")
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (5, 11, 28, 37)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_type
""",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers serve each surviving (brand, type) after excluding a
    brand, restricting sizes, and dropping blacklisted suppliers.

    Adaptation: supplier links come from lineitem (no partsupp); the
    'complaints' exclusion subquery keys on s_acctbal < 0 (no
    s_comment column).

    NOT IN becomes a broadcast LEFT ANTI join (s_suppkey is non-null
    so NOT IN ≡ anti-join here — the null trap is documented where it
    bites, join_anti); part is filtered THEN broadcast; the only
    shuffle is the distinct-aggregate on (brand, type, suppkey)."""
    li = table(spark, sf_dir, "lineitem")
    p = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 11, 28, 37))
        .select("p_partkey", "p_brand", "p_type")
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )
