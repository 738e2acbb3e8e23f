"""Second scalar/window coverage wave: conditional functions, bitwise
ops, distribution window functions, cross-engine hashing, JSON
serialization, and edit-distance text similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "scalar_conditional",
    oracle="""
SELECT
  c_custkey,
  coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'REPLACED') AS seg_filled,
  greatest(c_acctbal, 0.0) AS bal_floor,
  least(c_acctbal, 1000.0) AS bal_cap,
  CASE WHEN c_acctbal IS NULL THEN -1.0 ELSE c_acctbal END AS bal_nvl,
  (c_acctbal > 0) AND (c_nationkey < 10) AS flag_and,
  (c_acctbal < 0) OR (c_nationkey = 0) AS flag_or
FROM customer
ORDER BY c_custkey
""",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: coalesce/nullif/greatest/least/nvl
    plus boolean projections (three-valued logic surfaces as real
    columns)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("REPLACED")
        ).alias("seg_filled"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap"),
        F.when(F.col("c_acctbal").isNull(), -1.0)
        .otherwise(F.col("c_acctbal"))
        .alias("bal_nvl"),
        ((F.col("c_acctbal") > 0) & (F.col("c_nationkey") < 10)).alias("flag_and"),
        ((F.col("c_acctbal") < 0) | (F.col("c_nationkey") == 0)).alias("flag_or"),
    )


@register(
    "scalar_bitwise",
    oracle="""
SELECT
  o_orderkey,
  o_orderkey & 255 AS low_byte,
  o_orderkey | 4096 AS with_flag,
  xor(o_orderkey, 21845) AS xored,
  o_orderkey << 2 AS shifted_l,
  o_orderkey >> 3 AS shifted_r
FROM orders
WHERE o_orderkey < 3000
ORDER BY o_orderkey
""",
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (the substrate of the SimHash/banding operators,
    exposed as first-class scalars)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT
  c_custkey,
  c_mktsegment,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume,
  nth_value(c_acctbal, 3) OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS third_bal
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_custkey
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist /
    nth_value (nth over the full-partition frame, both engines)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("c_acctbal", 3).over(wfull).alias("third_bal"),
    )


@register(
    "scalar_hash_json",
    oracle="""
SELECT
  doc_id,
  sha256(text) AS text_sha256,
  md5(source) AS source_md5,
  to_json(struct_pack(id := doc_id, lang := lang)) AS meta_json
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
""",
)
def scalar_hash_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine content hashing (sha256/md5 — the content-address
    layer of exact dedup at scale) and JSON struct serialization."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.col("source")).alias("source_md5"),
        F.to_json(
            F.struct(F.col("doc_id").alias("id"), F.col("lang").alias("lang"))
        ).alias("meta_json"),
    )


@register(
    "text_edit_distance",
    oracle="""
SELECT
  a.doc_id AS doc_a,
  b.doc_id AS doc_b,
  levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS lev80
FROM documents a
JOIN documents b ON a.doc_id < b.doc_id
WHERE a.doc_id < 40 AND b.doc_id < 40
ORDER BY doc_a, doc_b
""",
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Levenshtein distance on 80-char prefixes over a bounded
    window of documents — the character-level near-dup metric
    (complementing token-level Jaccard/MinHash).  O(pairs × len²), so
    at scale it runs only on candidate pairs from banding — same
    bounding discipline as the other exact verifiers."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.substring("text", 1, 80).alias("ta"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.substring("text", 1, 80).alias("tb"),
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("lev80"),
        )
    )
