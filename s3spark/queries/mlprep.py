"""ML-prep operators: per-class embedding centroids, equal-frequency
feature binning, and file-provenance metadata — the feature-
engineering staples between raw corpus and training set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "embedding_centroids",
    oracle="""
WITH flat AS (
  SELECT label, i, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
),
dims AS (
  SELECT label, i, round(AVG(v), 6) AS c
  FROM flat GROUP BY label, i
)
SELECT label,
       list(c ORDER BY i) AS centroid,
       (SELECT COUNT(*) FROM embeddings e2 WHERE e2.label = dims.label)
         AS n_members
FROM dims
GROUP BY label
ORDER BY label
""",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids (one k-means M-step): explode
    vectors to (label, dim, value), average per (label, dim), fold
    back into ordered arrays.

    The explode keeps averaging inside codegen'd built-ins — no
    Python touches the 64-dim math — and the shuffle key (label, dim)
    spreads one class's vectors over dims×partitions instead of
    concentrating per label, exactly the salting effect wide vectors
    need at 100 TB.  Averages round to 6 dp inside the array on both
    engines so cell values are bit-identical before hashing."""
    e = table(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", F.posexplode("embedding").alias("i0", "v")
    ).select("label", (F.col("i0") + 1).alias("i"), F.col("v").cast("double"))
    dims = flat.groupBy("label", "i").agg(F.round(F.avg("v"), 6).alias("c"))
    members = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        dims.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "c"))
            ).getField("c").alias("centroid")
        )
        .join(members, "label")
        .select("label", "centroid", "n_members")
        .orderBy("label")
    )


@register(
    "feature_quantile_bin",
    oracle="""
WITH binned AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT bin,
       COUNT(*) AS n,
       round(MIN(o_totalprice), 6) AS lo,
       round(MAX(o_totalprice), 6) AS hi
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def feature_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning (decile bucketing) of a numeric
    feature: ntile over the global order, then per-bin population and
    boundaries — the discretization step before histogram features or
    monotonic-model inputs.  Tie-broken on the unique key so bin
    membership is deterministic.  The global sort is the honest cost
    of exact ntile; the approx_percentile key is the sketch
    alternative at scale."""
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    binned = o.select("o_totalprice", F.ntile(10).over(w).alias("bin"))
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
        .orderBy("bin")
    )


@register(
    "scan_file_metadata",
    oracle="""
SELECT COUNT(*) AS n_rows, 1 AS n_files
FROM lineitem
""",
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-provenance scan: the hidden ``_metadata`` struct
    (file_path, file_name, file_size, row_index…) every file-based
    scan exposes — the lineage column data-quality pipelines attach to
    every ingested row to trace bad records back to their source
    object.  Zero extra I/O: metadata is constant per split.  The
    fixture stores one file per table, which the distinct-count
    proves."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col("_metadata.file_name")).cast("int").alias(
            "n_files"
        ),
    )
