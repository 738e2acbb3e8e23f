"""Data-quality and composite-ML operators: declarative constraint
checking (the expectations layer every production pipeline runs before
publishing) and kNN majority-vote classification over embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "dq_constraint_checks",
    oracle="""
SELECT 'orders_custkey_referential' AS check_name,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations
UNION ALL
SELECT 'lineitem_quantity_range',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_quantity < 1 OR l_quantity > 50)
UNION ALL
SELECT 'events_event_id_unique',
       (SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) FROM
         (SELECT COUNT(*) AS cnt FROM events GROUP BY event_id HAVING COUNT(*) > 1))
UNION ALL
SELECT 'documents_text_nonempty',
       (SELECT COUNT(*) FROM documents
        WHERE text IS NULL OR length(text) = 0)
ORDER BY check_name
""",
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate: four constraint families in one
    result — referential integrity (orders→customer via anti join),
    numeric range, key uniqueness (excess-count formulation), and
    non-emptiness.  Each check is an independent aggregate; Spark runs
    them as separate lightweight jobs unioned into a 4-row report.

    The anti-join formulation of referential integrity is the one that
    scales: no collected key set, just a broadcast (or shuffled) join
    against the dimension — identical plan family at 100 TB."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    li = table(spark, sf_dir, "lineitem")
    e = table(spark, sf_dir, "events")
    d = table(spark, sf_dir, "documents")

    ref = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.lit("orders_custkey_referential").alias("check_name"),
            "n_violations",
        )
    )
    rng = (
        li.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("lineitem_quantity_range").alias("check_name"), "n_violations")
    )
    uniq = (
        e.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("n_violations")
        )
        .select(F.lit("events_event_id_unique").alias("check_name"), "n_violations")
    )
    nonempty = (
        d.filter(F.col("text").isNull() | (F.length("text") == 0))
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("documents_text_nonempty").alias("check_name"), "n_violations")
    )
    return (
        ref.unionByName(rng).unionByName(uniq).unionByName(nonempty)
        .orderBy("check_name")
    )


@register(
    "sim_knn_classify",
    oracle="""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding AS pe, label AS true_label
  FROM embeddings WHERE vec_id < 20
),
scored AS (
  SELECT p.probe_id, p.true_label, e.label AS cand_label,
         list_cosine_similarity(p.pe, e.embedding) AS sim, e.vec_id
  FROM probes p JOIN embeddings e ON e.vec_id <> p.probe_id
),
topk AS (
  SELECT probe_id, true_label, cand_label, sim, vec_id,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY sim DESC, vec_id) AS rn
  FROM scored
)
SELECT probe_id, true_label,
       CAST(min(pred) AS INTEGER) AS predicted_label
FROM (
  SELECT probe_id, true_label, cand_label AS pred,
         COUNT(*) AS votes,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY COUNT(*) DESC, cand_label) AS vr
  FROM topk WHERE rn <= 7
  GROUP BY probe_id, true_label, cand_label
)
WHERE vr = 1
GROUP BY probe_id, true_label
ORDER BY probe_id
""",
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification by cosine similarity: for each probe vector,
    the majority label among its 7 nearest neighbours (ties broken by
    smaller label) — similarity search composed into a decision, the
    label-propagation / weak-supervision primitive.

    Probe side is a fixed 20-row broadcast against the candidate scan
    (one pass); top-k per probe via window rank, vote via a second
    tiny aggregation.  At scale the candidate scan swaps for the
    IVF/LSH bucketed keys — same vote logic on top."""
    e = table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pe"),
        F.col("label").alias("true_label"),
    )
    cand = e.select("vec_id", "embedding", F.col("label").alias("cand_label"))
    dot = F.aggregate(
        F.zip_with("pe", "embedding", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda col: F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    scored = (
        cand.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .withColumn("sim", dot / (norm(F.col("pe")) * norm(F.col("embedding"))))
    )
    wk = Window.partitionBy("probe_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    topk = scored.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= 7
    )
    votes = topk.groupBy("probe_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("probe_id").orderBy(
        F.desc("votes"), F.asc("cand_label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select(
            "probe_id",
            "true_label",
            F.col("cand_label").cast("int").alias("predicted_label"),
        )
        .orderBy("probe_id")
    )


# --------------------------------------------------------------------------
# dq_profile_summary
# --------------------------------------------------------------------------

_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]


def _profile_col_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS column_name,
       (SELECT COUNT(*) FROM orders WHERE {col} IS NULL) AS n_nulls,
       (SELECT COUNT(DISTINCT {col}) FROM orders) AS n_distinct,
       (SELECT MIN(CAST({col} AS VARCHAR)) FROM orders) AS min_str,
       (SELECT MAX(CAST({col} AS VARCHAR)) FROM orders) AS max_str,
       (SELECT CAST({col} AS VARCHAR) FROM orders
        WHERE {col} IS NOT NULL
        GROUP BY 1 ORDER BY COUNT(*) DESC, 1 ASC LIMIT 1) AS top_value,
       (SELECT COUNT(*) FROM orders WHERE {col} IS NOT NULL
        GROUP BY CAST({col} AS VARCHAR) ORDER BY COUNT(*) DESC,
                 CAST({col} AS VARCHAR) ASC LIMIT 1) AS top_count
"""


_PROFILE_ORACLE = (
    "\nUNION ALL\n".join(_profile_col_sql(c) for c in _PROFILE_COLS)
    + "\nORDER BY column_name"
)


@register("dq_profile_summary", oracle=_PROFILE_ORACLE)
def dq_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling at scale: per-column null count, distinct count,
    lexicographic min/max, and the mode (most frequent value, ties to
    the smallest string) — the `describe()`-style summary a pipeline
    emits before trusting a new feed.  Engine shape: ONE unpivoted
    pass — the columns melt to (column_name, value) rows via an
    in-row stack, then a single (column, value) count aggregate feeds
    every statistic (nulls, distincts, min/max, windowed mode), so
    profiling C columns costs one scan and shuffles only
    |C × distinct values| count rows, not the table.  The oracle
    spells each statistic as an independent subquery."""
    o = table(spark, sf_dir, "orders")
    stack_expr = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
    )
    melted = o.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_expr})"
            " AS (column_name, value)"
        )
    )
    counts = melted.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("column_name").orderBy(
        F.col("cnt").desc(), F.col("value").asc_nulls_last()
    )
    # mode over NON-NULL values only (matching the oracle's subquery)
    ranked = counts.filter(F.col("value").isNotNull()).withColumn(
        "rn", F.row_number().over(w)
    )
    return (
        counts.groupBy("column_name")
        .agg(
            F.sum(
                F.when(F.col("value").isNull(), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_nulls"),
            F.count(F.when(F.col("value").isNotNull(), F.lit(1))).alias(
                "n_distinct"
            ),
            F.min("value").alias("min_str"),
            F.max("value").alias("max_str"),
        )
        .join(
            ranked.filter(F.col("rn") == 1).select(
                "column_name",
                F.col("value").alias("top_value"),
                F.col("cnt").alias("top_count"),
            ),
            "column_name",
            "left",  # an all-NULL column has no mode row; keep its
            # profile row with NULL top_value/top_count like the oracle
        )
        .orderBy("column_name")
    )
