"""Round-6 batch six: distribution statistics, sequential change
detection, ranking-quality metrics, and privacy auditing.

- ``agg_entropy_gini``: Shannon entropy (bits) and Gini impurity of
  the order-priority distribution per market segment — the two
  canonical impurity measures behind decision-tree splits, label
  balance audits, and corpus-mix diagnostics.
- ``timeseries_changepoint_cusum``: one-sided CUSUM change detection
  over the daily revenue series, computed in EXACT integer
  arithmetic via the prefix-minimum closed form (no recursive
  ``max(0, ...)`` state needed).
- ``rank_metrics_ndcg``: NDCG@10 of a concrete ranking (customers by
  account balance per nation) against a real relevance label —
  the IR evaluation metric every retrieval/training-data pipeline
  reports.
- ``privacy_k_anonymity``: k-anonymity audit with one generalization
  step (nation → region) and suppression — the privacy gate a
  training-data release pipeline runs after PII scrubbing
  (complements ``text_pii_scrub``).

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections D/J
per the north star's analytics + training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# agg_entropy_gini
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cnt AS (
  SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY 1, 2
),
t AS (
  SELECT seg, n, CAST(SUM(n) OVER (PARTITION BY seg) AS BIGINT) AS tot
  FROM cnt
)
SELECT seg AS mktsegment,
       CAST(MAX(tot) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_priorities,
       CAST(MAX(tot) * MAX(tot) - SUM(n * n) AS DOUBLE)
         / CAST(MAX(tot) * MAX(tot) AS DOUBLE) AS gini_impurity,
       CAST(-SUM(CAST((CAST(n AS DOUBLE) / tot)
                      * log2(CAST(n AS DOUBLE) / tot)
                      AS DECIMAL(25,6))) AS DOUBLE) AS entropy_bits
FROM t
GROUP BY seg
ORDER BY seg
"""


@register("agg_entropy_gini", oracle=_ENTROPY_ORACLE)
def agg_entropy_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) and Gini impurity of the order-priority
    distribution within each customer market segment.

    Exactness: Gini = (tot² − Σn²)/tot² where both numerator and
    denominator are exact integer aggregates — the only float op is
    two casts and ONE IEEE division, bit-identical across engines.
    Entropy terms p·log2(p) are each a single division + log2 on
    identical doubles; each term lifts through decimal(25,6) before
    the (order-independent, exact) decimal sum — the repo's standard
    log-partials recipe (same as text_bigram_logprob), which absorbs
    any last-ulp libm-vs-JVM log drift away from rounding boundaries
    (terms are irrational except the exact dyadic cases, which are
    representable).

    Engine shape: the fact side broadcast-joins the customer dim
    (no fact shuffle for the join), partial-aggregates to the
    |segments|×|priorities| = 25-cell count table in ONE map-side-
    combined shuffle, and every window/aggregate after that runs on
    the bounded 25-row table."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    j = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    cnt = (
        j.groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("seg"))
    t = cnt.select("seg", "n", tot.alias("tot"))
    p = F.col("n").cast("double") / F.col("tot").cast("double")
    term = (p * F.log2(p)).cast("decimal(25,6)")
    return (
        t.groupBy("seg")
        .agg(
            F.max("tot").alias("n_orders"),
            F.count(F.lit(1)).alias("n_priorities"),
            (
                (F.max("tot") * F.max("tot") - F.sum(F.col("n") * F.col("n")))
                .cast("double")
                / (F.max("tot") * F.max("tot")).cast("double")
            ).alias("gini_impurity"),
            (-F.sum(term)).cast("double").alias("entropy_bits"),
        )
        .withColumnRenamed("seg", "mktsegment")
        .orderBy("mktsegment")
    )


# --------------------------------------------------------------------------
# timeseries_changepoint_cusum
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
g AS (
  SELECT d, x,
         CAST(SUM(x) OVER () AS BIGINT) AS tot,
         CAST(COUNT(*) OVER () AS BIGINT) AS nn
  FROM daily
),
p AS (
  SELECT d, x, tot, nn,
         CAST(SUM(nn * x - tot) OVER (ORDER BY d) AS BIGINT) AS pp
  FROM g
),
c AS (
  SELECT d, x, tot, nn, pp,
         CAST(MIN(pp) OVER (ORDER BY d) AS BIGINT) AS runmin
  FROM p
)
SELECT d,
       x AS day_cents,
       CAST(pp - LEAST(0, runmin) AS BIGINT) AS cusum_scaled,
       CAST(CASE WHEN 100 * (pp - LEAST(0, runmin)) > tot * nn
                 THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM c
ORDER BY d
"""


@register("timeseries_changepoint_cusum", oracle=_CUSUM_ORACLE)
def timeseries_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided (upper) CUSUM change detection over the daily
    revenue series: C_t = max(0, C_{t-1} + (x_t − mean)) flags
    sustained upward shifts; a day alarms when the cumulative
    deviation exceeds 1% of total revenue.

    The recursive max(0, ·) state has the closed form
    C_t = P_t − min(0, min_{j≤t} P_j) with P_t the prefix sum of
    deviations — so the whole detector is two window functions
    (prefix sum + prefix min) sharing ONE sort, no procedural
    recursion.  Scaling every deviation by n (d_t = n·x_t − total)
    keeps the arithmetic in EXACT integers end-to-end: no mean
    division, no float anywhere, and the alarm test
    100·C_t > total·n is an exact integer comparison (at fixture
    scales all magnitudes fit int64; a 100 TB deployment lifts the
    same expressions through decimal(38,0)).

    Engine shape: the raw scan partial-aggregates to the DAILY
    series first (|days| rows out of the shuffle), and the
    unpartitioned ordered windows run only over that
    calendar-bounded table (~2.4k rows per 6.5 fixture years; <40k
    rows for a century) — the same documented-bounded global-window
    pattern as timeseries_seasonal_decompose."""
    orders = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        ).alias("x")
    )
    wg = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    g = daily.select(
        "d",
        "x",
        F.sum("x").over(wg).alias("tot"),
        F.count(F.lit(1)).over(wg).alias("nn"),
    )
    wp = Window.orderBy("d")
    p = g.select(
        "d", "x", "tot", "nn",
        F.sum(F.col("nn") * F.col("x") - F.col("tot")).over(wp).alias("pp"),
    )
    c = p.select(
        "d", "x", "tot", "nn", "pp",
        F.min("pp").over(wp).alias("runmin"),
    )
    cusum = F.col("pp") - F.least(F.lit(0).cast("long"), F.col("runmin"))
    return c.select(
        "d",
        F.col("x").alias("day_cents"),
        cusum.alias("cusum_scaled"),
        F.when(100 * cusum > F.col("tot") * F.col("nn"), 1)
        .otherwise(0)
        .cast("long")
        .alias("alarm"),
    ).orderBy("d")


# --------------------------------------------------------------------------
# rank_metrics_ndcg
# --------------------------------------------------------------------------

# 1/log2(i+1) discount weights and their prefix sums, i = 1..10, as
# 12-decimal literals: JVM StrictMath and libm log2 may differ in the
# last ulp, literals cannot (the dq_benford_first_digit precedent).
import math as _math

_NDCG_W = [round(1.0 / _math.log2(i + 1), 12) for i in range(1, 11)]
_NDCG_CUM = []
_acc = 0
for _w in _NDCG_W:
    _acc = round(_acc + _w, 12)
    _NDCG_CUM.append(_acc)

_WEIGHT_VALUES = ", ".join(
    f"({i + 1}, CAST({_NDCG_W[i]:.12f} AS DECIMAL(16,12)),"
    f" CAST({_NDCG_CUM[i]:.12f} AS DECIMAL(16,12)))"
    for i in range(10)
)

_NDCG_ORACLE = f"""
WITH wt(i, w, cumw) AS (VALUES {_WEIGHT_VALUES}),
rel AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE year(o_orderdate) = 1998 AND o_orderpriority = '1-URGENT'
),
lab AS (
  SELECT c.c_nationkey, c.c_custkey, c.c_acctbal,
         CASE WHEN r.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM customer c LEFT JOIN rel r ON c.c_custkey = r.o_custkey
),
nrel AS (
  SELECT c_nationkey, CAST(SUM(rel) AS BIGINT) AS n_relevant
  FROM lab GROUP BY 1
),
ranked AS (
  SELECT c_nationkey, rel,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS i
  FROM lab
),
dcg AS (
  SELECT r.c_nationkey,
         CAST(SUM(r.rel) AS BIGINT) AS rel_in_top10,
         SUM(CASE WHEN r.rel = 1 THEN w.w
                  ELSE CAST(0 AS DECIMAL(16,12)) END) AS dcg
  FROM ranked r JOIN wt w ON r.i = w.i
  WHERE r.i <= 10
  GROUP BY 1
)
SELECT CAST(d.c_nationkey AS BIGINT) AS nationkey,
       n.n_relevant,
       d.rel_in_top10,
       CAST(d.dcg AS DOUBLE) AS dcg,
       CAST(CASE WHEN n.n_relevant > 0 THEN i.cumw END AS DOUBLE) AS idcg,
       CASE WHEN n.n_relevant > 0
            THEN CAST(d.dcg AS DOUBLE) / CAST(i.cumw AS DOUBLE) END AS ndcg
FROM dcg d
JOIN nrel n ON d.c_nationkey = n.c_nationkey
LEFT JOIN wt i ON i.i = LEAST(n.n_relevant, 10)
ORDER BY nationkey
"""


@register("rank_metrics_ndcg", oracle=_NDCG_ORACLE)
def rank_metrics_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per nation of the customers-by-account-balance
    ranking, scored against a real relevance label (customer placed
    a 1-URGENT order in 1998) — the standard graded-ranking
    evaluation a retrieval or curriculum pipeline reports for every
    candidate ordering.

    Exactness: discount weights 1/log2(i+1) and their prefix sums
    enter as 12-decimal LITERALS (log2 may differ in the last ulp
    across math libraries; literals cannot), DCG/IDCG are exact
    decimal sums, and NDCG is two casts + ONE IEEE division.

    Engine shape: the relevance label set is a distinct-aggregated
    fact slice (bounded by |customers|) broadcast into the customer
    dim; the per-nation ranking window filters rank ≤ 10 (planned as
    WindowGroupLimit — a distributed partial top-K, no full sort);
    DCG joins the broadcast 10-row weight table; IDCG is a LEFT join
    of the per-nation relevant counts (|nations| rows) to the same
    weight literals.  Nations with zero relevant customers emit NULL
    NDCG rather than a divide-by-zero."""
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_custkey", "c_acctbal"
    )
    orders = table(spark, sf_dir, "orders")
    rel = (
        orders.filter(
            (F.year("o_orderdate") == 1998)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_custkey")
        .distinct()
    )
    lab = cust.join(
        F.broadcast(rel), F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("rel"),
    )
    nrel = lab.groupBy("c_nationkey").agg(F.sum("rel").alias("n_relevant"))

    wt = spark.createDataFrame(
        [(i + 1, str(_NDCG_W[i]), str(_NDCG_CUM[i])) for i in range(10)],
        "i INT, w_s STRING, cumw_s STRING",
    ).select(
        "i",
        F.col("w_s").cast("decimal(16,12)").alias("w"),
        F.col("cumw_s").cast("decimal(16,12)").alias("cumw"),
    )

    wr = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = lab.select(
        "c_nationkey", "rel", F.row_number().over(wr).alias("i")
    ).filter(F.col("i") <= 10)
    dcg = (
        ranked.join(F.broadcast(wt), "i")
        .groupBy("c_nationkey")
        .agg(
            F.sum("rel").alias("rel_in_top10"),
            F.sum(
                F.when(F.col("rel") == 1, F.col("w")).otherwise(
                    F.lit("0").cast("decimal(16,12)")
                )
            ).alias("dcg"),
        )
    )
    idcg_w = wt.select(F.col("i").alias("wi"), "cumw")
    out = (
        dcg.join(nrel, "c_nationkey")
        .join(
            F.broadcast(idcg_w),
            F.col("wi") == F.least(F.col("n_relevant"), F.lit(10)),
            "left",
        )
    )
    has_rel = F.col("n_relevant") > 0
    return out.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "n_relevant",
        "rel_in_top10",
        F.col("dcg").cast("double").alias("dcg"),
        F.when(has_rel, F.col("cumw").cast("double")).alias("idcg"),
        F.when(
            has_rel, F.col("dcg").cast("double") / F.col("cumw").cast("double")
        ).alias("ndcg"),
    ).orderBy("nationkey")


# --------------------------------------------------------------------------
# privacy_k_anonymity
# --------------------------------------------------------------------------

_KANON_ORACLE = """
WITH c AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
                              AS BIGINT) AS DOUBLE) / 100000)
              AS BIGINT) AS bal_bucket
  FROM customer
),
g1 AS (
  SELECT c_nationkey, c_mktsegment, bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY 1, 2, 3
),
g1r AS (
  SELECT g1.*, CAST(n.n_regionkey AS BIGINT) AS regionkey
  FROM g1 JOIN nation n ON g1.c_nationkey = n.n_nationkey
),
g2 AS (
  SELECT regionkey, c_mktsegment, bal_bucket, CAST(SUM(n) AS BIGINT) AS n
  FROM g1r WHERE n < 3 GROUP BY 1, 2, 3
)
SELECT CAST(1 AS BIGINT) AS anon_level, regionkey,
       CAST(c_nationkey AS BIGINT) AS nationkey,
       c_mktsegment AS mktsegment, bal_bucket, n
FROM g1r WHERE n >= 3
UNION ALL
SELECT CAST(2 AS BIGINT), regionkey, NULL, c_mktsegment, bal_bucket, n
FROM g2 WHERE n >= 3
UNION ALL
SELECT CAST(0 AS BIGINT), regionkey, NULL, c_mktsegment, bal_bucket, n
FROM g2 WHERE n < 3
ORDER BY anon_level, regionkey, nationkey, mktsegment, bal_bucket
"""


@register("privacy_k_anonymity", oracle=_KANON_ORACLE)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity (k=3) audit over the quasi-identifier
    (nation, market segment, balance bucket) with ONE generalization
    step and suppression: groups meeting k publish at nation level
    (anon_level=1); violating rows re-aggregate at region level and
    publish there if the merged group meets k (anon_level=2); groups
    still under k after generalization are suppressed
    (anon_level=0, reported with their residual counts) — the
    release gate a training-data pipeline runs after text_pii_scrub.

    Exactness: the balance bucket derives from exact integer cents
    (decimal(18,2) lift ×100) with an explicit FLOOR on both engines
    (the documented cast-truncation divergence); every output is an
    integer count.

    Engine shape: ONE map-side-combined shuffle on the
    quasi-identifier produces the level-1 group table (bounded by
    |nations|×|segments|×|buckets|, NOT by row count); the nation →
    region generalization broadcast-joins the 25-row nation dim; the
    level-2 re-aggregation runs over the bounded violator group
    table, never the raw rows."""
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("double")
            / 100000
        )
        .cast("long")
        .alias("bal_bucket"),
    )
    g1 = cust.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    g1r = g1.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select(
        F.col("n_regionkey").cast("long").alias("regionkey"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        "bal_bucket",
        "n",
    )
    lvl1 = g1r.filter(F.col("n") >= 3).select(
        F.lit(1).cast("long").alias("anon_level"),
        "regionkey",
        "nationkey",
        "mktsegment",
        "bal_bucket",
        "n",
    )
    g2 = (
        g1r.filter(F.col("n") < 3)
        .groupBy("regionkey", "mktsegment", "bal_bucket")
        .agg(F.sum("n").alias("n"))
    )
    nulln = F.lit(None).cast("long").alias("nationkey")
    lvl2 = g2.filter(F.col("n") >= 3).select(
        F.lit(2).cast("long").alias("anon_level"),
        "regionkey",
        nulln,
        "mktsegment",
        "bal_bucket",
        "n",
    )
    lvl0 = g2.filter(F.col("n") < 3).select(
        F.lit(0).cast("long").alias("anon_level"),
        "regionkey",
        nulln,
        "mktsegment",
        "bal_bucket",
        "n",
    )
    return lvl1.unionAll(lvl2).unionAll(lvl0).orderBy(
        "anon_level", "regionkey", "nationkey", "mktsegment", "bal_bucket"
    )
