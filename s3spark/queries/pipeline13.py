"""Round-6 batch seven: serial-correlation diagnostics, experiment
evaluation, customer-value segmentation, and referential-integrity
auditing.

- ``timeseries_autocorrelation``: exact lag-1..7 autocorrelation of
  the daily revenue series — the ACF every forecasting / anomaly
  pipeline inspects before model choice.  Numerator and denominator
  are EXACT integer sums (decimal(38,0) / HUGEINT); each ACF value is
  one IEEE division of two identically-rounded casts.
- ``stats_ab_proportion_ztest``: two-sample proportion z-test over a
  deterministic md5 traffic split — the experiment readout
  (lift, z statistic, Wald CI, significance flags) computed entirely
  from exact integer counts with an identical float tail on both
  engines (sqrt is IEEE-correctly-rounded; same expression text).
- ``rfm_customer_segments``: recency/frequency/monetary quartile
  scoring and segment labelling — the canonical customer-value
  segmentation, built from ONE fact scan, exact interpolated
  quartiles, and two 1-row broadcasts.
- ``dq_referential_orphans``: referential-integrity audit (orphan
  rows/keys + share per relationship), including a simulated
  late-arriving dimension snapshot so the orphan path is exercised
  non-vacuously.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections D/F/J
per the north star's analytics + training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# timeseries_autocorrelation
# --------------------------------------------------------------------------

_ACF_LAGS = 7


def _acf_term(k: int) -> str:
    """Guarded ACF ratio for lag k (round-9 degenerate sweep): a
    CONSTANT series has den = Σy² exactly 0 (integer arithmetic), the
    ACF is undefined, and ANSI Spark would throw DIVIDE_BY_ZERO where
    DuckDB returns NULL — the shared CASE emits NULL on both."""
    return (
        f"CASE WHEN den = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE CAST(CAST(n{k} AS DOUBLE) / CAST(den AS DOUBLE) AS DOUBLE) END"
    )

_ACF_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
g AS (
  SELECT d, x,
         CAST(COUNT(*) OVER () AS BIGINT) AS nn,
         CAST(SUM(x) OVER () AS BIGINT) AS tot
  FROM daily
),
y AS (
  SELECT d, CAST(nn * x - tot AS HUGEINT) AS y FROM g
),
l AS (
  SELECT y,
         lag(y, 1) OVER (ORDER BY d) AS y1,
         lag(y, 2) OVER (ORDER BY d) AS y2,
         lag(y, 3) OVER (ORDER BY d) AS y3,
         lag(y, 4) OVER (ORDER BY d) AS y4,
         lag(y, 5) OVER (ORDER BY d) AS y5,
         lag(y, 6) OVER (ORDER BY d) AS y6,
         lag(y, 7) OVER (ORDER BY d) AS y7
  FROM y
),
w AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(y * y) AS den,
         SUM(y * y1) AS n1, SUM(y * y2) AS n2, SUM(y * y3) AS n3,
         SUM(y * y4) AS n4, SUM(y * y5) AS n5, SUM(y * y6) AS n6,
         SUM(y * y7) AS n7
  FROM l
)
SELECT lag, acf, n_days FROM (
  SELECT CAST(1 AS BIGINT) AS lag, {T1} AS acf, n_days FROM w
  UNION ALL SELECT 2, {T2}, n_days FROM w
  UNION ALL SELECT 3, {T3}, n_days FROM w
  UNION ALL SELECT 4, {T4}, n_days FROM w
  UNION ALL SELECT 5, {T5}, n_days FROM w
  UNION ALL SELECT 6, {T6}, n_days FROM w
  UNION ALL SELECT 7, {T7}, n_days FROM w
) ORDER BY lag
""".format(**{f"T{k}": _acf_term(k) for k in range(1, 8)})


@register("timeseries_autocorrelation", oracle=_ACF_ORACLE)
def timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation (ACF, biased estimator) of the daily
    revenue series: r_k = Σ_t (x_t−x̄)(x_{t−k}−x̄) / Σ_t (x_t−x̄)².

    Exactness: with integer day-cents x and n days, the centred value
    (x_t − x̄) equals (n·x_t − tot)/n, so every n cancels between
    numerator and denominator — both are EXACT integer sums of
    y_t = n·x_t − tot products, carried in decimal(38,0) (Spark) /
    HUGEINT (DuckDB) exactly like agg_moments_skew_kurtosis.  Each
    r_k is then two correctly-rounded casts + ONE IEEE division —
    bit-identical across engines.  SUM skips NULL lag products on
    both engines, so the numerator naturally ranges over t > k while
    the denominator covers the full series (the standard biased ACF).

    Engine shape: orders partial-aggregate map-side to the
    CALENDAR-BOUNDED daily series (≤ 2,400 rows regardless of fact
    scale — the same argument as timeseries_seasonal_decompose), and
    every window (global total, 7 lags sharing ONE sort) runs on that
    bounded table; the fact table itself is never windowed."""
    orders = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    w_all = Window.partitionBy()
    g = daily.select(
        "d",
        "x",
        F.count(F.lit(1)).over(w_all).alias("nn"),
        F.sum("x").over(w_all).alias("tot"),
    )
    y = g.select(
        "d", (F.col("nn") * F.col("x") - F.col("tot")).cast("decimal(38,0)").alias("y")
    )
    w_ord = Window.orderBy("d")
    lagged = y.select(
        "y", *[F.lag("y", k).over(w_ord).alias(f"y{k}") for k in range(1, _ACF_LAGS + 1)]
    )
    wide = lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("y") * F.col("y")).alias("den"),
        *[
            F.sum(F.col("y") * F.col(f"y{k}")).alias(f"n{k}")
            for k in range(1, _ACF_LAGS + 1)
        ],
    )
    stack_args = ", ".join(
        f"CAST({k} AS BIGINT), {_acf_term(k)}"
        for k in range(1, _ACF_LAGS + 1)
    )
    return (
        wide.selectExpr(f"stack({_ACF_LAGS}, {stack_args}) AS (lag, acf)", "n_days")
        .select("lag", "acf", "n_days")
        .orderBy("lag")
    )


# --------------------------------------------------------------------------
# stats_ab_proportion_ztest
# --------------------------------------------------------------------------

# The float tail is ONE shared expression text executed verbatim on
# both engines: every operand is a correctly-rounded cast of an exact
# integer, and +,-,*,/ and sqrt are all IEEE-754 correctly-rounded, so
# the doubles are bit-identical (the ml_linreg_normal_eq recipe).
# Degenerate-denominator guards (the round-9 hypothesis-differential
# finding, applied family-wide): an empty traffic arm (n = 0) or a
# degenerate pooled rate (pp ∈ {0, 1} — zero conversions anywhere, or
# all conversions) leaves the statistic undefined; DuckDB's float
# division returns NULL and ANSI Spark throws DIVIDE_BY_ZERO, so the
# shared text takes explicit NaN branches on both engines.  Unlike
# the fixture-unreachable stats16 edges, pp = 0 is a REAL production
# case (an experiment window with no conversions yet).
_ZT_DERIVE = [
    "CASE WHEN n1 = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS p1",
    "CASE WHEN n2 = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) END AS p2",
    "CASE WHEN n1 + n2 = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) END AS pp",
]
_ZT_Z = (
    "CAST(CASE WHEN n1 = 0 OR n2 = 0 OR pp * (1.0 - pp) = 0.0 "
    "THEN CAST('NaN' AS DOUBLE) "
    "ELSE (p1 - p2) / sqrt(pp * (1.0 - pp) * "
    "(1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) END AS DOUBLE)"
)
_ZT_SE_U = (
    "(CASE WHEN n1 = 0 OR n2 = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE sqrt(p1 * (1.0 - p1) / CAST(n1 AS DOUBLE) "
    "+ p2 * (1.0 - p2) / CAST(n2 AS DOUBLE)) END)"
)

_ZTEST_ORACLE = f"""
WITH g AS (
  SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS grp,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS conv
  FROM orders
),
c AS (
  SELECT CAST(SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN grp = 'A' THEN conv ELSE 0 END) AS BIGINT) AS x1,
         CAST(SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN grp = 'B' THEN conv ELSE 0 END) AS BIGINT) AS x2
  FROM g
),
p AS (SELECT n1, x1, n2, x2, {', '.join(_ZT_DERIVE)} FROM c),
z AS (SELECT n1, x1, n2, x2, p1, p2, {_ZT_Z} AS z, {_ZT_SE_U} AS se_u FROM p)
SELECT n1, x1, n2, x2, p1, p2,
       CAST(p1 - p2 AS DOUBLE) AS lift,
       z,
       CAST(p1 - p2 - 1.959964 * se_u AS DOUBLE) AS ci95_lo,
       CAST(p1 - p2 + 1.959964 * se_u AS DOUBLE) AS ci95_hi,
       CAST(CASE WHEN isnan(z) THEN 0 WHEN abs(z) > 1.644854 THEN 1 ELSE 0 END AS BIGINT) AS sig_90,
       CAST(CASE WHEN isnan(z) THEN 0 WHEN abs(z) > 1.959964 THEN 1 ELSE 0 END AS BIGINT) AS sig_95
FROM z
"""


@register("stats_ab_proportion_ztest", oracle=_ZTEST_ORACLE)
def stats_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample proportion z-test of urgent-order share across a
    deterministic md5 50/50 traffic split — the standard experiment
    readout: lift, pooled-variance z statistic, unpooled Wald 95% CI,
    and significance flags at 90/95%.

    Exactness: group sizes and conversion counts are exact integers
    from ONE map-side-combined aggregation (the split is a row-local
    md5 hash — zero extra shuffle).  The float tail is the SAME
    expression text on both engines over correctly-rounded casts of
    those integers; +,-,*,/ and sqrt are IEEE-correctly-rounded, so
    z and the CI bounds are bit-identical doubles (the
    ml_linreg_normal_eq / dq_benford recipe — critical values enter
    as 6-decimal literals, never via erf/normal-quantile calls whose
    libm implementations could differ).  Significance flags compare
    those bit-identical doubles to the literals, so they are
    deterministic even at the boundary.

    Engine shape at 100 TB: the whole key is one scan + one
    partial-aggregated reduction to a single 4-integer row; every
    derived statistic is driver-trivial arithmetic on that row."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    g = orders.selectExpr(
        "CASE WHEN substr(md5(CAST(CAST(o_orderkey AS STRING) AS BINARY)), 1, 1) < '8' "
        "THEN 'A' ELSE 'B' END AS grp",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS conv",
    )
    c = g.selectExpr(
        "CAST(SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1",
        "CAST(SUM(CASE WHEN grp = 'A' THEN conv ELSE 0 END) AS BIGINT) AS x1",
        "CAST(SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2",
        "CAST(SUM(CASE WHEN grp = 'B' THEN conv ELSE 0 END) AS BIGINT) AS x2",
    )
    p = c.selectExpr("n1", "x1", "n2", "x2", *_ZT_DERIVE)
    z = p.selectExpr(
        "n1", "x1", "n2", "x2", "p1", "p2", f"{_ZT_Z} AS z", f"{_ZT_SE_U} AS se_u"
    )
    return z.selectExpr(
        "n1",
        "x1",
        "n2",
        "x2",
        "p1",
        "p2",
        "CAST(p1 - p2 AS DOUBLE) AS lift",
        "z",
        "CAST(p1 - p2 - 1.959964 * se_u AS DOUBLE) AS ci95_lo",
        "CAST(p1 - p2 + 1.959964 * se_u AS DOUBLE) AS ci95_hi",
        "CAST(CASE WHEN isnan(z) THEN 0 "
        "WHEN abs(z) > 1.644854 THEN 1 ELSE 0 END AS BIGINT) AS sig_90",
        "CAST(CASE WHEN isnan(z) THEN 0 "
        "WHEN abs(z) > 1.959964 THEN 1 ELSE 0 END AS BIGINT) AS sig_95",
    )


# --------------------------------------------------------------------------
# rfm_customer_segments
# --------------------------------------------------------------------------

# Quartile scores from exact interpolated quartile boundaries; the
# comparisons and the segment CASE are the same text on both engines.
_RFM_SCORES = [
    "CAST(1 + (CASE WHEN recency_days < r_q3 THEN 1 ELSE 0 END)"
    "       + (CASE WHEN recency_days < r_q2 THEN 1 ELSE 0 END)"
    "       + (CASE WHEN recency_days < r_q1 THEN 1 ELSE 0 END) AS BIGINT) AS r_score",
    "CAST(1 + (CASE WHEN frequency > f_q1 THEN 1 ELSE 0 END)"
    "       + (CASE WHEN frequency > f_q2 THEN 1 ELSE 0 END)"
    "       + (CASE WHEN frequency > f_q3 THEN 1 ELSE 0 END) AS BIGINT) AS f_score",
    "CAST(1 + (CASE WHEN monetary_cents > m_q1 THEN 1 ELSE 0 END)"
    "       + (CASE WHEN monetary_cents > m_q2 THEN 1 ELSE 0 END)"
    "       + (CASE WHEN monetary_cents > m_q3 THEN 1 ELSE 0 END) AS BIGINT) AS m_score",
]
_RFM_SEGMENT = """
CASE WHEN r_score = 4 AND f_score >= 3 AND m_score >= 3 THEN 'champions'
     WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
     WHEN r_score >= 3 AND m_score >= 3 THEN 'big_spenders'
     WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
     WHEN r_score = 1 AND f_score = 1 THEN 'hibernating'
     ELSE 'regular' END AS segment
"""

_RFM_ORACLE = f"""
WITH percust AS (
  SELECT o_custkey AS custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_d,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1
),
ref AS (SELECT MAX(last_d) AS max_d FROM percust),
r AS (
  SELECT custkey, frequency, monetary_cents,
         CAST(date_diff('day', last_d, max_d) AS BIGINT) AS recency_days
  FROM percust, ref
),
b AS (
  SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
         quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
         quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) AS mq
  FROM r
),
s AS (
  SELECT custkey, recency_days, frequency, monetary_cents,
         rq[1] AS r_q1, rq[2] AS r_q2, rq[3] AS r_q3,
         fq[1] AS f_q1, fq[2] AS f_q2, fq[3] AS f_q3,
         mq[1] AS m_q1, mq[2] AS m_q2, mq[3] AS m_q3
  FROM r, b
),
sc AS (
  SELECT custkey, recency_days, frequency, monetary_cents,
         {', '.join(_RFM_SCORES)}
  FROM s
),
seg AS (SELECT *, {_RFM_SEGMENT} FROM sc)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(CAST(SUM(recency_days) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_recency_days,
       CAST(CAST(SUM(frequency) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_frequency,
       CAST(CAST(SUM(monetary_cents) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS avg_monetary_cents,
       CAST(MIN(r_score) AS BIGINT) AS min_r_score,
       CAST(MAX(m_score) AS BIGINT) AS max_m_score
FROM seg
GROUP BY segment
ORDER BY segment
"""


@register("rfm_customer_segments", oracle=_RFM_ORACLE)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile scoring and
    segment labelling over customers with ≥1 order — the canonical
    customer-value segmentation every CRM/analytics stack ships.

    Exactness: per-customer R/F/M are exact integers (days via DATE
    datediff, cents via decimal lift); quartile boundaries use the
    exact interpolated percentile, which is bit-identical to DuckDB's
    quantile_cont on integer inputs (the quality_length_outlier_mad
    precedent); scores are integer comparisons against those doubles;
    per-segment averages divide an exact BIGINT sum by the count
    (one IEEE division — never a float SUM).

    Engine shape: ONE scan of orders partial-aggregates to the
    per-customer table (one map-side-combined shuffle on custkey),
    which is then MATERIALIZED to scratch parquet — the boundary
    aggregate and the scoring pass both reference it, and Spark plans
    are trees, not DAGs, so without the lineage break the fact would
    be scanned once per reference (the graph_pagerank_unrolled
    lesson).  The global max date and the 9 quartile boundaries are
    1-row broadcasts (declared constant-build BNLJ); the final
    segment roll-up shuffles |customers| rows to ≤6 groups.  At
    100 TB the exact percentile (which buffers per-group values) is
    the one stage to swap: approx_percentile(…, 1e-4) is the declared
    sketch alternative — the scores change only for customers within
    the sketch error of a boundary."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    percust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    ref = percust.agg(F.max("last_d").alias("max_d"))
    # localCheckpoint, not parquet scratch (round-12): same lineage
    # break for the multi-consumer per-customer table, minus the write
    # job + disk round-trip.
    r = (
        percust.crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            "frequency",
            "monetary_cents",
            F.datediff(F.col("max_d"), F.col("last_d"))
            .cast("bigint")
            .alias("recency_days"),
        )
        .localCheckpoint()
    )
    b = r.agg(
        F.expr("percentile(recency_days, array(0.25, 0.5, 0.75))").alias("rq"),
        F.expr("percentile(frequency, array(0.25, 0.5, 0.75))").alias("fq"),
        F.expr("percentile(monetary_cents, array(0.25, 0.5, 0.75))").alias("mq"),
    ).selectExpr(
        "rq[0] AS r_q1", "rq[1] AS r_q2", "rq[2] AS r_q3",
        "fq[0] AS f_q1", "fq[1] AS f_q2", "fq[2] AS f_q3",
        "mq[0] AS m_q1", "mq[1] AS m_q2", "mq[2] AS m_q3",
    )
    s = r.crossJoin(F.broadcast(b))
    sc = s.selectExpr(
        "custkey", "recency_days", "frequency", "monetary_cents", *_RFM_SCORES
    )
    seg = sc.selectExpr("*", _RFM_SEGMENT.strip())
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum("recency_days").cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_recency_days"),
            (
                F.sum("frequency").cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_frequency"),
            (
                F.sum("monetary_cents").cast("bigint").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_monetary_cents"),
            F.min("r_score").alias("min_r_score"),
            F.max("m_score").alias("max_m_score"),
        )
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# dq_referential_orphans
# --------------------------------------------------------------------------

_ORPHAN_ORACLE = """
WITH snap AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 7),
li AS (
  SELECT 'lineitem->orders' AS relationship,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT f.l_orderkey) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN d.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS orphan_rows,
         CAST(COUNT(DISTINCT CASE WHEN d.o_orderkey IS NULL
                                  THEN f.l_orderkey END) AS BIGINT)
           AS orphan_keys
  FROM lineitem f
  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) d
    ON f.l_orderkey = d.o_orderkey
),
oc AS (
  SELECT 'orders->customer_snapshot' AS relationship,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT f.o_custkey) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS orphan_rows,
         CAST(COUNT(DISTINCT CASE WHEN d.c_custkey IS NULL
                                  THEN f.o_custkey END) AS BIGINT)
           AS orphan_keys
  FROM orders f LEFT JOIN snap d ON f.o_custkey = d.c_custkey
),
ec AS (
  SELECT 'events->customer' AS relationship,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS orphan_rows,
         CAST(COUNT(DISTINCT CASE WHEN d.c_custkey IS NULL
                                  THEN f.user_id END) AS BIGINT)
           AS orphan_keys
  FROM events f
  LEFT JOIN (SELECT c_custkey FROM customer) d ON f.user_id = d.c_custkey
),
u AS (SELECT * FROM li UNION ALL SELECT * FROM oc UNION ALL SELECT * FROM ec)
SELECT relationship, n_rows, n_keys, orphan_rows, orphan_keys,
       CAST(CAST(orphan_rows AS DOUBLE) / CAST(n_rows AS DOUBLE) AS DOUBLE)
         AS orphan_row_share
FROM u ORDER BY relationship
"""


def _orphan_audit(fact: DataFrame, fk: str, dim: DataFrame, pk: str,
                  relationship: str, broadcast_dim: bool) -> DataFrame:
    """One relationship audit: pre-aggregate the fact by its FK, LEFT
    JOIN the distinct dim keys onto the KEY-LEVEL rows, and reduce.

    Round-13 restructure (guide §2.3 "aggregate before you shuffle" /
    §2.4): the previous shape joined at FACT-row granularity and then
    ran two COUNT(DISTINCT ...) over the joined rows — an Expand node
    that tripled every fact row before aggregation (plan pair in
    plans/r13/).  Grouping the fact to (fk, row-count) first is a
    map-side-combinable aggregate that compresses the join probe side
    to |distinct keys|, after which every former DISTINCT is a plain
    count over groups: n_rows = Σ cnt, n_keys = COUNT(*), orphan_rows
    = Σ cnt over unmatched, orphan_keys = COUNT(*) unmatched.  Exact
    integers, value-identical by construction; at 100 TB the join and
    the Expand both drop from corpus-sized to key-sized."""
    per_key = fact.groupBy(F.col(fk).alias("__fk")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    keys = dim.select(F.col(pk).alias("__pk")).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    j = per_key.join(keys, F.col("__fk") == F.col("__pk"), "left")
    orphan = F.col("__pk").isNull()
    # COUNT(DISTINCT fk) semantics: a NULL fk contributes to row
    # counts but never to key counts — F.count("__fk") skips the NULL
    # group and the orphan_keys guard mirrors it, so the key-level
    # rewrite is value-identical even on null-bearing feeds.
    return j.agg(
        F.lit(relationship).alias("relationship"),
        F.sum("__cnt").cast("bigint").alias("n_rows"),
        F.count(F.col("__fk")).alias("n_keys"),
        F.sum(F.when(orphan, F.col("__cnt")).otherwise(0)).cast("bigint")
        .alias("orphan_rows"),
        F.sum(
            F.when(orphan & F.col("__fk").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("orphan_keys"),
    ).select("relationship", "n_rows", "n_keys", "orphan_rows", "orphan_keys")


@register("dq_referential_orphans", oracle=_ORPHAN_ORACLE)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan rows, orphan keys, and the
    orphan row share for three relationships — lineitem→orders and
    events→customer (real FKs, expected clean: a PASSING audit row is
    the informative output), plus orders→customer_snapshot against a
    simulated late-arriving dimension (customers with custkey % 10 == 7
    withheld — the partition-didn't-land failure mode an ingest
    pipeline audits for), which exercises the orphan path
    non-vacuously at every SF.

    Engine shape: each relationship is ONE fact scan LEFT-JOINed to
    the dim's distinct key column (key-only build side).  Small dims
    (customer) broadcast explicitly; lineitem→orders deliberately does
    NOT broadcast — at 100 TB both sides are large and the audit runs
    as a shuffle join on the FK, which AQE converts or skew-splits as
    needed.  All counts are exact integers; the share is one IEEE
    division."""
    lineitem = table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, sf_dir, "customer").select("c_custkey")
    events = table(spark, sf_dir, "events").select("user_id")
    snap = customer.where(F.col("c_custkey") % 10 != 7)
    audits = (
        _orphan_audit(lineitem, "l_orderkey", orders.select("o_orderkey"),
                      "o_orderkey", "lineitem->orders", broadcast_dim=False)
        .unionAll(_orphan_audit(orders, "o_custkey", snap, "c_custkey",
                                "orders->customer_snapshot", broadcast_dim=True))
        .unionAll(_orphan_audit(events, "user_id", customer, "c_custkey",
                                "events->customer", broadcast_dim=True))
    )
    return audits.select(
        "relationship",
        "n_rows",
        "n_keys",
        "orphan_rows",
        "orphan_keys",
        (F.col("orphan_rows").cast("double") / F.col("n_rows").cast("double"))
        .alias("orphan_row_share"),
    ).orderBy("relationship")
