"""Round-9 extension batch three: non-parametric trend testing.

- ``timeseries_mann_kendall``: the Mann-Kendall trend test over the
  daily revenue series — the standard non-parametric "is there a
  monotonic trend?" screen (hydrology/climatology/ops metrics), the
  SIGNIFICANCE companion to ``timeseries_theil_sen``'s robust slope
  ESTIMATE: theil-sen says how steep, Mann-Kendall says whether to
  believe it.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; extends SURVEY.md §2.3 section D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# S = Σ_{i<j} sign(y_j − y_i) and the tie-corrected variance numerator
# n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) are EXACT integers; the only floats
# are one sqrt + one division in this shared tail (continuity-corrected
# z).  Degenerate guard (built in from birth, per the round-9 sweep):
# an all-tied or single-day series zeroes the variance numerator —
# z and the trend verdict are NULL on both engines, never a throw and
# never a verdict from no evidence.
_MK_Z = (
    "CASE WHEN var_num = 0 THEN NULL"
    " WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)"
    " / sqrt(CAST(var_num AS DOUBLE) / 18.0)"
    " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)"
    " / sqrt(CAST(var_num AS DOUBLE) / 18.0)"
    " ELSE 0.0 END"
)

_MK_TAIL = (
    "CAST(n_days AS BIGINT) AS n_days",
    "CAST(s_stat AS BIGINT) AS s_stat",
    "CAST(var_num AS BIGINT) AS var_num",
    f"CAST({_MK_Z} AS DOUBLE) AS z",
    # 1.959964 enters as a literal (the two-sided 5% normal quantile —
    # the Benford/NDCG literal recipe, never erf/libm at run time)
    f"CAST(CASE WHEN var_num = 0 THEN NULL"
    f" WHEN ({_MK_Z}) > 1.959964 THEN 1"
    f" WHEN ({_MK_Z}) < -1.959964 THEN -1"
    f" ELSE 0 END AS BIGINT) AS trend_sig",
)

_MK_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1990-01-01',
              CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN b.y > a.y THEN 1
                                WHEN b.y < a.y THEN -1
                                ELSE 0 END), 0) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON b.d > a.d
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
ties AS (
  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_sum
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY y) g
  WHERE t > 1
),
agg AS (
  SELECT nn.n AS n_days, s.s_stat,
         nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_sum AS var_num
  FROM nn, s, ties
)
SELECT {", ".join(_MK_TAIL)} FROM agg
"""


@register("timeseries_mann_kendall", oracle=_MK_ORACLE)
def timeseries_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test of daily revenue: S counts
    concordant-minus-discordant day pairs, the tie-corrected variance
    gives the continuity-corrected z, and trend_sig ∈ {-1, 0, 1, NULL}
    is the two-sided 5% verdict — the distribution-free alternative to
    regression-slope t-tests (no normality, no linearity assumed).

    Exactness: S and the variance numerator are exact integers (pair
    signs and tie products); the float tail is ONE shared sqrt +
    division text, so z and the verdict are bit-identical across
    engines; an all-tied series (var_num exactly 0) yields NULL z and
    NULL verdict on both.

    Engine shape (the timeseries_theil_sen recipe): orders partial-
    aggregate map-side to the CALENDAR-BOUNDED daily table (≤2,400
    rows at any fact scale) which is collected to a LOCAL relation;
    the d_b > d_a pair join is a declared broadcast nested-loop over
    two calendar-bounded inputs (constant in fact scale), and S is one
    map-side-combined SUM over it — no fact-table join, shuffle, or
    window anywhere past the daily rollup.  Verified against a plain
    python pair scan in tests."""
    daily_rows = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1990-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d")
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("y")
        )
        .collect()  # calendar-bounded: <=2,400 (d, y) rows at ANY SF
    )
    n = len(daily_rows)
    daily = spark.createDataFrame(
        daily_rows or [(0, 0)], "d bigint, y bigint"
    )
    if not daily_rows:
        daily = daily.filter(F.lit(False))
    a = daily.selectExpr("d AS da", "y AS ya")
    b = daily.selectExpr("d AS db", "y AS yb")
    # explicit broadcast: the stats-less local relation would plan a
    # 1024-partition CartesianProduct otherwise (the theil-sen trap)
    s = a.join(F.broadcast(b), F.col("db") > F.col("da")).selectExpr(
        "CAST(COALESCE(SUM(CASE WHEN yb > ya THEN 1 WHEN yb < ya THEN -1"
        " ELSE 0 END), 0) AS BIGINT) AS s_stat"
    )
    ties = (
        daily.groupBy("y")
        .count()
        .filter("count > 1")
        .selectExpr(
            "CAST(COALESCE(SUM(count * (count - 1) * (2 * count + 5)), 0)"
            " AS BIGINT) AS tie_sum"
        )
    )
    agg = s.crossJoin(F.broadcast(ties)).selectExpr(
        f"CAST({n} AS BIGINT) AS n_days",
        "s_stat",
        f"CAST({n} AS BIGINT) * ({n} - 1) * (2 * {n} + 5) - tie_sum"
        " AS var_num",
    )
    return agg.selectExpr(*_MK_TAIL)
