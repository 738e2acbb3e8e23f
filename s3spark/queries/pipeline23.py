"""Round-10 extension batch two: k-group inference and table
profiling — the multi-cohort generalizations of the existing
two-sample tests plus the metadata pass every ingestion front-door
runs.

- ``stats_anova_oneway``: one-way ANOVA F-test of order value across
  the five priority classes — the k-group generalization of
  ``stats_welch_ttest`` (pooled-variance form).
- ``stats_kruskal_wallis``: the rank-based k-group test (tie-corrected
  H) — generalizes ``stats_mann_whitney_u`` the way ANOVA generalizes
  the t-test, sharing its exact doubled-midrank machinery.
- ``dq_column_profile``: one-pass per-column profile (rows, nulls,
  exact distinct count, min/max) over the orders table — the
  schema-on-read audit a 100 TB ingest runs before anything else.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; extends SURVEY.md §2.3 section D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.queries._prefix import with_cum_less as _with_cum_less
from s3spark.registry import register

# --------------------------------------------------------------------------
# stats_anova_oneway
# --------------------------------------------------------------------------

# Per-group moments are EXACT decimal(38,0) integer sums of cent
# values: n_g, S_g = Σx, Q_g = Σx².  The within-group sum of squares
# avoids catastrophic cancellation by keeping the numerator exact —
# ssw_g = (n_g·Q_g − S_g²)/n_g divides an exact decimal by an exact
# integer (ONE float division per group, ≤|k| terms summed).  SSB
# comes from the exact identity SS_total − SSW with SS_total's
# numerator (N·Q − S²) exact the same way.  Degenerate guards from
# birth: k < 2 (no contrast), N ≤ k (no residual df), or SSW = 0
# (all groups internally constant) leave F NULL on both engines.
_AOV_F = (
    "CASE WHEN k < 2 OR n <= k OR ssw <= 0.0 THEN NULL"
    " ELSE (ssb / (CAST(k AS DOUBLE) - 1.0))"
    " / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) END"
)

_AOV_TAIL = (
    "CAST(k AS BIGINT) AS k_groups",
    "CAST(n AS BIGINT) AS n",
    "CAST(ssb AS DOUBLE) AS ss_between",
    "CAST(ssw AS DOUBLE) AS ss_within",
    f"CAST({_AOV_F} AS DOUBLE) AS f_stat",
    # eta² = SSB / SS_total — the effect size reviewers actually read
    "CAST(CASE WHEN ssb + ssw <= 0.0 THEN NULL"
    " ELSE ssb / (ssb + ssw) END AS DOUBLE) AS eta_sq",
)

_AOV_QUERY = """
WITH x AS (
  SELECT o_orderpriority AS g,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM {T}
),
grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg,
         CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS qg
  FROM x GROUP BY g
),
fold AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST((ng * qg - sg * sg) AS DOUBLE) / ng) AS DOUBLE)
           AS ssw,
         CAST(SUM(sg) AS DECIMAL(38,0)) AS s_tot,
         CAST(SUM(qg) AS DECIMAL(38,0)) AS q_tot
  FROM grp
),
e AS (
  SELECT k, n, ssw,
         CASE WHEN n = 0 THEN 0.0
              ELSE CAST((n * q_tot - s_tot * s_tot) AS DOUBLE) / n - ssw
         END AS ssb
  FROM fold
)
SELECT {TAIL} FROM e
"""

_AOV_ORACLE = _AOV_QUERY.format(T="orders", TAIL=", ".join(_AOV_TAIL))


@register("stats_anova_oneway", oracle=_AOV_ORACLE)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value across the five priority classes:
    F = (SSB/(k−1)) / (SSW/(N−k)) plus eta² — the k-group
    generalization of the two-sample t-test, the first screen for
    "does this categorical dimension explain the metric at all".

    Exactness: per-group (n, Σx, Σx²) are exact decimal(38,0) cent
    sums; every sum-of-squares keeps its NUMERATOR exact
    (n_g·Q_g − S_g², N·Q − S²) so the classic Σx² catastrophic
    cancellation never happens in floats — each group contributes ONE
    float division, and the ≤k-term folds plus the F ratio share one
    expression text across engines.  k < 2, N ≤ k, or an all-constant
    within-group corpus yield NULL F (never a throw).

    Engine shape: one map-side-combined shuffle to |k| moment rows
    (≤5 here; bounded by the dimension's cardinality at any scale),
    then a 1-row fold — the cheapest possible k-group test at 100 TB;
    no window, no sort, no join."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "p23_aov_orders"
    )
    return spark.sql(
        _AOV_QUERY.format(T="p23_aov_orders", TAIL=", ".join(_AOV_TAIL))
    )


# --------------------------------------------------------------------------
# stats_kruskal_wallis
# --------------------------------------------------------------------------

# H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1), tie-corrected by
# C = 1 − Σ(t³−t)/(N³−N).  Midranks stay integral by DOUBLING
# (rank2 = 2·cum_less + cnt + 1, the MWU recipe), so
# 2·R_g = Σ_cells cnt_g·rank2 is an exact decimal(38,0) sum per group
# and H's float tail is one shared text.  Degenerate guards: k < 2 or
# an all-tied corpus (tie correction C = 0, i.e. every value equal)
# leaves H NULL on both engines.
_KW_H = (
    "CASE WHEN k < 2 OR n < 2 THEN NULL"
    " WHEN t3 >= CAST(n AS DOUBLE) * n * n - n THEN NULL"
    " ELSE ((12.0 / (CAST(n AS DOUBLE) * (n + 1.0))) * r2term / 4.0"
    " - 3.0 * (CAST(n AS DOUBLE) + 1.0))"
    " / (1.0 - t3 / (CAST(n AS DOUBLE) * n * n - n)) END"
)

# chi²(df) 5% quantiles as literals, df = k−1 selected from the data
# (the Benford/Mann-Kendall literal recipe — never an
# incomplete-gamma at run time).  Round-10 advice caught the earlier
# hardcoded df=4 literal: correct for the 5-priority fixture but a
# wrong verdict on any k≠5 corpus.  df outside the literal table
# (k>11) yields NULL sig — an honest "compute it offline", never a
# wrong cutoff.
_KW_CRIT = (
    "CASE k - 1"
    " WHEN 1 THEN 3.841459 WHEN 2 THEN 5.991465 WHEN 3 THEN 7.814728"
    " WHEN 4 THEN 9.487729 WHEN 5 THEN 11.070498 WHEN 6 THEN 12.591587"
    " WHEN 7 THEN 14.067140 WHEN 8 THEN 15.507313 WHEN 9 THEN 16.918978"
    " WHEN 10 THEN 18.307038 ELSE NULL END"
)

_KW_TAIL = (
    "CAST(k AS BIGINT) AS k_groups",
    "CAST(n AS BIGINT) AS n",
    "CAST(n_cells AS BIGINT) AS n_distinct_values",
    f"CAST({_KW_H} AS DOUBLE) AS h_stat",
    # NULL H is NOT significant (0); NULL critical value (df > 10)
    # propagates NULL — unknown, not "not significant".
    f"CAST(CASE WHEN ({_KW_H}) IS NULL THEN 0"
    f" WHEN ({_KW_H}) > ({_KW_CRIT}) THEN 1"
    f" WHEN ({_KW_H}) <= ({_KW_CRIT}) THEN 0"
    f" ELSE NULL END AS BIGINT) AS sig_95",
)

_KW_ORACLE = f"""
WITH x AS (
  SELECT o_orderpriority AS g,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM orders
),
cell AS (
  SELECT v, g, CAST(COUNT(*) AS BIGINT) AS cg FROM x GROUP BY v, g
),
vcell AS (
  SELECT v, CAST(SUM(cg) AS BIGINT) AS cnt FROM cell GROUP BY v
),
w AS (
  SELECT v, cnt,
         COALESCE(CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
           PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_less
  FROM vcell
),
rg AS (
  SELECT c.g, CAST(SUM(c.cg) AS BIGINT) AS ng,
         CAST(SUM(CAST(c.cg AS HUGEINT)
                  * (2 * CAST(w.cum_less AS HUGEINT) + w.cnt + 1))
              AS HUGEINT) AS r2g
  FROM cell c JOIN w ON w.v = c.v
  GROUP BY c.g
),
ties AS (
  SELECT CAST(COALESCE(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt), 0)
              AS HUGEINT) AS t3i,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM vcell
),
fold AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(r2g AS DOUBLE) * r2g AS DOUBLE) / ng)
              AS DOUBLE) AS r2term
  FROM rg
)
SELECT {", ".join(_KW_TAIL)}
FROM (
  SELECT fold.k, fold.n, fold.r2term,
         CAST(ties.t3i AS DOUBLE) AS t3, ties.n_cells
  FROM fold CROSS JOIN ties
) e
"""


@register("stats_kruskal_wallis", oracle=_KW_ORACLE)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis tie-corrected H across the five priority
    classes — the distribution-free k-group test (rank-based ANOVA):
    use it where the metric is skewed or ordinal and ANOVA's
    normal-theory F is off the table.

    Exactness: doubled midranks make every per-group rank sum an
    exact decimal(38,0) reduction (2·R_g = Σ cnt_g·(2·cum_less + cnt
    + 1) — the Σ R_g²/n_g term divides the exact square by n_g, one
    float division per group); the tie term Σ(t³−t) is an exact
    integer; H's tail including the chi² verdict is one shared text.
    An all-tied corpus (C = 0) or k < 2 yields NULL H, sig 0.

    Engine shape: two distinct-bounded shuffles — (value, group)
    cells, then value cells — the global rank prefix reuses the
    shared two-level bucket scheme (per-bucket windows + ≤64-row
    broadcast offsets, NEVER a single-partition sort; the oracle's
    direct single-window form proves it exact); the per-group fold is
    ≤|k| rows."""
    x = table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    cell = x.groupBy("v", "g").agg(F.count(F.lit(1)).alias("cg"))
    vcell = cell.groupBy("v").agg(F.sum("cg").cast("bigint").alias("cnt"))
    w = _with_cum_less(spark, vcell, "kruskal")
    big = "decimal(38,0)"
    rg = (
        cell.join(w.select("v", "cnt", "cum_less"), "v")
        .groupBy("g")
        .agg(
            F.sum("cg").cast("bigint").alias("ng"),
            F.sum(
                (
                    F.col("cg").cast(big)
                    * (F.lit(2) * F.col("cum_less") + F.col("cnt") + 1)
                ).cast(big)
            )
            .cast(big)
            .alias("r2g"),
        )
    )
    ties = w.agg(
        F.coalesce(
            F.sum(
                (
                    F.col("cnt").cast(big) * F.col("cnt") * F.col("cnt")
                    - F.col("cnt")
                ).cast(big)
            ),
            F.lit(0).cast(big),
        ).alias("t3i"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    fold = rg.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(
            (F.col("r2g").cast("double") * F.col("r2g")).cast("double")
            / F.col("ng")
        )
        .cast("double")
        .alias("r2term"),
    )
    e = fold.crossJoin(F.broadcast(ties)).select(
        "k",
        "n",
        "r2term",
        F.col("t3i").cast("double").alias("t3"),
        "n_cells",
    )
    return e.selectExpr(*_KW_TAIL)


# --------------------------------------------------------------------------
# dq_column_profile
# --------------------------------------------------------------------------

# One pass over orders: per-column (rows, nulls, exact distinct,
# min/max as canonical strings).  All 6×COUNT(DISTINCT) run in ONE
# aggregate (Spark plans a single Expand pass — the
# agg_multi_distinct mechanism); the Spark side fans the 1-row
# aggregate to per-column rows with stack() AFTER the reduction (the
# dq_table_checksum recipe — referencing a CTE six times would
# re-scan six times), while the oracle unions six scans (DuckDB has
# no stack; its scans are cheap and the VALUES are what's compared).
#
# min/max aggregate on the NATIVE (or fixed-scale decimal / date)
# column and canonicalize to string AFTER the reduction — round-10
# advice caught the earlier MIN(CAST(c AS STRING)) form reporting
# lexicographic extremes on numeric columns (max o_orderkey '9999'
# when the true max was 14999).  Each entry is (column, inner
# aggregand, outer string canonicalizer over the aggregate result).
_PROF_COLS = (
    ("o_orderkey", "{c}", "CAST({v} AS {ST})"),
    ("o_custkey", "{c}", "CAST({v} AS {ST})"),
    ("o_orderstatus", "{c}", "{v}"),
    ("o_totalprice", "CAST({c} AS DECIMAL(18,2))", "CAST({v} AS {ST})"),
    ("o_orderdate", "CAST({c} AS DATE)", "{DFMT}"),
    ("o_orderpriority", "{c}", "{v}"),
)


def _prof_exprs(spark_side: bool, with_distinct: bool = True) -> list[str]:
    st = "STRING" if spark_side else "VARCHAR"
    out = []
    for c, inner, canon in _PROF_COLS:
        agg_in = inner.format(c=c)

        def _canon(v: str) -> str:
            dfmt = (
                f"date_format({v}, 'yyyy-MM-dd')"
                if spark_side
                else f"strftime({v}, '%Y-%m-%d')"
            )
            return canon.format(v=v, ST=st, DFMT=dfmt)

        nd = (
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}, "
            if with_distinct
            else ""
        )
        out.append(
            f"CAST(COUNT({c}) AS BIGINT) AS nn_{c}, "
            f"{nd}"
            f"{_canon(f'MIN({agg_in})')} AS mn_{c}, "
            f"{_canon(f'MAX({agg_in})')} AS mx_{c}"
        )
    return out


def _prof_oracle() -> str:
    selects = []
    for c, _, _ in _PROF_COLS:
        selects.append(
            f"""
SELECT '{c}' AS col, (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) - nn_{c} AS n_null,
       nd_{c} AS n_distinct, mn_{c} AS min_s, mx_{c} AS max_s
FROM (SELECT {", ".join(e for e in _prof_exprs(False))} FROM orders) t"""
        )
    return " UNION ALL ".join(selects)


@register("dq_column_profile", oracle=_prof_oracle())
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile of orders — rows, null count, EXACT
    distinct count, canonical min/max — the first query every ingest
    pipeline runs on an unknown 100 TB delivery (cardinality drives
    join strategy, null rates drive constraint checks, min/max seed
    manifest pruning).

    Exactness: counts are exact (the distinct counts deliberately
    exact, not HLL — this is the audit of record; approximate twins
    exist under agg_approx_distinct); min/max aggregate on the NATIVE
    column (fixed-scale decimal for prices, DATE for dates) so the
    extremes are true numeric/temporal extremes, then canonicalize
    the 1-row result to engine-portable strings AFTER the reduction.

    Engine shape: TWO passes, measured, not assumed (round-10 verdict
    item 7): pass 1 is the six exact COUNT(DISTINCT)s as one Expand +
    two-level agg (the agg_multi_distinct mechanism — ONE scan for
    all six, never six jobs); pass 2 is a plain single-level
    aggregate for rows/nulls/min/max with NO Expand.  The previous
    single-scan form fanned the 13 plain aggregates through the x7
    Expand too — scripts/profile_cost_check.py measured that at
    4.11 s vs 1.58 s for this split at sf0.1 (4.43 vs 3.10 at 10x
    orders; PLANS.md), so the second scan is cheaper than hauling
    every plain aggregate through the fan-out at every scale tested.
    The two 1-row aggregates broadcast-join and stack() fans the
    per-column report AFTER the reductions (plan-gated: exactly two
    scans, exactly one Expand)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "p23_prof_orders"
    )
    nd_aggs = ", ".join(
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}"
        for c, _, _ in _PROF_COLS
    )
    plain_aggs = ", ".join(_prof_exprs(True, with_distinct=False))
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c, _, _ in _PROF_COLS
    )
    return spark.sql(
        f"""
WITH nd AS (SELECT {nd_aggs} FROM p23_prof_orders),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, {plain_aggs}
      FROM p23_prof_orders)
SELECT col, n_rows, n_rows - nn AS n_null, nd AS n_distinct,
       mn AS min_s, mx AS max_s
FROM (
  SELECT n_rows,
         stack({len(_PROF_COLS)}, {stack_args}) AS (col, nn, nd, mn, mx)
  FROM a JOIN nd ON true
)"""
    )
