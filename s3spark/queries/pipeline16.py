"""Round-7 batch ten: the remaining classical two-sample / correlation
statistics plus a PORTABLE hand-rolled HyperLogLog — the statistical
toolbox a training-data pipeline runs between corpus snapshots and an
analytics stack runs between cohorts, each with a FULL DuckDB value
oracle.

- ``stats_welch_ttest``: Welch's unequal-variance t-test from exact
  decimal power sums; the entire float tail is a SHARED expression
  text evaluated on bit-identical operands by both engines.
- ``stats_mann_whitney_u``: rank-sum test with exact tie handling —
  doubled midranks stay integral, the global rank prefix sums use the
  two-level bucket scheme (never a single-partition sort), and the
  tie-corrected normal approximation shares its expression text.
- ``stats_spearman_corr``: Spearman rank correlation via doubled
  midranks for both columns and an exact-integer Pearson fold.
- ``agg_hll_hand_portable``: a hand-rolled 256-register HyperLogLog
  over the portable md5 hash — unlike the engine-private Spark HLL++
  (`agg_approx_distinct` / `agg_hll_partitioned_union`, SURVEY §2.3
  impossibility notes), every register value is deterministic on both
  engines, so the sketch build, the per-group estimates, the REGISTER
  MERGE (max per register), and the small-range linear-counting branch
  all carry a full value oracle — the same oracle upgrade
  `sim_ann_lsh_hand` gave the ANN surface.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections D/H
per the north star's analytics + training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# stats_welch_ttest
# --------------------------------------------------------------------------

# The float tail is ONE shared expression text over the exact integer
# columns (n1,n2 BIGINT; s1,s2,q1,q2,vn1,vd1,vn2,vd2 exact decimal /
# HUGEINT): both engines perform the identical sequence of
# correctly-rounded casts and IEEE divisions, so every double output is
# bit-identical (the stats_ab_proportion_ztest recipe).
_W_M1 = "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
_W_M2 = "CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)"
# Degenerate-denominator guards (found by the hypothesis differential
# tests; unreachable at any fixture SF): a single-row cohort makes the
# sample variance 0/0 (vd = n*(n-1) = 0), and two zero-variance
# cohorts zero t's denominator.  DuckDB's float division returns NULL
# and ANSI Spark throws DIVIDE_BY_ZERO; the shared text takes explicit
# NaN / signed-Infinity branches on both engines instead (0 * inf is
# NaN on both, so equal-mean zero-variance cohorts land on NaN).
_W_V1 = (
    "(CASE WHEN vd1 = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE CAST(vn1 AS DOUBLE) / CAST(vd1 AS DOUBLE) END)"
)
_W_V2 = (
    "(CASE WHEN vd2 = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE CAST(vn2 AS DOUBLE) / CAST(vd2 AS DOUBLE) END)"
)
_W_A1 = f"(({_W_V1}) / CAST(n1 AS DOUBLE))"
_W_A2 = f"(({_W_V2}) / CAST(n2 AS DOUBLE))"
_W_T = (
    f"(CASE WHEN ({_W_A1} + {_W_A2}) = 0.0 "
    f"THEN (({_W_M1}) - ({_W_M2})) * CAST('Infinity' AS DOUBLE) "
    f"ELSE (({_W_M1}) - ({_W_M2})) / sqrt({_W_A1} + {_W_A2}) END)"
)
_W_DOF = (
    f"(CASE WHEN n1 <= 1 OR n2 <= 1 OR ({_W_A1} + {_W_A2}) = 0.0 "
    f"THEN CAST('NaN' AS DOUBLE) "
    f"ELSE (({_W_A1} + {_W_A2}) * ({_W_A1} + {_W_A2})) / "
    f"(({_W_A1} * {_W_A1}) / CAST(n1 - 1 AS DOUBLE) + "
    f"({_W_A2} * {_W_A2}) / CAST(n2 - 1 AS DOUBLE)) END)"
)

_WELCH_TAIL = (
    "n1",
    "n2",
    f"CAST({_W_M1} AS DOUBLE) AS mean1",
    f"CAST({_W_M2} AS DOUBLE) AS mean2",
    f"CAST({_W_V1} AS DOUBLE) AS var1",
    f"CAST({_W_V2} AS DOUBLE) AS var2",
    f"CAST({_W_T} AS DOUBLE) AS t_stat",
    f"CAST({_W_DOF} AS DOUBLE) AS dof_welch",
    # an undefined statistic is NOT significant (both engines would
    # otherwise agree on the misleading NaN > 1.96 = true)
    f"CAST(CASE WHEN isnan({_W_T}) THEN 0 "
    f"WHEN abs({_W_T}) > 1.959964 THEN 1 ELSE 0 END AS BIGINT)"
    " AS sig_95",
)

_WELCH_ORACLE = f"""
WITH v AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders
),
g AS (
  SELECT is_a, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s,
         CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS q
  FROM v GROUP BY is_a
),
f AS (
  SELECT MAX(CASE WHEN is_a = 1 THEN n END) AS n1,
         MAX(CASE WHEN is_a = 1 THEN s END) AS s1,
         MAX(CASE WHEN is_a = 1 THEN q END) AS q1,
         MAX(CASE WHEN is_a = 0 THEN n END) AS n2,
         MAX(CASE WHEN is_a = 0 THEN s END) AS s2,
         MAX(CASE WHEN is_a = 0 THEN q END) AS q2
  FROM g
),
e AS (
  SELECT n1, n2, s1, s2,
         CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS vn1,
         CAST(n1 AS HUGEINT) * (n1 - 1) AS vd1,
         CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS vn2,
         CAST(n2 AS HUGEINT) * (n2 - 1) AS vd2
  FROM f
)
SELECT {", ".join(_WELCH_TAIL)} FROM e
"""


@register("stats_welch_ttest", oracle=_WELCH_ORACLE)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the order-value
    distributions of urgent vs non-urgent orders, with the
    Welch-Satterthwaite degrees of freedom.

    Exactness: per-cohort n, Σx, Σx² are exact integers (x² reaches
    ~3.6·10¹⁵ per row, summed ~5·10²⁴ at sf1 — decimal(38,0)/HUGEINT);
    sample variance = (n·Σx² − (Σx)²) / (n·(n−1)) keeps numerator and
    denominator exact, so the float tail (means, variances, t, dof) is
    a SHARED expression text over bit-identical operands — only casts,
    IEEE divisions, and one sqrt, all correctly rounded on both
    engines.  The z-scale critical value 1.959964 enters as a literal
    (dof is ~n at this scale).

    Engine shape: one scan → ONE map-side-combined reduction to two
    cohort rows → conditional-aggregate pivot to a single row.  No
    join, no window, no shuffle beyond the 2-group aggregation —
    the cheapest possible distributed shape for a two-sample test."""
    orders = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderpriority")
    v = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("x"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
    )
    d19 = "decimal(19,0)"
    g = v.groupBy("is_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d19)).cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    big = "decimal(38,0)"
    f = g.agg(
        F.max(F.when(F.col("is_a") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("is_a") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("is_a") == 1, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("is_a") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("is_a") == 0, F.col("s"))).alias("s2"),
        F.max(F.when(F.col("is_a") == 0, F.col("q"))).alias("q2"),
    )
    e = f.select(
        "n1",
        "n2",
        "s1",
        "s2",
        (F.col("n1").cast(big) * F.col("q1") - F.col("s1") * F.col("s1"))
        .cast(big)
        .alias("vn1"),
        (F.col("n1").cast(big) * (F.col("n1") - 1)).cast(big).alias("vd1"),
        (F.col("n2").cast(big) * F.col("q2") - F.col("s2") * F.col("s2"))
        .cast(big)
        .alias("vn2"),
        (F.col("n2").cast(big) * (F.col("n2") - 1)).cast(big).alias("vd2"),
    )
    return e.selectExpr(*_WELCH_TAIL)


# --------------------------------------------------------------------------
# two-level distributed prefix-sum helper (shared by Mann-Whitney,
# Spearman, and pipeline17's theil-sen — lives in _prefix.py so no
# pipeline imports another pipeline's private symbol)
# --------------------------------------------------------------------------

from s3spark.queries._prefix import RANK_NB as _RANK_NB  # noqa: E402
from s3spark.queries._prefix import with_cum_less as _with_cum_less  # noqa: E402


# --------------------------------------------------------------------------
# stats_mann_whitney_u
# --------------------------------------------------------------------------

# Shared float tail over exact columns (na, nb, n, u2 = 2·U_A,
# t3 = Σ(t³−t)).  Doubled midranks keep every rank integral under ties.
_MW_UD = "(CAST(u2 AS DOUBLE) / 2.0)"
_MW_MU = "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)"
_MW_SG = (
    "sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0) * "
    "((CAST(n AS DOUBLE) + 1.0) - CAST(t3 AS DOUBLE) / "
    "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))"
)
# Degenerate-denominator guards (found by the hypothesis differential
# tests; unreachable at any fixture SF): an empty cohort (na*nb = 0)
# or a single total row (the tie term divides by n*(n-1)) or an
# all-tied corpus (sigma = 0 — and sigma = 0 forces U = mu, so the
# ratio is 0/0) leave z undefined.  DuckDB's float division returns
# NULL and ANSI Spark throws DIVIDE_BY_ZERO; the shared text takes an
# explicit NaN branch on both engines instead.  The n <= 1 / na*nb = 0
# WHENs must precede the sigma WHEN: evaluating sigma itself divides
# by n*(n-1).
_MW_Z = (
    f"(CASE WHEN n <= 1 OR na * nb = 0 THEN CAST('NaN' AS DOUBLE) "
    f"WHEN ({_MW_SG}) = 0.0 THEN CAST('NaN' AS DOUBLE) "
    f"ELSE (({_MW_UD}) - ({_MW_MU})) / ({_MW_SG}) END)"
)
_MW_RB = (
    "(CASE WHEN na * nb = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE 1.0 - CAST(u2 AS DOUBLE) / "
    "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END)"
)

_MW_TAIL = (
    "na",
    "nb",
    "n_cells",
    f"CAST({_MW_UD} AS DOUBLE) AS u_stat",
    f"CAST({_MW_Z} AS DOUBLE) AS z",
    f"CAST({_MW_RB} AS DOUBLE) AS rank_biserial",
    # an undefined statistic is NOT significant (both engines would
    # otherwise agree on the misleading NaN > 1.96 = true)
    f"CAST(CASE WHEN isnan({_MW_Z}) THEN 0 "
    f"WHEN abs({_MW_Z}) > 1.959964 THEN 1 ELSE 0 END AS BIGINT)"
    " AS sig_95",
)

_MW_ORACLE = f"""
WITH v AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders
),
cell AS (
  SELECT v, CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM v GROUP BY v
),
w AS (
  SELECT ca, cb, cnt,
         COALESCE(CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
           PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cl
  FROM cell
),
f AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(CAST(ca AS HUGEINT)
                  * (2 * CAST(cl AS HUGEINT) + cnt + 1)) AS HUGEINT) AS r2a,
         CAST(SUM(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS HUGEINT) AS t3
  FROM w
),
e AS (
  SELECT na, nb, na + nb AS n, n_cells,
         r2a - CAST(na AS HUGEINT) * (na + 1) AS u2, t3
  FROM f
)
SELECT {", ".join(_MW_TAIL)} FROM e
"""


@register("stats_mann_whitney_u", oracle=_MW_ORACLE)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (urgent vs non-urgent order
    values) with exact tie handling and the tie-corrected normal
    approximation — the distribution-free sibling of the Welch test.

    Exactness: midranks under ties are kept integral by DOUBLING
    (rank2(v) = 2·cum_less + cnt + 1), so 2·R_A = Σ ca·rank2 and
    2·U_A = 2·R_A − n_A(n_A+1) are EXACT decimal(38,0)/HUGEINT sums;
    the tie-correction term Σ(t³−t) is an exact integer; the float
    tail (U, z with tie-corrected σ, rank-biserial effect size) shares
    its expression text between engines — casts, divisions, one sqrt.

    Engine shape: rows pre-aggregate to per-distinct-value cells in
    one distinct-bounded map-side-combined shuffle; the global rank
    prefix sums reuse the two-level bucket scheme (per-bucket windows
    + a ≤64-row broadcast offset table — NEVER a single-partition
    sort); the final fold is one constant-width reduction.  The
    oracle's direct single-window formulation proves the two-level
    scheme exact."""
    orders = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderpriority")
    v = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
    )
    cells = v.groupBy("v").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("cb"),
        F.count(F.lit(1)).alias("cnt"),
    )
    c2 = _with_cum_less(spark, cells, "mwu")
    big = "decimal(38,0)"
    f = c2.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(
            (
                F.col("ca").cast(big)
                * (F.lit(2) * F.col("cum_less") + F.col("cnt") + 1)
            ).cast(big)
        )
        .cast(big)
        .alias("r2a"),
        F.sum(
            (
                F.col("cnt").cast(big) * F.col("cnt") * F.col("cnt")
                - F.col("cnt")
            ).cast(big)
        )
        .cast(big)
        .alias("t3"),
    )
    e = f.select(
        "na",
        "nb",
        (F.col("na") + F.col("nb")).alias("n"),
        "n_cells",
        (F.col("r2a") - F.col("na").cast(big) * (F.col("na") + 1))
        .cast(big)
        .alias("u2"),
        "t3",
    )
    return e.selectExpr(*_MW_TAIL)


# --------------------------------------------------------------------------
# stats_spearman_corr
# --------------------------------------------------------------------------

# A CONSTANT column (d1 or d2 = 0, num then 0 too) makes rho 0/0:
# DuckDB's float division returns NULL while ANSI Spark (the Spark 4
# default) throws DIVIDE_BY_ZERO — neither is the IEEE NaN the
# statistic calls for, so the shared text takes an explicit NaN
# branch on both engines.  Unreachable at any fixture SF; defensive
# for real deployments.
_SP_RHO = (
    "(CASE WHEN CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE) = 0.0 "
    "THEN CAST('NaN' AS DOUBLE) "
    "ELSE CAST(num AS DOUBLE) / sqrt(CAST(d1 AS DOUBLE) * CAST(d2 AS DOUBLE))"
    " END)"
)
# Perfect rank correlation (rho = +/-1, e.g. tiny tied batches)
# zeroes the 1 - rho^2 denominator: DuckDB's float division returns
# NULL but ANSI Spark (the Spark 4 default) throws DIVIDE_BY_ZERO —
# found by the hypothesis differential test, impossible on the
# fixture (rho ~= 0.997).  The CASE branch is part of the SHARED
# expression text, so both engines take the same +/-Infinity path at
# |rho| = 1 (the statistic's true limit).
_SP_T = (
    f"(CASE WHEN abs({_SP_RHO}) >= 1.0 "
    f"THEN ({_SP_RHO}) * CAST('Infinity' AS DOUBLE) "
    f"ELSE ({_SP_RHO}) * sqrt((CAST(n AS DOUBLE) - 2.0) / "
    f"(1.0 - ({_SP_RHO}) * ({_SP_RHO}))) END)"
)

_SP_TAIL = (
    "n AS n_rows",
    "ndx AS n_distinct_x",
    "ndy AS n_distinct_y",
    f"CAST({_SP_RHO} AS DOUBLE) AS rho_spearman",
    f"CAST({_SP_T} AS DOUBLE) AS t_stat",
    # an undefined statistic is NOT significant (both engines would
    # otherwise agree on the misleading NaN > 1.96 = true)
    f"CAST(CASE WHEN isnan({_SP_T}) THEN 0 "
    f"WHEN abs({_SP_T}) > 1.959964 THEN 1 ELSE 0 END AS BIGINT)"
    " AS sig_95",
)

_SP_ORACLE = f"""
WITH r AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))
         * (100 + CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT)) AS y
  FROM lineitem
),
cx AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY x),
wx AS (
  SELECT v, 2 * COALESCE(CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN
           UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           + cnt + 1 AS r2
  FROM cx
),
cy AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM r GROUP BY y),
wy AS (
  SELECT v, 2 * COALESCE(CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN
           UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           + cnt + 1 AS r2
  FROM cy
),
j AS (
  SELECT wx.r2 AS rx, wy.r2 AS ry
  FROM r JOIN wx ON r.x = wx.v JOIN wy ON r.y = wy.v
),
f AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT rx) AS BIGINT) AS ndx,
         CAST(COUNT(DISTINCT ry) AS BIGINT) AS ndy,
         CAST(SUM(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy,
         CAST(SUM(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy
  FROM j
),
e AS (
  SELECT n, ndx, ndy,
         CAST(n AS HUGEINT) * sxy - sx * sy AS num,
         CAST(n AS HUGEINT) * sxx - sx * sx AS d1,
         CAST(n AS HUGEINT) * syy - sy * sy AS d2
  FROM f
)
SELECT {", ".join(_SP_TAIL)} FROM e
"""


@register("stats_spearman_corr", oracle=_SP_ORACLE)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem extended price and
    the TPC-H Q1 gross charge ext·(1−disc)·(1+tax), kept exact in
    integer units of 10⁻⁶ dollars (discount/tax are whole percents in
    the fixture, so (100−d)·(100+t) is integral) — strongly positive
    by construction (ρ≈0.997) but reshuffled by the ±10% discount/tax
    noise, so the rank machinery is exercised non-trivially.  (The
    fixture generator draws all raw columns independently — measured
    |ρ|<0.02 for every natural pair — hence the derived pair.)

    Exactness: both columns rank via DOUBLED midranks (integral under
    ties), Pearson's formula on the integer ranks uses exact
    decimal(38,0)/HUGEINT power sums (n·Σxy − ΣxΣy etc. — Spearman is
    invariant to the ×2 rank scaling), and the float tail is one
    shared expression text: two casts, one sqrt, one division.  The
    decimal(38,0) fold bound holds beyond sf1000 (rank ≤ 2n ≈ 1.2·10¹⁰
    at 100 TB; n·Σrx·ry ≈ 10³³ < 10³⁸).

    Engine shape (round-12 rewrite): rows are ranked DIRECTLY in
    per-bucket windows — rank() gives the in-bucket strictly-smaller
    count, a RANGE(0,0) frame counts peers, and a ≤64-row broadcast
    bucket-offset table globalizes the prefix — so the doubled midrank
    is ``2·(offset + rank − 1) + peers + 1`` computed in ONE window
    pass per column over the checkpointed 2-column row table.  The
    previous shape built two per-distinct-value cell tables, ranked
    those with the prefix helper, and hash-joined the near-unique
    (~594k distinct of 600k rows at sf0.1) rank maps BACK onto the
    rows — two fact-sized shuffle joins the window form simply does
    not have; the interleaved A/B measured ~2.1× with bit-identical
    output.  Distinct counts ride the same windows (exactly one row
    per peer group satisfies row_number == rank), so no
    COUNT(DISTINCT) Expand and no extra pass.  The fold is a
    constant-width reduction."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_discount", "l_tax"
    )
    # localCheckpoint, not parquet scratch (round-12): the 2-column
    # integer row table is an intra-query intermediate with multiple
    # consumers (window chain + two bucket-total aggregates); the
    # parquet round-trip cost ~1.3 s at sf0.1 for the same lineage cut
    # the checkpoint provides from the block manager.
    r = li.selectExpr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))"
        " * (100 + CAST(CAST(l_tax AS DECIMAL(12,2)) * 100 AS BIGINT)) AS y",
    ).localCheckpoint()

    def rank_pass(rows: DataFrame, col: str, bkt: str) -> DataFrame:
        """Append doubled-midrank ``r_<col>`` and peer-group-first
        flag ``first_<col>`` via the two-level bucket scheme applied
        to the ROW table: bucket ids from the 1-row min/max broadcast
        (the same guarded division-only formula as with_cum_less),
        per-bucket rank/peer-count windows, global offsets from a
        ≤64-row broadcast.  Bucket totals always aggregate the
        checkpointed base ``r`` (never ``rows``, which on the second
        call already carries the first column's window pass —
        aggregating it would replay that pass)."""
        stats = r.agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        guard = (
            "CASE WHEN try_subtract(hi, lo) IS NULL"
            " OR try_subtract(hi, lo) < 0 THEN CAST(raise_error("
            "'stats_spearman_corr: value spread exceeds BIGINT — "
            "quantize more coarsely before ranking') AS BIGINT) "
            f"ELSE ({col} - lo) div ((hi - lo) div {_RANK_NB} + 1) END"
            f" AS {bkt}"
        )
        btot = (
            r.crossJoin(F.broadcast(stats))
            .selectExpr(guard)
            .groupBy(bkt)
            .agg(F.count(F.lit(1)).alias("tc"))
        )
        woff = Window.orderBy(bkt).rowsBetween(Window.unboundedPreceding, -1)
        off = btot.select(
            bkt, F.coalesce(F.sum("tc").over(woff), F.lit(0)).alias("offc")
        )
        w = Window.partitionBy(bkt).orderBy(col)
        wpeer = w.rangeBetween(0, 0)
        return (
            rows.crossJoin(F.broadcast(stats))
            .selectExpr("*", guard)
            .drop("lo", "hi")
            .join(F.broadcast(off), bkt)
            .select(
                "*",
                (
                    F.lit(2) * (F.col("offc") + F.rank().over(w) - 1)
                    + F.count(F.lit(1)).over(wpeer)
                    + 1
                )
                .cast("bigint")
                .alias("r_" + col),
                (F.row_number().over(w) == F.rank().over(w))
                .cast("bigint")
                .alias("first_" + col),
            )
            .drop(bkt, "offc")
        )

    j = rank_pass(rank_pass(r, "x", "bx"), "y", "by").select(
        F.col("r_x").alias("rx"),
        F.col("r_y").alias("ry"),
        "first_x",
        "first_y",
    )
    big = "decimal(38,0)"
    f = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("first_x"), F.lit(0)).cast("bigint").alias("ndx"),
        F.coalesce(F.sum("first_y"), F.lit(0)).cast("bigint").alias("ndy"),
        F.sum(F.col("rx").cast(big)).cast(big).alias("sx"),
        F.sum(F.col("ry").cast(big)).cast(big).alias("sy"),
        F.sum((F.col("rx").cast(big) * F.col("rx")).cast(big)).cast(big).alias("sxx"),
        F.sum((F.col("ry").cast(big) * F.col("ry")).cast(big)).cast(big).alias("syy"),
        F.sum((F.col("rx").cast(big) * F.col("ry")).cast(big)).cast(big).alias("sxy"),
    )
    e = f.select(
        "n",
        "ndx",
        "ndy",
        (F.col("n").cast(big) * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast(big)
        .alias("num"),
        (F.col("n").cast(big) * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast(big)
        .alias("d1"),
        (F.col("n").cast(big) * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast(big)
        .alias("d2"),
    )
    return e.selectExpr(*_SP_TAIL)


# --------------------------------------------------------------------------
# agg_hll_hand_portable
# --------------------------------------------------------------------------

# m = 256 registers (p = 8 index bits), 52-bit rho field from a 60-bit
# (15 hex chars) portable md5 hash.  alpha_m·m²·2⁵³ pre-multiplied into
# ONE double literal (both engines parse the same decimal literal to
# the same double; writing the product avoids multiply-order
# divergence): 0.7213/(1+1.079/256) · 256² · 2⁵³.
_HLL_IDX_DIV = 4503599627370496  # 2^52
_HLL_P53 = 9007199254740992  # 2^53
_HLL_NUM = "4.2399330249068963e20"

_HLL_RAW = f"({_HLL_NUM} / CAST(s AS DOUBLE))"
# small-range (linear counting) branch: raw ≤ 2.5·m and empty registers
# exist.  ln runs on identical operands; the estimate is lifted through
# decimal(25,6) so a last-ulp libm divergence cannot reach the hash.
_HLL_EST = (
    f"CASE WHEN ({_HLL_RAW}) <= 640.0 AND v_zero > 0 "
    f"THEN 256.0 * ln(CAST(256 AS DOUBLE) / CAST(v_zero AS DOUBLE)) "
    f"ELSE ({_HLL_RAW}) END"
)

_HLL_ORACLE = f"""
WITH src AS (
  SELECT concat('ord:', o_orderpriority) AS grp,
         CAST(o_custkey AS VARCHAR) AS e
  FROM orders
  UNION ALL
  SELECT concat('brand:', split_part(p_type, ' ', 1)) AS grp,
         p_brand AS e FROM part
),
r AS (
  SELECT grp,
         CAST(concat('0x', substr(md5(e), 1, 15)) AS BIGINT) AS h
  FROM src
),
d AS (
  SELECT grp, h // {_HLL_IDX_DIV} AS idx, h % {_HLL_IDX_DIV} AS rest FROM r
),
rr AS (
  SELECT grp, idx,
         CASE WHEN rest = 0 THEN 53 ELSE 53 - length(bin(rest)) END AS rho
  FROM d
),
regs AS (SELECT grp, idx, MAX(rho) AS m FROM rr GROUP BY grp, idx),
allregs AS (
  SELECT grp, idx, m FROM regs
  UNION ALL
  SELECT 'ord:ALL' AS grp, idx, MAX(m) AS m
  FROM regs WHERE grp LIKE 'ord:%' GROUP BY idx
),
st AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS hits,
         CAST(SUM(CAST(1 AS BIGINT) << (53 - m)) AS BIGINT) AS sp
  FROM allregs GROUP BY grp
),
es AS (
  SELECT grp, 256 - hits AS v_zero,
         (256 - hits) * {_HLL_P53} + sp AS s
  FROM st
),
est AS (
  SELECT grp, v_zero,
         CAST(CAST(({_HLL_EST}) AS DECIMAL(25,6)) AS DOUBLE) AS est_distinct
  FROM es
),
ex AS (
  SELECT concat('ord:', COALESCE(o_orderpriority, 'ALL')) AS grp,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY ROLLUP(o_orderpriority)
  UNION ALL
  SELECT concat('brand:', split_part(p_type, ' ', 1)) AS grp,
         CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS exact_distinct
  FROM part GROUP BY split_part(p_type, ' ', 1)
)
SELECT est.grp, v_zero, est_distinct, exact_distinct,
       CAST(CAST(abs(est_distinct - CAST(exact_distinct AS DOUBLE))
                 / CAST(exact_distinct AS DOUBLE) AS DECIMAL(25,6))
            AS DOUBLE) AS rel_err
FROM est JOIN ex ON est.grp = ex.grp
ORDER BY est.grp
"""


@register("agg_hll_hand_portable", oracle=_HLL_ORACLE)
def agg_hll_hand_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled 256-register HyperLogLog with a FULL value oracle —
    the portable twin of the engine-private Spark HLL++ keys
    (`agg_approx_distinct`, `agg_hll_partitioned_union`): the hash is
    the repo's deterministic md5 recipe, so register contents, the
    per-group estimates, the REGISTER MERGE (max per register — the
    mergeability that makes sketches the 100 TB distinct story), and
    the small-range linear-counting branch are all bit-reproducible on
    both engines.

    Two cardinality regimes exercise both estimator branches:
    distinct customers per order priority (~1,300 at sf0.01 — raw HLL
    path, plus the merged 'ord:ALL' row proving max-merge) and
    distinct brands per part-type family (25 — the V>0 linear-counting
    branch fires).

    Exactness: idx = top 8 bits, rho = leading zeros of the 52-bit
    remainder + 1 via integer string length (length(bin(x)) =
    ⌊log₂x⌋+1 — string ops, no libm); the harmonic sum Σ2^(−M_j) is
    kept EXACT by scaling to the integer Σ2^(53−M_j) ≤ 256·2⁵³ <
    2⁶³; α·m²·2⁵³ enters as ONE shared double literal; the ln of the
    linear-counting branch runs on identical operands and the estimate
    is lifted through decimal(25,6) (the PSI recipe).

    Engine shape: one scan of each input → row-local register
    coordinates → ONE map-side-combined shuffle to ≤256·groups
    register rows (materialized once — the merge row is a second
    consumer); everything after runs on register tables.  The exact
    side is a single rollup scan, joined on ≤11 group labels."""
    orders = table(spark, sf_dir, "orders").select("o_orderpriority", "o_custkey")
    part = table(spark, sf_dir, "part").select("p_type", "p_brand")
    src = orders.selectExpr(
        "concat('ord:', o_orderpriority) AS grp",
        "CAST(o_custkey AS STRING) AS e",
    ).unionByName(
        part.selectExpr(
            "concat('brand:', split_part(p_type, ' ', 1)) AS grp", "p_brand AS e"
        )
    )
    d = src.selectExpr(
        "grp",
        "CAST(conv(substr(md5(CAST(e AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS h",
    ).selectExpr(
        "grp",
        f"h div {_HLL_IDX_DIV} AS idx",
        f"h % {_HLL_IDX_DIV} AS rest",
    )
    rr = d.selectExpr(
        "grp",
        "idx",
        "CASE WHEN rest = 0 THEN 53 ELSE 53 - length(bin(rest)) END AS rho",
    )
    # localCheckpoint, not parquet scratch (round-12): same lineage
    # break for the multi-consumer register table, no disk round-trip.
    regs = (
        rr.groupBy("grp", "idx").agg(F.max("rho").alias("m")).localCheckpoint()
    )
    merged = (
        regs.where(F.col("grp").like("ord:%"))
        .groupBy("idx")
        .agg(F.max("m").alias("m"))
        .select(F.lit("ord:ALL").alias("grp"), "idx", "m")
    )
    st = (
        regs.select("grp", "idx", "m")
        .unionByName(merged)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("hits"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - m)"))
            .cast("bigint")
            .alias("sp"),
        )
    )
    es = st.selectExpr(
        "grp",
        "256 - hits AS v_zero",
        f"(256 - hits) * {_HLL_P53} + sp AS s",
    )
    est = es.selectExpr(
        "grp",
        "v_zero",
        f"CAST(CAST(({_HLL_EST}) AS DECIMAL(25,6)) AS DOUBLE) AS est_distinct",
    )
    ex = (
        orders.rollup("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("exact_distinct"))
        .selectExpr(
            "concat('ord:', COALESCE(o_orderpriority, 'ALL')) AS grp",
            "exact_distinct",
        )
        .unionByName(
            part.groupBy(
                F.expr("split_part(p_type, ' ', 1)").alias("tg")
            )
            .agg(F.countDistinct("p_brand").alias("exact_distinct"))
            .selectExpr("concat('brand:', tg) AS grp", "exact_distinct")
        )
    )
    return (
        est.join(ex, "grp")
        .selectExpr(
            "grp",
            "v_zero",
            "est_distinct",
            "exact_distinct",
            "CAST(CAST(abs(est_distinct - CAST(exact_distinct AS DOUBLE)) "
            "/ CAST(exact_distinct AS DOUBLE) AS DECIMAL(25,6)) AS DOUBLE) "
            "AS rel_err",
        )
        .orderBy("grp")
    )
