"""Round-6 batch nine: distribution testing / drift detection — the
statistical gates a training-data pipeline runs between corpus
snapshots (did the mix shift?) and an analytics stack runs between
cohorts (are these independent?).

- ``stats_chi2_independence``: Pearson chi-square test of
  independence on the segment × priority contingency table, in exact
  integer arithmetic until one IEEE division per cell.
- ``stats_ks_two_sample``: two-sample Kolmogorov–Smirnov statistic
  over order values (urgent vs non-urgent), with the global CDF
  cumsum computed by the TWO-LEVEL bucket scheme (per-bucket windows
  + a broadcast offset table) — never a single-partition sort.
- ``dq_drift_psi``: Population Stability Index between the two
  cohorts over 10 equi-width bins — the industry drift score —
  via the decimal log-partials recipe.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 section D per
the north star's analytics + training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# stats_chi2_independence
# --------------------------------------------------------------------------

# dof = (5-1)*(5-1) = 16 → chi2 critical value at alpha=0.05 enters as
# a literal (the Benford/NDCG recipe — never a distribution-function
# call whose libm implementation could differ across engines).
_CHI2_CRIT_DOF16 = "26.296228"

_CHI2_ORACLE = f"""
WITH j AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cell AS (
  SELECT seg, pri, CAST(COUNT(*) AS BIGINT) AS o FROM j GROUP BY 1, 2
),
m AS (
  SELECT seg, pri, o,
         CAST(SUM(o) OVER (PARTITION BY seg) AS BIGINT) AS r,
         CAST(SUM(o) OVER (PARTITION BY pri) AS BIGINT) AS c,
         CAST(SUM(o) OVER () AS BIGINT) AS n
  FROM cell
),
t AS (
  SELECT n,
         CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
              * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) AS HUGEINT)
           AS num,
         CAST(CAST(n AS HUGEINT) * r * c AS HUGEINT) AS den
  FROM m
),
s AS (
  SELECT MAX(n) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         SUM(CAST(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                  AS DECIMAL(25,6))) AS chi2_dec
  FROM t
)
SELECT n AS n_obs, n_cells,
       CAST(16 AS BIGINT) AS dof,
       CAST(chi2_dec AS DOUBLE) AS chi2,
       CAST(CASE WHEN CAST(chi2_dec AS DOUBLE) > {_CHI2_CRIT_DOF16}
                 THEN 1 ELSE 0 END AS BIGINT) AS reject_independence_05
FROM s
"""


@register("stats_chi2_independence", oracle=_CHI2_ORACLE)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between customer
    market segment and order priority.

    Exactness: with observed counts o_ij, row totals r_i, column
    totals c_j, and n all exact integers, each cell's term
    (o−e)²/e = (o·n − r·c)² / (n·r·c) — numerator and denominator
    are EXACT products carried in decimal(38,0)/HUGEINT (o·n reaches
    ~2·10¹² per cell at sf1, squared ~5·10²⁴ — far past BIGINT), so
    the only float op per cell is ONE division of two
    correctly-rounded casts; the 25 per-cell terms sum through
    decimal(25,6) partials (order-independent).  The alpha=0.05
    critical value for dof=16 enters as a literal.

    Engine shape: identical to agg_entropy_gini — fact broadcast-
    joins the dim, partial-aggregates to the 25-cell contingency
    table in ONE map-side-combined shuffle, and all marginal windows
    and the final fold run on the bounded 25-row table."""
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    j = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    cell = j.groupBy(
        F.col("c_mktsegment").alias("seg"), F.col("o_orderpriority").alias("pri")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = cell.select(
        "o",
        F.sum("o").over(Window.partitionBy("seg")).alias("r"),
        F.sum("o").over(Window.partitionBy("pri")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    big = "decimal(38,0)"
    t = m.select(
        "n",
        (
            (F.col("o").cast(big) * F.col("n") - F.col("r").cast(big) * F.col("c"))
            * (F.col("o").cast(big) * F.col("n") - F.col("r").cast(big) * F.col("c"))
        ).cast(big).alias("num"),
        (F.col("n").cast(big) * F.col("r") * F.col("c")).cast(big).alias("den"),
    )
    s = t.agg(
        F.max("n").alias("n_obs"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(
            (F.col("num").cast("double") / F.col("den").cast("double")).cast(
                "decimal(25,6)"
            )
        ).alias("chi2_dec"),
    )
    return s.selectExpr(
        "n_obs",
        "n_cells",
        "CAST(16 AS BIGINT) AS dof",
        "CAST(chi2_dec AS DOUBLE) AS chi2",
        f"CAST(CASE WHEN CAST(chi2_dec AS DOUBLE) > {_CHI2_CRIT_DOF16} "
        "THEN 1 ELSE 0 END AS BIGINT) AS reject_independence_05",
    )


# --------------------------------------------------------------------------
# stats_ks_two_sample
# --------------------------------------------------------------------------

_KS_NB = 64  # value-range buckets for the two-level distributed cumsum

# Shared guarded tail (round-9 hypothesis-differential sweep): an
# empty cohort (na*nb = 0) leaves D and the critical value undefined —
# DuckDB's float division returns NULL, ANSI Spark throws
# DIVIDE_BY_ZERO; both engines take the explicit NaN branch instead,
# and an undefined D never flags drift.  One constant feeds the Spark
# selectExpr AND the oracle so the texts cannot drift.
_KS_D = (
    "(CASE WHEN na * nb = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE CAST(dmax AS DOUBLE) "
    "/ (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) END)"
)
_KS_CRIT = (
    "(CASE WHEN na * nb = 0 THEN CAST('NaN' AS DOUBLE) "
    "ELSE 1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) "
    "/ (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) END)"
)
_KS_TAIL = (
    "na",
    "nb",
    "n_cells",
    "at_value",
    f"CAST({_KS_D} AS DOUBLE) AS d_stat",
    f"CAST({_KS_CRIT} AS DOUBLE) AS ks_crit_05",
    f"CAST(CASE WHEN isnan({_KS_D}) THEN 0 "
    f"WHEN ({_KS_D}) > ({_KS_CRIT}) THEN 1 ELSE 0 END AS BIGINT)"
    " AS drift_flag",
)

_KS_ORACLE = f"""
WITH v AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders
),
cell AS (
  SELECT v,
         CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM v GROUP BY v
),
c AS (
  SELECT v,
         CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
         CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
         CAST(SUM(ca) OVER () AS BIGINT) AS na,
         CAST(SUM(cb) OVER () AS BIGINT) AS nb
  FROM cell
),
d AS (
  SELECT v, na, nb,
         abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) AS dscaled
  FROM c
),
mx AS (SELECT MAX(dscaled) AS dmax FROM d),
arg AS (
  SELECT MIN(v) AS at_value FROM d, mx WHERE d.dscaled = mx.dmax
),
s AS (
  SELECT MAX(na) AS na, MAX(nb) AS nb,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM d
)
SELECT {", ".join(_KS_TAIL)}
FROM s, mx, arg
"""


@register("stats_ks_two_sample", oracle=_KS_ORACLE)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the order-value
    distributions of urgent vs non-urgent orders — the drift test a
    data pipeline runs between corpus/cohort snapshots.

    Exactness: D = max_v |F_A(v) − F_B(v)| is maximized over the
    SCALED integer |cumA·n_B − cumB·n_A| (no float enters the argmax
    at all); the reported D is then one division of exact integers,
    and the alpha=0.05 critical value c(α)=1.358 enters as a literal
    with the same IEEE sqrt expression on both engines.  The argmax
    value ties break to MIN(v).

    Engine shape (the agg_weighted_median / systematic-sample
    two-level scheme): rows pre-aggregate to (value → countA,
    countB) cells in one distinct-bounded shuffle; the global CDF
    cumsum is computed PER VALUE-RANGE BUCKET (deterministic buckets
    from the min/max of the 1-row stats broadcast — a COLUMN
    property, not a partition id, so it is partition-count-
    independent) with a 64-row broadcast offset table carrying the
    prefix totals — there is NO single-partition sort over the cell
    table at any point.  The oracle uses the direct single-window
    formulation; equality of the two IS the two-level scheme's
    correctness proof."""
    orders = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderpriority")
    v = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
    )
    # Materialize the distinct-value cell table: it is consumed by the
    # bucket-stats aggregate, the per-bucket windows, AND the bucket
    # totals — Spark plans are trees, so without the lineage break the
    # fact would be scanned once per consumer (pagerank lesson).
    # localCheckpoint, not parquet scratch (round-12): block-manager
    # materialization drops the write job + disk round-trip.
    cell = (
        v.groupBy("v")
        .agg(
            F.sum("is_a").cast("bigint").alias("ca"),
            F.sum(1 - F.col("is_a")).cast("bigint").alias("cb"),
        )
        .localCheckpoint()
    )
    # 1-row value-range stats → deterministic bucket id per cell
    # (integer `div` on both engines — CAST(double) rounds on DuckDB
    # and truncates on Spark, the known binning gotcha)
    stats = cell.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    withb = cell.crossJoin(F.broadcast(stats)).selectExpr(
        "v",
        "ca",
        "cb",
        "na",
        "nb",
        f"least(CAST({_KS_NB - 1} AS BIGINT), "
        f"((v - lo) * {_KS_NB}) div (hi - lo + 1)) AS bkt",
    )
    wb = Window.partitionBy("bkt").orderBy("v")
    local = withb.select(
        "v",
        "na",
        "nb",
        "bkt",
        F.sum("ca").over(wb).alias("la"),
        F.sum("cb").over(wb).alias("lb"),
    )
    # NB-row bucket totals → unpartitioned prefix sums over ≤NB rows
    btot = withb.groupBy("bkt").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = btot.select(
        "bkt",
        F.coalesce(F.sum("ta").over(woff), F.lit(0)).alias("offa"),
        F.coalesce(F.sum("tb").over(woff), F.lit(0)).alias("offb"),
    )
    big = "decimal(38,0)"
    # Materialize the per-value scaled-diff table for the same reason:
    # the max, argmax, and summary aggregates all consume it (same
    # localCheckpoint-over-parquet swap).
    d = (
        local.join(F.broadcast(off), "bkt")
        .select(
            "v",
            "na",
            "nb",
            F.abs(
                (F.col("offa") + F.col("la")).cast(big) * F.col("nb")
                - (F.col("offb") + F.col("lb")).cast(big) * F.col("na")
            ).alias("dscaled"),
        )
        .localCheckpoint()
    )
    mx = d.agg(F.max("dscaled").alias("dmax"))
    arg = (
        d.crossJoin(F.broadcast(mx))
        .where(F.col("dscaled") == F.col("dmax"))
        .agg(F.min("v").alias("at_value"))
    )
    s = d.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    return (
        s.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(arg))
        .selectExpr(*_KS_TAIL)
    )


# --------------------------------------------------------------------------
# dq_drift_psi
# --------------------------------------------------------------------------

_PSI_NB = 10

_PSI_ORACLE = f"""
WITH v AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders
),
mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM v),
b AS (
  SELECT LEAST({_PSI_NB} - 1,
               ((v - lo) * {_PSI_NB}) // (hi - lo + 1)) AS bin,
         is_a
  FROM v, mm
),
cnt AS (
  SELECT bin,
         CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(1 - is_a) AS BIGINT) AS cb
  FROM b GROUP BY bin
),
t AS (
  SELECT bin, ca, cb,
         CAST(SUM(ca) OVER () AS BIGINT) AS na,
         CAST(SUM(cb) OVER () AS BIGINT) AS nb
  FROM cnt
),
term AS (
  SELECT bin, ca, cb, na, nb,
         CASE WHEN na = 0 OR nb = 0 THEN CAST(NULL AS DECIMAL(25,6))
              ELSE CAST((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                    - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                   * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                        / (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)))
                   AS DECIMAL(25,6)) END AS psi_term
  FROM t
)
SELECT bin, ca AS n_a, cb AS n_b,
       CAST(psi_term AS DOUBLE) AS psi_term,
       CAST(SUM(psi_term) OVER () AS DOUBLE) AS psi_total,
       CAST(CASE WHEN na = 0 OR nb = 0 THEN NULL
                 WHEN CAST(SUM(psi_term) OVER () AS DOUBLE) > 0.1
                 THEN 1 ELSE 0 END AS BIGINT) AS drift_warning
FROM term ORDER BY bin
"""


@register("dq_drift_psi", oracle=_PSI_ORACLE)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the urgent / non-urgent
    order-value distributions over 10 equi-width bins — the
    industry-standard drift score (PSI > 0.1 = warning, > 0.25 =
    action), reported per bin and in total.

    Exactness: bin ids are exact integer arithmetic off the 1-row
    min/max broadcast; bin counts are exact integers; each PSI term
    (p_a − p_b)·ln(p_a/p_b) is computed on bit-identical doubles
    (two divisions + one log on identical operands) and lifted
    through decimal(25,6) before the order-independent sum — the
    entropy/bigram log-partials recipe.  The warning flag compares
    the identical total against a literal.

    Engine shape: one scan → row-local bin id (after the 1-row
    broadcast) → ONE map-side-combined shuffle to 10 bins; every
    window after that runs on the 10-row table.  All bins are
    non-empty for both cohorts on this data (pinned in tests), so
    the ln() never sees zero — a production PSI adds Laplace
    smoothing, declared out of scope for the exactness proof.
    An entirely EMPTY cohort (na or nb = 0 — a feed with one
    population) is guarded: NULL terms and a NULL drift verdict on
    both engines (round-9 extension sweep; ANSI Spark previously
    threw DIVIDE_BY_ZERO where DuckDB returned NULL)."""
    orders = table(spark, sf_dir, "orders").select("o_totalprice", "o_orderpriority")
    v = orders.select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_a"),
    )
    mm = v.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    b = v.crossJoin(F.broadcast(mm)).selectExpr(
        f"least(CAST({_PSI_NB} - 1 AS BIGINT), "
        f"((v - lo) * {_PSI_NB}) div (hi - lo + 1)) AS bin",
        "is_a",
    )
    cnt = b.groupBy("bin").agg(
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("cb"),
    )
    w_all = Window.partitionBy()
    t = cnt.select(
        "bin",
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    # Empty-cohort guard (round-9 extension sweep, the ztest empty-arm
    # case): a feed where one cohort has zero rows makes na or nb = 0
    # — ANSI Spark threw DIVIDE_BY_ZERO where DuckDB returned NULL;
    # the shared CASE yields NULL terms and a NULL warning (no
    # evidence, no verdict).  The zero-count BIN inside a non-empty
    # cohort stays declared out of scope (production PSI adds Laplace
    # smoothing; pinned non-empty on the fixture).
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    empty = (F.col("na") == 0) | (F.col("nb") == 0)
    term = t.select(
        "bin",
        "na",
        "nb",
        F.col("ca").alias("n_a"),
        F.col("cb").alias("n_b"),
        F.when(empty, F.lit(None).cast("decimal(25,6)"))
        .otherwise(((pa - pb) * F.log(pa / pb)).cast("decimal(25,6)"))
        .alias("psi_term"),
    )
    return (
        term.select(
            "bin",
            "n_a",
            "n_b",
            "na",
            "nb",
            F.col("psi_term").cast("double").alias("psi_term"),
            F.sum("psi_term").over(w_all).cast("double").alias("psi_total"),
        )
        .withColumn(
            "drift_warning",
            F.when(empty, F.lit(None).cast("bigint"))
            .otherwise(
                F.when(F.col("psi_total") > 0.1, 1).otherwise(0).cast("bigint")
            ),
        )
        .drop("na", "nb")
        .orderBy("bin")
    )
