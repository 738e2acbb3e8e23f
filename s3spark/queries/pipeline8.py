"""Round-6 consolidation operators: exact distributed model fitting,
sweep-line concurrency, Benford data-quality screening, and
corrupt-tolerant JSONL corpus ingest.

- ``ml_linreg_normal_eq``: multi-feature least-squares fit via the
  normal equations — the distributed "fit a linear model over the
  whole fact table" primitive (price ~ quantity + discount).  The
  Gram/moment matrix is EXACT integer arithmetic end to end; only the
  final three divisions are floating point.
- ``interval_max_concurrency``: peak number of simultaneously-open
  sessions per user via the classic sweep-line (+1/-1 cumulative sum)
  — capacity planning / rate-limit sizing over activity intervals,
  and the third member of the interval-algebra family
  (join_interval_overlap = pairs, interval_coalesce = union, this =
  peak load).
- ``dq_benford_first_digit``: first-significant-digit distribution of
  order totals against Benford's law — the fraud/synthetic-data
  screen run as a data-quality gate over monetary columns.
- ``scan_jsonl_corpus``: write-then-ingest a JSONL corpus (THE
  interchange format for LLM training data) with planted malformed
  lines, PERMISSIVE parse with a corrupt-record column, and a content
  checksum proving good lines round-trip exactly.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections A/D/H
per the north star's training-data-pipeline mandate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import scratch_dir, table
from s3spark.registry import register

# --------------------------------------------------------------------------
# ml_linreg_normal_eq
# --------------------------------------------------------------------------

# Cramer's-rule solve of the symmetric 3x3 normal system
#   [[s00,s01,s02],[s01,s11,s12],[s02,s12,s22]] @ b = [t0,t1,t2]
# written ONCE as SQL text and executed verbatim on both engines over
# exact-integer moment columns, so the float tail is identical: each
# numerator/determinant is an exact integer, and the only floating
# operations are two correctly-rounded casts and one IEEE division per
# coefficient.
_LR_DET = (
    "(s00*(s11*s22 - s12*s12) - s01*(s01*s22 - s12*s02)"
    " + s02*(s01*s12 - s11*s02))"
)
_LR_NUM0 = (
    "(t0*(s11*s22 - s12*s12) - s01*(t1*s22 - s12*t2)"
    " + s02*(t1*s12 - s11*t2))"
)
_LR_NUM1 = (
    "(s00*(t1*s22 - s12*t2) - t0*(s01*s22 - s12*s02)"
    " + s02*(s01*t2 - s02*t1))"
)
_LR_NUM2 = (
    "(s00*(s11*t2 - s12*t1) - s01*(s01*t2 - s02*t1)"
    " + t0*(s01*s12 - s11*s02))"
)

# Singular-system guard (round-9 degenerate sweep): a constant or
# collinear feature makes the Gram determinant EXACTLY zero (integer
# arithmetic, so `det = 0` is a precise singularity test, not an
# epsilon); ANSI Spark throws DIVIDE_BY_ZERO even on DOUBLE/DOUBLE
# where DuckDB returns NULL — the shared CASE makes both engines emit
# NULL coefficients for an unidentifiable model.
def _lr_coef(num: str, alias: str) -> str:
    return (
        f"CASE WHEN {_LR_DET} = 0 THEN CAST(NULL AS DOUBLE) "
        f"ELSE CAST({num} AS DOUBLE) / CAST({_LR_DET} AS DOUBLE) END"
        f" AS {alias}"
    )


_LR_SOLVE_LIST = (
    "CAST(s00 AS BIGINT) AS n_rows",
    _lr_coef(_LR_NUM0, "b_intercept"),
    _lr_coef(_LR_NUM1, "b_qty"),
    _lr_coef(_LR_NUM2, "b_disc"),
)

_LR_SOLVE = ", ".join(_LR_SOLVE_LIST)

_LR_ORACLE = f"""
WITH f AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS x1,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS HUGEINT)   AS s00,
         SUM(CAST(x1 AS HUGEINT))    AS s01,
         SUM(CAST(x2 AS HUGEINT))    AS s02,
         SUM(CAST(x1*x1 AS HUGEINT)) AS s11,
         SUM(CAST(x1*x2 AS HUGEINT)) AS s12,
         SUM(CAST(x2*x2 AS HUGEINT)) AS s22,
         SUM(CAST(y AS HUGEINT))     AS t0,
         SUM(CAST(x1*y AS HUGEINT))  AS t1,
         SUM(CAST(x2*y AS HUGEINT))  AS t2
  FROM f
)
SELECT {_LR_SOLVE} FROM m
"""


@register("ml_linreg_normal_eq", oracle=_LR_ORACLE)
def ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-feature least squares (extendedprice ~ quantity +
    discount) via the normal equations, solved with Cramer's rule on
    an EXACT integer Gram matrix.

    Engine shape: the distributed work is ONE partial-aggregated scan
    producing nine moment sums — a map-side-combined reduction to a
    single row, the same shape at 60 k rows or 600 B (sums stay under
    decimal(38,0) up to ~1e9 rows of these magnitudes; wider scales
    re-block the features).  Features are lifted to exact integers
    through the decimal(18,2) cast (quantity, discount in cent units,
    price in cents), every moment and every Cramer determinant is
    integer arithmetic, and the SAME solve SQL text runs on both
    engines so the three final IEEE divisions are bit-identical.
    Completes the ML-prep family: agg_regression (simple slope),
    embedding_pca_power_iteration (eigenvector), this (multi-feature
    linear model)."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("x1"),
        (F.col("l_discount").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("x2"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    d38 = "decimal(38,0)"
    m = li.agg(
        F.count(F.lit(1)).cast(d38).alias("s00"),
        F.sum(F.col("x1").cast(d38)).alias("s01"),
        F.sum(F.col("x2").cast(d38)).alias("s02"),
        F.sum((F.col("x1") * F.col("x1")).cast(d38)).alias("s11"),
        F.sum((F.col("x1") * F.col("x2")).cast(d38)).alias("s12"),
        F.sum((F.col("x2") * F.col("x2")).cast(d38)).alias("s22"),
        F.sum(F.col("y").cast(d38)).alias("t0"),
        F.sum((F.col("x1") * F.col("y")).cast(d38)).alias("t1"),
        F.sum((F.col("x2") * F.col("y")).cast(d38)).alias("t2"),
    )
    return m.selectExpr(*_LR_SOLVE_LIST)


# --------------------------------------------------------------------------
# interval_max_concurrency
# --------------------------------------------------------------------------

_CONC_ORACLE = """
WITH pts AS (
  SELECT user_id, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT user_id, ts + INTERVAL 30 MINUTE AS t, -1 AS delta FROM events
),
c AS (
  SELECT user_id, delta,
         SUM(delta) OVER (PARTITION BY user_id ORDER BY t, delta) AS cum
  FROM pts
)
SELECT user_id,
       CAST(MAX(cum) AS BIGINT) AS max_concurrent,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions
FROM c
GROUP BY user_id
ORDER BY user_id
"""


def sweep_max_concurrency(ev: DataFrame, end_expr: str) -> DataFrame:
    """Sweep-line peak concurrency over a (user_id, ts) frame where
    each row opens the half-open interval [ts, <end_expr>).  Exposed
    frame-level so the random-input differential tests can drive it
    with hypothesis-generated intervals (tests/
    test_differential_random.py) — the registry key is one caller."""
    pts = ev.select(
        "user_id", F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "user_id",
            F.expr(end_expr).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("t", "delta")
    return (
        pts.withColumn("cum", F.sum("delta").over(w))
        .groupBy("user_id")
        .agg(
            F.max("cum").alias("max_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias(
                "n_sessions"
            ),
        )
    )


@register("interval_max_concurrency", oracle=_CONC_ORACLE)
def interval_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous open sessions per user: each event opens a
    30-minute half-open interval [ts, ts+30m); the answer is the
    sweep-line maximum of (+1 at start, -1 at end) cumulative sums.

    Half-open semantics come from the tie order (t, delta): an
    interval ending exactly when another starts sorts its -1 first,
    so back-to-back sessions never count as concurrent.  Equal sort
    keys are frame PEERS under the default RANGE window frame on both
    engines, so every row at a tied instant sees the same cumulative
    value — the result is partition- and sort-stability-independent.

    Engine shape: ONE hash exchange on user_id serves both the
    cumulative window and the final group-by (the aggregation reuses
    the window's HashPartitioning — plan-gated single exchange).  The
    sweep is O(n log n) per user vs the O(n²) self-join counting
    formulation; state per task is one running integer."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts")
    return sweep_max_concurrency(ev, "ts + INTERVAL 30 MINUTES")


# --------------------------------------------------------------------------
# dq_benford_first_digit
# --------------------------------------------------------------------------

# log10(1 + 1/d) to 12 decimal places: both engines parse the SAME
# decimal literal to the SAME nearest double — no libm log10 call
# whose last-ulp rounding could differ between JVM and C runtimes.
_BENFORD = {d: f"{math.log10(1.0 + 1.0 / d):.12f}" for d in range(1, 10)}

_BENFORD_VALUES_SQL = ", ".join(
    f"('{d}', CAST('{p}' AS DOUBLE))" for d, p in _BENFORD.items()
)

_BENFORD_ORACLE = f"""
WITH exp AS (
  SELECT * FROM (VALUES {_BENFORD_VALUES_SQL}) AS v(digit, expected_share)
),
obs AS (
  SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
           AS digit,
         COUNT(*) AS n
  FROM orders
  GROUP BY 1
),
tot AS (SELECT SUM(n) AS total FROM obs)
SELECT exp.digit,
       CAST(COALESCE(obs.n, 0) AS BIGINT) AS n,
       CASE WHEN COALESCE(tot.total, 0) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE CAST(COALESCE(obs.n, 0) AS DOUBLE)
                 / CAST(tot.total AS DOUBLE) END AS observed_share,
       exp.expected_share,
       CASE WHEN COALESCE(tot.total, 0) = 0 THEN CAST(NULL AS DOUBLE)
            ELSE abs(CAST(COALESCE(obs.n, 0) AS DOUBLE)
                     / CAST(tot.total AS DOUBLE) - exp.expected_share)
       END AS abs_dev
FROM exp LEFT JOIN obs ON exp.digit = obs.digit CROSS JOIN tot
ORDER BY exp.digit
"""


@register("dq_benford_first_digit", oracle=_BENFORD_ORACLE)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs
    Benford's law — the classic fraud / synthetic-data screen, run as
    a data-quality gate.

    Digit extraction goes through the decimal(18,2) cast so BOTH
    engines stringify the same fixed-point value (double-to-string
    shortest-repr rules differ; decimal formatting doesn't), and the
    expected shares are pinned as 12-digit decimal LITERALS rather
    than log10() calls — JVM StrictMath and libm may disagree in the
    last ulp, literals can't.  Output is the 9-row digit table
    (observed n, observed share, Benford share, absolute deviation);
    digits absent from the data still appear with n=0 because the
    literal table is the join base.

    Engine shape: one partial-aggregated scan down to ≤9 groups, a
    9-row broadcast join against the literal table, and a 9-row
    window for the total — every post-scan structure is constant
    size regardless of fact-table scale."""
    o = table(spark, sf_dir, "orders")
    obs = (
        o.select(
            F.substring(
                F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
                1,
                1,
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exp = spark.createDataFrame(
        [(str(d), float(p)) for d, p in _BENFORD.items()],
        "digit string, expected_share double",
    )
    joined = exp.join(obs, "digit", "left").withColumn(
        "n", F.coalesce("n", F.lit(0).cast("long"))
    )
    # 9-row total: the unpartitioned window is bounded by construction.
    # Empty-input guard (round-9 degenerate sweep): with zero orders
    # the coalesced total is exactly 0, ANSI Spark throws
    # DIVIDE_BY_ZERO, and the oracle's NULL total silently yields NULL
    # — the explicit CASE gives BOTH engines NULL shares (an audit
    # over an empty feed is "no evidence", not a crash).
    total = F.sum("n").over(Window.partitionBy())
    return (
        joined.withColumn(
            "observed_share",
            F.when(total == 0, F.lit(None).cast("double")).otherwise(
                F.col("n").cast("double") / total.cast("double")
            ),
        )
        .select(
            "digit",
            "n",
            "observed_share",
            "expected_share",
            F.abs(F.col("observed_share") - F.col("expected_share")).alias(
                "abs_dev"
            ),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------------
# scan_jsonl_corpus
# --------------------------------------------------------------------------

_JSONL_ORACLE = """
SELECT CAST(COUNT(CASE WHEN doc_id % 97 <> 0 THEN 1 END) AS BIGINT)
         AS n_good,
       CAST(COUNT(CASE WHEN doc_id % 97 = 0 THEN 1 END) AS BIGINT)
         AS n_corrupt,
       CAST(SUM(CASE WHEN doc_id % 97 <> 0 THEN length(text) END)
            AS BIGINT) AS sum_chars,
       CAST(COUNT(DISTINCT CASE WHEN doc_id % 97 <> 0 THEN lang END)
            AS BIGINT) AS n_langs
FROM documents
"""


@register("scan_jsonl_corpus", oracle=_JSONL_ORACLE)
def scan_jsonl_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus ingest with malformed-line quarantine: the
    documents table is serialized to JSON-lines (THE interchange
    format for LLM training corpora), every doc_id % 97 == 0 line is
    deliberately mangled (truncated + stray brace — never valid
    JSON), and the file is read back PERMISSIVE with a corrupt-record
    column.  The aggregate proves (a) malformed lines land in
    quarantine instead of killing the job, (b) good lines round-trip
    text EXACTLY (sum of text lengths matches the source table —
    to_json escaping of quotes/newlines is inverted losslessly by the
    parser), and the oracle predicts all of it from the SOURCE table,
    never reading the file.

    Engine shape: the JSON reader is a distributed line-oriented scan
    (JSONL splits at newlines, so a 100 TB corpus fans out by HDFS
    block exactly like text); schema is EXPLICIT — no inference pass
    over the data — and the corrupt column rides the same scan.  One
    partial-aggregated reduction to a single row follows."""
    docs = table(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "lang", "text"))
    out = scratch_dir("jsonl_corpus")
    docs.select(
        F.when(
            F.col("doc_id") % 97 == 0,
            F.concat(F.substring(line, 1, 20), F.lit('{"')),
        )
        .otherwise(line)
        .alias("value")
    ).write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "doc_id long, lang string, text string, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out)
    )
    good = F.col("_corrupt").isNull()
    return back.agg(
        F.count(F.when(good, 1)).alias("n_good"),
        F.count(F.when(~good, 1)).alias("n_corrupt"),
        F.sum(F.when(good, F.length("text"))).alias("sum_chars"),
        F.countDistinct(F.when(good, F.col("lang"))).alias("n_langs"),
    )
