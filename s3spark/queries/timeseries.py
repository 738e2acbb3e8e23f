"""Time-series ETL operators: date-spine gap filling, forward fill,
and null-preserving generators — the daily-pipeline shapes between
raw events and features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "timeseries_gapfill",
    oracle="""
WITH spine AS (
  SELECT u.user_id, d.day
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                  TIMESTAMP '2024-01-10',
                                  INTERVAL '1 day')) AS day
  ) d
),
daily AS (
  SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events
  WHERE user_id < 20
  GROUP BY 1, 2
)
SELECT s.user_id, s.day, coalesce(daily.n, 0) AS n_events
FROM spine s
LEFT JOIN daily ON daily.user_id = s.user_id AND daily.day = s.day
ORDER BY s.user_id, s.day
""",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling: generate the complete (user × day) grid
    with sequence+explode, left-join the actual daily counts, zero-fill
    the holes.  The spine is generated, never materialized as input —
    at scale the cross join is |users| × |days| rows of two columns,
    and the real table only shuffles once on (user, day)."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    users = e.select("user_id").distinct()
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-10").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    spine = users.crossJoin(days)
    daily = (
        e.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@register(
    "window_forward_fill",
    oracle="""
SELECT
  o_custkey,
  o_orderkey,
  last_value(price_or_null IGNORE NULLS) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS price_ffill
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END
           AS price_or_null
  FROM orders
)
ORDER BY o_custkey, o_orderkey
""",
)
def window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last-observation-carried-forward): nulls
    synthesized on every 3rd order, filled with
    last(..., ignorenulls) over the ordered per-customer frame —
    the sensor/price-series repair primitive."""
    o = table(spark, sf_dir, "orders")
    price_or_null = F.when(
        F.col("o_orderkey") % 3 == 0, F.lit(None).cast("double")
    ).otherwise(F.col("o_totalprice"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.withColumn("price_or_null", price_or_null)
        .select(
            "o_custkey",
            "o_orderkey",
            F.last("price_or_null", ignorenulls=True).over(w).alias("price_ffill"),
        )
    )


@register(
    "generator_explode_outer",
    oracle="""
SELECT d.doc_id, t.tok
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN []
              ELSE string_split(substr(text, 1, 30), ' ') END AS toks
  FROM documents
  WHERE doc_id < 100
) d
LEFT JOIN LATERAL (SELECT unnest(d.toks) AS tok) t ON TRUE
ORDER BY d.doc_id, t.tok NULLS FIRST
""",
)
def generator_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving generator (explode_outer): rows whose array is
    empty survive with a NULL element instead of disappearing —
    the LEFT JOIN LATERAL semantics, essential when the exploded side
    is optional detail."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.when(
        F.col("doc_id") % 7 == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.substring("text", 1, 30), " "))
    return (
        d.select("doc_id", F.explode_outer(toks).alias("tok"))
    )


@register(
    "agg_mode_per_group",
    oracle="""
SELECT user_id, event_type AS top_type, n
FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rk
  FROM events
  WHERE user_id < 30
  GROUP BY user_id, event_type
)
WHERE rk = 1
ORDER BY user_id
""",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a deterministic
    alphabetical tie-break — count + rank, never collect: the
    categorical-profiling aggregate."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "n")
        .orderBy("user_id")
    )


@register(
    "set_union_missing_columns",
    oracle="""
SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS balance,
       NULL AS s_suppkey
FROM customer WHERE c_custkey < 50
UNION ALL
SELECT s_suppkey AS entity_id, s_name AS name, NULL AS balance,
       s_suppkey
FROM supplier
ORDER BY entity_id, name
""",
)
def set_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: unionByName(allowMissingColumns=True)
    null-pads the columns each side lacks — the append path when a new
    pipeline version adds fields."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(
            F.col("c_custkey").alias("entity_id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("balance"),
        )
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.col("s_suppkey"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "window_time_decay",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, value,
         (epoch(ts) - MIN(epoch(ts)) OVER (PARTITION BY user_id))
           / 3600.0 AS h
  FROM events
),
acc AS (
  SELECT user_id, event_id, h,
         SUM(CAST(value * exp(0.01 * h) AS DECIMAL(25,6)))
           OVER (PARTITION BY user_id ORDER BY h, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM base
)
SELECT user_id, event_id,
       round(exp(-0.01 * h) * CAST(s AS DOUBLE), 6) AS decayed_value
FROM acc
ORDER BY user_id, event_id
""",
)
def window_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed running engagement score per user
    (half-life ≈ 69 h at λ=0.01/h) — the recency-weighted feature
    every behavioral ranking/feature pipeline computes.

    EWMA looks serial but factors into a plain window cumsum:
    ``decayed(t) = exp(-λh_t) · Σ_{i≤t} value_i · exp(λh_i)`` — one
    per-user shuffle, no iteration, no UDF.  Timestamps are
    re-origined per user (h = hours since the user's first event) so
    the exp() arguments stay bounded regardless of absolute epoch;
    the partial sums go through DECIMAL(25,6) so both engines
    accumulate exactly in any order (the repo-wide DEC float rule)."""
    e = table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    # prefix MUST be time-ordered (h, not event_id) or later events
    # would enter earlier rows' sums with weight > 1
    w = (
        Window.partitionBy("user_id")
        .orderBy("h", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sec = F.col("ts").cast("double")
    h = (sec - F.min(sec).over(wu)) / 3600.0
    base = e.select("user_id", "event_id", "value", h.alias("h"))
    # λ-safe horizon guard (round-9 degenerate sweep): the cumsum
    # factoring carries value·exp(λh) through DECIMAL(25,6), which
    # overflows once a user's span exceeds ~3600 h (exp(36) ≈ 4e15 ×
    # value magnitudes ≈ the 19-digit decimal ceiling) — under ANSI
    # that dies as a cryptic NUMERIC_VALUE_OUT_OF_RANGE mid-window.
    # The guard lives INSIDE the summed expression (an assert-only
    # column would be pruned — the with_cum_less lesson) and raises an
    # ACTIONABLE contract error instead; spans beyond the horizon need
    # the segmented log-sum-exp formulation, deliberately out of scope.
    # The fixture's per-user spans are far inside the horizon at every
    # SF, so fixture values are untouched (pinned in tests).
    term = F.expr(
        "CASE WHEN h > 3600 THEN CAST(raise_error("
        "'window_time_decay: per-user span exceeds the lambda-safe "
        "3600 h horizon (exp weight overflows DECIMAL(25,6)); segment "
        "the series before decaying') AS DOUBLE) "
        "ELSE value * exp(0.01 * h) END"
    )
    s = F.sum(term.cast("decimal(25,6)")).over(w)
    return (
        base.withColumn("s", s)
        .select(
            "user_id",
            "event_id",
            F.round(
                F.exp(-0.01 * F.col("h")) * F.col("s").cast("double"), 6
            ).alias("decayed_value"),
        )
    )
