"""Round-6 batch four: interval subtraction, resettable running
totals, Markov transition counts, and seasonal decomposition.

- ``interval_subtract_measure``: effective activity time per user =
  activity coverage MINUS blackout coverage — interval-set
  subtraction by segment sweep, completing the interval-algebra
  family (join_interval_overlap = pairs, interval_coalesce = union,
  interval_max_concurrency = peak, this = difference measure).
- ``window_cumulative_reset``: a running total that RESETS whenever
  a marker event arrives — the classic "cumulative since last
  login/deploy/failure" query, solved with the islands trick (no
  recursion, no per-row procedural state).
- ``event_transition_matrix``: first-order Markov transition counts
  and probabilities between consecutive event types per user — the
  navigation-flow / behavioral-model statistic.
- ``timeseries_seasonal_decompose``: classical moving-average
  decomposition of the hourly event-value series — trend (centered
  ±12 h rolling mean), then the hour-of-day seasonal profile of the
  detrended series.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections E/K
per the north star's analytics mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# interval_subtract_measure
# --------------------------------------------------------------------------

_SUBTRACT_ORACLE = """
WITH pts AS (
  SELECT user_id, ts AS t, 1 AS da, 0 AS db FROM events
   WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts + INTERVAL 30 MINUTE, -1, 0 FROM events
   WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, 0, 1 FROM events WHERE event_type = 'error'
  UNION ALL
  SELECT user_id, ts + INTERVAL 2 HOUR, 0, -1 FROM events
   WHERE event_type = 'error'
),
g AS (
  SELECT user_id, t, SUM(da) AS da, SUM(db) AS db
  FROM pts GROUP BY 1, 2
),
c AS (
  SELECT user_id, t,
         SUM(da) OVER (PARTITION BY user_id ORDER BY t) AS a,
         SUM(db) OVER (PARTITION BY user_id ORDER BY t) AS b,
         lead(t) OVER (PARTITION BY user_id ORDER BY t) AS nxt
  FROM g
)
SELECT user_id,
       CAST(COALESCE(SUM(CASE WHEN a > 0
              THEN epoch_us(nxt) - epoch_us(t) END), 0) AS BIGINT)
         AS active_us,
       CAST(COALESCE(SUM(CASE WHEN a > 0 AND b > 0
              THEN epoch_us(nxt) - epoch_us(t) END), 0) AS BIGINT)
         AS blacked_us,
       CAST(COALESCE(SUM(CASE WHEN a > 0
              THEN epoch_us(nxt) - epoch_us(t) END), 0)
            - COALESCE(SUM(CASE WHEN a > 0 AND b > 0
              THEN epoch_us(nxt) - epoch_us(t) END), 0) AS BIGINT)
         AS effective_us
FROM c
WHERE nxt IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


@register("interval_subtract_measure", oracle=_SUBTRACT_ORACLE)
def interval_subtract_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-set subtraction by segment sweep: per user, purchase
    sessions open [ts, ts+30m) activity, errors open [ts, ts+2h)
    blackouts; effective time = measure(activity) −
    measure(activity ∩ blackout), reported in exact integer
    microseconds.

    The sweep merges all boundary points, keeps two running coverage
    counters, and measures each inter-point segment under the state
    that RESULTS from its left endpoint.  Coincident boundaries need
    no pre-grouping: tied rows are RANGE-frame PEERS (all see the
    post-all-deltas coverage state) and however lead() chains them,
    all but one tied row spans a zero-width segment measuring 0 — so
    the result is partition- and sort-stability-independent without
    an extra (user, t) shuffle.

    Engine shape: one hash exchange on user_id serves the single
    Window operator (both coverage cumsums + lead share one
    partitioning and ordering) and the final per-user aggregate
    reuses it.  Segment arithmetic is exact integer microseconds."""
    ev = table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    a = ev.filter(F.col("event_type") == "purchase")
    b = ev.filter(F.col("event_type") == "error")

    def pts(src: DataFrame, end: str, da: int, db: int) -> DataFrame:
        start = src.select(
            "user_id",
            F.col("ts").alias("t"),
            F.lit(da).alias("da"),
            F.lit(db).alias("db"),
        )
        stop = src.select(
            "user_id",
            F.expr(f"ts + INTERVAL {end}").alias("t"),
            F.lit(-da).alias("da"),
            F.lit(-db).alias("db"),
        )
        return start.unionAll(stop)

    g = pts(a, "30 MINUTES", 1, 0).unionAll(pts(b, "2 HOURS", 0, 1))
    w = Window.partitionBy("user_id").orderBy("t")
    c = g.select(
        "user_id",
        "t",
        F.sum("da").over(w).alias("a"),
        F.sum("db").over(w).alias("b"),
        F.lead("t").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    dur = F.unix_micros("nxt") - F.unix_micros("t")
    active = F.coalesce(
        F.sum(F.when(F.col("a") > 0, dur)), F.lit(0).cast("long")
    )
    blacked = F.coalesce(
        F.sum(F.when((F.col("a") > 0) & (F.col("b") > 0), dur)),
        F.lit(0).cast("long"),
    )
    return (
        c.groupBy("user_id")
        .agg(
            active.alias("active_us"),
            blacked.alias("blacked_us"),
            (active - blacked).alias("effective_us"),
        )
    )


# --------------------------------------------------------------------------
# window_cumulative_reset
# --------------------------------------------------------------------------

_RESET_ORACLE = """
WITH seg AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(25,6)) AS v,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS segment
  FROM events
)
SELECT user_id, event_id, segment,
       CAST(SUM(v) OVER (PARTITION BY user_id, segment
                         ORDER BY ts, event_id) AS DOUBLE)
         AS cum_since_reset
FROM seg
ORDER BY user_id, event_id
"""


@register("window_cumulative_reset", oracle=_RESET_ORACLE)
def window_cumulative_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running value total per user that RESETS at every signup
    event ("cumulative since last login") — the islands trick: a
    cumulative count of marker events labels each inter-marker
    segment, and the running sum re-partitions on (user, segment).
    No recursion, no procedural state, two declarative windows.

    Exactness: values lift through decimal(18,2)→(25,6) before the
    cumulative sum (the standard dsum recipe), ordering is total via
    the unique (ts, event_id) tiebreak, so every prefix sum is
    identical on both engines.  Engine shape: the segment window and
    the segment-sum window share the user_id hash partitioning; state
    per task is one counter and one decimal accumulator."""
    ev = table(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.col("value").cast("decimal(18,2)").cast("decimal(25,6)").alias("v"),
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        )
        .over(w1)
        .alias("segment"),
    )
    w2 = Window.partitionBy("user_id", "segment").orderBy("ts", "event_id")
    return seg.select(
        "user_id",
        "event_id",
        "segment",
        F.sum("v").over(w2).cast("double").alias("cum_since_reset"),
    )


# --------------------------------------------------------------------------
# event_transition_matrix
# --------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type AS curr,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
pairs AS (
  SELECT prev, curr, COUNT(*) AS n
  FROM seq WHERE prev IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev, curr, CAST(n AS BIGINT) AS n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY prev) AS DOUBLE) AS p
FROM pairs
ORDER BY prev, curr
"""


@register("event_transition_matrix", oracle=_TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over consecutive event
    types per user: counts and row-normalized probabilities for every
    observed (prev → curr) pair — the navigation-flow statistic
    behind funnel diagnostics and behavioral simulation.

    Engine shape: ONE user-partitioned lag window over the raw
    events (total order via the unique (ts, event_id) tiebreak), a
    partial-aggregated pair count bounded by |event types|², and a
    row-normalizing window over that bounded table.  Probabilities
    are one IEEE division of exact integers — bit-identical."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("curr"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    pairs = seq.groupBy("prev", "curr").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n").over(Window.partitionBy("prev"))
    return pairs.select(
        "prev",
        "curr",
        "n",
        (F.col("n").cast("double") / tot.cast("double")).alias("p"),
    ).orderBy("prev", "curr")


# --------------------------------------------------------------------------
# timeseries_seasonal_decompose
# --------------------------------------------------------------------------

_SEASONAL_ORACLE = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(25,6)))
              AS DOUBLE) AS v
  FROM events GROUP BY 1
),
trend AS (
  SELECT h, v,
         CAST(SUM(CAST(v AS DECIMAL(25,6)))
              OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
              AS DOUBLE)
           / COUNT(*) OVER (ORDER BY h
                            ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
           AS t
  FROM hourly
)
SELECT CAST(hour(h) AS BIGINT) AS hour_of_day,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(CAST(v - t AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
         AS seasonal
FROM trend
GROUP BY 1
ORDER BY 1
"""


@register("timeseries_seasonal_decompose", oracle=_SEASONAL_ORACLE)
def timeseries_seasonal_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Classical moving-average seasonal decomposition of the hourly
    event-value series: trend = centered ±12 h rolling mean, seasonal
    = hour-of-day mean of the detrended series.

    Exactness chain: hourly values are exact decimal sums cast once
    to double; the rolling mean is an exact decimal window sum
    divided by the frame count (one IEEE division); the detrended
    residual (two identical doubles subtracted) lifts back through
    decimal(25,6) before the seasonal mean — every float op is an
    identical single instruction on both engines, so no tolerance is
    needed anywhere.

    Engine shape: the raw scan reduces to the HOURLY series first
    (partial-aggregated shuffle, |hours| rows out), and every window
    after that runs over the calendar-bounded series — an
    unpartitioned ordered window, but over rows bounded by the time
    range by construction (like feature_quantile_bin's documented
    global ntile), never by event count.  At 100 TB the hourly table
    for a decade is <90k rows."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(
                F.col("value").cast("decimal(18,2)").cast("decimal(25,6)")
            )
            .cast("double")
            .alias("v")
        )
    )
    wf = Window.orderBy("h").rowsBetween(-12, 12)
    trend = hourly.select(
        "h",
        "v",
        (
            F.sum(F.col("v").cast("decimal(25,6)")).over(wf).cast("double")
            / F.count(F.lit(1)).over(wf)
        ).alias("t"),
    )
    return (
        trend.groupBy(F.hour("h").cast("long").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            (
                F.sum((F.col("v") - F.col("t")).cast("decimal(25,6)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("seasonal"),
        )
        .orderBy("hour_of_day")
    )
