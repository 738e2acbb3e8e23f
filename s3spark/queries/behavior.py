"""Behavioral event analytics: cohort retention and marketing
attribution — the product-analytics queries an events warehouse
serves daily, expressed with the same time-keyed join/window
discipline as the rest of the engine (user-keyed shuffles, no
cross products, epoch arithmetic portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import DEC, table
from s3spark.registry import register


@register(
    "retention_cohorts",
    oracle="""
WITH signup AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
  FROM events WHERE event_type = 'signup'
  GROUP BY user_id
),
activity AS (
  SELECT s.cohort_day,
         CAST(floor((epoch(e.ts) - epoch(s.cohort_day)) / 604800) AS BIGINT)
           AS week_offset,
         e.user_id
  FROM events e JOIN signup s ON e.user_id = s.user_id
  WHERE e.ts >= s.cohort_day
)
SELECT cohort_day, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM activity
GROUP BY cohort_day, week_offset
ORDER BY cohort_day, week_offset
""",
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by the day of their
    first signup event; each later event lands in a week offset from
    that day; cells count distinct active users.

    Week offsets use raw epoch arithmetic (floor(Δepoch/604800)) —
    calendar week truncation is engine- and locale-dependent, epoch
    math is not.  Two user-keyed shuffles total: the per-user MIN
    (signup scan is filtered first) and the events⋈signup equi-join,
    which reuses the user hash; the cohort-cell agg runs on the tiny
    (day, offset) domain.  At 100 TB the signup side is the small one
    — broadcast when it fits, hash otherwise."""
    e = table(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("DAY", F.min("ts")).alias("cohort_day"))
    )
    return (
        e.join(signup, "user_id")
        .filter(F.col("ts") >= F.col("cohort_day"))
        .select(
            "cohort_day",
            F.floor(
                (F.unix_timestamp("ts") - F.unix_timestamp("cohort_day")) / 604800
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "week_offset")
    )


@register(
    "attribution_last_touch",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
joined AS (
  SELECT p.event_id AS purchase_id,
         c.event_id AS click_id,
         (epoch_us(p.ts) - epoch_us(c.ts)) // 60000000 AS minutes_before,
         ROW_NUMBER() OVER (
           PARTITION BY p.event_id ORDER BY c.ts DESC, c.event_id DESC
         ) AS rk
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id
   AND c.ts < p.ts
   AND c.ts >= p.ts - INTERVAL 7 DAY
)
SELECT purchase_id, click_id, minutes_before
FROM joined WHERE rk = 1
ORDER BY purchase_id
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest click
    by the same user in the preceding 7 days (NULL when none) — the
    canonical marketing-attribution join.

    Candidates come from a user-keyed equi-join with the 7-day window
    as a residual range predicate — shuffle on user_id, never a time
    cross product; the per-purchase argmax is a window over the
    (purchase-bounded) candidate set with a deterministic
    (ts, event_id) tie-break.  LEFT join keeps unattributed purchases
    honest.  At 100 TB both sides co-partition on user_id and the
    window state is bounded by per-user click density."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc_nulls_last("c_ts"), F.desc_nulls_last("click_id")
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "purchase_id",
            "click_id",
            # whole elapsed minutes via integer epoch-µs arithmetic:
            # date_diff('minute') counts boundary CROSSINGS in DuckDB
            # while Spark's timestampdiff counts full 60 s units —
            # floor(Δµs/60e6) is identical on both engines
            F.floor(
                (F.unix_micros("p_ts") - F.unix_micros("c_ts")) / 60000000
            ).alias("minutes_before"),
        )
    )


@register(
    "sessionize_gaps",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
)
SELECT user_id,
       CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_no
ORDER BY user_id, session_no
""",
)
def sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a user's event stream splits into
    sessions wherever the gap to the previous event exceeds 30
    minutes — the lag + cumulative-sum decorrelation of
    ``session_window`` (which `stream_session` exercises on the
    streaming side), with per-session start/end/count stats.

    Everything happens inside ONE user-keyed shuffle: the lag, the
    running session counter, and the per-session aggregate all reuse
    the same (user_id, ts) partitioning-and-order, so Spark plans a
    single Exchange + Sort feeding two Window operators and the final
    agg.  Window state is one row (the lag) — per-user event density
    never accumulates.  Gap comparison uses integer epoch-µs
    arithmetic, portable across engines.

    Every window orders by (ts, event_id) so same-ts ties resolve
    identically on both engines — a running sum ordered by a
    non-unique key would make session assignment scan-order
    dependent."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marked = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select(
        "user_id",
        "ts",
        F.sum("new_sess").over(wrun).alias("session_no"),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "window_pattern_match",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS path
  FROM events
  GROUP BY user_id
)
SELECT user_id, path LIKE '%v%c%p%' AS converted,
       CAST(length(path) AS BIGINT) AS n_events
FROM seq
ORDER BY user_id
""",
)
def window_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style ordered sequence detection without the
    clause (Spark has none): did each user view → click → purchase in
    that order, with arbitrary events between?

    Per user the event-type initials are folded into one path string
    in (ts, event_id) order — a deterministic sort_array over
    (ts, event_id, initial) structs, then a single LIKE — so pattern
    matching over event sequences becomes ONE user-keyed shuffle plus
    a row-local regex, the same cost as any per-user aggregate.  More
    complex patterns (kleene stars, alternation, negation) are the
    same plan with a different regex — this is the scalable shape for
    sequence analytics Spark-side."""
    e = table(spark, sf_dir, "events")
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
                    )
                )
            ),
            lambda s: s["c"],
        ),
        "",
    )
    return (
        e.groupBy("user_id")
        .agg(path.alias("path"))
        .select(
            "user_id",
            F.col("path").like("%v%c%p%").alias("converted"),
            F.length("path").cast("long").alias("n_events"),
        )
    )


@register(
    "incremental_agg_maintenance",
    oracle="""
SELECT user_id, date_trunc('day', ts) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id, day
ORDER BY user_id, day
""",
)
def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a daily (user, day) aggregate is
    kept up to date by MERGING a late-arriving delta (10% of events,
    event_id % 10 = 0) into the previously materialized base
    aggregate — recomputing ONLY the partial states, never rescanning
    the base fact rows.

    Both sides reduce to mergeable partial aggregates (count, decimal
    sum) combined with a full-outer coalesce-add on the group key —
    the streaming/backfill pattern that turns a daily 100 TB rescan
    into a delta-sized job.  The ORACLE is the full recompute over
    all events: hash-equality proves base+delta merge == recompute,
    which is exactly the IVM correctness contract."""
    e = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")

    def daily(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", day).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("sum_value"),
        )

    base = daily(e.filter(F.col("event_id") % 10 != 0))
    delta = daily(e.filter(F.col("event_id") % 10 == 0))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(
        d,
        (F.col("b.user_id") == F.col("d.user_id"))
        & (F.col("b.day") == F.col("d.day")),
        "full_outer",
    ).select(
        F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias("user_id"),
        F.coalesce(F.col("b.day"), F.col("d.day")).alias("day"),
        (
            F.coalesce(F.col("b.n_events"), F.lit(0))
            + F.coalesce(F.col("d.n_events"), F.lit(0))
        ).alias("n_events"),
        (
            F.coalesce(F.col("b.sum_value"), F.lit(0).cast(DEC))
            + F.coalesce(F.col("d.sum_value"), F.lit(0).cast(DEC))
        )
        .cast("double")
        .alias("total_value"),
    )
    return merged
