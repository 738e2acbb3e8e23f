"""Event-time windowing operators (SURVEY.md §2.3-K).

The first three run as batch queries with time-window functions (the
exact semantics Structured Streaming applies incrementally — Spark
shares the implementation), so they get full DuckDB oracles.  The
fourth actually executes a Structured Streaming job (availableNow)
and still carries an oracle, because watermark+dedup over a bounded,
uniquely-keyed fixture is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import DEC, table
from s3spark.registry import register


@register(
    "stream_tumbling",
    oracle=f"""
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (epoch-aligned, same alignment
    as DuckDB time_bucket)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start")
    )


@register(
    "stream_sliding",
    oracle="""
SELECT
  time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes'
    AS window_start,
  COUNT(*) AS n_events
FROM events, unnest([0, 1, 2, 3]) AS t(k)
GROUP BY 1
ORDER BY window_start
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour length, 15 minute slide): every event
    lands in 4 overlapping windows — Spark's window() generates them;
    the oracle derives the same 4 starts per event arithmetically."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


@register(
    "stream_session",
    oracle=f"""
WITH flagged AS (
  SELECT
    user_id,
    ts,
    value,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              >= INTERVAL '30 minutes'
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT *,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL '30 minutes' AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
FROM islands
GROUP BY user_id, session_no
ORDER BY user_id, session_start
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user via session_window().

    Gap-boundary semantics pinned by the oracle: an event exactly 30
    minutes after the previous one starts a NEW session (Spark merges
    only while ts < previous_ts + gap); session_end = last_ts + gap.
    The oracle is the classic gaps-and-islands rewrite."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_watermark_dedup",
    oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events)
GROUP BY event_type
ORDER BY event_type
""",
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An actual Structured Streaming execution: file-source stream →
    10-minute watermark → stateful dropDuplicates(event_id) →
    availableNow run into a memory sink → per-type counts of the
    deduplicated stream.  event_id is unique in the fixture, so the
    result is deterministic and equals the batch distinct — giving a
    real oracle for a streaming pipeline."""
    from s3spark.streaming import events_stream, run_available_now, stream_dedup

    deduped = stream_dedup(events_stream(spark, sf_dir))
    out = run_available_now(deduped, output_mode="append")
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


@register(
    "stream_stateful_user_stats",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState)
    executed to completion: per-user cumulative stats with explicit
    per-key state.  Exact integer-cent accumulation makes the final
    emission equal the batch aggregate bit-for-bit, so even this
    carries a full oracle.  The final emission per user is selected
    with a window (update mode emits one row per key per batch)."""
    from pyspark.sql import Window

    from s3spark.streaming import events_stream, run_available_now, stream_user_stats

    out = run_available_now(
        stream_user_stats(events_stream(spark, sf_dir)), output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "n_events", "total_value", "last_ts")
        .orderBy("user_id")
    )
