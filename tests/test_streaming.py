"""Structured Streaming vs batch equivalence tests (SURVEY.md §5.2):
the streaming pipeline must produce exactly the batch answer on a
bounded source, and stateful dedup must collapse planted duplicate
event_ids."""

from __future__ import annotations

import pandas as pd

import s3spark.queries  # noqa: F401
from s3spark.io import table
from s3spark.streaming import (
    events_stream,
    run_available_now,
    stream_dedup,
    stream_tumbling_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from s3spark.registry import REGISTRY

    # complete mode: append would hold back windows past the final
    # watermark (they only emit when a later event advances it)
    streamed = run_available_now(
        stream_tumbling_counts(events_stream(spark, sf_dir)),
        output_mode="complete",
    )
    batch = REGISTRY["stream_tumbling"].fn(spark, sf_dir)
    got = {
        (r.window_start, r.window_end): (r.n_events, round(r.total_value, 6))
        for r in streamed.collect()
    }
    exp = {
        (r.window_start, r.window_end): (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == exp


def test_stream_dedup_collapses_planted_duplicates(spark, tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(100):
        rows.append(
            {
                "event_id": i,
                "ts": base + pd.Timedelta(seconds=i),
                "user_id": i % 5,
                "event_type": "click",
                "value": 1.0,
                "props": '{"k": 1}',
            }
        )
    # plant duplicate deliveries of the first 10 events (at-least-once)
    for i in range(10):
        rows.append(dict(rows[i]))
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")

    deduped = run_available_now(stream_dedup(events_stream(spark, str(tmp_path))))
    assert deduped.count() == 100
    assert deduped.select("event_id").distinct().count() == 100


def test_stream_merge_into_upserts_incrementally(spark, tmp_path):
    """Two source files arriving as separate micro-batches: the second
    re-delivers 5 events with corrected values; the merged target must
    hold exactly one row per event_id with the LAST delivery's value."""
    import pandas as pd

    from s3spark.streaming import events_stream, stream_merge_into

    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01")
    f1 = pd.DataFrame(
        {
            "event_id": range(20),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(20)],
            "user_id": [i % 3 for i in range(20)],
            "event_type": ["click"] * 20,
            "value": [1.0] * 20,
            "props": ['{"k": 1}'] * 20,
        }
    )
    f1.to_parquet(src / "events.parquet")
    target = str(tmp_path / "target")

    stream_merge_into(events_stream(spark, str(src)), target)
    assert spark.read.parquet(target).count() == 20

    # second delivery: corrections for ids 0-4 + 5 new events
    f2 = f1.iloc[:5].copy()
    f2["value"] = 99.0
    f3 = f1.iloc[:5].copy()
    f3["event_id"] = range(100, 105)
    pd.concat([f2, f3]).to_parquet(src / "events2.parquet")

    stream_merge_into(events_stream(spark, str(src)), target)
    out = spark.read.parquet(target)
    assert out.count() == 25
    assert out.filter("event_id < 5 AND value = 99.0").count() == 5
    assert out.select("event_id").distinct().count() == 25


def test_stream_merge_into_recovers_from_mid_swap_crash(spark, tmp_path):
    """Crash-window regression: if a crash lands between
    rename(target→bak) and rename(tmp→target), the next epoch must
    restore bak — the only complete copy — instead of deleting it and
    silently restarting history from the in-flight batch."""
    import shutil

    import pandas as pd

    from s3spark.streaming import events_stream, stream_merge_into

    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-01-01")
    f1 = pd.DataFrame(
        {
            "event_id": range(20),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(20)],
            "user_id": [i % 3 for i in range(20)],
            "event_type": ["click"] * 20,
            "value": [1.0] * 20,
            "props": ['{"k": 1}'] * 20,
        }
    )
    f1.to_parquet(src / "events.parquet")
    target = str(tmp_path / "target")
    stream_merge_into(events_stream(spark, str(src)), target)
    assert spark.read.parquet(target).count() == 20

    # simulate the crash window: target moved aside to .bak, new copy
    # never landed — bak now holds the ONLY complete merged history
    shutil.move(target, target + ".bak")

    f2 = f1.iloc[:5].copy()
    f2["event_id"] = range(100, 105)
    f2.to_parquet(src / "events2.parquet")
    stream_merge_into(events_stream(spark, str(src)), target)

    out = spark.read.parquet(target)
    assert out.count() == 25, "pre-crash history was dropped"
    assert out.select("event_id").distinct().count() == 25


def test_streaming_session_windows_subset_of_batch(spark, sf_dir):
    """Session windows computed in actual streaming mode (append +
    watermark) must be exactly a subset of the batch session_window
    result: append emits only sessions closed by the final watermark,
    and every emitted session must match the batch computation."""
    from pyspark.sql import functions as F

    from s3spark.registry import REGISTRY
    from s3spark.streaming import events_stream, run_available_now

    sdf = events_stream(spark, sf_dir)
    streamed = run_available_now(
        sdf.withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        ),
        output_mode="append",
    ).collect()
    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in REGISTRY["stream_session"].fn(spark, sf_dir).collect()
    }
    assert streamed, "no sessions emitted"
    # emitted sessions must be most of the batch set (only sessions
    # still open at the final watermark are withheld)
    assert len(streamed) >= 0.9 * len(batch)
    for r in streamed:
        key = (r.user_id, r.session_start, r.session_end)
        assert key in batch and batch[key] == r.n_events, key


def test_watermark_drops_late_data(spark, tmp_path):
    """Two micro-batches: the second delivers events 2 HOURS older than
    the watermark horizon established by the first. With a 10-minute
    watermark + append-mode tumbling agg, the late rows must not
    create/extend windows in the emitted output."""
    import time

    import pandas as pd

    from s3spark.streaming import (
        events_stream,
        run_available_now,
        stream_tumbling_counts,
    )

    src = tmp_path / "late"
    src.mkdir()
    base = pd.Timestamp("2024-01-01 06:00:00")

    def mk(ids, ts_list):
        return pd.DataFrame(
            {
                "event_id": ids,
                "ts": ts_list,
                "user_id": [0] * len(ids),
                "event_type": ["click"] * len(ids),
                "value": [1.0] * len(ids),
                "props": ['{"k": 1}'] * len(ids),
            }
        )

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run():
        # parquet sink: the file sink supports checkpoint recovery
        # (memory sink does not), so watermark + offsets resume
        q = (
            stream_tumbling_counts(
                events_stream(spark, str(src)), watermark="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        spark.catalog.refreshByPath(out_dir)
        return spark.read.parquet(out_dir).collect()

    # delivery 1: 60 events across 06:00-07:00 → watermark advances ≈06:49
    mk(range(60), [base + pd.Timedelta(minutes=i) for i in range(60)]).to_parquet(
        src / "events_a.parquet"
    )
    run()
    # delivery 2: 30 events at 04:00 — far below the checkpointed
    # watermark → must be dropped from state entirely
    time.sleep(1.1)
    mk(range(100, 130), [base - pd.Timedelta(hours=2)] * 30).to_parquet(
        src / "events_b.parquet"
    )
    run()
    # delivery 3: fresh events at 08:30 push the watermark past every
    # earlier window end → those windows finally emit
    time.sleep(1.1)
    mk(range(200, 205), [base + pd.Timedelta(minutes=150 + i) for i in range(5)]).to_parquet(
        src / "events_c.parquet"
    )
    out3 = run()
    emitted = {(r.window_start, r.n_events) for r in out3}
    # the 06:00 window emits with exactly the 60 on-time events
    assert (pd.Timestamp("2024-01-01 06:00:00"), 60) in emitted, emitted
    # the 04:00 window never materialized: its rows were late-dropped
    assert not any(ws.hour == 4 for ws, _ in emitted), emitted


def test_classify_fs_error_maps_auth_failures():
    from s3spark.errors import S3InvalidCredentials
    from s3spark.fs import classify_fs_error

    e = classify_fs_error(RuntimeError("Status Code: 403; AccessDenied"))
    assert isinstance(e, S3InvalidCredentials) and e.exit_code == 202
    e = classify_fs_error(RuntimeError(
        "Unable to load credentials from any provider in the chain"))
    assert isinstance(e, S3InvalidCredentials)
    passthrough = ValueError("disk full")
    assert classify_fs_error(passthrough) is passthrough


def test_stream_dedup_result_matches_batch_distinct(spark, sf_dir):
    deduped = run_available_now(stream_dedup(events_stream(spark, sf_dir)))
    batch_n = table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert deduped.count() == batch_n


def test_scd2_intervals_tile_per_user(spark, sf_dir):
    """SCD2 invariant: per user, version intervals tile the timeline —
    each valid_to equals the next valid_from, exactly one open (NULL
    valid_to) version per user, no overlaps."""
    from s3spark.registry import REGISTRY
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    scd = REGISTRY["scd2_dimension"].fn(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("valid_from", "state")
    chained = scd.withColumn("next_from", F.lead("valid_from").over(w))
    # every closed version hands off exactly at the next version's start
    broken = chained.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert broken == 0
    open_per_user = (
        scd.filter(F.col("is_current")).groupBy("user_id").count()
        .filter(F.col("count") != 1).count()
    )
    assert open_per_user == 0
