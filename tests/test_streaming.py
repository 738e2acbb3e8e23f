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
