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


def test_stream_dedup_result_matches_batch_distinct(spark, sf_dir):
    deduped = run_available_now(stream_dedup(events_stream(spark, sf_dir)))
    batch_n = table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert deduped.count() == batch_n
