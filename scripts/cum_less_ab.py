"""Interleaved A/B for the with_cum_less materialization change
(parquet scratch vs localCheckpoint) across its four consumer keys.

Both variants are real implementations of the SAME bucket scheme; the
new one is the working tree's, the old one re-creates HEAD's scratch
parquet round-trip.  Keys are timed noop-sink, interleaved old/new per
rep so JIT warmth is shared, and collected rows are asserted identical
on the first rep.

Usage: python scripts/cum_less_ab.py [--reps 4] key1 key2 ...
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import s3spark.queries  # noqa: F401
from s3spark.io import scratch_dir
from s3spark.queries import _prefix
from s3spark.registry import REGISTRY
from s3spark.session import get_spark

NEW_IMPL = _prefix.with_cum_less


def old_with_cum_less(spark, cells, tag):
    path = scratch_dir(tag) + "/cells"
    cells.write.mode("overwrite").parquet(path)
    cell = spark.read.parquet(path)
    # delegate the rest to the (unchanged) bucket logic by calling the
    # new impl's body on the materialized cell table: the only diff
    # between variants is HOW cells is materialized, so feed the
    # parquet-backed relation through a no-op checkpointless path.
    saved = _prefix.DataFrame.localCheckpoint
    try:
        _prefix.DataFrame.localCheckpoint = lambda self, eager=True: self
        return NEW_IMPL(spark, cell, tag)
    finally:
        _prefix.DataFrame.localCheckpoint = saved


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "s3spark-cum-less-ab",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(key, impl):
        _prefix.with_cum_less = impl
        # consumer modules imported the symbol at module level
        for mod in ("pipeline16", "pipeline22", "pipeline23"):
            m = sys.modules.get(f"s3spark.queries.{mod}")
            if m is not None and hasattr(m, "_with_cum_less"):
                m._with_cum_less = impl
        return REGISTRY[key].fn(spark, sf_dir)

    for key in args.keys:
        rows_new = sorted(map(tuple, run(key, NEW_IMPL).collect()))
        rows_old = sorted(map(tuple, run(key, old_with_cum_less).collect()))
        assert rows_new == rows_old, f"{key}: VALUES DIFFER"
        ts = {"old": [], "new": []}
        for _ in range(args.reps):
            for name, impl in (("old", old_with_cum_less), ("new", NEW_IMPL)):
                # time DF construction + sink together: BOTH variants
                # materialize eagerly during construction (parquet
                # write vs eager checkpoint), so the build is part of
                # the query cost
                t0 = time.perf_counter()
                df = run(key, impl)
                df.write.format("noop").mode("overwrite").save()
                ts[name].append(round(time.perf_counter() - t0, 3))
        mo = sorted(ts["old"])[len(ts["old"]) // 2]
        mn = sorted(ts["new"])[len(ts["new"]) // 2]
        print(
            f"{key}: old(scratch-parquet) median {mo}s {ts['old']}  "
            f"new(localCheckpoint) median {mn}s {ts['new']}  "
            f"ratio old/new {mo / mn:.2f}x  VALUES IDENTICAL"
        )

    spark.stop()


if __name__ == "__main__":
    main()
