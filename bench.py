"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as plan-build + execution to completion via a
count/collect-free action: ``df.write.format("noop")`` exercises the
full pipeline without materializing results into the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import s3spark.queries  # noqa: E402,F401
from s3spark.registry import REGISTRY  # noqa: E402
from s3spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        "s3spark-bench",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not first-touch JIT/IO.
    try:
        REGISTRY["agg_groupby"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:
        print(f"bench: warmup failed: {e}", file=sys.stderr)

    times: dict[str, float] = {}
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # pragma: no cover - bench robustness
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            times[name] = -1.0
    total = round(sum(t for t in times.values() if t > 0), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
