"""Round-12 optimization probe: isolated per-key measurement + plan capture.

Usage:
    python scripts/opt_probe.py [--plans DIR] [--suffix _before] [--reps 3] key1 key2 ...

For each key: builds the DataFrame via the registry fn (same entry the
bench uses), writes ``.explain("formatted")`` to DIR/<key><suffix>.txt
when --plans is given, and times ``reps`` noop-sink runs (guide §1.4 —
full computation, no result materialization to the driver), printing
every sample plus the median so before/after comparisons carry the
spread, not just a point.

Session construction mirrors bench.py exactly (same shuffle partitions,
same conf) so isolated numbers are comparable to BENCH_DETAIL entries.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import s3spark.queries  # noqa: F401
from s3spark.registry import REGISTRY
from s3spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--plans", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-time", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "s3spark-opt-probe",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    try:
        REGISTRY["agg_groupby"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:  # pragma: no cover
        print(f"probe: warmup failed: {e}", file=sys.stderr)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    for name in args.keys:
        q = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"opt_probe: {name}")
        if args.plans:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            print(f"{name}: plan -> {out}")
        if args.no_time:
            continue
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        ss = sorted(samples)
        med = ss[len(ss) // 2]
        print(f"{name}: median {med:.3f}s  samples {samples}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
