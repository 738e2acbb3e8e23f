"""Round-13 A/B: RocksDB state store vs the default HDFS-backed
provider for the streaming-family keys (round-12 verdict item 2).

Every stateful streaming key creates a FRESH checkpoint per
invocation, so `spark.sql.streaming.stateStore.providerClass` set on
the session conf is picked up by each new query at start — one
session, interleaved reps, same JIT/codegen warmth for both variants
(the opt_ab discipline).  Row-multiset equality is asserted per key
per variant: the provider must change WHERE state lives, never what
the query emits.

Usage:
    python scripts/rocksdb_state_ab.py [--reps 3] [key ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import s3spark.queries  # noqa: F401,E402
from s3spark.registry import REGISTRY  # noqa: E402
from s3spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "stream_outer_join_watermark",
    "stream_stream_join",
    "stream_stateful_user_stats",
    "stream_watermark_dedup",
    "stream_tumbling",
    "stream_session",
]

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    keys = args.keys or DEFAULT_KEYS

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "s3spark-rocksdb-ab",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    default_provider = spark.conf.get(PROVIDER_CONF)
    print(f"default provider: {default_provider}")

    def run(key: str) -> list:
        df = REGISTRY[key].fn(spark, sf_dir)
        return sorted(map(tuple, df.collect()))

    for key in keys:
        spark.conf.set(PROVIDER_CONF, default_provider)
        base_rows = run(key)  # warm + reference values
        spark.conf.set(PROVIDER_CONF, ROCKSDB)
        rocks_rows = run(key)
        if base_rows != rocks_rows:
            print(f"{key}: VALUE MISMATCH under RocksDB provider")
            sys.exit(1)
        print(f"{key}: values identical ({len(base_rows)} rows)")
        t_def: list[float] = []
        t_rdb: list[float] = []
        for _ in range(args.reps):
            spark.conf.set(PROVIDER_CONF, default_provider)
            t0 = time.perf_counter()
            REGISTRY[key].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t_def.append(round(time.perf_counter() - t0, 3))
            spark.conf.set(PROVIDER_CONF, ROCKSDB)
            t0 = time.perf_counter()
            REGISTRY[key].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t_rdb.append(round(time.perf_counter() - t0, 3))
        spark.conf.set(PROVIDER_CONF, default_provider)
        md = sorted(t_def)[len(t_def) // 2]
        mr = sorted(t_rdb)[len(t_rdb) // 2]
        print(
            f"{key}: DEFAULT median {md:.3f}s {t_def}  "
            f"ROCKSDB median {mr:.3f}s {t_rdb}  ({md / mr:.2f}x)"
        )


if __name__ == "__main__":
    main()
