"""Round-11 verdict item 7: measure dq_column_profile's single-scan
Expand plan against a two-pass split (distinct-agg pass + min/max
pass) at sf0.1 and at the 10x replicated orders, so the 1-scan claim
is also checked as the FAST claim.  Prints one JSON line; the result
of record goes into PLANS.md."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import s3spark.queries  # noqa: E402,F401
from s3spark.queries.pipeline23 import _PROF_COLS  # noqa: E402
from s3spark.registry import REGISTRY  # noqa: E402
from s3spark.session import get_spark  # noqa: E402


def two_pass(spark, sf_dir: str):
    """The alternative plan: TWO scans — one aggregate holding only
    the six COUNT(DISTINCT)s (still a single Expand, but with no
    plain aggregates fanned through it), and a second plain aggregate
    for rows/nulls/min/max with no Expand at all.  The question the
    cost check answers: does hauling the 10 plain aggregates through
    the x7 Expand fan-out cost more than a second scan?"""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "pcc_orders"
    )
    nd = spark.sql(
        "SELECT "
        + ", ".join(
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}"
            for c, _, _ in _PROF_COLS
        )
        + " FROM pcc_orders"
    )
    rest_cols = []
    for c, inner, canon in _PROF_COLS:
        agg_in = inner.format(c=c)

        def _canon(v: str) -> str:
            return canon.format(
                v=v, ST="STRING", DFMT=f"date_format({v}, 'yyyy-MM-dd')"
            )

        rest_cols.append(
            f"CAST(COUNT({c}) AS BIGINT) AS nn_{c}, "
            f"{_canon(f'MIN({agg_in})')} AS mn_{c}, "
            f"{_canon(f'MAX({agg_in})')} AS mx_{c}"
        )
    rest = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
        + ", ".join(rest_cols)
        + " FROM pcc_orders"
    )
    return nd, rest


def timeit(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 4)


def main():
    # 10x orders through a x7 Expand needs more than the 1g default
    # driver heap of a bare local session (the bench/driver sessions
    # size their own); must be set before the JVM launches.
    spark = get_spark(extra_conf={"spark.driver.memory": "16g"})
    spark.range(10).count()
    out = {}
    for label, sf_dir in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1_replicated", "/tmp/s3spark-sf1"),
    ):
        if not os.path.isdir(sf_dir):
            out[label] = None
            continue
        key_fn = REGISTRY["dq_column_profile"].fn

        def run_expand():
            key_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        def run_two_pass():
            nd, rest = two_pass(spark, sf_dir)
            nd.write.format("noop").mode("overwrite").save()
            rest.write.format("noop").mode("overwrite").save()

        out[label] = {
            "expand_one_scan": timeit(run_expand),
            "two_pass_split": timeit(run_two_pass),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
