"""A/B: shingle hashing for the exact-substring dedup keys
(round-12 VERDICT item 5 / PLANS.md round-11 note).

Variant A (shipped): per position i, md5 over the materialized
50-token string ``concat_ws(' ', slice(toks, i, 50))`` — O(L) BYTE
work per position (~300-byte concat + md5 digest + string h).

Variant B (Karp-Rabin family): hash each token ONCE
(xxhash64 / murmur3, reduced mod two ~2^31 primes), then per position
fold the 50 PRE-HASHED longs through a double polynomial hash —
O(L) long multiply-adds per position, no string materialization, h is
a BIGINT.  Same plan (all map-side inside the same projection), ~50x
less byte work per position.

Why not a true O(n) rolling window: Spark's higher-order functions
have no array-scan primitive, so a per-position O(1) rolling update
needs either (a) a doc-keyed running-sum window — an EXTRA wide
shuffle before the content-hash shuffle, changing the plan the
PLANS.md row pins, or (b) mapInPandas — leaving JVM codegen and
paying Arrow transfer of the full token arrays.  Variant B already
removes the dominant constant (byte-work), keeps the plan, and stays
in codegen; that is the Spark-native optimum for this shape.

Protocol: median of 3 after 1 discarded warm-up, full
dedup_substring_exact pipeline to a noop sink at sf0.1, one quiet
process.  Collision note: B's combined 62-bit space makes a false
duplicate-pair ~n²/2^62 ≈ 1e-9 at 5k docs; a collision would desync
the engine from the md5 oracle twin and fail the driver sim — the
oracle STAYS md5 precisely so cross-engine verification keeps an
independent hash family.

Usage: python scripts/kr_shingle_ab.py  → one JSON line

MEASURED RESULT (round 12, sf0.1, quiet box): md5 WINS —
md5_full_key 1.168 s vs kr_full_key 1.398 s (0.84x), shingle-only
0.695 s vs 1.162 s (0.6x); a single-modulus KR variant was no
better.  Root cause: Spark evaluates higher-order-function lambdas
(aggregate/transform closures) INTERPRETED per element, while
md5 + concat_ws execute inside whole-stage codegen — the "cheap"
integer fold pays per-element interpreter dispatch that exceeds the
byte work it saves.  Decision: dedup_substring_exact/_mask keep md5;
the KR swap is only worth it in engines that compile the hash loop
(PLANS.md row updated with this citation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from s3spark.io import table  # noqa: E402
from s3spark.queries.pipeline24 import _SUB_L  # noqa: E402
from s3spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Two ~2^31 primes + bases: products stay < 2^62 (ANSI-safe, no
# overflow), combined h = h1 * P2 + h2 < 2^62 fits BIGINT.
P1, B1 = 2_147_483_647, 1_000_003
P2, B2 = 2_147_483_629, 131


def shingles_md5(d):
    toks = F.split("text", " ")
    return (
        d.filter(F.size(toks) >= _SUB_L)
        .select(F.col("doc_id"), toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SUB_L - 1}),"
                    " i -> named_struct('pos', CAST(i AS BIGINT),"
                    f" 'h', md5(concat_ws(' ', slice(toks, i, {_SUB_L})))))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )


def shingles_kr(d):
    toks = F.split("text", " ")
    return (
        d.filter(F.size(toks) >= _SUB_L)
        .select(F.col("doc_id"), toks.alias("toks"))
        # hash each token ONCE (hoisted projection so the per-position
        # fold reads pre-hashed longs; inlining would re-hash per i)
        .select(
            "doc_id",
            F.expr(f"transform(toks, t -> pmod(xxhash64(t), {P1}))").alias(
                "hs1"
            ),
            F.expr(
                f"transform(toks, t -> pmod(CAST(hash(t) AS BIGINT), {P2}))"
            ).alias("hs2"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(hs1) - {_SUB_L - 1}),"
                    " i -> named_struct('pos', CAST(i AS BIGINT),"
                    " 'h',"
                    f" aggregate(slice(hs1, i, {_SUB_L}), 0L,"
                    f"           (a, x) -> pmod(a * {B1} + x, {P1}))"
                    f" * {P2}"
                    f" + aggregate(slice(hs2, i, {_SUB_L}), 0L,"
                    f"             (a, x) -> pmod(a * {B2} + x, {P2}))))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )


def full_key(sh):
    """The rest of dedup_substring_exact, verbatim shape: content-hash
    count window -> per-doc gaps-and-islands -> run agg."""
    from pyspark.sql import Window

    dup = (
        sh.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .filter(F.col("n") >= 2)
        .select("doc_id", "pos")
    )
    isl = dup.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("run_start"),
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        (F.count(F.lit(1)) + (_SUB_L - 1)).cast("long").alias(
            "dup_len_tokens"
        ),
    ).select("doc_id", "run_start", "n_shingles", "dup_len_tokens")


def median3(make_df) -> float:
    make_df().write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return round(sorted(ts)[1], 3)


def main() -> None:
    spark = get_spark(
        "s3spark-kr-ab",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = table(spark, SF_DIR, "documents")

    # equality first: identical (doc_id, run_start, n_shingles,
    # dup_len_tokens) sets — a KR collision or off-by-one would
    # desync the variants
    a_rows = sorted(map(tuple, full_key(shingles_md5(d)).collect()))
    b_rows = sorted(map(tuple, full_key(shingles_kr(d)).collect()))
    assert a_rows == b_rows, (
        f"variant outputs differ: {len(a_rows)} vs {len(b_rows)} rows"
    )

    out = {
        "sf_dir": SF_DIR,
        "rows": len(a_rows),
        "md5_full_key_sec": median3(lambda: full_key(shingles_md5(d))),
        "kr_full_key_sec": median3(lambda: full_key(shingles_kr(d))),
        "md5_shingle_only_sec": median3(lambda: shingles_md5(d)),
        "kr_shingle_only_sec": median3(lambda: shingles_kr(d)),
        "protocol": "median-of-3 after discarded warm-up, noop sink, "
        "equality of full outputs asserted first",
    }
    out["full_key_speedup"] = round(
        out["md5_full_key_sec"] / out["kr_full_key_sec"], 2
    )
    out["shingle_only_speedup"] = round(
        out["md5_shingle_only_sec"] / out["kr_shingle_only_sec"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
