"""A/B: interpreted HOF fold dot product vs unrolled codegen sum.

Hypothesis (guide §4.1 + the round-12 Karp-Rabin lesson): Spark
evaluates higher-order-function lambdas INTERPRETED per element, while
a literal 64-term `a[0]*b[0] + ... + a[63]*b[63]` chain stays inside
whole-stage codegen.  Equality is asserted bitwise on the full pair
output before timing (the fold is a sequential left fold seeded 0.0;
the unrolled chain is the identical left-associated Add tree, so IEEE
doubles agree exactly, not just to 6 dp).

Run: python scripts/dot_unroll_ab.py  [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DIM = 64


def fold_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def unrolled_dot(a, b):
    acc = F.lit(0.0)
    for i in range(DIM):
        acc = acc + a[i].cast("double") * b[i].cast("double")
    return acc


def build(dot):
    e = table(spark, SF, "embeddings").filter(F.col("vec_id") < 500)
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", dot(F.col("va"), F.col("vb")).alias("d"))
    )


spark = get_spark(
    "dot-ab",
    shuffle_partitions=8,
    extra_conf={"spark.ui.enabled": "false"},
)
spark.sparkContext.setLogLevel("ERROR")

# equality gate first: bitwise-identical dot per pair
diff = (
    build(fold_dot).withColumnRenamed("d", "d1")
    .join(build(unrolled_dot).withColumnRenamed("d", "d2"), ["vec_a", "vec_b"])
    .filter("d1 IS DISTINCT FROM d2")
    .count()
)
print(f"pairs with differing dots: {diff}")
assert diff == 0, "unrolled dot is NOT bit-identical to the fold"

for name, dot in (("fold", fold_dot), ("unrolled", unrolled_dot)):
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        build(dot).write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: {sorted(samples)[1]:.3f}s median, samples {samples}")
