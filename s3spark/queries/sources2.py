"""Custom-source and remaining-semantics coverage: the Spark 4 Python
DataSource API (a user-defined partitioned source), null-safe join
equality, and array aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "source_python_datasource",
    oracle="""
SELECT CAST(i // 1000 AS INTEGER) AS part,
       COUNT(*) AS n,
       CAST(SUM((i * 2654435761) % 10000) AS BIGINT) AS total_size
FROM generate_series(0, 3999) t(i)
GROUP BY part
ORDER BY part
""",
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined source via the Python DataSource API (Spark 4):
    a deterministic 4-partition generator standing in for any system
    Spark lacks a connector for (an inventory API, a proprietary
    catalog).  Each InputPartition reads independently on executors —
    the same contract as a file split, so scans parallelize and
    downstream ops see an ordinary DataFrame."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class InventorySource(DataSource):
        @classmethod
        def name(cls):
            return "s3spark_inventory"

        def schema(self):
            return "id long, part int, size long"

        def reader(self, schema):
            class Reader(DataSourceReader):
                def partitions(self):
                    return [InputPartition(i) for i in range(4)]

                def read(self, partition):
                    base = partition.value * 1000
                    for i in range(base, base + 1000):
                        yield (i, partition.value, (i * 2654435761) % 10000)

            return Reader()

    spark.dataSource.register(InventorySource)
    df = spark.read.format("s3spark_inventory").load()
    return (
        df.groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("size").alias("total_size"))
        .orderBy("part")
    )


@register(
    "join_null_safe",
    oracle="""
WITH l AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderkey % 7 END AS grp
  FROM orders WHERE o_orderkey < 2000
),
r AS (
  SELECT DISTINCT CASE WHEN g = 7 THEN NULL ELSE g END AS grp,
         COALESCE(CASE WHEN g = 7 THEN NULL ELSE g END, -1) * 100 AS bonus
  FROM generate_series(0, 7) t(g)
)
SELECT l.o_orderkey, r.bonus
FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
ORDER BY l.o_orderkey
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe join equality (`<=>` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of dropping — required for joining
    on nullable dimension attributes without a COALESCE sentinel
    rewrite.  Spark plans it as an ordinary hash join (null-safe
    comparison is still an equi key), not a nested loop."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    l = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_orderkey") % 7)
        .alias("grp"),
    )
    r = (
        spark.range(0, 8)
        .select(
            F.when(F.col("id") == 7, F.lit(None).cast("long"))
            .otherwise(F.col("id"))
            .alias("grp")
        )
        .distinct()
        .select("grp", (F.coalesce(F.col("grp"), F.lit(-1)) * 100).alias("bonus"))
    )
    return (
        l.join(F.broadcast(r), l.grp.eqNullSafe(r.grp))
        .select("o_orderkey", "bonus")
    )


@register(
    "agg_collect_array",
    oracle="""
SELECT c_mktsegment,
       array_to_string(
         list_transform(list_sort(list(DISTINCT c_nationkey)),
                        x -> CAST(x AS VARCHAR)),
         ',') AS nations,
       COUNT(*) AS n_custs
FROM customer
WHERE c_custkey < 500
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def agg_collect_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_set + array_sort (sorted for
    determinism — collect order is partition-dependent, the sort makes
    the VALUE canonical), emitted as a canonical CSV string so every
    output cell is a hashable scalar for the binding harness (list
    cells break its pandas sort-then-hash — round-4 driver err class).
    The nested-result shape feature pipelines use to pack per-group
    context into one row.  Bounded: distinct nation keys per segment,
    never the raw rows."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("c_nationkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("nations"),
            F.count(F.lit(1)).alias("n_custs"),
        )
        .orderBy("c_mktsegment")
    )
