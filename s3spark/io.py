"""Table loading + oracle-safe aggregate helpers.

Fixture tables (TESTDATA.md) are one parquet file per table per scale
factor.  At 100 TB these would be partitioned parquet datasets under an
``s3a://`` prefix — ``table()`` takes any directory/prefix, so the same
code path serves both.

``dsum``/``davg`` route floating-point SUM/AVG through DECIMAL(25,6):
the fixture measures carry 2 decimal places, so the cast is exact, and
decimal summation is associative — the result is identical regardless
of partitioning/summation order on both Spark and DuckDB.  This removes
the float-drift failure mode called out in SURVEY.md §7 while keeping
full parallelism (decimal sums still use partial aggregation + AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEC = "decimal(25,6)"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (parquet file or partitioned directory).

    The events fixture stores TIMESTAMP(NANOS) which Spark's parquet
    reader rejects ([PARQUET_TYPE_ILLEGAL]); read nanos as long and
    convert to a microsecond timestamp (matching DuckDB's own ns→µs
    coercion) so downstream code sees a plain TimestampType column.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col: Column | str) -> Column:
    """Order-independent SUM for double columns (exact decimal path)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"
