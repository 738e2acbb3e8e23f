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

import atexit
import shutil
import tempfile

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


# events fixture footer schema for generators that emit
# ts:TIMESTAMP(NANOS), requested as LongType — the reader serves the
# raw int64 nanos under an explicit schema, so no session conf
# (nanosAsLong) ever has to be mutated.
_EVENTS_NANOS_SCHEMA = (
    "event_id long, ts long, user_id long, "
    "event_type string, value double, props string"
)


def events_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the events table, tolerant of the fixture's timestamp
    physical type.

    Fixture generators have shipped ``ts`` as both TIMESTAMP(MICROS)
    (readable directly) and TIMESTAMP(NANOS), which Spark's parquet
    reader rejects ([PARQUET_TYPE_ILLEGAL]).  Probe with a normal read
    first — schema inference reads only footers, so the probe is cheap
    and fails fast on nanos — then fall back to an explicit int64
    schema and convert ns→µs (matching DuckDB's coercion).  Both paths
    are scoped to this read: no session conf (nanosAsLong) is toggled,
    so other parquet reads in the same session keep their semantics.
    """
    try:
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanosAsLong happened to be set session-wide by the caller
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # normalize to TIMESTAMP_LTZ: unix_micros()/watermarks
            # require it, and with the UTC session timezone the cast
            # is value-preserving
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    except Exception:
        df = spark.read.schema(_EVENTS_NANOS_SCHEMA).parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (parquet file or partitioned directory)."""
    if name == "events":
        return events_table(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SCRATCH: dict[str, str] = {}


def _cleanup_scratch() -> None:
    for d in _SCRATCH.values():
        shutil.rmtree(d, ignore_errors=True)


def scratch_dir(tag: str, fresh: bool = False) -> str:
    """Process-lifetime scratch directory, one per tag.

    Query operators that materialize intermediate files (format
    round-trips, partitioned layouts, text corpora) reuse the same
    directory across invocations — every writer there uses
    mode("overwrite") — instead of leaking a fresh mkdtemp per call;
    everything is removed at interpreter exit.

    ``fresh=True`` returns a new subdirectory under the tag's root on
    every call (streaming checkpoints must never be shared between
    queries) while still being cleaned up at exit."""
    d = _SCRATCH.get(tag)
    if d is None:
        if not _SCRATCH:
            atexit.register(_cleanup_scratch)
        d = tempfile.mkdtemp(prefix=f"s3spark-{tag}-")
        _SCRATCH[tag] = d
    if fresh:
        return tempfile.mkdtemp(dir=d)
    return d


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
