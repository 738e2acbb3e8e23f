"""Advanced relational operators: pivot, exact percentiles,
correlation, ordered string aggregation, array set algebra,
continuous-aggregate reuse, and the upsert/merge pattern.

These round out the §2.3 surface with the shapes real pipelines hit
weekly but basic suites skip; each still carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import DEC, dsum, sql_dsum, table
from s3spark.registry import register


@register(
    "pivot_status_counts",
    oracle=f"""
SELECT
  o_orderpriority,
  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p,
  {sql_dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END")} AS total_f
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): order counts per priority × status.  Spark's
    pivot with an explicit value list is a single pass (one partial
    agg per (group, pivot-value)); never pivot on unbounded-cardinality
    columns at scale — the column explosion is the killer, not the
    shuffle."""
    o = table(spark, sf_dir, "orders")
    counts = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )
    totals = o.groupBy("o_orderpriority").agg(
        dsum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(
                0.0
            )
        ).alias("total_f")
    )
    return counts.join(totals, "o_orderpriority").orderBy("o_orderpriority")


@register(
    "agg_percentiles",
    oracle="""
SELECT
  c_mktsegment,
  round(quantile_cont(c_acctbal, 0.25), 6) AS p25,
  round(quantile_cont(c_acctbal, 0.50), 6) AS p50,
  round(quantile_cont(c_acctbal, 0.75), 6) AS p75
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, both linear interpolation).  Exact percentiles
    need the full sorted group — at 100 TB use approx_percentile
    (t-digest sketch, mergeable) unless exactness is contractual."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(c_acctbal, 0.50)"), 6).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.75)"), 6).alias("p75"),
        )
        .orderBy("c_mktsegment")
    )


# Pearson r as the covar/stddev composition with an explicit
# zero-variance branch: Spark's builtin corr() performs its final
# division unconditionally, and under ANSI (the Spark 4 default) a
# zero-variance group THROWS DIVIDE_BY_ZERO where DuckDB's corr()
# returns NULL — the round-9 degenerate-denominator class, found by
# the same hypothesis sweep.  The composition is corr's own formula
# over the same one-pass covar/M2 state, so fixture values are
# unchanged at the 6 dp contract.
_CORR_GUARDED = """CASE
  WHEN stddev_samp(l_quantity) = 0 OR stddev_samp(l_extendedprice) = 0
  THEN CAST(NULL AS DOUBLE)
  ELSE covar_samp(l_quantity, l_extendedprice)
       / (stddev_samp(l_quantity) * stddev_samp(l_extendedprice))
END"""


@register(
    "agg_corr_stddev",
    oracle=f"""
SELECT
  l_returnflag,
  round({_CORR_GUARDED}, 6) AS qty_price_corr,
  round(stddev_samp(l_extendedprice), 4) AS price_stddev,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_corr_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: Pearson correlation (scale-free, stable
    at 6 dp) and sample stddev (rounded to 4 dp — the one aggregate
    family where float summation order genuinely matters; both engines
    use numerically-stable one-pass updates).

    The correlation is the covar_samp/(σx·σy) composition with an
    explicit zero-variance NULL branch in SHARED text: ANSI Spark's
    builtin corr() throws DIVIDE_BY_ZERO on a constant column where
    DuckDB returns NULL (a degenerate cohort must not crash the job);
    a 1-row group yields NULL on both engines through the same
    NULL-propagating ELSE."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr(_CORR_GUARDED), 6).alias("qty_price_corr"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_string_ordered",
    oracle="""
SELECT
  c_mktsegment,
  string_agg(c_name, ',' ORDER BY c_name) AS names_csv
FROM customer
WHERE c_custkey < 40
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def agg_string_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list has NO deterministic
    order in a distributed engine, so the portable form is
    sort-then-join (array_sort ∘ collect_list) — equivalent to
    string_agg(... ORDER BY)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 40)
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names_csv"
            )
        )
        .orderBy("c_mktsegment")
    )


@register(
    "array_set_algebra",
    oracle="""
SELECT
  p_partkey,
  len(list_filter(range(1, p_size + 1), x -> list_contains(range(2, 9), x)))
    AS n_inter,
  len(range(1, p_size + 1))
    + len(list_filter(range(2, 9), x -> NOT list_contains(range(1, p_size + 1), x)))
    AS n_union,
  len(list_filter(range(1, p_size + 1), x -> NOT list_contains(range(2, 9), x)))
    AS n_except,
  p_size AS seq_len
FROM part
WHERE p_partkey < 300
ORDER BY p_partkey
""",
)
def array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (intersect/union/except cardinalities) over
    generated sequences — DuckDB lacks list_intersect, so the oracle
    expresses the same algebra with list_filter/list_contains;
    elements are distinct so the semantics coincide.  DuckDB range()
    is end-exclusive; Spark sequence() is inclusive — bounds adjusted."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    a = F.sequence(F.lit(1), F.col("p_size"))
    b = F.sequence(F.lit(2), F.lit(8))
    return p.select(
        "p_partkey",
        F.size(F.array_intersect(a, b)).cast("long").alias("n_inter"),
        F.size(F.array_union(a, b)).cast("long").alias("n_union"),
        F.size(F.array_except(a, b)).cast("long").alias("n_except"),
        F.size(a).cast("long").alias("seq_len"),
    )


@register(
    "rollup_reuse_hourly_daily",
    oracle=f"""
SELECT
  time_bucket(INTERVAL '1 day', ts) AS day,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1
ORDER BY day
""",
)
def rollup_reuse_hourly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate pattern (hypertable-style rollup): the
    hourly rollup is materialized once, and coarser grains (daily)
    aggregate the ROLLUP, not the raw events — at 100 TB the daily
    query reads |hours| rows instead of |events|.  Decimal partials
    re-aggregate exactly, so daily-from-hourly equals daily-from-raw
    bit-for-bit (the oracle computes it from raw)."""
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("value_dec"),
        )
        .select(F.col("w.start").alias("hour"), "n_events", "value_dec")
    )
    hourly.cache()  # materialized rollup stand-in
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_dec").cast("double").alias("total_value"),
        )
        .orderBy("day")
    )


@register(
    "agg_regression",
    oracle="""
SELECT
  l_returnflag,
  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit via the built-in regression
    aggregates (price ~ quantity per return flag) — the distributed
    one-pass sufficient-statistics form (sums of x, y, xy, x²), which
    is why it scales: state per group is 6 numbers.  Rounded to the
    precision the float accumulation order supports."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 2
            ).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram",
    oracle="""
SELECT
  CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
  COUNT(*) AS n,
  round(MIN(o_totalprice), 2) AS lo,
  round(MAX(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
ORDER BY bucket
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (50k buckets over order price) — the
    map-side-combinable profile query used for skew detection before
    choosing partition/bucket columns."""
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


_UPSERT_CASE = (
    "CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 "
    "ELSE o_totalprice END"
)


@register(
    "merge_upsert",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum(_UPSERT_CASE)} AS total_after,
       COUNT(*) FILTER (o_orderkey % 10 = 0) AS n_updated
FROM orders
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert/MERGE over immutable object storage: updates (+100 on
    every 10th order) are applied as anti-join(target, updates) ∪
    updates — the rewrite pattern for parquet-on-S3 without a table
    format; with Delta/Iceberg the same logic is MERGE INTO.  The
    checksum proves exactly the updated rows changed."""
    o = table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 100
    )
    untouched = o.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = untouched.unionByName(updates)
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice").alias("total_after"),
        F.count(F.when(F.col("o_orderkey") % 10 == 0, 1)).alias("n_updated"),
    )
