"""Round-4 relational extensions, batch two: null-aware anti join,
gaps-and-islands, and linear interpolation — three classic shapes the
registry did not yet exercise, each with a FULL DuckDB value oracle.

- ``join_null_aware_anti``: ``NOT IN (subquery)`` under SQL
  three-valued logic.  Catalyst plans this as a null-aware anti join
  (BroadcastHashJoin LeftAnti BuildRight, NAAJ) — a NULL probe key or
  any NULL in the build side makes the membership test UNKNOWN, so
  rows drop, unlike NOT EXISTS.  Spark only supports NAAJ as a
  broadcast: at 100 TB with a non-broadcastable subquery side the
  rewrite is a two-pass plan (any-null guard aggregate + regular anti
  join); the key pins the broadcast form and documents the rewrite.
- ``window_islands_value_runs``: gaps-and-islands via the
  row_number-difference identity.  Both windows share the customer
  hash partitioning (HashPartitioning(custkey) satisfies the
  (custkey, status) clustering requirement), so the whole op is ONE
  exchange plus two in-partition sorts — plan-gated.
- ``timeseries_interpolate_linear``: fill gaps in a daily series by
  linear interpolation between the nearest known neighbors — the
  feature-engineering upgrade of zero-fill (timeseries_gapfill) and
  forward-fill (window_forward_fill).  Neighbor lookup is two
  IGNORE NULLS window scans (last_value ascending, first_value over
  the forward frame) over a single (user) shuffle; no self-join.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections C/E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import dsum, table
from s3spark.registry import register

# --------------------------------------------------------------------------
# join_null_aware_anti
# --------------------------------------------------------------------------

_NAAJ_ORACLE = """
WITH probe AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS ck,
         o_orderpriority, o_totalprice
  FROM orders
  WHERE o_totalprice > 100000
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
FROM probe
WHERE ck NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_NAAJ_SPARK = """
WITH probe AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN CAST(NULL AS BIGINT)
              ELSE o_custkey END AS ck,
         o_orderpriority, o_totalprice
  FROM s3spark_naaj_orders
  WHERE o_totalprice > 100000
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
FROM probe
WHERE ck NOT IN (SELECT c_custkey FROM s3spark_naaj_customer
                 WHERE c_acctbal < 0)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("join_null_aware_anti", oracle=_NAAJ_ORACLE)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN anti join under three-valued logic: ~1% of probe keys are
    NULLed (o_orderkey % 97) and those rows must vanish — NULL NOT IN
    (...) is UNKNOWN — which a naive anti join gets wrong.  Catalyst
    plans the single-column not-in as a null-aware BroadcastHashJoin
    (LeftAnti, BuildRight, NAAJ).  Scale note: NAAJ exists only as a
    broadcast join in Spark; when the subquery side exceeds the
    broadcast threshold, rewrite as (a) a 1-row any-NULL aggregate on
    the build side gating the result, plus (b) a shuffled LeftAnti on
    the non-null keys — same 3VL semantics, shuffle-join scalable."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "s3spark_naaj_orders"
    )
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "s3spark_naaj_customer"
    )
    return spark.sql(_NAAJ_SPARK)


# --------------------------------------------------------------------------
# window_islands_value_runs
# --------------------------------------------------------------------------

_ISLANDS_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey)
       - ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                            ORDER BY o_orderdate, o_orderkey) AS grp
  FROM orders
)
SELECT o_custkey, o_orderstatus,
       MIN(o_orderdate) AS island_start,
       MAX(o_orderdate) AS island_end,
       COUNT(*) AS run_len
FROM seq
GROUP BY o_custkey, o_orderstatus, grp
HAVING COUNT(*) >= 3
ORDER BY o_custkey, island_start
"""


@register("window_islands_value_runs", oracle=_ISLANDS_ORACLE)
def window_islands_value_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-status orders
    per customer, via the classic row_number-difference group key (the
    global sequence minus the per-value sequence is constant exactly
    within a run).  Both window specs cluster by o_custkey, so
    Catalyst reuses ONE hash exchange for the two sorts — a run-length
    encoding of a 100 TB fact table costs a single shuffle, not a
    self-join (plan-gated in tests/test_plans.py)."""
    o = table(spark, sf_dir, "orders")
    w_all = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    w_val = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = o.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        (F.row_number().over(w_all) - F.row_number().over(w_val)).alias(
            "grp"
        ),
    )
    return (
        seq.groupBy("o_custkey", "o_orderstatus", "grp")
        .agg(
            F.min("o_orderdate").alias("island_start"),
            F.max("o_orderdate").alias("island_end"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .filter(F.col("run_len") >= 3)
        .select(
            "o_custkey",
            "o_orderstatus",
            "island_start",
            "island_end",
            "run_len",
        )
    )


# --------------------------------------------------------------------------
# timeseries_interpolate_linear
# --------------------------------------------------------------------------

_INTERP_ORACLE = """
WITH spine AS (
  SELECT u.user_id, d.day
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20) u
  CROSS JOIN (
    SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                  TIMESTAMP '2024-01-10',
                                  INTERVAL '1 day')) AS day
  ) d
),
daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS v
  FROM events
  WHERE user_id < 20 AND event_type = 'purchase'
  GROUP BY 1, 2
),
joined AS (
  SELECT s.user_id, s.day, daily.v
  FROM spine s
  LEFT JOIN daily ON daily.user_id = s.user_id AND daily.day = s.day
),
nbr AS (
  SELECT user_id, day, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM joined
)
SELECT user_id, day,
       round(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
                             / date_diff('day', pd, nd))
         ELSE NULL
       END, 6) AS v_interp
FROM nbr
ORDER BY user_id, day
"""


@register("timeseries_interpolate_linear", oracle=_INTERP_ORACLE)
def timeseries_interpolate_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear interpolation of gaps in a daily per-user series: build
    the date spine, left-join the observed daily sums, then for every
    missing day combine the nearest observed neighbors on each side,
    weighted by day distance.  Neighbor discovery is two IGNORE NULLS
    window passes (running last_value, forward first_value) over one
    (user_id) shuffle — no self-join, no driver loop; leading/trailing
    gaps (no neighbor on one side) stay NULL.  The daily sums go
    through the exact decimal path so both engines interpolate from
    bit-identical endpoints."""
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    users = e.select("user_id").distinct()
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-10").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    spine = users.crossJoin(days)
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("v"))
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    nbr = joined.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("pd"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("nd"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                F.datediff("day", "pd").cast("double")
                / F.datediff("nd", "pd")
            ),
        )
        .otherwise(F.lit(None))
    )
    return nbr.select(
        "user_id", "day", F.round(interp, 6).alias("v_interp")
    )


# --------------------------------------------------------------------------
# join_null_aware_anti_shuffled
# --------------------------------------------------------------------------


def not_in_shuffled(
    probe: DataFrame, build: DataFrame, probe_key: str, build_key: str
) -> DataFrame:
    """Rows of ``probe`` satisfying ``probe_key NOT IN (SELECT
    build_key FROM build)`` under SQL three-valued logic, WITHOUT
    broadcasting the build side: a 1-row total/non-null guard
    aggregate + a shuffled LeftAnti on the non-null keys.  NULL probe
    rows survive only when the build side is EMPTY; any build-side
    NULL empties the whole result.  The reusable core of
    ``join_null_aware_anti_shuffled`` — unit-tested on the edge cases
    directly (tests/test_relational6.py)."""
    bstats = build.agg(
        F.count(F.lit(1)).alias("__n_total"),
        F.count(build_key).alias("__n_nonnull"),
    )
    # alias-qualified join condition so probe and build may share the
    # key column name (review finding: bare F.col == F.col is ambiguous
    # for same-named keys, the natural NOT IN shape)
    anti = (
        probe.alias("__nis_p")
        .filter(F.col(probe_key).isNotNull())
        .join(
            build.alias("__nis_b")
            .filter(F.col(build_key).isNotNull())
            .hint("merge"),
            F.col(f"__nis_p.{probe_key}") == F.col(f"__nis_b.{build_key}"),
            "left_anti",
        )
    )
    survivors = anti.crossJoin(F.broadcast(bstats)).filter(
        F.col("__n_total") == F.col("__n_nonnull")
    )
    null_probe_if_empty = (
        probe.filter(F.col(probe_key).isNull())
        .crossJoin(F.broadcast(bstats))
        .filter(F.col("__n_total") == 0)
    )
    return survivors.unionByName(null_probe_if_empty).drop(
        "__n_total", "__n_nonnull"
    )


@register("join_null_aware_anti_shuffled", oracle=_NAAJ_ORACLE)
def join_null_aware_anti_shuffled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB rewrite of ``join_null_aware_anti``: identical NOT IN
    three-valued-logic semantics (same oracle) WITHOUT the broadcast
    Catalyst requires for its native NAAJ.  Decomposition:

    1. a 1-row aggregate over the build side counts total vs non-null
       keys — the scalar null/empty guard;
    2. non-null probe rows anti-join the non-null build keys as a
       plain shuffled SortMergeJoin (hint("merge"), plan-gated) —
       the scalable path, partitioned on the key;
    3. the guard gates the output: any build-side NULL empties the
       result (x NOT IN S is UNKNOWN when NULL ∈ S); NULL-probe rows
       survive ONLY when the build side is empty (NULL NOT IN {} is
       TRUE) — the edge the naive "filter nulls then anti join"
       rewrite gets wrong.

    The only broadcast is the 1-row guard; both real inputs stream
    through a hash-partitioned join, so the plan survives an
    arbitrarily large subquery side."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    probe = o.select(
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("ck"),
        "o_orderpriority",
        "o_totalprice",
    )
    build = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    return (
        not_in_shuffled(probe, build, "ck", "c_custkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )
