"""Round-4 relational-surface extensions: the three SQL shapes the
registry did not yet exercise, each with a FULL DuckDB value oracle.

- ``sql_recursive_cte``: iterative graph traversal as declarative SQL.
  Spark 4 executes ``WITH RECURSIVE`` as a bounded loop of distributed
  joins (one per hierarchy level), so a depth-d ancestor closure costs
  d shuffles over the *frontier* — never a driver loop, never an O(n²)
  self-join.  At 100 TB the frontier shrinks geometrically per level;
  this is the plan shape you want for BOM/org-chart/category-tree
  rollups.
- ``join_lateral_topk``: correlated LATERAL subquery (per-outer-row
  top-k).  Catalyst decorrelates it into the same
  Window/WindowGroupLimit plan as ``topk_per_group`` — proof the
  declarative form carries no nested-loop penalty at scale (the plan
  gate in tests/test_plans.py pins no BNLJ here).
- ``window_count_distinct``: running COUNT(DISTINCT) over an event
  stream.  Spark's window functions reject DISTINCT aggregates, so the
  engine form is the portable first-occurrence-flag identity:
  ``distinct-so-far == SUM(is_first_occurrence) OVER (running)`` with
  the flag from a second window — two hash-partitioned windows over
  the same (user) shuffle, no per-row set state.  The identical SQL
  runs on DuckDB, making an "unsupported" window aggregate fully
  value-verified.

Reference scope: the reference (amazons3_blueprints/download_file.py
etc.) has no relational surface at all (SURVEY.md §2.2); these keys
extend the mandated engine surface of SURVEY.md §2.3 sections C/E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# sql_recursive_cte
# --------------------------------------------------------------------------

_REC_SQL_DUCK = """
WITH RECURSIVE chain AS (
  SELECT p_partkey, p_partkey AS root, 0 AS depth
  FROM part WHERE p_partkey < 10
  UNION ALL
  SELECT c.p_partkey, t.root, t.depth + 1
  FROM part c JOIN chain t ON c.p_partkey // 10 = t.p_partkey
  WHERE c.p_partkey >= 10
)
SELECT root,
       COUNT(*) AS n_parts,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size
FROM chain JOIN part USING (p_partkey)
GROUP BY root
ORDER BY root
"""


@register("sql_recursive_cte", oracle=_REC_SQL_DUCK)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE over a derived part hierarchy (child p's parent is
    p DIV 10, roots are p < 10): the ancestor closure computed as
    ``WITH RECURSIVE``, then a per-root subtree rollup.

    Scale shape: Spark 4's recursive CTE executes anchor + one
    distributed join per level (UnionLoop); depth here is
    O(log10 max_key) — 4 levels at sf0.1, 7 at 100 TB-scale keys —
    and every level is an equi-join on the frontier only.  The rollup
    reuses the closure output without rescanning ``part`` n times.
    Sums stay in BIGINT (p_size) so both engines agree bit-exactly."""
    table(spark, sf_dir, "part").createOrReplaceTempView(
        "s3spark_rec_part"
    )
    return spark.sql(
        """
WITH RECURSIVE chain AS (
  SELECT p_partkey, p_partkey AS root, 0 AS depth
  FROM s3spark_rec_part WHERE p_partkey < 10
  UNION ALL
  SELECT c.p_partkey, t.root, t.depth + 1
  FROM s3spark_rec_part c JOIN chain t
    ON c.p_partkey DIV 10 = t.p_partkey
  WHERE c.p_partkey >= 10
)
SELECT chain.root AS root,
       COUNT(*) AS n_parts,
       CAST(MAX(chain.depth) AS BIGINT) AS max_depth,
       SUM(CAST(p.p_size AS BIGINT)) AS sum_size
FROM chain JOIN s3spark_rec_part p ON chain.p_partkey = p.p_partkey
GROUP BY chain.root
ORDER BY root
"""
    )


# --------------------------------------------------------------------------
# join_lateral_topk
# --------------------------------------------------------------------------

_LATERAL_SQL_DUCK = """
SELECT n.n_name AS n_name, l.c_name AS c_name, l.c_acctbal AS c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) l
ORDER BY n_name, c_acctbal DESC, c_name
"""


@register("join_lateral_topk", oracle=_LATERAL_SQL_DUCK)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: the two highest-balance customers
    per nation, written as the per-outer-row subquery a SQL user would
    write.  Catalyst decorrelates the ORDER BY ... LIMIT k lateral
    into a partitioned Window rank + WindowGroupLimit — the same
    single-shuffle plan as the explicit ``topk_per_group`` key, so
    the declarative spelling costs nothing at 100 TB (no per-row
    re-execution, no nested loop).  Tie-break on c_name keeps the
    answer total-order deterministic across engines."""
    table(spark, sf_dir, "nation").createOrReplaceTempView(
        "s3spark_lat_nation"
    )
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "s3spark_lat_customer"
    )
    return spark.sql(
        """
SELECT n.n_name AS n_name, l.c_name AS c_name, l.c_acctbal AS c_acctbal
FROM s3spark_lat_nation n, LATERAL (
  SELECT c_name, c_acctbal FROM s3spark_lat_customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) l
ORDER BY n_name, c_acctbal DESC, c_name
"""
    )


# --------------------------------------------------------------------------
# window_count_distinct
# --------------------------------------------------------------------------

_WCD_SQL_DUCK = """
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id, ts,
       CAST(SUM(first_seen) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS distinct_types_so_far
FROM flagged
ORDER BY user_id, ts, event_id
"""


@register("window_count_distinct", oracle=_WCD_SQL_DUCK)
def window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT event_type) per user — a window shape
    Spark rejects natively (no DISTINCT in window aggregates).  The
    engine identity: a row adds to the distinct count iff it is the
    FIRST occurrence of its (user, type), so distinct-so-far is a
    running SUM of a row_number()==1 flag.

    Scale shape: both windows hash-partition on user_id (the second
    re-partitions on a prefix of the first's key — one exchange in
    practice after AQE reuse), state per row is one bit + one counter,
    never a per-row hash set.  Ordering key (ts, event_id) is a total
    order, so the running sum is engine-deterministic."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select("event_id", "user_id", "ts", "event_type")
        .withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .select(
            "event_id",
            "user_id",
            "ts",
            F.sum("first_seen")
            .over(w_run)
            .cast("long")
            .alias("distinct_types_so_far"),
        )
    )


# --------------------------------------------------------------------------
# join_asof_tolerance
# --------------------------------------------------------------------------

_ASOF_TOL_SQL = """
SELECT event_id, user_id, ts,
       CASE WHEN last_purchase_ts >= ts - INTERVAL 30 MINUTE
            THEN last_purchase_ts END AS fresh_purchase_ts,
       (last_purchase_ts IS NOT NULL
        AND last_purchase_ts < ts - INTERVAL 30 MINUTE) AS is_stale
FROM (
  SELECT e.event_id, e.user_id, e.ts, p.ts AS last_purchase_ts
  FROM events e
  ASOF LEFT JOIN (
    SELECT user_id, ts FROM events WHERE event_type = 'purchase'
  ) p ON e.user_id = p.user_id AND e.ts >= p.ts
) a
ORDER BY event_id
"""


@register("join_asof_tolerance", oracle=_ASOF_TOL_SQL)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the latest same-user
    purchase at-or-before each event, but only if it is at most 30
    minutes old — older matches become NULL and are flagged stale.
    This is the feature-store serving rule (a feature older than its
    freshness SLA must not silently join; cf. pandas merge_asof's
    ``tolerance=``) on top of ``join_asof``'s union-then-window
    emulation.

    Scale shape identical to join_asof: ONE shuffle on user_id, one
    running-value window, and the tolerance is a row-local CASE after
    the window — zero extra distributed work for the SLA check."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = table(spark, sf_dir, "events")
    probes = e.select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(1).alias("kind"),
    )
    refs = e.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("ref_ts"),
        F.lit(0).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = probes.unionByName(refs).withColumn(
        "last_purchase_ts", F.last("ref_ts", ignorenulls=True).over(w)
    )
    fresh = F.col("last_purchase_ts") >= F.col("ts") - F.expr(
        "INTERVAL 30 MINUTES"
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(fresh, F.col("last_purchase_ts")).alias(
                "fresh_purchase_ts"
            ),
            (
                F.col("last_purchase_ts").isNotNull() & ~fresh
            ).alias("is_stale"),
        )
    )


# --------------------------------------------------------------------------
# sql_parameterized
# --------------------------------------------------------------------------

_PARAM_SQL_DUCK = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice >= 50000.0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_parameterized", oracle=_PARAM_SQL_DUCK)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter binding): the query
    text carries ``:status`` / ``:floor`` placeholders and values bind
    server-side via ``spark.sql(query, args=...)`` — the injection-safe
    API a SQL-facing engine must expose (values are typed literals in
    the plan, never string-spliced, so Catalyst folds and pushes them
    down exactly like hand-written constants).

    Plan shape: identical to the constant query — both predicates
    reach the parquet scan as PushedFilters; one partial+final agg
    exchange."""
    from pyspark.sql import functions as F  # noqa: F401

    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "s3spark_param_orders"
    )
    return spark.sql(
        """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
         AS total_price
FROM s3spark_param_orders
WHERE o_orderstatus = :status AND o_totalprice >= :floor
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        args={"status": "F", "floor": 50000.0},
    )
