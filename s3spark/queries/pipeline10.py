"""Round-6 SQL-surface batch: SQL-defined functions (scalar + table),
SQL scripting, and dynamic SQL — the Spark 4 SQL-facing APIs a user
of a SQL engine reaches for before ever writing Python.

- ``sql_udf_scalar``: CREATE TEMPORARY FUNCTION with a SQL body used
  inside an aggregate — Catalyst INLINES it (it is a macro, not a
  black box), so the plan is identical to hand-written SQL: no
  Python eval, codegen intact.
- ``sql_udf_table``: a SQL table function (RETURNS TABLE) driving a
  join — the reusable parameterized-view pattern.
- ``sql_scripting_batch``: BEGIN/DECLARE/SET scripting (Spark 4 SQL
  scripting) — a variable computed from one query parameterizes the
  next, all inside the engine.
- ``sql_execute_immediate``: dynamic SQL via EXECUTE IMMEDIATE with
  positional USING binds — runtime-assembled query text with
  injection-safe typed parameters.

Probes (this round): scalar/table SQL UDFs, EXECUTE IMMEDIATE (bare
and USING), and BEGIN/DECLARE/SET scripting all work on Spark 4.1.2
here; RETURNS TABLE bodies reject non-foldable range() arguments but
accept parameterized filters over real tables.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 section on
SQL-API parity per the north star's engine mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# sql_udf_scalar
# --------------------------------------------------------------------------

_UDF_SCALAR_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     AS DECIMAL(25,6))) AS DOUBLE) AS net_revenue
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("sql_udf_scalar", oracle=_UDF_SCALAR_ORACLE)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL-bodied scalar function (CREATE TEMPORARY FUNCTION ...
    RETURN <expr>) computing discounted net revenue, used inside a
    grouped aggregate.

    Engine shape: SQL UDFs are MACROS — Catalyst inlines the body at
    analysis time, so the executed plan is bit-identical to writing
    the expression inline (plan-gated: no Python eval, partial
    aggregation intact).  This is the "shared business logic without
    the UDF tax" path; the decimal(18,2)→(25,6) lifts keep the sum
    exact and order-independent, same as every davg/dsum key."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "s3spark_sqludf_lineitem"
    )
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY FUNCTION s3spark_net_rev(p DOUBLE, d DOUBLE)
RETURNS DECIMAL(25,6)
RETURN CAST(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))
            AS DECIMAL(25,6))
"""
    )
    return spark.sql(
        """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(s3spark_net_rev(l_extendedprice, l_discount)) AS DOUBLE)
         AS net_revenue
FROM s3spark_sqludf_lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
    )


# --------------------------------------------------------------------------
# sql_udf_table
# --------------------------------------------------------------------------

_UDF_TABLE_ORACLE = """
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
WHERE n.n_regionkey = 2
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register("sql_udf_table", oracle=_UDF_TABLE_ORACLE)
def sql_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL table function (RETURNS TABLE) — a parameterized view of
    one region's nations — driving a customer join.

    Engine shape: the TVF body inlines like any view, so the region
    filter lands in the nation scan as a pushed filter (plan-gated)
    and the join plans exactly as the hand-written equivalent —
    broadcast hash join on the dim.  Parameterized reusable relations
    without materialization or Python."""
    table(spark, sf_dir, "nation").createOrReplaceTempView(
        "s3spark_sqludf_nation"
    )
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "s3spark_sqludf_customer"
    )
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY FUNCTION s3spark_nations_of(r INT)
RETURNS TABLE(n_name STRING, nationkey BIGINT)
RETURN SELECT n_name, n_nationkey FROM s3spark_sqludf_nation
       WHERE n_regionkey = r
"""
    )
    return spark.sql(
        """
SELECT n.n_name, COUNT(*) AS n_customers
FROM s3spark_nations_of(2) n
JOIN s3spark_sqludf_customer c ON c.c_nationkey = n.nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""
    )


# --------------------------------------------------------------------------
# sql_scripting_batch
# --------------------------------------------------------------------------

_SCRIPTING_ORACLE = """
WITH m AS (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
           / COUNT(*) AS floor_price
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_above
FROM orders, m
WHERE o_totalprice > m.floor_price
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_scripting_batch", oracle=_SCRIPTING_ORACLE)
def sql_scripting_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (BEGIN/DECLARE/SET): a session variable takes
    the mean order value from one query and parameterizes the next —
    the multi-statement ETL-step shape (compute a stat, then act on
    it) expressed entirely in the engine's SQL dialect.

    The variable is a scalar computed with the davg recipe (exact
    decimal sum → double ÷ count), so both engines derive the
    bit-identical threshold before the > comparison — the filter is
    deterministic even though order totals sit arbitrarily close to
    the mean.  Result is the script's final SELECT."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "s3spark_script_orders"
    )
    return spark.sql(
        """
BEGIN
  DECLARE floor_price DOUBLE DEFAULT 0;
  SET floor_price = (
    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             / COUNT(*)
    FROM s3spark_script_orders);
  SELECT o_orderpriority, COUNT(*) AS n_above
  FROM s3spark_script_orders
  WHERE o_totalprice > floor_price
  GROUP BY o_orderpriority
  ORDER BY o_orderpriority;
END
"""
    )


# --------------------------------------------------------------------------
# sql_execute_immediate
# --------------------------------------------------------------------------

_EXEC_IMM_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_totalprice >= 150000 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("sql_execute_immediate", oracle=_EXEC_IMM_ORACLE)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic SQL: the query text is assembled at runtime and run
    via EXECUTE IMMEDIATE with positional USING binds — the
    injection-safe path for generated queries (the values travel as
    typed parameters, never string-spliced).

    Complements sql_parameterized (named-parameter binding through
    the session API): here the BINDING is in the SQL dialect itself.
    Parameters reach the scan as pushed filters exactly like
    hand-written constants."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "s3spark_exec_orders"
    )
    inner = (
        "SELECT o_orderpriority, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) "
        "AS total_price "
        "FROM s3spark_exec_orders "
        "WHERE o_totalprice >= ? AND o_orderstatus = ? "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    return spark.sql(
        f"EXECUTE IMMEDIATE '{inner}' USING 150000.0D, 'F'"
    )
