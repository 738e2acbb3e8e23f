"""Spark 4 SQL-surface keys: pipe syntax and error-safe (`try_*`)
arithmetic — API-parity coverage for SQL-facing users of the engine.

- ``sql_pipe_syntax``: the same aggregation expressed in Spark 4's
  SQL pipe syntax (``FROM t |> WHERE ... |> AGGREGATE ...``).  Pipe
  operators are pure parser sugar — Catalyst produces the identical
  plan as the ANSI form (pushdown, partial aggregation, the lot), so
  the key certifies the surface costs nothing at scale.  The DuckDB
  oracle is the ANSI equivalent.
- ``scalar_try_error_safe``: ANSI-mode error-safe functions
  (``try_divide`` / ``try_multiply`` / ``try_element_at``) — the
  ingestion posture for dirty data at 100 TB, where one bad row must
  yield NULL, not kill a 1000-executor stage.  Division by zero,
  BIGINT overflow, and out-of-bounds list access each produce NULL
  per-row; the oracle reproduces the semantics with explicit CASE
  guards (DuckDB's BIGINT overflow throws, so the oracle computes in
  HUGEINT and gates on the 2^63-1 bound).

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no SQL surface; these extend SURVEY.md §2.3 section H/§2.3's SQL
API parity line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# sql_pipe_syntax
# --------------------------------------------------------------------------

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
         AS sum_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
ORDER BY l_returnflag, l_linestatus
"""

_PIPE_SPARK = """
FROM s3spark_pipe_lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
|> AGGREGATE COUNT(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
               AS sum_price
   GROUP BY l_returnflag, l_linestatus
|> WHERE n_rows > 10
|> SELECT l_returnflag, l_linestatus, n_rows, sum_qty, sum_price
|> ORDER BY l_returnflag, l_linestatus
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax: linear ``|>`` stages instead of nested
    SELECT — the flagship-style aggregation with a post-aggregation
    filter (pipe WHERE after AGGREGATE == HAVING).  Parser-level sugar
    only: the shipdate predicate still reaches the parquet scan and
    the aggregate still partial-aggregates map-side, identical to the
    ANSI plan the oracle runs."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "s3spark_pipe_lineitem"
    )
    return spark.sql(_PIPE_SPARK)


# --------------------------------------------------------------------------
# scalar_try_error_safe
# --------------------------------------------------------------------------

_TRY_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 3 THEN NULL
            ELSE round(doc_id / CAST(doc_id % 7 - 3 AS DOUBLE), 6) + 0.0
       END AS safe_div,
       CASE WHEN CAST(3037000499 + doc_id % 2 AS HUGEINT)
                 * (3037000500 + doc_id % 2) > 9223372036854775807
            THEN NULL
            ELSE CAST(CAST(3037000499 + doc_id % 2 AS HUGEINT)
                      * (3037000500 + doc_id % 2) AS BIGINT)
       END AS safe_mul,
       string_split(text, ' ')[50] AS token50
FROM documents
ORDER BY doc_id
"""

_TRY_SPARK = """
SELECT doc_id,
       round(try_divide(doc_id, CAST(doc_id % 7 - 3 AS DOUBLE)), 6) + 0.0
         AS safe_div,
       try_multiply(3037000499 + doc_id % 2,
                    3037000500 + doc_id % 2) AS safe_mul,
       try_element_at(split(text, ' '), 50) AS token50
FROM s3spark_try_documents
"""


@register("scalar_try_error_safe", oracle=_TRY_ORACLE)
def scalar_try_error_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar family: division by zero (every doc_id % 7 ==
    3 row), BIGINT overflow (odd doc_ids push the product past 2^63-1
    — the factors straddle floor(sqrt(2^63))), and out-of-bounds list
    access (docs shorter than 50 tokens) all yield NULL instead of a
    stage-killing exception.  All three are row-local codegen
    expressions — the safety costs no shuffle and no Python.  DuckDB
    lacks try semantics for overflow, so the oracle computes the
    product in HUGEINT and gates on the BIGINT bound explicitly."""
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "s3spark_try_documents"
    )
    return spark.sql(_TRY_SPARK)


# --------------------------------------------------------------------------
# scalar_collation_groupby
# --------------------------------------------------------------------------

_COLLATE_ORACLE = """
WITH t AS (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
              ELSE o_orderpriority END AS s,
         o_totalprice
  FROM orders
)
SELECT lower(s) AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
FROM t
WHERE lower(s) IN ('1-urgent', '2-high')
GROUP BY lower(s)
ORDER BY priority
"""

_COLLATE_SPARK = """
WITH t AS (
  SELECT CASE WHEN o_orderkey % 2 = 0 THEN lower(o_orderpriority)
              ELSE o_orderpriority END AS s,
         o_totalprice
  FROM s3spark_collate_orders
)
SELECT lower(min(s)) AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price
FROM t
WHERE s COLLATE UTF8_LCASE IN ('1-urgent', '2-high')
GROUP BY s COLLATE UTF8_LCASE
ORDER BY priority
"""


@register("scalar_collation_groupby", oracle=_COLLATE_ORACLE)
def scalar_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation support: case-insensitive filtering and
    grouping via ``COLLATE UTF8_LCASE`` on a deliberately mixed-case
    column (half the priorities lowercased by key parity) — the
    engine-level answer to scattering lower() into every predicate.
    Collation-aware equality rides hash joins/aggregations natively
    (the collation key is part of the grouping hash).  The group
    label is canonicalized with lower(min(s)): all members of an
    LCASE group are case variants of one string, so the label is
    deterministic even though min over collated ties is not.  The
    oracle expresses the identical semantics with explicit lower()."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "s3spark_collate_orders"
    )
    return spark.sql(_COLLATE_SPARK)


# --------------------------------------------------------------------------
# sql_transpose
# --------------------------------------------------------------------------

_TRANSPOSE_ORACLE = """
WITH m AS (
  SELECT o_orderpriority AS p,
         CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
           AS sum_price
  FROM orders GROUP BY 1
)
SELECT 'n_orders' AS key,
       MAX(CASE WHEN p = '1-URGENT' THEN n_orders END) AS "1-URGENT",
       MAX(CASE WHEN p = '2-HIGH' THEN n_orders END) AS "2-HIGH",
       MAX(CASE WHEN p = '3-MEDIUM' THEN n_orders END) AS "3-MEDIUM",
       MAX(CASE WHEN p = '4-NOT SPECIFIED' THEN n_orders END)
         AS "4-NOT SPECIFIED",
       MAX(CASE WHEN p = '5-LOW' THEN n_orders END) AS "5-LOW"
FROM m
UNION ALL
SELECT 'sum_price',
       MAX(CASE WHEN p = '1-URGENT' THEN sum_price END),
       MAX(CASE WHEN p = '2-HIGH' THEN sum_price END),
       MAX(CASE WHEN p = '3-MEDIUM' THEN sum_price END),
       MAX(CASE WHEN p = '4-NOT SPECIFIED' THEN sum_price END),
       MAX(CASE WHEN p = '5-LOW' THEN sum_price END)
FROM m
ORDER BY key
"""


@register("sql_transpose", oracle=_TRANSPOSE_ORACLE)
def sql_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``DataFrame.transpose()``: flip a SMALL aggregated
    metrics frame so metrics become rows and group values become
    columns — the presentation-layer complement of pivot/unpivot.
    Transpose must enumerate the index values to name the output
    columns (an inherent driver-side step), so the engine rule is:
    aggregate FIRST (5 groups here), transpose the summary — never a
    fact table.  Metrics are pre-cast to a common double type, which
    transpose requires.  The oracle builds the same transposed shape
    with conditional aggregation + UNION ALL."""
    from pyspark.sql import functions as F

    o = table(spark, sf_dir, "orders")
    from s3spark.io import dsum

    m = (
        o.groupBy(F.col("o_orderpriority").alias("p"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )
    # no pre-sort: transpose() orders the index values itself
    return m.transpose().orderBy("key")
