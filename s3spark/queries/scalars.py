"""Scalar function surface (SURVEY.md §2.3-H): one composite query per
family — string, date, math, array (incl. higher-order), map/JSON.

These generalize the reference's only scalar work — key-string
manipulation (SURVEY.md §2.1 R12-R15) — to the full expression
language.  Everything is a built-in ``pyspark.sql.functions`` call
(JVM-side, codegen'd); no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "scalar_string",
    oracle="""
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  lower(p_brand) AS brand_lower,
  length(p_name) AS name_len,
  substr(p_name, 1, 5) AS name_head,
  concat(p_brand, ':', p_type) AS brand_type,
  trim('  ' || p_name || ' ') AS trimmed,
  replace(p_name, ' ', '_') AS snake,
  split_part(p_name, ' ', 1) AS first_word,
  regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
  regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
""",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, length, substring, concat, trim, replace,
    split, regexp extract/replace, lpad (R12-R15 semantics live here)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "scalar_date",
    oracle="""
SELECT
  o_orderkey,
  year(o_orderdate) AS yr,
  month(o_orderdate) AS mo,
  day(o_orderdate) AS dy,
  dayofweek(o_orderdate) AS dow,
  date_trunc('month', o_orderdate) AS month_start,
  datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
  o_orderdate + INTERVAL 30 DAY AS due_ts,
  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
  strftime(o_orderdate, '%Y-%m-%d') AS iso_day
FROM orders
WHERE o_orderkey <= 2000
""",
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: extract, trunc, diff, add-interval, epoch,
    format, cast-to-date. (Spark dayofweek and DuckDB dayofweek are
    both 1=Sunday-based... DuckDB's is 0=Sunday, so the oracle uses
    dayofweek()+1 alignment — see inline expression.)"""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@register(
    "scalar_math",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  round(l_extendedprice, 6) AS price_r,
  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
  abs(l_discount - 0.05) AS disc_dev,
  round(sqrt(l_extendedprice), 6) AS price_sqrt,
  round(ln(l_extendedprice), 6) AS price_ln,
  round(log10(l_extendedprice), 6) AS price_log10,
  round(pow(l_quantity, 2), 6) AS qty_sq,
  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
  CAST(l_quantity AS BIGINT) AS qty_int
FROM lineitem
WHERE l_orderkey <= 1000
""",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Transcendentals (sqrt/ln/log10/pow) are rounded to
    6 dp inside the query: libm vs JVM may differ in the last ulp."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 6).alias("price_r"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.col("l_quantity").cast("long").alias("qty_int"),
    )


@register(
    "scalar_array",
    oracle="""
SELECT
  vec_id,
  label,
  len(embedding) AS dim,
  round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6) AS vec_sum,
  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max'), 6) AS vec_max,
  len(list_filter(embedding, x -> x > 0)) AS n_positive,
  round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS smallest
FROM embeddings
""",
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order functions (transform / filter /
    aggregate) over the 64-dim embedding column — the exact HOF tool
    kit the similarity operators build on."""
    e = table(spark, sf_dir, "embeddings")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(dvec, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(F.array_max(dvec), 6).alias("vec_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0))
        .cast("long")
        .alias("n_positive"),
        F.round(F.array_min(F.col("embedding")).cast("double"), 6).alias("smallest"),
    )


@register(
    "scalar_map_json",
    oracle="""
SELECT
  event_id,
  CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
  CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
  json_array_length(json_keys(props)) > 0 AS has_keys
FROM events
WHERE event_id <= 2000
""",
)
def scalar_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: parse the events.props JSON string with from_json /
    get_json_object; map introspection via map_keys."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    parsed = F.from_json(F.col("props"), "k INT")
    as_map = F.from_json(F.col("props"), "map<string,string>")
    return e.select(
        "event_id",
        parsed["k"].alias("k_val"),
        F.get_json_object(F.col("props"), "$.k").alias("k_str"),
        (F.size(F.map_keys(as_map)) > 0).alias("has_keys"),
    )
