"""Extended scalar-function coverage: the long tail of string and
datetime built-ins (regexp_extract_all, translate, repeat/reverse/
ascii, left/right; quarter/weekofyear/weekday, last_day, add_months,
month-trunc, date_format) — each pinned against the DuckDB twin,
including the cross-engine semantic traps (dayofweek origin,
DATE+INTERVAL result types) recorded in the oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "scalar_string_extended",
    oracle="""
SELECT doc_id,
       regexp_extract_all(text, '\\bta[a-z]*') AS ta_words,
       translate(source, 'src', 'SRC') AS src_up,
       repeat(lang, 3) AS lang3,
       reverse(source) AS rev_src,
       ascii(substr(text, 1, 1)) AS first_cp,
       left(text, 10) AS head,
       right(source, 2) AS tail
FROM documents
WHERE doc_id < 300
ORDER BY doc_id
""",
)
def scalar_string_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String long tail: multi-match regex extraction (array result),
    character translation, repeat/reverse, codepoint, prefix/suffix
    slicing.  All codegen'd JVM expressions — regexp_extract_all's
    array output feeds the same HOF pipeline the tokenizers use."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(r"\bta[a-z]*"), 0).alias("ta_words"),
        F.translate("source", "src", "SRC").alias("src_up"),
        F.repeat("lang", 3).alias("lang3"),
        F.reverse("source").alias("rev_src"),
        F.ascii(F.substring("text", 1, 1)).alias("first_cp"),
        F.expr("left(text, 10)").alias("head"),
        F.expr("right(source, 2)").alias("tail"),
    ).orderBy("doc_id")


@register(
    "scalar_datetime_extended",
    oracle="""
SELECT event_id,
       quarter(ts) AS q,
       weekofyear(ts) AS iso_week,
       isodow(ts) - 1 AS weekday_mon0,
       CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS next_month,
       CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
       strftime(ts, '%Y-%m') AS ym
FROM events
WHERE event_id < 2000
ORDER BY event_id
""",
)
def scalar_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime long tail with the cross-engine traps made explicit:
    Spark ``dayofweek`` is 1=Sunday while DuckDB's is 0=Sunday, so the
    portable formulation is ``weekday`` (0=Monday) == ``isodow - 1``;
    DuckDB DATE + INTERVAL yields TIMESTAMP where Spark ``add_months``
    yields DATE, and DuckDB's fetchdf widens DATE to datetime64 — so
    date-valued outputs are cast to TIMESTAMP on both engines; both
    clamp end-of-month (Jan 31 + 1 month = Feb 29)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.weekofyear("ts").alias("iso_week"),
        F.weekday("ts").alias("weekday_mon0"),
        F.last_day(F.col("ts").cast("date")).cast("timestamp").alias("month_end"),
        F.add_months(F.col("ts").cast("date"), 1).cast("timestamp").alias("next_month"),
        F.date_trunc("month", "ts").alias("month_start"),
        F.date_format("ts", "yyyy-MM").alias("ym"),
    ).orderBy("event_id")
