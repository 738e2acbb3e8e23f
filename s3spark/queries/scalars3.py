"""Extended scalar-function coverage: the long tail of string and
datetime built-ins (regexp_extract_all, translate, repeat/reverse/
ascii, left/right; quarter/weekofyear/weekday, last_day, add_months,
month-trunc, date_format) — each pinned against the DuckDB twin,
including the cross-engine semantic traps (dayofweek origin,
DATE+INTERVAL result types) recorded in the oracle casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "scalar_string_extended",
    oracle="""
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '\\bta[a-z]*'), '|'),
                '') AS ta_words,
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
    """String long tail: multi-match regex extraction, character
    translation, repeat/reverse, codepoint, prefix/suffix slicing.
    All codegen'd JVM expressions — regexp_extract_all's array output
    feeds the same HOF pipeline the tokenizers use; it is emitted
    '|'-joined so the output cell is a driver-hashable scalar (list
    cells break the driver's pandas canonicalizer — r4 err class)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.array_join(
            F.regexp_extract_all("text", F.lit(r"\bta[a-z]*"), 0), "|"
        ).alias("ta_words"),
        F.translate("source", "src", "SRC").alias("src_up"),
        F.repeat("lang", 3).alias("lang3"),
        F.reverse("source").alias("rev_src"),
        F.ascii(F.substring("text", 1, 1)).alias("first_cp"),
        F.expr("left(text, 10)").alias("head"),
        F.expr("right(source, 2)").alias("tail"),
    )


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
    )


@register(
    "agg_weighted_avg",
    oracle="""
SELECT l_returnflag,
       round(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE), 6)
         AS wavg_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def agg_weighted_avg(spark, sf_dir):
    """Weighted average (price weighted by quantity): ratio of two
    decimal-exact sums, divided as double only at the end — the
    portable formulation; a naive avg(price*qty)/avg(qty) or
    float-accumulated ratio drifts with partition order."""
    li = table(spark, sf_dir, "lineitem")
    num = F.sum(
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(25,6)")
    ).cast("double")
    den = F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(num / den, 6).alias("wavg_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_moving_zscore",
    oracle="""
SELECT event_id, user_id,
       round((value - mavg) / NULLIF(msd, 0), 4) AS zscore,
       COALESCE(abs(value - mavg) > 2 * msd, FALSE) AS is_anomaly
FROM (
  SELECT event_id, user_id, value,
         AVG(value) OVER w AS mavg,
         stddev_samp(value) OVER w AS msd
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
WHERE event_id < 3000
ORDER BY event_id
""",
)
def window_moving_zscore(spark, sf_dir):
    """Rolling z-score anomaly flag: each event's value against its
    user's trailing-20 mean/stddev — the streaming-friendly outlier
    monitor (state = one bounded window per key).

    Rounded to 4 dp: windowed variance is numerically touchier than
    sums (no decimal path for stddev), and 4 dp is far above both
    engines' accumulated error while still pinning the math.
    ``is_anomaly`` is COALESCEd to FALSE where the window has a single
    row (stddev undefined): a NULL boolean cell materializes
    differently across pandas paths (object None vs NA), which is the
    r3-sweep NULL-vs-NaN stringification hazard — an undefined-stddev
    point is definitionally not an observed anomaly, so FALSE is also
    the semantically right answer."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    scored = e.select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("mavg"),
        F.stddev_samp("value").over(w).alias("msd"),
    )
    return (
        scored.filter(F.col("event_id") < 3000)
        .select(
            "event_id",
            "user_id",
            F.round(
                (F.col("value") - F.col("mavg"))
                / F.when(F.col("msd") != 0, F.col("msd")),
                4,
            ).alias("zscore"),
            F.coalesce(
                F.abs(F.col("value") - F.col("mavg")) > 2 * F.col("msd"),
                F.lit(False),
            ).alias("is_anomaly"),
        )
    )


_IPV4_SQL = """
WITH ips AS (
  SELECT event_id,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2) AS BIGINT)
           AS o1,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 3, 2) AS BIGINT)
           AS o2,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 5, 2) AS BIGINT)
           AS o3,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 7, 2) AS BIGINT)
           AS o4
  FROM events
),
parsed AS (
  SELECT event_id,
         o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip,
         o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_int,
         o1 AS oct1, o2 AS oct2
  FROM ips
)
SELECT oct1 AS subnet8,
       CAST(COUNT(*) AS BIGINT) AS n_addrs,
       CAST(SUM(CASE WHEN oct1 = 10
                      OR (oct1 = 172 AND oct2 BETWEEN 16 AND 31)
                      OR (oct1 = 192 AND oct2 = 168)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_private,
       CAST(MIN(ip_int) AS BIGINT) AS min_ip_int,
       min_by(ip, ip_int) AS min_ip
FROM parsed
GROUP BY oct1
ORDER BY subnet8
"""


@register("scalar_ip_cidr", oracle=_IPV4_SQL)
def scalar_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 parse / CIDR-membership / subnet rollup — the network-log
    function family (aton, RFC-1918 private-range tests, /8 grouping)
    over deterministic fixture IPs (octets from md5(event_id), since
    the fixture has no address column; the FUNCTIONS under test are
    the real surface).

    Scale shape: everything up to the rollup is row-local scan-fused
    arithmetic — parse, integer encode, CIDR mask tests compile to
    codegen'd expressions, no UDF — then ONE hash shuffle onto at
    most 256 /8 groups with map-side partials."""
    e = table(spark, sf_dir, "events")

    def octet(pos: int) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), pos, 2),
            16,
            10,
        ).cast("long")

    parsed = e.select(
        octet(1).alias("o1"),
        octet(3).alias("o2"),
        octet(5).alias("o3"),
        octet(7).alias("o4"),
    ).select(
        "o1",
        "o2",
        F.concat_ws(
            ".",
            F.col("o1").cast("string"),
            F.col("o2").cast("string"),
            F.col("o3").cast("string"),
            F.col("o4").cast("string"),
        ).alias("ip"),
        (
            F.col("o1") * 16777216
            + F.col("o2") * 65536
            + F.col("o3") * 256
            + F.col("o4")
        ).alias("ip_int"),
    )
    is_private = (
        (F.col("o1") == 10)
        | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
        | ((F.col("o1") == 192) & (F.col("o2") == 168))
    )
    return (
        parsed.groupBy(F.col("o1").alias("subnet8"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_addrs"),
            F.sum(is_private.cast("int")).cast("long").alias("n_private"),
            F.min("ip_int").cast("long").alias("min_ip_int"),
            F.min_by("ip", F.col("ip_int")).alias("min_ip"),
        )
        .orderBy("subnet8")
    )
