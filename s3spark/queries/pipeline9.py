"""Round-6 batch two: weighted order statistics, distributed global
row numbering, multiline CSV ingest, and hierarchical fallback joins.

- ``agg_weighted_median``: exact weighted median per group — the
  robust "typical price weighted by volume" statistic, computed from
  a cumulative-weight crossing instead of sorting rows to a single
  node.
- ``sample_systematic_distributed_index``: every k-th record of a
  globally ordered corpus.  The interesting part is HOW: a global
  contiguous row number computed WITHOUT the classic scale-killer (a
  single-partition ``row_number() OVER (ORDER BY ...)``) — value
  buckets get local row numbers and a tiny offset table broadcasts
  back.
- ``scan_csv_multiline_quoted``: CSV with embedded newlines inside
  quoted fields — the ingest shape that silently corrupts
  line-splitting readers; written, re-read with ``multiLine``, and
  proven to round-trip.
- ``join_fallback_hierarchy``: rate lookup with fallback levels
  (nation rate if published, else region rate, else global) — the
  warehouse "most specific match wins" join done as broadcast
  coalesce, not N sequential passes over the fact table.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections A/C/D
per the north star's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import scratch_dir, table
from s3spark.registry import register

# --------------------------------------------------------------------------
# agg_weighted_median
# --------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH g AS (
  SELECT l_returnflag AS flag,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)) AS w
  FROM lineitem
  GROUP BY 1, 2
),
c AS (
  SELECT flag, price, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY price) AS cum,
         SUM(w) OVER (PARTITION BY flag) AS total
  FROM g
)
SELECT flag AS l_returnflag,
       CAST(MIN(CASE WHEN 2 * cum >= total THEN price END) AS DOUBLE)
         AS w_median,
       CAST(MIN(total) AS BIGINT) AS total_qty
FROM c
GROUP BY flag
ORDER BY flag
"""


_WMEDIAN_NB = 64  # price buckets per group; tune with cluster width


@register("agg_weighted_median", oracle=_WMEDIAN_ORACLE)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median price per return flag, weighted by
    quantity: the smallest price whose cumulative weight reaches half
    the group total (the lower weighted median).

    Engine shape — a two-level crossing search, because the naive
    formulation (one cumulative window partitioned by the 3-value
    group key) funnels every distinct price of a group through ONE
    task, the same unbounded-window scale-killer fixed in
    tokenizer_vocab_coverage this round:
    (1) rows collapse to (group, DISTINCT price) cells with summed
        integer weights — the only row-count-scale shuffle, bounded
        by distinct values;
    (2) cells roll up to (group, price-bucket) weights; the
        cumulative window over THAT table is bounded by
        groups × NB buckets by construction, and locates the single
        bucket containing the crossing plus the weight accumulated
        before it;
    (3) only the crossing bucket's cells (≈ distinct/NB, tuned by
        NB) flow through the final in-bucket cumulative window.
    Every comparison is exact integer arithmetic (quantities lift
    through decimal(18,2)); prices are unique per group after the
    pre-aggregation so frame peer rules can't matter; bucket
    boundaries only need to be monotone within THIS engine — the
    oracle never sees them."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("decimal(18,2)").cast("long").alias("w"),
    )
    return weighted_median_two_level(li)


def weighted_median_two_level(rows: DataFrame) -> DataFrame:
    """Two-level bucket-crossing weighted median over a (flag, price,
    w) frame — see agg_weighted_median for the algorithm.  Exposed
    frame-level so the random-input differential tests can drive it
    with hypothesis-generated weights and prices
    (tests/test_differential_random.py); the registry key is one
    caller.

    ``cells`` is localCheckpointed: it has FOUR consumers downstream
    (the stats broadcast, the bucket roll-up, the crossing search and
    the in-bucket pass) and Spark plans are trees — the round-12 plan
    audit found the full fact scan + (flag, price) aggregate replayed
    8× in one key (8 parquet scans in the executed plan).  The
    checkpoint holds the distinct-value-bounded cell table only —
    (group, distinct price, weight) — never fact rows; measured
    2.9 s → 0.9 s at sf0.1 with identical output."""
    cells = (
        rows.groupBy("flag", "price")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint()
    )
    stats = cells.groupBy("flag").agg(
        F.min("price").alias("lo"),
        F.max("price").alias("hi"),
        F.sum("w").alias("total"),
    )
    b = (
        cells.join(F.broadcast(stats), "flag")
        .withColumn(
            "bucket",
            F.floor(
                (F.col("price") - F.col("lo"))
                * _WMEDIAN_NB
                / (F.col("hi") - F.col("lo") + 1)
            ),
        )
        .select("flag", "bucket", "price", "w", "total")
    )
    bw = b.groupBy("flag", "bucket", "total").agg(F.sum("w").alias("bw"))
    cumb = F.sum("bw").over(Window.partitionBy("flag").orderBy("bucket"))
    crossing = (
        bw.withColumn("cumb", cumb)
        .filter(2 * F.col("cumb") >= F.col("total"))
        .groupBy(F.col("flag").alias("xflag"))
        .agg(
            F.min_by("bucket", "bucket").alias("xbucket"),
            F.min_by(F.col("cumb") - F.col("bw"), F.col("bucket")).alias(
                "prior"
            ),
        )
    )
    inb = b.join(
        F.broadcast(crossing),
        (F.col("flag") == F.col("xflag"))
        & (F.col("bucket") == F.col("xbucket")),
    ).select("flag", "price", "w", "total", "prior")
    cum = F.sum("w").over(Window.partitionBy("flag").orderBy("price"))
    return (
        inb.withColumn("cum", F.col("prior") + cum)
        .groupBy("flag")
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("total"), F.col("price"))
            )
            .cast("double")
            .alias("w_median"),
            F.min("total").alias("total_qty"),
        )
        .select(
            F.col("flag").alias("l_returnflag"), "w_median", "total_qty"
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# sample_systematic_distributed_index
# --------------------------------------------------------------------------

_SYSTEMATIC_K = 20
_SYSTEMATIC_NB = 16  # value buckets; raise with cluster width at scale

_SYSTEMATIC_ORACLE = f"""
WITH r AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY doc_id) AS rn
  FROM documents
)
SELECT CAST(rn AS BIGINT) AS rn, doc_id, n_chars
FROM r
WHERE (rn - 1) % {_SYSTEMATIC_K} = 0
ORDER BY rn
"""


@register("sample_systematic_distributed_index", oracle=_SYSTEMATIC_ORACLE)
def sample_systematic_distributed_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Systematic sampling (every k-th document in doc_id order) on
    top of a DISTRIBUTED global row number.

    The naive ``row_number() OVER (ORDER BY doc_id)`` funnels the
    whole corpus through ONE task — the same scale-killer the
    round-5 verdict flagged in tokenizer_vocab_coverage's top-K.
    Instead: (1) docs hash into NB contiguous value buckets computed
    from the min/max key (a deterministic COLUMN, not a physical
    partition id, so no caching race between passes); (2) a bounded
    NB-row count table turns into exclusive prefix offsets with an
    NB-row window; (3) offsets broadcast back and each bucket
    assigns local row numbers under its own window partition.
    offset(bucket) + local_rn is exact for ANY monotone non-overlapping
    bucketing, so NB tunes freely with cluster width — per-task state
    is one bucket's rows, never the corpus.  doc_id is unique
    (fixture invariant, pinned in tests), so ordering is total."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    stats = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    d = docs.crossJoin(F.broadcast(stats)).withColumn(
        "bucket",
        F.floor(
            (F.col("doc_id") - F.col("lo"))
            * _SYSTEMATIC_NB
            / (F.col("hi") - F.col("lo") + 1)
        ),
    )
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    # NB rows: exclusive prefix sum — the only unpartitioned window,
    # bounded by the bucket count by construction
    off_w = (
        Window.partitionBy()
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(off_w), F.lit(0).cast("long")).alias(
            "off"
        ),
    )
    local = F.row_number().over(
        Window.partitionBy("bucket").orderBy("doc_id")
    )
    rn = (F.col("off") + local).alias("rn")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .select(rn, "doc_id", "n_chars")
        .filter((F.col("rn") - 1) % _SYSTEMATIC_K == 0)
        .orderBy("rn")
    )


# --------------------------------------------------------------------------
# scan_csv_multiline_quoted
# --------------------------------------------------------------------------

_CSV_ML_ORACLE = """
WITH src AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 5 = 0 THEN replace(text, ' ', chr(10))
              ELSE text END AS text
  FROM documents
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(CASE WHEN text LIKE '%' || chr(10) || '%' THEN 1 END)
            AS BIGINT) AS n_multiline,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text) - length(replace(text, chr(10), '')))
            AS BIGINT) AS sum_newlines
FROM src
"""


@register("scan_csv_multiline_quoted", oracle=_CSV_ML_ORACLE)
def scan_csv_multiline_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip where every fifth document carries embedded
    newlines inside a quoted field: written with quoteAll, re-read
    with ``multiLine=true`` under an explicit schema, and the
    aggregate (doc count, multiline count, total chars, total
    newlines) must equal what the oracle predicts from the SOURCE
    table — proving the quoted newlines survive both directions
    instead of splitting records.

    Engine shape + honest tradeoff: ``multiLine`` CSV is NOT
    line-splittable (a record boundary can't be found mid-file), so
    each file parses as one unit — at 100 TB this ingest shape
    demands many small-to-medium files (the writer side here emits
    one per task, which is exactly that), or an upstream rewrite to
    escaped-newline/JSONL form (scan_jsonl_corpus) which IS
    splittable.  The key exists because real corpora arrive in this
    shape and a silent mis-split corrupts every downstream count."""
    docs = table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.regexp_replace(F.col("text"), " ", "\n"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = scratch_dir("csv_multiline")
    (
        staged.write.mode("overwrite")
        .option("header", "true")
        .option("quoteAll", "true")
        .csv(out)
    )
    back = (
        spark.read.schema("doc_id long, lang string, text string")
        .option("header", "true")
        .option("multiLine", "true")
        .csv(out)
    )
    nl = F.lit("\n")
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("text").contains(nl), 1)).alias("n_multiline"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.sum(
            F.length("text") - F.length(F.replace(F.col("text"), nl, F.lit("")))
        ).alias("sum_newlines"),
    )


# --------------------------------------------------------------------------
# join_fallback_hierarchy
# --------------------------------------------------------------------------

_FALLBACK_MIN_CUSTOMERS = 55
_FALLBACK_MIN_REGION = 300

_FALLBACK_ORACLE = f"""
WITH cust AS (
  SELECT c_custkey, c_nationkey FROM customer
),
nat_rate AS (
  SELECT c_nationkey AS nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
           / COUNT(*) AS rate
  FROM customer
  GROUP BY 1
  HAVING COUNT(*) >= {_FALLBACK_MIN_CUSTOMERS}
),
reg_rate AS (
  SELECT n.n_regionkey AS regionkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
           / COUNT(*) AS rate
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
  HAVING COUNT(*) >= {_FALLBACK_MIN_REGION}
),
gl AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
           / COUNT(*) AS rate
  FROM customer
),
resolved AS (
  SELECT o.o_orderkey,
         CASE WHEN nr.rate IS NOT NULL THEN 'nation'
              WHEN rr.rate IS NOT NULL THEN 'region'
              ELSE 'global' END AS level,
         COALESCE(nr.rate, rr.rate, g.rate) AS rate
  FROM orders o
  JOIN cust c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  LEFT JOIN nat_rate nr ON c.c_nationkey = nr.nationkey
  LEFT JOIN reg_rate rr ON n.n_regionkey = rr.regionkey
  CROSS JOIN gl g
)
SELECT level,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       min(rate) AS min_rate,
       max(rate) AS max_rate
FROM resolved
GROUP BY level
ORDER BY level
"""


@register("join_fallback_hierarchy", oracle=_FALLBACK_ORACLE)
def join_fallback_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-specific-match-wins rate lookup: each order takes its
    nation's published rate when the nation has enough customers to
    publish one (>= 55), else its region's rate (published at >= 300
    customers), else the global rate — the classic
    pricing/routing-table fallback hierarchy.  At the sf0.01 gate all
    three levels fire (18 nations publish, 2 of 5 regions don't —
    pinned non-vacuously in tests).

    Engine shape: the fact table is scanned ONCE; every rate level is
    a bounded dimension aggregate that BROADCASTS (nations, regions,
    one global row), and the fallback is a COALESCE across left
    broadcast joins — not N sequential "match then retry the
    unmatched remainder" passes, which would rescan the fact table
    per level.  Rates use the davg recipe (exact decimal sum → double
    ÷ count: bit-identical on both engines); the per-level summary
    reports min/max rate rather than a rate SUM because summing
    doubles is partition-order-dependent — min/max of bit-identical
    doubles is not."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    orders = table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(25,6)")

    def rate(alias: str) -> F.Column:
        return (
            F.sum(bal).cast("double") / F.count(F.lit(1))
        ).alias(alias)

    nat_rate = (
        cust.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(rate("n_rate"), F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") >= _FALLBACK_MIN_CUSTOMERS)
        .drop("n_cust")
    )
    reg_rate = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(rate("r_rate"), F.count(F.lit(1)).alias("r_cust"))
        .filter(F.col("r_cust") >= _FALLBACK_MIN_REGION)
        .drop("r_cust")
    )
    glob = cust.agg(rate("g_rate"))
    enriched = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(nat_rate),
            F.col("c_nationkey") == F.col("nationkey"),
            "left",
        )
        .join(
            F.broadcast(reg_rate),
            F.col("n_regionkey") == F.col("regionkey"),
            "left",
        )
        .crossJoin(F.broadcast(glob))
    )
    resolved = enriched.select(
        F.when(F.col("n_rate").isNotNull(), F.lit("nation"))
        .when(F.col("r_rate").isNotNull(), F.lit("region"))
        .otherwise(F.lit("global"))
        .alias("level"),
        F.coalesce("n_rate", "r_rate", "g_rate").alias("rate"),
    )
    return (
        resolved.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("rate").alias("min_rate"),
            F.max("rate").alias("max_rate"),
        )
        .orderBy("level")
    )
