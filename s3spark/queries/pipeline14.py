"""Round-6 batch eight: resampling statistics, keyword extraction,
data-freshness auditing, and calendar growth metrics.

- ``stats_bootstrap_ci_poisson``: distributed Poisson bootstrap —
  the scale-out resampling scheme (each row draws a hash-deterministic
  Poisson(1) replication weight per resample, so no global shuffle of
  resample membership is ever needed) — yielding an order-statistic
  95% CI for mean document length.
- ``text_keyword_rake``: RAKE keyword extraction (phrases split at
  stopwords; word score = degree/frequency; phrase score = Σ word
  scores) — the classic unsupervised keyword pass a corpus pipeline
  runs for tagging/routing.
- ``dq_freshness_calendar_gaps``: data-freshness / completeness audit
  against a generated calendar spine (missing periods, gap runs,
  first/last period) for a daily and an hourly series.
- ``timeseries_pct_change``: day-over-day and week-over-week percent
  change plus a 28-day rolling sum of daily revenue — the growth
  dashboard primitive.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections D/H/J
per the north star's analytics + training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# stats_bootstrap_ci_poisson
# --------------------------------------------------------------------------

_BOOT_B = 64

# Poisson(1) inverse-CDF thresholds, pre-scaled by 2^32 and floored to
# integer LITERALS (P(X<=k) for k=0..4; weights cap at 5).  The
# thresholds define the deterministic sampler — both engines compare
# the same exact integer hash against the same integer literals, so
# the resample weights are identical by construction.
_BOOT_W = (
    "CASE WHEN u < 1580030168 THEN 0 WHEN u < 3160060337 THEN 1 "
    "WHEN u < 3950075421 THEN 2 WHEN u < 4213413783 THEN 3 "
    "WHEN u < 4279248373 THEN 4 ELSE 5 END"
)

_BOOT_ORACLE = f"""
WITH e AS (
  SELECT doc_id, n_chars, b
  FROM documents, (SELECT unnest(range({_BOOT_B})) AS b)
),
u AS (
  SELECT n_chars, b,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
                                 || CAST(b AS VARCHAR)), 1, 8) AS BIGINT) AS u
  FROM e
),
m AS (
  SELECT b,
         CAST(CAST(SUM(({_BOOT_W}) * n_chars) AS BIGINT) AS DOUBLE)
           / CAST(CAST(SUM({_BOOT_W}) AS BIGINT) AS DOUBLE) AS mean_b
  FROM u GROUP BY b
),
r AS (
  SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) AS rk FROM m
),
pt AS (
  SELECT CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS point_mean
  FROM documents
)
SELECT CAST({_BOOT_B} AS BIGINT) AS b_count,
       pt.point_mean,
       MIN(CASE WHEN rk = 2 THEN mean_b END) AS ci95_lo,
       MIN(CASE WHEN rk = {_BOOT_B - 1} THEN mean_b END) AS ci95_hi,
       MIN(mean_b) AS min_mean,
       MAX(mean_b) AS max_mean
FROM r, pt
GROUP BY pt.point_mean
"""


@register("stats_bootstrap_ci_poisson", oracle=_BOOT_ORACLE)
def stats_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Poisson bootstrap of mean document length: each of
    B=64 resamples assigns every document a Poisson(1) replication
    weight derived from md5(doc_id, b), so resample b's mean is
    Σ w·x / Σ w.  The 95% CI is taken from the ORDER STATISTICS of
    the B resample means (ranks 2 and B−1 for 2.5/97.5%) — selection,
    not interpolation, so no float formula differences can creep in.

    Why Poisson bootstrap: classical bootstrap resamples n rows WITH
    replacement, which requires global coordination; the Poisson
    approximation (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012 — public) makes the weight a
    ROW-LOCAL deterministic function, so the fan-out rides the scan
    and partial aggregation reduces each partition to B partial sums
    before the only shuffle (B groups wide).

    Exactness: the hash is the portable first-8-hex-chars md5 integer
    (agg_kmv_distinct recipe); weights compare that integer against
    Poisson-CDF·2³² integer literals; per-resample sums are exact
    BIGINTs; each mean is ONE IEEE division; ranking sorts
    bit-identical doubles with a deterministic (mean, b) tie-break."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    e = docs.selectExpr("doc_id", "n_chars", f"explode(sequence(0, {_BOOT_B - 1})) AS b")
    u = e.selectExpr(
        "n_chars",
        "b",
        "CAST(conv(substr(md5(CAST(concat(CAST(doc_id AS STRING), '|', "
        "CAST(b AS STRING)) AS BINARY)), 1, 8), 16, 10) AS BIGINT) AS u",
    )
    m = (
        u.selectExpr("b", f"({_BOOT_W}) AS w", "n_chars")
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("w") * F.col("n_chars")).cast("bigint").cast("double")
                / F.sum("w").cast("bigint").cast("double")
            ).alias("mean_b")
        )
    )
    r = m.select(
        "mean_b", F.row_number().over(Window.orderBy("mean_b", "b")).alias("rk")
    )
    pt = docs.agg(
        (F.sum("n_chars").cast("bigint").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("point_mean")
    )
    return (
        r.crossJoin(F.broadcast(pt))
        .groupBy("point_mean")
        .agg(
            F.min(F.when(F.col("rk") == 2, F.col("mean_b"))).alias("ci95_lo"),
            F.min(F.when(F.col("rk") == _BOOT_B - 1, F.col("mean_b"))).alias("ci95_hi"),
            F.min("mean_b").alias("min_mean"),
            F.max("mean_b").alias("max_mean"),
        )
        .selectExpr(
            f"CAST({_BOOT_B} AS BIGINT) AS b_count",
            "point_mean",
            "ci95_lo",
            "ci95_hi",
            "min_mean",
            "max_mean",
        )
    )


# --------------------------------------------------------------------------
# text_keyword_rake
# --------------------------------------------------------------------------

_RAKE_STOP = r"\b(a|the)\b"
_RAKE_TOPK = 20

_RAKE_ORACLE = rf"""
WITH ph AS (
  SELECT trim(regexp_replace(p, ' +', ' ', 'g')) AS phrase
  FROM (SELECT unnest(string_split(
                 regexp_replace(text, '{_RAKE_STOP}', '|', 'g'), '|')) AS p
        FROM documents)
),
inst AS (SELECT phrase FROM ph WHERE phrase <> ''),
words AS (
  SELECT w, CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
  FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM inst)
),
stats AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM words GROUP BY w
),
occ AS (
  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM inst GROUP BY phrase
),
pw AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS w
  FROM (SELECT DISTINCT phrase FROM inst)
),
scored AS (
  SELECT pw.phrase,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         SUM(CAST(CAST(s.deg AS DOUBLE) / CAST(s.freq AS DOUBLE)
                  AS DECIMAL(25,6))) AS score_dec
  FROM pw JOIN stats s ON pw.w = s.w
  GROUP BY pw.phrase
)
SELECT o.phrase, o.n_occurrences, sc.n_words,
       CAST(sc.score_dec AS DOUBLE) AS score
FROM scored sc JOIN occ o ON sc.phrase = o.phrase
ORDER BY sc.score_dec DESC, o.phrase
LIMIT {_RAKE_TOPK}
"""


@register("text_keyword_rake", oracle=_RAKE_ORACLE)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction, Rose et al. 2010 —
    public) over the corpus: split each document into candidate
    phrases at stopword boundaries, score each word by degree/frequency
    (degree = Σ length of phrases it appears in), score each phrase
    by the sum of its word scores, return the global top-20.

    Exactness: freq/deg are exact integers over the corpus; each word
    score is ONE IEEE division; phrase scores sum the word scores
    through decimal(25,6) partials (the standard log-partials recipe)
    so the sum is order-independent; the top-K orders by the exact
    DECIMAL score with a phrase tie-break.

    Engine shape: the phrase-instance table is materialized once to
    scratch (three consumers — word stats, occurrence counts, scoring
    — would otherwise each replay the document scan: the
    graph_pagerank lesson); word stats are VOCAB-BOUNDED and
    broadcast back to the phrase words; the final top-20 is
    orderBy().limit() → TakeOrderedAndProject, a distributed partial
    top-K (never a single-partition window)."""
    docs = table(spark, sf_dir, "documents").select("text")
    # localCheckpoint, not parquet scratch (round-12): same lineage
    # break, no write job + disk round-trip.
    inst = (
        # NB: Spark SQL string literals eat single backslashes, so the
        # \b word boundaries are doubled here; DuckDB literals do not.
        docs.selectExpr(
            r"explode(split(regexp_replace(text, '\\b(a|the)\\b', '|'), '\\|')) AS p"
        )
        .selectExpr("trim(regexp_replace(p, ' +', ' ')) AS phrase")
        .where("phrase <> ''")
        .localCheckpoint()
    )
    words = inst.selectExpr(
        "explode(split(phrase, ' ')) AS w",
        "CAST(size(split(phrase, ' ')) AS BIGINT) AS plen",
    )
    stats = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").cast("bigint").alias("deg")
    )
    occ = inst.groupBy("phrase").agg(F.count(F.lit(1)).alias("n_occurrences"))
    pw = inst.select("phrase").distinct().selectExpr(
        "phrase", "explode(split(phrase, ' ')) AS w"
    )
    scored = (
        pw.join(F.broadcast(stats), "w")
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(
                (F.col("deg").cast("double") / F.col("freq").cast("double")).cast(
                    "decimal(25,6)"
                )
            ).alias("score_dec"),
        )
    )
    return (
        scored.join(occ, "phrase")
        .orderBy(F.desc("score_dec"), "phrase")
        .limit(_RAKE_TOPK)
        .selectExpr(
            "phrase", "n_occurrences", "n_words", "CAST(score_dec AS DOUBLE) AS score"
        )
    )


# --------------------------------------------------------------------------
# dq_freshness_calendar_gaps
# --------------------------------------------------------------------------

_FRESH_ORACLE = """
WITH od AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS p FROM orders),
omm AS (SELECT MIN(p) AS lo, MAX(p) AS hi FROM od),
osp AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS p
        FROM omm),
oj AS (SELECT osp.p, od.p AS hit FROM osp LEFT JOIN od ON osp.p = od.p),
omiss AS (
  SELECT p, CAST(date_diff('day', DATE '1990-01-01', p) AS BIGINT)
            - row_number() OVER (ORDER BY p) AS grp
  FROM oj WHERE hit IS NULL
),
oruns AS (SELECT CAST(COUNT(*) AS BIGINT) AS run FROM omiss GROUP BY grp),
orow AS (
  SELECT 'orders_daily' AS series,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM oj) AS span_periods,
         (SELECT CAST(COUNT(hit) AS BIGINT) FROM oj) AS present_periods,
         (SELECT CAST(COUNT(*) - COUNT(hit) AS BIGINT) FROM oj) AS missing_periods,
         COALESCE((SELECT CAST(MAX(run) AS BIGINT) FROM oruns), 0) AS longest_gap_run,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM oruns) AS n_gap_runs,
         (SELECT CAST(MIN(p) AS TIMESTAMP) FROM oj) AS first_period,
         (SELECT CAST(MAX(p) AS TIMESTAMP) FROM oj) AS last_period
),
ed AS (SELECT DISTINCT date_trunc('hour', ts) AS p FROM events),
emm AS (SELECT MIN(p) AS lo, MAX(p) AS hi FROM ed),
esp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS p FROM emm),
ej AS (SELECT esp.p, ed.p AS hit FROM esp LEFT JOIN ed ON esp.p = ed.p),
emiss AS (
  SELECT p, CAST(date_diff('hour', TIMESTAMP '1990-01-01', p) AS BIGINT)
            - row_number() OVER (ORDER BY p) AS grp
  FROM ej WHERE hit IS NULL
),
eruns AS (SELECT CAST(COUNT(*) AS BIGINT) AS run FROM emiss GROUP BY grp),
erow AS (
  SELECT 'events_hourly' AS series,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ej) AS span_periods,
         (SELECT CAST(COUNT(hit) AS BIGINT) FROM ej) AS present_periods,
         (SELECT CAST(COUNT(*) - COUNT(hit) AS BIGINT) FROM ej) AS missing_periods,
         COALESCE((SELECT CAST(MAX(run) AS BIGINT) FROM eruns), 0) AS longest_gap_run,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM eruns) AS n_gap_runs,
         (SELECT CAST(MIN(p) AS TIMESTAMP) FROM ej) AS first_period,
         (SELECT CAST(MAX(p) AS TIMESTAMP) FROM ej) AS last_period
)
SELECT * FROM orow UNION ALL SELECT * FROM erow ORDER BY series
"""


def _freshness_row(spine_joined: DataFrame, series: str, grp_expr: str) -> DataFrame:
    """Summary row for one series: totals from the joined spine, gap
    runs via the rn-difference islands trick on the missing subset
    (both tables are calendar-bounded, so the unpartitioned windows
    and 1-row cross join are constant-size by construction)."""
    summary = spine_joined.agg(
        F.lit(series).alias("series"),
        F.count(F.lit(1)).alias("span_periods"),
        F.count("hit").alias("present_periods"),
        (F.count(F.lit(1)) - F.count("hit")).alias("missing_periods"),
    )
    miss = spine_joined.where(F.col("hit").isNull()).selectExpr(
        "p", f"{grp_expr} - row_number() OVER (ORDER BY p) AS grp"
    )
    runs = miss.groupBy("grp").agg(F.count(F.lit(1)).alias("run"))
    gaps = runs.agg(
        F.coalesce(F.max("run"), F.lit(0)).cast("bigint").alias("longest_gap_run"),
        F.count(F.lit(1)).alias("n_gap_runs"),
    )
    bounds = spine_joined.agg(
        F.min("p").cast("timestamp").alias("first_period"),
        F.max("p").cast("timestamp").alias("last_period"),
    )
    return summary.crossJoin(F.broadcast(gaps)).crossJoin(F.broadcast(bounds))


@register("dq_freshness_calendar_gaps", oracle=_FRESH_ORACLE)
def dq_freshness_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness / completeness audit: generate the full calendar
    spine between each series' first and last period and report
    missing periods, gap-run structure (longest run + number of
    runs), and the series bounds — for orders (daily) and events
    (hourly).  The fixture's orders series has real missing days, so
    the gap path is exercised non-vacuously; the clean hourly events
    row is the informative PASS.

    Engine shape: each fact scan partial-aggregates to its DISTINCT
    period set (calendar-bounded ≤ a few thousand rows forever); the
    spine is GENERATED from a 1-row min/max aggregate via
    explode(sequence(...)) — no join against the fact needed; every
    window/island/cross-join after that runs on bounded tables.
    Dates surface as TIMESTAMP on both engines (the DuckDB
    fetchdf DATE-widening gotcha)."""
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("p")
    )
    od = orders.distinct()
    osp = od.agg(F.min("p").alias("lo"), F.max("p").alias("hi")).selectExpr(
        "explode(sequence(lo, hi, interval 1 day)) AS p"
    )
    oj = osp.join(od.withColumnRenamed("p", "hit"), osp.p == F.col("hit"), "left")
    orow = _freshness_row(
        oj, "orders_daily", "CAST(datediff(p, DATE '1990-01-01') AS BIGINT)"
    )
    events = table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("p")
    )
    ed = events.distinct()
    esp = ed.agg(F.min("p").alias("lo"), F.max("p").alias("hi")).selectExpr(
        "explode(sequence(lo, hi, interval 1 hour)) AS p"
    )
    ej = esp.join(ed.withColumnRenamed("p", "hit"), esp.p == F.col("hit"), "left")
    erow = _freshness_row(
        ej,
        "events_hourly",
        # calendar-based hour index (days*24 + wall-clock hour field), NOT
        # unix_timestamp elapsed-time arithmetic: elapsed hours diverge from
        # DuckDB's naive date_diff('hour', ...) across a DST transition, so
        # the gap-run ids would split/merge differently in a DST-observing
        # session timezone (round-6 advice item); datediff+hour() read the
        # same naive wall-clock fields DuckDB does under ANY timezone.
        "CAST(datediff(CAST(p AS DATE), DATE '1990-01-01') AS BIGINT) * 24 "
        "+ CAST(hour(p) AS BIGINT)",
    )
    return orow.unionAll(erow).orderBy("series")


# --------------------------------------------------------------------------
# timeseries_pct_change
# --------------------------------------------------------------------------

_PCT_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                       AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
l AS (
  SELECT d, x,
         lag(x, 1) OVER (ORDER BY d) AS x1,
         lag(x, 7) OVER (ORDER BY d) AS x7,
         CAST(SUM(x) OVER (ORDER BY d ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS roll28
  FROM daily
)
SELECT CAST(d AS TIMESTAMP) AS d, x AS day_cents,
       CAST(CAST(x - x1 AS DOUBLE) / CAST(x1 AS DOUBLE) AS DOUBLE) AS pct_dod,
       CAST(CAST(x - x7 AS DOUBLE) / CAST(x7 AS DOUBLE) AS DOUBLE) AS pct_wow,
       roll28 AS roll28_cents
FROM l ORDER BY d
"""


@register("timeseries_pct_change", oracle=_PCT_ORACLE)
def timeseries_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day and week-over-week percent change plus a 28-day
    rolling sum of daily revenue — the growth-dashboard primitive.

    Exactness: the daily series is exact integer cents; each percent
    change is integer subtraction + two casts + ONE IEEE division
    (NULL on the leading edge where no lag exists, identically on
    both engines); the rolling sum is an exact integer window sum.

    Engine shape: orders partial-aggregate map-side to the
    CALENDAR-BOUNDED daily table before any window; the three window
    functions (lag 1, lag 7, 28-row rolling sum) share ONE
    unpartitioned sort over ≤2,400 rows regardless of fact scale —
    the timeseries_seasonal_decompose argument."""
    orders = table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    w = Window.orderBy("d")
    l = daily.select(
        "d",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 7).over(w).alias("x7"),
        F.sum("x").over(w.rowsBetween(-27, 0)).cast("bigint").alias("roll28"),
    )
    return l.select(
        F.col("d").cast("timestamp").alias("d"),
        F.col("x").alias("day_cents"),
        ((F.col("x") - F.col("x1")).cast("double") / F.col("x1").cast("double")).alias(
            "pct_dod"
        ),
        ((F.col("x") - F.col("x7")).cast("double") / F.col("x7").cast("double")).alias(
            "pct_wow"
        ),
        F.col("roll28").alias("roll28_cents"),
    ).orderBy("d")
