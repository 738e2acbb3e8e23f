"""Round-2 coverage batch: interval-overlap join (banded), hot-shingle
frequency cap (join-skew guard), corpus vocabulary heavy hitters.

The interval join generalizes `join_range_bucketed` (point-in-band)
to interval×interval overlap — sessions-vs-campaigns, readings-vs-
maintenance-windows — with the same discipline: fragment intervals
into fixed-width bands, equi-join on band id, check the exact overlap
as a residual, dedupe band-duplicate pairs.  No nested loop anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.queries._prefix import explode_shingles as _explode_shingles
from s3spark.registry import register

# 8-day bands: both interval kinds (≤8 days, ≤4 days) span ≤2 bands,
# so the explode fans out at most 2× — the band width is chosen from
# the max interval length, exactly how it would be at 100 TB.
_BAND_SEC = 86400 * 8


@register(
    "join_interval_overlap",
    oracle="""
WITH a AS (
  SELECT o_orderkey, o_orderdate AS s,
         o_orderdate + INTERVAL ((o_orderkey % 7) + 1) DAY AS e
  FROM orders WHERE o_orderkey < 1000
),
b AS (
  SELECT DISTINCT l_orderkey, l_linenumber, l_shipdate AS s,
         l_shipdate + INTERVAL 3 DAY AS e
  FROM lineitem WHERE l_orderkey < 1000
)
SELECT a.o_orderkey, b.l_orderkey, b.l_linenumber, b.s AS ship,
       date_diff('hour', greatest(a.s, b.s), least(a.e, b.e)) AS overlap_hours
FROM a JOIN b ON a.s <= b.e AND b.s <= a.e AND a.o_orderkey <> b.l_orderkey
ORDER BY 1, 2, 3, 4
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join WITHOUT a nested loop: each
    interval explodes into the fixed-width bands it covers (≤2 here),
    candidates come from band-id equality (hash shuffle on band), the
    exact overlap predicate runs as a residual filter, and pairs seen
    in two shared bands collapse via distinct.

    Inputs are key-bounded (< 1000) purely to keep the verification
    output stable across SFs — the banding mechanics are unbounded.
    At 100 TB the band join shuffles on band id (time-local, so
    naturally balanced); a hot band (flash-crowd day) gets salted like
    any hot key."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("a_s"),
            F.expr(
                "o_orderdate + make_dt_interval(CAST(o_orderkey % 7 AS INT) + 1, 0, 0, 0)"
            ).alias("a_e"),
        )
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").alias("b_s"),
            F.expr("l_shipdate + make_dt_interval(3, 0, 0, 0)").alias("b_e"),
        )
        # (l_orderkey, l_linenumber) is NOT unique in the fixture —
        # dedupe to the full row identity so band-dedup can't conflate
        # genuine duplicates with band-duplicates
        .distinct()
    )

    def banded(df: DataFrame, s: str, e: str) -> DataFrame:
        lo = (F.unix_timestamp(F.col(s)) / _BAND_SEC).cast("long")
        hi = (F.unix_timestamp(F.col(e)) / _BAND_SEC).cast("long")
        return df.withColumn("band", F.explode(F.sequence(lo, hi)))

    pairs = (
        banded(o, "a_s", "a_e")
        .join(banded(li, "b_s", "b_e"), "band")
        .filter(
            (F.col("a_s") <= F.col("b_e"))
            & (F.col("b_s") <= F.col("a_e"))
            & (F.col("o_orderkey") != F.col("l_orderkey"))
        )
        .select(
            "o_orderkey",
            "l_orderkey",
            "l_linenumber",
            F.col("b_s").alias("ship"),
            F.expr(
                "timestampdiff(HOUR, greatest(a_s, b_s), least(a_e, b_e))"
            ).alias("overlap_hours"),
        )
        .distinct()  # a pair overlapping across 2 shared bands matches twice
    )
    return pairs


_CAPPED_JACCARD_SQL = """
WITH sh_all AS (
  SELECT DISTINCT doc_id, trigram FROM (
    SELECT doc_id,
           string_split(text, ' ') AS toks,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM documents
    WHERE doc_id < 500
  ) t, LATERAL (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS trigram) g
  WHERE i + 2 <= len(toks)
),
keep AS (
  SELECT trigram FROM sh_all GROUP BY trigram HAVING COUNT(*) <= 5
),
sh AS (SELECT s.doc_id, s.trigram FROM sh_all s JOIN keep k USING (trigram)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.trigram = b.trigram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jaccard
FROM inter
JOIN sizes s1 ON doc_a = s1.doc_id
JOIN sizes s2 ON doc_b = s2.doc_id
WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.5
ORDER BY doc_a, doc_b
"""


@register("dedup_jaccard_capped", oracle=_CAPPED_JACCARD_SQL)
def dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-skew guard dedup_ngram_jaccard's docstring promises:
    shingles appearing in more than CAP=5 documents are dropped BEFORE
    the self-join (a df>CAP shingle contributes O(df²) candidate rows
    while carrying almost no discriminative signal — at 100 TB the
    boilerplate shingle IS the skewed key that stalls the stage).
    Jaccard is then computed on the surviving shingle space,
    identically in the oracle, so the capped semantics stay
    hash-exact.  The uncapped key remains the reference answer; this
    key pins that the guard changes results only at the margin
    (fixture df maxes at 7, so the cap is demonstrably active)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    # codegen shingle explosion (round-12; see _prefix.explode_shingles)
    sh_all = _explode_shingles(d, 3, out="trigram").distinct()
    keep = (
        sh_all.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 5)
        .select("trigram")
    )
    sh = sh_all.join(keep, "trigram")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.trigram") == F.col("b.trigram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1, s2 = sizes.alias("s1"), sizes.alias("s2")
    jac = F.col("n_common") / (F.col("s1.n") + F.col("s2.n") - F.col("n_common"))
    return (
        inter.join(s1, F.col("doc_a") == F.col("s1.doc_id"))
        .join(s2, F.col("doc_b") == F.col("s2.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@register(
    "text_vocab_topk",
    oracle="""
SELECT token, n_docs, n_occurrences
FROM (
  SELECT token,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         COUNT(*) AS n_occurrences,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rk
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token
    FROM documents
  )
  GROUP BY token
)
WHERE rk <= 20
ORDER BY n_occurrences DESC, token
""",
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: top-20 tokens by occurrence
    with document frequency — the vocab profile a tokenizer-training
    or stopword-selection step starts from.  explode → one combined
    agg (count + distinct-doc count share the token shuffle) → global
    top-k via TakeOrdered semantics.  Deterministic tie-break on the
    token itself keeps the cut oracle-stable.  At 100 TB: partial
    aggregation absorbs the token fan-out map-side; the final top-20
    is a single reduce of per-partition candidates."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return (
        counts.orderBy(F.desc("n_occurrences"), "token")
        .limit(20)
        .orderBy(F.desc("n_occurrences"), "token")
    )
