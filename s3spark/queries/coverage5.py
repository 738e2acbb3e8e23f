"""Round-4e long-tail operators: nearest-neighbor as-of join, bigram
language-model scoring, and unrolled BFS shortest distances — each
with a FULL DuckDB value oracle.

- ``join_asof_nearest``: the third as-of semantics after backward
  (``join_asof``) and backward-with-SLA (``join_asof_tolerance``):
  match the NEAREST reference event in either time direction, ties to
  the earlier one.  Same union-then-window emulation — ONE user_id
  shuffle, two IGNORE NULLS window passes (running last + forward
  first), then a row-local integer-microsecond comparison.  No range
  join, no nested loop, state per key = two running values.
- ``text_bigram_logprob``: per-document mean log-probability under an
  add-one-smoothed corpus bigram model — the sharper perplexity proxy
  over ``text_unigram_logprob`` (conditional, not marginal,
  probabilities).  Bigram and history counts are corpus-level
  aggregates joined back broadcast; V (vocabulary size) is a 1-row
  cross join.
- ``graph_bfs_distance``: multi-source BFS (min-plus semiring) over
  the co-purchase graph, depth <= 3, as an UNROLLED dataflow loop:
  per level one frontier⋈edges join + one min-aggregate, lineage cut
  by localCheckpoint (the pagerank/triangle lesson — without it every
  reference replays the edge build).  The oracle is a recursive CTE
  with UNION (not UNION ALL) so DuckDB's walk dedups (node, dist)
  pairs instead of enumerating paths.  Completes the iterative-
  algebra family: sum (pagerank), min-label (components), argmin
  (k-means), min-plus (this).

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 C/J and the
graph family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# join_asof_nearest
# --------------------------------------------------------------------------

_NEAREST_ORACLE = """
WITH u AS (
  SELECT event_id, user_id, ts, CAST(NULL AS TIMESTAMP) AS ref_ts,
         1 AS kind
  FROM events
  UNION ALL
  SELECT NULL, user_id, ts, ts, 0 FROM events
  WHERE event_type = 'purchase'
),
w AS (
  SELECT *,
    last_value(ref_ts IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, kind
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
    first_value(ref_ts IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, kind
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM u
)
SELECT event_id, user_id, ts,
  CASE
    WHEN prev_ts IS NULL THEN next_ts
    WHEN next_ts IS NULL THEN prev_ts
    WHEN epoch_us(ts) - epoch_us(prev_ts)
         <= epoch_us(next_ts) - epoch_us(ts) THEN prev_ts
    ELSE next_ts
  END AS nearest_purchase_ts,
  CASE
    WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
    WHEN prev_ts IS NULL THEN epoch_us(next_ts) - epoch_us(ts)
    WHEN next_ts IS NULL THEN epoch_us(ts) - epoch_us(prev_ts)
    ELSE least(epoch_us(ts) - epoch_us(prev_ts),
               epoch_us(next_ts) - epoch_us(ts))
  END AS dist_us
FROM w
WHERE kind = 1
ORDER BY event_id
"""


@register("join_asof_nearest", oracle=_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join: for every event, the CLOSEST
    purchase of the same user in either time direction (ties to the
    earlier).  Union-then-window: reference rows sort before probe
    rows on equal timestamps, so the backward pass sees a same-instant
    purchase (distance 0) and the tie-break picks it.  Distances
    compare as integer microseconds (unix_micros / epoch_us) so both
    engines decide ties identically.  One user_id shuffle total; the
    sensor-fusion / feature-attach shape when staleness may be on
    either side."""
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
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        probes.unionByName(refs)
        .withColumn(
            "prev_ts", F.last("ref_ts", ignorenulls=True).over(w_back)
        )
        .withColumn(
            "next_ts", F.first("ref_ts", ignorenulls=True).over(w_fwd)
        )
    )
    d_prev = F.unix_micros("ts") - F.unix_micros("prev_ts")
    d_next = F.unix_micros("next_ts") - F.unix_micros("ts")
    nearest = (
        F.when(F.col("prev_ts").isNull(), F.col("next_ts"))
        .when(F.col("next_ts").isNull(), F.col("prev_ts"))
        .when(d_prev <= d_next, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
    )
    dist = (
        F.when(
            F.col("prev_ts").isNull() & F.col("next_ts").isNull(),
            F.lit(None).cast("long"),
        )
        .when(F.col("prev_ts").isNull(), d_next)
        .when(F.col("next_ts").isNull(), d_prev)
        .otherwise(F.least(d_prev, d_next))
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            nearest.alias("nearest_purchase_ts"),
            dist.alias("dist_us"),
        )
    )


# --------------------------------------------------------------------------
# text_bigram_logprob
# --------------------------------------------------------------------------

_BIGRAM_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
  FROM (SELECT doc_id, toks, generate_subscripts(toks, 1) AS i
        FROM words) t
  WHERE i + 1 <= len(toks)
),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT word) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
)
SELECT bg.doc_id,
       COUNT(*) AS n_bigrams,
       round(CAST(SUM(CAST(ln((c2.c2 + 1.0) / (c1.c1 + vocab.v))
                           AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6)
         AS avg_logprob
FROM bg
JOIN c2 USING (w1, w2)
JOIN c1 USING (w1)
CROSS JOIN vocab
GROUP BY bg.doc_id
ORDER BY bg.doc_id
"""


@register("text_bigram_logprob", oracle=_BIGRAM_ORACLE)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean log-probability under an add-one-smoothed
    corpus bigram model: p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V), history
    counts taken over bigram-first positions.  The conditional upgrade
    of ``text_unigram_logprob`` — repetitive docs score high, rare
    transitions score low, the standard cheap perplexity filter.  The
    count tables are vocabulary²-bounded and broadcast; the only
    big-side shuffle is the per-(w1,w2) aggregate over the exploded
    bigram stream.  The per-bigram log-probs sum through the repo's
    decimal(25,6)-partials recipe before dividing (round-4 ADVICE):
    each term is identically 6-dp-quantized on both engines, so the
    mean is independent of summation order — a plain double AVG relies
    on end-rounding to absorb cross-engine ulp drift and can flake
    when a doc's mean lands near a rounding boundary."""
    d = table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 2
    )
    # codegen bigram pairs (round-12): explode the index sequence and
    # assemble (w1, w2) in a codegen projection — the transform()
    # lambda form ran interpreted per element (see
    # _prefix.explode_shingles for the measurement)
    bg = words.select(
        "doc_id", "w", F.explode(F.sequence(F.lit(0), F.size("w") - 2)).alias("i")
    ).select("doc_id", F.expr("w[i]").alias("w1"), F.expr("w[i+1]").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .agg(F.countDistinct("word").alias("v"))
    )
    lp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v")))
    return (
        bg.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(F.col("lp").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# graph_bfs_distance
# --------------------------------------------------------------------------

_BFS_DEPTH = 3

_BFS_ORACLE = f"""
WITH RECURSIVE base AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey % 10 = 0 AND b.l_partkey % 10 = 0
),
e AS (
  SELECT u AS src, v AS dst FROM base
  UNION ALL
  SELECT v AS src, u AS dst FROM base
),
seeds AS (
  SELECT DISTINCT src AS node FROM e WHERE src % 50 = 0
),
walk AS (
  SELECT node, 0 AS dist FROM seeds
  UNION
  SELECT e.dst AS node, w.dist + 1 AS dist
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.dist < {_BFS_DEPTH}
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node
"""


@register("graph_bfs_distance", oracle=_BFS_ORACLE)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS shortest distances (depth <= 3) over the
    co-purchase part graph — the min-plus member of the iterative
    dataflow family.  Each unrolled level is one frontier⋈edges hash
    join + one min-aggregate over (node); localCheckpoint truncates
    the lineage so level k never replays the edge build (the
    pagerank/triangle materialization lesson).  At 100 TB the frontier
    join shuffles only the CURRENT distance table against a
    pre-partitioned edge list; levels beyond the graph's effective
    diameter add nothing and AQE sees shrinking frontiers.  Oracle: a
    recursive CTE with UNION-dedup semantics, so DuckDB explores
    (node, dist) states, not paths."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 10 == 0
    )
    a, b = li.alias("a"), li.alias("b")
    base = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
    )
    edges = (
        base.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(
            base.select(F.col("v").alias("src"), F.col("u").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        edges.filter(F.col("src") % 50 == 0)
        .select(F.col("src").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_BFS_DEPTH):
        nxt = (
            dist.join(edges, F.col("node") == F.col("src"))
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + 1).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


# --------------------------------------------------------------------------
# timeseries_downsample_lttb
# --------------------------------------------------------------------------

_LTTB_ORACLE = """
WITH pts AS (
  SELECT user_id, ts, value, date_trunc('hour', ts) AS bucket,
         epoch_us(ts) AS x
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT user_id, bucket,
         CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) / COUNT(*) AS xbar,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
           AS ybar
  FROM pts GROUP BY user_id, bucket
),
bb AS (
  SELECT user_id, bucket, xbar, ybar,
         lag(xbar)  OVER w AS px, lag(ybar)  OVER w AS py,
         lead(xbar) OVER w AS nx, lead(ybar) OVER w AS ny
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY bucket)
),
scored AS (
  SELECT p.user_id, p.bucket, p.ts, p.value,
         CASE
           WHEN bb.px IS NULL THEN CAST(p.x AS DOUBLE)
           WHEN bb.nx IS NULL THEN -CAST(p.x AS DOUBLE)
           ELSE -abs((bb.px - bb.nx) * (p.value - bb.py)
                     - (bb.px - p.x) * (bb.ny - bb.py))
         END AS key1,
         p.x AS key2
  FROM pts p JOIN bb ON p.user_id = bb.user_id AND p.bucket = bb.bucket
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, bucket
                               ORDER BY key1, key2, value) AS rn
  FROM scored
)
SELECT user_id, bucket, ts, value
FROM ranked WHERE rn = 1
ORDER BY user_id, bucket
"""


@register("timeseries_downsample_lttb", oracle=_LTTB_ORACLE)
def timeseries_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013),
    the bucket-average parallel variant: one representative point per
    (user, hour), chosen to maximize the triangle area against the
    NEIGHBOR buckets' average points — the downsample that preserves
    visual extremes, unlike avg/first.  Using neighbor AVERAGES
    (classic LTTB uses the previously SELECTED point) removes the
    sequential dependency, so the whole op is two window passes over
    one user shuffle — embarrassingly parallel at 100 TB.  Edge
    buckets keep the series endpoints (first/last point).  Ties and
    edge cases fold into ONE deterministic sort key (area is never
    output, only used for the argmax, and both engines compute the
    identical double expression), so the selection is value-stable."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    pts = e.select(
        "user_id",
        "ts",
        "value",
        F.date_trunc("hour", "ts").alias("bucket"),
        F.unix_micros("ts").alias("x"),
    )
    # x sums in decimal: a dense bucket's sum of epoch-µs longs can
    # exceed 2^63 and Spark's non-ANSI long SUM would wrap silently
    # while the oracle's 128-bit SUM stays exact (review finding)
    b = pts.groupBy("user_id", "bucket").agg(
        (
            F.sum(F.col("x").cast("decimal(25,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("xbar"),
        (
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("ybar"),
    )
    wb = Window.partitionBy("user_id").orderBy("bucket")
    bb = b.select(
        "user_id",
        "bucket",
        F.lag("xbar").over(wb).alias("px"),
        F.lag("ybar").over(wb).alias("py"),
        F.lead("xbar").over(wb).alias("nx"),
        F.lead("ybar").over(wb).alias("ny"),
    )
    joined = pts.join(bb, ["user_id", "bucket"])
    area = F.abs(
        (F.col("px") - F.col("nx")) * (F.col("value") - F.col("py"))
        - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
    )
    key1 = (
        F.when(F.col("px").isNull(), F.col("x").cast("double"))
        .when(F.col("nx").isNull(), -F.col("x").cast("double"))
        .otherwise(-area)
    )
    # value as the final tie-break: edge-bucket keys are ts-derived,
    # so same-µs points need it for an engine-stable pick
    wr = Window.partitionBy("user_id", "bucket").orderBy(
        key1.asc(), F.col("x").asc(), F.col("value").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket", "ts", "value")
    )
