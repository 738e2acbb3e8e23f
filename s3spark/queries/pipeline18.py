"""Round-7 batch twelve: the remaining inference / corpus-memorization
/ feed-integrity screens.

- ``stats_permutation_test``: Monte-Carlo permutation test of the
  urgent-vs-rest mean order value — B=64 hash-deterministic label
  reassignments, each an exact integer reduction; the p-value is a
  count of bit-identical double comparisons.
- ``text_ngram_novelty``: per-source share of corpus-unique trigrams —
  the memorization/boilerplate screen (novelty ≈ 1 = fresh text,
  novelty ≈ 0 = the corpus repeats itself).
- ``dq_sequence_id_audit``: contiguity audit of monotonic id feeds
  (missing ids, duplicate deliveries, span density) over the clean
  fixture sequences plus two simulated defect feeds, so every failure
  column fires non-vacuously.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; these extend SURVEY.md §2.3 sections D/J
per the north star's analytics + training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.queries._prefix import explode_shingles as _explode_shingles
from s3spark.registry import register

# --------------------------------------------------------------------------
# stats_permutation_test
# --------------------------------------------------------------------------

_PERM_B = 64

# Mean difference over exact integer (sum, count) pairs — ONE shared
# expression text (the Welch/z-test recipe).
# Degenerate-cohort guard (round-9 extension sweep): an empty cohort
# (all rows one priority — the ztest empty-arm case) or a permutation
# that happens to assign every row one label (reachable at small n)
# makes a mean undefined; ANSI Spark threw DIVIDE_BY_ZERO where DuckDB
# returned NULL.  The shared CASE yields a NULL diff — a degenerate
# permutation then counts as NOT extreme on both engines (NULL
# comparison → ELSE 0), and a NULL OBSERVED diff nulls the p-value and
# verdict below (an undefined test never rejects).
_PERM_DIFF = (
    "(CASE WHEN ca = 0 OR cr = 0 THEN CAST(NULL AS DOUBLE)"
    " ELSE CAST(sa AS DOUBLE) / CAST(ca AS DOUBLE)"
    " - CAST(sr AS DOUBLE) / CAST(cr AS DOUBLE) END)"
)

_PERM_P = (
    "CAST(CASE WHEN obs_diff IS NULL THEN NULL"
    " ELSE CAST(1 + n_extreme AS DOUBLE) / CAST({B} + 1 AS DOUBLE) END"
    " AS DOUBLE)"
)

_PERM_REJECT = (
    "CAST(CASE WHEN obs_diff IS NULL THEN NULL"
    " WHEN CAST(1 + n_extreme AS DOUBLE) / CAST({B} + 1 AS DOUBLE)"
    " <= 0.05 THEN 1 ELSE 0 END AS BIGINT)"
)

_PERM_ORACLE = f"""
WITH v AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
  FROM orders
),
st AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n1, CAST(COUNT(*) AS BIGINT) AS n,
         (CAST(SUM(is_a) AS HUGEINT) * 4294967296) // COUNT(*) AS t32
  FROM v
),
obs AS (
  SELECT CAST(SUM(x * is_a) AS HUGEINT) AS sa,
         CAST(SUM(is_a) AS BIGINT) AS ca,
         CAST(SUM(x * (1 - is_a)) AS HUGEINT) AS sr,
         CAST(SUM(1 - is_a) AS BIGINT) AS cr
  FROM v
),
o2 AS (SELECT {_PERM_DIFF} AS obs_diff FROM obs),
e AS (
  SELECT k, x, g FROM v, (SELECT unnest(range({_PERM_B // 4})) AS g)
),
hh AS (
  SELECT x, g,
         md5(CAST(k AS VARCHAR) || '|' || CAST(g AS VARCHAR)) AS hx
  FROM e
),
u AS (
  SELECT x, 4 * g + w AS b,
         CAST('0x' || substr(hx, 1 + 8 * w, 8) AS BIGINT) AS u
  FROM hh, (SELECT unnest(range(4)) AS w)
),
lab AS (
  SELECT x, b, CASE WHEN u < st.t32 THEN 1 ELSE 0 END AS l FROM u, st
),
perm AS (
  SELECT b,
         CAST(SUM(x * l) AS HUGEINT) AS sa,
         CAST(SUM(l) AS BIGINT) AS ca,
         CAST(SUM(x * (1 - l)) AS HUGEINT) AS sr,
         CAST(SUM(1 - l) AS BIGINT) AS cr
  FROM lab GROUP BY b
),
ext AS (
  SELECT CAST(SUM(CASE WHEN abs({_PERM_DIFF}) >= abs(o2.obs_diff)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM perm, o2
)
SELECT st.n1, st.n - st.n1 AS n2,
       CAST(o2.obs_diff AS DOUBLE) AS obs_diff,
       CAST({_PERM_B} AS BIGINT) AS b_count,
       ext.n_extreme,
       {_PERM_P.format(B=_PERM_B)} AS p_value,
       {_PERM_REJECT.format(B=_PERM_B)} AS reject_05
FROM st, o2, ext
"""


@register("stats_permutation_test", oracle=_PERM_ORACLE)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo permutation test of the urgent-vs-rest mean order
    value: each of B=64 resamples reassigns every row's group label by
    a deterministic hash draw with the observed marginal rate, and the
    p-value is the (add-one) share of permuted |mean diffs| at least
    as extreme as the observed one — the assumption-free sibling of
    stats_welch_ttest / stats_ab_proportion_ztest.

    Exactness: the label threshold is the exact integer
    (n1·2³²) div n; the per-(row, permutation) draw is one of the
    FOUR independent 32-bit words of md5(key|group) — one md5 call
    yields four permutations' draws (the Poisson-bootstrap hash
    recipe, amortized 4×: 16 md5s per row instead of 64), each
    extracted as an exact 8-hex-chars integer on both engines;
    per-permutation sums and counts are exact decimal(38,0)/HUGEINT;
    every mean difference — observed and permuted — evaluates ONE
    shared expression text on bit-identical operands, so the >=
    comparisons and therefore n_extreme are bit-reproducible.

    Engine shape: the fan-out is row-local and rides the scan as ONE
    ×16 explode (the md5 stage); all four word-labels of a hash
    evaluate on the SAME generated row, so the map-side-combined
    aggregate loop runs over rows×16 — not rows×64 — with pure BIGINT
    sums (per-permutation Σx fits 2⁶³ past 100 TB), unpivoted to the
    64 permutations by stack() on the 16-row result; the complement
    cohort derives from the exact 1-row totals (sr = Σx − sa).  The
    observed stats and the 1-row threshold / observed-diff broadcasts
    are declared constant-build nested loops."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v = orders.selectExpr(
        "o_orderkey AS k",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x",
        "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a",
    )
    big = "decimal(38,0)"
    st = v.selectExpr("is_a").agg(
        F.sum("is_a").cast("bigint").alias("n1"),
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "CAST((CAST(SUM(is_a) AS DECIMAL(38,0)) * 4294967296)"
            " div COUNT(*) AS BIGINT)"
        ).alias("t32"),
    )
    obs = v.agg(
        F.sum(F.col("x").cast(big) * F.col("is_a")).cast(big).alias("sa"),
        F.sum("is_a").cast("bigint").alias("ca"),
        F.sum(F.col("x").cast(big) * (1 - F.col("is_a"))).cast(big).alias("sr"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("cr"),
    )
    o2 = obs.selectExpr(f"{_PERM_DIFF} AS obs_diff")
    # spread the CPU-bound x16 fan-out across the full task width
    # BEFORE exploding: the base rows are cheap to shuffle relative to
    # the md5 work they fan into, and the scan's input-split count (a
    # file-layout accident — one compact parquet file = one task) must
    # not cap the parallelism of 16x its rows
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = v.repartition(nparts).selectExpr(
        "k", "x", f"explode(sequence(0, {_PERM_B // 4 - 1})) AS g"
    )
    h = e.selectExpr(
        "x",
        "g",
        "md5(CAST(concat(CAST(k AS STRING), '|', CAST(g AS STRING))"
        " AS BINARY)) AS hx",
    )
    # all four word-labels evaluate on the SAME generated row, so the
    # aggregate loop runs over rows×16, not rows×64; per-permutation
    # sums fit BIGINT to ~10¹⁸ (x ≤ 6·10⁷ cents · 1.5·10¹⁰ rows), so no
    # decimal arithmetic in the hot loop.  The 16-row result unpivots
    # to 64 permutations via stack, and the complement cohort derives
    # from the 1-row exact totals (sr = Σx − sa, cr = n − ca).
    lab4 = h.crossJoin(F.broadcast(st.select("t32"))).selectExpr(
        "x",
        "g",
        *[
            f"CASE WHEN CAST(conv(substr(hx, {1 + 8 * w}, 8), 16, 10)"
            f" AS BIGINT) < t32 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)"
            f" END AS l{w}"
            for w in range(4)
        ],
    )
    perm16 = lab4.groupBy("g").agg(
        *[
            a
            for w in range(4)
            for a in (
                F.sum(F.col("x") * F.col(f"l{w}"))
                .cast("bigint")
                .alias(f"sa{w}"),
                F.sum(f"l{w}").cast("bigint").alias(f"ca{w}"),
            )
        ]
    )
    stack_args = ", ".join(f"CAST({w} AS BIGINT), sa{w}, ca{w}" for w in range(4))
    tot = obs.selectExpr("sa + sr AS sall", "ca + cr AS nall")
    perm = (
        perm16.selectExpr(
            "g", f"stack(4, {stack_args}) AS (w, sa, ca)"
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "4 * g + w AS b",
            "sa",
            "ca",
            "CAST(sall - sa AS DECIMAL(38,0)) AS sr",
            "CAST(nall - ca AS BIGINT) AS cr",
        )
    )
    ext = (
        perm.crossJoin(F.broadcast(o2))
        .selectExpr(
            f"CASE WHEN abs({_PERM_DIFF}) >= abs(obs_diff) THEN 1 ELSE 0 END"
            " AS is_ext"
        )
        .agg(F.sum("is_ext").cast("bigint").alias("n_extreme"))
    )
    return (
        st.select("n1", "n")
        .crossJoin(F.broadcast(o2))
        .crossJoin(F.broadcast(ext))
        .selectExpr(
            "n1",
            "n - n1 AS n2",
            "CAST(obs_diff AS DOUBLE) AS obs_diff",
            f"CAST({_PERM_B} AS BIGINT) AS b_count",
            "n_extreme",
            f"{_PERM_P.format(B=_PERM_B)} AS p_value",
            f"{_PERM_REJECT.format(B=_PERM_B)} AS reject_05",
        )
    )


# --------------------------------------------------------------------------
# text_ngram_novelty
# --------------------------------------------------------------------------

_NOV_AVG = "(CAST(sum_share AS DOUBLE) / CAST(n_docs_scored AS DOUBLE))"

_NOV_ORACLE = f"""
WITH words AS (
  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source, trigram FROM (
    SELECT doc_id, source, toks, generate_subscripts(toks, 1) AS i FROM words
    WHERE len(toks) >= 3
  ) t, LATERAL (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                AS trigram) g
  WHERE i <= len(toks) - 2
),
df AS (SELECT trigram, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY trigram),
per_doc AS (
  SELECT sh.doc_id, sh.source,
         CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS novel,
         CAST(COUNT(*) AS BIGINT) AS total
  FROM sh JOIN df ON sh.trigram = df.trigram
  GROUP BY sh.doc_id, sh.source
),
shares AS (
  SELECT source,
         CAST(CAST(novel AS DOUBLE) / CAST(total AS DOUBLE)
              AS DECIMAL(25,6)) AS share
  FROM per_doc
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs_scored,
         SUM(share) AS sum_share,
         CAST(MIN(share) AS DOUBLE) AS min_share,
         CAST(MAX(share) AS DOUBLE) AS max_share
  FROM shares GROUP BY source
)
SELECT source, n_docs_scored,
       CAST({_NOV_AVG} AS DOUBLE) AS avg_novelty,
       min_share AS min_novelty, max_share AS max_novelty
FROM agg ORDER BY source
"""


@register("text_ngram_novelty", oracle=_NOV_ORACLE)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source share of corpus-unique word trigrams — the
    memorization / boilerplate screen: a document whose trigrams all
    appear in other documents contributes nothing new to a training
    mix (novelty ≈ 0), while near-1 novelty marks fresh text.  Reports
    avg/min/max novelty per source.

    Exactness: document frequencies are exact integers over the
    DISTINCT (doc, trigram) set (the dedup_ngram_jaccard shingle
    recipe); each per-doc share is ONE IEEE division lifted through
    decimal(25,6) before the per-source sum (order-independent); the
    average is one shared-text division of the decimal sum.

    Engine shape: trigram explode rides the scan into ONE distinct
    (doc,trigram) shuffle; document frequencies attach as a window
    count over the trigram key (round 13 — one exchange, one
    execution of the shingle subtree, instead of the old groupBy +
    join-back that replayed it on both sides); per-doc and per-source
    aggregates are bounded by |docs| and |sources|.  Sub-3-word
    documents carry no trigrams and are excluded from scoring on both
    engines."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # codegen shingle explosion (round-12; see _prefix.explode_shingles)
    sh = _explode_shingles(d, 3, out="trigram", keep=("source",)).distinct()
    # Round-13 (guide §2.4, the round-12 pagerank degree trick): the
    # old shape computed df as a groupBy(trigram) AGGREGATE and then
    # equi-joined it back onto sh — but sh fed BOTH join sides, so the
    # scan → explode → distinct subtree executed twice, and the join
    # added a second trigram exchange.  A window count over the same
    # key is the identical exact integer per row with ONE exchange and
    # ONE execution of the shingle subtree.
    df_w = F.count(F.lit(1)).over(Window.partitionBy("trigram"))
    per_doc = (
        sh.withColumn("df", df_w)
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("novel"),
            F.count(F.lit(1)).alias("total"),
        )
    )
    shares = per_doc.selectExpr(
        "source",
        "CAST(CAST(novel AS DOUBLE) / CAST(total AS DOUBLE)"
        " AS DECIMAL(25,6)) AS share",
    )
    agg = shares.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_scored"),
        F.sum("share").alias("sum_share"),
        F.min("share").cast("double").alias("min_share"),
        F.max("share").cast("double").alias("max_share"),
    )
    return agg.selectExpr(
        "source",
        "n_docs_scored",
        f"CAST({_NOV_AVG} AS DOUBLE) AS avg_novelty",
        "min_share AS min_novelty",
        "max_share AS max_novelty",
    ).orderBy("source")


# --------------------------------------------------------------------------
# dq_sequence_id_audit
# --------------------------------------------------------------------------

_SEQ_DENSITY = "(CAST(n_keys AS DOUBLE) / CAST(max_id - min_id + 1 AS DOUBLE))"

_SEQ_TAIL = (
    "series",
    "n_rows",
    "n_keys",
    "min_id",
    "max_id",
    "max_id - min_id + 1 AS span",
    "max_id - min_id + 1 - n_keys AS missing_ids",
    "n_rows - n_keys AS duplicate_rows",
    f"CAST({_SEQ_DENSITY} AS DOUBLE) AS density",
    "CAST(CASE WHEN max_id - min_id + 1 = n_keys AND n_rows = n_keys "
    "THEN 1 ELSE 0 END AS BIGINT) AS contiguous",
)

_SEQ_ORACLE = f"""
WITH src AS (
  SELECT 'orders_full' AS series, o_orderkey AS id FROM orders
  UNION ALL
  SELECT 'orders_gapped_feed' AS series, o_orderkey AS id
  FROM orders WHERE o_orderkey % 97 <> 13
  UNION ALL
  SELECT 'events_double_delivery' AS series, event_id AS id FROM events
  UNION ALL
  SELECT 'events_double_delivery' AS series, event_id AS id
  FROM events WHERE event_id % 50 = 7
),
g AS (
  SELECT series,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT id) AS BIGINT) AS n_keys,
         CAST(MIN(id) AS BIGINT) AS min_id,
         CAST(MAX(id) AS BIGINT) AS max_id
  FROM src GROUP BY series
)
SELECT {", ".join(_SEQ_TAIL)} FROM g ORDER BY series
"""


@register("dq_sequence_id_audit", oracle=_SEQ_ORACLE)
def dq_sequence_id_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-id feed integrity audit: for each delivered id
    sequence report missing ids (span − distinct), duplicate
    deliveries (rows − distinct), span density, and a contiguity
    flag — the first check an autoincrement/offset-keyed feed gets on
    landing.  The fixture sequences are perfectly contiguous, so two
    simulated defect feeds keep every failure column non-vacuous:
    a gapped orders feed (every o_orderkey ≡ 13 mod 97 withheld —
    lost messages) and a double-delivered events feed (every
    event_id ≡ 7 mod 50 shipped twice — at-least-once replay).

    Exactness: four integer aggregates per series; density is one
    shared-text IEEE division of exact integers.

    Engine shape: each series is one scan + ONE map-side-combined
    aggregate (count / distinct / min / max share the reduction);
    distinct ids partial-aggregate map-side, so no raw id set ever
    concentrates; output is |series| rows."""
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id")
    )
    events = table(spark, sf_dir, "events").select(F.col("event_id").alias("id"))
    src = (
        orders.selectExpr("'orders_full' AS series", "id")
        .unionByName(
            orders.where(F.col("id") % 97 != 13).selectExpr(
                "'orders_gapped_feed' AS series", "id"
            )
        )
        .unionByName(
            events.selectExpr("'events_double_delivery' AS series", "id")
        )
        .unionByName(
            events.where(F.col("id") % 50 == 7).selectExpr(
                "'events_double_delivery' AS series", "id"
            )
        )
    )
    g = src.groupBy("series").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("id").alias("n_keys"),
        F.min("id").cast("bigint").alias("min_id"),
        F.max("id").cast("bigint").alias("max_id"),
    )
    return g.selectExpr(*_SEQ_TAIL).orderBy("series")
