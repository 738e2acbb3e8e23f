"""Round-4 (cont.) pipeline operators: set-sketch intersection,
degree-ordered triangle counting, and corpus-level segment dedup /
boilerplate removal — each with a FULL DuckDB value oracle.

- ``agg_kmv_intersection``: KMV set-intersection estimation
  (Beyer et al. 2007 "distinct-value synopses"): two KMV sketches
  merge by 'concat, re-take K smallest', and the match fraction
  inside the merged sketch estimates Jaccard — the standard way to
  estimate audience overlap across 100 TB partitions without ever
  co-shuffling the raw sets.  Portable md5 hashing makes every
  intermediate integer-exact on both engines, so the *sketch itself*
  is value-verified (same trick as agg_kmv_distinct).
- ``graph_triangle_count``: triangle counting over a co-purchase
  graph with DEGREE ORIENTATION (Chiba–Nishizeki / Cohen's
  map-reduce form): orient each undirected edge from its lower-
  (degree, id) endpoint to the higher, then count directed wedges
  closed by a third edge.  Orientation bounds out-degree by
  O(sqrt(m)), turning the n·deg² wedge explosion into m^1.5 work —
  the difference between feasible and not at 100 TB edge scale.
- ``doc_segment_dedup``: RefinedWeb/CCNet-style corpus-level exact
  segment dedup: split every document into fixed 8-word segments,
  keep only each segment's FIRST occurrence corpus-wide (ordered by
  doc_id, position), report per-doc retention.  One shuffle on
  segment text (first-occurrence window), one shuffle back to docs.
- ``doc_boilerplate_strip``: the complementary pass — segments
  occurring in >= 3 DISTINCT documents are boilerplate (headers,
  navigation, license blocks) and are dropped from every doc.
  Distinct-doc counting per segment is a single groupBy; no
  window needed.

Reference scope: the reference (amazons3_blueprints) moves files and
has no analytics surface (SURVEY.md §2.2); these are the mandated
beyond-reference LLM-pipeline ops (north-star: dedup + corpus
hygiene at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# portable md5→int fragments (same contract as pipeline4/llm)


def _md5_long(col: F.Column, hexchars: int) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, hexchars), 16, 10).cast("long")


def _sql_md5_long(expr: str, hexchars: int) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, {hexchars}) AS BIGINT)"


# --------------------------------------------------------------------------
# agg_kmv_intersection
# --------------------------------------------------------------------------

_KI_K = 256
_KI_M = 1 << 48

_KI_SQL = f"""
WITH a AS (
  SELECT DISTINCT {_sql_md5_long('CAST(o_custkey AS VARCHAR)', 12)} AS hv
  FROM orders WHERE year(o_orderdate) = 1995
),
b AS (
  SELECT DISTINCT {_sql_md5_long('CAST(o_custkey AS VARCHAR)', 12)} AS hv
  FROM orders WHERE year(o_orderdate) = 1996
),
ka AS (SELECT hv FROM a ORDER BY hv LIMIT {_KI_K}),
kb AS (SELECT hv FROM b ORDER BY hv LIMIT {_KI_K}),
ku AS (
  SELECT hv FROM (
    SELECT DISTINCT hv FROM (SELECT hv FROM ka UNION ALL SELECT hv FROM kb) u
  ) d ORDER BY hv LIMIT {_KI_K}
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
         MAX(hv) AS kth_hash,
         CAST(SUM(CASE WHEN hv IN (SELECT hv FROM ka)
                        AND hv IN (SELECT hv FROM kb)
                  THEN 1 ELSE 0 END) AS BIGINT) AS matches
  FROM ku
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_inter FROM (
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  ) i
)
SELECT s.k_used, s.kth_hash, s.matches,
       CASE WHEN s.k_used < {_KI_K} THEN s.k_used
            ELSE ({_KI_K - 1} * {_KI_M}) // s.kth_hash
       END AS union_est,
       CASE WHEN s.k_used < {_KI_K} THEN s.matches
            ELSE (s.matches * (({_KI_K - 1} * {_KI_M}) // s.kth_hash))
                 // {_KI_K}
       END AS inter_est,
       t.true_inter
FROM s, t
"""


@register("agg_kmv_intersection", oracle=_KI_SQL)
def agg_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch intersection: estimate |A ∩ B| for the 1995 vs 1996
    buyer sets from two K=256 sketches ONLY — the merged sketch is the
    K smallest of the concatenated sketches, the match fraction
    rho = matches/K estimates Jaccard over the union estimate
    (Beyer et al. 2007).

    Distribution shape: each sketch is a per-partition partial top-K
    merged associatively (TakeOrdered); the intersection step touches
    3·K = 768 rows total regardless of corpus size — the whole point
    of sketch algebra at 100 TB.  All arithmetic is integer (md5
    48-bit domain, integer division), so the approximate answer is
    bit-exact across engines.  true_inter rides along to document
    the sketch error (pinned within 35% rel. in tests)."""
    o = table(spark, sf_dir, "orders")

    def year_set(y: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == y)
            .select(
                _md5_long(F.col("o_custkey").cast("string"), 12).alias("hv")
            )
            .distinct()
        )

    ka = year_set(1995).orderBy("hv").limit(_KI_K)
    kb = year_set(1996).orderBy("hv").limit(_KI_K)
    ku = ka.unionAll(kb).distinct().orderBy("hv").limit(_KI_K)
    marked = (
        ku.alias("u")
        .join(ka.alias("a"), F.col("u.hv") == F.col("a.hv"), "left")
        .join(kb.alias("b"), F.col("u.hv") == F.col("b.hv"), "left")
        .select(
            F.col("u.hv").alias("hv"),
            (
                F.col("a.hv").isNotNull() & F.col("b.hv").isNotNull()
            ).cast("int").alias("in_both"),
        )
    )
    s = marked.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_hash"),
        F.sum("in_both").cast("long").alias("matches"),
    )
    a_true = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    b_true = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    t = (
        a_true.intersect(b_true)
        .agg(F.count(F.lit(1)).cast("long").alias("true_inter"))
    )
    union_est = F.when(F.col("k_used") < _KI_K, F.col("k_used")).otherwise(
        F.expr(f"{_KI_K - 1}L * {_KI_M}L div kth_hash")
    )
    return s.crossJoin(t).select(
        "k_used",
        "kth_hash",
        "matches",
        union_est.alias("union_est"),
        F.when(F.col("k_used") < _KI_K, F.col("matches"))
        .otherwise(
            F.expr(
                f"(matches * (({_KI_K - 1}L * {_KI_M}L) div kth_hash))"
                f" div {_KI_K}L"
            )
        )
        .alias("inter_est"),
        "true_inter",
    )


# --------------------------------------------------------------------------
# graph_triangle_count
# --------------------------------------------------------------------------

_TRI_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey % 10 = 0 AND b.l_partkey % 10 = 0
),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e) s
  GROUP BY x
),
o AS (
  SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
         CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
  FROM e
  JOIN deg du ON du.x = e.u
  JOIN deg dv ON dv.x = e.v
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM o e1 JOIN o e2 ON e2.s = e1.t JOIN o e3
  ON e3.s = e1.s AND e3.t = e2.t
"""


@register("graph_triangle_count", oracle=_TRI_SQL)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (parts appearing in
    the same order, induced on partkey % 10 = 0) with DEGREE
    ORIENTATION: each undirected edge points from its lower-(deg, id)
    endpoint to the higher, then triangles = directed wedges
    (s→t, t→w) closed by (s→w) — each triangle counted exactly once
    at its orientation-minimal vertex.

    Scale shape: the naive wedge join does sum(deg²) work and dies on
    hub nodes; orientation caps out-degree at O(sqrt(m)) making total
    work m^1.5 (Chiba–Nishizeki bound) — at 100 TB edge scale this is
    THE difference.  All three joins are hash equi-joins on node ids
    (no BNLJ); the per-order pair expansion is bounded by orders'
    ~7-line cap, so the edge build never quadratic-explodes.  The
    oriented edge set is MATERIALIZED once to scratch parquet before
    the triangle join (the graph_pagerank/bpe lineage-break pattern):
    without it each of the three self-join legs replays the full
    edge-build subtree — 32 exchanges instead of ~6."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    e = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    lower = (F.col("du.d") < F.col("dv.d")) | (
        (F.col("du.d") == F.col("dv.d")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(deg.alias("du"), F.col("u") == F.col("du.x"))
        .join(deg.alias("dv"), F.col("v") == F.col("dv.x"))
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    from s3spark.io import scratch_dir

    opath = scratch_dir("triangles") + "/oriented"
    oriented.write.mode("overwrite").parquet(opath)
    o = spark.read.parquet(opath)
    tri = (
        o.alias("e1")
        .join(o.alias("e2"), F.col("e2.s") == F.col("e1.t"))
        .join(
            o.alias("e3"),
            (F.col("e3.s") == F.col("e1.s"))
            & (F.col("e3.t") == F.col("e2.t")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    # |oriented| == |edges| (each undirected edge exactly once), so
    # count the materialized copy instead of replaying the edge build
    n_edges = o.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_edges.crossJoin(tri)


# --------------------------------------------------------------------------
# doc_segment_dedup / doc_boilerplate_strip (shared segment builder)
# --------------------------------------------------------------------------

_SEG_W = 8  # words per segment


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, idx, seg): non-overlapping 8-word segments per doc.
    Zero-segment docs (under 8 words) are guarded out of the explode
    (F.sequence with start > stop runs DESCENDING — the short-doc
    hazard pinned in round 4's curation fixes)."""
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    ).withColumn("nseg", (F.size("w") / _SEG_W).cast("int"))
    return (
        words.filter(F.col("nseg") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("nseg") - 1),
                    lambda i: F.struct(
                        i.alias("idx"),
                        F.concat_ws(
                            " ", F.slice(F.col("w"), i * _SEG_W + 1, _SEG_W)
                        ).alias("seg"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.idx").alias("idx"), F.col("s.seg").alias("seg"))
    )


_SEG_CTE = f"""
docs AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(floor(len(string_split(text, ' ')) / {_SEG_W}.0) AS INTEGER)
           AS nseg
  FROM documents
),
segs AS (
  SELECT d.doc_id, u.i AS idx,
         array_to_string(
           d.w[u.i * {_SEG_W} + 1 : u.i * {_SEG_W} + {_SEG_W}], ' ') AS seg
  FROM docs d, UNNEST(range(0, d.nseg)) AS u(i)
  WHERE d.nseg >= 1
)
"""

_SEGDEDUP_SQL = f"""
WITH {_SEG_CTE},
first_occ AS (
  SELECT doc_id, idx,
         CASE WHEN row_number() OVER (
                PARTITION BY seg ORDER BY doc_id, idx) = 1
              THEN 1 ELSE 0 END AS kept
  FROM segs
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
         CAST(SUM(kept) AS BIGINT) AS n_kept
  FROM first_occ GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(p.n_segs, 0) AS n_segs,
       COALESCE(p.n_kept, 0) AS n_kept
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


@register("doc_segment_dedup", oracle=_SEGDEDUP_SQL)
def doc_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level exact segment dedup (the RefinedWeb/CCNet line-
    dedup pass, on fixed 8-word segments since the fixture corpus is
    single-line): a segment survives only at its FIRST corpus
    occurrence (ordered by doc_id, then position); every later
    occurrence anywhere in the corpus is dropped.  Output is per-doc
    retention (n_segs, n_kept).

    Scale shape: exactly two shuffles — one hash partition on segment
    text for the first-occurrence window (state per group = one
    counter, and at 100 TB the window can degrade gracefully to
    min(doc_id,idx)-join), one re-group by doc_id.  No n² compare,
    no driver state.  Docs under 8 words are preserved with
    n_segs = 0 via the outer join back to ``documents``."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    segs = _segments(spark, sf_dir)
    w = Window.partitionBy("seg").orderBy("doc_id", "idx")
    per_doc = (
        segs.withColumn(
            "kept", F.when(F.row_number().over(w) == 1, 1).otherwise(0)
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segs", F.lit(0)).alias("n_segs"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


_BOILER_MIN_DOCS = 3

_BOILER_SQL = f"""
WITH {_SEG_CTE},
seg_docs AS (
  SELECT seg, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM segs GROUP BY seg
),
flagged AS (
  SELECT s.doc_id,
         CASE WHEN sd.n_docs >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END
           AS is_boiler
  FROM segs s JOIN seg_docs sd ON s.seg = sd.seg
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
         CAST(SUM(is_boiler) AS BIGINT) AS n_boiler
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(p.n_segs, 0) AS n_segs,
       COALESCE(p.n_boiler, 0) AS n_boiler,
       COALESCE(p.n_segs, 0) - COALESCE(p.n_boiler, 0) AS n_kept
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


@register("doc_boilerplate_strip", oracle=_BOILER_SQL)
def doc_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal: an 8-word segment occurring in >= 3
    DISTINCT documents is boilerplate (headers / navigation /
    license text in web corpora) and is dropped from EVERY document
    — the complement of doc_segment_dedup's keep-first rule.

    Scale shape: segment→distinct-doc-count is one partial-agg'd
    groupBy (count distinct over (seg, doc_id) pairs collapses
    map-side); the flag joins back on segment hash.  At 100 TB the
    seg_docs table is vocabulary-sized, broadcastable after a
    min-support filter.  No window needed at all."""
    d = table(spark, sf_dir, "documents")
    segs = _segments(spark, sf_dir)
    seg_docs = segs.groupBy("seg").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    per_doc = (
        segs.join(seg_docs, "seg")
        .select(
            "doc_id",
            (F.col("n_docs") >= _BOILER_MIN_DOCS).cast("int").alias(
                "is_boiler"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.sum("is_boiler").cast("long").alias("n_boiler"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segs", F.lit(0)).alias("n_segs"),
            F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
            (
                F.coalesce("n_segs", F.lit(0))
                - F.coalesce("n_boiler", F.lit(0))
            ).alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# agg_kmv_per_group
# --------------------------------------------------------------------------

_KG_K = 64
_KG_M = 1 << 48

_KG_SQL = f"""
WITH h AS (
  SELECT DISTINCT o_orderpriority AS grp,
         {_sql_md5_long('CAST(o_custkey AS VARCHAR)', 12)} AS hv
  FROM orders
),
r AS (
  SELECT grp, hv,
         row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk
  FROM h
),
s AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS k_used, MAX(hv) AS kth_hash
  FROM r WHERE rk <= {_KG_K} GROUP BY grp
),
t AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS true_distinct
  FROM orders GROUP BY grp
)
SELECT s.grp,
       s.k_used,
       s.kth_hash,
       CASE WHEN s.k_used < {_KG_K} THEN s.k_used
            ELSE ({_KG_K - 1} * {_KG_M}) // s.kth_hash END AS est_distinct,
       t.true_distinct
FROM s JOIN t ON s.grp = t.grp
ORDER BY s.grp
"""


@register("agg_kmv_per_group", oracle=_KG_SQL)
def agg_kmv_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group KMV distinct sketches (K=64 per order priority):
    the grouped form of agg_kmv_distinct — every group keeps only its
    K smallest portable hashes, and (K−1)·M / h_(K) estimates that
    group's distinct buyers.

    Scale shape: this is how per-segment uniques roll up at 100 TB —
    each partition contributes per-group partial sketches (the
    rank-window is per-group bounded state), group sketches merge by
    re-taking K smallest, and the final answer is |groups|·K rows no
    matter the corpus.  Integer md5 arithmetic end-to-end keeps the
    approximation itself oracle-exact; error ~1/sqrt(64) = 12.5%
    (pinned in tests)."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    h = o.select(
        F.col("o_orderpriority").alias("grp"),
        _md5_long(F.col("o_custkey").cast("string"), 12).alias("hv"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("hv")
    s = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KG_K)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_used"),
            F.max("hv").alias("kth_hash"),
        )
    )
    t = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.countDistinct("o_custkey").cast("long").alias("true_distinct")
    )
    return (
        s.join(t, "grp")
        .select(
            "grp",
            "k_used",
            "kth_hash",
            F.when(F.col("k_used") < _KG_K, F.col("k_used"))
            .otherwise(
                F.expr(f"{_KG_K - 1}L * {_KG_M}L div kth_hash")
            )
            .alias("est_distinct"),
            "true_distinct",
        )
        .orderBy("grp")
    )


# --------------------------------------------------------------------------
# join_scd2_point_in_time
# --------------------------------------------------------------------------

_PIT_SQL = """
WITH dim AS (
  SELECT user_id,
         event_type AS state,
         ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events
  WHERE event_type IN ('signup', 'click')
),
probes AS (
  SELECT event_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts,
       d.state AS state_at_purchase,
       d.valid_from AS state_since
FROM probes p
LEFT JOIN dim d
  ON d.user_id = p.user_id
 AND d.valid_from <= p.ts
 AND (d.valid_to IS NULL OR d.valid_to > p.ts)
ORDER BY p.event_id
"""


@register("join_scd2_point_in_time", oracle=_PIT_SQL)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 dimension lookup: each purchase joined to
    the signup/click state version VALID AT its timestamp — the
    warehouse pattern behind every as-was report (and the leakage-
    free alternative to joining current state onto history).

    Scale shape: NOT executed as the interval join the SQL spells
    (valid_from <= ts < valid_to would be a range join); the validity
    tiling of an SCD2 dimension is exactly 'latest version at or
    before ts', so the engine reuses join_asof's union-then-window
    emulation — ONE shuffle on user_id, one running-value window,
    O(n log n) at any scale.  Equivalence of the two spellings is the
    oracle check itself.  Version rows order (ts, kind, event_id) with
    dim rows first so a state change at the probe's exact timestamp is
    already visible (valid_from <= ts, inclusive), matching the SQL —
    and dim rows KEEP their real event_id so two versions sharing one
    timestamp tiebreak exactly like the oracle's lead(..., ORDER BY
    ts, event_id) validity tiling (the earlier version gets a
    zero-width interval; without the tiebreak, last() over the tie was
    partition-order luck — round-9 differential-test finding)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    dim = e.filter(F.col("event_type").isin("signup", "click")).select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_type").alias("ref_state"),
        F.col("ts").alias("ref_ts"),
        F.lit(0).alias("kind"),
    )
    probes = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("string").alias("ref_state"),
        F.lit(None).cast("timestamp").alias("ref_ts"),
        F.lit(1).alias("kind"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        probes.unionByName(dim)
        .withColumn(
            "state_at_purchase",
            F.last("ref_state", ignorenulls=True).over(w),
        )
        .withColumn(
            "state_since", F.last("ref_ts", ignorenulls=True).over(w)
        )
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "event_id", "user_id", "ts", "state_at_purchase", "state_since"
        )
    )
