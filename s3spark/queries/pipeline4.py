"""Round-4 pipeline operators: the remaining production shapes a
large-scale training-data pipeline runs between raw corpus and
training set, each with a FULL DuckDB value oracle.

- ``dedup_semdedup``: SemDeDup-style semantic deduplication
  (Abbas et al. 2023): cluster embeddings, then search for near-
  duplicates ONLY within a cluster — the trick that turns O(n²)
  pairwise cosine into O(n²/k) bounded work.  Cluster count scales
  with corpus size (k = ceil(n/64)) so per-cluster pair work stays
  linear in n at any scale.
- ``quality_classifier_hashed``: hashing-trick linear quality
  classifier (Weinberger et al. 2009; the fastText-style quality
  filter DCLM/FineWeb pipelines run over every document): tokens →
  portable md5 feature buckets → literal weight vector → in-row
  integer margin.  Pure row-local expressions, ZERO shuffle — the
  scoring pass is scan-fused, which is what lets production runs
  score 100 TB in one pass.
- ``bpe_train_unrolled``: BPE tokenizer-merge induction (Sennrich et
  al. 2016) as pure dataflow — two unrolled merge rounds over the
  word-TYPE table.  After the initial word count, every iteration
  works on distinct word shapes (vocabulary-bounded, NOT corpus-
  bounded): the 100 TB corpus is scanned once; merges cost shuffles
  over ~|vocab| rows.
- ``agg_kmv_distinct``: K-minimum-values distinct-count sketch
  (Bar-Yossef et al. 2002) with a portable md5 hash — unlike HLL
  (engine-private hash → rows-only), every intermediate here is
  engine-portable integer arithmetic, so an *approximate* sketch
  gets an EXACT full oracle.  The k-smallest pass is Spark's
  TakeOrdered: per-partition partial top-k then a k-row merge —
  exactly how a sketch union works across 100 TB of partitions.
- ``scan_manifest_prune``: lakehouse-style manifest pruning without
  a table format: write a file layout, build a per-file min/max
  manifest (what Iceberg/Delta store in metadata), plan the scan by
  intersecting predicate ranges with the manifest, and read ONLY
  the overlapping files.  File-skipping on column stats is the
  single biggest scan saver at 100 TB; Delta/Iceberg jars are
  absent in this container (ROUND_NOTES probes), so the manifest
  layer is implemented explicitly and value-verified.
- ``stream_foreach_batch_upsert``: the streaming-ingest-into-a-lake
  pattern as a verified query key — a real Structured Streaming job
  whose foreachBatch sink merges each micro-batch into a parquet
  target with crash-safe swap semantics (s3spark/streaming/ops.py),
  then the final target state is value-checked against the batch
  answer.

Reference scope: the reference (amazons3_blueprints/download_file.py
etc.) moves files; these keys are the mandated beyond-reference
engine surface (SURVEY.md §2.3 + north-star LLM-pipeline ops).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import scratch_dir, sql_dsum, table
from s3spark.registry import register

# --------------------------------------------------------------------------
# shared portable-hash fragments (precedent: llm.py dedup_simhash,
# robustness.py sample_hash_based)
# --------------------------------------------------------------------------


def _md5_long(col: F.Column, hexchars: int) -> F.Column:
    """First `hexchars` md5 hex chars as a bigint — portable across
    engines (DuckDB twin: CAST('0x' || substr(md5(x), 1, n) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, hexchars), 16, 10).cast("long")


def _sql_md5_long(expr: str, hexchars: int) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, {hexchars}) AS BIGINT)"


def _fold_dot(a, b) -> F.Column:
    """Sequential left-fold dot product — same accumulation order as
    DuckDB's list_dot_product, so doubles agree to the last ulp."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --------------------------------------------------------------------------
# dedup_semdedup
# --------------------------------------------------------------------------

_SEM_TAU = 0.44  # cosine radius; fixture's near-pair density sits at ~0.47
_SEM_PER_CLUSTER = 64  # target mean cluster size -> k = ceil(n/64)

_SEMDEDUP_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid, v AS cv FROM v
  WHERE vec_id < (SELECT CAST(ceil(COUNT(*) / {_SEM_PER_CLUSTER}.0) AS BIGINT)
                  FROM v)
),
a AS (
  SELECT vec_id, v, cid FROM (
    SELECT t.vec_id, t.v, c.cid,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY (list_dot_product(c.cv, c.cv)
                       - 2 * list_dot_product(t.v, c.cv)), c.cid) AS rk
    FROM v t CROSS JOIN c0 c) s
  WHERE rk = 1
),
dup AS (
  SELECT a2.cid, a2.vec_id AS dropped
  FROM a a1 JOIN a a2 ON a1.cid = a2.cid AND a1.vec_id < a2.vec_id
  WHERE list_dot_product(a1.v, a2.v)
        / (sqrt(list_dot_product(a1.v, a1.v))
           * sqrt(list_dot_product(a2.v, a2.v))) >= {_SEM_TAU}
),
d AS (SELECT cid, COUNT(DISTINCT dropped) AS n_dropped FROM dup GROUP BY cid)
SELECT a.cid, COUNT(*) AS n_members,
       COALESCE(MAX(d.n_dropped), 0) AS n_dropped,
       COUNT(*) - COALESCE(MAX(d.n_dropped), 0) AS n_kept
FROM a LEFT JOIN d ON a.cid = d.cid
GROUP BY a.cid
ORDER BY a.cid
"""


@register("dedup_semdedup", oracle=_SEMDEDUP_SQL)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023): cluster
    the embedding space, then drop any vector whose cosine to a
    LOWER-id vector in the SAME cluster is >= tau — near-duplicate
    search restricted to cluster interiors.

    Scale shape: cluster count k = ceil(n/64) grows with the corpus,
    so expected pair work is n·64 (linear), never n².  The pipeline
    is (1) a zero-shuffle assignment — the k centroid vectors ride in
    ONE broadcast row and each vector takes an in-row reduced-distance
    argmin (sim_ann_ivf's pattern; c·c - 2·v·c, the v·v term is
    constant under argmin), then (2) one equi-join shuffle on cid for
    the within-cluster pairs with norms precomputed per row (one fold
    per pair, not three).  Deterministic: centroids are the first k
    vectors, dots fold in DuckDB's order, and
    tests/test_pipeline4.py pins the |cos - tau| margin across the
    fixture so the threshold cannot flip between engines.  The single
    driver-side value is the corpus count that sizes k (planner-time
    scalar, same class as dedup_clusters' edge cap).

    Round-12 plan audit: ``assigned`` has THREE consumers (both pair
    legs + the member counts) and Spark plans are trees, so the
    k-centroid interpreted argmin replayed 3× over the corpus; it is
    now localCheckpointed once (narrow rows: id, vector, norm², cid).
    The within-cluster pair cosines likewise compute ONCE in a
    projection behind a second checkpoint barrier — written as
    join → filter(τ), Catalyst folds the fold-dot predicate into the
    join condition and re-evaluates it per output row (the
    dedup_embedding_cosine finding; measured 3.17 s → 1.0 s at
    sf0.1).  The pair checkpoint carries (cid, j, cos) only — three
    narrow columns, never the vectors."""
    e = table(spark, sf_dir, "embeddings")
    n = e.count()
    k = -(-n // _SEM_PER_CLUSTER)
    vecs = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("n2", _fold_dot(F.col("v"), F.col("v")))
    cents = (
        vecs.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        .withColumn("cc", _fold_dot(F.col("cv"), F.col("cv")))
        .agg(F.collect_list(F.struct("cid", "cv", "cc")).alias("cents"))
    )
    assigned = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn(
            "best",
            F.array_min(
                F.transform(
                    "cents",
                    lambda c: F.struct(
                        (c["cc"] - 2 * _fold_dot(F.col("v"), c["cv"])).alias(
                            "dist"
                        ),
                        c["cid"].alias("cid"),
                    ),
                )
            ),
        )
        .select("vec_id", "v", "n2", F.col("best")["cid"].alias("cid"))
        .localCheckpoint()
    )
    a1 = assigned.select(
        "cid",
        F.col("vec_id").alias("i"),
        F.col("v").alias("vi"),
        F.col("n2").alias("n2i"),
    )
    a2 = assigned.select(
        "cid",
        F.col("vec_id").alias("j"),
        F.col("v").alias("vj"),
        F.col("n2").alias("n2j"),
    )
    pair_cos = (
        a1.join(a2, "cid")
        .filter(F.col("i") < F.col("j"))
        .select(
            "cid",
            "j",
            (
                _fold_dot(F.col("vi"), F.col("vj"))
                / (F.sqrt("n2i") * F.sqrt("n2j"))
            ).alias("cos"),
        )
        .localCheckpoint()
    )
    dup = (
        pair_cos.filter(F.col("cos") >= _SEM_TAU)
        .groupBy("cid")
        .agg(F.countDistinct("j").alias("n_dropped"))
    )
    members = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        members.join(dup, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0))).alias(
                "n_kept"
            ),
        )
        .orderBy("cid")
    )


# --------------------------------------------------------------------------
# quality_classifier_hashed
# --------------------------------------------------------------------------

_QC_BUCKETS = 64
# Literal weight vector in integer MICRO-units: every engine sums the
# same bigints, so the margin is bit-exact with no float/decimal dance.
_qc_rng = random.Random(20260814)
_QC_W: list[int] = [
    round(_qc_rng.gauss(0.0, 1.0) * 1_000_000) for _ in range(_QC_BUCKETS)
]

_QC_W_SQL = "[" + ", ".join(str(w) for w in _QC_W) + "]"

_QC_SQL = f"""
WITH scored AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS t
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(COALESCE(list_sum(list_transform(t,
           x -> ({_QC_W_SQL})[({_sql_md5_long('x', 6)} % {_QC_BUCKETS}) + 1]
         )), 0) AS BIGINT) AS margin_micro
  FROM scored
)
SELECT doc_id, n_tokens, margin_micro,
       CASE WHEN margin_micro > 0 THEN 1 ELSE 0 END AS label
FROM m
ORDER BY doc_id
"""


@register("quality_classifier_hashed", oracle=_QC_SQL)
def quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick linear quality classifier — the fastText-style
    model-based filter (DCLM, FineWeb-Edu) reduced to its production
    inference shape: token → md5 feature bucket (portable 24-bit
    hash % 64) → literal weight lookup → per-document margin.

    The entire score is ONE row-local expression: tokenize, hash,
    element_at into a 64-literal weight array, and fold with an
    integer accumulator — no shuffle, no UDF, no model server; the
    scoring pass fuses into the scan, which is how a real classifier
    sweep covers 100 TB in a single read.  Weights are integer
    micro-units so the margin is bit-exact on every engine and under
    every partitioning (float weights would demand an ordered fold).
    At scale the only change is a bigger weight array (2^18 buckets
    rides comfortably in a literal/broadcast)."""
    d = table(spark, sf_dir, "documents")
    warr = F.array(*[F.lit(w).cast("long") for w in _QC_W])
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    margin = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.element_at(
            warr, (_md5_long(t, 6) % _QC_BUCKETS + 1).cast("int")
        ),
    )
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            margin.alias("margin_micro"),
        )
        .withColumn(
            "label", F.when(F.col("margin_micro") > 0, 1).otherwise(0)
        )
    )


# --------------------------------------------------------------------------
# bpe_train_unrolled
# --------------------------------------------------------------------------

# Word-boundary-safe symbol sequences: tokens are wrapped as
# ||t1||t2||...||, and the merge of pair (a,b) is the LITERAL (non-
# regex) replace of '|a||b|' with '|ab|'.  The double delimiter makes
# left-to-right non-overlapping replace() both correct at token
# boundaries (a trailing 'x'+'t' can never match pattern 't||h') and
# greedy-left for runs ('aaa' -> 'aa','a'), matching reference BPE.

_BPE_SQL = f"""
WITH words AS (
  SELECT tok AS word, COUNT(*) AS n
  FROM documents,
       UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                          x -> x <> '')) AS u(tok)
  GROUP BY tok
),
s0 AS (
  SELECT word, n,
         '||' || regexp_replace(word, '(.)', '\\1||', 'g') AS seq
  FROM words
),
p1 AS (
  SELECT t[i] AS l, t[i + 1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT n, list_filter(string_split(seq, '||'), x -> x <> '') AS t
        FROM s0),
       UNNEST(range(1, len(t))) AS u(i)
  GROUP BY 1, 2
),
m1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
s1 AS (
  SELECT s0.word, s0.n,
         replace(s0.seq, '|' || m1.l || '||' || m1.r || '|',
                 '|' || m1.l || m1.r || '|') AS seq
  FROM s0, m1
),
t1 AS (
  SELECT CAST(SUM(n * len(list_filter(string_split(seq, '||'),
                                      x -> x <> ''))) AS BIGINT) AS total
  FROM s1
),
p2 AS (
  SELECT t[i] AS l, t[i + 1] AS r, CAST(SUM(n) AS BIGINT) AS cnt
  FROM (SELECT n, list_filter(string_split(seq, '||'), x -> x <> '') AS t
        FROM s1),
       UNNEST(range(1, len(t))) AS u(i)
  GROUP BY 1, 2
),
m2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
s2 AS (
  SELECT s1.word, s1.n,
         replace(s1.seq, '|' || m2.l || '||' || m2.r || '|',
                 '|' || m2.l || m2.r || '|') AS seq
  FROM s1, m2
),
t2 AS (
  SELECT CAST(SUM(n * len(list_filter(string_split(seq, '||'),
                                      x -> x <> ''))) AS BIGINT) AS total
  FROM s2
)
SELECT 1 AS step, m1.l AS left_sym, m1.r AS right_sym,
       m1.l || m1.r AS merged, m1.cnt AS pair_count,
       t1.total AS corpus_tokens_after
FROM m1, t1
UNION ALL
SELECT 2, m2.l, m2.r, m2.l || m2.r, m2.cnt, t2.total FROM m2, t2
ORDER BY step
"""


def _bpe_toks(seq: F.Column) -> F.Column:
    return F.filter(F.split(seq, "\\|\\|"), lambda x: x != "")


def _bpe_pairs(words: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent-symbol pair counts over word types,
    weighted by word frequency."""
    t = _bpe_toks(F.col("seq"))
    pairs = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        words.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").alias("cnt"))
    )


def _bpe_top1(pairs: DataFrame) -> DataFrame:
    return pairs.orderBy(F.desc("cnt"), "l", "r").limit(1)


def _bpe_merge(words: DataFrame, top1: DataFrame) -> DataFrame:
    """Apply one learned merge corpus-wide: literal replace of
    '|l||r|' with '|lr|' in every word's symbol sequence."""
    return words.crossJoin(F.broadcast(top1.select("l", "r"))).select(
        "word",
        "n",
        F.expr(
            "replace(seq, concat('|', l, '||', r, '|'),"
            " concat('|', l, r, '|'))"
        ).alias("seq"),
    )


def _bpe_total(words: DataFrame) -> DataFrame:
    return words.agg(
        F.sum(F.col("n") * F.size(_bpe_toks(F.col("seq"))))
        .cast("long")
        .alias("corpus_tokens_after")
    )


def bpe_train(words: DataFrame, steps: int = 2) -> DataFrame:
    """Unrolled BPE merge induction over a (word, n, seq) word-type
    table; returns one row per learned merge.  Exposed as a library
    function so tests can drive it with a toy corpus."""
    out = None
    cur = words
    for step in range(1, steps + 1):
        top = _bpe_top1(_bpe_pairs(cur))
        cur = _bpe_merge(cur, top)
        row = (
            top.select(
                F.lit(step).alias("step"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.concat("l", "r").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
            .crossJoin(_bpe_total(cur))
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("step")


@register("bpe_train_unrolled", oracle=_BPE_SQL)
def bpe_train_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016) as pure dataflow:
    two unrolled merge rounds — count adjacent symbol pairs over word
    TYPES weighted by frequency, merge the argmax pair corpus-wide,
    recount — reporting each learned merge and the shrinking corpus
    token total.

    The 100 TB property: after the initial word count (ONE scan +
    one shuffle over word occurrences), every iteration touches only
    the distinct-word table — vocabulary-bounded work independent of
    corpus size, exactly how production BPE trainers scale.  The
    word-type table is materialized to parquet once (lineage break,
    same pattern as graph_pagerank_unrolled) so the unrolled rounds
    re-read ~|vocab| rows instead of replaying the corpus scan.
    Merges are LITERAL replaces over double-delimited symbol
    sequences ('||t||h||e||'; pattern '|t||h|' → '|th|') — boundary-
    safe for multi-char symbols and greedy-left on runs, matching
    reference BPE, with no regex-escaping hazard.  Argmax tie-break
    is (count desc, pair asc) on both engines."""
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z]+"),
                    lambda x: x != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "word",
            "n",
            F.concat(
                F.lit("||"), F.regexp_replace("word", "(.)", "$1||")
            ).alias("seq"),
        )
    )
    wpath = scratch_dir("bpe") + "/words"
    words.write.mode("overwrite").parquet(wpath)
    return bpe_train(spark.read.parquet(wpath), steps=2)


# --------------------------------------------------------------------------
# agg_kmv_distinct
# --------------------------------------------------------------------------

_KMV_K = 256
_KMV_M = 1 << 48  # hash domain: 12 md5 hex chars

_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT {_sql_md5_long('CAST(o_custkey AS VARCHAR)', 12)} AS hv
  FROM orders
),
k AS (SELECT hv FROM h ORDER BY hv LIMIT {_KMV_K}),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used, MAX(hv) AS kth_hash FROM k),
t AS (SELECT COUNT(DISTINCT o_custkey) AS true_distinct FROM orders)
SELECT s.k_used, s.kth_hash,
       CASE WHEN s.k_used < {_KMV_K} THEN s.k_used
            ELSE ({_KMV_K - 1} * {_KMV_M}) // s.kth_hash END AS est_distinct,
       t.true_distinct
FROM s, t
"""


@register("agg_kmv_distinct", oracle=_KMV_SQL)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002)
    with a FULL value oracle: hash every key with a portable md5-
    derived 48-bit integer, keep the K=256 smallest distinct hashes,
    and estimate |D| = (K-1)·M / h_(K).

    This is the sketch HLL keys can't oracle (engine-private hash):
    here every intermediate — hash, k-smallest, integer-division
    estimate — is identical arithmetic on both engines, so the
    approximation itself is value-verified.  Distribution shape: the
    k-smallest pass is a TakeOrdered — each partition keeps its local
    K smallest, the driver merges K-row sketches — which is exactly
    the sketch's merge operator: at 100 TB, per-shard KMV sketches
    union by 'concat and re-take K smallest', no rescan.  Expected
    relative error ~1/sqrt(K) ≈ 6% (pinned in tests).  When the
    corpus has fewer than K distinct hashes the sketch IS the exact
    count (k_used branch)."""
    o = table(spark, sf_dir, "orders")
    hashes = o.select(
        _md5_long(F.col("o_custkey").cast("string"), 12).alias("hv")
    ).distinct()
    sketch = (
        hashes.orderBy("hv")
        .limit(_KMV_K)
        .agg(
            F.count(F.lit(1)).alias("k_used"),
            F.max("hv").alias("kth_hash"),
        )
    )
    true_d = o.agg(F.countDistinct("o_custkey").alias("true_distinct"))
    return sketch.crossJoin(true_d).select(
        "k_used",
        "kth_hash",
        F.when(F.col("k_used") < _KMV_K, F.col("k_used"))
        .otherwise(
            F.expr(f"{_KMV_K - 1}L * {_KMV_M}L div kth_hash")
        )
        .alias("est_distinct"),
        "true_distinct",
    )


# --------------------------------------------------------------------------
# agg_countmin_sketch
# --------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 1024
_CMS_KEYS = [1, 7, 42, 250, 999, 1250, 1499, 987654]  # last one absent

_CMS_KEYS_SQL = "[" + ", ".join(str(k) for k in _CMS_KEYS) + "]"
_CMS_ROWS_SQL = "[" + ", ".join(str(i) for i in range(_CMS_D)) + "]"


def _cms_bucket_sql(key_expr: str) -> str:
    # hash row i = 32-bit word i of ONE md5 (the permutation-test /
    # bootstrap amortization): 1 md5 per key instead of d=4, words
    # extracted as exact 8-hex integers; 2^32 % w == 0 so % w is
    # bias-free
    return (
        f"CAST('0x' || substr(md5(CAST({key_expr} AS VARCHAR)),"
        f" 1 + 8 * i, 8) AS BIGINT) % {_CMS_W}"
    )


_CMS_SQL = f"""
WITH c AS (
  SELECT i, {_cms_bucket_sql('o_custkey')} AS b, COUNT(*) AS cnt
  FROM orders, UNNEST({_CMS_ROWS_SQL}) AS u(i)
  GROUP BY 1, 2
),
q AS (SELECT unnest({_CMS_KEYS_SQL}) AS k),
p AS (
  SELECT q.k, u.i, {_cms_bucket_sql('q.k')} AS b
  FROM q, UNNEST({_CMS_ROWS_SQL}) AS u(i)
),
e AS (
  SELECT p.k, MIN(COALESCE(c.cnt, 0)) AS est_count
  FROM p LEFT JOIN c ON p.i = c.i AND p.b = c.b
  GROUP BY p.k
),
t AS (
  SELECT o_custkey AS k, COUNT(*) AS n FROM orders
  WHERE o_custkey IN (SELECT k FROM q) GROUP BY 1
)
SELECT e.k AS probe_key,
       CAST(e.est_count AS BIGINT) AS est_count,
       CAST(COALESCE(t.n, 0) AS BIGINT) AS true_count
FROM e LEFT JOIN t ON e.k = t.k
ORDER BY probe_key
"""


@register("agg_countmin_sketch", oracle=_CMS_SQL)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) frequency
    estimation with a FULL value oracle: d=4 portable md5 hash rows ×
    w=1024 buckets, probed for 8 fixed keys (one deliberately absent)
    and reported next to the exact counts.

    Completes the sketch family: HLL (engine-private hash →
    rows-only), KMV (portable, oracle-exact), and now CMS — every
    estimate here is integer arithmetic identical on both engines.
    Scale shape: the sketch state is a BOUNDED d·w grid, so map-side
    partial aggregation collapses the build shuffle to ≤4096 rows no
    matter how many trillion events stream through — and two shards'
    sketches merge by cell-wise addition, which is exactly what the
    partial-agg combiner is doing.  CMS never underestimates
    (est >= true, pinned in tests); collisions only inflate.

    Hash rows are the FOUR 32-bit words of ONE md5 per key (the
    stats_permutation_test / bootstrap amortization — round 8 cut the
    d per-row md5 calls to one, 2.6× faster at sf0.1): the buckets are
    precomputed as a d-element array from the single hex string, then
    posexploded, so the generated rows carry two ints, not strings.
    2³² % w == 0, so the % w fold is bias-free."""
    o = table(spark, sf_dir, "orders")

    def buckets(key: F.Column) -> F.Column:
        hx = F.md5(key.cast("string"))
        return F.array(
            *[
                F.pmod(
                    F.conv(
                        F.substring(hx, 1 + 8 * i, 8), 16, 10
                    ).cast("long"),
                    F.lit(_CMS_W),
                )
                for i in range(_CMS_D)
            ]
        )

    cms = (
        o.select(
            F.posexplode(buckets(F.col("o_custkey"))).alias("i", "b")
        )
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = spark.createDataFrame([(k,) for k in _CMS_KEYS], "k long")
    probes = q.select(
        "k", F.posexplode(buckets(F.col("k"))).alias("i", "b")
    )
    est = (
        probes.join(cms, ["i", "b"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("long"))).alias("est_count"))
    )
    true = (
        o.filter(F.col("o_custkey").isin(_CMS_KEYS))
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        est.join(true, "k", "left")
        .select(
            F.col("k").alias("probe_key"),
            "est_count",
            F.coalesce("n", F.lit(0).cast("long")).alias("true_count"),
        )
        .orderBy("probe_key")
    )


# --------------------------------------------------------------------------
# cdc_apply_tombstones
# --------------------------------------------------------------------------


@register(
    "cdc_apply_tombstones",
    oracle="""
WITH log AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
latest AS (
  SELECT user_id, event_id, ts, event_type, op FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM log)
  WHERE rn = 1
)
SELECT user_id, event_id, ts, event_type
FROM latest WHERE op <> 'D'
ORDER BY user_id
""",
)
def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log → snapshot with DELETE semantics: the change log
    carries upserts AND tombstones (here derived deterministically:
    'error' events are deletes), and the snapshot keeps each key's
    latest record ONLY if that latest operation is not a delete —
    the missing half of dedup_keep_latest, and what MERGE INTO ...
    WHEN MATCHED AND op='D' THEN DELETE does on a lakehouse table
    (jars absent; same emulation stance as merge_upsert).

    One key-partitioned window with the rn=1 predicate pushed into a
    per-partition top-1 (WindowGroupLimit — same plan as
    dedup_keep_latest), then a row-local op filter; tombstone
    handling adds ZERO extra shuffles.  Tie-break (ts, event_id)
    keeps same-timestamp races deterministic."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", "event_id", "ts", "event_type")
    )


# --------------------------------------------------------------------------
# scan_manifest_prune
# --------------------------------------------------------------------------

_MP_D1 = "1996-03-01"
_MP_D2 = "1996-09-30"

_MANIFEST_SQL = f"""
WITH b AS (
  SELECT (year(l_shipdate) - 1995) * 6 + (month(l_shipdate) - 1) // 2 AS fb,
         MIN(l_shipdate) AS mn, MAX(l_shipdate) AS mx
  FROM lineitem GROUP BY 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_files_total,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b
        WHERE mx >= TIMESTAMP '{_MP_D1} 00:00:00'
          AND mn <= TIMESTAMP '{_MP_D2} 00:00:00') AS n_files_read,
       COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_MP_D1} 00:00:00'
  AND l_shipdate <= TIMESTAMP '{_MP_D2} 00:00:00'
"""


@register("scan_manifest_prune", oracle=_MANIFEST_SQL)
def scan_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse manifest pruning implemented explicitly: lay lineitem
    out as one file per two-month shipdate bucket, build a per-file
    (min, max, rows) column-stats manifest from the ``_metadata``
    struct, and plan a date-range scan by intersecting the predicate
    with the manifest — only overlapping files are opened; a residual
    filter keeps exactness.

    This is precisely what Iceberg/Delta store in manifest/checkpoint
    metadata (jars absent here — ROUND_NOTES probes), and the
    mechanism works on ANY layout, not just directory partitions:
    min/max stats prune files wherever the layout correlates with the
    predicate column (cf. sort_zorder_layout for the 2-D version).
    The manifest is a per-FILE table — thousands of rows at 100 TB —
    so collecting it to the planner is the same driver-side metadata
    op every lakehouse query planner performs (fs.py listing
    precedent).  Output pins both the query answer AND the file-skip
    decision (n_files_read of n_files_total)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    out = scratch_dir("manifest") + "/lineitem_bucketed"
    bucketed = li.withColumn(
        "fb",
        (
            (F.year("l_shipdate") - 1995) * 6
            + F.expr("(month(l_shipdate) - 1) div 2")
        ).cast("int"),
    )
    bucketed.repartition("fb").write.partitionBy("fb").mode(
        "overwrite"
    ).parquet(out)
    spark.catalog.refreshByPath(out)
    # explicit schema: an empty source writes no partitions to infer
    # from (round-9 empty-input sweep)
    laid = spark.read.schema(bucketed.schema).parquet(out)
    manifest = (
        laid.groupBy(F.col("_metadata.file_path").alias("file"))
        .agg(F.min("l_shipdate").alias("mn"), F.max("l_shipdate").alias("mx"))
        .collect()
    )
    d1, d2 = f"{_MP_D1} 00:00:00", f"{_MP_D2} 00:00:00"
    import datetime

    lo = datetime.datetime.fromisoformat(d1)
    hi = datetime.datetime.fromisoformat(d2)
    chosen = [r["file"] for r in manifest if r["mx"] >= lo and r["mn"] <= hi]
    # an all-pruned (or empty-source) manifest selects ZERO files —
    # spark.read.parquet() rejects an empty path list, so the scan of
    # nothing is an explicit empty relation.  The pruned read targets
    # LEAF files, which get no partition discovery: including the fb
    # partition column in the schema would silently materialize it as
    # all-NULL (round-9 advice), so the leaf scan carries the DATA
    # columns only (li.schema — exactly what the files contain).
    pruned = (
        spark.read.schema(li.schema).parquet(*chosen)
        if chosen
        else spark.createDataFrame([], li.schema)
    )
    return (
        pruned.filter(
            (F.col("l_shipdate") >= F.lit(d1).cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit(d2).cast("timestamp"))
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(25,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.lit(len(manifest)).cast("long").alias("n_files_total"),
            F.lit(len(chosen)).cast("long").alias("n_files_read"),
            "n_rows",
            "revenue",
        )
    )


# --------------------------------------------------------------------------
# join_pit_features
# --------------------------------------------------------------------------


@register(
    "join_pit_features",
    oracle="""
WITH probes AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
),
purch AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
clicks AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts,
       round(pu.value, 6) AS last_purchase_value,
       round(cl.value, 6) AS last_click_value
FROM probes p
ASOF LEFT JOIN purch pu ON p.user_id = pu.user_id AND p.ts >= pu.ts
ASOF LEFT JOIN clicks cl ON p.user_id = cl.user_id AND p.ts >= cl.ts
ORDER BY p.event_id
""",
)
def join_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature-store join: for every training example
    (view event), attach the as-of value of N feature streams (last
    purchase value, last click value) at-or-before the example's
    timestamp — the leakage-free backfill every feature store runs
    before training.

    The scale property vs running join_asof N times: ALL feature
    streams union into ONE user-keyed window pass, one shuffle + one
    sort TOTAL for any number of features (each feature is one more
    last(ignorenulls) over the same frame), where N separate as-of
    joins would cost N shuffles of the probe side.  State per key
    stays N running values — bounded, survives 100 TB.  Reference
    rows sort before probes on timestamp ties (kind 0 < 1) so an
    example coinciding with a feature event sees it, matching
    DuckDB's inclusive ASOF.

    Tie precondition (round-9 audit): if one user emits two SAME-type
    feature events at one timestamp with DIFFERENT values, which one
    wins is unspecified on BOTH engines (DuckDB's ASOF picks an
    arbitrary equal-key row; last() over the window tie is
    partition-order dependent here) — unlike join_scd2_point_in_time,
    whose oracle tiles validity by event_id and where the emulation
    was therefore made to tiebreak identically.  The fixture streams
    are unique per (user, type, ts); a production feature store must
    dedupe-to-latest upstream (dedup_keep_latest) before this join."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    probes = e.filter(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("double").alias("pv"),
        F.lit(None).cast("double").alias("cv"),
        F.lit(1).alias("kind"),
    )

    def refs(etype: str, col: str) -> DataFrame:
        return e.filter(F.col("event_type") == etype).select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "ts",
            F.col("value").alias("pv")
            if col == "pv"
            else F.lit(None).cast("double").alias("pv"),
            F.col("value").alias("cv")
            if col == "cv"
            else F.lit(None).cast("double").alias("cv"),
            F.lit(0).alias("kind"),
        )

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        probes.unionByName(refs("purchase", "pv"))
        .unionByName(refs("click", "cv"))
        .withColumn("lp", F.last("pv", ignorenulls=True).over(w))
        .withColumn("lc", F.last("cv", ignorenulls=True).over(w))
    )
    return (
        merged.filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round("lp", 6).alias("last_purchase_value"),
            F.round("lc", 6).alias("last_click_value"),
        )
    )


# --------------------------------------------------------------------------
# scan_incremental_manifest_diff
# --------------------------------------------------------------------------

_INC_CUT = 30  # fb >= 30 <=> l_shipdate year >= 2000

_INC_SQL = f"""
WITH f AS (
  SELECT (year(l_shipdate) - 1995) * 6 + (month(l_shipdate) - 1) // 2 AS fb
  FROM lineitem
)
SELECT (SELECT CAST(COUNT(DISTINCT fb) AS BIGINT) FROM f
        WHERE fb >= {_INC_CUT}) AS n_new_files,
       COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
WHERE (year(l_shipdate) - 1995) * 6 + (month(l_shipdate) - 1) // 2
      >= {_INC_CUT}
"""


@register("scan_incremental_manifest_diff", oracle=_INC_SQL)
def scan_incremental_manifest_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (CDC-style) table read via manifest diff: commit 1
    writes the historical partitions, commit 2 APPENDS the new ones,
    and the incremental consumer lists the file set before and after,
    reads ONLY the difference, and aggregates just the newly-committed
    rows — the Iceberg incremental-scan / Delta CDF consumption
    pattern, emulated explicitly because the jars are absent
    (ROUND_NOTES probes; same stance as snapshot_time_travel).

    The consumer never rescans history: work is proportional to the
    appended data, which is what makes incremental pipelines viable
    when the table is 100 TB but the day's delta is 100 GB.  The file
    diff is a driver-side set difference over two listings (planner
    metadata op, manifest-prune precedent); files are one per
    two-month bucket so the diff — and the oracle — is
    deterministic."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    fb = (
        (F.year("l_shipdate") - 1995) * 6
        + F.expr("(month(l_shipdate) - 1) div 2")
    ).cast("int")
    out = scratch_dir("incr") + "/lineitem_commits"
    hist = li.withColumn("fb", fb).filter(F.col("fb") < _INC_CUT)
    delta = li.withColumn("fb", fb).filter(F.col("fb") >= _INC_CUT)
    hist.repartition("fb").write.partitionBy("fb").mode("overwrite").parquet(
        out
    )
    spark.catalog.refreshByPath(out)
    # explicit schema on the incremental read: an empty commit writes
    # no partitions to infer from (round-9 empty-input sweep)
    sch = hist.schema
    # Manifest listings are DRIVER-SIDE metadata ops (round-12): the
    # previous shape ran a full Spark job per listing — scan every row
    # of the committed table, project _metadata.file_path, distinct,
    # collect — twice, just to enumerate file names a metadata walk
    # returns from the store's LIST API.  A real manifest diff reads
    # the table format's metadata, never the data files.  The walk
    # goes through the fs layer's Hadoop FileSystem listing (round-13,
    # r12 ADVICE: the earlier os.walk only worked because scratch is
    # local — on s3a:// scratch it would silently return an empty
    # diff), so the same code lists any scheme.
    from s3spark.fs import list_paths

    def _commit_files(root: str) -> set:
        return set(list_paths(spark, root, suffix=".parquet"))

    before = _commit_files(out)
    delta.repartition("fb").write.partitionBy("fb").mode("append").parquet(out)
    spark.catalog.refreshByPath(out)
    after = _commit_files(out)
    new_files = sorted(after - before)
    # an empty delta commit appends zero files — the incremental scan
    # of nothing is an explicit empty relation, not a reader error
    inc = (
        spark.read.schema(sch).parquet(*new_files)
        if new_files
        else spark.createDataFrame([], sch)
    )
    return inc.agg(
        F.lit(len(new_files)).cast("long").alias("n_new_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(25,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )


# --------------------------------------------------------------------------
# stream_foreach_batch_upsert
# --------------------------------------------------------------------------


@register(
    "stream_foreach_batch_upsert",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def stream_foreach_batch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest into a lake target, end to end: a real
    Structured Streaming job (availableNow) whose foreachBatch sink
    merges every micro-batch into a parquet target by key with the
    crash-safe aside-swap protocol (s3spark/streaming/ops.py
    stream_merge_into — anti-join ∪ batch, target.bak recovery), then
    the FINAL TARGET STATE is aggregated and value-checked against
    the batch answer over the same source.

    foreachBatch + an idempotent merge is the production pattern for
    exactly-once lake ingestion without a table format; with Delta/
    Iceberg jars the body becomes MERGE INTO and the swap dance
    disappears.  event_id is unique in the fixture, so the merged
    target equals the full event set and the oracle is exact."""
    from s3spark.streaming import events_stream, stream_merge_into

    target = scratch_dir("fbupsert", fresh=True) + "/target"
    src = events_stream(spark, sf_dir)
    stream_merge_into(src, target)
    spark.catalog.refreshByPath(target)
    # an EMPTY source stream runs zero batches, so the merge target is
    # never created (round-9 empty-input sweep) — the merged view of
    # nothing is an explicit empty relation, not a PATH_NOT_FOUND
    import os

    if os.path.exists(target):
        merged = spark.read.parquet(target)
    else:
        merged = spark.createDataFrame([], src.schema)
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(25,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_type")
    )
