"""Round-11 extension batch: exact substring dedup and
product-quantization encoding — the two remaining classics of a
training-data pipeline (r10 verdict items 3 and 6).

- ``dedup_substring_exact``: every maximal duplicated token run of
  length >= 50 across the corpus (the public ExactSubstr technique,
  re-expressed for Spark: position-indexed 50-token shingle hashes,
  one content-hash shuffle, gaps-and-islands merge per doc).
- ``sim_pq_codebook_assign``: product-quantization codebook
  assignment — the ANN-index *build* step (IVF-PQ's second half,
  complementing ``sim_ann_ivf``'s coarse quantizer): 8 sub-quantizers
  x 16 literal centroids, exact squared-L2 argmin per subvector,
  pure map-side projection.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; extends SURVEY.md §2.3 sections G/H.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# dedup_substring_exact
# --------------------------------------------------------------------------

# Duplication threshold in tokens.  A substring of >= _SUB_L tokens is
# duplicated iff its leading _SUB_L-token shingle is duplicated, so
# fixed-length shingle hashing detects EXACTLY the >= _SUB_L
# duplicated substrings (no false positives modulo md5 collisions, no
# misses), and consecutive duplicated positions merge into the maximal
# duplicated run: run of R shingle positions = R + _SUB_L - 1 tokens.
_SUB_L = 50

_SUBSTR_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
sh AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(toks[i:i+{_SUB_L - 1}], ' ')) AS h
  FROM t, LATERAL (
    SELECT unnest(generate_series(1, len(toks) - {_SUB_L - 1})) AS i
  ) g
  WHERE len(toks) >= {_SUB_L}
),
dup AS (
  SELECT doc_id, pos FROM sh
  WHERE h IN (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 2)
),
isl AS (
  SELECT doc_id, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM dup
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS run_start,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COUNT(*) + {_SUB_L - 1} AS BIGINT) AS dup_len_tokens
FROM isl
GROUP BY doc_id, grp
"""


@register("dedup_substring_exact", oracle=_SUBSTR_SQL)
def dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All maximal duplicated substrings of >= 50 tokens across the
    corpus — the ExactSubstr dedup of training-data pipelines
    (arbitrary-length duplication at token granularity, complementing
    ``decontaminate_ngram_overlap``'s fixed-n membership test).

    Exactness: a duplicated substring of >= L tokens duplicates every
    one of its L-token shingles, and any duplicated L-shingle IS a
    duplicated L-token substring — so "positions whose 50-shingle
    hash appears >= 2 times corpus-wide", merged into consecutive
    runs per doc (gaps-and-islands: pos - row_number is constant on a
    run), yields exactly the maximal duplicated regions.  Matches
    count occurrences, so a substring repeated twice inside ONE doc
    is found too (self-duplication — the thing suffix-array ExactSubstr
    catches and pairwise doc dedup misses).

    Engine shape (100 TB): shingle hashing is pure map-side (md5 over
    the 50-token window — the md5-portability trick from
    dedup_fuzzy_minhash; a production build swaps in a Karp-Rabin
    rolling hash to make it O(n) per doc, which changes per-row CPU
    only, not the plan); duplicate marking is ONE content-hash
    shuffle (count window over h — boilerplate-skewed hashes are
    AQE-splittable); the island merge is a per-doc window (shuffle by
    doc_id, never global).  No joins, no driver state, output scales
    with duplication rate, not corpus size.
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sh = (
        d.filter(F.size(toks) >= _SUB_L)
        .select(F.col("doc_id"), toks.alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) - {_SUB_L - 1}),"
                    " i -> named_struct('pos', CAST(i AS BIGINT),"
                    f" 'h', md5(concat_ws(' ', slice(toks, i, {_SUB_L})))))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )
    dup = (
        sh.withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("n") >= 2)
        .select("doc_id", "pos")
    )
    isl = dup.withColumn(
        "grp",
        F.col("pos")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").cast("long").alias("run_start"),
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        (F.count(F.lit(1)) + (_SUB_L - 1)).cast("long").alias(
            "dup_len_tokens"
        ),
    ).select("doc_id", "run_start", "n_shingles", "dup_len_tokens")


# --------------------------------------------------------------------------
# sim_pq_codebook_assign
# --------------------------------------------------------------------------

_PQ_M = 8  # sub-quantizers (64-dim embedding -> 8 x 8-dim subvectors)
_PQ_K = 16  # centroids per sub-quantizer (4-bit codes)
_PQ_SUB = 8  # dims per subvector


def _pq_cent(m: int, k: int, i: int) -> float:
    """Literal centroid grid: c = ((131k + 17m + 7i) mod 41 - 20) / 32.
    Every value is n/32 with |n| <= 20 — exactly representable in
    binary AND in its finite decimal spelling, so the literal text
    parses to the identical double in both engines."""
    return ((k * 131 + m * 17 + i * 7) % 41 - 20) / 32.0


def _pq_sql(el) -> str:
    """Shared SQL text for both engines, differing ONLY in the element
    accessor ``el(idx) -> str`` (1-based).  Every arithmetic step —
    (e-c)² products, the left-associated 8-term distance sums, the
    left-associated distortion sum — is written as explicit
    left-to-right expressions, so both engines execute the identical
    IEEE operation sequence on identical inputs and the doubles match
    BITWISE (not just to tolerance): exact float64 inputs (float32
    upcast + n/32 literals), same rounding per op."""
    els = ", ".join(
        f"CAST({el(i + 1)} AS DOUBLE) AS e{i + 1}"
        for i in range(_PQ_M * _PQ_SUB)
    )
    d_cols = []
    for m in range(_PQ_M):
        for k in range(_PQ_K):
            terms = []
            for i in range(_PQ_SUB):
                idx = m * _PQ_SUB + i + 1
                c = repr(_pq_cent(m, k, i))
                terms.append(f"(e{idx} - {c}) * (e{idx} - {c})")
            d_cols.append(f"({' + '.join(terms)}) AS d_{m}_{k}")
    mins = ", ".join(
        f"least({', '.join(f'd_{m}_{k}' for k in range(_PQ_K))}) AS mn_{m}"
        for m in range(_PQ_M)
    )
    codes = []
    for m in range(_PQ_M):
        whens = " ".join(
            f"WHEN d_{m}_{k} = mn_{m} THEN {k}" for k in range(_PQ_K)
        )
        codes.append(f"CAST(CASE {whens} END AS INT) AS code_{m}")
    distortion = " + ".join(f"mn_{m}" for m in range(_PQ_M))
    return f"""
WITH v AS (SELECT vec_id, {els} FROM embeddings),
d AS (SELECT vec_id, {", ".join(d_cols)} FROM v),
mn AS (SELECT *, {mins} FROM d)
SELECT vec_id, {", ".join(codes)},
       ROUND({distortion}, 6) AS distortion
FROM mn
"""


@register(
    "sim_pq_codebook_assign",
    oracle=_pq_sql(lambda i: f"embedding[{i}]"),
)
def sim_pq_codebook_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: each 64-dim embedding splits
    into 8 subvectors of 8 dims; each subvector is assigned its
    exact-argmin centroid among 16 literal per-subspace centroids
    (squared L2, ties to the smaller code — CASE scans k ascending).
    Output: 8 x 4-bit codes (a 32-bit PQ code) + total quantization
    distortion — the index-build step of IVF-PQ, pairing with
    ``sim_ann_ivf``'s coarse quantizer.

    Engine shape (100 TB): PQ encode is embarrassingly parallel — ONE
    projection riding the scan (codebook is literal text, so not even
    a broadcast), whole-stage codegen, zero shuffles, zero joins;
    output is 1 row per vector and feeds ``write.partitionBy`` or the
    posting-list layout directly.  A trained codebook swaps the
    literals for a broadcast 1-row array (the sim_ann_ivf centroid
    mechanism) without touching the plan shape.

    FULL value oracle, bitwise: both engines run the same literal SQL
    text modulo the element accessor (see ``_pq_sql``)."""
    table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "p24_pq_embeddings"
    )
    sql = _pq_sql(lambda i: f"element_at(embedding, {i})").replace(
        "FROM embeddings", "FROM p24_pq_embeddings"
    )
    return spark.sql(sql)
