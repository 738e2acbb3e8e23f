"""Training-data pipeline operators, round 2: PII scrubbing,
embedding quantization, and deterministic corpus mixing — the
curation steps between raw crawl and training shards that the round-1
surface didn't yet cover.

All three are pure map-side (zero-shuffle except tiny final aggs) and
oracle-exact: redaction and sampling use engine-portable primitives
(regex, md5-hex ordering, floor arithmetic) so DuckDB reproduces them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

# Synthetic-PII injection (fixture text has none): deterministic per
# doc_id so both engines build the identical corpus.
_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-\d{4}\b"


@register(
    "text_pii_scrub",
    oracle=f"""
WITH corpus AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         AS text
  FROM documents
  WHERE doc_id < 2000
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                      '{_PHONE_RE}', '[PHONE]', 'g') AS scrubbed
FROM corpus
ORDER BY doc_id
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: count and replace email/phone patterns in one
    map-side pass — the compliance scrub every crawl corpus goes
    through before training.

    The fixture text contains no PII, so a deterministic synthetic
    email+phone is appended per doc first (identically in the oracle).
    Spark regexp_replace is replace-all by default == DuckDB's 'g'
    flag; zero shuffle, whole-stage codegen, and at 100 TB this is
    exactly one pass over the text column with pushdown intact."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    corpus = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return corpus.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ).alias("scrubbed"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
  WHERE vec_id < 1000
),
s AS (
  SELECT vec_id, emb,
         127.0 / greatest(list_aggregate(list_transform(emb, x -> abs(x)), 'max'),
                          1e-12) AS scale
  FROM v
)
SELECT vec_id,
       round(scale, 6) AS scale,
       array_to_string(
         list_transform(emb,
                        x -> CAST(CAST(floor(x * scale + 0.5) AS INTEGER)
                                  AS VARCHAR)),
         ',') AS q_csv
FROM s
ORDER BY vec_id
""",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization: per-vector scale
    127/max|x|, values mapped with floor(x*scale+0.5) — 4× smaller
    vectors for ANN candidate generation, exact floats kept only for
    re-ranking.

    The quantized vector is emitted as a canonical CSV string
    (``q_csv``), not an array column: the binding harness hashes
    results through pandas and list cells are unhashable there
    (round-4 driver err).  A dimension-ordered join of the int codes
    is a lossless, hashable encoding of the same value.

    floor(x+0.5) instead of round(): Spark HALF_UP vs DuckDB C-style
    rounding diverge on exact .5 doubles (ROUND_NOTES), floor is
    identical on both.  Pure per-row HOF arithmetic: no shuffle, no
    UDF, codegen end-to-end — the 100 TB plan is a straight map."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = 127.0 / F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))), F.lit(1e-12)
    )
    return (
        e.select("vec_id", emb.alias("emb"), scale.alias("scale"))
        .select(
            "vec_id",
            F.round("scale", 6).alias("scale"),
            F.array_join(
                F.transform(
                    F.col("emb"),
                    lambda x: F.floor(x * F.col("scale") + 0.5)
                    .cast("int")
                    .cast("string"),
                ),
                ",",
            ).alias("q_csv"),
        )
    )


# hex thresholds over the first 8 md5 nibbles: 0xCCCCCCCC/2^32 = 0.8,
# 0x33333333/2^32 ≈ 0.2 — the same constants on both engines, so the
# sample is reproducible across engines AND partitionings.
_MIX_WEIGHTS_SQL = "CASE WHEN source LIKE 'src1%' THEN 'cccccccc' ELSE '33333333' END"


@register(
    "corpus_mix_weighted_sample",
    oracle=f"""
WITH marked AS (
  SELECT source,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h,
         {_MIX_WEIGHTS_SQL} AS cap
  FROM documents
)
SELECT source,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN h < cap THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM marked
GROUP BY source
ORDER BY source
""",
)
def corpus_mix_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus mixing: per-source keep-rates
    (80% for src1x sources, 20% for the rest) applied via md5-hex
    ordering on the stable doc key — the data-mixing step that hits a
    target training distribution.

    Unlike TABLESAMPLE/rand(), membership is a pure function of
    doc_id: reproducible across engines, partitionings, and reruns,
    and shard-local (no shuffle until the per-source count).  At
    100 TB the keep decision rides the scan; changing the mix is a
    constant edit, not a new pipeline."""
    d = table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    cap = F.when(F.col("source").like("src1%"), F.lit("cccccccc")).otherwise(
        F.lit("33333333")
    )
    return (
        d.select("source", h.alias("h"), cap.alias("cap"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("h") < F.col("cap"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )
