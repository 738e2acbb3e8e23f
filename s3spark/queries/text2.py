"""Corpus-statistics text operators: unigram language-model scoring
and TF-IDF term weighting — the two-pass (corpus stats → per-doc
score) shapes at the heart of data-quality filtering for LLM corpora.

Both are pure SQL/DataFrame compositions (explode → aggregate →
broadcast join back), so they carry full DuckDB oracles and scale the
obvious way: the corpus-stats side is a small aggregate that
broadcasts; the per-doc side shuffles once on the token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "text_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
freq AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
tot AS (SELECT SUM(c) AS t FROM freq)
SELECT
  tok.doc_id,
  COUNT(*) AS n_tokens,
  round(CAST(SUM(CAST(ln(freq.c / tot.t) AS DECIMAL(25,6))) AS DOUBLE)
        / COUNT(*), 6) AS avg_logprob
FROM tok JOIN freq USING (word) CROSS JOIN tot
GROUP BY tok.doc_id
ORDER BY tok.doc_id
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model score per document: mean log-probability
    of its tokens under the corpus unigram distribution — the cheapest
    perplexity proxy used to rank/filter training documents.  The
    frequency table is tiny (vocabulary-sized) and broadcast; documents
    with rare-token soup score low, stereotypical ones score high.
    Per-token log-probs sum through decimal(25,6) partials before the
    divide (round-4 ADVICE): the mean is then summation-order-free on
    both engines instead of leaning on end-rounding."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    scored = (
        tok.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("c") / F.col("t")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(F.col("lp").cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


@register(
    "pipeline_corpus_clean",
    oracle="""
WITH scored AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
filtered AS (
  SELECT * FROM scored WHERE lang = 'en' AND n_tokens BETWEEN 20 AND 500
),
deduped AS (
  SELECT text, MIN(doc_id) AS keeper, MIN(n_tokens) AS n_tokens
  FROM filtered GROUP BY text
)
SELECT COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(keeper) AS BIGINT) AS first_keeper,
       CAST(MAX(keeper) AS BIGINT) AS last_keeper
FROM deduped
""",
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite corpus-cleaning pipeline in one declarative plan:
    language filter → length filter → exact dedup (min-doc_id keeper)
    → corpus statistics.  Each stage is a registered operator on its
    own; chained here so Catalyst fuses the filters into the scan and
    the whole pipeline is one job — the shape a 100 TB pre-training
    cleanup run actually executes."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    filtered = d.select("doc_id", "text", "lang", n_tokens.alias("n_tokens")).filter(
        (F.col("lang") == "en") & F.col("n_tokens").between(20, 500)
    )
    deduped = filtered.groupBy("text").agg(
        F.min("doc_id").alias("keeper"), F.min("n_tokens").alias("n_tokens")
    )
    return deduped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("keeper").alias("first_keeper"),
        F.max("keeper").alias("last_keeper"),
    )


@register(
    "text_tfidf_topterms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
weighted AS (
  SELECT tf.doc_id, tf.word,
         tf.tf * ln(n.n_docs * 1.0 / df.df) AS w
  FROM tf JOIN df USING (word) CROSS JOIN n
)
SELECT doc_id, word, round(w, 6) AS tfidf, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY w DESC, word) AS rk
  FROM weighted
)
WHERE rk <= 3 AND doc_id < 200
ORDER BY doc_id, rk
""",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document — the classic keyword/topic
    signal.  TF is a per-doc aggregate, DF a corpus aggregate
    (broadcast back), the product ranked per doc with an alphabetical
    tie-break so the row set is deterministic."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    weighted = tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("w"),
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("word"))
    )
    return (
        weighted.withColumn("rk", rk.cast("long"))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 200))
        .select("doc_id", "word", F.round("w", 6).alias("tfidf"), "rk")
    )
