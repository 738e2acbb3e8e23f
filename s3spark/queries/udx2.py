"""Remaining UDx API coverage: Arrow-batch map (``mapInArrow``) and
Python user-defined table functions (Spark 4 ``@udtf``) — with the
built-in HOF/explode equivalents as oracles, per the engine rule that
Python is an extension point, never the default path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register


@register(
    "udf_arrow_map",
    oracle="""
SELECT l_orderkey,
       l_linenumber,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
FROM lineitem
WHERE l_orderkey < 1000
ORDER BY l_orderkey, l_linenumber
""",
)
def udf_arrow_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the lowest-overhead Python extension point —
    RecordBatches stream through the worker with zero pandas
    conversion, the right hatch for batch-level libraries that speak
    Arrow natively (tokenizers, image codecs, FFI).

    Here it computes the TPC-H charge expression so the oracle can
    verify the plumbing exactly; a real pipeline would do work Spark
    can't express.  Out-of-band extension cost: one fused Arrow stage,
    no shuffle added."""
    import pyarrow as pa
    import pyarrow.compute as pc

    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
    )

    def charge_batches(batches):
        for b in batches:
            charge = pc.round(
                pc.multiply(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                    ),
                    pc.add(pa.scalar(1.0), b.column("l_tax")),
                ),
                ndigits=6,
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), charge],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    out = li.mapInArrow(
        charge_batches, schema="l_orderkey long, l_linenumber int, charge double"
    )
    return out


@register(
    "udtf_python_custom",
    oracle="""
SELECT t.doc_id,
       t.w[i] AS word,
       CAST(i AS INTEGER) AS idx
FROM (SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE doc_id < 50) t,
     UNNEST(range(1, len(w) + 1)) AS u(i)
ORDER BY t.doc_id, idx
""",
)
def udtf_python_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``): one input row → many output
    rows from arbitrary Python — the lateral-join extension point for
    custom parsers/chunkers.  Tokenizes documents into (word, 1-based
    position) pairs; the DuckDB UNNEST WITH ORDINALITY oracle proves
    row-expansion semantics match the built-in path bit-for-bit."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, idx int")
    class Tokenize:
        def eval(self, text: str):
            if text:
                for i, w in enumerate(text.split(" ")):
                    yield (w, i + 1)

    spark.udtf.register("s3spark_tokenize", Tokenize)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.idx
        FROM docs_for_udtf d,
             LATERAL s3spark_tokenize(d.text) t
        """
    )
