"""File-operation query surface (SURVEY.md §2.3-A/B file-parity keys).

These expose the reference-parity layer (s3spark.fs / s3spark.naming)
as verifiable queries: listing as a DataFrame, unanchored-regex key
matching (R9), and the destination-name rewrite+enumeration projection
(R11/R12) — the same expressions the verbs use, applied to fixture
tables so a DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from s3spark import naming
from s3spark.io import table
from s3spark.registry import register


@register(
    "source_listing",
    oracle="""
SELECT regexp_extract(file, '([^/]+)$', 1) AS name
FROM glob('/root/testdata/sf0.01/*.parquet')
ORDER BY name
""",
)
def source_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-listing scan (R5-R8): distributed ``binaryFile`` listing of
    the fixture directory, pruned to metadata only (no bytes read).

    Oracle note: DuckDB's glob() can only see file paths, so the
    comparable projection is the file name; size/mtime correctness is
    covered by tests/test_fs.py against os.stat. The oracle glob is
    pinned to sf0.01 — the driver's t2 scale factor.
    """
    from s3spark.fs import list_files_distributed

    return (
        list_files_distributed(spark, sf_dir)
        .filter(F.col("name").endswith(".parquet"))
        .select("name")
        .orderBy("name")
    )


@register(
    "filter_rlike",
    oracle=r"""
SELECT doc_id, source
FROM documents
WHERE regexp_matches(source, '^src1\d$')
ORDER BY doc_id
""",
)
def filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unanchored regex key-match semantics (R9): ``rlike`` ==
    ``re.search`` == DuckDB ``regexp_matches`` (all substring-search)."""
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("source").rlike(r"^src1\d$"))
        .select("doc_id", "source")
    )


@register(
    "project_rename_enumerate",
    oracle="""
SELECT
  doc_id,
  CASE
    WHEN cnt > 1 THEN
      CASE
        WHEN strpos(name, '.') > 0 THEN
          substr(name, 1, strpos(name, '.') - 1)
          || '_' || n || '.' || substr(name, strpos(name, '.') + 1)
        ELSE name || '_' || n
      END
    ELSE name
  END AS dest_name
FROM (
  SELECT
    doc_id,
    'archive.tar.gz' AS name,
    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS n,
    COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM documents
)
ORDER BY doc_id
""",
)
def project_rename_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Destination-name rewrite + enumeration (R11/R12) as a distributed
    projection: ``_{n}`` inserted before the FIRST dot
    (``archive.tar.gz`` → ``archive_1.tar.gz``), enumerated only when
    the group has >1 file (divergence D4)."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    wc = Window.partitionBy("source")
    name = F.lit("archive.tar.gz")
    n = F.row_number().over(w)  # rendered into a string — width-safe
    cnt = F.count(F.lit(1)).over(wc)
    dest = F.when(
        cnt > 1, naming.col_enumerate_name(name, n)
    ).otherwise(name)
    return docs.select("doc_id", dest.alias("dest_name"))
