"""Round-4 scale operators: bloom-pruned shuffle join, two-pass exact
heavy hitters, Z-order layout clustering, unrolled PageRank, and the
Spark 4 native XML source.

Each key here is a production shape for the 100 TB tier:

- ``join_bloom_prune``: when the dim side is too big to broadcast as
  ROWS, its key *bloom filter* still fits in one broadcast — probe it
  map-side to drop fact rows BEFORE they enter the shuffle.  The final
  equi-join removes bloom false positives, so the result is exact and
  fully oracle-checkable; the bloom only changes how many bytes cross
  the wire.
- ``agg_heavy_hitters_twopass``: exact "keys with count > T" without a
  full-key shuffle: phase 1 counts hash BUCKETS (bounded cardinality →
  map-side partial agg collapses the shuffle to ≤B rows), phase 2 runs
  the exact per-key count only over rows whose bucket total exceeds T
  (a bucket's total bounds every member key's count from above, so
  pruning light buckets cannot lose a heavy key).
- ``sort_zorder_layout``: multi-dimensional clustering via Morton
  (Z-order) interleaving — the data-layout trick behind file-skipping
  on two correlated predicates: range-partitioning by z gives every
  output file a tight min/max envelope on BOTH key columns.
- ``graph_pagerank_unrolled``: iterative graph algorithms as pure
  dataflow — two unrolled damped-PageRank iterations over the
  part↔supplier bipartite graph, decimal-exact contribution sums so
  the ranking is engine-portable (same trick as ml_kmeans_lloyd).
- ``scan_xml``: Spark 4's built-in XML datasource (reader + writer),
  round-tripped with an explicit schema.

Reference parity: the reference's surface is file movement
(amazons3_blueprints/download_file.py, upload_file.py); these keys are
engine-surface extensions mandated by SURVEY.md §2.3/§6 (curation and
layout operators the reference's users run downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import dsum, scratch_dir, table
from s3spark.registry import register

# ---------------------------------------------------------------------------
# join_bloom_prune
# ---------------------------------------------------------------------------

_BLOOM_M = 32768  # bloom bits
_BLOOM_W = _BLOOM_M // 64  # 512 long words
_BLOOM_K = 3  # hash functions


def _bloom_positions(key: F.Column) -> list[F.Column]:
    """K bloom bit positions for a key: xxhash64 seeded by tuple arity."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(_BLOOM_M))
        for i in range(_BLOOM_K)
    ]


def bloom_prune(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Filter `fact` to rows whose key MIGHT be in `dim` (bloom
    semantics: no false negatives, ~0.1% false positives at these
    M/K for the fixture dim sizes).

    Builds a `_BLOOM_M`-bit bitmap of the dim keys as array<long>
    [`_BLOOM_W`] (bit_or over word/bit splits of K xxhash64 positions,
    then one collect-free single-row assembly), broadcasts that one
    constant row, and probes it with pure bitwise expressions — the
    probe runs map-side, BELOW whatever shuffle consumes the fact
    side, which is the entire point: at 100 TB the bytes that don't
    enter the exchange are the win.  Reusable for any join/semi-join
    whose dim side is broadcast-too-big but whose key bloom is not."""
    pos = dim.select(
        F.explode(F.array(*_bloom_positions(F.col(dim_key)))).alias("pos")
    )
    words = pos.groupBy((F.col("pos") / 64).cast("int").alias("w")).agg(
        F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            )
        ).alias("word")
    )
    bloom = words.agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("word")).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(_BLOOM_W - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("long")),
        ).alias("bloom")
    )
    probe_cond = None
    for p in _bloom_positions(F.col(fact_key)):
        w = (p / 64).cast("int")
        bit = (p % 64).cast("int")
        hit = (
            F.element_at(F.col("bloom"), w + F.lit(1)).bitwiseAND(
                F.call_function("shiftleft", F.lit(1).cast("long"), bit)
            )
            != 0
        )
        probe_cond = hit if probe_cond is None else (probe_cond & hit)
    return fact.join(F.broadcast(bloom)).filter(probe_cond).drop("bloom")


@register(
    "join_bloom_prune",
    oracle="""
SELECT p.p_brand,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand IN ('Brand#13', 'Brand#22')
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned shuffle join: revenue for two brands' parts.

    The dim side (filtered ``part``) is joined with an explicit
    ``shuffle_hash`` hint — the stand-in for "too big to broadcast as
    rows" at 100 TB.  What IS broadcast is a 4 KB hand-rolled bloom
    bitmap of the dim keys (array<long>[512] built with bit_or over
    word/bit splits of K=3 xxhash64 positions), cross-joined as a
    single constant row and probed map-side with pure bitwise
    expressions.  Fact rows failing the bloom never reach the join
    exchange; the equi-join then removes the bloom's false positives,
    so the result is byte-identical to the plain join (full oracle).
    At scale the bloom cuts shuffle bytes by ~the dim selectivity
    (here ~8%) for the cost of one 4 KB broadcast."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#13", "Brand#22")
    )
    li = table(spark, sf_dir, "lineitem")
    pruned = bloom_prune(
        li.select("l_partkey", "l_extendedprice", "l_discount"),
        "l_partkey",
        part,
        "p_partkey",
    )
    joined = pruned.join(
        part.hint("shuffle_hash"), pruned.l_partkey == part.p_partkey
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# agg_heavy_hitters_twopass
# ---------------------------------------------------------------------------

_HH_BUCKETS = 16384
_HH_T = 18


@register(
    "agg_heavy_hitters_twopass",
    oracle=f"""
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > {_HH_T}
ORDER BY o_custkey
""",
)
def agg_heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (customers with > {T} orders) in two passes.

    Pass 1 aggregates xxhash64-bucket counts (B=16384 buckets — the
    groupBy key space is BOUNDED, so map-side partial aggregation
    collapses the shuffle to at most B rows regardless of data size).
    A bucket's total is an upper bound for every key hashing into it,
    so buckets with total <= T provably contain no heavy key.  Pass 2
    broadcast-semi-joins the surviving bucket ids and runs the exact
    per-key count over that sliver only.  At 100 TB this turns "shuffle
    every key" into "shuffle B integers + the heavy tail" — the exact
    complement of a sketch: no false negatives by construction, false
    positives removed by the second exact pass."""
    o = table(spark, sf_dir, "orders").select("o_custkey")
    bucketed = o.withColumn(
        "b", F.pmod(F.xxhash64("o_custkey"), F.lit(_HH_BUCKETS))
    )
    heavy_buckets = (
        bucketed.groupBy("b").count().filter(F.col("count") > _HH_T).select("b")
    )
    return (
        bucketed.join(F.broadcast(heavy_buckets), "b")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > _HH_T)
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# sort_zorder_layout
# ---------------------------------------------------------------------------


def _spread_bits(x: F.Column) -> F.Column:
    """Interleave-ready 16->32 bit spread (Morton magic numbers).

    Constant shift amounts, so the plain F.shiftleft wrappers apply;
    every step stays a long-typed codegen'd bitwise expression."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def _sql_spread(c: str) -> str:
    """DuckDB twin of :func:`_spread_bits` (same staged magic numbers)."""
    s1 = f"(({c} & 65535) | (({c} & 65535) << 8)) & 16711935"
    s2 = f"(({s1}) | (({s1}) << 4)) & 252645135"
    s3 = f"(({s2}) | (({s2}) << 2)) & 858993459"
    s4 = f"(({s3}) | (({s3}) << 1)) & 1431655765"
    return s4


@register(
    "sort_zorder_layout",
    oracle=f"""
WITH z AS (
  SELECT ({_sql_spread('l_partkey % 65536')})
         | (({_sql_spread('l_suppkey % 65536')}) << 1) AS zval,
         l_partkey, l_suppkey
  FROM lineitem
)
SELECT zval >> 14 AS zbucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
       MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
FROM z
GROUP BY zbucket
ORDER BY zbucket
""",
)
def sort_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout clustering over (l_partkey, l_suppkey).

    Interleaves the low 16 bits of both keys with staged magic-number
    spreads (pure long bitwise ops, whole-stage codegen), then
    range-partitions + sorts by the z-value — the write-side layout
    that gives every output file a tight min/max envelope on BOTH
    columns, so a reader filtering on either key (or both) can skip
    most files on parquet footer stats alone.  The returned per-bucket
    min/max envelopes are exactly what the file skipper would consult;
    computing them per z-bucket makes the clustering effect (and the
    cross-engine bit math) oracle-checkable.  The bucket id is z >> 14
    — it pins bits >= 7 of BOTH keys, so every bucket's envelope is
    structurally <= 127 wide on each column (asserted in
    tests/test_scale4.py), at any scale factor."""
    li = table(spark, sf_dir, "lineitem")
    z = li.select(
        (
            _spread_bits(F.pmod(F.col("l_partkey"), F.lit(65536))).bitwiseOR(
                F.shiftleft(
                    _spread_bits(F.pmod(F.col("l_suppkey"), F.lit(65536))), 1
                )
            )
        ).alias("zval"),
        "l_partkey",
        "l_suppkey",
    )
    laid_out = z.repartitionByRange(16, "zval").sortWithinPartitions("zval")
    return (
        laid_out.groupBy(F.shiftright(F.col("zval"), 14).alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
        .orderBy("zbucket")
    )


# ---------------------------------------------------------------------------
# graph_pagerank_unrolled
# ---------------------------------------------------------------------------


@register(
    "graph_pagerank_unrolled",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
edges AS (
  SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
  UNION ALL
  SELECT l_suppkey * 2 + 1 AS src, l_partkey * 2 AS dst FROM pairs
),
deg AS (
  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
),
r1 AS (
  SELECT e.dst AS node,
         150000 + (85 * SUM(1000000 // d.outdeg)) // 100 AS rank_ppm
  FROM edges e JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r2 AS (
  SELECT e.dst AS node,
         150000 + (85 * SUM(r.rank_ppm // d.outdeg)) // 100 AS rank_ppm
  FROM edges e
  JOIN deg d ON e.src = d.src
  JOIN r1 r ON r.node = e.src
  GROUP BY e.dst
)
SELECT node, CAST(rank_ppm AS BIGINT) AS rank_ppm
FROM r2 ORDER BY rank_ppm DESC, node LIMIT 20
""",
)
def graph_pagerank_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped-PageRank iterations over the part↔supplier graph.

    Nodes are parts (key*2) and suppliers (key*2+1); edges are the
    distinct lineitem pairs in both directions, so every node has
    in/out degree >= 1 and no dangling-mass term is needed.  Each
    iteration is ONE shuffle on the edge src (join ranks) plus ONE on
    dst (sum contributions) — the canonical iterative-join PageRank
    that scales linearly in edges per iteration; unrolling two
    iterations keeps it pure declarative dataflow (same pattern as
    ml_kmeans_lloyd).

    Ranks are FIXED-POINT parts-per-million bigints (r0 = 1,000,000;
    contribution = rank div outdeg; damping = 85·sum div 100): every
    operation is integer arithmetic, so the result is bit-identical
    across engines, partitionings, and accumulation orders — float
    PageRank differs in the last decimal between engines because
    double→decimal rounding is implementation-defined (measured: a
    1e-6 flip vs DuckDB), and an ordering operator must not have
    engine-dependent output."""
    li = table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    # Both edge directions via one explode — a UNION of two projections
    # of `pairs` would scan + dedup lineitem TWICE (Spark plans don't
    # share subtrees); this keeps one scan and one distinct shuffle.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("l_partkey") * 2).alias("src"),
                    (F.col("l_suppkey") * 2 + 1).alias("dst"),
                ),
                F.struct(
                    (F.col("l_suppkey") * 2 + 1).alias("src"),
                    (F.col("l_partkey") * 2).alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Degree annotation is a WINDOW count over src, not groupBy+join
    # (round-12): the join form put the edge subtree on both sides, so
    # the scan + distinct ran twice inside the materialization job, and
    # it paid two shuffles (agg + join) where the window pays one.
    # Checkpoint the degree-annotated edge list: every later reference
    # to `ed` re-expands its whole lineage (Spark plans are trees, not
    # DAGs), so two unrolled iterations would scan + dedup lineitem
    # four times.  localCheckpoint (block manager, spills under
    # pressure) replaces the round-9 parquet scratch round-trip — the
    # raw input is read ONCE, and both iterations re-read only the
    # compact in-memory (src, dst, outdeg) table.
    from pyspark.sql import Window

    wdeg = Window.partitionBy("src")
    ed = edges.withColumn(
        "outdeg", F.count(F.lit(1)).over(wdeg)
    ).localCheckpoint()

    r1 = ed.groupBy("dst").agg(
        (
            F.lit(150000).cast("long")
            + F.expr("85 * sum(1000000L div outdeg) div 100")
        ).alias("rank_ppm")
    ).withColumnRenamed("dst", "node")

    r2 = (
        ed.join(r1, ed.src == r1.node)
        .groupBy("dst")
        .agg(
            (
                F.lit(150000).cast("long")
                + F.expr("85 * sum(rank_ppm div outdeg) div 100")
            ).alias("rank_ppm")
        )
        .withColumnRenamed("dst", "node")
    )
    return r2.orderBy(F.desc("rank_ppm"), "node").limit(20)


# ---------------------------------------------------------------------------
# scan_xml
# ---------------------------------------------------------------------------


@register(
    "scan_xml",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
ORDER BY doc_id
LIMIT 200
""",
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native XML datasource round-trip (writer + reader).

    Materializes the first 200 document metadata rows as XML with the
    built-in writer, reads them back with an EXPLICIT schema (schema
    inference over XML is a full extra pass at scale — never rely on
    it for 100 TB inputs), and returns the parsed rows.  The fixture's
    lang/source values are XML-safe by construction; the writer
    escapes anything that isn't."""
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
        .limit(200)
    )
    out = scratch_dir("xml") + "/docs_xml"
    (
        docs.coalesce(1)
        .write.format("xml")
        .option("rowTag", "doc")
        .mode("overwrite")
        .save(out)
    )
    return (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id bigint, lang string, source string, n_chars bigint")
        .load(out)
    )
