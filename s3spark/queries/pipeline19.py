"""Round-9 extension batch: record linkage, classical ML primitives,
computational geometry, and two ingestion sources.

- ``join_phonetic_soundex``: phonetic record linkage — a hand-rolled,
  cross-engine-portable US-census Soundex (pinned EQUAL to Spark's
  native ``soundex()`` in tests) blocks two name populations into code
  buckets and equi-joins the buckets, the classical blocking strategy
  for entity resolution at scale.
- ``ml_decision_stump``: exact best binary split by weighted Gini
  impurity over bounded candidate thresholds — the inner loop of
  tree/GBDT training, expressed as one fact reduction + a window over
  the bounded candidate table.
- ``scalar_point_in_polygon``: even-odd ray casting with EXACT integer
  cross products against a literal polygon — geofencing as a pure
  map-side projection.
- ``ml_naive_bayes_text``: multinomial naive-bayes language ID with
  Laplace smoothing; log-probabilities lift through decimal(25,6)
  partials (the entropy/bigram-logprob recipe) so scores sum exactly
  and the per-doc argmax is engine-deterministic.
- ``scan_fixed_width``: fixed-width text layout (mainframe/COBOL-era
  exports still common in enterprise lakes) — format, write, re-scan,
  parse by column offsets, prove the round-trip.
- ``scan_binary_files``: Spark's ``binaryFile`` datasource — THE
  ingestion path for image/audio corpora (one opaque blob per file) —
  over a generated file tree, with content integrity proven by md5.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational/ML surface; these extend SURVEY.md §2.3 sections
C/H/I and the LLM-pipeline mandate (phonetic blocking and NB quality
scoring are standard corpus-curation tools).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import scratch_dir, table
from s3spark.registry import register

# --------------------------------------------------------------------------
# join_phonetic_soundex
# --------------------------------------------------------------------------


def _soundex_sql(col: str) -> str:
    """Portable US-census Soundex over an UPPERCASE-LETTERS-ONLY input,
    as ONE shared SQL expression (identical text on both engines).

    Algorithm: keep the first letter; drop H/W from position 2+ (they
    do NOT separate same-code consonants); map letters to digit codes
    (vowels+Y→0); collapse adjacent identical nonzero digits with
    replace-shrink passes (DuckDB's RE2 regex has no backreferences, so
    ``regexp_replace('(\\d)\\1+','\\1')`` would not port — three
    passes of ``replace(x,'dd','d')`` per digit collapse runs up to
    length 8, and inputs here are 7 letters); drop the first digit
    (the first letter's own code — a same-code second letter merges
    into it), remove the 0 separators, pad to letter + 3 digits.
    Pinned equal to Spark's native ``soundex()`` on three synthetic
    alphabets (incl. H/W-saturated names) in tests/test_pipeline19.py.
    """
    first = f"substr({col},1,1)"
    rest = f"replace(replace(substr({col},2),'H',''),'W','')"
    x = (
        f"translate({first} || {rest}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',"
        f" '01230120022455012623010202')"
    )
    for _ in range(3):
        for d in "123456":
            x = f"replace({x},'{d * 2}','{d}')"
    tail = f"replace(substr({x},2),'0','')"
    return f"({first} || substr({tail} || '000', 1, 3))"


# Deterministic 7-letter pseudo-names from md5 nibbles (the fixture's
# own c_name/s_name are templated 'Customer#NNN' strings with no
# phonetic variety; the spatial-grid recipe — synthesize from md5 so
# both engines hash the same VARCHAR bytes — gives a diverse, portable
# name population).  The supplier stream salts its key (+1000000) so
# the two populations are hash-independent.
_SDX_NAME_C = (
    "translate(substr(md5(CAST(c_custkey AS {STR})),1,7),"
    "'0123456789abcdef','ABCDEFGHIJKLMNOP')"
)
_SDX_NAME_S = (
    "translate(substr(md5(CAST(s_suppkey + 1000000 AS {STR})),1,7),"
    "'0123456789abcdef','ABCDEFGHIJKLMNOP')"
)


def _sdx_query(cust: str, supp: str, str_t: str) -> str:
    nc = _SDX_NAME_C.format(STR=str_t)
    ns = _SDX_NAME_S.format(STR=str_t)
    return f"""
WITH c AS (
  SELECT c_custkey, {nc} AS c_name2, {_soundex_sql(nc)} AS code
  FROM {cust}
),
s AS (
  SELECT s_suppkey, {ns} AS s_name2, {_soundex_sql(ns)} AS code
  FROM {supp}
)
SELECT c.c_custkey, s.s_suppkey, c.code,
       c.c_name2 AS cust_name, s.s_name2 AS supp_name
FROM c JOIN s ON c.code = s.code
WHERE c.c_name2 <> s.s_name2
"""


_SDX_ORACLE = _sdx_query("customer", "supplier", "VARCHAR")


@register("join_phonetic_soundex", oracle=_SDX_ORACLE)
def join_phonetic_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic record linkage: block both name populations by a
    portable Soundex code and equi-join the blocks — candidate pairs
    for fuzzy entity resolution without an O(n·m) name-distance pass.

    Engine shape: the code is a pure row-local projection (translate/
    replace chains, whole-stage codegen — no UDF), so blocking costs
    one hash shuffle on the 4-char code.  At 100 TB the code space is
    bounded (≤26·7³ codes), so block occupancy grows linearly with
    input and a hot code salts exactly like any skewed join key; the
    downstream verify step (edit distance on candidates only) is the
    standard linkage pipeline (join_fuzzy_edit_distance).  The
    hand-rolled expression is pinned equal to Spark's native
    ``soundex()`` — used instead of the builtin because DuckDB has no
    soundex and the oracle must compute the identical code."""
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "p19_sdx_customer"
    )
    table(spark, sf_dir, "supplier").createOrReplaceTempView(
        "p19_sdx_supplier"
    )
    return spark.sql(
        _sdx_query("p19_sdx_customer", "p19_sdx_supplier", "STRING")
    )


# --------------------------------------------------------------------------
# ml_decision_stump
# --------------------------------------------------------------------------

# Weighted Gini of a split, all counts exact BIGINT; the float tail is
# ONE shared expression text (casts + IEEE divisions), so both engines
# produce bit-identical doubles and the argmin ordering cannot diverge.
_STUMP_GINI = (
    "CAST((CAST(nl AS DOUBLE)"
    " - (CAST(pl*pl + (nl-pl)*(nl-pl) AS DOUBLE))/CAST(nl AS DOUBLE)"
    " + CAST(nr AS DOUBLE)"
    " - (CAST(pr*pr + (nr-pr)*(nr-pr) AS DOUBLE))/CAST(nr AS DOUBLE))"
    " / CAST(nl+nr AS DOUBLE) AS DOUBLE)"
)

_STUMP_QUERY = """
WITH base AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM {T}
),
cells AS (
  SELECT CAST(pc {IDIV} 100000 AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM base GROUP BY 1
),
cum AS (
  SELECT b,
         CAST(SUM(n)   OVER (ORDER BY b) AS BIGINT) AS nl,
         CAST(SUM(pos) OVER (ORDER BY b) AS BIGINT) AS pl,
         CAST(SUM(n)   OVER () AS BIGINT) AS ntot,
         CAST(SUM(pos) OVER () AS BIGINT) AS ptot
  FROM cells
),
cand AS (
  SELECT b, nl, pl, ntot - nl AS nr, ptot - pl AS pr, ntot, ptot
  FROM cum WHERE ntot - nl > 0
)
SELECT CAST((b+1) * 1000 AS BIGINT) AS threshold_dollars,
       nl AS n_left, pl AS pos_left, nr AS n_right, pr AS pos_right,
       {G} AS gini_split,
       CAST((CAST(ntot AS DOUBLE)
             - (CAST(ptot*ptot + (ntot-ptot)*(ntot-ptot) AS DOUBLE))
               / CAST(ntot AS DOUBLE))
            / CAST(ntot AS DOUBLE) AS DOUBLE) AS gini_root
FROM cand
ORDER BY gini_split ASC, threshold_dollars ASC
LIMIT 1
"""

_STUMP_ORACLE = _STUMP_QUERY.replace("{G}", _STUMP_GINI).replace(
    "{IDIV}", "//"
).format(T="orders")


@register("ml_decision_stump", oracle=_STUMP_ORACLE)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best binary split of a numeric feature by weighted Gini impurity
    — the inner loop of decision-tree / GBDT training, run once: label
    = is-high-priority, feature = order total, candidate thresholds =
    $1000 bucket boundaries (value-bounded: ≤500 candidates at any SF).

    Exactness: class counts per bucket are exact integers from ONE
    map-side-combined fact reduction; cumulative left/right counts are
    window prefix sums over the BOUNDED candidate table (the
    unpartitioned window sorts ≤500 rows, the NB-row precedent); the
    Gini float tail is one shared expression over those integers, so
    both engines compute bit-identical doubles and argmin-by-(gini,
    threshold) selects the same candidate.  ``pc div/// 100000`` is
    the one engine-specific spelling (integral division).

    Fixture note: the generator draws priority independent of price
    (SURVEY fixture audit), so the best gain here is ~0.0004 — the
    SELECTION mechanics are the content; a planted price-dependent
    label in tests/test_differential_random.py proves the stump finds
    a true split exactly.  At 100 TB: one shuffle to ≤500 cells, then
    driver-scale work — the classic histogram-split strategy
    (XGBoost/LightGBM approx mode) rather than a per-row sort."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "p19_stump_orders"
    )
    return spark.sql(
        _STUMP_QUERY.replace("{G}", _STUMP_GINI)
        .replace("{IDIV}", "div")
        .format(T="p19_stump_orders")
    )


# --------------------------------------------------------------------------
# scalar_point_in_polygon
# --------------------------------------------------------------------------

# Literal geofence: a convex-ish hexagon in the [0, 65536)^2 md5
# coordinate space (same synthetic-coordinate recipe as
# join_spatial_grid).  Vertices are exact integers.
_PIP_VERTS = (
    (32768, 4000),
    (58000, 20000),
    (55000, 50000),
    (30000, 62000),
    (8000, 45000),
    (6000, 15000),
)


def _pip_inside_sql(px: str, py: str) -> str:
    """Even-odd ray casting, EXACT integer arithmetic: for each edge,
    a half-open y-interval test plus a strict side test via the cross
    product (x2-x1)(py-y1) - (px-x1)(y2-y1) — products ≤ 2^17·2^17 fit
    BIGINT with 2^29 to spare.  The upward/downward asymmetry (>= vs <
    on y, > vs < on the cross sign) is the standard vertex-safe
    crossing rule; both engines evaluate the identical expression, so
    edge-incident points (cross = 0, not counted) agree too."""
    terms = []
    n = len(_PIP_VERTS)
    for i in range(n):
        x1, y1 = _PIP_VERTS[i]
        x2, y2 = _PIP_VERTS[(i + 1) % n]
        cross = (
            f"(CAST({x2 - x1} AS BIGINT)*({py}-{y1})"
            f" - ({px}-{x1})*CAST({y2 - y1} AS BIGINT))"
        )
        if y1 < y2:
            terms.append(
                f"CASE WHEN {py} >= {y1} AND {py} < {y2}"
                f" AND {cross} > 0 THEN 1 ELSE 0 END"
            )
        elif y1 > y2:
            terms.append(
                f"CASE WHEN {py} >= {y2} AND {py} < {y1}"
                f" AND {cross} < 0 THEN 1 ELSE 0 END"
            )
    return "(" + " + ".join(terms) + ") % 2"


_PIP_QUERY = """
WITH pts AS (
  SELECT c_custkey,
         CAST({HX} AS BIGINT) AS px,
         CAST({HY} AS BIGINT) AS py
  FROM {T}
)
SELECT c_custkey, px, py, CAST({INSIDE} AS BIGINT) AS inside
FROM pts
"""

_PIP_ORACLE = _PIP_QUERY.format(
    HX="CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),1,4) AS BIGINT)",
    HY="CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),5,4) AS BIGINT)",
    T="customer",
    INSIDE=_pip_inside_sql("px", "py"),
)


@register("scalar_point_in_polygon", oracle=_PIP_ORACLE)
def scalar_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofencing: even-odd point-in-polygon against a literal hexagon,
    with EXACT integer ray-casting (no float ever enters — the cross
    products are BIGINT).  Coordinates are md5-nibble rationals in
    [0, 65536)^2, the join_spatial_grid recipe, so both engines derive
    identical points from the fixture.

    Engine shape: a pure row-local projection — zero shuffles, zero
    joins; at 100 TB this is a map-only scan that fuses into whatever
    plan consumes it (the 6 unrolled edge tests are whole-stage
    codegen'd comparisons).  A k-vertex fence unrolls k terms; beyond
    ~100 vertices the edge table would broadcast-join instead.
    Verified against a plain-python ray caster on every fixture row
    (tests/test_pipeline19.py)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView(
        "p19_pip_customer"
    )
    return spark.sql(
        _PIP_QUERY.format(
            HX="conv(substr(md5(CAST(c_custkey AS STRING)),1,4),16,10)",
            HY="conv(substr(md5(CAST(c_custkey AS STRING)),5,4),16,10)",
            T="p19_pip_customer",
            INSIDE=_pip_inside_sql("px", "py"),
        )
    )


# --------------------------------------------------------------------------
# ml_naive_bayes_text
# --------------------------------------------------------------------------

_NB_QUERY = """
WITH tok AS (
  SELECT doc_id, lang, t AS token FROM {TOKSRC}
),
model AS (
  SELECT lang AS c, token, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
),
ctot AS (
  SELECT c, CAST(SUM(cnt) AS BIGINT) AS tot FROM model GROUP BY 1
),
vocab AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM tok),
prior AS (
  SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS ndocs,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nall
  FROM {DOCS} GROUP BY 1
),
doc_tok AS (
  SELECT doc_id, lang AS true_lang, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2, 3
),
scored AS (
  SELECT d.doc_id, d.true_lang, cl.c,
         CAST(SUM(d.tf * CAST(LN(CAST(COALESCE(m.cnt, 0) + 1 AS DOUBLE))
                          AS DECIMAL(25,6))) AS DECIMAL(38,6)) AS s_tok,
         CAST(SUM(d.tf) AS BIGINT) AS ntok
  FROM doc_tok d
  CROSS JOIN (SELECT c FROM ctot) cl
  LEFT JOIN model m ON d.token = m.token AND m.c = cl.c
  GROUP BY 1, 2, 3
),
full_score AS (
  SELECT s.doc_id, s.true_lang, s.c,
         CAST(s.s_tok
              - s.ntok * CAST(LN(CAST(ct.tot + vb.v AS DOUBLE))
                          AS DECIMAL(25,6))
              + CAST(LN(CAST(p.ndocs AS DOUBLE)) AS DECIMAL(25,6))
              - CAST(LN(CAST(p.nall AS DOUBLE)) AS DECIMAL(25,6))
         AS DECIMAL(38,6)) AS score
  FROM scored s
  JOIN ctot ct ON s.c = ct.c
  JOIN prior p ON s.c = p.c
  CROSS JOIN vocab vb
),
pred AS (
  SELECT doc_id, true_lang, c AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, c ASC) AS rk
  FROM full_score
)
SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM pred WHERE rk = 1
GROUP BY 1, 2
"""

_NB_ORACLE = _NB_QUERY.format(
    TOKSRC=(
        "(SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS t"
        " FROM documents) x"
    ),
    DOCS="documents",
)


@register("ml_naive_bayes_text", oracle=_NB_ORACLE)
def ml_naive_bayes_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-bayes language ID with Laplace smoothing,
    trained and scored on the corpus in one plan; output is the
    bounded |classes|² confusion matrix.

    Exactness: score(c, d) = ln P(c) + Σ_tok tf·ln(cnt+1) −
    n_tok·ln(tot_c + V); every ln is over an EXACT integer and lifts
    through decimal(25,6) before any sum/multiply (the entropy /
    bigram-logprob recipe), so per-doc scores are exact decimals and
    the argmax (ties → lexicographic class) is engine-deterministic.
    The MODEL stays sparse (observed (class, token) rows only — no
    dense class×vocab materialization); scoring cross-joins each doc
    token with the bounded class list and LEFT-joins the model, so
    unseen pairs contribute ln(0+1) = 0 via COALESCE and a class
    sharing ZERO tokens with a doc still competes in the argmax with
    its true score ln P(c) − n_tok·ln(tot_c + V) (round-9 advice: an
    inner join silently excluded disjoint classes — unreachable on
    this shared-vocabulary fixture, wrong in general).

    Engine shape: the model is vocabulary-bounded (this fixture: ~31
    tokens × 5 classes) → broadcast; scoring is one fact-side explode
    × |classes| fan-out + broadcast left join + per-(doc, class)
    partial aggregation; the per-doc argmax window partitions by
    doc_id (fact-parallel).  |classes| is a small constant (5 here,
    ≤ a few hundred for any real label set), so the fan-out scales
    linearly with the corpus.  At
    100 TB with a real vocabulary the model is still ≪ corpus (V ~
    10⁶ rows) and stays broadcast-able; accuracy here (47% vs 43.6%
    majority baseline) is weak BY FIXTURE CONSTRUCTION — all langs
    share one template vocabulary (see text_langid_char_ngram, which
    is the stronger signal on this corpus); the operator mechanics
    are the content."""
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "p19_nb_documents"
    )
    return spark.sql(
        _NB_QUERY.format(
            TOKSRC=(
                "(SELECT doc_id, lang, explode(split(text, ' ')) AS t"
                " FROM p19_nb_documents) x"
            ),
            DOCS="p19_nb_documents",
        )
    )


# --------------------------------------------------------------------------
# scan_fixed_width
# --------------------------------------------------------------------------

# Layout: orderkey 12 | status 1 | price-cents 12 | date yyyyMMdd 8 |
# priority 15 (rpad) = 48-char records.
_FW_ORACLE = """
WITH src AS (
  SELECT o_orderkey,
         o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d,
         o_orderpriority AS prio
  FROM orders
)
SELECT prio AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(MIN(d) AS TIMESTAMP) AS min_date,
       CAST(MAX(d) AS TIMESTAMP) AS max_date,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
FROM src GROUP BY 1
"""


@register("scan_fixed_width", oracle=_FW_ORACLE)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width text ingest: orders serialized to 48-char records
    (lpad'd key and price-cents, yyyyMMdd date, rpad'd priority — the
    mainframe/COBOL export layout still common in enterprise lakes),
    re-scanned with ``spark.read.text`` and parsed by COLUMN OFFSETS
    (substr + casts, no delimiter logic at all).  The per-priority
    aggregate proves every field round-trips exactly, and the oracle
    predicts it from the SOURCE table — the file is never visible to
    DuckDB.

    Engine shape: fixed-width lines split at newlines like any text
    format, so the scan fans out by block at 100 TB; parsing is
    row-local substr/cast projections inside whole-stage codegen (no
    UDF, no regex).  Price travels as integer CENTS (decimal-exact
    both ways); the date column round-trips through yyyyMMdd, cast to
    TIMESTAMP on both engines (DuckDB fetchdf widens DATE — the known
    gotcha)."""
    src = table(spark, sf_dir, "orders").select(
        F.concat(
            F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
            F.col("o_orderstatus"),
            F.lpad(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .cast("string"),
                12,
                "0",
            ),
            F.date_format("o_orderdate", "yyyyMMdd"),
            F.rpad("o_orderpriority", 15, " "),
        ).alias("value")
    )
    out = scratch_dir("fixed_width")
    src.write.mode("overwrite").text(out)
    lines = spark.read.text(out)
    parsed = lines.select(
        F.substring("value", 1, 12).cast("bigint").alias("o_orderkey"),
        F.substring("value", 13, 1).alias("o_orderstatus"),
        F.substring("value", 14, 12).cast("bigint").alias("cents"),
        F.to_date(F.substring("value", 26, 8), "yyyyMMdd")
        .cast("timestamp")
        .alias("d"),
        F.trim(F.substring("value", 34, 15)).alias("prio"),
    )
    return parsed.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("o_orderkey").cast("bigint").alias("sum_key"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
        F.min("d").alias("min_date"),
        F.max("d").alias("max_date"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("n_status"),
    )


# --------------------------------------------------------------------------
# scan_binary_files
# --------------------------------------------------------------------------

_BF_ORACLE = """
SELECT doc_id,
       CAST(32 * (n_chars % 5 + 1) AS BIGINT) AS length,
       md5(repeat(md5(CAST(doc_id AS VARCHAR)), n_chars % 5 + 1))
         AS content_md5
FROM documents
WHERE doc_id < 200
"""


@register("scan_binary_files", oracle=_BF_ORACLE)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-corpus ingestion via Spark's ``binaryFile`` datasource —
    the path a 100 TB image/audio lake actually takes (one opaque blob
    per object, schema path/length/content), here over a generated
    200-file tree with deterministic ASCII payloads so the oracle can
    predict byte length and md5 from the documents table alone.

    Engine shape: binaryFile lists the tree once on the driver
    (bounded manifest — the same capacity argument as
    scan_file_metadata) and reads file contents in DISTRIBUTED tasks;
    the md5/regexp projections are row-local.  Small-file pressure is
    real at scale: millions of tiny objects want consolidation
    (compact_small_files) or a manifest-table design
    (scan_manifest_prune) — this key is the raw-ingest building block
    those keys consolidate.  Fixture generation is driver-side ONLY
    because it constructs the test tree (precedent: pipeline4's
    bounded file manifests), never part of the measured operator."""
    import hashlib
    import os

    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "n_chars")
        .collect()
    )
    out = scratch_dir("binary_files")
    for row in docs:
        payload = hashlib.md5(str(row.doc_id).encode()).hexdigest() * (
            row.n_chars % 5 + 1
        )
        with open(os.path.join(out, f"blob_{row.doc_id:06d}.bin"), "wb") as fh:
            fh.write(payload.encode("ascii"))
    back = spark.read.format("binaryFile").load(out)
    return back.select(
        F.regexp_extract(
            F.col("path"), r"blob_(\d+)\.bin$", 1
        )
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").cast("bigint").alias("length"),
        F.md5("content").alias("content_md5"),
    )
