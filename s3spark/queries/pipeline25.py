"""Round-11 extension batch two: embedding-truncation evaluation and
variance-optimal corpus sampling — the remaining embedding-ops and
survey-sampling classics of a training-data pipeline.

- ``sim_matryoshka_recall_eval``: exact top-5 retrieval quality when
  embeddings are truncated to their first k dims (k = 8/16/32/64,
  the Matryoshka-representation deployment question: how many dims
  can storage drop before recall degrades?).
- ``sample_stratified_neyman``: Neyman (variance-optimal) stratified
  allocation n_h ∝ N_h·σ_h from exact decimal moments, realized by a
  deterministic per-stratum hash take — the sampling design a corpus
  measurement pass uses when strata differ in spread.

Reference scope: the reference (amazons3_blueprints, SURVEY.md §2.2)
has no relational surface; extends SURVEY.md §2.3 sections G/J.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from s3spark.io import table
from s3spark.registry import register

# --------------------------------------------------------------------------
# sim_matryoshka_recall_eval
# --------------------------------------------------------------------------

_MAT_KS = (8, 16, 32, 64)
_MAT_DIM = 64
_MAT_QUERIES = 5
_MAT_TOPK = 5


def _mat_sql(el) -> str:
    """Shared SQL text (the _pq_prefix_sql convention: both engines,
    differing only in the element accessor): per truncation length k,
    exact squared-L2 over the FIRST k dims as an explicit
    left-associated term sum (bitwise-identical doubles both
    engines), top-5 per query with vec_id tie-break, then overlap
    counts against the full-64 anchor ranking."""
    els = ", ".join(
        f"CAST({el(i + 1)} AS DOUBLE) AS e{i + 1}" for i in range(_MAT_DIM)
    )
    blocks, unions = [], []
    for k in _MAT_KS:
        terms = " + ".join(
            f"(qv.e{i + 1} - xv.e{i + 1}) * (qv.e{i + 1} - xv.e{i + 1})"
            for i in range(k)
        )
        blocks.append(
            f"""r{k} AS (
  SELECT query_id, vec_id FROM (
    SELECT qv.vec_id AS query_id, xv.vec_id,
           ROW_NUMBER() OVER (PARTITION BY qv.vec_id
                              ORDER BY ({terms}), xv.vec_id) AS rn
    FROM q qv CROSS JOIN v xv WHERE xv.vec_id <> qv.vec_id
  ) t WHERE rn <= {_MAT_TOPK}
)"""
        )
        unions.append(
            f"""SELECT CAST({k} AS BIGINT) AS k, a.query_id,
       CAST(SUM(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_overlap
FROM r{k} a LEFT JOIN r{_MAT_DIM} b
  ON b.query_id = a.query_id AND b.vec_id = a.vec_id
GROUP BY a.query_id"""
        )
    return f"""
WITH v AS (SELECT vec_id, {els} FROM embeddings),
q AS (SELECT * FROM v WHERE vec_id < {_MAT_QUERIES}),
{", ".join(blocks)}
SELECT k, query_id, n_overlap,
       ROUND(CAST(n_overlap AS DOUBLE) / {_MAT_TOPK}, 6) AS recall
FROM ({" UNION ALL ".join(unions)}) u
ORDER BY k, query_id
"""


@register(
    "sim_matryoshka_recall_eval",
    oracle=_mat_sql(lambda i: f"embedding[{i}]"),
)
def sim_matryoshka_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation evaluation: EXACT top-5 retrieval under
    prefix-truncated embeddings (first 8/16/32/64 dims) scored
    against the full-dimension exact ranking — the measurement that
    decides how many dims a 100 TB embedding store can drop (64 -> 16
    dims is a 4x storage/bandwidth cut) before retrieval quality
    pays.  The k=64 rows are the anchor (recall 1 by construction —
    pinned in tests as a self-check of the overlap join).

    Engine shape (100 TB): each k-block is the exact-search primitive
    — 5-row query side broadcast against the vector scan (declared
    BNLJ, the sim_cosine_topk pattern), distances fused into
    whole-stage codegen, per-query top-k windows (Q-way parallel);
    the overlap joins run on <=25-row ranked outputs.  Truncation is
    free at scan time (column pruning cannot drop array elements, but
    a production store materializes the k-prefix as its own column —
    this key measures WHETHER to).

    FULL value oracle, bitwise-portable: explicit left-associated
    term sums shared with DuckDB modulo the element accessor."""
    table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "p25_mat_embeddings"
    )
    sql = _mat_sql(lambda i: f"element_at(embedding, {i})").replace(
        "FROM embeddings", "FROM p25_mat_embeddings"
    )
    return spark.sql(sql)


# --------------------------------------------------------------------------
# sample_stratified_neyman
# --------------------------------------------------------------------------

_NEY_TOTAL = 500


def _ney_sql(orders: str, str_t: str) -> str:
    """Shared SQL text modulo the table name and the string type
    keyword (Spark STRING / DuckDB VARCHAR).  Per-stratum moments are
    exact decimal(38,0) cent sums (the stats_anova_oneway recipe);
    sigma and the allocation arithmetic are one shared float text."""
    return f"""
WITH x AS (
  SELECT o_orderpriority AS stratum,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         md5(CAST(o_orderkey AS {str_t})) AS hk,
         o_orderkey
  FROM {orders}
),
m AS (
  SELECT stratum, CAST(COUNT(*) AS BIGINT) AS nh,
         CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sh,
         CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS qh
  FROM x GROUP BY stratum
),
sd AS (
  -- sigma from the EXACT integer variance numerator nh*qh - sh*sh
  -- (population variance = num / nh^2, so sigma = sqrt(num)/nh):
  -- ONE decimal->double rounding + IEEE-exact sqrt + one division.
  -- The mean-subtraction form ((qh - sh*(sh/nh))/nh) cancels ~3
  -- leading digits through four dependent roundings and measurably
  -- diverged between engines in the last ulps at sf0.1.
  SELECT stratum, nh,
         CASE WHEN nh <= 0
                   OR CAST(nh AS DECIMAL(38,0)) * qh - sh * sh <= 0
              THEN 0.0
              ELSE sqrt(CAST(CAST(nh AS DECIMAL(38,0)) * qh - sh * sh
                             AS DOUBLE)) / nh END AS sigma
  FROM m
),
-- order-free denominator: per-stratum weights quantize to
-- DECIMAL(38,6) so the 5-way SUM is exact decimal addition
-- (associative) instead of an order-dependent float fold
tot AS (SELECT CAST(SUM(CAST(nh * sigma AS DECIMAL(38,6)))
               AS DOUBLE) AS denom FROM sd),
alloc AS (
  SELECT stratum, nh, sigma,
         CAST(CASE WHEN denom <= 0.0 THEN 0
                   ELSE floor({_NEY_TOTAL}.0 * (nh * sigma) / denom) END
              AS BIGINT) AS n_alloc
  FROM sd CROSS JOIN tot
),
ranked AS (
  SELECT stratum, v,
         ROW_NUMBER() OVER (PARTITION BY stratum
                            ORDER BY hk, o_orderkey) AS rn
  FROM x
),
taken AS (
  SELECT r.stratum, CAST(COUNT(*) AS BIGINT) AS n_taken,
         CAST(SUM(CAST(r.v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv
  FROM ranked r JOIN alloc a
    ON a.stratum = r.stratum AND r.rn <= a.n_alloc
  GROUP BY r.stratum
)
SELECT a.stratum, a.nh AS n_pop, ROUND(a.sigma, 6) AS sigma_cents,
       a.n_alloc,
       CAST(COALESCE(t.n_taken, 0) AS BIGINT) AS n_taken,
       ROUND(CASE WHEN COALESCE(t.n_taken, 0) = 0 THEN NULL
                  ELSE CAST(t.sv AS DOUBLE) / t.n_taken / 100.0 END,
             6) AS sample_mean,
       ROUND((CAST(a.sigma AS DOUBLE) / 100.0)
             * (CAST(a.sigma AS DOUBLE) / 100.0)
             * (CAST(a.nh AS DOUBLE) / {_NEY_TOTAL}.0), 6)
         AS variance_share
FROM alloc a LEFT JOIN taken t ON t.stratum = a.stratum
ORDER BY a.stratum
"""


@register(
    "sample_stratified_neyman",
    oracle=_ney_sql("orders", "VARCHAR"),
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (variance-optimal) stratified sampling over order
    priority strata: allocation n_h = floor(n · N_h σ_h / Σ N_g σ_g)
    from EXACT decimal cent moments, realized by the deterministic
    md5-order take of the first n_h keys per stratum (the
    corpus_mix_weighted_sample membership discipline: a pure function
    of the key — reproducible across engines, partitionings, reruns).
    Output per stratum: population size, σ, allocation, realized
    count, realized sample mean.  This is how a measurement pass
    spends a fixed labeling/eval budget where strata differ in
    spread — proportional allocation oversamples the quiet strata.

    Engine shape (100 TB): one scan feeds BOTH the 5-row moment
    aggregate and the per-stratum rank window (shuffle keyed on the
    stratum — bounded fan-in per reducer is the stratum size; a
    skewed stratum AQE-splits); the allocation table is a 5-row
    broadcast onto the ranked stream, so the take is a filter, not a
    second pass.  Deterministic: re-running on the same corpus
    reproduces the exact sample.

    FULL value oracle: shared SQL text modulo table name and the
    STRING/VARCHAR keyword."""
    table(spark, sf_dir, "orders").createOrReplaceTempView(
        "p25_ney_orders"
    )
    return spark.sql(_ney_sql("p25_ney_orders", "STRING"))
