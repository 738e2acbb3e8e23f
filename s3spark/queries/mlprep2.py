"""Round-4 (cont.) ML-prep operators: PCA by unrolled power
iteration, and OHLC time-bar aggregation — both with FULL DuckDB
value oracles.

- ``embedding_pca_power_iteration``: the top principal component of
  the embedding table via TWO unrolled power-iteration steps, as pure
  dataflow.  The covariance-free identity C·x = (Σ v(v·x) − m·Σ(v·x))/n
  means each step is one corpus scan producing 64 partial sums — the
  classic distributed PCA shape (no d×d covariance materialized, no
  driver loop; cf. Spark MLlib's own computePrincipalComponents which
  DOES build the Gramian — this form scales to d where d² doesn't fit).
  Determinism engineering (the whole trick): per-row dot products are
  sequential in-row folds (DuckDB ``list_dot_product``'s order), and
  every cross-row sum goes through DECIMAL(25,6) — associative exact
  addition — so both engines produce BIT-IDENTICAL doubles and the
  oracle hash-matches without rounding.
- ``timeseries_ohlc_bars``: per-user hourly OHLC (open/high/low/
  close) bars over the event stream — the canonical downsample for
  metrics/financial pipelines.  First/last-by-time resolve via
  (ts, event_id) min/max struct comparison (total order → engine-
  deterministic), min/max are order-independent already, one shuffle.

Reference scope: beyond-reference engine surface (SURVEY.md §2.3
north-star ML-prep family; reference has no analytics — §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

_DIM = 64
_X0 = 0.125  # 1/8: exactly representable, = 1/sqrt(64) normalized start


def _fold_dot(a, b) -> F.Column:
    """Sequential left-fold dot product (DuckDB list_dot_product
    order) — doubles agree to the last ulp across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


# --------------------------------------------------------------------------
# embedding_pca_power_iteration
# --------------------------------------------------------------------------

def _pca_sql() -> str:
    """DuckDB twin: identical arithmetic, CTE per pipeline stage."""
    rng = f"UNNEST(range(1, {_DIM + 1})) AS u(i)"
    x0 = f"list_transform(range(1, {_DIM + 1}), q -> {_X0})"
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
mean AS (
  SELECT i, CAST(SUM(CAST(v[i] AS DECIMAL(25,6))) AS DOUBLE)
            / (SELECT n FROM nn) AS m
  FROM v, {rng} GROUP BY i
),
d1 AS (SELECT vec_id, v, list_dot_product(v, {x0}) AS d FROM v),
p1 AS (SELECT CAST(SUM(CAST(d AS DECIMAL(25,6))) AS DOUBLE) AS p FROM d1),
s1 AS (
  SELECT i, CAST(SUM(CAST(v[i] * d AS DECIMAL(25,6))) AS DOUBLE) AS s
  FROM d1, {rng} GROUP BY i
),
w1 AS (
  SELECT i, (s - m * (SELECT p FROM p1)) / (SELECT n FROM nn) AS w
  FROM s1 JOIN mean USING (i)
),
x1a AS (SELECT list(w ORDER BY i) AS warr FROM w1),
x1 AS (
  SELECT list_transform(
           warr, e -> e / sqrt(list_dot_product(warr, warr))) AS x
  FROM x1a
),
d2 AS (
  SELECT vec_id, v, list_dot_product(v, (SELECT x FROM x1)) AS d FROM v
),
p2 AS (SELECT CAST(SUM(CAST(d AS DECIMAL(25,6))) AS DOUBLE) AS p FROM d2),
s2 AS (
  SELECT i, CAST(SUM(CAST(v[i] * d AS DECIMAL(25,6))) AS DOUBLE) AS s
  FROM d2, {rng} GROUP BY i
),
w2 AS (
  SELECT i, (s - m * (SELECT p FROM p2)) / (SELECT n FROM nn) AS w
  FROM s2 JOIN mean USING (i)
),
w2a AS (SELECT list(w ORDER BY i) AS warr FROM w2)
SELECT u.i AS dim,
       warr[u.i] / sqrt(list_dot_product(warr, warr)) AS component,
       sqrt(list_dot_product(warr, warr)) AS eigenvalue
FROM w2a, {rng}
ORDER BY dim
"""


@register("embedding_pca_power_iteration", oracle=_pca_sql())
def embedding_pca_power_iteration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top principal component of the (centered) embedding corpus by
    two unrolled power-iteration steps; returns (dim, component,
    eigenvalue≈||C·x||).

    Scale shape: each step is ONE scan — per row an in-row fold dot
    d = v·x against the broadcast 1-row direction, then 64 partial
    sums Σ v_j·d keyed by dim (shuffle of 64·partitions tiny rows).
    The covariance matrix is never materialized (the C·x identity),
    so d can be 4096 where a Gramian d² would not fit an executor.
    Cross-row additions go through exact DECIMAL so the result is
    bit-identical on any partitioning — and to DuckDB's, giving an
    iterative ML algorithm a full value oracle.  The driver-side n is
    a planner-time scalar (same class as dedup_semdedup's k)."""
    e = table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n = vecs.count()
    mean = (
        vecs.select(F.posexplode("v").alias("i0", "x"))
        .select((F.col("i0") + 1).alias("i"), "x")
        .groupBy("i")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(25,6)")).cast("double")
                / F.lit(n)
            ).alias("m")
        )
    )

    def step(x_row: DataFrame) -> DataFrame:
        """x_row: 1-row (x: array<double>) → (i, w) unnormalized C·x."""
        d = vecs.crossJoin(F.broadcast(x_row)).select(
            "v", _fold_dot(F.col("v"), F.col("x")).alias("d")
        )
        p = d.agg(
            F.sum(F.col("d").cast("decimal(25,6)"))
            .cast("double")
            .alias("p")
        )
        s = (
            d.select(F.posexplode("v").alias("i0", "vv"), "d")
            .select(
                (F.col("i0") + 1).alias("i"),
                (F.col("vv") * F.col("d")).cast("decimal(25,6)").alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").cast("double").alias("s"))
        )
        return (
            s.join(mean, "i")
            .crossJoin(F.broadcast(p))
            .select(
                "i",
                ((F.col("s") - F.col("m") * F.col("p")) / F.lit(n)).alias(
                    "w"
                ),
            )
        )

    def normalize(w: DataFrame) -> DataFrame:
        """(i, w) → 1-row (x: array<double>) unit vector."""
        return w.groupBy().agg(
            F.array_sort(F.collect_list(F.struct("i", "w")))
            .getField("w")
            .alias("warr")
        ).select(
            F.transform(
                "warr",
                lambda z: z
                / F.sqrt(_fold_dot(F.col("warr"), F.col("warr"))),
            ).alias("x")
        )

    x0 = spark.range(1).select(
        F.array_repeat(F.lit(_X0), _DIM).alias("x")
    )
    w2 = step(normalize(step(x0)))
    w2a = (
        w2.groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("i", "w")))
            .getField("w")
            .alias("warr")
        )
        .select(
            "warr",
            F.sqrt(_fold_dot(F.col("warr"), F.col("warr"))).alias("nrm"),
        )
    )
    dims = spark.range(1, _DIM + 1).select(F.col("id").alias("dim"))
    return (
        dims.crossJoin(F.broadcast(w2a))
        .select(
            "dim",
            (
                F.element_at("warr", F.col("dim").cast("int"))
                / F.col("nrm")
            ).alias("component"),
            F.col("nrm").alias("eigenvalue"),
        )
        .orderBy("dim")
    )


# --------------------------------------------------------------------------
# timeseries_ohlc_bars
# --------------------------------------------------------------------------

_OHLC_SQL = """
SELECT user_id,
       date_trunc('hour', ts) AS bar_ts,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       min_by(value, ts) AS open,
       round(MAX(value), 6) AS high,
       round(MIN(value), 6) AS low,
       max_by(value, ts) AS close
FROM events
WHERE user_id < 50
GROUP BY user_id, date_trunc('hour', ts)
ORDER BY user_id, bar_ts
"""


@register("timeseries_ohlc_bars", oracle=_OHLC_SQL)
def timeseries_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per user over the event stream: open/close
    are the first/last value by ts within the bar via min_by/max_by —
    (user_id, ts) is unique in the fixture (invariant pinned in
    tests/test_pipeline5.py, the same invariant join_pit_features
    relies on; DuckDB 1.0's min_by takes no composite tie-break key)
    — high/low plain MIN/MAX.

    Scale shape: one hash shuffle on (user, hour); min_by/max_by
    carry ONE (key, value) pair of partial state per group and merge
    associatively — the downsample runs map-side partial first, so a
    year of 100 TB ticks reduces before it moves.  The user_id < 50
    slice keeps the verified output bounded; the plan is identical
    unfiltered."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    key = F.col("ts")
    return (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("bar_ts")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min_by("value", key).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.max_by("value", key).alias("close"),
        )
    )
