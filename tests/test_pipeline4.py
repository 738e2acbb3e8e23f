"""Behavioral tests for the round-4 pipeline operators
(s3spark/queries/pipeline4.py) — the invariants the oracle-
differential check can't express on its own."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.queries.pipeline4 import (
    _SEM_PER_CLUSTER,
    _SEM_TAU,
    _fold_dot,
    bpe_train,
)
from s3spark.registry import REGISTRY


def test_semdedup_threshold_margin(spark, sf_dir):
    """No within-cluster pair's cosine sits within 1e-4 of tau: the
    drop decision cannot flip between engines / partitionings from
    last-ulp float noise (same guard pattern as the kmeans
    assignment margin)."""
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
    )
    a = assigned
    b = assigned.select(
        F.col("cid"),
        F.col("vec_id").alias("j"),
        F.col("v").alias("vj"),
        F.col("n2").alias("n2j"),
    )
    margin = (
        a.join(b, "cid")
        .filter(F.col("vec_id") < F.col("j"))
        .select(
            F.abs(
                _fold_dot(F.col("v"), F.col("vj"))
                / (F.sqrt("n2") * F.sqrt("n2j"))
                - F.lit(_SEM_TAU)
            ).alias("m")
        )
        .agg(F.min("m"))
        .collect()[0][0]
    )
    assert margin > 1e-4, f"cosine within {margin} of tau={_SEM_TAU}"


def test_semdedup_drops_nothing_twice(spark, sf_dir):
    """n_kept + n_dropped == n_members per cluster, and at least one
    cluster actually drops something at the fixture's tau."""
    rows = REGISTRY["dedup_semdedup"].fn(spark, sf_dir).collect()
    assert all(r["n_kept"] + r["n_dropped"] == r["n_members"] for r in rows)
    assert sum(r["n_dropped"] for r in rows) > 0


def test_bpe_toy_corpus_learns_expected_merges(spark):
    """Hand-checkable corpus: 'the the then cat'.  Pair counts give
    (h,e)=3 and (t,h)=3 — tie broken to (h,e) by pair order; after
    merging 'he', (t,he)=3 wins round 2.  Token totals shrink
    10 -> 7."""
    words = spark.createDataFrame(
        [("the", 2), ("then", 1), ("cat", 1)], "word string, n long"
    ).select(
        "word",
        "n",
        F.concat(
            F.lit("||"), F.regexp_replace("word", "(.)", "$1||")
        ).alias("seq"),
    )
    got = [tuple(r) for r in bpe_train(words, steps=2).collect()]
    assert got == [
        (1, "h", "e", "he", 3, 10),
        (2, "t", "he", "the", 3, 7),
    ]


def test_bpe_merge_is_boundary_safe(spark):
    """A token ending in 't' next to a token 'h' must NOT match the
    (t, h) pair pattern — the double-delimiter scheme prevents the
    substring false-positive ('xt', 'h' vs 't', 'h')."""
    words = spark.createDataFrame(
        [("xthx", 5), ("ath", 4)], "word string, n long"
    ).select(
        "word",
        "n",
        F.concat(
            F.lit("||"), F.regexp_replace("word", "(.)", "$1||")
        ).alias("seq"),
    )
    # pairs: (x,t)5 (t,h)9 (h,x)5 (a,t)4 -> merge1 = (t,h)
    rows = bpe_train(words, steps=1).collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("t", "h")
    # 'xthx' -> x,th,x ; 'ath' -> a,th : totals 5*3 + 4*2 = 23
    assert rows[0]["corpus_tokens_after"] == 23


def test_kmv_estimate_within_bound(spark, sf_dir):
    """KMV with K=256 has stderr ~1/sqrt(K) ≈ 6%; assert the
    fixture estimate lands within 4 sigma (25%)."""
    r = REGISTRY["agg_kmv_distinct"].fn(spark, sf_dir).collect()[0]
    rel = abs(r["est_distinct"] - r["true_distinct"]) / r["true_distinct"]
    assert rel < 0.25, f"KMV rel err {rel:.3f}"


def test_manifest_prune_skips_files(spark, sf_dir):
    """The whole point: the date predicate must open strictly fewer
    files than the layout holds (and at least one)."""
    r = REGISTRY["scan_manifest_prune"].fn(spark, sf_dir).collect()[0]
    assert 0 < r["n_files_read"] < r["n_files_total"]
    assert r["n_rows"] > 0


def test_countmin_never_underestimates(spark, sf_dir):
    """CMS structural guarantee: est >= true for every probe, and the
    deliberately-absent key still gets a (possibly inflated,
    never negative) estimate."""
    rows = REGISTRY["agg_countmin_sketch"].fn(spark, sf_dir).collect()
    assert all(r["est_count"] >= r["true_count"] for r in rows)
    absent = [r for r in rows if r["probe_key"] == 987654]
    assert len(absent) == 1 and absent[0]["true_count"] == 0


def test_cdc_tombstone_users_absent(spark, sf_dir):
    """Every user whose LATEST log record is a delete must be absent
    from the snapshot; everyone else present exactly once."""
    e = table(spark, sf_dir, "events")
    w_latest = (
        e.select(
            "user_id",
            "event_type",
            F.row_number()
            .over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            )
            .alias("rn"),
        )
        .filter("rn = 1")
        .collect()
    )
    deleted = {r["user_id"] for r in w_latest if r["event_type"] == "error"}
    kept = {r["user_id"] for r in w_latest} - deleted
    snap = REGISTRY["cdc_apply_tombstones"].fn(spark, sf_dir).collect()
    snap_users = [r["user_id"] for r in snap]
    assert set(snap_users) == kept
    assert len(snap_users) == len(set(snap_users))
    assert deleted, "fixture should exercise the tombstone path"


def test_pit_reference_streams_have_unique_event_times(spark, sf_dir):
    """join_pit_features' last(ignorenulls) window is deterministic
    only while no user has two purchase (or click) events at the SAME
    timestamp with different values — pin that fixture invariant so a
    future fixture change fails loudly instead of flaking."""
    from s3spark.io import table

    e = table(spark, sf_dir, "events")
    dups = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("user_id", "ts", "event_type")
        .agg(F.countDistinct("value").alias("nv"))
        .filter(F.col("nv") > 1)
        .count()
    )
    assert dups == 0


def test_incremental_diff_reads_only_delta(spark, sf_dir):
    """The incremental consumer must read strictly less than the full
    layout, and the new-file count must match the delta buckets."""
    r = (
        REGISTRY["scan_incremental_manifest_diff"].fn(spark, sf_dir).collect()
    )[0]
    full = REGISTRY["scan_manifest_prune"].fn(spark, sf_dir).collect()[0]
    assert 0 < r["n_new_files"] < full["n_files_total"]
    assert r["n_rows"] > 0


def test_quality_classifier_is_deterministic_and_discriminates(
    spark, sf_dir
):
    """Two runs agree bit-for-bit (integer margins) and both labels
    occur — a constant classifier would be a vacuous key."""
    fn = REGISTRY["quality_classifier_hashed"].fn
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert a == b
    labels = {r["label"] for r in a}
    assert labels == {0, 1}
