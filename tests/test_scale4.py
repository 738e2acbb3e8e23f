"""Behavioral tests for the round-4 scale operators (scale4.py):
bloom-prune guarantees, Z-order envelope bounds, heavy-hitter bucket
prune selectivity, PageRank structure.  The oracle suite proves the
answers; these prove the *mechanisms* do what their docstrings claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.queries.scale4 import _HH_BUCKETS, _HH_T, bloom_prune
from s3spark.registry import REGISTRY


def test_bloom_prune_no_false_negatives_and_real_pruning(spark, sf_dir):
    """Bloom contract: every fact row whose key IS in the dim survives
    (no false negatives — otherwise the downstream join silently loses
    rows), and the pass-through fraction tracks dim selectivity (the
    shuffle-byte reduction the operator exists for)."""
    part = table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#13", "Brand#22")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey")
    pruned = bloom_prune(li, "l_partkey", part, "p_partkey")

    true_matches = li.join(
        part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
    ).count()
    survivors_matching = pruned.join(
        part.select("p_partkey"),
        pruned.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).count()
    assert survivors_matching == true_matches  # no false negatives

    total = li.count()
    passed = pruned.count()
    # two brands of ~26 → ~8% true selectivity; allow generous FP slack
    assert passed / total < 0.2, f"bloom passed {passed}/{total}"
    assert passed >= true_matches


def test_zorder_buckets_bound_both_envelopes(spark, sf_dir):
    """z >> 14 pins bits >= 7 of both interleaved keys, so every
    bucket's min/max envelope must be <= 127 wide on BOTH columns —
    the simultaneous two-column bound is exactly what makes Z-order
    file skipping work where a plain sort bounds only its leading
    column.  Also require real bucket spread (not one giant bucket)."""
    rows = REGISTRY["sort_zorder_layout"].fn(spark, sf_dir).collect()
    assert len(rows) > 4
    for r in rows:
        assert r.max_part - r.min_part <= 127, r
        assert r.max_supp - r.min_supp <= 127, r


def test_heavy_hitter_bucket_prune_is_selective(spark, sf_dir):
    """The pass-1 bucket prune must discard most rows before the exact
    pass-2 count — that is the claimed shuffle saving.  Recomputed
    inline with the operator's own bucketing expressions."""
    o = table(spark, sf_dir, "orders").select("o_custkey")
    bucketed = o.withColumn(
        "b", F.pmod(F.xxhash64("o_custkey"), F.lit(_HH_BUCKETS))
    )
    heavy = bucketed.groupBy("b").count().filter(F.col("count") > _HH_T)
    surviving_rows = bucketed.join(F.broadcast(heavy.select("b")), "b").count()
    total = o.count()
    assert surviving_rows / total < 0.3, (
        f"bucket prune kept {surviving_rows}/{total} rows"
    )


def test_pagerank_ranks_are_positive_and_supplier_heavy(spark, sf_dir):
    """Structure checks: ppm ranks are positive, the top-ranked nodes
    are suppliers (odd ids — suppliers have ~20x the degree of parts
    in the bipartite fixture graph), and ranks are strictly ordered
    per the deterministic tie-break."""
    rows = REGISTRY["graph_pagerank_unrolled"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.rank_ppm > 0 for r in rows)
    assert rows[0].node % 2 == 1  # a supplier tops the ranking
    ranks = [(r.rank_ppm, -r.node) for r in rows]
    assert ranks == sorted(ranks, reverse=True)
