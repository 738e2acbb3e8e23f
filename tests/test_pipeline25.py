"""Behavioral tests for round-11 batch two: Matryoshka-truncation
retrieval evaluation and Neyman stratified sampling."""

from __future__ import annotations

import s3spark.queries  # noqa: F401
from s3spark.registry import REGISTRY


def test_matryoshka_anchor_and_bounds(spark, sf_dir):
    """k=64 is the anchor ranking scored against itself -> recall
    exactly 1.0 for every query (a self-check of the overlap join);
    every recall is n_overlap/5 in [0, 1]; 4 k-values x 5 queries."""
    rows = REGISTRY["sim_matryoshka_recall_eval"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    by_k: dict = {}
    for r in rows:
        assert 0 <= r.n_overlap <= 5
        assert abs(r.recall - r.n_overlap / 5) < 1e-9
        by_k.setdefault(r.k, []).append(r.recall)
    assert set(by_k) == {8, 16, 32, 64}
    assert all(v == 1.0 for v in by_k[64]), by_k[64]
    # the fixture embeddings are NOT Matryoshka-trained, so truncated
    # recall is expected to be LOW — the measurement's honest finding
    # (mean 0.04-0.16 at k<=32 on this fixture); assert only that the
    # truncated rankings are not accidentally the anchor
    assert sum(by_k[8]) / 5 < 1.0


def test_neyman_allocation_mechanics(spark, sf_dir):
    """Allocation follows n_h = floor(500 * Nh*sigma_h / sum), the
    realized take per stratum equals the allocation exactly
    (deterministic hash order), and floor rounding leaves the total
    within 5 of the budget (one floor per stratum)."""
    rows = REGISTRY["sample_stratified_neyman"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    denom = sum(r.n_pop * r.sigma_cents for r in rows)
    for r in rows:
        expected = int(500.0 * (r.n_pop * r.sigma_cents) / denom)
        # sigma is rounded to 6 dp in the output; allow one-off drift
        assert abs(r.n_alloc - expected) <= 1, (r.stratum, r.n_alloc, expected)
        assert r.n_taken == r.n_alloc
        assert r.n_alloc <= r.n_pop
        assert r.sample_mean is not None and r.sample_mean > 0
    total = sum(r.n_alloc for r in rows)
    assert 495 <= total <= 500, total


def test_neyman_sample_is_deterministic(spark, sf_dir):
    a = REGISTRY["sample_stratified_neyman"].fn(spark, sf_dir).collect()
    b = REGISTRY["sample_stratified_neyman"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
