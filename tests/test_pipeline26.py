"""Behavioral + plan tests for the round-12 persisted-index IVF-PQ
read path: index/inline equivalence, static partition pruning at the
posting-list scan, and the on-disk posting-list layout."""

from __future__ import annotations

import re

import s3spark.queries  # noqa: F401
from s3spark.queries.pipeline24 import _PQ_K, _PQ_PROBES, _PQ_QUERIES
from s3spark.registry import REGISTRY


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(
            "query_id", "neighbor_id", "dist_sq", "approx_dist", "rn"
        ).collect()
    )


def test_persisted_read_equals_inline_e2e(spark, sf_dir):
    """The whole point of the key: index build + partition-pruned
    read reproduces the one-shot inline computation EXACTLY (codes,
    coarse assignment, LUTs, and re-rank all flow from the same
    shared-SQL float64 expressions; parquet + directory partitioning
    round-trip them losslessly)."""
    inline = _rows(REGISTRY["sim_ivfpq_search_e2e"].fn(spark, sf_dir))
    persisted = _rows(
        REGISTRY["sim_ivfpq_persisted_read"].fn(spark, sf_dir)
    )
    assert persisted == inline
    assert len(persisted) == _PQ_QUERIES * 5  # top-5 per query


def test_persisted_read_scan_is_partition_pruned(spark, sf_dir):
    """The posting-list scan must carry a STATIC PartitionFilters
    IN-list on cluster_id (pruning decided at planning time — the
    scan_manifest_prune gate pattern) selecting at most
    Q x nprobe < K of the 16 posting-list directories, so non-probed
    partitions are never opened."""
    df = REGISTRY["sim_ivfpq_persisted_read"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    idx_lines = [
        ln for ln in plan.splitlines() if "embeddings_ivfpq" in ln
    ]
    assert idx_lines, "index FileScan missing from the plan"
    scan = idx_lines[0]
    m = re.search(r"PartitionFilters: \[cluster_id#\d+ IN \(([\d,]+)\)", scan)
    assert m, f"no static cluster_id IN partition filter on: {scan[:200]}"
    probed = m.group(1).split(",")
    assert 0 < len(probed) <= _PQ_QUERIES * _PQ_PROBES
    assert len(probed) < _PQ_K


def test_persisted_index_layout_is_posting_lists(spark, sf_dir):
    """The written index is one directory per coarse cluster (the
    FAISS posting-list file per centroid, as a lakehouse layout) with
    every corpus vector present exactly once."""
    import glob
    import os

    from s3spark.io import scratch_dir, table

    REGISTRY["sim_ivfpq_persisted_read"].fn(spark, sf_dir)
    out = scratch_dir("ivfpq_index") + "/embeddings_ivfpq"
    parts = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(out, "cluster_id=*"))
    )
    assert 0 < len(parts) <= _PQ_K
    idx = spark.read.parquet(out)
    n_vectors = table(spark, sf_dir, "embeddings").count()
    assert idx.count() == n_vectors
    assert idx.select("vec_id").distinct().count() == n_vectors


def test_mixture_waterfilling_invariants(spark, sf_dir):
    """The allocation must honor its own contract: (a) oversubscribed
    sources cap at full inventory (rate 1e6 -> every doc kept), (b)
    the realized token take lands near (and the ALLOCATED quota never
    over) the 2/5 budget, (c) the skewed weight rule holds, (d) the
    hash realization is deterministic across invocations."""
    rows = {
        r["source"]: r
        for r in REGISTRY["sample_token_budget_mixture"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert len(rows) == 20
    capped = [r for r in rows.values() if r["capped"] == 1]
    assert capped, "fixture must exercise the cap+redistribute path"
    for r in capped:
        assert r["rate_ppm"] == 1_000_000
        assert r["n_docs_kept"] == r["n_docs_total"]
        assert r["tokens_kept"] == r["tokens_total"]
    for name, r in rows.items():
        suffix = int("".join(ch for ch in name if ch.isdigit()))
        assert r["weight"] == (25 if suffix % 5 == 0 else 1)
        assert 0 < r["rate_ppm"] <= 1_000_000
        assert r["n_docs_kept"] <= r["n_docs_total"]
    total = sum(r["tokens_total"] for r in rows.values())
    budget = total * 2 // 5
    kept = sum(r["tokens_kept"] for r in rows.values())
    # realized take fluctuates around the quota by hash luck on small
    # strata; the quota itself can only UNDERSHOOT (round-2 residual
    # is reported unspent, never oversubscribed)
    assert 0.8 * budget < kept < 1.1 * budget
    again = {
        r["source"]: (r["n_docs_kept"], r["tokens_kept"])
        for r in REGISTRY["sample_token_budget_mixture"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert again == {
        k: (r["n_docs_kept"], r["tokens_kept"]) for k, r in rows.items()
    }
