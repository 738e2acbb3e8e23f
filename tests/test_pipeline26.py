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
