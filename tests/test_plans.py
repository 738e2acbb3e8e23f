"""Physical-plan assertions (the 100 TB posture, SURVEY.md §4.2):
pushdown, pruning, broadcast choice, codegen'd hot paths.  Correctness
tests prove the answers right; these prove the *plans* are the ones
that survive scale-up.
"""

from __future__ import annotations

import pytest

import s3spark.queries  # noqa: F401
from s3spark.registry import REGISTRY


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_pushdown_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scan_projection_pushdown")
    assert "PushedFilters: [IsNotNull(l_linenumber), EqualTo(l_linenumber,1)]" in plan
    # ReadSchema lists only the 3 referenced columns, not all 11
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_flagship_pushes_shipdate_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "agg_groupby")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial + final hash aggregation (map-side combine before shuffle)
    assert plan.count("HashAggregate") >= 2


def test_broadcast_hint_produces_broadcast_hash_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_join_is_a_join_not_distinct(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_semi")
    assert "LeftSemi" in plan


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_hot_path_queries_have_no_python_eval(spark, sf_dir):
    """Everything except the declared UDx/multimodal keys must stay
    JVM-side: no BatchEvalPython / ArrowEvalPython / MapInPandas
    operators in the plan."""
    python_ok = {
        "udf_python",
        "udf_pandas",
        "udaf_pandas",
        "mm_decode_stub",
        "mm_frame_sample",
    }
    offenders = []
    for name in sorted(REGISTRY):
        if name in python_ok or name == "stream_watermark_dedup":
            continue  # streaming key executes a query, skip plan dump
        plan = plan_of(spark, sf_dir, name)
        if any(
            tok in plan
            for tok in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas")
        ):
            offenders.append(name)
    assert not offenders, f"Python in hot path: {offenders}"


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The co-located join must read bucket-aligned files: SortMergeJoin
    with NO shuffle (and no per-side sort — buckets are pre-sorted)."""
    plan = plan_of(spark, sf_dir, "join_bucketed_colocated")
    join_part = plan[: plan.index("HashAggregate")] if "HashAggregate" in plan else plan
    assert "SortMergeJoin" in plan
    # the only exchanges allowed are AFTER the join (for the groupBy)
    pre_join = plan[plan.index("SortMergeJoin") :]
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_exact_match_filter_becomes_pushed_equality(spark, sf_dir):
    from s3spark import fs

    listing = fs.list_files_distributed(spark, sf_dir)
    matched = fs.match_files(listing, f"{sf_dir}/nation.parquet", fs.EXACT_MATCH)
    assert matched.count() == 1
