"""Cross-key invariants for the curation3 pipeline: the e2e key's
bounded stage-3 dedup must agree with the unbounded production
MinHash survivor path on their shared domain (round-10 verdict
item 5)."""

from __future__ import annotations

import s3spark.queries  # noqa: F401
from s3spark.queries.curation3 import _e2e_clean, _e2e_survivors
from s3spark.registry import REGISTRY


def test_e2e_stage3_drops_bounded_and_agree_with_minhash(spark, sf_dir):
    """curation_pipeline_e2e stage 3 inherits the doc_id < 500
    verifier bound; dedup_minhash_survivors is the unbounded twin.
    On the shared domain the two must agree:

    (a) every doc e2e's stage 3 drops sits inside the declared
        doc_id < 500 bound (the bound is real, not advisory);
    (b) the unbounded MinHash path drops >= 0.8 of the exact-Jaccard
        drop set (banding is probabilistic -> recall bound, not
        equality) — so the bounded verifier and the scale path name
        the same duplicates where both can see them.
    """
    clean_ids = {
        r.doc_id for r in _e2e_clean(spark, sf_dir).select("doc_id").collect()
    }
    surv_ids = {
        r.doc_id
        for r in _e2e_survivors(spark, sf_dir).select("doc_id").collect()
    }
    e2e_drops = clean_ids - surv_ids
    assert surv_ids <= clean_ids
    assert all(d < 500 for d in e2e_drops), (
        "stage 3 dropped outside its declared doc_id<500 bound"
    )

    mh_ids = {
        r.doc_id
        for r in REGISTRY["dedup_minhash_survivors"]
        .fn(spark, sf_dir)
        .select("doc_id")
        .collect()
    }
    mh_drops_shared = {d for d in clean_ids if d < 500} - mh_ids
    if e2e_drops:
        recall = len(e2e_drops & mh_drops_shared) / len(e2e_drops)
        assert recall >= 0.8, (
            f"minhash drop recall {recall} vs e2e exact drops "
            f"{sorted(e2e_drops)[:10]}"
        )
