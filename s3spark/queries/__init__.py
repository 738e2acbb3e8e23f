"""Engine operator surface (SURVEY.md §2.3) — importing this package
registers every verified query into ``s3spark.registry.REGISTRY``.

Registration order matters operationally: the driver's correctness
window records keys in *registration order* and caps how many it
verifies (~50/round).  Rounds 1-3 witnessed 121 distinct green keys
(union of CORRECTNESS_r01-r03); ``_rotate_registry()`` below rebuilds
the dict each import so the window always lands on dirty/rewritten
keys first, then never-witnessed keys, then witnessed ones — the
key-level rotation the round-2 verdict asked for, tightened in round
3 to count only GREEN rows as witnessed, and in round 11 to order the
witnessed tail LRU (oldest latest-witness first) so no key's green
evidence ages unboundedly.
"""

from s3spark.queries import (  # noqa: F401
    ann2,
    # --- §2.3 core engine surface (register first) ---
    scans,
    filters,
    fileops,
    joins,
    aggregates,
    # llm + eventtime promoted ahead of windows/sorts/sets/scalars:
    # the LLM-data surface is graded first-class and round 1's ~50-key
    # driver window cut off at position 50, leaving dedup_* unwitnessed
    llm,
    eventtime,
    windows,
    sorts,
    sets,
    scalars,
    udx,
    # --- long-tail coverage modules ---
    advanced,
    analytics,
    analytics2,
    analytics3,
    analytics4,
    behavior,
    bucketing,
    coverage3,
    coverage4,
    coverage5,
    curation,
    curation2,
    curation3,
    etl,
    formats,
    matching,
    mlprep,
    mlprep2,
    multimodal,
    pipeline2,
    pipeline4,
    pipeline5,
    planner2,
    quality,
    relational5,
    relational6,
    robustness,
    scalars2,
    scalars3,
    scale4,
    scale_ops,
    sketches,
    sources2,
    sqlsurface,
    streaming2,
    text2,
    timeseries,
    udx2,
    # round-5/6 additions register LAST: new keys are unwitnessed and
    # must not displace older unwitnessed keys from the ~50-key driver
    # window mid-rotation
    pipeline6,
    pipeline7,
    pipeline8,
    pipeline9,
    pipeline10,
    pipeline11,
    pipeline12,
    pipeline13,
    pipeline14,
    pipeline15,
    pipeline16,
    pipeline17,
    pipeline18,
    pipeline19,
    pipeline20,
    pipeline21,
    pipeline22,
    pipeline23,
    pipeline24,
    pipeline25,
    pipeline26,
)

from s3spark.queries._audit import DIRTY_SINCE  # noqa: E402


def _green_keys_by_round() -> dict:
    """round N -> keys with a GREEN row in CORRECTNESS_r{N}.json at the
    repo root: ``err is None and hash_match`` for oracled keys, or an
    executed rows-only row (``err == 'no_oracle'`` with a recorded
    spark_rows) for approximate keys.  A key that ran and FAILED (a
    real err, or hash/rows mismatch) is not green for that round, so
    the rotation keeps it at the front of the driver's verification
    window until a green row lands."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    rounds: dict = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path, encoding="utf-8") as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        green: set = set()
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("err") is None and row.get("hash_match") is True
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if ok or rows_only:
                green.add(key)
        rounds[int(m.group(1))] = green
    return rounds


def _effective_dirty(rounds: dict) -> frozenset:
    """Keys whose implementation changed after their last witness and
    whose post-change evidence has NOT landed yet: ``DIRTY_SINCE[k]``
    records the round the rewrite happened in; a green row in any
    CORRECTNESS round >= that clears the key automatically (the driver
    re-runs the rewritten code the round the rewrite ships, so
    same-round evidence vouches for it).  Round-8 ADVICE: derived from
    the committed artifacts at import, never a second hand-kept list,
    so rotation state cannot drift from evidence."""
    return frozenset(
        k
        for k, since in DIRTY_SINCE.items()
        if not any(k in green for n, green in rounds.items() if n >= since)
    )


def _witnessed_keys() -> frozenset:
    """Keys green in ANY round, minus the effectively-dirty set (their
    green rows predate the code they'd vouch for).  With no artifacts
    on disk everything is unwitnessed — the rotation then just keeps
    registration order, which is the correct cold-start behavior."""
    rounds = _green_keys_by_round()
    seen: set = set()
    for green in rounds.values():
        seen |= green
    return frozenset(seen) - _effective_dirty(rounds)


# Within the dirty set, these re-witness FIRST: keys whose latest
# change was substantive (join strategy, plan rewrites, shared-helper
# arithmetic), ahead of order-only sort strips.  Inert entries (already
# cleared by evidence) are filtered out by the effective-dirty check.
_DIRTY_PRIORITY = (
    "timeseries_theil_sen",
    "stats_spearman_corr",
    "stats_mann_whitney_u",
    "stats_welch_ttest",
    "stream_outer_join_watermark",
    "join_multiway",
    "doc_chunk_overlap",
    "agg_countmin_sketch",
)


def _rotate_registry() -> None:
    from s3spark.registry import REGISTRY

    rounds = _green_keys_by_round()
    dirty_set = _effective_dirty(rounds)
    witnessed = _witnessed_keys()
    # order: dirty-but-registered keys first (rewritten code with a
    # stale green row; substantive rewrites before order-only strips),
    # then never-witnessed keys, then witnessed.
    dirty = {
        k: REGISTRY[k]
        for k in _DIRTY_PRIORITY
        if k in REGISTRY and k in dirty_set
    }
    dirty.update(
        {k: v for k, v in REGISTRY.items() if k in dirty_set}
    )
    unseen = {
        k: v
        for k, v in REGISTRY.items()
        if k not in witnessed and k not in dirty_set
    }
    # Witnessed remainder in LRU order (round-10 verdict item 2):
    # oldest latest-green-witness first, registration order as the
    # tiebreak, so every key's witness age is bounded by how fast the
    # ~50-key window cycles the non-dirty tail (~7 rounds at 320 keys)
    # instead of r1-witnessed keys staying parked behind newer ones
    # forever.
    latest_green: dict = {}
    for n in sorted(rounds):
        for k in rounds[n]:
            latest_green[k] = n
    reg_pos = {k: i for i, k in enumerate(REGISTRY)}
    seen = {
        k: REGISTRY[k]
        for k in sorted(
            (k for k in REGISTRY if k in witnessed),
            key=lambda k: (latest_green.get(k, 0), reg_pos[k]),
        )
    }
    REGISTRY.clear()
    REGISTRY.update(dirty)
    REGISTRY.update(unseen)
    REGISTRY.update(seen)


_rotate_registry()
