"""Repo-hygiene gates (round-2 verdict items #2 and #7).

1. Session conf is only mutated in s3spark/session.py — operators must
   scope behavior to a single read/write (explicit reader schema,
   per-write DataFrameWriter option) instead of toggling global conf,
   so one query can never silently change another's semantics.
2. Bench integrity — BENCH_DETAIL.json (written by every bench.py run)
   must record zero failed keys and cover the whole registry, so a
   silently failing key can never ship inside a green round.
"""

from __future__ import annotations

import json
import os
import re

import s3spark.queries  # noqa: F401  (fills REGISTRY)
from s3spark.registry import REGISTRY

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = os.path.join(_REPO, "s3spark")


def _source_files():
    for root, _dirs, files in os.walk(_PKG):
        for fn in files:
            if fn.endswith(".py"):
                yield os.path.join(root, fn)


def test_no_session_conf_mutation_outside_session_py():
    pat = re.compile(r"\bspark\.conf\.set\(|\bconf\.set\(\s*[\"']spark\.")
    offenders = []
    for path in _source_files():
        rel = os.path.relpath(path, _REPO)
        if rel == os.path.join("s3spark", "session.py"):
            continue
        with open(path, encoding="utf-8") as fh:
            for i, line in enumerate(fh, 1):
                if pat.search(line):
                    offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "session conf mutated outside session.py:\n" + "\n".join(offenders)
    )


def test_bench_detail_integrity():
    detail_path = os.path.join(_REPO, "BENCH_DETAIL.json")
    assert os.path.exists(detail_path), (
        "BENCH_DETAIL.json missing — run `python bench.py` "
        "(any SF) to regenerate it"
    )
    with open(detail_path, encoding="utf-8") as fh:
        detail = json.load(fh)
    assert detail.get("failures") == [], (
        f"bench recorded failing keys: {detail.get('failures')}"
    )
    benched = set(detail.get("queries", {}))
    missing = set(REGISTRY) - benched
    assert not missing, (
        f"{len(missing)} registered keys absent from BENCH_DETAIL.json "
        f"(stale detail — re-run `python bench.py`): {sorted(missing)[:10]}"
    )


def test_fixture_has_all_five_order_priorities():
    """sql_transpose's oracle names all five o_orderpriority values as
    output columns, so the key is coupled to this fixture invariant —
    pin it so a fixture change fails HERE with a clear message, not in
    the key with an opaque schema mismatch."""
    import duckdb

    vals = {
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT DISTINCT o_orderpriority FROM "
            "'/root/testdata/sf0.01/orders.parquet'"
        )
        .fetchall()
    }
    assert vals == {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
    }
