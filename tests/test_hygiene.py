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
    the key with an opaque schema mismatch.  Reads the same fixture
    dir as the rest of the suite (S3SPARK_TEST_SF_DIR honored — round-4
    ADVICE item 3)."""
    import duckdb

    from tests.conftest import SF_DIR

    vals = {
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT DISTINCT o_orderpriority FROM '{SF_DIR}/orders.parquet'"
        )
        .fetchall()
    }
    assert vals == {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
    }


def test_comparator_reproduces_driver_list_cell_failure():
    """Fidelity pin for the harness comparator (round-4 verdict item
    2): the REAL driver dies with ``TypeError: unhashable type:
    'list'`` inside pandas sort_values when an output column holds
    arrays — the old comparator list→tuple'd cells and hid that, which
    is why round 4's "driver-sim PASS" failed to predict two driver
    errs.  Assert the comparator now fails on list cells the way the
    driver does (multi-column lexsort path AND the single-column
    path, where the rejection comes from cell canonicalization)."""
    import pandas as pd
    import pytest

    from tests.helpers import normalize

    multi = pd.DataFrame({"a": [1, 2], "v": [[1, 2], [3, 4]]})
    with pytest.raises(TypeError, match="unhashable"):
        normalize(multi)
    single = pd.DataFrame({"v": [[1, 2], [3, 4]]})
    with pytest.raises(TypeError, match="unhashable"):
        normalize(single)


def test_every_key_output_schema_is_driver_hashable(spark, sf_dir):
    """The driver canonicalizes every result via pandas
    sort_values-then-hash, which throws ``TypeError: unhashable type``
    on list/map/struct cells (CORRECTNESS_r04: embedding_centroids,
    embedding_quantize_int8).  Gate the WHOLE registry: no key may
    declare a nested top-level output column — melt to rows or
    array_join to a canonical string instead.  This makes the round-4
    err class unshippable for future keys (round-4 verdict item 7)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name in sorted(REGISTRY):
        if name == "stream_watermark_dedup":
            continue  # executes a streaming job; its flat schema is
            # pinned by its own oracle test
        df = REGISTRY[name].fn(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append(f"{name}: {bad}")
    assert not offenders, (
        "driver-unhashable nested output columns:\n" + "\n".join(offenders)
    )
