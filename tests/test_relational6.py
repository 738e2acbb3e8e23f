"""Behavioral tests for the round-4d relational/matching operators:
the NOT IN three-valued-logic edge cases that the fixture data cannot
reach, and the SymSpell deletion-neighborhood completeness lemma the
fuzzy join's candidate generation relies on.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


from s3spark.queries.relational6 import not_in_shuffled


def _probe(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c"), (3, "d")],
        "ck long, tag string",
    )


def test_not_in_shuffled_normal(spark):
    build = spark.createDataFrame([(2,), (9,)], "k long")
    got = sorted(
        r.tag
        for r in not_in_shuffled(_probe(spark), build, "ck", "k").collect()
    )
    # 2 is in the build set; the NULL probe row is UNKNOWN -> dropped
    assert got == ["a", "d"]


def test_not_in_shuffled_empty_build_keeps_null_probe(spark):
    build = spark.createDataFrame([], "k long")
    got = sorted(
        r.tag
        for r in not_in_shuffled(_probe(spark), build, "ck", "k").collect()
    )
    # NOT IN over the empty set is TRUE for every row, null probe too
    assert got == ["a", "b", "c", "d"]


def test_not_in_shuffled_null_in_build_empties_result(spark):
    build = spark.createDataFrame([(2,), (None,)], "k long")
    got = not_in_shuffled(_probe(spark), build, "ck", "k").collect()
    # any NULL in the build set makes every membership test UNKNOWN
    assert got == []


def test_not_in_shuffled_matches_spark_not_in(spark):
    """The rewrite must agree with Spark's own NOT IN (broadcast NAAJ)
    on the same inputs, for each build-side shape."""
    probe = _probe(spark)
    for rows in ([(2,), (9,)], [], [(2,), (None,)]):
        build = spark.createDataFrame(rows, "k long")
        probe.createOrReplaceTempView("t_probe")
        build.createOrReplaceTempView("t_build")
        want = sorted(
            r.tag
            for r in spark.sql(
                "SELECT tag FROM t_probe "
                "WHERE ck NOT IN (SELECT k FROM t_build)"
            ).collect()
        )
        got = sorted(
            r.tag
            for r in not_in_shuffled(probe, build, "ck", "k").collect()
        )
        assert got == want, f"build={rows}"


# ---------------------------------------------------------------------------
# SymSpell deletion-neighborhood completeness (pure-Python lemma check)
# ---------------------------------------------------------------------------


def _variants(s: str) -> set[str]:
    """Mirror of the SQL deletion-variant generator in matching.py:
    the string itself plus every single-character deletion."""
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def _edits(s: str, alphabet: str) -> list[str]:
    """All strings at Levenshtein distance exactly <= 1 from s."""
    out = [s]
    for i in range(len(s)):
        out.append(s[:i] + s[i + 1 :])  # deletion
        for ch in alphabet:
            out.append(s[:i] + ch + s[i + 1 :])  # substitution
    for i in range(len(s) + 1):
        for ch in alphabet:
            out.append(s[:i] + ch + s[i:])  # insertion
    return out


@settings(max_examples=200, deadline=None)
@given(
    s=st.text(alphabet="abc0", min_size=1, max_size=8),
    edit_seed=st.integers(min_value=0, max_value=10**9),
)
def test_deletion_neighborhood_complete_for_distance_1(s, edit_seed):
    """Completeness lemma: any t with d(s, t) <= 1 shares at least one
    deletion variant with s — so the equi-join on variants can never
    miss a distance-1 pair, for any strings, not just the fixture's."""
    edits = _edits(s, "abc0")
    t = edits[edit_seed % len(edits)]
    assert _variants(s) & _variants(t), (s, t)


def test_not_in_shuffled_same_key_name_on_both_sides(spark):
    """The helper must work when probe and build share the key column
    name — the natural NOT IN shape (alias-qualified join condition)."""
    probe = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "ck long, tag string"
    )
    build = spark.createDataFrame([(2,)], "ck long")
    got = sorted(
        r.tag
        for r in not_in_shuffled(probe, build, "ck", "ck").collect()
    )
    assert got == ["a"]
