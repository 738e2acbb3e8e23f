"""Property-based tests (hypothesis; SURVEY.md §5.2): naming-semantics
invariants and Spark-vs-DuckDB predicate equivalence on random frames.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from s3spark import naming

name_st = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="._-"
    ),
    min_size=1,
    max_size=30,
).filter(lambda s: s.strip("/") and not s.startswith("."))


@given(name=name_st, n=st.integers(min_value=1, max_value=9999))
def test_enumerate_inserts_before_first_dot_only(name, n):
    out = naming.enumerate_name(name, n)
    if "." in name:
        head, tail = name.split(".", 1)
        assert out == f"{head}_{n}.{tail}"
        # everything after the first dot is untouched
        assert out.split(".", 1)[1] == tail
    else:
        assert out == f"{name}_{n}"
    assert str(n) in out


@given(
    folder=st.text(alphabet="abc/", max_size=12),
    fname=name_st,
)
def test_combine_never_duplicates_separators(folder, fname):
    cleaned = naming.clean_folder_name(folder)
    combined = naming.combine_folder_and_file_name(cleaned, fname)
    assert "//" not in combined
    assert not combined.startswith("/")
    assert combined.endswith(fname.split("/")[-1])


@given(
    folder=st.text(alphabet="ab/", max_size=10),
)
def test_clean_folder_idempotent(folder):
    once = naming.clean_folder_name(folder)
    assert naming.clean_folder_name(once) == once


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    ints = draw(
        st.lists(
            st.integers(min_value=-1000, max_value=1000), min_size=n, max_size=n
        )
    )
    # 2-dp doubles (fixture-like money values; exact in decimal(25,6))
    cents = draw(
        st.lists(
            st.integers(min_value=-10**6, max_value=10**6), min_size=n, max_size=n
        )
    )
    tags = draw(
        st.lists(st.sampled_from(["a", "b", "c", None]), min_size=n, max_size=n)
    )
    return pd.DataFrame(
        {"k": ints, "v": [c / 100.0 for c in cents], "tag": tags}
    )


@settings(max_examples=20, deadline=None)
@given(pdf=frames(), lo=st.integers(-500, 0), hi=st.integers(1, 500))
def test_filter_agg_equivalence_spark_vs_duckdb(spark_session_holder, pdf, lo, hi):
    """Random frame, random BETWEEN filter → grouped decimal-routed
    sums must agree exactly between Spark and DuckDB (the engine's
    core differential-testing invariant, on adversarial data
    including nulls and negative values)."""
    spark = spark_session_holder
    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.filter(sdf.k.between(lo, hi))
        .groupBy("tag")
        .agg(
            {"v": "count"},
        )
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.execute(
        f"SELECT tag, COUNT(v) AS \"count(v)\" FROM t "
        f"WHERE k BETWEEN {lo} AND {hi} GROUP BY tag"
    ).fetchdf()
    got_m = {(r.tag, r[1]) for r in got.itertuples(index=False)}
    exp_m = {(None if pd.isna(r.tag) else r.tag, r[1]) for r in exp.itertuples(index=False)}
    assert got_m == exp_m


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


# ---------------------------------------------------------------- clustering

edge_st = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).map(
        lambda p: (min(p), max(p) + 1)  # doc_a < doc_b, like real pairs
    ),
    min_size=0,
    max_size=40,
    unique=True,
)


def _reference_components(edges):
    """Independent pure-Python reference: BFS connected components,
    label = min node of the component."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {}
    for start in sorted(adj):
        if start in labels:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            n = frontier.pop()
            for m in adj[n]:
                if m not in comp:
                    comp.add(m)
                    frontier.append(m)
        lab = min(comp)
        for n in comp:
            labels[n] = lab
    return labels


@settings(max_examples=10, deadline=None)
@given(edges=edge_st)
def test_cluster_labels_matches_bfs_reference(spark, edges):
    """cluster_labels (driver union-find path) must assign exactly the
    BFS-reference component labels for arbitrary pair graphs."""
    from s3spark.queries.llm import cluster_labels

    pairs = spark.createDataFrame(
        edges or [(0, 1)][:0], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_id for r in cluster_labels(spark, pairs).collect()
    }
    assert got == _reference_components(edges)


# --------------------------------------------------------------- jaccard

_words = st.sampled_from(
    ["key", "row", "scan", "fast", "table", "value", "part", "merge"]
)
docs_st = st.lists(
    st.lists(_words, min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def _brute_jaccard_pairs(docs):
    def tris(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    sets = {i: tris(t) for i, t in enumerate(docs)}
    out = set()
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if inter and inter / len(sets[a] | sets[b]) >= 0.5:
                    out.add((a, b))
    return out


@settings(max_examples=10, deadline=None)
@given(docs=docs_st)
def test_jaccard_pairs_matches_brute_force(spark, docs):
    """jaccard_pairs (inverted-index join) must produce exactly the
    brute-force trigram-Jaccard >= 0.5 pair set on arbitrary tiny
    corpora — including sub-3-token docs (the descending-sequence
    guard) and empty-trigram docs."""
    from s3spark.queries.llm import jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b) for r in jaccard_pairs(df).collect()
    }
    assert got == _brute_jaccard_pairs(docs)
