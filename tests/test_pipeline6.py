"""Behavioral tests for the round-5 pipeline operators: the guarantees
the oracle hash-match can't express — leakage-freedom of the split,
robustness of the MAD gate, and the broadcast plan shape of the vocab
join.
"""

from __future__ import annotations

import pandas as pd
import pytest

import s3spark.queries  # noqa: F401
from s3spark.registry import REGISTRY


@pytest.fixture(scope="module")
def dup_corpus_dir(tmp_path_factory):
    """documents.parquet with planted normalization-variant duplicates
    and one absurdly long document per source."""
    d = tmp_path_factory.mktemp("dup_corpus")
    base = "the fast key order sort table scan merge row value"
    rows = []
    for i in range(40):
        rows.append(
            {"doc_id": i, "text": f"unique doc {i} about topic {i % 7}",
             "lang": "en", "source": f"src{i % 2}", "n_chars": 30}
        )
    # normalization variants of one document: case + punctuation +
    # double spaces — all must co-assign to ONE split
    rows += [
        {"doc_id": 100, "text": base, "lang": "en", "source": "src0",
         "n_chars": len(base)},
        {"doc_id": 101, "text": base.upper(), "lang": "en", "source": "src1",
         "n_chars": len(base)},
        {"doc_id": 102, "text": base.replace(" ", "  ") + "!!",
         "lang": "en", "source": "src0", "n_chars": len(base) + 2},
    ]
    # one mega-document per source for the MAD gate
    rows += [
        {"doc_id": 200, "text": "x " * 5000, "lang": "en", "source": "src0",
         "n_chars": 10000},
        {"doc_id": 201, "text": "y " * 5000, "lang": "en", "source": "src1",
         "n_chars": 10000},
    ]
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_split_duplicates_coassign(spark, dup_corpus_dir):
    """The three normalization-variants (100, 101, 102) must share one
    rep_doc_id (=100) and land in the SAME split — the leakage
    guarantee that motivates the key."""
    out = REGISTRY["split_leakage_safe"].fn(spark, dup_corpus_dir).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[100].rep_doc_id == 100
    assert by_id[101].rep_doc_id == 100
    assert by_id[102].rep_doc_id == 100
    assert len({by_id[i].split for i in (100, 101, 102)}) == 1
    # every document is assigned exactly once
    assert len(out) == 45
    assert set(r.split for r in out) <= {"train", "val", "test"}


def test_split_no_group_straddles_splits(spark, sf_dir):
    """Corpus-wide leakage invariant on the real fixture: no
    rep_doc_id group may span two splits, and split fractions must be
    in the md5-uniformity ballpark of 80/10/10."""
    import pyspark.sql.functions as F

    df = REGISTRY["split_leakage_safe"].fn(spark, sf_dir)
    straddlers = (
        df.groupBy("rep_doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    n = df.count()
    train = df.filter(F.col("split") == "train").count()
    assert 0.65 < train / n < 0.95  # 500-doc binomial tolerance


def test_mad_gate_flags_mega_doc_and_spares_normals(spark, dup_corpus_dir):
    """Each source's planted 10k-char mega-document must be the
    outlier; the 30-char bulk must not be flagged (median/MAD are
    untouched by a single huge value — the point of robust stats)."""
    rows = {
        r.source: r
        for r in REGISTRY["quality_length_outlier_mad"]
        .fn(spark, dup_corpus_dir)
        .collect()
    }
    for src in ("src0", "src1"):
        assert rows[src].n_outliers >= 1  # the mega-doc
        # the gate must not flag the majority: outliers are a small
        # minority of each source
        assert rows[src].n_outliers <= rows[src].n_docs * 0.25
        assert rows[src].med_chars < 100  # median untouched by the tail


def test_vocab_join_is_broadcast_and_covers_all_tokens(spark, sf_dir):
    """The vocab side must broadcast (never shuffle the token stream
    for the join), and summing per-doc n_tokens must equal the corpus
    token-position count — no token dropped or double-counted by the
    left join."""
    import pyspark.sql.functions as F

    df = REGISTRY["tokenizer_vocab_coverage"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    total = df.agg(F.sum("n_tokens")).collect()[0][0]
    expected = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    assert total == expected
