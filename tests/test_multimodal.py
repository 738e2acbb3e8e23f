"""Multimodal-column plumbing tests: binary payload integrity, decode
batch contract, determinism, and stub failure mode (SURVEY.md §5.2 /
north-star multimodal mandate)."""

from __future__ import annotations

import pytest

import s3spark.queries  # noqa: F401
from s3spark.queries.multimodal import _fake_decode
from s3spark.registry import REGISTRY


def test_decode_schema_and_byte_counts_match_binary_meta(spark, sf_dir):
    meta = {r.doc_id: r.n_bytes for r in
            REGISTRY["mm_binary_meta"].fn(spark, sf_dir).collect()}
    decoded = REGISTRY["mm_decode_stub"].fn(spark, sf_dir).collect()
    assert decoded[0].__fields__ == [
        "doc_id", "n_bytes", "width", "height", "channels", "format"
    ]
    for r in decoded:
        assert r.n_bytes == meta[r.doc_id]  # decode saw the exact payload bytes
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert r.channels in (1, 2, 3)
        assert r.format in ("png", "jpeg", "webp")


def test_decode_is_deterministic(spark, sf_dir):
    a = REGISTRY["mm_decode_stub"].fn(spark, sf_dir).collect()
    b = REGISTRY["mm_decode_stub"].fn(spark, sf_dir).collect()
    assert a == b


def test_frame_sample_fans_out_rows(spark, sf_dir):
    frames = REGISTRY["mm_frame_sample"].fn(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "no frames sampled"
    for doc_id, rs in by_doc.items():
        assert [r.frame_no for r in sorted(rs, key=lambda x: x.frame_no)] == list(
            range(len(rs))
        )
        assert all(len(r.frame_md5_prefix) <= 16 for r in rs)


def test_stub_decoder_raises_on_empty_payload():
    with pytest.raises(NotImplementedError):
        _fake_decode(b"")
