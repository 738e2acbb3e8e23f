"""Multimodal-column operators (north-star mandate): image/audio/video
as opaque ``binary`` columns with typed metadata, decoded and
feature-extracted through Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic STUB (``_fake_decode``) — but everything
Spark-level is real and tested: the binary column, the metadata
struct schema, the mapInPandas batch contract, partitioning, and the
oracle-checkable byte-level functions (octet_length, md5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s3spark.io import table
from s3spark.registry import register

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, format string"
)


def _fake_decode(payload: bytes) -> dict:
    """STUB decode kernel. A real deployment plugs Pillow/ffmpeg in
    here; the container ships no codecs, so dimensions are derived
    deterministically from the payload so tests can pin them.
    Raises on empty payload the way a real decoder raises on a
    truncated file."""
    if not payload:
        raise NotImplementedError("empty payload: real decoder would raise")
    n = len(payload)
    return {
        "n_bytes": n,
        "width": 16 + (n * 7) % 240,
        "height": 16 + (n * 13) % 240,
        "channels": 1 + n % 3,
        "format": ("png", "jpeg", "webp")[n % 3],
    }


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with an opaque binary payload column (UTF-8 bytes of
    the text stand in for image bytes — same plumbing, testable)."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


@register(
    "mm_binary_meta",
    oracle="""
SELECT
  doc_id,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS payload_md5
FROM documents
ORDER BY doc_id
""",
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level metadata over the binary column — octet_length and
    md5 run on identical UTF-8 bytes in both engines, so the binary
    plumbing itself is oracle-verified."""
    b = binarize_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    ).orderBy("doc_id")


@register("mm_decode_stub", oracle=None)  # stub kernel → rows-only
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over mapInPandas: binary
    payloads arrive as Arrow batches, the kernel emits a typed
    metadata row per payload.  The Spark contract (batch iterator in,
    schema'd frame out, executor-side execution) is exactly what a
    real image decode uses — swap ``_fake_decode`` for Pillow and
    nothing else changes."""
    b = binarize_documents(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return b.mapInPandas(decode_batches, schema=DECODE_SCHEMA).orderBy("doc_id")


@register("mm_frame_sample", oracle=None)  # stub kernel → rows-only
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape for video-like payloads: one input row →
    K sampled 'frames' (here: deterministic byte-offset slices) via
    mapInPandas fan-out — the row-multiplying variant of the decode
    contract (a real pipeline emits frame tensors at sampled
    timestamps)."""
    b = binarize_documents(spark, sf_dir).filter(F.col("doc_id") < 100)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                k = min(4, max(1, len(data) // 64))
                for i in range(k):
                    off = i * len(data) // k
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_no": i,
                            "byte_offset": off,
                            "frame_md5_prefix": data[off : off + 8].hex(),
                        }
                    )
            yield pd.DataFrame(rows)

    return b.mapInPandas(
        sample,
        schema="doc_id long, frame_no int, byte_offset long, frame_md5_prefix string",
    ).orderBy("doc_id", "frame_no")
