"""Multimodal-column tests: binary payload integrity, REAL codec
round-trips (PNG chunk/CRC/inflate/de-filter, RIFF/WAV), decode batch
contract, determinism, and corrupt-payload failure modes (SURVEY.md
§5.2 / north-star multimodal mandate)."""

from __future__ import annotations

import pytest

import s3spark.queries  # noqa: F401
from s3spark.queries.multimodal import (
    _decode_png,
    _decode_wav,
    _encode_png,
    _encode_wav,
    _img_dims,
    _wav_frames,
)
from s3spark.registry import REGISTRY


def test_png_codec_roundtrip_kernel():
    """The encode/decode pair is a real PNG implementation: decoded
    dimensions and pixels match the generator exactly."""
    for doc_id in (0, 7, 123):
        w, h = _img_dims(doc_id)
        dw, dh, depth, ctype, px = _decode_png(_encode_png(doc_id))
        assert (dw, dh, depth, ctype) == (w, h, 8, 0)
        assert list(px) == [
            (x + 3 * y + doc_id) % 256 for y in range(h) for x in range(w)
        ]


def test_png_decoder_handles_all_filter_types():
    """De-filtering is real: a PNG re-encoded with Sub/Up/Average/
    Paeth filter rows must decode to the same pixels as filter-None."""
    import struct
    import zlib

    from s3spark.queries.multimodal import _png_chunk

    w, h = 5, 5
    base = [(x * 7 + y * 3) % 256 for y in range(h) for x in range(w)]

    def encode_with_filters(filters):
        raw = bytearray()
        prev = [0] * w
        for y in range(h):
            line = base[y * w : (y + 1) * w]
            ft = filters[y % len(filters)]
            raw.append(ft)
            for x in range(w):
                a = line[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                if ft == 0:
                    enc = line[x]
                elif ft == 1:
                    enc = line[x] - a
                elif ft == 2:
                    enc = line[x] - b
                elif ft == 3:
                    enc = line[x] - (a + b) // 2
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    )
                    enc = line[x] - pred
                raw.append(enc & 0xFF)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b"")
        )

    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        _, _, _, _, px = _decode_png(encode_with_filters(filters))
        assert list(px) == base, f"filter set {filters} mis-decoded"


def test_png_decoder_rejects_corruption():
    good = bytearray(_encode_png(3))
    with pytest.raises(ValueError, match="magic"):
        _decode_png(b"GIF89a" + bytes(good[6:]))
    flipped = bytearray(good)
    flipped[40] ^= 0xFF  # inside IDAT body → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(flipped))


def test_wav_codec_roundtrip_kernel():
    for doc_id in (0, 9, 150):
        n, sr, ch, frames = _decode_wav(_encode_wav(doc_id))
        assert (n, sr, ch) == (_wav_frames(doc_id), 8000, 1)
        assert frames[: 5] == bytes(
            (i * (doc_id + 3) + 7) % 256 for i in range(5)
        )


def test_decode_png_query_matches_generator(spark, sf_dir):
    out = REGISTRY["mm_decode_png"].fn(spark, sf_dir).collect()
    assert out, "no images decoded"
    assert out[0].__fields__ == [
        "doc_id", "width", "height", "bit_depth", "color_type",
        "n_pixels", "pixel_sum",
    ]
    for r in out:
        w, h = _img_dims(r.doc_id)
        assert (r.width, r.height) == (w, h)
        assert r.n_pixels == w * h
        assert r.pixel_sum == sum(
            (x + 3 * y + r.doc_id) % 256 for y in range(h) for x in range(w)
        )


def test_decode_is_deterministic(spark, sf_dir):
    a = REGISTRY["mm_decode_png"].fn(spark, sf_dir).collect()
    b = REGISTRY["mm_decode_png"].fn(spark, sf_dir).collect()
    assert a == b


def test_frame_sample_fans_out_rows(spark, sf_dir):
    frames = REGISTRY["mm_frame_sample_wav"].fn(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "no frames sampled"
    for doc_id, rs in by_doc.items():
        rs = sorted(rs, key=lambda x: x.frame_no)
        assert [r.frame_no for r in rs] == list(range(len(rs)))
        n = _wav_frames(doc_id)
        for r in rs:
            assert r.n_frames == n
            assert r.sample_offset == r.frame_no * n // 4
            assert r.sample_value == (r.sample_offset * (doc_id + 3) + 7) % 256


def test_resize_samples_expected_pixels(spark, sf_dir):
    out = REGISTRY["mm_image_resize"].fn(spark, sf_dir).collect()
    assert out, "no thumbnails"
    for r in out[:20]:
        w, h = _img_dims(r.doc_id)
        thumb = [
            ((xx * w // 8) + 3 * (yy * h // 8) + r.doc_id) % 256
            for yy in range(8)
            for xx in range(8)
        ]
        assert r.thumb_sum == sum(thumb)
        assert r.center_px == thumb[4 * 8 + 4]


def test_phash_dedup_finds_exactly_the_planted_scene_pairs(spark, sf_dir):
    """mm_image_phash_dedup: the textured family plants near-dups as
    same-scene doc pairs (scene = doc_id % 150, sparse per-doc noise).
    The banded dHash must recover EVERY planted pair (recall 1.0 —
    noise flips at most a couple of bits, so at least one 16-bit band
    survives intact) with ZERO cross-scene false positives (scenes
    differ by a per-scene gradient, ~half the 64 bits flip)."""
    from s3spark.queries.multimodal import _PH_DOCS, _PH_SCENES

    rows = REGISTRY["mm_image_phash_dedup"].fn(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    planted = {
        (a, b)
        for a in range(_PH_DOCS)
        for b in range(a + 1, _PH_DOCS)
        if a % _PH_SCENES == b % _PH_SCENES
    }
    assert got == planted
    assert all(r.hamming <= 2 for r in rows)


def test_audio_fingerprint_recovers_every_planted_pair(spark, sf_dir):
    """mm_audio_fingerprint_dedup: r=8 banding must recover EVERY
    same-scene planted pair (recall 1.0 — the sparse noise leaves at
    least one 8-bit band intact); the few cross-scene survivors are
    honest sub-threshold Hamming near-collisions, bounded small."""
    from s3spark.queries.multimodal import _AF_DOCS, _AF_SCENES

    rows = REGISTRY["mm_audio_fingerprint_dedup"].fn(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    planted = {
        (a, b)
        for a in range(_AF_DOCS)
        for b in range(a + 1, _AF_DOCS)
        if a % _AF_SCENES == b % _AF_SCENES
    }
    assert planted <= got, "missed planted near-dup pairs"
    extras = got - planted
    assert len(extras) <= 10, f"too many cross-scene survivors: {extras}"


def test_mm_curation_manifest_conserves_survivors_and_respects_budget(
    spark, sf_dir
):
    """mm_curation_pipeline_e2e: (a) the manifest's doc total equals
    an independent python replay of quality-gate + survivorship over
    the pure pixel arithmetic; (b) per shard, bins are contiguous from
    0 and every bin STARTS under its budget boundary (greedy cumsum
    packing: a bin closes only once the running total crosses it);
    (c) absorbed counts only sit on survivors (sum over manifest ==
    total pair count)."""
    from s3spark.queries.multimodal import (
        _MMC_BUDGET,
        _MMC_QMIN,
        _MMP_HAM,
        _PH_DOCS,
        _ph_pixel,
    )

    rows = REGISTRY["mm_curation_pipeline_e2e"].fn(spark, sf_dir).collect()

    # python replay: pixel sums -> quality -> bands -> pairs -> drops
    def bands_of(doc):
        from s3spark.queries.multimodal import _dhash_bands

        px = bytearray(
            _ph_pixel(x, y, doc) for y in range(16) for x in range(16)
        )
        return _dhash_bands(px, 16)

    sums = {
        d: sum(_ph_pixel(x, y, d) for x in range(16) for y in range(16))
        for d in range(_PH_DOCS)
    }
    quality = [d for d in range(_PH_DOCS) if sums[d] >= _MMC_QMIN]
    assert 0 < len(quality) < _PH_DOCS  # the gate actually bites
    sig = {d: bands_of(d) for d in quality}
    pairs = [
        (a, b)
        for i, a in enumerate(quality)
        for b in quality[i + 1 :]
        if any(sig[a][k] == sig[b][k] for k in range(4))
        and sum(bin(sig[a][k] ^ sig[b][k]).count("1") for k in range(4))
        <= _MMP_HAM
    ]
    dropped = {b for _, b in pairs}
    survivors = [d for d in quality if d not in dropped]
    assert sum(r.n_docs for r in rows) == len(survivors)
    # the manifest carries absorbed counts for SURVIVING absorbers
    # only — a doc that is itself absorbed takes its count with it
    assert sum(r.n_absorbed for r in rows) == sum(
        1 for a, _ in pairs if a not in dropped
    )

    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, bins in by_shard.items():
        bins.sort(key=lambda r: r.bin)
        assert [r.bin for r in bins] == list(range(len(bins))), shard
        # greedy packing: bin k's docs all START before boundary
        # (k+1)*budget, so cumulative pixels THROUGH bin k must exceed
        # k*budget whenever a bin k+1 exists
        cum = 0
        for r in bins[:-1]:
            cum += r.bin_pixels
            assert cum > (r.bin + 1) * _MMC_BUDGET - _MMC_BUDGET, shard
            assert cum >= r.bin * _MMC_BUDGET, shard


def test_avi_codec_roundtrip_kernel():
    """The AVI encode/decode pair is a real demuxer: header-declared
    geometry honored, bottom-up DIB rows flipped, stride unpadded,
    frame count verified, pixels match the generator exactly."""
    from s3spark.queries.multimodal import (
        _VID_SEG,
        _decode_avi,
        _encode_avi,
        _vid_frames,
        _vid_pixel,
    )

    for doc_id in (0, 3, 149):
        w, h, frames = _decode_avi(_encode_avi(doc_id))
        assert (w, h) == (16, 16)
        assert len(frames) == _vid_frames(doc_id)
        for t, px in enumerate(frames):
            scene = t // _VID_SEG
            assert list(px) == [
                _vid_pixel(x, y, scene, doc_id)
                for y in range(h)
                for x in range(w)
            ]


def test_avi_decoder_rejects_corruption():
    from s3spark.queries.multimodal import _decode_avi, _encode_avi

    good = _encode_avi(5)
    with pytest.raises(ValueError, match="magic"):
        _decode_avi(b"JUNK" + good[4:])
    # drop the last movi frame chunk (before idx1): count mismatch
    idx_at = good.rindex(b"idx1")
    movi_at = good.rindex(b"movi")
    last_frame_at = good.rindex(b"00db", movi_at, idx_at)
    truncated = good[:last_frame_at] + good[idx_at - 8 :]
    # re-patching RIFF/LIST sizes is beside the point — the demuxer
    # must fail loudly one way or another, never return short
    with pytest.raises(ValueError):
        _decode_avi(truncated)


def test_avi_decoder_undersized_headers_raise_valueerror():
    """Round-12 ADVICE: an avih/strf chunk shorter than its fixed
    header struct must honor the documented ValueError contract, not
    leak struct.error from the unpack."""
    import struct as _st

    from s3spark.queries.multimodal import _decode_avi, _encode_avi

    good = _encode_avi(5)

    def shrink(tag: bytes) -> bytes:
        at = good.index(tag)
        (size,) = _st.unpack("<I", good[at + 4 : at + 8])
        short = 8  # fewer bytes than either header struct needs
        body = good[at + 8 : at + 8 + short]
        cut = good[: at + 4] + _st.pack("<I", short) + body + good[
            at + 8 + size + (size % 2) :
        ]
        # outer RIFF size now overstates the payload; the walk guard
        # catches that as ValueError too — either path satisfies the
        # contract, but neither may raise struct.error
        return cut

    for tag in (b"avih", b"strf"):
        with pytest.raises(ValueError):
            _decode_avi(shrink(tag))


def test_video_temporal_dedup_keeps_scene_starts(spark, sf_dir):
    """Frames inside a scene are byte-identical, so the lag-window
    dedup must (a) always keep frame 0, (b) never keep a mid-scene
    frame, (c) keep at most one frame per scene."""
    from s3spark.queries.multimodal import _VID_SEG, _vid_frames

    rows = REGISTRY["mm_frame_sample_video"].fn(spark, sf_dir).collect()
    assert rows, "no frames survived dedup"
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_no)
        assert r.frame_no % _VID_SEG == 0, (
            f"kept a mid-scene frame {r.frame_no} of doc {r.doc_id}"
        )
        assert r.n_frames == _vid_frames(r.doc_id)
    for doc_id, kept in by_doc.items():
        assert 0 in kept, f"doc {doc_id} lost its first frame"
        assert len(kept) == len(set(kept))


def test_video_phash_dedup_finds_exactly_the_planted_program_pairs(
    spark, sf_dir
):
    """Videos sharing a program are planted near-dups (max frame
    hamming 2 by construction); cross-program frames share no exact
    band.  The detector must return exactly the planted pair set."""
    from s3spark.queries.multimodal import _VP_DOCS, _VP_PROGRAMS

    rows = REGISTRY["mm_video_phash_dedup"].fn(spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b) for r in rows}
    planted = {
        (a, b)
        for a in range(_VP_DOCS)
        for b in range(a + 1, _VP_DOCS)
        if a % _VP_PROGRAMS == b % _VP_PROGRAMS
    }
    assert got == planted
    for r in rows:
        assert r.max_scene_hamming <= 2
        assert r.n_scenes >= 3
