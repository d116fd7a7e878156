"""Multimodal binary-column plumbing: metadata, fake decode, frames."""

import hashlib

import numpy as np
import pytest

from ophois_spark.operators.multimodal import (
    FRAME_BYTES,
    decode_audio,
    decode_image,
    media_features,
    media_from_documents,
    media_metadata,
    sample_frames,
)

DOCS = [
    (0, "hello world"),
    (1, "the quick brown fox"),
    (2, "du hast mich gefragt"),
    (5, "le chat est sur la table"),
    (8, ""),
]


def _payload(doc_id: int, text: str) -> bytes:
    return (hashlib.md5(text.encode()).hexdigest() * (1 + doc_id % 7)).encode()


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return media_from_documents(docs).cache()


def test_media_payload_and_type(media):
    rows = {r.doc_id: r for r in media.collect()}
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"
    for doc_id, text in DOCS:
        assert bytes(rows[doc_id].payload) == _payload(doc_id, text)


def test_media_metadata(media):
    rows = {r.doc_id: r for r in media_metadata(media).collect()}
    for doc_id, text in DOCS:
        p = _payload(doc_id, text)
        assert rows[doc_id].n_bytes == len(p)
        assert rows[doc_id].checksum == hashlib.md5(p).hexdigest()


def test_media_features_match_local_decode(media):
    rows = {r.doc_id: r for r in media_features(media).collect()}
    for doc_id, text in DOCS:
        buf = np.frombuffer(_payload(doc_id, text), dtype=np.uint8)
        r = rows[doc_id]
        assert r.width == 1 + int(buf[0]) % 64
        assert r.height == 1 + int(buf[1]) % 64
        assert r.mean_val == float(buf[::4].astype(np.float64).mean())


def test_sample_frames(media):
    out = sample_frames(media, every=3).collect()
    assert out, "video docs must produce frames"
    by_doc: dict[int, list] = {}
    for r in out:
        assert r.frame_idx % 3 == 0
        assert r.byte_off == r.frame_idx * FRAME_BYTES
        by_doc.setdefault(r.doc_id, []).append(r)
    # only video-typed docs (doc_id % 3 == 2) appear
    assert set(by_doc) == {d for d, _ in DOCS if d % 3 == 2}
    for doc_id, rows in by_doc.items():
        text = dict(DOCS)[doc_id]
        p = _payload(doc_id, text)
        n_frames = len(p) // FRAME_BYTES
        assert sorted(r.frame_idx for r in rows) == list(range(0, n_frames, 3))
        for r in rows:
            frame = p[r.byte_off : r.byte_off + FRAME_BYTES]
            assert r.frame_sig == hashlib.md5(frame).hexdigest()


def test_real_decoders_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_resize_media_dims_and_signature(spark):
    from ophois_spark.operators.multimodal import media_from_documents, resize_media
    import hashlib

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in resize_media(media_from_documents(docs)).collect()}
    assert set(rows) == {1, 2}  # NULL text dropped at the media source
    for did, text in [(1, "alpha"), (2, "beta")]:
        payload = (hashlib.md5(text.encode()).hexdigest() * (1 + did % 7)).encode()
        r = rows[did]
        assert r["width"] == 1 + payload[0] % 64
        assert r["height"] == 1 + payload[1] % 64
        assert r["resized_w"] == max(1, r["width"] // 2)
        assert r["resized_h"] == max(1, r["height"] // 2)
        assert r["resized_sig"] == hashlib.md5(payload[::2]).hexdigest()
