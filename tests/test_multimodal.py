"""Multimodal plumbing: binary columns, typed metadata, mapInPandas
batch shapes. Decode kernels are deterministic fakes (real codecs not
in this container) — marked stubs raise NotImplementedError."""

from __future__ import annotations

import hashlib

import pytest

from rag_system_vector_db_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return M.synthesize_media(docs)


def test_media_schema(media):
    assert media.schema["content"].dataType.typeName() == "binary"
    meta = media.schema["meta"].dataType
    assert [f.name for f in meta.fields] == ["width", "height", "duration_ms", "codec"]
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"}


def test_extract_features_deterministic(media, spark, sf_dir):
    out = M.extract_features(media).collect()
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert len(out) == len(docs)
    for r in out[:10]:
        raw = docs[r.media_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.content_md5 == hashlib.md5(raw).hexdigest()
        assert len(r.features) == 8
        assert all(0.0 <= x <= 1.0 for x in r.features)


def test_frame_sample_only_video(media):
    frames = M.frame_sample(media)
    rows = frames.collect()
    assert rows, "expected at least one video frame"
    video_ids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in rows} <= video_ids
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_no)
    for frames_nos in per.values():
        assert sorted(frames_nos) == list(range(len(frames_nos)))  # contiguous


def test_stubs_raise(media):
    with pytest.raises(NotImplementedError):
        M.resize_stub(media, 64, 64)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG")
