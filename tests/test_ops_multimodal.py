"""Multimodal plumbing tests: schemas, batch shapes, partition behavior.
Codec work is stubbed (no image/audio libs in this container); the Spark
contract around it is real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kg.ops.multimodal import (
    FEATURE_DIM,
    decode_media,
    real_decode,
    sample_frames,
    synthetic_media,
)


def test_media_schema_and_determinism(spark):
    a = synthetic_media(spark, 20).collect()
    b = synthetic_media(spark, 20).collect()
    assert sorted(r.media_id for r in a) == list(range(20))
    am = {r.media_id: bytes(r.data) for r in a}
    bm = {r.media_id: bytes(r.data) for r in b}
    assert am == bm
    kinds = {r.kind for r in a}
    assert kinds == {"image", "audio", "video"}


def test_decode_shapes(spark):
    out = decode_media(synthetic_media(spark, 30)).collect()
    assert len(out) == 30
    for r in out:
        assert len(r.feature) == FEATURE_DIM
        if r.kind == "image":
            assert r.n_frames == 1 and r.width > 0
        if r.kind == "video":
            assert r.n_frames >= 1 and r.duration_ms > 0


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode("image", b"\x00")


def test_frame_sampling_plan(spark):
    decoded = decode_media(synthetic_media(spark, 30))
    frames = sample_frames(decoded, every_n=7)
    rows = frames.collect()
    assert all(r.frame_idx % 7 == 0 for r in rows)
    nf = {r.media_id: r.n_frames for r in decoded.filter("kind='video'").collect()}
    counts = (
        frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    )
    for r in counts:
        expect = (nf[r.media_id] - 1) // 7 + 1
        assert r.n == expect


def test_media_from_ids_payload_is_hex_ascii_and_deterministic(spark):
    import hashlib

    from kg.ops.multimodal import media_from_ids

    ids = spark.createDataFrame([(5,), (6,), (7,)], "doc_id long")
    rows = {r.media_id: r for r in media_from_ids(ids).collect()}
    assert set(rows) == {5, 6, 7}
    for i, r in rows.items():
        hx = hashlib.sha256(f"media:{i}".encode()).hexdigest()
        assert bytes(r.data) == (hx * (4 + i % 5)).encode("ascii")
        assert r.kind == ["image", "audio", "video"][i % 3]
    # decode chain: hand-compute the fake codec on the hex payload
    from kg.ops.multimodal import decode_media

    dec = {r.media_id: r for r in decode_media(media_from_ids(ids)).collect()}
    h = hashlib.sha256(bytes(rows[6].data)).digest()
    assert dec[6].kind == "image"
    assert dec[6].width == 64 + h[0] % 192
    assert dec[6].n_frames == 1 and dec[6].duration_ms == 0
