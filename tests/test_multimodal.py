"""Multimodal plumbing: schema, mapInPandas batch shape, deterministic
fake decode, per-item error isolation, frame sampling, resize plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parsedmarc_go_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    frame_sample,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG fake payload 1", {"src": "a"}),
        (2, "image", "image/png", b"\x89PNG fake payload 2", {"src": "b"}),
        (3, "video", "video/mp4", b"\x00\x00\x00 ftypmp42 fake", {}),
        (4, "audio", "audio/wav", b"RIFF fake wav", {}),
        (5, "image", None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_deterministic(spark, media):
    a = {r.media_id: (r.width, r.height, tuple(r.feature)) for r in decode_media(media).collect()}
    b = {r.media_id: (r.width, r.height, tuple(r.feature)) for r in decode_media(media).collect()}
    assert a == b
    assert len(a) == 5
    for _, (w, h, feat) in a.items():
        assert w >= 64 and h >= 64
        assert len(feat) == FEATURE_DIM
        norm = sum(x * x for x in feat) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_decode_error_isolation(spark, media):
    def flaky(payload: bytes, kind: str) -> dict:
        if kind == "audio":
            raise ValueError("codec exploded")
        from parsedmarc_go_spark.operators.multimodal import _fake_decode

        return _fake_decode(payload, kind)

    rows = {r.media_id: r for r in decode_media(media, decode_fn=flaky).collect()}
    assert rows[4].error == "codec exploded" and rows[4].width is None
    assert rows[1].error is None and rows[1].width is not None


def test_decode_stub_raises(spark, media):
    with pytest.raises(NotImplementedError):
        decode_media(media, decode_fn=NotImplemented)


def test_frame_sample(spark, media):
    decoded = decode_media(media)
    frames = frame_sample(decoded, every_n=10).collect()
    n_frames = {r.media_id: r.n_frames for r in decoded.collect()}[3]
    expected = len(range(0, n_frames, 10))
    got = [r.frame_idx for r in frames if r.media_id == 3]
    assert len(got) == expected
    assert all(r.media_id == 3 for r in frames)  # only the video row


def test_resize_plan(spark, media):
    plans = {r.media_id: r for r in resize_plan(decode_media(media), max_side=256).collect()}
    for r in plans.values():
        assert max(r.target_width, r.target_height) <= 256
        # aspect ratio preserved within rounding
        if r.width >= r.height:
            assert r.target_width >= r.target_height
        else:
            assert r.target_height >= r.target_width
