"""Multimodal plumbing: schema, Arrow batch shape, deterministic fakes."""

from __future__ import annotations

import pytest

from find_that_charity_spark.operators.multimodal import (
    FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "https://a/x.jpg", "image", b"\x89PNGfakebytes" * 50, 640, 480, None),
        (2, "https://a/y.wav", "audio", b"RIFFfakeaudio" * 80, None, None, 3000),
        (3, "https://a/z.mp4", "video", bytes(i % 251 for i in range(2600)), 1280, 720, 10000),
        (4, "https://a/empty.jpg", "image", None, None, None, None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(2)


def test_extract_features_shape(spark, media):
    out = extract_features(media, dim=16)
    assert out.schema == FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(len(r["feature"]) == 16 for r in rows.values())
    assert rows[1]["n_bytes"] == 13 * 50
    assert rows[4]["n_bytes"] == 0


def test_features_deterministic(spark, media):
    a = {r["media_id"]: list(r["feature"]) for r in extract_features(media, dim=8).collect()}
    b = {r["media_id"]: list(r["feature"]) for r in extract_features(media, dim=8).collect()}
    assert a == b
    assert a[1] != a[2]  # content-derived, not constant


def test_fake_disallowed_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        extract_features(media, deterministic_fake=False).collect()


def test_sample_frames(spark, media):
    out = sample_frames(media, every_n=100, max_frames=4).collect()
    assert {r["media_id"] for r in out} == {3}  # only video rows
    frames = sorted(r["frame_no"] for r in out)
    assert frames == list(range(len(frames)))
    assert len({r["frame_sha"] for r in out}) == len(out)
