"""Multimodal plumbing: schemas, batch shapes, explode semantics,
determinism; decode stub raises cleanly on non-fixture payloads."""

from __future__ import annotations

import pytest

from clann_spark.operators.multimodal import (
    decode_and_featurize,
    fake_payload,
    sample_frames,
    resize_images,
    synthesize_media,
    _decode_header,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=60).cache()


def test_decode_and_featurize(spark, media):
    out = decode_and_featurize(media).collect()
    assert len(out) == 60
    by_id = {r["media_id"]: r for r in out}
    for r in media.collect():
        d = by_id[r["media_id"]]
        assert (d["width"], d["height"]) == (r["width"], r["height"])
        assert len(d["features"]) == 16
        assert abs(sum(x * x for x in d["features"]) - 1.0) < 1e-5


def test_featurize_deterministic(spark, media):
    a = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    b = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    assert a == b


def test_resize_caps_dims(spark, media):
    out = resize_images(media, max_side=32).collect()
    assert len(out) == media.where("kind = 'image'").count()
    for r in out:
        assert max(r["width"], r["height"]) <= 32
        # re-headered payload still decodes to the new dims
        w, h, _ = _decode_header(bytes(r["payload"]))
        assert (w, h) == (r["width"], r["height"])


def test_frame_sampling_counts(spark, media):
    frames = sample_frames(media, every_ms=500).collect()
    vids = {r["media_id"]: r["duration_ms"] for r in media.where("kind='video'").collect()}
    by_vid = {}
    for f in frames:
        by_vid.setdefault(f["media_id"], []).append(f)
    assert set(by_vid) == set(vids)
    for mid, fs in by_vid.items():
        want = len(range(0, max(1, vids[mid]), 500))
        assert len(fs) == want
        assert sorted(f["frame_idx"] for f in fs) == list(range(want))


def test_real_format_raises_cleanly():
    with pytest.raises(NotImplementedError, match="real media decoding"):
        _decode_header(b"\x89PNG\r\n\x1a\n....")
