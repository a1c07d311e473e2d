"""Multimodal pipeline: REAL container decode (PPM/WAV/Y4M, pure
NumPy/struct), content featurization, resize, frame sampling;
compressed formats are honestly gated behind PIL."""

from __future__ import annotations

import numpy as np
import pytest

from clann_spark.operators.multimodal import (
    WAV_RATE,
    _decode_any,
    decode_and_featurize,
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_ppm,
    encode_wav,
    encode_y4m,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=60).cache()


def test_codec_roundtrips():
    px = (np.arange(48 * 32 * 3, dtype=np.int64) % 256).reshape(48, 32, 3).astype(np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()

    s = (np.sin(np.arange(4000) / 7.0) * 20000).astype(np.int16)
    got, rate = decode_wav(encode_wav(s))
    assert rate == WAV_RATE and (got == s).all()

    frames = (np.arange(3 * 24 * 32, dtype=np.int64) % 256).reshape(3, 24, 32).astype(np.uint8)
    luma, w, h, fps = decode_y4m(encode_y4m(frames))
    assert (w, h, fps) == (32, 24, 4) and (luma == frames).all()


def test_decode_and_featurize(spark, media):
    out = decode_and_featurize(media).collect()
    assert len(out) == 60
    by_id = {r["media_id"]: r for r in out}
    for r in media.collect():
        d = by_id[r["media_id"]]
        if r["kind"] in ("image", "video"):
            # dims come from the DECODED payload, matching the metadata
            assert (d["width"], d["height"]) == (r["width"], r["height"])
        assert d["n_bytes"] == len(r["payload"])
        assert len(d["features"]) == 16
    # audio features carry the real sample rate parsed from the header
    audio = next(r for r in media.collect() if r["kind"] == "audio")
    assert by_id[audio["media_id"]]["features"][2] == float(WAV_RATE)


def test_featurize_deterministic(spark, media):
    a = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    b = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    assert a == b


def test_resize_real_pixels(spark, media):
    out = resize_images(media, max_side=32).collect()
    assert len(out) == media.where("kind = 'image'").count()
    originals = {r["media_id"]: bytes(r["payload"]) for r in media.where("kind='image'").collect()}
    for r in out:
        assert max(r["width"], r["height"]) <= 32
        px = decode_ppm(bytes(r["payload"]))
        assert px.shape == (r["height"], r["width"], 3)
        # nearest-neighbor: every resized pixel exists in the source
        src = decode_ppm(originals[r["media_id"]])
        assert (px[0, 0] == src[0, 0]).all()


def test_frame_sampling_counts(spark, media):
    frames = sample_frames(media, every_ms=500).collect()
    vids = {r["media_id"]: r for r in media.where("kind='video'").collect()}
    by_vid = {}
    for f in frames:
        by_vid.setdefault(f["media_id"], []).append(f)
    assert set(by_vid) == set(vids)
    for mid, fs in by_vid.items():
        dur = vids[mid]["duration_ms"]
        want = len(range(0, max(1, dur), 500))
        assert len(fs) == want
        # fps=4, sampled every 500 ms -> frame indices 0, 2, 4, ...
        assert sorted(f["frame_idx"] for f in fs) == [2 * j for j in range(want)]
        # frame payload is the raw luma plane
        w, h = vids[mid]["width"], vids[mid]["height"]
        assert all(len(bytes(f["frame"])) == w * h for f in fs)


def test_compressed_format_raises_cleanly():
    with pytest.raises(NotImplementedError, match="PIL"):
        _decode_any("image", b"\x89PNG\r\n\x1a\n....")
