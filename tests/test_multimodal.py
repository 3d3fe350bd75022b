"""Multimodal payload ops: nearest-neighbor resize, raw-video frame
sampling, PCM audio features — real numpy kernels verified exactly;
codec decodes stubbed with NotImplementedError (task brief)."""

from __future__ import annotations

import numpy as np
import pytest

from crawlspark.functions import images as I
from crawlspark.operators import multimodal as MM


def test_resize_nearest_exact_mapping():
    px = I.pixels_for_id("imgX", 16, 16)
    small = MM.resize_nearest(px, 8, 8)
    assert small.shape == (8, 8, 3)
    ys = (np.arange(8) * 16 // 8).clip(0, 15)
    assert np.array_equal(small, px[ys[:, None], ys[None, :]])
    # upscale round-trips exactly for integer ratios
    up = MM.resize_nearest(small, 16, 16)
    assert np.array_equal(MM.resize_nearest(up, 8, 8), small)


def test_resize_images_spark(spark):
    rows = []
    for i in range(4):
        px = I.pixels_for_id(f"img{i}", 16, 16)
        rows.append((f"img{i}", I.encode_image(px, "png"), 16, 16, "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["image_id"]: r for r in MM.resize_images(df, 8, 8).collect()}
    for i in range(4):
        px = I.pixels_for_id(f"img{i}", 16, 16)
        small = MM.resize_nearest(px, 8, 8)
        r = got[f"img{i}"]
        assert bytes(r["bytes"]) == small.tobytes()
        assert r["phash"] == I.average_hash64(small)


def test_video_roundtrip_and_sampling(spark):
    data = MM.make_video_bytes("vid1", 8, 8, 5)
    w, h, frames = MM.decode_video(data)
    assert (w, h, len(frames)) == (8, 8, 5)
    assert np.array_equal(frames[3], I.pixels_for_id("vid1:f3", 8, 8))
    with pytest.raises(NotImplementedError):
        MM.decode_video(b"\x00\x00\x00\x01h264...")

    df = spark.createDataFrame([("vid1", data)], "video_id string, bytes binary")
    got = MM.sample_frames(df, every_k=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got] == [0, 2, 4]
    assert got[1]["frame_phash"] == I.average_hash64(frames[2])


def test_audio_features_exact(spark):
    pcm = MM.waveform_for_id("audA")
    f64 = pcm.astype(np.float64)
    want_rms = round(float(np.sqrt(np.mean(f64**2))), 4)
    want_zc = int(np.count_nonzero(np.diff(np.signbit(f64))))
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"ID3", "mp3")

    df = spark.createDataFrame(
        [("audA", pcm.tobytes(), "pcm16")], "audio_id string, bytes binary, fmt string"
    )
    r = MM.audio_features(df).collect()[0]
    assert r["n_samples"] == len(pcm)
    assert r["rms"] == want_rms
    assert r["zero_crossings"] == want_zc
    assert r["peak"] == int(np.abs(f64).max())
