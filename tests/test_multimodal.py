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


def test_mjpeg_roundtrip_and_sampling(spark):
    # Motion-JPEG: concatenated baseline JFIF frames, split on EOI and
    # decoded by the real pure-numpy codec — PSNR per frame ≥ 40 dB
    data = MM.make_mjpeg_bytes("vidM", 8, 8, 5)
    assert data[:2] == b"\xff\xd8"
    assert len(MM._split_mjpeg(data)) == 5
    w, h, frames = MM.decode_video(data)
    assert (w, h, len(frames)) == (8, 8, 5)
    for i in range(5):
        src = I.pixels_for_id(f"vidM:f{i}", 8, 8).astype(np.float64)
        got = frames[i].astype(np.float64)
        mse = np.mean((src - got) ** 2)
        psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else 99.0
        assert psnr >= 40.0, (i, psnr)

    df = spark.createDataFrame([("vidM", data)], "video_id string, bytes binary")
    got_rows = MM.sample_frames(df, every_k=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got_rows] == [0, 2, 4]
    assert got_rows[1]["frame_phash"] == I.average_hash64(frames[2])


def test_ulaw_roundtrip():
    # exact segment-table spot checks (G.711 decode values)
    assert MM.ulaw_decode(MM.ulaw_encode(np.array([0], dtype=np.int16)))[0] in (0, 4)
    # all-int16 sweep: companding error bounded by half the local step
    # (≤ 16 below the bias knee, ≤ 512 in the top segment) and signs kept
    x = np.arange(-32768, 32768, dtype=np.int16)
    y = MM.ulaw_decode(MM.ulaw_encode(x)).astype(np.int32)
    err = np.abs(y - np.clip(x.astype(np.int32), -32635, 32635))
    assert err.max() <= 512
    small = np.abs(x.astype(np.int32)) < 128
    assert err[small].max() <= 16
    assert np.all(np.sign(y[np.abs(x) > 1000]) == np.sign(x[np.abs(x) > 1000].astype(np.int32)))
    # SNR on the synthetic waveform: µ-law holds ~35+ dB at speech scale
    pcm = MM.waveform_for_id("audU").astype(np.float64)
    dec = MM.ulaw_decode(MM.ulaw_encode(pcm.astype(np.int16))).astype(np.float64)
    snr = 10 * np.log10(np.sum(pcm**2) / np.sum((pcm - dec) ** 2))
    assert snr >= 30.0, snr


def test_audio_features_ulaw_spark(spark):
    pcm = MM.waveform_for_id("audB")
    dec = MM.ulaw_decode(MM.ulaw_encode(pcm)).astype(np.float64)
    df = spark.createDataFrame(
        [("audB", MM.ulaw_encode(pcm), "ulaw")],
        "audio_id string, bytes binary, fmt string",
    )
    r = MM.audio_features(df).collect()[0]
    assert r["n_samples"] == len(pcm)
    assert r["rms"] == round(float(np.sqrt(np.mean(dec**2))), 4)
    assert r["peak"] == int(np.abs(dec).max())


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


def test_phash_neardup_matches_brute_force(spark):
    """The banded phash LSH pairs must equal the O(n^2) cross-join truth
    at Hamming <= 3 (recall is pigeonhole-exact with 4 bands), and the
    planted perceptual near-dups (doc_id % 4 == 1 re-encodes its
    predecessor's pixels) must actually be caught."""
    import pyspark.sql.functions as F

    import __spark_entry__ as E
    from crawlspark.functions.simhash import hamming64
    from crawlspark.operators import payload as P

    pages = E._synth_pages_with_dups(spark, "/root/testdata/sf0.001", n=120)
    ph = P.compute_phash(pages).persist()
    ph.count()
    got = {
        (r["id_a"], r["id_b"])
        for r in E.q_phash_neardup(spark, "/root/testdata/sf0.001").collect()
        if int(r["id_a"][3:]) < 120 and int(r["id_b"][3:]) < 120
    }
    a = ph.select(F.col("image_id").alias("id_a"), F.col("phash_computed").alias("pa"))
    b = ph.select(F.col("image_id").alias("id_b"), F.col("phash_computed").alias("pb"))
    truth = {
        (r["id_a"], r["id_b"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming64(F.col("pa"), F.col("pb")) <= 3)
        .collect()
    }
    ph.unpersist()
    assert got == truth
    planted = {(f"doc{k}", f"doc{k + 1}") for k in range(0, 119, 4)}
    found_planted = planted & truth
    # the one-pixel perturbation keeps most planted pairs within Hamming 3
    assert len(found_planted) >= len(planted) * 0.8


def test_adpcm_roundtrip_and_decode_path(spark):
    """IMA ADPCM: 4:1 compression, deterministic encode, SNR >= 20 dB on
    the synthetic corpus waveform (the codec's typical band), and the
    Spark decode path reports features consistent with the reconstructed
    (not the original) samples."""
    import numpy as np

    pcm = MM.waveform_for_id("aud_adpcm_t")
    enc = MM.adpcm_encode(pcm)
    assert enc == MM.adpcm_encode(pcm)  # deterministic
    assert abs(len(pcm) * 2 / len(enc) - 4.0) < 0.05  # ~4:1 vs int16
    dec = MM.adpcm_decode(enc)
    assert dec.shape == pcm.shape and dec.dtype == np.int16
    err = pcm.astype(np.float64) - dec.astype(np.float64)
    snr = 10 * np.log10(np.mean(pcm.astype(np.float64) ** 2) / np.mean(err**2))
    assert snr >= 20.0, snr
    # silence encodes/decodes clean
    z = MM.adpcm_decode(MM.adpcm_encode(np.zeros(64, dtype=np.int16)))
    assert np.abs(z.astype(np.int32)).max() <= 8
    df = spark.createDataFrame(
        [("audZ", enc, "adpcm")], "audio_id string, bytes binary, fmt string"
    )
    r = MM.audio_features(df).collect()[0]
    assert r["n_samples"] == len(pcm)
    assert r["peak"] == int(np.abs(dec.astype(np.int32)).max())
