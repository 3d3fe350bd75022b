"""Codec round-trips, phash determinism, PSNR bounds (payload layer)."""

from __future__ import annotations

import numpy as np

from crawlspark.functions import images as I


def test_lossless_roundtrip():
    px = I.pixels_for_id("img00000001", 32, 16)
    for fmt in ("raw", "ppm", "bmp", "png"):
        data = I.encode_image(px, fmt)
        back = I.decode_image(data, fmt, 32, 16)
        assert np.array_equal(px, back), fmt


def test_jpeg_sim_psnr_above_40():
    px = I.pixels_for_id("img00000002", 32, 32)
    back = I.decode_image(I.encode_image(px, "jpeg_sim"), "jpeg_sim", 32, 32)
    p = I.psnr(px, back)
    assert 40.0 <= p < 60.0, p


def test_average_hash_deterministic_and_discriminative():
    a = I.average_hash64(I.pixels_for_id("img00000003", 16, 16))
    b = I.average_hash64(I.pixels_for_id("img00000003", 16, 16))
    c = I.average_hash64(I.pixels_for_id("img00000999", 16, 16))
    assert a == b
    assert a != c
    assert np.int64(a) is not None  # fits signed 64


def test_pixels_for_id_stable():
    a = I.pixels_for_id("imgX", 16, 16)
    b = I.pixels_for_id("imgX", 16, 16)
    assert np.array_equal(a, b)
