"""Baseline JFIF codec (functions/jpeg.py): round-trip fidelity, marker
structure, subset validation, and registry wiring. Pure numpy — no Spark
session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawlspark.functions import images as I
from crawlspark.functions.jpeg import decode_jpeg, encode_jpeg


def _markers(data: bytes) -> list[int]:
    """Top-level marker sequence up to (and including) SOS."""
    assert data[:2] == b"\xff\xd8"
    out, pos = [0xD8], 2
    while pos < len(data):
        assert data[pos] == 0xFF
        m = data[pos + 1]
        out.append(m)
        if m == 0xDA:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        pos += 2 + ln
    return out


@pytest.mark.parametrize("wh", [(8, 8), (16, 16), (24, 32), (20, 13), (7, 5)])
def test_jpeg_roundtrip_shapes(wh):
    w, h = wh
    px = I.pixels_for_id(f"rt{w}x{h}", w, h)
    rec = decode_jpeg(encode_jpeg(px, 95))
    assert rec.shape == (h, w, 3)
    assert I.psnr(px, rec) >= 30.0


def test_jpeg_quality_ladder_and_gate():
    px = I.pixels_for_id("ladder", 24, 24)
    p = [I.psnr(px, decode_jpeg(encode_jpeg(px, q))) for q in (50, 75, 90, 98)]
    assert p == sorted(p)            # monotone in quality
    assert p[-1] >= 40.0             # the input_hint lossy gate at q98
    sizes = [len(encode_jpeg(px, q)) for q in (50, 90, 98)]
    assert sizes == sorted(sizes)    # rate grows with quality


def test_jpeg_marker_structure():
    data = encode_jpeg(I.pixels_for_id("mk", 16, 16), 90)
    ms = _markers(data)
    assert ms[:2] == [0xD8, 0xE0]                 # SOI, APP0/JFIF
    assert ms.count(0xDB) == 2 and ms.count(0xC4) == 4
    assert 0xC0 in ms and ms[-1] == 0xDA
    assert data.endswith(b"\xff\xd9")
    # entropy stream has no bare 0xFF (byte stuffing)
    scan = data[data.index(b"\xff\xda") :][: -2]
    i = scan.index(b"\x00", 2)  # skip into scan body
    for j in range(i, len(scan) - 1):
        if scan[j] == 0xFF:
            assert scan[j + 1] in (0x00,), "unstuffed 0xFF in scan"


def test_jpeg_deterministic():
    px = I.pixels_for_id("det", 16, 16)
    assert encode_jpeg(px, 90) == encode_jpeg(px, 90)


def test_jpeg_flat_and_extremes():
    for v in (0, 128, 255):
        flat = np.full((16, 16, 3), v, np.uint8)
        rec = decode_jpeg(encode_jpeg(flat, 90))
        assert np.abs(rec.astype(int) - v).max() <= 5


def test_jpeg_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")                  # no SOI
    data = bytearray(encode_jpeg(I.pixels_for_id("x", 8, 8), 90))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2                            # pretend progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_jpeg_registry_and_lossy_gate():
    px = I.pixels_for_id("reg", 16, 16)
    data = I.encode_image(px, "jpeg")
    rec = I.decode_image(data, "jpeg", 16, 16)
    assert "jpeg" in I.LOSSY_FMTS
    assert I.psnr(px, rec) >= 40.0
    with pytest.raises(ValueError):
        I.decode_image(data, "jpeg", 8, 8)        # metadata dim mismatch
