"""Image payload operators — numpy-only codecs + perceptual hash + PSNR.

The corpus (BASELINE.json input_hint) carries image payloads as
``bytes:binary`` with ``fmt`` ∈ {raw, ppm, bmp, png, jpeg_sim} plus a
precomputed ``phash:int64``. The engine must decode the pixels, reproduce
``phash``, and validate payloads (PSNR >= 40 dB for the lossy format,
exact for lossless; captions byte-equal).

No Pillow/image libs in the sandbox, so codecs are implemented directly
(PPM-P6 / 24-bit BMP / zlib PNG / raw / a quantization-based "jpeg_sim"
lossy stand-in whose step-4 quantization yields PSNR ≈ 46 dB — exercising
the lossy path deterministically / REAL baseline JFIF "jpeg" via the pure
numpy DCT+Huffman codec in functions/jpeg.py, default quality 98 → PSNR
≥ 43 dB on corpus fields). All Spark-side use is via Arrow pandas UDFs
over ``mapInPandas`` — batch shape real, per-row Python never touches
the JVM boundary.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

LOSSY_FMTS = {"jpeg_sim", "jpeg"}
JPEG_SIM_QSTEP = 4  # quantization step → MSE≈q²/12 → PSNR≈46.9 dB


# ---------------------------------------------------------------------------
# encoders (used by the corpus generator) + decoders (used by the engine)
# ---------------------------------------------------------------------------

def encode_raw(px: np.ndarray) -> bytes:
    return px.astype(np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def decode_ppm(data: bytes, w: int, h: int) -> np.ndarray:
    # header: P6\n<w> <h>\n255\n
    nl = 0
    pos = 0
    while nl < 3:
        if data[pos : pos + 1] == b"\n":
            nl += 1
        pos += 1
    return np.frombuffer(data[pos:], dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(px: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB BMP: bottom-up rows, BGR, 4-byte row padding."""
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    bgr = px[:, :, ::-1].astype(np.uint8)
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + b"\x00" * pad
    size = 54 + len(body)
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", size, 0, 0, 54, 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
    )
    return header + bytes(body)


def decode_bmp(data: bytes, w: int, h: int) -> np.ndarray:
    offset = struct.unpack("<I", data[10:14])[0]
    row = w * 3
    pad = (4 - row % 4) % 4
    stride = row + pad
    arr = np.frombuffer(data[offset : offset + stride * h], dtype=np.uint8)
    arr = arr.reshape(h, stride)[:, :row].reshape(h, w, 3)
    return arr[::-1, :, ::-1].copy()  # bottom-up BGR → top-down RGB


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes, w: int, h: int) -> np.ndarray:
    """Minimal PNG reader for our encoder's output (8-bit RGB, filter 0/1/2)."""
    pos = 8
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = w * 3 + 1
    out = np.zeros((h, w * 3), dtype=np.uint8)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype, scan = line[0], np.frombuffer(line[1:], dtype=np.uint8)
        if ftype == 0:
            out[y] = scan
        elif ftype == 1:  # Sub
            cur = scan.astype(np.int32).reshape(w, 3)
            acc = np.cumsum(cur, axis=0) % 256  # not exact for Sub; our encoder never emits 1
            out[y] = acc.reshape(-1).astype(np.uint8)
        elif ftype == 2:  # Up
            out[y] = (scan.astype(np.int32) + out[y - 1].astype(np.int32)) % 256
        else:  # pragma: no cover - encoder emits filter 0 only
            raise ValueError(f"unsupported PNG filter {ftype}")
    return out.reshape(h, w, 3)


def encode_jpeg_sim(px: np.ndarray) -> bytes:
    """Lossy stand-in: quantize to step-4 mid-rise, store as raw bytes."""
    q = JPEG_SIM_QSTEP
    quant = (px.astype(np.int32) // q) * q + q // 2
    return np.clip(quant, 0, 255).astype(np.uint8).tobytes()


decode_jpeg_sim = decode_raw


def encode_jpeg(px: np.ndarray) -> bytes:
    """Real baseline JFIF (functions/jpeg.py), quality 98 — clears the
    input_hint's PSNR >= 40 dB lossy gate with margin on corpus fields."""
    from crawlspark.functions import jpeg as J

    return J.encode_jpeg(px, quality=98)


def decode_jpeg(data: bytes, w: int, h: int) -> np.ndarray:
    from crawlspark.functions import jpeg as J

    px = J.decode_jpeg(data)
    if px.shape[:2] != (h, w):
        raise ValueError(f"jpeg dims {px.shape[:2]} != metadata {(h, w)}")
    return px


ENCODERS = {
    "raw": encode_raw,
    "ppm": encode_ppm,
    "bmp": encode_bmp,
    "png": encode_png,
    "jpeg_sim": encode_jpeg_sim,
    "jpeg": encode_jpeg,
}
DECODERS = {
    "raw": decode_raw,
    "ppm": decode_ppm,
    "bmp": decode_bmp,
    "png": decode_png,
    "jpeg_sim": decode_jpeg_sim,
    "jpeg": decode_jpeg,
}


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    return DECODERS[fmt](data, w, h)


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    return ENCODERS[fmt](px)


# ---------------------------------------------------------------------------
# fingerprint + fidelity
# ---------------------------------------------------------------------------

def average_hash64(px: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 block means → threshold at the
    global mean → row-major bits (bit 63 = block (0,0)). Signed int64 so it
    round-trips a Spark ``long`` column."""
    h, w, _ = px.shape
    gray = px.astype(np.float64).mean(axis=2)
    bh, bw = h // 8, w // 8
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (blocks > blocks.mean()).reshape(-1)
    v = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            v |= np.uint64(1) << np.uint64(63 - i)
    return int(v.astype(np.int64))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def pixels_for_id(image_id: str, w: int, h: int) -> np.ndarray:
    """The corpus ground-truth pixel field: smooth deterministic gradients
    keyed by image_id (smooth so jpeg_sim quantization stays near-invertible
    and average-hash blocks are non-degenerate)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    fx, fy, ph = rng.uniform(0.5, 4.0, 3)
    amp = rng.uniform(60, 120)
    base = rng.uniform(60, 180, 3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    field = np.sin(2 * np.pi * (fx * xx / w + fy * yy / h) + ph)
    noise = rng.integers(-12, 13, size=(h, w, 3))
    px = base[None, None, :] + amp * field[:, :, None] + noise
    return np.clip(px, 0, 255).astype(np.uint8)
