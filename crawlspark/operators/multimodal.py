"""Multimodal payload operators beyond validation — resize, video
frame-sampling, audio feature extraction (training-data-pipeline ops).

Design rule (task brief): image/audio/video ride as opaque ``binary``
columns with typed metadata; every transform is an Arrow ``mapInPandas``
batch op with a real schema/partitioning story. The math that CAN be
real offline IS real: numpy resize, raw + Motion-JPEG video containers
(every MJPEG frame decoded by the pure-numpy JFIF codec in
functions/jpeg.py), PCM, G.711 µ-law and IMA ADPCM audio. Only codecs that
genuinely need external libraries (H.264/VP9 inter-frame video, MP3/AAC
perceptual audio) remain behind ``NotImplementedError`` with the
production swap point documented.

Synthetic payload twins (`make_video_bytes`, `waveform_for_id`) are
deterministic pure functions so tests verify outputs exactly.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from crawlspark.functions import images as I

# ---------------------------------------------------------------------------
# image resize
# ---------------------------------------------------------------------------

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("bytes", T.BinaryType()),  # raw RGB of the resized image
        T.StructField("phash", T.LongType()),
    ]
)


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 array — pure numpy
    index mapping (the real kernel; swap for a SIMD library in prod)."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys[:, None], xs[None, :]]


def resize_images(pages: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """(image_id, bytes, w, h, fmt) → resized raw-RGB payload + phash."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                px = I.decode_image(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                small = resize_nearest(px, out_w, out_h)
                rows.append(
                    (r.image_id, out_w, out_h, small.tobytes(), I.average_hash64(small))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "out_w", "out_h", "bytes", "phash"]
            )

    return pages.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        gen, _RESIZE_SCHEMA
    )


# ---------------------------------------------------------------------------
# video frame sampling (synthetic raw container; codec decode stubbed)
# ---------------------------------------------------------------------------

_VIDEO_MAGIC = b"CSV0"  # crawlspark-video-0: magic | w u16 | h u16 | n u16


def make_video_bytes(video_id: str, w: int, h: int, n_frames: int) -> bytes:
    """Deterministic synthetic 'video': header + n raw RGB frames, each
    frame a per-(video_id, idx) pseudo-random image."""
    out = [_VIDEO_MAGIC, w.to_bytes(2, "big"), h.to_bytes(2, "big"), n_frames.to_bytes(2, "big")]
    for i in range(n_frames):
        out.append(I.pixels_for_id(f"{video_id}:f{i}", w, h).tobytes())
    return b"".join(out)


def make_mjpeg_bytes(
    video_id: str, w: int, h: int, n_frames: int, quality: int = 98
) -> bytes:
    """Deterministic synthetic MJPEG elementary stream: each frame is a
    REAL baseline JFIF image (functions/jpeg.py) and the container is
    their concatenation — exactly the raw .mjpeg / multipart-stream
    Motion-JPEG wire format."""
    from crawlspark.functions import jpeg as J

    return b"".join(
        J.encode_jpeg(I.pixels_for_id(f"{video_id}:f{i}", w, h), quality=quality)
        for i in range(n_frames)
    )


def _split_mjpeg(data: bytes) -> list[bytes]:
    """Frame boundaries of an MJPEG stream. Baseline JFIF byte-stuffs
    0xFF in entropy-coded data (0xFF00) and uses only 0xFFD0-D7 restart
    markers inside a scan, so every 0xFFD9 IS an end-of-image marker —
    splitting on EOI is exact, not heuristic."""
    frames, start = [], 0
    while start < len(data):
        end = data.find(b"\xff\xd9", start)
        if end < 0:
            break
        frames.append(data[start : end + 2])
        start = end + 2
    return frames


def decode_video(data: bytes) -> tuple[int, int, np.ndarray]:
    """Container decode → (w, h, frames[n, h, w, 3]). Two REAL paths:
    the raw CSV0 container and Motion-JPEG (every frame a baseline JFIF,
    decoded by the pure-numpy functions/jpeg.py codec). Inter-frame
    codecs (H.264/VP9) need pyav/ffmpeg — that raise is the production
    swap point."""
    if data[:2] == b"\xff\xd8":  # JPEG SOI → MJPEG stream
        from crawlspark.functions import jpeg as J

        decoded = [J.decode_jpeg(f) for f in _split_mjpeg(data)]
        if not decoded:
            raise ValueError("empty MJPEG stream")
        h, w = decoded[0].shape[:2]
        return w, h, np.stack(decoded)
    if data[:4] != _VIDEO_MAGIC:
        raise NotImplementedError(
            "inter-frame video codecs (H.264/VP9/...) need pyav/ffmpeg — "
            "not available in this sandbox; plug a decoder in here"
        )
    w = int.from_bytes(data[4:6], "big")
    h = int.from_bytes(data[6:8], "big")
    n = int.from_bytes(data[8:10], "big")
    frames = np.frombuffer(data[10:], dtype=np.uint8).reshape(n, h, w, 3)
    return w, h, frames


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_phash", T.LongType()),
    ]
)


def sample_frames(videos: DataFrame, every_k: int = 2) -> DataFrame:
    """(video_id, bytes) → one row per sampled frame (idx % k == 0) with
    its 64-bit average-hash — the shot-dedup / caption-alignment input."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                _, _, frames = decode_video(bytes(r.bytes))
                for idx in range(0, len(frames), every_k):
                    rows.append((r.video_id, idx, I.average_hash64(frames[idx])))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame_phash"])

    return videos.select("video_id", "bytes").mapInPandas(gen, _FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# audio features (synthetic PCM; compressed-codec decode stubbed)
# ---------------------------------------------------------------------------

def waveform_for_id(audio_id: str, n_samples: int = 4096) -> np.ndarray:
    """Deterministic int16 PCM twin: a per-id sine + seeded noise."""
    seed = zlib.crc32(("pcm:" + audio_id).encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    freq = 40 + (seed % 400)
    t = np.arange(n_samples, dtype=np.float64) / n_samples
    wave = 8000.0 * np.sin(2 * np.pi * freq * t) + rng.normal(0, 500.0, n_samples)
    return np.clip(wave, -32768, 32767).astype(np.int16)


# -- G.711 µ-law companding (public ITU-T spec, pure numpy) ----------------
_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def ulaw_encode(pcm: np.ndarray) -> bytes:
    """int16 PCM → 8-bit µ-law (G.711): sign + 3-bit segment exponent +
    4-bit mantissa, bit-inverted on the wire. Fully vectorized."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    # segment = bit_length((mag >> 7) & 0xFF) - 1, floored at 0
    hi = (mag >> 7) & 0xFF
    exponent = np.where(
        hi == 0, 0, np.floor(np.log2(np.maximum(hi, 1))).astype(np.int32)
    )
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8).tobytes()


def ulaw_decode(data: bytes) -> np.ndarray:
    """8-bit µ-law → int16 PCM: sample = ((mantissa<<3)+BIAS)<<exponent
    − BIAS, signed. Exact inverse of the encoder's quantizer."""
    u = ~np.frombuffer(data, dtype=np.uint8).astype(np.int32) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


# -- IMA ADPCM (DVI/Intel spec, 4 bits/sample, 4:1 compression) ------------
# Public-spec tables (IMA Recommended Practices for Enhancing Digital
# Audio Compatibility, 1992): 89-entry step-size table + index
# adjustment per 3-bit magnitude.
_ADPCM_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_ADPCM_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def adpcm_encode(pcm: np.ndarray) -> bytes:
    """int16 PCM → IMA ADPCM nibble stream with a 4-byte header
    (predictor:int16 LE, step index:uint8, pad flag:uint8). The
    quantizer is sample-recursive by construction (each step size
    depends on the previous output), so the per-clip loop is inherently
    sequential — corpus parallelism comes from many clips per Arrow
    batch, not from inside one stream."""
    import struct

    pred, index = 0, 0
    nibbles = []
    for s in np.asarray(pcm, dtype=np.int32):
        step = int(_ADPCM_STEPS[index])
        diff = int(s) - pred
        nib = 8 if diff < 0 else 0
        diff = abs(diff)
        vpdiff = step >> 3
        temp, mask = step, 4
        for _ in range(3):
            if diff >= temp:
                nib |= mask
                diff -= temp
                vpdiff += temp
            temp >>= 1
            mask >>= 1
        pred = pred - vpdiff if nib & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_ADPCM_INDEX[nib & 7])))
        nibbles.append(nib)
    pad = len(nibbles) & 1
    if pad:
        nibbles.append(0)
    arr = np.asarray(nibbles, dtype=np.uint8)
    packed = (arr[0::2] | (arr[1::2] << 4)).astype(np.uint8)  # low nibble first
    return struct.pack("<hBB", 0, 0, pad) + packed.tobytes()


def adpcm_decode(data: bytes) -> np.ndarray:
    """IMA ADPCM → int16 PCM; exact mirror of the encoder's
    predictor/step recursion."""
    import struct

    pred, index, pad = struct.unpack("<hBB", data[:4])
    pred, index = int(pred), int(index)
    packed = np.frombuffer(data[4:], dtype=np.uint8)
    nibbles = np.empty(packed.shape[0] * 2, dtype=np.uint8)
    nibbles[0::2] = packed & 0x0F
    nibbles[1::2] = packed >> 4
    if pad:
        nibbles = nibbles[:-1]
    out = np.empty(nibbles.shape[0], dtype=np.int16)
    for i, nib in enumerate(nibbles):
        nib = int(nib)
        step = int(_ADPCM_STEPS[index])
        vpdiff = step >> 3
        if nib & 4:
            vpdiff += step
        if nib & 2:
            vpdiff += step >> 1
        if nib & 1:
            vpdiff += step >> 2
        pred = pred - vpdiff if nib & 8 else pred + vpdiff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_ADPCM_INDEX[nib & 7])))
        out[i] = pred
    return out


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """'pcm16' (raw), 'ulaw' (G.711 companded) and 'adpcm' (IMA 4-bit)
    are real decode paths; perceptual codecs (MP3/AAC) need
    soundfile/ffmpeg — that raise is the production swap point."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype=np.int16)
    if fmt == "ulaw":
        return ulaw_decode(data)
    if fmt == "adpcm":
        return adpcm_decode(data)
    raise NotImplementedError(
        f"audio codec {fmt!r} needs soundfile/ffmpeg — not in this sandbox"
    )


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(audio: DataFrame, fmt_col: str = "fmt") -> DataFrame:
    """(audio_id, bytes, fmt) → quality-filter features: RMS loudness,
    peak amplitude, zero-crossing count (all vectorized numpy)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = decode_audio(bytes(r.bytes), getattr(r, fmt_col)).astype(np.float64)
                zc = int(np.count_nonzero(np.diff(np.signbit(pcm))))
                rows.append(
                    (
                        r.audio_id,
                        len(pcm),
                        round(float(np.sqrt(np.mean(pcm**2))), 4),
                        int(np.abs(pcm).max()) if len(pcm) else 0,
                        zc,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["audio_id", "n_samples", "rms", "peak", "zero_crossings"]
            )

    return audio.select("audio_id", "bytes", fmt_col).mapInPandas(gen, _AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# image+caption admission gate (metadata-level, pure Catalyst expressions)
# ---------------------------------------------------------------------------

def image_quality_gate(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    caption_col: str = "caption",
    min_side: int = 128,
    max_aspect: float = 3.0,
    min_caption_tokens: int = 5,
) -> DataFrame:
    """LAION-style admission gate over the typed image metadata of the
    input_hint's (image_id, bytes, w, h, fmt, caption, …) corpus: keep
    rows whose resolution, aspect ratio, and caption length clear the
    training-set thresholds. Adds aspect (round 6), mpx (megapixels,
    round 6) and n_caption_tokens columns.

    Everything here is a per-row column expression on metadata — the
    gate prunes BEFORE any byte decode, so at 100 TB it cuts the corpus
    down while the binary column is never even read (column pruning
    keeps `bytes` out of the scan for the admission decision)."""
    from pyspark.sql import functions as F

    from crawlspark.functions.text import token_count

    w, h = F.col(w_col), F.col(h_col)
    aspect = F.round(F.greatest(w, h) * F.lit(1.0) / F.least(w, h), 6)
    mpx = F.round(w * h / F.lit(1000000.0), 6)
    out = (
        df.withColumn("aspect", aspect)
        .withColumn("mpx", mpx)
        .withColumn("n_caption_tokens", token_count(F.col(caption_col)))
    )
    return out.filter(
        (w >= min_side)
        & (h >= min_side)
        & (F.col("aspect") <= max_aspect)
        & (F.col("n_caption_tokens") >= min_caption_tokens)
    )
