"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction run as Arrow-batched
``mapInPandas`` stages. Two REAL decoders are implemented in pure NumPy (no
image/audio libs exist in this container): PPM ``P6`` images and WAV/PCM16
audio. Anything else (JPEG/PNG/MP3/...) raises ``NotImplementedError`` —
``fake=True`` substitutes a deterministic hash-derived "image" so the full
Spark-side plumbing (schema, batching, partitioning, UDF signatures) is
exercised for arbitrary payloads too.

Batch shape contract: each mapInPandas batch carries ``payload`` bytes and
emits fixed-width feature rows; Arrow moves the bytes JVM->Python once, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory.
"""

from __future__ import annotations

from hashlib import blake2b
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, feature array<float>, decode_ok boolean"


def synth_media(spark, n: int, seed: int = 21) -> DataFrame:
    """Deterministic fake media table: payload = hash-derived bytes."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("id", F.lit("w")), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit("h")), F.lit(1080)) + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.pmod(F.xxhash64("id", F.lit("d")), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )
    return df


# -- real decoders (pure NumPy) -------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (``P6``) image to a float32 ``(H, W, 3)`` array.

    Header grammar: ``P6 <ws> width <ws> height <ws> maxval <single-ws>``
    with ``#``-comments allowed between tokens; maxval <= 255 supported
    (one byte per sample). Raises ValueError on malformed input.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] not in (b"\n", b"\r"):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = width * height * 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(height, width, 3).astype(np.float32)


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm` (test/fixture helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE PCM16 payload to ``(float32 mono waveform in
    [-1, 1], sample_rate)``. Pure NumPy chunk walk; raises ValueError on
    non-WAV or non-PCM16 input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise ValueError("only PCM16 supported")
    wave = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    if channels > 1:
        wave = wave[: len(wave) - len(wave) % channels].reshape(-1, channels).mean(axis=1)
    return wave, sample_rate


def encode_wav(wave: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of :func:`decode_wav` (mono PCM16; test/fixture helper)."""
    pcm = np.clip(wave, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt + b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode ``payload`` to a float32 grayscale 2-D array.

    Real path: PPM ``P6`` (pure NumPy, luma = mean of RGB). Other formats
    (JPEG/PNG/...) need PIL/libvips, absent in this container ->
    ``NotImplementedError`` unless ``fake=True``, which substitutes a
    deterministic 8x8 hash-derived "image" (stable across executors) to
    exercise the pipeline shape end-to-end.
    """
    if payload[:2] == b"P6":
        return decode_ppm(payload).mean(axis=2)
    if not fake:
        raise NotImplementedError("non-PPM image decode requires PIL/libvips; not available in this container")
    h = blake2b(payload, digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32).reshape(8, 8)


def _pool8(img: np.ndarray) -> np.ndarray:
    """Mean-pool a grayscale image into 8 vertical column bands (8-dim)."""
    bands = np.array_split(img, 8, axis=1)
    return np.array([b.mean() if b.size else 0.0 for b in bands], dtype=np.float32)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction (8-dim band-pooled vector).

    Partitioning: repartition by media_id hash so payload bytes spread evenly
    (payload sizes, not row counts, drive task cost for real media).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    img = decode_image(bytes(payload), fake=fake_decode)
                    feats.append(_pool8(img))
                    ok.append(True)
                except (NotImplementedError, ValueError):
                    feats.append(np.zeros(8, dtype=np.float32))
                    ok.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [list(map(float, f)) for f in feats], "decode_ok": ok}
            )

    return (
        media.repartition(F.col("media_id"))
        .select("media_id", "payload")
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )


def extract_audio_features(media: DataFrame) -> DataFrame:
    """8-band RMS energy profile per WAV payload (Arrow-batched).

    Non-WAV/non-PCM16 payloads yield ``decode_ok = false`` with a zero
    vector — the pipeline never aborts on undecodable media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    wave, _sr = decode_wav(bytes(payload))
                    segs = np.array_split(wave, 8)
                    feats.append(np.array(
                        [float(np.sqrt(np.mean(s**2))) if s.size else 0.0 for s in segs], dtype=np.float32
                    ))
                    ok.append(True)
                except ValueError:
                    feats.append(np.zeros(8, dtype=np.float32))
                    ok.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [list(map(float, f)) for f in feats], "decode_ok": ok}
            )

    return (
        media.repartition(F.col("media_id"))
        .select("media_id", "payload")
        .mapInPandas(run, schema=FEATURE_SCHEMA)
    )


# -- video: length-prefixed PPM frame container ---------------------------

VIDEO_MAGIC = b"PV61"
FRAME_SCHEMA = "media_id long, frame_idx int, feature array<float>, decode_ok boolean"
VIDEO_FEATURE_SCHEMA = "media_id long, n_frames int, fps int, feature array<float>, decode_ok boolean"


def encode_video(frames: list, fps: int) -> bytes:
    """Encode frames (uint8 ``(H, W, 3)`` arrays) as a ``PV61`` container:
    ``PV61 <n_frames> <fps>\\n`` then each frame as an 8-byte big-endian
    length prefix + PPM P6 payload. The length prefix is the design point:
    frame extraction SEEKS to the k-th frame instead of decoding the whole
    stream — the property real containers provide via their index atoms.
    """
    out = [VIDEO_MAGIC + b" %d %d\n" % (len(frames), int(fps))]
    for fr in frames:
        ppm = encode_ppm(fr)
        out.append(len(ppm).to_bytes(8, "big") + ppm)
    return b"".join(out)


def _video_header(payload: bytes) -> tuple[int, int, int]:
    """Return (n_frames, fps, body_offset); raises ValueError if not PV61."""
    if not payload.startswith(VIDEO_MAGIC + b" "):
        raise ValueError("not a PV61 container")
    nl = payload.index(b"\n", 4)
    n_s, fps_s = payload[5:nl].split()
    return int(n_s), int(fps_s), nl + 1


def decode_video_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Seek to and decode exactly one frame (no full-stream decode)."""
    n, _fps, off = _video_header(payload)
    if not (0 <= frame_idx < n):
        raise ValueError(f"frame {frame_idx} out of range (n={n})")
    for i in range(frame_idx + 1):
        ln = int.from_bytes(payload[off:off + 8], "big")
        start = off + 8
        off = start + ln
        if off > len(payload):
            raise ValueError("truncated container")
    return decode_ppm(payload[start:start + ln])


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling over video payloads: one output row per SAMPLED frame
    (indices 0, k, 2k, ...) with the frame's 8-band pooled feature.

    Arrow-batched mapInPandas; each task seeks within its payloads rather
    than decoding every frame — per-task cost tracks sampled frames, not
    stream length. Undecodable payloads emit a single ``decode_ok=false``
    row (frame_idx -1) so downstream accounting never loses a media_id.
    """
    if every_k <= 0:
        raise ValueError("every_k must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats, oks = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    b = bytes(payload)
                    n, _fps, _off = _video_header(b)
                    for fi in range(0, n, every_k):
                        gray = decode_video_frame(b, fi).mean(axis=2)
                        ids.append(mid); idxs.append(fi)
                        feats.append([float(x) for x in _pool8(gray)]); oks.append(True)
                except ValueError:
                    ids.append(mid); idxs.append(-1)
                    feats.append([0.0] * 8); oks.append(False)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "feature": feats, "decode_ok": oks}
            )

    return (
        media.repartition(F.col("media_id"))
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAME_SCHEMA)
    )


def extract_video_features(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Per-video summary: frame count, fps, mean of sampled-frame features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "n_frames": [], "fps": [], "feature": [], "decode_ok": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    b = bytes(payload)
                    n, fps, _off = _video_header(b)
                    fs = [
                        _pool8(decode_video_frame(b, fi).mean(axis=2))
                        for fi in range(0, n, every_k)
                    ]
                    mean = np.mean(fs, axis=0) if fs else np.zeros(8, dtype=np.float32)
                    vals = (mid, n, fps, [float(x) for x in mean], True)
                except ValueError:
                    vals = (mid, 0, 0, [0.0] * 8, False)
                for k, v in zip(rows, vals):
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return (
        media.repartition(F.col("media_id"))
        .select("media_id", "payload")
        .mapInPandas(run, schema=VIDEO_FEATURE_SCHEMA)
    )
