"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction run as Arrow-batched
``mapInPandas`` stages. The decode itself is STUBBED in this container (no
image/audio libs available): ``decode_image`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder (seeded by
content hash) exercises the full Spark-side plumbing — schema, batching,
partitioning, UDF signatures — which is the part that matters at scale.

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


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/ffmpeg, absent in this container.

    ``fake=True`` returns a deterministic 8x8 grayscale "image" derived from
    a content hash — stable across executors, good enough to test the
    pipeline shape end-to-end.
    """
    if not fake:
        raise NotImplementedError("image decode requires PIL/libvips; not available in this container")
    h = blake2b(payload, digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32).reshape(8, 8)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction (mean-pooled 8-dim vector).

    Partitioning: repartition by media_id hash so payload bytes spread evenly
    (payload sizes, not row counts, drive task cost for real media).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    img = decode_image(bytes(payload), fake=fake_decode)
                    feats.append(img.mean(axis=0).astype(np.float32))
                    ok.append(True)
                except NotImplementedError:
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
