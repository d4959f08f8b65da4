"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride along as ``binary`` columns with a typed
metadata struct. The Spark side — schema, partitioning, Arrow batch
shape, mapInPandas signatures — is real and tested; the actual codec
calls are STUBBED behind ``_decode_image_stub`` (this container has no
image/audio libraries) with a deterministic fake so tests can assert
the plumbing end-to-end. Swap the stub for PIL/libvips/ffmpeg on a real
cluster without touching the Spark plan.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(DoubleType())),
        StructField("sha1", StringType()),
    ]
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x1aE\xdf\xa3": "video/webm",
}


def sniff_mime(payload: bytes) -> str:
    for magic, mime in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def synth_media(spark, n: int = 256) -> DataFrame:
    """Deterministic fake media corpus (stands in for a real image/audio
    table; payload bytes are reproducible functions of media_id)."""
    kinds = ["image", "audio", "video", "image"]
    magics = [b"\x89PNG", b"RIFF", b"\x1aE\xdf\xa3", b"\xff\xd8\xff"]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = []
            for i in ids:
                body = hashlib.sha256(struct.pack("<q", i)).digest() * (4 + i % 8)
                payload = magics[i % 4] + body
                rows.append(
                    {
                        "media_id": i,
                        "kind": kinds[i % 4],
                        "payload": payload,
                        "mime": sniff_mime(payload),
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB: stands in for PIL.Image.open + resize + feature extraction.

    Deterministic fake: dimensions and a 8-dim 'embedding' derived from
    the payload digest. Replace with a real codec on a cluster; the
    signature (bytes in, (w, h, feature) out) is the contract.
    """
    d = hashlib.sha1(payload).digest()
    w = 64 + d[0] % 192
    h = 64 + d[1] % 192
    feat = [round(b / 255.0, 6) for b in d[2:10]]
    return w, h, feat


def extract_media_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches: the real plan
    shape for decode/resize/frame-sample at scale (one Python worker per
    core, payload bytes never hit the driver)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                w, h, feat = _decode_image_stub(payload)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "width": w if kind == "image" else 0,
                        "height": h if kind == "image" else 0,
                        "n_frames": (1 if kind == "image" else 1 + int(w) % 16),
                        "feature": feat,
                        "sha1": hashlib.sha1(payload).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.repartition(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
        F.xxhash64("media_id"),
    ).mapInPandas(run, FEATURE_SCHEMA)


def media_rollup(features: DataFrame) -> DataFrame:
    return (
        features.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
        )
        .orderBy("kind")
    )
