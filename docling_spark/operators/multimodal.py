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


# -------------------------------------------------------- audio metadata

AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("format", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("n_bytes", LongType()),
    ]
)


def parse_wav_header(payload: bytes) -> dict | None:
    """Real (non-stub) WAV metadata from the RIFF fmt/data chunks:
    sample rate, channels, bit depth, duration. The audio PIPELINE in
    the reference is ASR-model-bound (B11/V-ops, out of scope); the
    typed-metadata column is the part a training-data pipeline needs
    regardless of ASR."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
            fmt = (rate, channels, bits)
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen % 2)
    if fmt is None:
        return None
    rate, channels, bits = fmt
    byte_rate = rate * channels * max(bits // 8, 1)
    duration = (data_len / byte_rate) if (data_len and byte_rate) else 0.0
    return {
        "format": "wav",
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "duration_sec": round(duration, 6),
    }


def extract_audio_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(media_id, payload) -> typed audio metadata rows (WAV chunks or
    MPEG frame headers); other formats yield format='unknown' rows,
    never errors."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                meta = parse_wav_header(payload) or parse_mp3_header(payload)
                rows.append(
                    {
                        "media_id": mid,
                        "format": meta["format"] if meta else "unknown",
                        "sample_rate": meta["sample_rate"] if meta else 0,
                        "channels": meta["channels"] if meta else 0,
                        "bits_per_sample": meta["bits_per_sample"] if meta else 0,
                        "duration_sec": meta["duration_sec"] if meta else 0.0,
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])

    return df.select("media_id", payload_col).mapInPandas(run, AUDIO_META_SCHEMA)


_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES_V1 = [44100, 48000, 32000, 0]
_MP3_RATES_V2 = [22050, 24000, 16000, 0]
_MP3_RATES_V25 = [11025, 12000, 8000, 0]


def parse_mp3_header(payload: bytes) -> dict | None:
    """MPEG audio metadata from the first frame header (skipping any
    ID3v2 tag): version/layer, sample rate, channels, bitrate, and a
    CBR duration estimate from the stream length. Real parsing, no
    codec — decode/ASR stay model-bound and out of scope."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = (
            (payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F)
        )
        pos = 10 + size
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] == 0xFF and (payload[pos + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = payload[pos + 1], payload[pos + 2], payload[pos + 3]
            version = (b1 >> 3) & 0x3  # 3=V1, 2=V2, 0=V2.5
            layer = (b1 >> 1) & 0x3  # 1=III
            if version == 1 or layer == 0:
                pos += 1
                continue
            rates = {3: _MP3_RATES_V1, 2: _MP3_RATES_V2, 0: _MP3_RATES_V25}[version]
            rate = rates[(b2 >> 2) & 0x3]
            if not rate:
                pos += 1
                continue
            bitrate_i = (b2 >> 4) & 0xF
            bitrate = (
                _MP3_BITRATES_V1L3[bitrate_i] * 1000
                if version == 3 and layer == 1 and bitrate_i < 15
                else 0
            )
            channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
            duration = (
                round((n - pos) * 8 / bitrate, 3) if bitrate else 0.0
            )
            return {
                "format": "mp3",
                "sample_rate": rate,
                "channels": channels,
                "bits_per_sample": 0,  # compressed stream
                "duration_sec": duration,
            }
        pos += 1
    return None
