"""Multimodal column plumbing (SURVEY.md §2C): image/audio/video as opaque
``binary`` columns with typed metadata, processed through Arrow-batched
``mapInPandas`` operators.

The actual media decoding libraries (PIL/ffmpeg/etc.) are NOT in this
container, so the decode kernels are STUBS — a clearly marked
``NotImplementedError`` for real decoding plus a deterministic fake used by
tests/oracles. The Spark-side plumbing is real: schemas, batch iteration,
partition sizing, and the UDF signatures are exactly what a production
decode would use; swapping the kernel body for PIL/torchvision is a
one-function change.

Scale notes: media bytes dominate row size — keep
``spark.sql.files.maxPartitionBytes`` moderate and let
``spark.sql.execution.arrow.maxRecordsPerBatch`` bound per-batch memory
(set in session.py); never collect binary columns to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried alongside the opaque payload.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("format", T.StringType(), True),      # png | wav | mp4 | ...
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("checksum", T.StringType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
])


def real_image_decode(payload: bytes) -> tuple[int, int]:
    """Real decode kernel — requires an image library not present in this
    environment. Swap this for PIL/torchvision in production."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this container; "
        "use fake_image_decode (deterministic stub) for plumbing tests")


def fake_image_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derives (width, height) from the payload
    bytes so plumbing tests and cross-engine oracles are reproducible."""
    n = len(payload)
    return 64 + n % 512, 64 + (n // 7) % 512


def fake_image_embedding(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature extractor: md5-derived unit-scale floats."""
    h = hashlib.md5(payload).digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def extract_image_features(media: DataFrame, use_real_decoder: bool = False,
                           embed_dim: int = 8) -> DataFrame:
    """``mapInPandas`` feature extraction over binary image payloads.

    Batch shape: the iterator yields Arrow-sized pandas batches (bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``); each output row keeps
    the key + small fixed-width features, so the heavy payload column dies
    inside the UDF and never shuffles.
    """
    decode = real_image_decode if use_real_decoder else fake_image_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode(p) if p is not None else (None, None) for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "n_bytes": [len(p) if p is not None else None for p in payloads],
                "checksum": [hashlib.md5(p).hexdigest()[:8] if p is not None
                             else None for p in payloads],
                "embedding": [fake_image_embedding(p, embed_dim)
                              if p is not None else None for p in payloads],
            })

    return (
        media.select("media_id", "payload")
        .mapInPandas(batches, IMAGE_FEATURES_SCHEMA)
    )


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap the synthetic documents table as a media table (payload =
    utf-8 bytes) — the fixture used by plumbing tests; a real corpus
    would read `binaryFile` or parquet with a binary column."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("fake").alias("format"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("loudness", T.DoubleType(), True),
])


def fake_audio_decode(payload: bytes) -> tuple[int, float, float]:
    """Deterministic fake audio probe: (sample_rate, duration, loudness)
    derived from payload bytes. Real kernel: soundfile/ffprobe."""
    import math

    n = len(payload)
    rate = (8000, 16000, 44100, 48000)[n % 4]
    # round half-away-from-zero (SQL semantics), not Python's banker's
    # rounding — keeps the stub bit-identical to the DuckDB oracle
    duration = math.floor(n / 1024.0 * 1000 + 0.5) / 1000
    loudness = (sum(payload[:64]) % 1000) / 1000.0 if n else 0.0
    return rate, duration, loudness


def extract_audio_features(media: DataFrame) -> DataFrame:
    """``mapInPandas`` audio feature extraction — same batch shape as the
    image path: payloads die inside the UDF, fixed-width features out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_audio_decode(p) if p is not None else (None, None, None)
                     for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "sample_rate": [f[0] for f in feats],
                "duration_s": [f[1] for f in feats],
                "n_bytes": [len(p) if p is not None else None
                            for p in pdf["payload"]],
                "loudness": [f[2] for f in feats],
            })

    return media.select("media_id", "payload").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_index) rows with a stub frame payload. The kernel is a
    deterministic fake (real: ffmpeg); the explode/partition shape is
    what matters at scale — frames fan out rows, so repartition after."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_index": [], "frame_checksum": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // 100)
                for fi in range(0, n_frames, every_nth):
                    out["media_id"].append(mid)
                    out["frame_index"].append(fi)
                    out["frame_checksum"].append(
                        hashlib.md5(payload + fi.to_bytes(4, "big"))
                        .hexdigest()[:8])
            yield pd.DataFrame(out)

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_checksum", T.StringType(), True),
    ])
    return media.select("media_id", "payload").mapInPandas(batches, schema)
