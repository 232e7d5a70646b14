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


def sniff_image_header(payload: bytes) -> tuple[int, int] | None:
    """Pure-stdlib (width, height) from real container headers — no image
    library needed, just struct reads of the magic-byte layouts:
      PNG  — 8-byte signature, IHDR width/height big-endian u32 at 16..24;
      GIF  — 'GIF87a'/'GIF89a', logical screen w/h little-endian u16 at 6;
      JPEG — SOI then segment walk to the first SOFn marker (C0-CF minus
             C4/C8/CC), height/width big-endian u16 at payload +1/+3.
    Returns None when no known magic matches (caller picks the fallback).
    """
    import struct

    if payload is None or len(payload) < 10:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return w, h
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                return w, h
            i += 2 + seg_len
    return None


def _parse_wav(payload: bytes) -> dict | None:
    """RIFF/WAVE chunk walk (fmt for rate/width, data for span) — pure
    struct reads, no audio library. Returns None unless both a fmt and a
    data chunk are found; the data OFFSET comes from the walk, never from
    a byte search (the ASCII substring 'data' can legally occur inside an
    earlier LIST/INFO chunk)."""
    import struct

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    out: dict = {}
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        size = struct.unpack("<I", payload[i + 4:i + 8])[0]
        if cid == b"fmt " and size >= 16 and i + 24 <= len(payload):
            out["channels"], out["rate"], out["byte_rate"] = struct.unpack(
                "<HII", payload[i + 10:i + 20])
            out["bits"] = struct.unpack("<H", payload[i + 22:i + 24])[0]
        elif cid == b"data" and "data_off" not in out:
            out["data_off"], out["data_size"] = i + 8, size
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if out.get("rate") is None or not out.get("byte_rate") \
            or "data_off" not in out:
        return None
    return out


def sniff_wav_header(payload: bytes) -> tuple[int, float, int] | None:
    """(sample_rate, duration_s, bits_per_sample) from a real RIFF/WAVE
    header — see :func:`_parse_wav`."""
    w = _parse_wav(payload)
    if w is None:
        return None
    return w["rate"], round(w["data_size"] / w["byte_rate"], 3), w["bits"]


def real_image_decode(payload: bytes) -> tuple[int, int]:
    """Real decode kernel: header sniffing covers PNG/GIF/JPEG dimensions
    without any image library; full pixel decoding would require
    PIL/opencv, which is not in this container."""
    dims = sniff_image_header(payload)
    if dims is not None:
        return dims
    raise NotImplementedError(
        "no known image magic bytes and full decoding requires PIL/opencv, "
        "not available in this container; use fake_image_decode "
        "(deterministic stub) for plumbing tests")


def fake_image_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: derives (width, height) from the payload
    bytes so plumbing tests and cross-engine oracles are reproducible."""
    n = len(payload)
    return 64 + n % 512, 64 + (n // 7) % 512


def sniff_or_fake_image_decode(payload: bytes) -> tuple[int, int]:
    """Default kernel: real magic-byte headers (PNG/GIF/JPEG) win; anything
    else falls back to the deterministic fake — so genuine media gets
    genuine dimensions while the synthetic text-payload fixtures (and the
    engine-parity oracles built on them) stay on the fake formulas."""
    return sniff_image_header(payload) or fake_image_decode(payload)


def fake_image_embedding(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature extractor: md5-derived unit-scale floats."""
    h = hashlib.md5(payload).digest()
    return [((h[i % 16] / 255.0) * 2.0 - 1.0) for i in range(dim)]


def pil_image_decode(payload: bytes) -> tuple[int, int]:
    """Full pixel-path decode via PIL. The import happens at CALL time —
    i.e. inside the executor's Python worker, which is where the library
    must exist; the driver never needs it. Raises ``NotImplementedError``
    where PIL is absent (this container), keeping the stub claim honest
    while making the one-function swap demonstrable wherever PIL exists."""
    import io

    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "real pixel decoding requires PIL, which is not installed; "
            "use decoder='sniff_or_fake' (header dims + deterministic "
            "fake) or install Pillow on the executors") from e
    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height


def auto_image_decode(payload: bytes) -> tuple[int, int]:
    """Kernel dispatch demonstrating the one-function swap: PIL when
    importable (full decode, any format Pillow knows), falling back to
    the header sniff + deterministic fake — per payload, so a corrupt or
    non-image payload under an installed PIL still degrades to the fake
    instead of failing the batch."""
    try:
        return pil_image_decode(payload)
    except NotImplementedError:
        return sniff_or_fake_image_decode(payload)
    except Exception:  # noqa: BLE001 — PIL present, payload undecodable
        return sniff_or_fake_image_decode(payload)


_IMAGE_DECODERS = {
    "sniff_or_fake": sniff_or_fake_image_decode,
    "fake": fake_image_decode,
    "real": real_image_decode,
    "auto": auto_image_decode,
}


def extract_image_features(media: DataFrame, use_real_decoder: bool = False,
                           embed_dim: int = 8,
                           decoder: str | None = None) -> DataFrame:
    """``mapInPandas`` feature extraction over binary image payloads.

    Batch shape: the iterator yields Arrow-sized pandas batches (bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``); each output row keeps
    the key + small fixed-width features, so the heavy payload column dies
    inside the UDF and never shuffles.

    ``decoder``: 'sniff_or_fake' (default — real magic bytes win, fake
    fallback), 'fake' (deterministic formulas ONLY — what engine-parity
    oracles must use, since a payload that happens to start with real
    magic bytes would otherwise diverge from the restated formulas),
    'real' (header sniff, raise on unknown), or 'auto' (PIL full decode
    when the executor has Pillow, per-payload fallback to sniff/fake —
    the demonstrated one-function kernel swap). Mutually exclusive with
    the legacy ``use_real_decoder`` flag; unknown names raise (a typo
    must not silently pick a different kernel under a parity check).
    """
    if decoder is None:
        decoder = "real" if use_real_decoder else "sniff_or_fake"
    elif use_real_decoder:
        raise ValueError("pass either use_real_decoder or decoder, not both")
    if decoder not in _IMAGE_DECODERS:
        raise ValueError(f"unknown image decoder {decoder!r}; "
                         f"one of {sorted(_IMAGE_DECODERS)}")
    decode = _IMAGE_DECODERS[decoder]

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


# Bound the pure-Python RMS loop: ~1M samples (2 MiB of PCM) is plenty
# for a loudness estimate, and an hour-long WAV must not stall its batch.
_RMS_MAX_SAMPLES = 1 << 20


def sniff_or_fake_audio_decode(payload: bytes) -> tuple[int, float, float | None]:
    """Default audio kernel: a real RIFF/WAVE header wins (rate/duration
    from the chunk walk, loudness = RMS over the first ≤1M 16-bit PCM
    samples when the format allows); non-WAV payloads fall back to the
    deterministic fake."""
    import struct

    w = _parse_wav(payload)
    if w is None:
        return fake_audio_decode(payload)
    duration = round(w["data_size"] / w["byte_rate"], 3)
    loudness = None
    if w.get("bits") == 16:
        data = payload[w["data_off"]:w["data_off"] + w["data_size"]]
        n = min(len(data) // 2, _RMS_MAX_SAMPLES)
        if n:
            samples = struct.unpack(f"<{n}h", data[:2 * n])
            loudness = round(
                (sum(x * x for x in samples) / n) ** 0.5 / 32768.0, 6)
    return w["rate"], duration, loudness


def extract_audio_features(media: DataFrame,
                           decoder: str = "sniff_or_fake") -> DataFrame:
    """``mapInPandas`` audio feature extraction — same batch shape as the
    image path: payloads die inside the UDF, fixed-width features out.
    ``decoder='fake'`` pins the deterministic formulas (for engine-parity
    oracles); the default sniffs real RIFF/WAVE headers first. Unknown
    names raise — a typo must not silently pick a different kernel."""
    decoders = {"sniff_or_fake": sniff_or_fake_audio_decode,
                "fake": fake_audio_decode}
    if decoder not in decoders:
        raise ValueError(f"unknown audio decoder {decoder!r}; "
                         f"one of {sorted(decoders)}")
    probe = decoders[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [probe(p) if p is not None
                     else (None, None, None) for p in pdf["payload"]]
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
                    # payload bytes + decimal index: restatable by any
                    # engine whose md5 takes a string (DuckDB's is
                    # VARCHAR-only, so no binary index encoding here)
                    out["frame_checksum"].append(
                        hashlib.md5(payload + str(fi).encode())
                        .hexdigest()[:8])
            yield pd.DataFrame(out)

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_checksum", T.StringType(), True),
    ])
    return media.select("media_id", "payload").mapInPandas(batches, schema)

# --------------------------------------------------------------------------
# Perceptual image hashing (aHash) + image near-dup
# --------------------------------------------------------------------------

AHASH_CELLS = 60  # 60 bits: bit 63 never set, so the hash is a plain
#                   non-negative BIGINT in every engine (the SimHash
#                   convention — operators/dedup.py uses 60 for the
#                   same sign-safety reason)

IMAGE_AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("ahash", T.LongType(), True),
])


def fake_image_pixels(payload: bytes, cells: int = AHASH_CELLS) -> list[int]:
    """Deterministic fake grayscale 'pixels' for the aHash kernel:
    cell i = first byte of md5(md5(payload).hexdigest() + ':' + i) —
    the same md5-chain trick as the other fake kernels, chosen so a SQL
    oracle can restate every pixel from the payload text."""
    ph = hashlib.md5(payload).hexdigest()
    return [int(hashlib.md5(f"{ph}:{i}".encode()).hexdigest()[:2], 16)
            for i in range(cells)]


def ahash_from_pixels(pixels: list[int]) -> int:
    """Average hash: bit i set iff pixel i exceeds the mean. The mean is
    an exact integer sum divided once in double precision, so every
    engine computes the identical threshold."""
    m = sum(pixels) / len(pixels)
    v = 0
    for i, p in enumerate(pixels):
        if p > m:
            v |= 1 << i
    return v


def fake_image_ahash(payload: bytes, cells: int = AHASH_CELLS) -> int:
    return ahash_from_pixels(fake_image_pixels(payload, cells))


def pil_image_ahash(payload: bytes, cells: int = AHASH_CELLS) -> int:
    """Real aHash via PIL (executor-side import, absent in this
    container): decode → grayscale → resize to a 6×10 grid → mean
    threshold. Same bit layout as the fake kernel (row-major cell i)."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "PIL not installed on this executor; use the 'fake' kernel "
            "for plumbing/parity or install Pillow for real hashing"
        ) from e
    img = Image.open(io.BytesIO(payload)).convert("L").resize(
        (6, cells // 6), Image.BILINEAR)
    px = list(img.getdata())[:cells]
    return ahash_from_pixels(px)


def auto_image_ahash(payload: bytes, cells: int = AHASH_CELLS) -> int:
    """PIL when the executor has it, per-payload fallback to the fake
    kernel (the auto_image_decode dispatch shape)."""
    try:
        return pil_image_ahash(payload, cells)
    except NotImplementedError:
        return fake_image_ahash(payload, cells)
    except Exception:  # noqa: BLE001 — PIL present, payload undecodable
        return fake_image_ahash(payload, cells)


_AHASH_KERNELS = {
    "fake": fake_image_ahash,
    "pil": pil_image_ahash,
    "auto": auto_image_ahash,
}


def image_ahash(media: DataFrame, kernel: str = "fake",
                cells: int = AHASH_CELLS) -> DataFrame:
    """Per-image perceptual hash over binary payloads (``mapInPandas``
    — the payload dies inside the UDF; only (media_id, 60-bit hash)
    ever shuffles). ``kernel``: 'fake' (deterministic md5-pixel chain —
    what engine-parity oracles restate), 'pil' (real decode, raises
    where Pillow is absent), 'auto' (PIL with per-payload fake
    fallback)."""
    if kernel not in _AHASH_KERNELS:
        raise ValueError(f"unknown ahash kernel {kernel!r}; "
                         f"one of {sorted(_AHASH_KERNELS)}")
    fn = _AHASH_KERNELS[kernel]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "ahash": [fn(p, cells) if p is not None else None
                          for p in pdf["payload"]],
            })

    return media.select("media_id", "payload").mapInPandas(
        batches, IMAGE_AHASH_SCHEMA)


def image_neardup_pairs(media: DataFrame, kernel: str = "fake",
                        max_hamming: int = 6, blocks: int = 7,
                        cells: int = AHASH_CELLS,
                        method: str = "pigeonhole",
                        n_tables: int = 16,
                        bits_per_table: int = 16) -> DataFrame:
    """Near-duplicate IMAGE pairs: perceptual hashes within
    ``max_hamming`` bits — re-encodes, light crops, and brightness
    shifts move few aHash bits, so this is the image-side analogue of
    SimHash text dedup. Two candidate generators over the same exact
    Hamming verify:

    * ``method='pigeonhole'`` (default) — the COMPLETE bit-block
      equi-join (operators/dedup.hamming_neardup_pairs): every true
      pair is found, but candidate volume is quadratic at fixed radius
      — the documented ≤100k-images-per-shard tool;
    * ``method='banded'`` — banded multi-index hashing
      (operators/dedup.hamming_banded_pairs): ``n_tables`` wide
      bit-sample keys, ~linear candidate growth, probabilistic recall
      (operators/dedup.banded_hamming_recall — ≈0.91 at the default
      radius 6, 1.0 for exact-duplicate hashes). The corpus-wide path,
      exactly as MinHash-LSH is for text."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        hamming_banded_pairs,
        hamming_neardup_pairs,
    )

    sh = image_ahash(media, kernel, cells).select(
        F.col("media_id").alias("id"), F.col("ahash").alias("sh"))
    if method == "banded":
        return hamming_banded_pairs(sh, bits=cells,
                                    max_hamming=max_hamming,
                                    n_tables=n_tables,
                                    bits_per_table=bits_per_table)
    if method != "pigeonhole":
        raise ValueError(f"unknown method {method!r}; "
                         f"one of ['pigeonhole', 'banded']")
    return hamming_neardup_pairs(sh, bits=cells, max_hamming=max_hamming,
                                 blocks=blocks)


# --------------------------------------------------------------------------
# Image resize
# --------------------------------------------------------------------------

RESIZED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("src_width", T.IntegerType(), True),
    T.StructField("src_height", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("checksum", T.StringType(), True),
])


def resize_target(width: int, height: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit inside a max_side×max_side box; never
    upscales. Pure integer math (floor division) so any engine — including
    a SQL oracle — can restate the target dimensions exactly."""
    longest = max(width, height)
    if longest <= max_side:
        return width, height
    return (max(1, width * max_side // longest),
            max(1, height * max_side // longest))


def fake_image_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize kernel: the 'resized pixels' are the
    ASCII md5 hexdigest of payload + target dims — a stub, but stable
    across engines/runs, and hex (not raw digest bytes) so the CHECKSUM
    OF THE EMITTED PAYLOAD is still oracle-restatable: SQL engines md5
    strings, not blobs, so ``md5(md5(text || '@' || w || 'x' || h))``
    reproduces ``md5(fake_image_resize(payload, w, h))`` exactly."""
    return (hashlib.md5(payload + b"@%dx%d" % (width, height))
            .hexdigest().encode("ascii"))


def pil_image_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize via PIL, imported at call time (executor-side, like
    ``pil_image_decode``); raises ``NotImplementedError`` where PIL is
    absent so the stub claim stays honest."""
    import io

    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "real image resizing requires PIL, which is not installed; "
            "use kernel='fake' or install Pillow on the executors") from e
    with Image.open(io.BytesIO(payload)) as im:
        out = io.BytesIO()
        im.resize((width, height)).save(out, format=im.format or "PNG")
        return out.getvalue()


def auto_image_resize(payload: bytes, width: int, height: int) -> bytes:
    """PIL when importable and the payload decodes, per-payload fallback
    to the deterministic fake (same dispatch shape as
    ``auto_image_decode``)."""
    try:
        return pil_image_resize(payload, width, height)
    except NotImplementedError:
        return fake_image_resize(payload, width, height)
    except Exception:  # noqa: BLE001 — PIL present, payload undecodable
        return fake_image_resize(payload, width, height)


_RESIZE_KERNELS = {
    "fake": fake_image_resize,
    "pil": pil_image_resize,
    "auto": auto_image_resize,
}


def resize_images(media: DataFrame, max_side: int = 256,
                  decoder: str = "sniff_or_fake",
                  kernel: str = "fake") -> DataFrame:
    """Arrow-batched image resize over binary payloads: decode source
    dimensions (``decoder`` as in ``extract_image_features``), compute the
    aspect-preserving ``resize_target`` fit, run the resize ``kernel``
    ('fake' deterministic stub | 'pil' real | 'auto' dispatch), and emit
    the resized payload + metadata.

    Scale shape: payloads stay inside the Python worker for the whole
    decode→resize span — one mapInPandas stage, no intermediate shuffle of
    pixel data; output payloads are ≤ resized size, so the downstream
    shuffle (if any) moves the SMALL image. Unknown decoder/kernel names
    raise (a typo must not silently switch kernels under a parity check)."""
    if decoder not in _IMAGE_DECODERS:
        raise ValueError(f"unknown image decoder {decoder!r}; "
                         f"one of {sorted(_IMAGE_DECODERS)}")
    if kernel not in _RESIZE_KERNELS:
        raise ValueError(f"unknown resize kernel {kernel!r}; "
                         f"one of {sorted(_RESIZE_KERNELS)}")
    decode = _IMAGE_DECODERS[decoder]
    run_kernel = _RESIZE_KERNELS[kernel]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "src_width", "src_height",
                                   "width", "height", "payload", "n_bytes",
                                   "checksum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                if payload is None:
                    for k in ("src_width", "src_height", "width", "height",
                              "payload", "n_bytes", "checksum"):
                        out[k].append(None)
                    continue
                sw, sh = decode(payload)
                w, h = resize_target(sw, sh, max_side)
                resized = run_kernel(payload, w, h)
                out["src_width"].append(sw)
                out["src_height"].append(sh)
                out["width"].append(w)
                out["height"].append(h)
                out["payload"].append(resized)
                out["n_bytes"].append(len(resized))
                # checksum of the EMITTED payload, whatever kernel
                # produced it — with a real (pil/auto) kernel this is the
                # resized image's content address, not the fake digest
                # input (which would mislabel real output)
                out["checksum"].append(hashlib.md5(resized).hexdigest()[:8])
            yield pd.DataFrame(out)

    return (
        media.select("media_id", "payload")
        .mapInPandas(batches, RESIZED_IMAGE_SCHEMA)
    )
