"""Magic-byte header sniffing: real PNG/GIF/JPEG/WAV byte layouts parsed
with pure struct reads; unknown payloads fall back to the deterministic
fake kernels (which the engine-parity oracles restate)."""

import struct

import pytest

from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
    fake_audio_decode,
    fake_image_decode,
    real_image_decode,
    sniff_image_header,
    sniff_or_fake_audio_decode,
    sniff_or_fake_image_decode,
    sniff_wav_header,
)


def _png(w, h):
    ihdr = struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4


def _jpeg(w, h):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _wav(rate=16000, n_samples=1600, amplitude=8192):
    channels, bits = 1, 16
    byte_rate = rate * channels * bits // 8
    data = struct.pack(f"<{n_samples}h",
                       *([amplitude, -amplitude] * (n_samples // 2)))
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                         channels * bits // 8, bits))
    chunks = fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_png_gif_jpeg_dimensions():
    assert sniff_image_header(_png(640, 480)) == (640, 480)
    assert sniff_image_header(_gif(320, 200)) == (320, 200)
    assert sniff_image_header(_jpeg(1024, 768)) == (1024, 768)


def test_unknown_magic_falls_back_to_fake():
    text = b"just some document text, definitely not an image"
    assert sniff_image_header(text) is None
    assert sniff_or_fake_image_decode(text) == fake_image_decode(text)
    with pytest.raises(NotImplementedError):
        real_image_decode(text)
    # real magic wins over the fake in both entry points
    assert real_image_decode(_png(12, 34)) == (12, 34)
    assert sniff_or_fake_image_decode(_png(12, 34)) == (12, 34)


def test_wav_header_and_loudness():
    wav = _wav(rate=16000, n_samples=1600, amplitude=8192)
    assert sniff_wav_header(wav) == (16000, 0.1, 16)  # 3200 B / 32000 B/s
    rate, duration, loudness = sniff_or_fake_audio_decode(wav)
    assert (rate, duration) == (16000, 0.1)
    assert loudness == pytest.approx(8192 / 32768.0, abs=1e-6)
    # non-WAV payloads stay on the deterministic fake
    text = b"not audio"
    assert sniff_or_fake_audio_decode(text) == fake_audio_decode(text)


def test_real_headers_flow_through_mapinpandas(spark):
    rows = [(1, "image", "png", bytearray(_png(99, 77)), None),
            (2, "image", "txt", bytearray(b"plain text payload"), None)]
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_image_features,
    )

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: (r.width, r.height)
           for r in extract_image_features(media).collect()}
    assert got[1] == (99, 77)
    assert got[2] == fake_image_decode(b"plain text payload")


def test_wav_list_chunk_containing_data_text():
    """A LIST/INFO chunk whose content contains the ASCII text 'data'
    must not be mistaken for the data chunk (offset comes from the chunk
    walk, not a byte search)."""
    rate, n_samples, amplitude = 16000, 800, 4096
    byte_rate = rate * 2
    data = struct.pack(f"<{n_samples}h",
                       *([amplitude, -amplitude] * (n_samples // 2)))
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, 1, rate, byte_rate, 2, 16))
    info = b"LIST" + struct.pack("<I", 12) + b"INFOdata\x99\x99\x99\x99"
    chunks = fmt + info + b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    r, duration, loudness = sniff_or_fake_audio_decode(wav)
    assert (r, duration) == (16000, round(len(data) / byte_rate, 3))
    assert loudness == pytest.approx(4096 / 32768.0, abs=1e-6)


def test_catalog_decoder_pinned_to_fake(spark):
    """decoder='fake' must return fake-formula features even for payloads
    carrying REAL magic bytes (what the parity oracles require), and a
    typo'd decoder name must raise, not silently pick a kernel."""
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
        extract_image_features,
    )

    gifish = b"GIF87a" + b"\x10\x00\x20\x00" + b"rest of a text document"
    wav = _wav()
    # sanity: the sniff kernels DO treat these as real media
    assert sniff_or_fake_image_decode(gifish) != fake_image_decode(gifish)
    assert sniff_or_fake_audio_decode(wav)[:2] != fake_audio_decode(wav)[:2]

    media = spark.createDataFrame(
        [(1, "image", "gif", bytearray(gifish), None),
         (2, "audio", "wav", bytearray(wav), None)], MEDIA_SCHEMA)
    [img] = extract_image_features(
        media.filter("media_id = 1"), decoder="fake").collect()
    assert (img.width, img.height) == fake_image_decode(gifish)
    [aud] = extract_audio_features(
        media.filter("media_id = 2"), decoder="fake").collect()
    assert (aud.sample_rate, aud.duration_s) == fake_audio_decode(wav)[:2]

    with pytest.raises(ValueError, match="decoder"):
        extract_image_features(media, decoder="snif")
    with pytest.raises(ValueError, match="decoder"):
        extract_audio_features(media, decoder="Fake")
    with pytest.raises(ValueError, match="not both"):
        extract_image_features(media, use_real_decoder=True, decoder="fake")


def test_auto_decoder_dispatch(monkeypatch):
    """The 'auto' kernel demonstrates the one-function swap: a PIL module
    (here a monkeypatched fake — Pillow is genuinely absent from this
    container) wins at call time; without it, or when PIL cannot decode a
    payload, dispatch degrades to the header sniff / deterministic fake."""
    import struct
    import sys
    import types

    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        auto_image_decode,
        fake_image_decode,
        pil_image_decode,
    )

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
           + struct.pack(">II", 640, 480) + b"\x00" * 5)

    # no PIL in this container → NotImplementedError from the real path,
    # auto falls through to the header sniff / fake
    with pytest.raises(NotImplementedError, match="PIL"):
        pil_image_decode(png)
    assert auto_image_decode(png) == (640, 480)
    assert auto_image_decode(b"not an image") == fake_image_decode(
        b"not an image")

    class FakeImg:
        width, height = 123, 45

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_open(buf):
        if buf.read(4) == b"boom":
            raise ValueError("cannot identify image file")
        return FakeImg()

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = fake_open
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    # PIL importable → full decode wins, even over the header sniff
    assert pil_image_decode(png) == (123, 45)
    assert auto_image_decode(png) == (123, 45)
    # PIL present but payload undecodable → per-payload fallback
    assert auto_image_decode(b"boom!") == fake_image_decode(b"boom!")


def test_resize_target_math():
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        resize_target,
    )

    # no upscale: already inside the box → unchanged
    assert resize_target(100, 50, 256) == (100, 50)
    assert resize_target(256, 256, 256) == (256, 256)
    # aspect-preserving floor-division fit, longest side pinned to the box
    assert resize_target(512, 256, 256) == (256, 128)
    assert resize_target(300, 500, 256) == (153, 256)
    assert resize_target(1000, 10, 100) == (100, 1)
    # degenerate skinny strip: floor would give 0 → clamped to 1
    assert resize_target(10000, 1, 100) == (100, 1)


def test_resize_images_fake_kernel(spark):
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        fake_image_decode,
        fake_image_resize,
        resize_images,
        resize_target,
    )

    payload = b"x" * 700  # fake dims: (64 + 700%512, 64 + 100%512) = (252, 164)
    media = spark.createDataFrame(
        [(1, "image", "bin", payload, len(payload)),
         (2, "image", "bin", None, None)],
        "media_id long, kind string, format string, payload binary, n_bytes long")
    rows = {r.media_id: r for r in
            resize_images(media, max_side=128, decoder="fake",
                          kernel="fake").collect()}
    sw, sh = fake_image_decode(payload)
    w, h = resize_target(sw, sh, 128)
    r = rows[1]
    assert (r.src_width, r.src_height, r.width, r.height) == (sw, sh, w, h)
    assert bytes(r.payload) == fake_image_resize(payload, w, h)
    assert r.n_bytes == len(r.payload)
    # checksum is of the EMITTED payload, whatever kernel produced it
    # (ADVICE r5: previously the fake kernel's digest INPUT regardless)
    import hashlib as _hashlib
    assert r.checksum == _hashlib.md5(bytes(r.payload)).hexdigest()[:8]
    # null payload → null features, row preserved (fault isolation)
    assert rows[2].width is None and rows[2].payload is None
    # typo'd kernel names must raise, not silently switch
    import pytest as _pytest
    with _pytest.raises(ValueError, match="resize kernel"):
        resize_images(media, kernel="nope")


def test_pil_resize_dispatch(monkeypatch):
    """auto resize: monkeypatched PIL wins at call time; absent (the real
    container state) or undecodable → deterministic fake."""
    import sys
    import types

    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        auto_image_resize,
        fake_image_resize,
        pil_image_resize,
    )

    with pytest.raises(NotImplementedError, match="PIL"):
        pil_image_resize(b"payload", 10, 10)
    assert auto_image_resize(b"payload", 10, 10) == fake_image_resize(
        b"payload", 10, 10)

    class FakeImg:
        format = "PNG"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def resize(self, size):
            self._size = size
            return self

        def save(self, out, format):
            out.write(b"resized:%dx%d" % self._size)

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda buf: FakeImg()
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    assert pil_image_resize(b"payload", 12, 7) == b"resized:12x7"
    assert auto_image_resize(b"payload", 12, 7) == b"resized:12x7"


def test_image_ahash_python_mirror_and_determinism():
    import hashlib

    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        ahash_from_pixels,
        fake_image_ahash,
        fake_image_pixels,
        pil_image_ahash,
    )

    payload = b"some image bytes"
    px = fake_image_pixels(payload)
    assert len(px) == 60 and all(0 <= p <= 255 for p in px)
    ph = hashlib.md5(payload).hexdigest()
    assert px[7] == int(hashlib.md5(f"{ph}:7".encode()).hexdigest()[:2], 16)
    h = fake_image_ahash(payload)
    assert h == ahash_from_pixels(px)
    assert 0 <= h < (1 << 60)                     # sign-safe bigint
    assert fake_image_ahash(payload) == h         # deterministic
    assert fake_image_ahash(b"other bytes") != h
    # all-equal pixels: strict > mean sets no bits
    assert ahash_from_pixels([5] * 60) == 0
    with pytest.raises(NotImplementedError, match="PIL"):
        pil_image_ahash(payload)


def test_image_neardup_pairs_planted_duplicates(spark):
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        documents_as_media,
        image_neardup_pairs,
    )

    # 3 distinct payloads, each delivered twice under different ids →
    # exactly 3 hamming-0 pairs (random fake hashes sit far apart)
    docs = spark.createDataFrame(
        [(i, f"payload body number {i % 3} with enough words")
         for i in range(6)],
        "doc_id long, text string")
    pairs = image_neardup_pairs(documents_as_media(docs),
                                max_hamming=6, blocks=7).collect()
    assert sorted((r.id_a, r.id_b, r.hamming) for r in pairs) \
        == [(0, 3, 0), (1, 4, 0), (2, 5, 0)]
