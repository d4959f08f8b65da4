"""Stdlib PNG/GIF raster decoders (kernels/raster.py) and the
decoded-vs-stub multimodal feature path."""

import math
import struct
import zlib

import numpy as np
import pytest

from docling_spark.kernels.raster import (
    RasterError,
    decode_gif,
    decode_image,
    decode_png,
    encode_gif_gray,
    image_features,
)

# ---------------------------------------------------------- builders


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def make_png(pix: bytes, w: int, h: int, channels: int, ctype: int, filt: int) -> bytes:
    """Encode with one fixed filter type per scanline (all 5 exercised)."""
    bpp = channels
    raw = b""
    prev = bytearray(w * channels)
    for y in range(h):
        line = bytearray(pix[y * w * channels : (y + 1) * w * channels])
        enc = bytearray(len(line))
        for i in range(len(line)):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if filt == 0:
                enc[i] = line[i]
            elif filt == 1:
                enc[i] = (line[i] - left) & 0xFF
            elif filt == 2:
                enc[i] = (line[i] - up) & 0xFF
            elif filt == 3:
                enc[i] = (line[i] - ((left + up) >> 1)) & 0xFF
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([filt]) + bytes(enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_gif(idx: bytes, w: int, h: int, palette, interlace=False) -> bytes:
    """Independent GIF builder (variable-width LZW) for decoder tests."""
    n = max(2, 1 << math.ceil(math.log2(max(len(palette), 2))))
    ct = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (n - len(palette))
    mcs = max(2, (n - 1).bit_length())
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    stream = [(clear, mcs + 1)]
    width, cnt, first = mcs + 1, eoi + 1, True
    rows = list(range(h))
    if interlace:
        rows = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
    pixels = []
    for r in rows:
        pixels.extend(idx[r * w : (r + 1) * w])
    for px in pixels:
        stream.append((px, width))
        if first:
            first = False
        else:
            cnt += 1
            if cnt == (1 << width) and width < 12:
                width += 1
        if cnt >= 4094:
            stream.append((clear, width))
            width, cnt, first = mcs + 1, eoi + 1, True
    stream.append((eoi, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in stream:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    blocks = b""
    for i in range(0, len(out), 255):
        ch = out[i : i + 255]
        blocks += bytes([len(ch)]) + bytes(ch)
    blocks += b"\x00"
    flags = 0x80 | (n.bit_length() - 2)
    iflags = 0x40 if interlace else 0
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, flags, 0, 0)
        + ct
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        + bytes([mcs])
        + blocks
        + b"\x3b"
    )


# --------------------------------------------------------------- PNG


def test_png_gray_roundtrip_with_own_encoder():
    from docling_spark.kernels.pdf_kernel import encode_png_gray

    img = (np.arange(64 * 48, dtype=np.uint32) % 251).astype(np.uint8).reshape(48, 64)
    w, h, c, s = decode_png(encode_png_gray(img))
    assert (w, h, c) == (64, 48, 1)
    assert s == img.tobytes()


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_all_filter_types(filt):
    rng = np.random.RandomState(7 + filt)
    w, h = 17, 9
    pix = rng.randint(0, 256, w * h * 3, dtype=np.uint32).astype(np.uint8).tobytes()
    ww, hh, cc, ss = decode_png(make_png(pix, w, h, 3, 2, filt))
    assert (ww, hh, cc) == (w, h, 3) and ss == pix


def test_png_palette():
    # 8-bit palette image: indices expand through PLTE to RGB
    pal = b"".join(bytes((i, 255 - i, i // 2)) for i in range(16))
    w, h = 8, 4
    idx = bytes((x + y) % 16 for y in range(h) for x in range(w))
    raw = b"".join(b"\x00" + idx[y * w : (y + 1) * w] for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    ww, hh, cc, ss = decode_png(png)
    assert (ww, hh, cc) == (w, h, 3)
    assert ss == b"".join(pal[3 * i : 3 * i + 3] for i in idx)


def test_png_16bit_downscales_high_byte():
    w, h = 5, 3
    vals = [(v * 37) % 65536 for v in range(w * h)]
    raw = b"".join(
        b"\x00" + b"".join(struct.pack(">H", v) for v in vals[y * w : (y + 1) * w])
        for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    ww, hh, cc, ss = decode_png(png)
    assert (ww, hh, cc) == (w, h, 1)
    assert list(ss) == [v >> 8 for v in vals]


def test_png_real_reference_fixture():
    data = open("/root/reference/tests/data/2305.03393v1-pg9-img.png", "rb").read()
    w, h, c, s = decode_png(data)
    assert (w, h, c) == (1275, 1650, 4)
    assert len(s) == w * h * c
    # a scanned text page is mostly white: high mean luminance
    stats = image_features(w, h, c, s)
    assert stats["lum_mean"] > 200
    assert len(stats["feature"]) == 8


def test_png_garbage_raises_typed_error():
    with pytest.raises(RasterError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)
    with pytest.raises(RasterError):
        decode_image(b"\xff\xd8\xffJPEG has no stdlib decoder")


# --------------------------------------------------------------- GIF


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("size", [(13, 7), (64, 33)])
def test_gif_decode(size, interlace):
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    w, h = size
    idx = bytes((i * 3 + y) % 4 for y in range(h) for i in range(w))
    ww, hh, cc, ss = decode_gif(make_gif(idx, w, h, pal, interlace))
    assert (ww, hh, cc) == (w, h, 3)
    assert ss == b"".join(bytes(pal[i]) for i in idx)


def test_gif_encoder_decoder_roundtrip():
    w, h = 37, 21
    plane = bytes((x * 5 + y * 11) % 256 for y in range(h) for x in range(w))
    ww, hh, cc, ss = decode_gif(encode_gif_gray(w, h, plane))
    assert (ww, hh, cc) == (w, h, 3)
    # gray palette: every RGB triple is (v, v, v)
    assert bytes(ss[3 * i] for i in range(w * h)) == plane
    assert all(ss[3 * i] == ss[3 * i + 1] == ss[3 * i + 2] for i in range(w * h))


# ----------------------------------------------- kernel + Spark path


def test_decode_pixels_png_gif_jpeg_real_webp_stubbed():
    from docling_spark.kernels.image_kernel import decode_pixels
    from docling_spark.kernels.jpeg import encode_jpeg
    from docling_spark.kernels.pdf_kernel import encode_png_gray
    from docling_spark.kernels.raster import RasterError

    img = np.full((10, 20), 128, dtype=np.uint8)
    w, h, c, s = decode_pixels(encode_png_gray(img))
    assert (w, h, c) == (20, 10, 1) and set(s) == {128}
    w, h, c, s = decode_pixels(encode_jpeg(20, 10, 1, img.tobytes(), quant=2))
    assert (w, h, c) == (20, 10, 1)
    assert max(abs(b - 128) for b in s) <= 4
    # malformed jpeg: decode is attempted for real and fails typed
    with pytest.raises(RasterError):
        decode_pixels(b"\xff\xd8\xff rest of a jpeg")
    # tiff decodes for real now (kernels/tiff.py)
    from docling_spark.kernels.tiff import encode_tiff

    w, h, c, s = decode_pixels(encode_tiff([(20, 10, 1, img.tobytes())]))
    assert (w, h, c) == (20, 10, 1) and set(s) == {128}
    # webp: real decode via the system libwebp when present (garbage
    # fails typed); explicit stub on hosts without it
    from docling_spark.kernels.webp import webp_available

    if webp_available():
        with pytest.raises(RasterError):
            decode_pixels(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    else:
        with pytest.raises(NotImplementedError):
            decode_pixels(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_media_features_decoded_flag(spark):
    from docling_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    feats = extract_media_features(synth_media(spark, 32)).collect()
    by_kind = {}
    for r in feats:
        by_kind.setdefault(r.kind, []).append(r)
    # every image is a real PNG/GIF -> decoded, true dims, 8-dim grid
    assert all(r.decoded for r in by_kind["image"])
    assert all(r.width > 0 and r.height > 0 for r in by_kind["image"])
    assert all(len(r.feature) == 8 for r in by_kind["image"])
    # audio/video have no pixel decoder -> stub rows, flagged
    assert all(not r.decoded for r in by_kind["audio"] + by_kind["video"])


def test_media_features_dims_match_decoder(spark):
    """The Spark column values equal a local decode of the same payload
    (plumbing adds nothing, loses nothing)."""
    from docling_spark.operators.multimodal import (
        _synth_payload,
        extract_media_features,
        synth_media,
    )

    feats = {r.media_id: r for r in
             extract_media_features(synth_media(spark, 16)).collect()}
    for i in (0, 3, 4, 7):
        kind, payload = _synth_payload(i)
        w, h, c, s = decode_image(payload)
        assert (feats[i].width, feats[i].height) == (w, h)


# ------------------------------------------------------------- fuzzing


def test_raster_fuzz_never_hangs_or_segfaults():
    """Crawl reality: truncated, bit-flipped, and spliced image bytes
    must raise RasterError (or decode) — never hang, loop, or crash."""
    import hashlib

    from docling_spark.kernels.pdf_kernel import encode_png_gray

    img = (np.arange(24 * 16, dtype=np.uint32) % 256).astype(np.uint8).reshape(16, 24)
    png = encode_png_gray(img)
    gif = encode_gif_gray(8, 6, bytes(range(48)))

    def mutations(data: bytes):
        yield data[: len(data) // 3]               # truncate
        yield data[: len(data) * 2 // 3]           # truncate later
        b = bytearray(data)
        for i in (8, 16, 25, len(b) // 2, len(b) - 3):
            b[i % len(b)] ^= 0xFF                  # bit flips
        yield bytes(b)
        yield data + data[:32]                     # splice
        yield data[:16] + b"\x00" * 64 + data[16:]  # zero insert
        # deterministic garbage with a valid magic
        yield data[:8] + hashlib.sha256(data).digest() * 8

    n = 0
    for seed in (png, gif):
        for mut in mutations(seed):
            try:
                w, h, c, s = decode_image(mut)
                assert 0 < w < 65536 and 0 < h < 65536
                assert len(s) == w * h * c
            except RasterError:
                pass
            n += 1
    assert n == 12


def test_gif_lzw_bomb_bounded():
    """A tiny LZW stream expanding far past the declared frame size
    must stop at the pixel budget instead of ballooning memory."""
    # valid header declaring 4x4, LZW stream that would decode far more
    pal = [(0, 0, 0), (255, 255, 255)]
    idx = bytes([0, 1] * 8)
    data = bytearray(make_gif(idx, 4, 4, pal))
    w, h, c, s = decode_gif(bytes(data))
    assert (w, h) == (4, 4) and len(s) == 4 * 4 * 3


def test_malformed_jpeg_yields_stub_row_not_task_kill(spark):
    """The round-3 escape, pinned end-to-end: a JPEG with a truncated
    DRI segment must flow through the Spark feature path as a
    decoded=false stub row — the typed-error chain (JpegError ->
    RasterError -> stub) plus the catch-all defense in
    extract_media_features."""
    from pyspark.sql import Row

    from docling_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    bad = [
        b"\xff\xd8\xff\xdd\x00\x00",          # truncated DRI (the escape)
        b"\xff\xd8\xff\xc0\x00\x02",          # truncated SOF
        b"\xff\xd8\xff\xda\x00\x04\x01\x01",  # SOS before SOF
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 30,  # short PNG IHDR path
        b"II*\x00" + b"\xff" * 30,            # garbage TIFF IFD
    ]
    df = spark.createDataFrame(
        [
            Row(media_id=i, kind="image", payload=p, mime="image/x-bad",
                n_bytes=len(p))
            for i, p in enumerate(bad)
        ],
        MEDIA_SCHEMA,
    )
    rows = extract_media_features(df).collect()
    assert len(rows) == len(bad)
    assert all(not r.decoded for r in rows)      # stub rows, no exception
    assert all(len(r.feature) == 8 for r in rows)


def test_media_rollup_shows_tiff_decoded(spark):
    """The synthetic corpus now carries real TIFF payloads (LZW and
    PackBits); every image row including tiff must report
    decoded=true in the rollup."""
    from docling_spark.operators.multimodal import (
        _synth_payload,
        extract_media_features,
        media_rollup,
        synth_media,
    )

    # corpus really contains tiffs
    kinds = {_synth_payload(i)[1][:4] for i in range(32)}
    assert b"II*\x00" in kinds
    feats = extract_media_features(synth_media(spark, 64))
    roll = {(r.kind, r.decoded): r.n_media for r in media_rollup(feats).collect()}
    assert ("image", False) not in roll          # every image decodes
    assert roll[("image", True)] == 32
