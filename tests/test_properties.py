"""Hypothesis property tests: invariants that must hold on ARBITRARY
inputs — the crawl-reality contract (SURVEY §5: the reference's own
test strategy mixes goldens with fuzzed/parametrized inputs)."""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from docling_spark.kernels.raster import (
    RasterError,
    decode_gif,
    decode_image,
    decode_png,
    encode_gif_gray,
)


# ------------------------------------------------------------- raster


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_random_images(w, h, seed):
    """encoder -> decoder is the identity for any 8-bit gray image."""
    from docling_spark.kernels.pdf_kernel import encode_png_gray

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w), dtype=np.int64).astype(np.uint8)
    ww, hh, cc, ss = decode_png(encode_png_gray(img))
    assert (ww, hh, cc) == (w, h, 1)
    assert ss == img.tobytes()


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_random_planes(w, h, seed):
    rng = np.random.RandomState(seed)
    plane = rng.randint(0, 256, w * h, dtype=np.int64).astype(np.uint8).tobytes()
    ww, hh, cc, ss = decode_gif(encode_gif_gray(w, h, plane))
    assert (ww, hh, cc) == (w, h, 3)
    assert bytes(ss[3 * i] for i in range(w * h)) == plane


@settings(max_examples=80, deadline=None)
@given(data=st.binary(max_size=400))
@example(data=b"\xdd\x00\x00").via("discovered failure")
@example(data=b"\xc0\x00\x02").via("truncated SOF")
@example(data=b"\xdb\x00\x03\x00").via("truncated DQT")
@example(data=b"\xda\x00\x04\x01\x01").via("SOS before SOF")
def test_decode_image_total_on_garbage(data):
    """Arbitrary bytes: RasterError or a self-consistent decode.

    The pinned examples are the round-3 escape (a truncated DRI
    segment raised raw struct.error from jpeg.py through
    decode_image — one malformed crawl JPEG would have killed a
    whole Spark task) plus its siblings from the same audit."""
    for payload in (
        data,
        b"\x89PNG\r\n\x1a\n" + data,
        b"GIF89a" + data,
        b"\xff\xd8\xff" + data,
        b"II*\x00" + data,
    ):
        try:
            w, h, c, s = decode_image(payload)
            assert w > 0 and h > 0 and len(s) == w * h * c
        except RasterError:
            pass


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
    quant=st.integers(1, 8),
    sub=st.booleans(),
)
def test_jpeg_roundtrip_error_bounded(w, h, seed, quant, sub):
    """encode -> decode keeps every LUMINANCE sample within a bound
    proportional to the quantizer step for ANY image (chroma blurs
    under 4:2:0 by design, luma must not)."""
    from docling_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
    ww, hh, cc, s = decode_jpeg(
        encode_jpeg(w, h, 3, img.tobytes(), quant=quant, subsample=sub)
    )
    assert (ww, hh, cc) == (w, h, 3)
    dec = np.frombuffer(s, dtype=np.uint8).reshape(h, w, 3).astype(float)
    lum = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    # the luma bound only holds where no channel clipped: at a clipped
    # pixel, subsampled-chroma error leaks into recomputed luminance
    # (lum(clip(rgb(Y,Cb,Cr))) != Y).  Unclipped, lum(rgb(Y,Cb,Cr)) == Y
    # exactly, so the error is the Y-coefficient error alone: worst case
    # all 64 coefficient errors (quant/2 each) align on one sample ->
    # 8*quant spatial bound, plus rounding slack.
    unclipped = ((dec > 0) & (dec < 255)).all(axis=-1)
    err = np.abs(lum(dec) - lum(img.astype(float)))
    if unclipped.any():
        assert err[unclipped].max() <= 8 * quant + 3


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
    sub=st.booleans(),
)
def test_jpeg_progressive_equals_baseline(w, h, seed, sub):
    """SOF2 streams code the same coefficients as SOF0, so the decoded
    bytes must be identical for ANY image/size/sampling."""
    from docling_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
    base = decode_jpeg(
        encode_jpeg(w, h, 3, img.tobytes(), quant=4, subsample=sub)
    )
    prog = decode_jpeg(
        encode_jpeg(
            w, h, 3, img.tobytes(), quant=4, subsample=sub, progressive=True
        )
    )
    assert base == prog


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
    sub=st.booleans(),
)
def test_jpeg_multiscan_equals_interleaved(w, h, seed, sub):
    """A sequential file with one non-interleaved SOS per component
    (T.81 A.2.2) codes the same coefficients as the interleaved
    stream, so the decoded bytes must be identical — the round-3
    ADVICE case that used to KeyError in _decode_scan."""
    from docling_spark.kernels.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
    inter = decode_jpeg(
        encode_jpeg(w, h, 3, img.tobytes(), quant=4, subsample=sub)
    )
    multi = decode_jpeg(
        encode_jpeg(
            w, h, 3, img.tobytes(), quant=4, subsample=sub, multiscan=True
        )
    )
    assert inter == multi


# ------------------------------------------------------ format sniffing


@settings(max_examples=120, deadline=None)
@given(data=st.binary(max_size=600))
def test_sniff_format_total_and_deterministic(data):
    from docling_spark.operators.formats import sniff_format

    a = sniff_format(data)
    assert isinstance(a, str) and a
    assert a == sniff_format(data)  # pure function of bytes


@settings(max_examples=25, deadline=None)
@given(data=st.binary(max_size=800))
def test_convert_one_total_on_garbage(data):
    """The router never raises: every input becomes a typed row."""
    from docling_spark.operators.convert import convert_one

    row = convert_one("https://fuzz.example.com/x", data)
    assert row["status"] in ("success", "failure", "skipped")
    assert row["bytes_in"] == len(data)
    assert row["url"]


# --------------------------------------------------- RTL logical order


@settings(max_examples=60, deadline=None)
@given(s=st.text(max_size=80))
def test_visual_to_logical_properties(s):
    """Pure-LTR text is a fixed point; output is always a permutation
    of the input's characters (reordering never adds or drops)."""
    from docling_spark.kernels.pdf_layout import _visual_to_logical

    out = _visual_to_logical(s)
    assert sorted(out) == sorted(s)
    if s.isascii():
        assert out == s


# ------------------------------------------------------------ simhash


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_simhash_table_keys_cover_hamming3(seed):
    """Manku guarantee, property-checked: flip any <= 3 bits of a
    64-bit hash; at least one of the 10 block-pair table keys must be
    unchanged (the recall guarantee the equi-join relies on)."""
    import random

    from docling_spark.operators.dedup import _SIMHASH_BLOCKS, _SIMHASH_TABLES

    rng = random.Random(seed)
    h1 = rng.getrandbits(64)
    flips = rng.sample(range(64), rng.randint(0, 3))
    h2 = h1
    for b in flips:
        h2 ^= 1 << b

    def keys(h):
        out = []
        for i, j in _SIMHASH_TABLES:
            oi, wi = _SIMHASH_BLOCKS[i]
            oj, wj = _SIMHASH_BLOCKS[j]
            out.append(
                (((h >> oi) & ((1 << wi) - 1)) << 14)
                | ((h >> oj) & ((1 << wj) - 1))
            )
        return out

    assert any(a == b for a, b in zip(keys(h1), keys(h2)))
