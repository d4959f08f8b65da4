"""METS/GBS backend (B9), image->PDF adaptation (P7), and the
bitmap-coverage OCR decision (P10)."""

from pathlib import Path

import pytest

from docling_spark.kernels.image_kernel import (
    ImageError,
    image_frames,
    image_to_pdf_pages,
)
from docling_spark.kernels.mets_kernel import MetsError, MetsGbsDoc, parse_mets_gbs
from docling_spark.kernels.pdf_kernel import PdfPage, bitmap_coverage, ocr_decision
from docling_spark.operators.convert import convert_one

METS_FIXTURE = Path("/root/reference/tests/data/mets_gbs/32044009881525_select.tar.gz")
WEBP_FIXTURE = Path("/root/reference/tests/data/webp/webp-test.webp")
TIFF_FIXTURE = Path("/root/reference/tests/data/tiff/2206.01062.tif")


# ------------------------------------------------------------- METS/GBS


def test_mets_page_count_and_validity():
    # reference pins 3 pages (test_backend_mets_gbs.py test_num_pages)
    doc = MetsGbsDoc(METS_FIXTURE.read_bytes())
    assert doc.page_count() == 3


def test_mets_text_in_rect_reference_pinned():
    # reference: bbox (275,263,1388,311) on page 0 ->
    # "recently become prevalent that he who speaks"
    doc = MetsGbsDoc(METS_FIXTURE.read_bytes())
    p0 = doc.load_page(0)
    assert (
        p0.text_in_rect(275, 263, 1388, 311).strip()
        == "recently become prevalent that he who speaks"
    )


def test_mets_lines_match_plaintext_ocr_member():
    """Structure parity: hOCR line text must reproduce the archive's own
    plain-text OCR member (modulo whitespace)."""
    doc = MetsGbsDoc(METS_FIXTURE.read_bytes())
    p0 = doc.load_page(0)
    hocr_text = " ".join(c.text for c in p0.line_cells if c.text).split()
    txt = doc._read("00000010.txt").decode("utf-8").split()
    assert hocr_text == txt


def test_mets_feeds_pdf_path():
    pages = parse_mets_gbs(METS_FIXTURE.read_bytes())
    assert len(pages) == 3
    assert all(p.cells for p in pages)
    # hOCR cells carry OCR confidence through the shared geometry
    assert pages[0].width == 1582 and pages[0].height == 2495


def test_mets_router():
    r = convert_one("u", METS_FIXTURE.read_bytes())
    assert (r["fmt"], r["status"]) == ("mets_gbs", "success")
    assert "recently become prevalent" in r["md"]
    import gzip

    r2 = convert_one("u", gzip.compress(b"not a book archive"))
    assert (r2["fmt"], r2["status"]) == ("gzip", "skipped")


def test_mets_garbage():
    with pytest.raises(MetsError):
        MetsGbsDoc(b"not even gzip")


# ----------------------------------------------------------- image -> PDF


def test_webp_single_frame():
    frames = image_frames(WEBP_FIXTURE.read_bytes())
    assert frames == [(2000, 2829)]


def test_tiff_multipage_frames():
    frames = image_frames(TIFF_FIXTURE.read_bytes())
    assert len(frames) == 2
    assert all(f == (612, 792) for f in frames)


def test_image_router_success_with_ocr_score():
    # the P7 done-criterion: webp/tiff produce success rows with an
    # ocr_needed score, not 'skipped'
    for fx in (WEBP_FIXTURE, TIFF_FIXTURE):
        r = convert_one("u", fx.read_bytes())
        assert (r["fmt"], r["status"]) == ("image", "success"), fx.name
        assert r["ocr_needed"] == 1.0


def test_image_garbage():
    with pytest.raises(ImageError):
        image_frames(b"RIFF\x00\x00\x00\x00NOPE")


# ----------------------------------------------------------- P10 decision


def test_ocr_decision_thresholds():
    page = PdfPage(1, 100.0, 100.0)
    assert ocr_decision(page) == (0.0, "none")
    page.bitmap_rects.append((0, 0, 30, 30))  # 9% coverage
    cov, dec = ocr_decision(page)
    assert dec == "rects" and abs(cov - 0.09) < 1e-9
    page.bitmap_rects.append((0, 0, 95, 95))  # dominant coverage
    cov, dec = ocr_decision(page)
    assert dec == "full_page" and cov > 0.9


def test_bitmap_coverage_union_not_sum():
    page = PdfPage(1, 100.0, 100.0)
    # two identical rects: union is 25%, a naive sum would say 50%
    page.bitmap_rects.append((0, 0, 50, 50))
    page.bitmap_rects.append((0, 0, 50, 50))
    assert abs(bitmap_coverage(page) - 0.25) < 1e-9


def test_scanned_pdf_bitmap_rect_from_content_stream():
    """A PDF placing an image XObject via cm+Do must yield a bitmap rect
    at the transformed position."""
    import zlib

    content = b"q 200 0 0 100 50 600 cm /Im0 Do Q BT /F1 10 Tf 72 50 Td (caption) Tj ET"
    comp = zlib.compress(content)
    stream_obj = (
        b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(comp), comp)
    )
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
        b"/Resources << /XObject << /Im0 5 0 R >> >> >>\nendobj\n"
        + stream_obj
        + b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 10 /Height 10 /Length 0 >>\nstream\n\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n"
    )
    from docling_spark.kernels.pdf_kernel import parse_pdf

    pages = parse_pdf(pdf)
    assert pages[0].bitmap_rects == [(50.0, 600.0, 250.0, 700.0)]
    assert pages[0].cells[0].text == "caption"
    cov, dec = ocr_decision(pages[0])
    assert dec == "none"  # small image, text present


def test_wav_header_parse_and_spark_metadata(spark):
    """B11-adjacent: real WAV header parsing (rate/channels/bits/
    duration) + the Spark typed-metadata plumbing."""
    import struct

    from docling_spark.operators.multimodal import (
        extract_audio_metadata,
        parse_wav_header,
    )

    def make_wav(rate=16000, channels=1, bits=16, seconds=2):
        n = rate * channels * (bits // 8) * seconds
        data = b"\x00" * n
        hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    rate * channels * bits // 8,
                                    channels * bits // 8, bits)
        return hdr + fmt + b"data" + struct.pack("<I", n) + data

    meta = parse_wav_header(make_wav())
    assert meta == {"format": "wav", "sample_rate": 16000, "channels": 1,
                    "bits_per_sample": 16, "duration_sec": 2.0}
    assert parse_wav_header(b"RIFF....WEBPnot audio") is None

    rows = [(0, bytearray(make_wav())), (1, bytearray(make_wav(44100, 2, 16, 1))),
            (2, bytearray(b"\xff\xfbmp3-needs-codec"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in extract_audio_metadata(df).collect()}
    assert out[0].duration_sec == 2.0 and out[0].sample_rate == 16000
    assert out[1].channels == 2 and out[1].sample_rate == 44100
    assert out[2].format == "unknown"


def test_mp3_metadata_from_real_fixture():
    """The reference's real audio fixture: the frame-header parse must
    recover the advertised ~10 s duration and the stream parameters."""
    from docling_spark.operators.multimodal import parse_mp3_header

    raw = Path("/root/reference/tests/data/audio/sample_10s.mp3").read_bytes()
    meta = parse_mp3_header(raw)
    assert meta is not None and meta["format"] == "mp3"
    assert meta["sample_rate"] == 44100
    assert 9.0 <= meta["duration_sec"] <= 11.5
    assert parse_mp3_header(b"\x00not audio at all") is None


def test_merge_ocr_cells_drops_overlapping_ocr():
    """P12 (base_ocr_model.py:115-171): OCR cells intersecting ANY
    programmatic cell are dropped; survivors append after the
    programmatic cells; force_full_page replaces them wholesale."""
    from docling_spark.kernels.pdf_kernel import TextCell, merge_ocr_cells

    prog = [
        TextCell("alpha", 10, 700, 100, 712, 12),
        TextCell("beta", 120, 700, 200, 712, 12),
    ]
    ocr = [
        TextCell("ALPHA", 12, 702, 95, 710, 10),    # inside prog[0] -> drop
        TextCell("edge", 100, 700, 118, 712, 10),   # touches prog[0].r (closed) -> drop
        TextCell("below", 10, 650, 100, 662, 10),   # y-disjoint -> keep
        TextCell("right", 220, 700, 300, 712, 10),  # x-disjoint -> keep
    ]
    out = merge_ocr_cells(prog, ocr)
    assert [c.text for c in out] == ["alpha", "beta", "below", "right"]
    assert [c.from_ocr for c in out] == [False, False, True, True]

    # force_full_page: OCR wholesale, all flagged
    out = merge_ocr_cells(prog, ocr, force_full_page=True)
    assert [c.text for c in out] == ["ALPHA", "edge", "below", "right"]
    assert all(c.from_ocr for c in out)

    # no programmatic cells: every OCR cell survives, flagged
    out = merge_ocr_cells([], ocr)
    assert len(out) == 4 and all(c.from_ocr for c in out)

    # order-independence of the prune: shuffled programmatic input
    out2 = merge_ocr_cells(list(reversed(prog)), ocr)
    assert sorted(c.text for c in out2) == sorted(c.text for c in out2)
    assert {c.text for c in out2 if c.from_ocr} == {"below", "right"}


def test_mets_cells_carry_from_ocr_flag():
    import tarfile
    fixture = "/root/reference/tests/data/mets_gbs/32044009881525_select.tar.gz"
    if not tarfile.is_tarfile(fixture):
        return
    from docling_spark.kernels.mets_kernel import parse_mets_gbs

    pages = parse_mets_gbs(open(fixture, "rb").read(), max_pages=1)
    assert pages and pages[0].cells
    assert all(c.from_ocr for c in pages[0].cells)
