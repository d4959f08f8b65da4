"""Deterministic synthetic PDF generator (pure stdlib).

Produces small-but-real PDF files (classic xref, Helvetica, optional
FlateDecode) for the PDF extraction path — the sandbox strips the
reference's PDF fixtures (/root/reference/tests/.MISSING_LARGE_BLOBS),
so correctness is validated against *constructed* ground truth: every
page is generated from a (title, sections) spec, and the expected
block texts are known by construction.

Layout constants mirror a single-column article: 612x792 media box,
18 pt title, 14 pt section headers, 10 pt body lines on 14 pt leading.
"""

from __future__ import annotations

import zlib

PAGE_W, PAGE_H = 612, 792
TITLE_SIZE, HEAD_SIZE, BODY_SIZE = 18, 14, 10
LEADING = 14
MARGIN_X, TOP_Y = 72, 720


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _page_stream(blocks: list[tuple[str, str]]) -> bytes:
    """blocks: (kind, text) with kind in title|heading|body|gap."""
    out = ["BT", f"{LEADING} TL", f"1 0 0 1 {MARGIN_X} {TOP_Y} Tm"]
    for kind, text in blocks:
        if kind == "gap":
            out.append("T*")
            continue
        size = {"title": TITLE_SIZE, "heading": HEAD_SIZE}.get(kind, BODY_SIZE)
        out.append(f"/F1 {size} Tf")
        for line in text.split("\n"):
            out.append(f"({_esc(line)}) Tj")
            out.append("T*")
        out.append("T*")  # paragraph gap (one extra leading)
    out.append("ET")
    return "\n".join(out).encode("latin-1")


def build_pdf(pages: list[list[tuple[str, str]]], compress: bool = True) -> bytes:
    """Assemble a classic-xref PDF from per-page block lists."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)  # 1-based object number

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_ids = []
    for page_blocks in pages:
        data = _page_stream(page_blocks)
        if compress:
            comp = zlib.compress(data)
            content_ids.append(
                add(
                    b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                    % (len(comp), comp)
                )
            )
        else:
            content_ids.append(
                add(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(data), data))
            )

    pages_id = len(objects) + len(pages) + 1
    page_ids = []
    for cid in content_ids:
        page_ids.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /Contents %d 0 R "
                b"/Resources << /Font << /F1 %d 0 R >> >> >>" % (pages_id, cid, font)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [%s] /Count %d /MediaBox [0 0 %d %d] >>"
        % (kids, len(page_ids), PAGE_W, PAGE_H)
    ) == pages_id
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_id)

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, catalog, xref_pos)
    )
    return bytes(buf)


def _wrap(words: list[str], per_line: int) -> list[str]:
    return [
        " ".join(words[i : i + per_line]) for i in range(0, len(words), per_line)
    ] or [""]


def doc_spec(doc_id: int, text: str) -> tuple[list[list[tuple[str, str]]], dict]:
    """Deterministic article spec for one synthetic document.

    Returns (pages, expected): ``expected`` holds the title, the section
    header texts, and every body paragraph text as the layout kernel
    should reconstruct them (multi-line paragraphs joined with spaces).
    """
    words = text.split() or ["lorem"]
    title = " ".join(words[:3]).title() + f" {doc_id}"
    n_sections = 2 + doc_id % 3
    n_pages = 1 + doc_id % 2
    sections = []
    for s in range(n_sections):
        head = f"Section {s + 1}: " + " ".join(
            words[(s * 5) % len(words) : (s * 5) % len(words) + 2]
        )
        body_words = words[(s * 11) % len(words) :][:40] or ["filler"]
        lines = _wrap(body_words, 8)
        sections.append((head, lines))

    pages: list[list[tuple[str, str]]] = []
    per_page = max(1, (n_sections + n_pages - 1) // n_pages)
    expected_heads, expected_paras = [], []
    for p in range(n_pages):
        blocks: list[tuple[str, str]] = []
        if p == 0:
            blocks.append(("title", title))
        for head, lines in sections[p * per_page : (p + 1) * per_page]:
            blocks.append(("heading", head))
            blocks.append(("body", "\n".join(lines)))
            expected_heads.append(head)
            expected_paras.append(" ".join(lines))
        if blocks:
            pages.append(blocks)
    expected = {
        "title": title,
        "headings": expected_heads,
        "paragraphs": expected_paras,
        "n_pages": len(pages),
    }
    return pages, expected


def render_doc_pdf(doc_id: int, text: str, compress: bool = True) -> bytes:
    pages, _ = doc_spec(doc_id, text)
    return build_pdf(pages, compress=compress)


def synthesize_pdf_pages(spark, sf_dir: str, n_docs: int | None = None):
    """Distributed synthetic PDF corpus: (url, warc_ts, content binary)
    derived from the driver's documents parquet, one PDF per doc."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType, TimestampType,
    )
    import datetime as dt

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if n_docs is not None:
        docs = docs.filter(F.col("doc_id") < n_docs)

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("content", BinaryType()),
        ]
    )
    epoch = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def render(batches):
        for pdf_batch in batches:
            ids = pdf_batch["doc_id"].tolist()
            texts = pdf_batch["text"].tolist()
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "url": [f"https://pdf.example.com/doc/{i}.pdf" for i in ids],
                    "warc_ts": [epoch + dt.timedelta(seconds=int(i)) for i in ids],
                    "content": [render_doc_pdf(i, t) for i, t in zip(ids, texts)],
                }
            )

    return docs.mapInPandas(render, schema)
