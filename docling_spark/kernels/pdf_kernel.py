"""Minimal from-scratch PDF text extraction (stdlib only).

Plays the role of the reference's pdfium backend
(/root/reference/docling/backend/pypdfium2_backend.py): open document,
enumerate pages, produce positioned text cells per page. The sandbox has
no pypdfium2/C++ parser, so this is a real — deliberately small — PDF
reader for the "programmatic text" subset that matters for a crawl
pipeline:

* classic cross-reference tables AND a lenient full-file object scan
  (crawl PDFs are frequently truncated or have broken xref offsets);
* FlateDecode streams (zlib is stdlib); unfiltered streams;
* page-tree walk with MediaBox inheritance;
* content-stream text interpreter: BT/ET, Tf, Td, TD, TL, Tm, T*,
  Tj, ', ", TJ with full text-matrix tracking.

Out of scope (documented, gated): encrypted files, object streams
(/ObjStm), CID/CMap font decoding (strings are decoded as
PDFDocEncoding≈latin-1), CTM tracking for rotated/scaled pages. Cells
from such files degrade to fewer/garbled cells and are caught by the
parse-quality score (pdf_layout.rate_text_quality) instead of crashing
— errors-as-data, like the rest of the engine.

Geometry: emitted cells use BOTTOMLEFT origin like pdfium
(pypdfium2_backend.py:140-151); ``PdfPage.cells_top_left`` converts.
Advance widths use a flat per-glyph estimate (0.5 em) because embedded
font metrics are not parsed; the downstream merge threshold is relative
to cell height, so line merging is insensitive to the approximation.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field


class PdfError(Exception):
    pass


# ------------------------------------------------------------ object model


@dataclass(frozen=True)
class Ref:
    num: int


class Name(str):
    """PDF name object (distinct from string values)."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment
                while self.pos < n and d[self.pos] not in (0x0A, 0x0D):
                    self.pos += 1
            else:
                return

    def peek_bytes(self, n: int) -> bytes:
        return self.data[self.pos : self.pos + n]

    def parse_object(self):
        self._skip_ws()
        d, p = self.data, self.pos
        if p >= len(d):
            raise PdfError("eof")
        c = d[p]
        if c == 0x2F:  # /Name
            return self._parse_name()
        if c == 0x28:  # (string)
            return self._parse_literal_string()
        if c == 0x3C:  # << dict or <hex>
            if d[p : p + 2] == b"<<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == 0x5B:  # [array]
            return self._parse_array()
        if d[p : p + 4] == b"true":
            self.pos += 4
            return True
        if d[p : p + 5] == b"false":
            self.pos += 5
            return False
        if d[p : p + 4] == b"null":
            self.pos += 4
            return None
        return self._parse_number_or_ref()

    def _parse_name(self) -> Name:
        d = self.data
        self.pos += 1
        start = self.pos
        n = len(d)
        out = []
        while self.pos < n:
            c = d[self.pos]
            if c in _WS or c in _DELIM:
                break
            if c == 0x23 and self.pos + 2 < n:  # #xx escape
                out.append(d[start : self.pos])
                out.append(bytes([int(d[self.pos + 1 : self.pos + 3], 16)]))
                self.pos += 3
                start = self.pos
            else:
                self.pos += 1
        out.append(d[start : self.pos])
        return Name(b"".join(out).decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        depth = 1
        out = bytearray()
        n = len(d)
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    self.pos += 1
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and self.pos < n and 0x30 <= d[self.pos] <= 0x37:
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        end = d.index(b">", self.pos)
        hexs = re.sub(rb"[^0-9A-Fa-f]", b"", d[self.pos : end])
        self.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))

    def _parse_dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        while True:
            self._skip_ws()
            if self.peek_bytes(2) == b">>":
                self.pos += 2
                return out
            key = self.parse_object()
            if not isinstance(key, Name):
                raise PdfError(f"dict key is not a name: {key!r}")
            out[str(key)] = self.parse_object()

    def _parse_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos < len(self.data) and self.data[self.pos] == 0x5D:
                self.pos += 1
                return out
            out.append(self.parse_object())

    _NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")

    def _parse_number_or_ref(self):
        d = self.data
        m = self._NUM_RE.match(d, self.pos)
        if not m:
            raise PdfError(f"bad token at {self.pos}: {d[self.pos:self.pos+20]!r}")
        tok = m.group()
        self.pos = m.end()
        if b"." in tok:
            return float(tok)
        # "N G R" indirect reference lookahead
        save = self.pos
        self._skip_ws()
        m2 = self._NUM_RE.match(d, self.pos)
        if m2:
            after = m2.end()
            probe = _Lexer(d, after)
            probe._skip_ws()
            if probe.peek_bytes(1) == b"R" and (
                probe.pos + 1 >= len(d) or d[probe.pos + 1] in _WS or d[probe.pos + 1] in _DELIM
            ):
                self.pos = probe.pos + 1
                return Ref(int(tok))
        self.pos = save
        return int(tok)


# ------------------------------------------------------------- document


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


class PdfDocument:
    """Object store + page tree for one PDF file."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF header")
        self.data = data
        self.objects: dict[int, tuple[object, bytes | None]] = {}
        self._scan_objects()
        if not self.objects:
            raise PdfError("no objects found")

    def _scan_objects(self) -> None:
        """Lenient full-file scan for ``N G obj`` — tolerates broken or
        absent xref tables, which crawl-corpus PDFs routinely have."""
        d = self.data
        for m in _OBJ_RE.finditer(d):
            num = int(m.group(1))
            lex = _Lexer(d, m.end())
            try:
                value = lex.parse_object()
            except PdfError:
                continue
            stream = None
            lex._skip_ws()
            if lex.peek_bytes(6) == b"stream":
                sm = _STREAM_RE.match(d, lex.pos)
                if sm:
                    start = sm.end()
                    length = None
                    if isinstance(value, dict):
                        length = self.resolve_later(value.get("Length"))
                    if isinstance(length, int) and 0 <= length <= len(d) - start:
                        stream = d[start : start + length]
                        # trust /Length only if endstream follows
                        tail = d[start + length : start + length + 20]
                        if b"endstream" not in tail:
                            stream = None
                    if stream is None:
                        end = d.find(b"endstream", start)
                        if end == -1:
                            end = len(d)
                        stream = d[start:end].rstrip(b"\r\n")
            self.objects[num] = (value, stream)

    # /Length may itself be an indirect ref — resolvable only after the
    # scan; during the scan fall back to endstream search.
    def resolve_later(self, v):
        if isinstance(v, Ref):
            got = self.objects.get(v.num)
            return got[0] if got else None
        return v

    def resolve(self, v):
        seen = 0
        while isinstance(v, Ref):
            got = self.objects.get(v.num)
            v = got[0] if got else None
            seen += 1
            if seen > 32:
                raise PdfError("reference cycle")
        return v

    def stream_bytes(self, obj_num: int) -> bytes:
        value, stream = self.objects[obj_num]
        if stream is None:
            return b""
        filt = self.resolve(value.get("Filter")) if isinstance(value, dict) else None
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        out = stream
        for f in filters:
            f = self.resolve(f)
            if str(f) == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error as e:
                    raise PdfError(f"flate: {e}") from e
            else:
                raise PdfError(f"unsupported filter {f}")
        return out

    def _catalog(self) -> dict:
        # prefer trailer /Root; fall back to scanning for /Type /Catalog
        m = None
        for tm in re.finditer(rb"trailer", self.data):
            m = tm
        if m:
            try:
                lex = _Lexer(self.data, m.end())
                trailer = lex.parse_object()
                root = self.resolve(trailer.get("Root"))
                if isinstance(root, dict):
                    return root
            except PdfError:
                pass
        for value, _ in self.objects.values():
            if isinstance(value, dict) and str(value.get("Type")) == "Catalog":
                return value
        raise PdfError("no catalog")

    def page_dicts(self) -> list[dict]:
        catalog = self._catalog()
        pages_root = self.resolve(catalog.get("Pages"))
        out: list[dict] = []

        def walk(node, inherited_mediabox, depth=0):
            if not isinstance(node, dict) or depth > 64:
                return
            mediabox = self.resolve(node.get("MediaBox")) or inherited_mediabox
            t = str(node.get("Type"))
            if t == "Pages":
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(self.resolve(kid), mediabox, depth + 1)
            elif t == "Page":
                page = dict(node)
                page["MediaBox"] = mediabox or [0, 0, 612, 792]
                out.append(page)

        walk(pages_root, None)
        if not out:
            # damaged page tree: treat every /Type /Page object as a page
            for value, _ in self.objects.values():
                if isinstance(value, dict) and str(value.get("Type")) == "Page":
                    page = dict(value)
                    page["MediaBox"] = self.resolve(value.get("MediaBox")) or [0, 0, 612, 792]
                    out.append(page)
        return out

    def page_content(self, page: dict) -> bytes:
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            if isinstance(r, Ref) and r.num in self.objects:
                try:
                    parts.append(self.stream_bytes(r.num))
                except PdfError:
                    continue
        return b"\n".join(parts)


# ----------------------------------------------------- content interpreter


@dataclass
class TextCell:
    """Positioned text run, BOTTOMLEFT origin (pdfium rect convention,
    pypdfium2_backend.py:140-151)."""

    text: str
    l: float
    b: float
    r: float
    t: float
    size: float


@dataclass
class PdfPage:
    page_no: int
    width: float
    height: float
    cells: list[TextCell] = field(default_factory=list)

    def cells_top_left(self) -> list[TextCell]:
        """Convert to TOPLEFT origin (docling's working coordinate)."""
        return [
            TextCell(
                c.text,
                c.l,
                self.height - c.b,  # TL bottom (larger y)
                c.r,
                self.height - c.t,  # TL top (smaller y)
                c.size,
            )
            for c in self.cells
        ]


_AVG_GLYPH_EM = 0.5  # flat Helvetica-ish advance estimate per glyph

_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def interpret_text(content: bytes, page_no: int, width: float, height: float) -> PdfPage:
    """Run the text-showing subset of the content stream, one TextCell
    per showing operator (pdfium's count_rects granularity before the
    reference's merge pass)."""
    page = PdfPage(page_no, width, height)
    lex = _Lexer(content)
    stack: list = []
    tm = tlm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    font_size = 0.0
    leading = 0.0
    in_text = False
    n = len(content)

    def show(raw) -> None:
        nonlocal tm
        if isinstance(raw, bytes):
            text = raw.decode("latin-1")
        elif isinstance(raw, str):
            text = raw
        else:
            return
        if not in_text or not text:
            return
        a, b_, c, d, e, f = tm
        scale = abs(d) or 1.0
        eff_size = font_size * scale
        adv = len(text) * _AVG_GLYPH_EM * font_size
        x1 = e + adv * (abs(a) or 1.0)
        page.cells.append(
            TextCell(text, e, f, x1, f + eff_size, eff_size)
        )
        tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)

    while lex.pos < n:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = content[lex.pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or (
            0x30 <= c <= 0x39 or c in (0x2B, 0x2D, 0x2E)
        ):
            try:
                stack.append(lex.parse_object())
            except PdfError:
                lex.pos += 1
            continue
        m = _OP_RE.match(content, lex.pos)
        if not m:
            lex.pos += 1
            continue
        op = m.group()
        lex.pos = m.end()
        try:
            if op == b"BT":
                in_text = True
                tm = tlm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(stack) >= 2:
                font_size = float(stack[-1])
            elif op == b"TL" and stack:
                leading = float(stack[-1])
            elif op == b"Td" and len(stack) >= 2:
                tlm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), tlm)
                tm = tlm
            elif op == b"TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                tlm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), tlm)
                tm = tlm
            elif op == b"Tm" and len(stack) >= 6:
                tlm = tm = tuple(float(v) for v in stack[-6:])
            elif op == b"T*":
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -leading), tlm)
                tm = tlm
            elif op == b"Tj" and stack:
                show(stack[-1])
            elif op == b"'" and stack:
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -leading), tlm)
                tm = tlm
                show(stack[-1])
            elif op == b'"' and len(stack) >= 3:
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -leading), tlm)
                tm = tlm
                show(stack[-1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, (bytes, str)):
                        show(el)
                    elif isinstance(el, (int, float)):
                        # kerning displacement; a large negative gap is an
                        # inter-word space the font left out
                        shift = -float(el) / 1000.0 * font_size
                        tm = _mat_mul((1, 0, 0, 1, shift, 0), tm)
        except (TypeError, ValueError):
            pass
        stack.clear()
    return page


def parse_pdf(data: bytes, max_pages: int | None = None) -> list[PdfPage]:
    """bytes -> positioned text cells per page. Raises PdfError on
    undecodable input (caller converts to a failure row)."""
    doc = PdfDocument(data)
    pages = []
    for i, pd in enumerate(doc.page_dicts()):
        if max_pages is not None and i >= max_pages:
            break
        mb = [float(v) for v in pd["MediaBox"][:4]]
        w, h = mb[2] - mb[0], mb[3] - mb[1]
        content = doc.page_content(pd)
        pages.append(interpret_text(content, i + 1, w, h))
    if not pages:
        raise PdfError("no pages")
    return pages
