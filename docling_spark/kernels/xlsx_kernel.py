"""XLSX/XLSM backend kernel (B3): workbook bytes -> Doc.

From-scratch SpreadsheetML reader on stdlib zipfile + xml.etree — the
reference uses openpyxl (/root/reference/docling/backend/
msexcel_backend.py, 552 LoC). Parity targets its md goldens
(test-01.xlsx.md, sample_sales_data.xlsm.md):

* one section group per sheet named ``sheet: <name>`` (itxt goldens);
  hidden sheets land in the furniture layer (msexcel_backend.py:547);
* compact-rectangle table discovery: from each unvisited non-empty
  cell, the bottom bound scans the start column down while cells are
  non-empty or merged, the right bound scans the start row right
  (msexcel_backend.py:320-478); merged ranges produce row/col spans;
* cell rendering mirrors openpyxl's value coercion: ints stay ints,
  floats keep their dot, booleans are True/False, date-styled serials
  render as ``YYYY-MM-DD HH:MM:SS`` (sample_sales_data golden);
* images in sheet drawings become picture items (charts are not
  images and emit nothing).
"""

from __future__ import annotations

import datetime as _dt
import re
import xml.etree.ElementTree as ET
import zipfile
from io import BytesIO

from .doc_model import INVISIBLE, FURNITURE, BODY, Doc, TableCellData, TableDataIR

S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
XDR = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"
A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"

_DATE_BUILTIN = set(range(14, 23)) | set(range(27, 37)) | set(range(45, 48)) | set(
    range(50, 59)
)
_EPOCH = _dt.datetime(1899, 12, 30)


class XlsxError(Exception):
    pass


def _col_index(ref: str) -> int:
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return col - 1


def _row_index(ref: str) -> int:
    digits = "".join(ch for ch in ref if ch.isdigit())
    return int(digits) - 1 if digits else 0


def _parse_range(ref: str) -> tuple[int, int, int, int]:
    a, b = ref.split(":")
    return _row_index(a), _col_index(a), _row_index(b), _col_index(b)


def _is_date_fmt(code: str) -> bool:
    code = re.sub(r"\[[^\]]*\]", "", code)  # strip color/locale blocks
    code = re.sub(r'"[^"]*"', "", code)
    return bool(re.search(r"[ymdhs]", code, re.IGNORECASE)) and "#" not in code


def _load_styles(z: zipfile.ZipFile) -> list[bool]:
    """Per cellXfs index: is it a date style?"""
    try:
        root = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return []
    custom_date = set()
    for fmt in root.iter(f"{S}numFmt"):
        if _is_date_fmt(fmt.get("formatCode", "")):
            custom_date.add(int(fmt.get("numFmtId", "-1")))
    out = []
    cellxfs = root.find(f"{S}cellXfs")
    if cellxfs is not None:
        for xf in cellxfs.findall(f"{S}xf"):
            nid = int(xf.get("numFmtId", "0"))
            out.append(nid in _DATE_BUILTIN or nid in custom_date)
    return out


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(f"{S}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{S}t")))
    return out


def _coerce(raw: str, t: str | None, is_date: bool) -> object:
    if t == "b":
        return raw == "1"
    if is_date:
        try:
            serial = float(raw)
        except ValueError:
            return raw
        return _EPOCH + _dt.timedelta(days=serial)
    try:
        if "." in raw or "e" in raw.lower():
            return float(raw)
        return int(raw)
    except ValueError:
        return raw


def _to_text(v: object) -> str:
    if v is None:
        return ""
    return str(v)


class _Sheet:
    def __init__(self, name: str, hidden: bool):
        self.name = name
        self.hidden = hidden
        self.cells: dict[tuple[int, int], object] = {}
        self.merged: list[tuple[int, int, int, int]] = []
        self.n_images = 0

    @property
    def max_row(self) -> int:
        return max((r for r, _ in self.cells), default=-1)

    @property
    def max_col(self) -> int:
        return max((c for _, c in self.cells), default=-1)

    def value(self, r: int, c: int):
        return self.cells.get((r, c))

    def merged_at(self, r: int, c: int):
        for mr in self.merged:
            if mr[0] <= r <= mr[2] and mr[1] <= c <= mr[3]:
                return mr
        return None


def _load_sheet(z: zipfile.ZipFile, path: str, name: str, hidden: bool,
                shared: list[str], date_styles: list[bool]) -> _Sheet:
    sheet = _Sheet(name, hidden)
    root = ET.fromstring(z.read(path))
    cur_row = -1
    for row in root.iter(f"{S}row"):
        cur_row = int(row.get("r", cur_row + 2)) - 1
        cur_col = -1
        for c in row.findall(f"{S}c"):
            ref = c.get("r")
            if ref:
                ci = _col_index(ref)
            else:
                ci = cur_col + 1
            cur_col = ci
            t = c.get("t")
            if t == "inlineStr":
                text = "".join(x.text or "" for x in c.iter(f"{S}t"))
                sheet.cells[(cur_row, ci)] = text
                continue
            v = c.find(f"{S}v")
            if v is None or v.text is None:
                continue
            if t == "s":
                sheet.cells[(cur_row, ci)] = shared[int(v.text)]
            elif t == "str":
                sheet.cells[(cur_row, ci)] = v.text
            else:
                style_i = int(c.get("s", "0"))
                is_date = style_i < len(date_styles) and date_styles[style_i]
                sheet.cells[(cur_row, ci)] = _coerce(v.text, t, is_date)
    for mc in root.iter(f"{S}mergeCell"):
        sheet.merged.append(_parse_range(mc.get("ref")))
    return sheet


def _sheet_pictures(z: zipfile.ZipFile, sheet_path: str) -> list[dict]:
    """Images (not charts) from the sheet's drawing, with their cell
    anchors and media payload (msexcel_backend.py:495-522: bbox =
    (from.col, from.row, to.col + 1, to.row + 1), dpi 72)."""
    rels_path = re.sub(r"worksheets/([^/]+)$", r"worksheets/_rels/\1.rels", sheet_path)
    try:
        rels = ET.fromstring(z.read(rels_path))
    except KeyError:
        return []
    out: list[dict] = []
    for rel in rels.findall(f"{REL}Relationship"):
        if not rel.get("Type", "").endswith("/drawing"):
            continue
        target = rel.get("Target", "").replace("../", "xl/")
        try:
            drawing = ET.fromstring(z.read(target))
        except KeyError:
            continue
        d_rels_path = re.sub(r"drawings/([^/]+)$", r"drawings/_rels/\1.rels", target)
        try:
            d_rels = {
                r.get("Id"): r.get("Target", "")
                for r in ET.fromstring(z.read(d_rels_path)).findall(f"{REL}Relationship")
            }
        except KeyError:
            d_rels = {}
        for anchor in drawing:
            pic = anchor.find(f"{XDR}pic")
            if pic is None:
                continue  # charts/graphic frames emit nothing
            def _cell(which):
                el = anchor.find(f"{XDR}{which}")
                if el is None:
                    return (0, 0)
                col = el.find(f"{XDR}col")
                row = el.find(f"{XDR}row")
                return (
                    int(col.text) if col is not None and col.text else 0,
                    int(row.text) if row is not None and row.text else 0,
                )
            fc, fr = _cell("from")
            tc, tr = _cell("to")
            media = None
            blip = pic.find(f"{XDR}blipFill/{A_NS}blip")
            if blip is not None:
                rid = blip.get(f"{R_NS}embed")
                t = d_rels.get(rid, "")
                if t:
                    mpath = t.replace("../", "xl/")
                    try:
                        media = (mpath, z.read(mpath))
                    except KeyError:
                        media = None
            out.append(
                {"bbox": (fc, fr, tc + 1, tr + 1), "media": media}
            )
    return out


# ------------------------------------------------ table discovery (port)


def _find_bottom(sheet: _Sheet, start_row: int, start_col: int) -> int:
    max_row = start_row
    for ri in range(start_row + 1, sheet.max_row + 1):
        mr = sheet.merged_at(ri, start_col)
        if sheet.value(ri, start_col) is None and mr is None:
            break
        if mr is not None:
            max_row = max(max_row, mr[2])
        else:
            max_row = ri
    return max_row


def _find_right(sheet: _Sheet, start_row: int, start_col: int) -> int:
    max_col = start_col
    for cj in range(start_col + 1, sheet.max_col + 1):
        mr = sheet.merged_at(start_row, cj)
        if sheet.value(start_row, cj) is None and mr is None:
            break
        if mr is not None:
            max_col = max(max_col, mr[3])
        else:
            max_col = cj
    return max_col


def _find_tables(sheet: _Sheet) -> list[tuple[int, int, TableDataIR]]:
    """-> (anchor_row, anchor_col, table) per discovered table."""
    tables = []
    visited: set[tuple[int, int]] = set()
    for ri in range(sheet.max_row + 1):
        for rj in range(sheet.max_col + 1):
            if sheet.value(ri, rj) is None or (ri, rj) in visited:
                continue
            max_row = _find_bottom(sheet, ri, rj)
            max_col = _find_right(sheet, ri, rj)
            cells: list[TableCellData] = []
            seen: set[tuple[int, int]] = set()
            for r in range(ri, max_row + 1):
                for c in range(rj, max_col + 1):
                    mr = sheet.merged_at(r, c)
                    row_span = mr[2] - mr[0] + 1 if mr else 1
                    col_span = mr[3] - mr[1] + 1 if mr else 1
                    if (r, c) in seen:
                        continue
                    anchor_val = (
                        sheet.value(mr[0], mr[1]) if mr else sheet.value(r, c)
                    )
                    cells.append(
                        TableCellData(
                            text=_to_text(anchor_val),
                            row_span=row_span,
                            col_span=col_span,
                            start_row=r - ri,
                            end_row=r - ri + row_span,
                            start_col=c - rj,
                            end_col=c - rj + col_span,
                            column_header=r == ri,
                        )
                    )
                    for sr in range(r, r + row_span):
                        for sc in range(c, c + col_span):
                            seen.add((sr, sc))
            visited.update(seen)
            tables.append(
                (ri, rj, TableDataIR(max_row + 1 - ri, max_col + 1 - rj, cells))
            )
    return tables


# ----------------------------------------------------------------- main


def parse_xlsx(data: bytes, name: str = "doc") -> Doc:
    try:
        z = zipfile.ZipFile(BytesIO(data))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    except (zipfile.BadZipFile, KeyError) as e:
        raise XlsxError(f"not an xlsx: {e}") from e
    try:
        rels_root = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rels = {
            rel.get("Id"): rel.get("Target", "")
            for rel in rels_root.findall(f"{REL}Relationship")
        }
    except KeyError:
        rels = {}
    shared = _shared_strings(z)
    date_styles = _load_styles(z)

    doc = Doc(name)
    sheets_el = wb.find(f"{S}sheets")
    if sheets_el is None:
        raise XlsxError("no sheets")
    page_no = 0
    for sh in sheets_el.findall(f"{S}sheet"):
        sheet_name = sh.get("name", "sheet")
        hidden = sh.get("state") in ("hidden", "veryHidden")
        target = rels.get(sh.get(f"{R_NS}id"), "")
        if not target:
            continue
        path = target if target.startswith("xl/") else f"xl/{target}"
        try:
            sheet = _load_sheet(z, path, sheet_name, hidden, shared, date_styles)
        except KeyError:
            continue
        page_no += 1
        # hidden sheets use the 'invisible' layer (msexcel_backend.py
        # _get_sheet_content_layer) — excluded from page-size extents
        layer = INVISIBLE if hidden else BODY
        group = doc.add_group(
            "section", name=f"sheet: {sheet_name}", content_layer=layer
        )

        def _prov(l, t, r, b):
            return [{
                "page_no": page_no,
                "bbox": {"l": float(l), "t": float(t), "r": float(r),
                         "b": float(b), "coord_origin": "TOPLEFT"},
                "charspan": [0, 0],
            }]

        extents: list[tuple] = []
        for ri, rj, table in _find_tables(sheet):
            node = doc.add_table(table, content_layer=layer, parent=group)
            bbox = (rj, ri, rj + table.num_cols, ri + table.num_rows)
            node.prov = _prov(*bbox)
            if layer != INVISIBLE:
                extents.append(bbox)
        for pic in _sheet_pictures(z, path):
            node = doc.add_picture(content_layer=layer, parent=group)
            node.prov = _prov(*pic["bbox"])
            if layer != INVISIBLE:
                extents.append(pic["bbox"])
            if pic["media"] is not None:
                from .image_kernel import image_ref_payload

                node.image = image_ref_payload(*pic["media"])
        # page size = bbox extent of the visible items on the sheet
        # (msexcel_backend.py _find_page_size)
        if extents:
            left = min(e[0] for e in extents)
            top = min(e[1] for e in extents)
            right = max(e[2] for e in extents)
            bottom = max(e[3] for e in extents)
            doc.pages[page_no] = (right - left, bottom - top)
        else:
            doc.pages[page_no] = (0.0, 0.0)
    return doc
