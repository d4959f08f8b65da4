"""DOCX backend kernel (B4): .docx bytes -> Doc.

From-scratch OOXML WordprocessingML reader on stdlib zipfile +
xml.etree — the reference uses python-docx
(/root/reference/docling/backend/msword_backend.py, 1282 LoC), which is
not available here. Fixture-driven parity with the reference's md
goldens (tests/data/groundtruth/docling_v2/*.docx.md):

* style-based heading detection (``Heading N``/``Title`` pStyle,
  msword_backend.py:422-469); numbered headings get a ``lvlText``
  prefix computed from numbering.xml counters ("1 ", "1.1 ");
* per-run formatting split into inline groups when a paragraph mixes
  formats/hyperlinks (msword_backend.py:471-483), adjacent same-format
  runs merged;
* hyperlink targets reproduce the reference's Path-normalization quirk
  ("https://x" -> "https:/x" in the goldens);
* numbering.xml drives list vs numbered-list (numFmt bullet/decimal);
  numId=0 paragraphs are NOT list items; nesting via ilvl
  (msword_backend.py:301-335);
* tables with gridSpan / vMerge (msword_backend.py:1171-1243);
  single-cell tables are containers: their content is promoted to
  normal block flow (tablecell.docx golden);
* inline images / drawings -> picture items; textbox content extracted
  as block text, mc:Fallback trees skipped (no double extraction).

Out of scope (documented): OMML equation -> LaTeX (docx/latex/omml.py,
458 LoC — equations render as their plain text), EMF image decode.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from io import BytesIO
from pathlib import PurePosixPath

from .doc_model import (
    Doc,
    Formatting,
    TableCellData,
    TableDataIR,
)
from .omml import omml_to_latex

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
MC = "{http://schemas.openxmlformats.org/markup-compatibility/2006}"
M_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"
A_NS = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def _image_rid(el):
    """r:embed of the first image blip below ``el``, or None when the
    drawing embeds no image (decorative shapes are not pictures —
    textbox golden)."""
    blip = next(el.iter(f"{A_NS}blip"), None)
    if blip is None:
        return None
    return blip.get(f"{R_NS}embed") or blip.get(f"{R_NS}link") or ""

_HEADING_RE = re.compile(r"^Heading(\d+)$", re.IGNORECASE)


class DocxError(Exception):
    pass


def _norm_link(target: str | None) -> str | None:
    if not target:
        return None
    # reference quirk: targets are passed through a Path, collapsing
    # "//" (groundtruth unit_test_formatting.docx.md: "https:/github...")
    return str(PurePosixPath(target))


# ------------------------------------------------------------ numbering


def _load_numbering(z: zipfile.ZipFile) -> dict[tuple[str, int], tuple[str, str]]:
    """(numId, ilvl) -> (numFmt, lvlText)."""
    try:
        root = ET.fromstring(z.read("word/numbering.xml"))
    except KeyError:
        return {}
    abstract: dict[str, dict[int, tuple[str, str]]] = {}
    for an in root.findall(f"{W}abstractNum"):
        aid = an.get(f"{W}abstractNumId")
        levels = {}
        for lvl in an.findall(f"{W}lvl"):
            i = int(lvl.get(f"{W}ilvl", "0"))
            fmt_el = lvl.find(f"{W}numFmt")
            txt_el = lvl.find(f"{W}lvlText")
            levels[i] = (
                fmt_el.get(f"{W}val", "bullet") if fmt_el is not None else "bullet",
                txt_el.get(f"{W}val", "") if txt_el is not None else "",
            )
        abstract[aid] = levels
    out: dict[tuple[str, int], tuple[str, str]] = {}
    for num in root.findall(f"{W}num"):
        nid = num.get(f"{W}numId")
        ref = num.find(f"{W}abstractNumId")
        if ref is None:
            continue
        for i, v in abstract.get(ref.get(f"{W}val"), {}).items():
            out[(nid, i)] = v
    return out


class _NumCounters:
    def __init__(self):
        self.counters: dict[str, dict[int, int]] = {}

    def next_prefix(self, num_id: str, ilvl: int, lvl_text: str) -> str:
        c = self.counters.setdefault(num_id, {})
        for shallower in range(ilvl):  # skipped levels implicitly start at 1
            c.setdefault(shallower, 1)
        c[ilvl] = c.get(ilvl, 0) + 1
        for deeper in [k for k in c if k > ilvl]:
            del c[deeper]

        def sub(m):
            i = int(m.group(1)) - 1
            return str(c.get(i, 1))

        return re.sub(r"%(\d+)", sub, lvl_text)


# ------------------------------------------------------------ run model


class _Seg:
    __slots__ = ("text", "fmt", "link", "is_math")

    def __init__(self, text, fmt, link, is_math=False):
        self.text = text
        self.fmt = fmt
        self.link = link
        self.is_math = is_math

    def key(self):
        return (self.fmt, self.link, self.is_math)


def _run_format(rpr) -> Formatting | None:
    if rpr is None:
        return None

    def on(tag: str) -> bool:
        el = rpr.find(f"{W}{tag}")
        if el is None:
            return False
        val = el.get(f"{W}val")
        return val not in ("0", "false", "none")

    f = Formatting(
        bold=on("b"), italic=on("i"), underline=on("u"), strikethrough=on("strike")
    )
    if not (f.bold or f.italic or f.underline or f.strikethrough):
        return None
    return f


def _collect_segments(p, rels, drawings: list, textboxes: list) -> list[_Seg]:
    """Flatten a paragraph into formatted text segments; records
    drawings and textbox paragraph elements encountered."""
    segs: list[_Seg] = []

    def walk(el, link):
        for child in el:
            tag = child.tag
            if tag == f"{MC}AlternateContent":
                choice = child.find(f"{MC}Choice")
                if choice is not None:
                    walk(choice, link)
                continue  # never descend into mc:Fallback
            if tag == f"{W}hyperlink":
                target = rels.get(child.get(f"{R_NS}id", ""), None) or child.get(
                    f"{W}anchor"
                )
                walk(child, _norm_link(target))
            elif tag == f"{W}r":
                parts: list[str] = []
                for sub in child:
                    if sub.tag == f"{W}t":
                        parts.append(sub.text or "")
                    elif sub.tag == f"{W}tab":
                        parts.append("\t")
                    elif sub.tag == f"{W}br":
                        parts.append("\n")
                    elif sub.tag in (f"{W}drawing", f"{W}pict", f"{W}object"):
                        txbx = list(sub.iter(f"{W}txbxContent"))
                        if txbx:
                            textboxes.extend(txbx)
                        else:
                            rid = _image_rid(sub)
                            if rid is not None:
                                drawings.append(rid)
                    elif sub.tag == f"{MC}AlternateContent":
                        choice = sub.find(f"{MC}Choice")
                        handled = False
                        if choice is not None:
                            txbx = list(choice.iter(f"{W}txbxContent"))
                            if txbx:
                                textboxes.extend(txbx)
                                handled = True
                        if not handled and choice is not None:
                            rid = _image_rid(choice)
                            if rid is not None:
                                drawings.append(rid)
                text = "".join(parts)
                if text:
                    segs.append(_Seg(text, _run_format(child.find(f"{W}rPr")), link))
            elif tag == f"{M_NS}oMathPara":
                for om in child.findall(f"{M_NS}oMath"):
                    latex = omml_to_latex(om).strip()
                    if latex:
                        segs.append(_Seg(latex, None, link, is_math=True))
            elif tag == f"{M_NS}oMath":
                latex = omml_to_latex(child).strip()
                if latex:
                    segs.append(_Seg(latex, None, link, is_math=True))
            elif tag in (f"{W}pPr",):
                continue
            else:
                walk(child, link)

    walk(p, None)
    # merge adjacent segments with identical formatting + link
    merged: list[_Seg] = []
    for s in segs:
        if merged and merged[-1].key() == s.key() and not s.is_math:
            merged[-1].text += s.text
        else:
            merged.append(_Seg(s.text, s.fmt, s.link, s.is_math))
    return merged


# --------------------------------------------------------------- tables


def _cell_text(tc, rels) -> str:
    parts = []
    for p in tc.findall(f"{W}p"):
        segs = _collect_segments(p, rels, [], [])
        t = "".join(
            f"${s.text}$" if s.is_math else s.text for s in segs
        ).strip()
        if t:
            parts.append(t)
    return " ".join(parts)


def _parse_table(tbl, rels) -> TableDataIR:
    rows = tbl.findall(f"{W}tr")
    cells: list[TableCellData] = []
    open_vmerge: dict[int, TableCellData] = {}
    n_cols = 0
    for ri, tr in enumerate(rows):
        ci = 0
        for tc in tr.findall(f"{W}tc"):
            tcpr = tc.find(f"{W}tcPr")
            span = 1
            vmerge = None
            if tcpr is not None:
                gs = tcpr.find(f"{W}gridSpan")
                if gs is not None:
                    span = int(gs.get(f"{W}val", "1"))
                vm = tcpr.find(f"{W}vMerge")
                if vm is not None:
                    vmerge = vm.get(f"{W}val", "continue")
            if vmerge == "continue" and ci in open_vmerge:
                open_vmerge[ci].end_row = ri + 1
                open_vmerge[ci].row_span += 1
                ci += open_vmerge[ci].col_span
                continue
            cell = TableCellData(
                text=_cell_text(tc, rels),
                row_span=1,
                col_span=span,
                start_row=ri,
                end_row=ri + 1,
                start_col=ci,
                end_col=ci + span,
                column_header=ri == 0,
            )
            if vmerge == "restart":
                open_vmerge[ci] = cell
            cells.append(cell)
            ci += span
        n_cols = max(n_cols, ci)
    return TableDataIR(len(rows), n_cols, cells)


# ----------------------------------------------------------------- main


def parse_docx(data: bytes, name: str = "doc") -> Doc:
    try:
        z = zipfile.ZipFile(BytesIO(data))
        xml = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError) as e:
        raise DocxError(f"not a docx: {e}") from e
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise DocxError(f"bad xml: {e}") from e
    rels = _load_rels(z)
    numbering = _load_numbering(z)
    style_numpr = _load_style_numbering(z)
    body = root.find(f"{W}body")
    if body is None:
        raise DocxError("no w:body")

    doc = Doc(name)
    # pre-pass: last paragraph (by element identity) referencing each image
    last_para_for_rid: dict[str, int] = {}
    for p_el in root.iter(f"{W}p"):
        for blip in p_el.iter(f"{A_NS}blip"):
            rid = blip.get(f"{R_NS}embed") or blip.get(f"{R_NS}link") or ""
            last_para_for_rid[rid] = id(p_el)
    emitted_rids: set[str] = set()
    counters = _NumCounters()
    parents: dict[int, object] = {0: None}
    list_stack: list[tuple[int, object]] = []

    def current_parent(level: int = 99):
        best = None
        for lvl in sorted(parents):
            if lvl < level and parents[lvl] is not None:
                best = parents[lvl]
        return best

    def handle_paragraph(p) -> None:
        nonlocal parents
        drawings: list = []
        textboxes: list = []
        segs = _collect_segments(p, rels, drawings, textboxes)
        # each embedded image renders once, at its LAST referencing
        # paragraph (word_image_anchors golden: rId6 is anchored twice,
        # one picture appears, before the second referencing paragraph)
        for rid in drawings:
            if rid and last_para_for_rid.get(rid) not in (None, id(p)):
                continue
            if rid in emitted_rids:
                continue
            if rid:
                emitted_rids.add(rid)
            doc.add_picture(parent=current_parent())
        drawings.clear()
        text = "".join(s.text for s in segs).strip()
        style = _para_style(p)
        num = _para_numbering(p)

        has_math = any(s.is_math for s in segs)
        if has_math:
            list_stack.clear()
            plain = "".join(s.text for s in segs if not s.is_math).strip()
            if not plain:
                # standalone equation(s) (msword_backend.py:877-885)
                doc.add_text(
                    label="formula",
                    text="".join(s.text for s in segs if s.is_math),
                    parent=current_parent(),
                )
            else:
                # inline equation: alternating paragraph/formula nodes in
                # an inline group; pre-equation text keeps its trailing
                # whitespace, the final tail is stripped
                # (msword_backend.py:886-917)
                inline = doc.add_group("inline", parent=current_parent())
                last_math_i = max(i for i, s in enumerate(segs) if s.is_math)
                for i, s in enumerate(segs):
                    if s.is_math:
                        doc.add_text(label="formula", text=s.text, parent=inline)
                        continue
                    t = s.text.strip() if i > last_math_i else s.text
                    if t:
                        doc.add_text(
                            label="paragraph", text=t, formatting=s.fmt,
                            hyperlink=s.link, parent=inline,
                        )
            for _ in drawings:
                pass
            drawings.clear()
            return
        m = _HEADING_RE.match(style)
        is_title = style.lower() == "title"
        if text and (m or is_title):
            list_stack.clear()
            prefix = ""
            # numbering may come from the paragraph OR the heading style
            # (styles.xml pPr/numPr — unit_test_headers_numbered golden)
            hnum = num if num is not None else style_numpr.get(style)
            if hnum is not None:
                num_id, ilvl = hnum
                fmt_lvl = numbering.get((num_id, ilvl))
                if fmt_lvl and fmt_lvl[0] != "bullet":
                    # goldens render "1 " / "1.1 " — trailing dot stripped
                    prefix = (
                        counters.next_prefix(num_id, ilvl, fmt_lvl[1]).rstrip(".")
                        + " "
                    )
            if is_title:
                node = doc.add_title(prefix + text)
                parents = {0: None, 1: node}
            else:
                level = int(m.group(1))
                node = doc.add_heading(
                    prefix + text, level=level, parent=current_parent(level + 1)
                )
                parents = {k: v for k, v in parents.items() if k <= level}
                parents[level + 1] = node
        elif text and num is not None and num[0] != "0":
            num_id, ilvl = num
            fmt_lvl = numbering.get((num_id, ilvl), ("bullet", ""))
            enumerated = fmt_lvl[0] not in ("bullet", "none")
            while list_stack and list_stack[-1][0] > ilvl:
                list_stack.pop()
            if not list_stack or list_stack[-1][0] < ilvl:
                parent = list_stack[-1][1] if list_stack else current_parent()
                group = doc.add_list_group(name="list", parent=parent)
                list_stack.append((ilvl, group))
            group = list_stack[-1][1]
            if len([s for s in segs if s.text.strip()]) > 1:
                item = doc.add_list_item(
                    "", enumerated=enumerated, parent=group
                )
                inline = doc.add_group("inline", parent=item)
                for s in segs:
                    if s.text.strip():
                        doc.add_text(
                            text=s.text.strip(), formatting=s.fmt,
                            hyperlink=s.link, parent=inline,
                        )
            else:
                s = next((x for x in segs if x.text.strip()), None)
                if s:
                    doc.add_list_item(
                        s.text.strip(), enumerated=enumerated,
                        formatting=s.fmt, hyperlink=s.link, parent=group,
                    )
        elif text:
            list_stack.clear()
            segs_ne = [s for s in segs if s.text.strip()]
            if len(segs_ne) > 1:
                inline = doc.add_group("inline", parent=current_parent())
                for s in segs_ne:
                    doc.add_text(
                        text=s.text.strip(), formatting=s.fmt,
                        hyperlink=s.link, parent=inline,
                    )
            else:
                s = segs_ne[0]
                doc.add_text(
                    text=s.text.strip(), formatting=s.fmt, hyperlink=s.link,
                    parent=current_parent(),
                )
        for _ in drawings:
            doc.add_picture(parent=current_parent())
        for tb in textboxes:
            for tp in tb.findall(f"{W}p"):
                handle_paragraph(tp)

    def handle_table(tbl) -> None:
        rows = tbl.findall(f"{W}tr")
        tcs = [tc for tr in rows for tc in tr.findall(f"{W}tc")]
        if len(tcs) == 1:
            # single-cell table = container (tablecell.docx golden):
            # promote contents to block flow, recursively
            for el in tcs[0]:
                if el.tag == f"{W}p":
                    handle_paragraph(el)
                elif el.tag == f"{W}tbl":
                    handle_table(el)
            return
        list_stack.clear()
        doc.add_table(_parse_table(tbl, rels), parent=current_parent())

    for el in body:
        if el.tag == f"{W}tbl":
            handle_table(el)
        elif el.tag == f"{W}p":
            handle_paragraph(el)
    return doc


def _load_rels(z: zipfile.ZipFile) -> dict[str, str]:
    try:
        root = ET.fromstring(z.read("word/_rels/document.xml.rels"))
    except KeyError:
        return {}
    return {
        rel.get("Id"): rel.get("Target", "")
        for rel in root.findall(f"{REL}Relationship")
    }


def _load_style_numbering(z: zipfile.ZipFile) -> dict[str, tuple[str, int]]:
    """styleId -> (numId, ilvl) for styles that carry numbering."""
    try:
        root = ET.fromstring(z.read("word/styles.xml"))
    except KeyError:
        return {}
    out: dict[str, tuple[str, int]] = {}
    for style in root.findall(f"{W}style"):
        sid = style.get(f"{W}styleId", "")
        numpr = style.find(f"{W}pPr/{W}numPr")
        if numpr is None:
            continue
        nid = numpr.find(f"{W}numId")
        ilvl = numpr.find(f"{W}ilvl")
        if nid is not None:
            out[sid] = (
                nid.get(f"{W}val", "0"),
                int(ilvl.get(f"{W}val", "0")) if ilvl is not None else 0,
            )
    return out


def _para_style(p) -> str:
    el = p.find(f"{W}pPr/{W}pStyle")
    return el.get(f"{W}val", "") if el is not None else ""


def _para_numbering(p) -> tuple[str, int] | None:
    """(numId, ilvl) when the paragraph has numbering, else None."""
    numpr = p.find(f"{W}pPr/{W}numPr")
    if numpr is None:
        return None
    nid = numpr.find(f"{W}numId")
    ilvl = numpr.find(f"{W}ilvl")
    num_id = nid.get(f"{W}val", "0") if nid is not None else "0"
    return num_id, int(ilvl.get(f"{W}val", "0")) if ilvl is not None else 0
