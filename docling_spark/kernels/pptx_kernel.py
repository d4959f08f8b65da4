"""PPTX backend kernel (B5): .pptx bytes -> Doc.

From-scratch PresentationML reader on stdlib zipfile + xml.etree — the
reference uses python-pptx (/root/reference/docling/backend/
mspowerpoint_backend.py, 398 LoC). Parity with its goldens:

* one ``chapter`` group per slide named ``slide-N``
  (mspowerpoint_backend.py:333-335), slides in sldIdLst order;
* shape walk in spTree order, groups recursed
  (mspowerpoint_backend.py:340-377);
* list detection per paragraph: a:buChar -> bullet, a:buAutoNum ->
  numbered (markers "1."...), pPr lvl>0 -> unnumbered sub-list; one
  list group per text frame (mspowerpoint_backend.py:133-186);
* non-list paragraphs: placeholder title/ctrTitle -> title, subTitle ->
  section_header, else the ``paragraph`` label
  (mspowerpoint_backend.py:190-209);
* tables: one TableCell per non-empty a:tc with gridSpan/rowSpan spans
  (mspowerpoint_backend.py:256-318);
* p:pic with an image blip -> picture; notes slides -> furniture text
  (mspowerpoint_backend.py:380-396).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from io import BytesIO

from .doc_model import BODY, FURNITURE, Doc, TableCellData, TableDataIR

P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
R_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


class PptxError(Exception):
    pass


def _rels_for(z: zipfile.ZipFile, part: str) -> dict[str, str]:
    d, _, fname = part.rpartition("/")
    try:
        root = ET.fromstring(z.read(f"{d}/_rels/{fname}.rels"))
    except KeyError:
        return {}
    out = {}
    for rel in root.findall(f"{REL}Relationship"):
        target = rel.get("Target", "")
        target = re.sub(r"^\.\./", "ppt/", target)
        if not target.startswith("ppt/") and not target.startswith("http"):
            target = f"{d}/{target}"
        out[rel.get("Id")] = target
    return out


def _para_text(p_el) -> str:
    """Runs concatenated; line breaks become spaces
    (mspowerpoint_backend.py:156-162)."""
    parts = []
    for child in p_el:
        if child.tag == f"{A}r" or child.tag == f"{A}fld":
            t = child.find(f"{A}t")
            parts.append(t.text or "" if t is not None else "")
        elif child.tag == f"{A}br":
            parts.append(" ")
    return "".join(parts)


def _is_list_item(p_el) -> tuple[bool, str]:
    if next(p_el.iter(f"{A}buChar"), None) is not None:
        return True, "Bullet"
    if next(p_el.iter(f"{A}buAutoNum"), None) is not None:
        return True, "Numbered"
    ppr = p_el.find(f"{A}pPr")
    if ppr is not None and int(ppr.get("lvl", "0")) > 0:
        return True, "None"
    return False, "None"


def _ph_type(sp) -> str | None:
    ph = next(sp.iter(f"{P}ph"), None)
    if ph is None:
        return None
    return ph.get("type", "obj")


def _cell_text(tc) -> str:
    paras = [
        _para_text(p_el) for p_el in tc.iter(f"{A}p")
    ]
    return "\n".join(paras).strip()


def _parse_table(tbl) -> TableDataIR | None:
    rows = tbl.findall(f"{A}tr")
    num_rows = len(rows)
    num_cols = 0
    cells: list[TableCellData] = []
    for ri, tr in enumerate(rows):
        tcs = tr.findall(f"{A}tc")
        num_cols = max(num_cols, len(tcs))
        for ci, tc in enumerate(tcs):
            row_span = int(tc.get("rowSpan", "1"))
            col_span = int(tc.get("gridSpan", "1"))
            text = _cell_text(tc)
            if not text:
                continue
            cells.append(
                TableCellData(
                    text=text,
                    row_span=row_span,
                    col_span=col_span,
                    start_row=ri,
                    end_row=ri + row_span,
                    start_col=ci,
                    end_col=ci + col_span,
                    column_header=ri == 0,
                )
            )
    if not cells:
        return None
    return TableDataIR(num_rows, num_cols, cells)


def parse_pptx(data: bytes, name: str = "doc") -> Doc:
    try:
        z = zipfile.ZipFile(BytesIO(data))
        pres = ET.fromstring(z.read("ppt/presentation.xml"))
    except (zipfile.BadZipFile, KeyError) as e:
        raise PptxError(f"not a pptx: {e}") from e
    pres_rels = _rels_for(z, "ppt/presentation.xml")

    doc = Doc(name)
    sld_sz = pres.find(f"{P}sldSz")
    slide_w = int(sld_sz.get("cx", "0")) if sld_sz is not None else 0
    slide_h = int(sld_sz.get("cy", "0")) if sld_sz is not None else 0
    slide_parts: list[str] = []
    sld_lst = pres.find(f"{P}sldIdLst")
    if sld_lst is not None:
        for sld in sld_lst.findall(f"{P}sldId"):
            target = pres_rels.get(sld.get(f"{R_NS}id"), "")
            if target:
                slide_parts.append(target)

    for slide_ind, part in enumerate(slide_parts):
        try:
            slide = ET.fromstring(z.read(part))
        except (KeyError, ET.ParseError):
            continue
        slide_rels = _rels_for(z, part)
        parent_slide = doc.add_group("chapter", name=f"slide-{slide_ind}")
        doc.pages[slide_ind + 1] = (float(slide_w), float(slide_h))

        def _ph_key(sp):
            ph = next(sp.iter(f"{P}ph"), None)
            if ph is None:
                return None
            return (ph.get("type"), ph.get("idx"))

        def _xfrm_box(sp):
            xfrm = next(sp.iter(f"{A}xfrm"), None) or next(sp.iter(f"{P}xfrm"), None)
            off = xfrm.find(f"{A}off") if xfrm is not None else None
            ext = xfrm.find(f"{A}ext") if xfrm is not None else None
            if off is None or ext is None:
                return None
            return (int(off.get("x", "0")), int(off.get("y", "0")),
                    int(ext.get("cx", "0")), int(ext.get("cy", "0")))

        # placeholders without explicit geometry inherit from the slide
        # layout, then the layout's master (python-pptx resolution order)
        inherited: dict = {}
        for lay_target in _rels_for(z, part).values():
            if "slideLayout" not in lay_target or lay_target.endswith(".rels"):
                continue
            chain = [lay_target]
            for m_target in _rels_for(z, lay_target).values():
                if "slideMaster" in m_target and not m_target.endswith(".rels"):
                    chain.append(m_target)
            for part_path in reversed(chain):  # master first, layout wins
                try:
                    root = ET.fromstring(z.read(part_path))
                except (KeyError, ET.ParseError):
                    continue
                for lsp in root.iter(f"{P}sp"):
                    key = _ph_key(lsp)
                    box = _xfrm_box(lsp)
                    if key is not None and box is not None:
                        inherited[key] = box
                        if key[0] in ("title", "ctrTitle"):
                            inherited[("title-any", None)] = box
            break

        def make_prov(sp, text: str) -> list:
            """ProvenanceItem dict (mspowerpoint_backend.py:103-123):
            raw EMU shape box labeled BOTTOMLEFT (l=x, b=y, r=x+cx,
            t=y+cy — the reference does not flip), full-slide fallback
            when the shape has no/zero left offset, charspan over the
            whole shape text (shared by every item the shape emits)."""
            box = _xfrm_box(sp)
            if box is None:
                key = _ph_key(sp)
                box = inherited.get(key)
                if box is None and key is not None and key[0] in ("title", "ctrTitle"):
                    box = inherited.get(("title-any", None))
            x, y, cx, cy = box if box is not None else (0, 0, 0, 0)
            if not x:  # 0/absent left -> full-slide box (reference quirk)
                x, y, cx, cy = 0, 0, slide_w, slide_h
            return [{
                "page_no": slide_ind + 1,
                "bbox": {"l": float(x), "t": float(y + cy), "r": float(x + cx),
                         "b": float(y), "coord_origin": "BOTTOMLEFT"},
                "charspan": [0, len(text)],
            }]

        def handle_text(sp) -> None:
            tx = next(sp.iter(f"{P}txBody"), None)
            if tx is None:
                return
            paragraphs = tx.findall(f"{A}p")
            total = "".join(_para_text(p_el) for p_el in paragraphs).strip()
            if not total:
                return
            ph = _ph_type(sp)
            shape_text = "\n".join(_para_text(p_el) for p_el in paragraphs).strip()
            _prov = make_prov(sp, shape_text)

            def prov_copy(_p=_prov):
                # fresh list+dicts per node: a shared mutable prov would
                # let one node's in-place edit silently alter siblings
                return [
                    {**d, "bbox": dict(d["bbox"]), "charspan": list(d["charspan"])}
                    for d in _p
                ]
            list_group = None
            enum_value = 0
            for p_el in paragraphs:
                p_text = _para_text(p_el)
                is_list, bullet_type = _is_list_item(p_el)
                if is_list:
                    enumerated = bullet_type == "Numbered"
                    if list_group is None:
                        list_group = doc.add_list_group(
                            name="list", parent=parent_slide
                        )
                        enum_value = 0
                    marker = ""
                    if enumerated:
                        enum_value += 1
                        marker = f"{enum_value}."
                    doc.add_list_item(
                        p_text, enumerated=enumerated, marker=marker,
                        parent=list_group,
                    ).prov = prov_copy()
                else:
                    if ph in ("title", "ctrTitle"):
                        doc.add_title(p_text, parent=parent_slide).prov = prov_copy()
                    # NOTE: subTitle stays a paragraph — the reference's
                    # branch (mspowerpoint_backend.py:200-201) evaluates
                    # DocItemLabel.SECTION_HEADER without assigning it,
                    # and the goldens pin that behavior
                    else:
                        doc.add_text(
                            label="paragraph", text=p_text, parent=parent_slide
                        ).prov = prov_copy()

        def handle_shape(sp) -> None:
            tag = sp.tag
            if tag == f"{P}grpSp":
                for child in sp:
                    if child.tag in (
                        f"{P}sp", f"{P}grpSp", f"{P}graphicFrame", f"{P}pic"
                    ):
                        handle_shape(child)
                return
            if tag == f"{P}graphicFrame":
                tbl = next(sp.iter(f"{A}tbl"), None)
                if tbl is not None:
                    table = _parse_table(tbl)
                    if table is not None:
                        doc.add_table(table, parent=parent_slide).prov = (
                            make_prov(sp, "")
                        )
                return
            if tag == f"{P}pic":
                blip = next(sp.iter(f"{A}blip"), None)
                if blip is not None:
                    node = doc.add_picture(parent=parent_slide)
                    node.prov = make_prov(sp, "")
                    rid = blip.get(f"{R_NS}embed")
                    target = slide_rels.get(rid, "")
                    if target:
                        try:
                            from .image_kernel import image_ref_payload

                            node.image = image_ref_payload(target, z.read(target))
                        except KeyError:
                            pass
                return
            if tag == f"{P}sp":
                handle_text(sp)

        tree = slide.find(f"{P}cSld/{P}spTree")
        if tree is not None:
            for sp in tree:
                if sp.tag in (f"{P}sp", f"{P}grpSp", f"{P}graphicFrame", f"{P}pic"):
                    handle_shape(sp)

        # notes slide -> furniture (mspowerpoint_backend.py:380-396)
        for rid, target in slide_rels.items():
            if "notesSlide" in target:
                try:
                    notes = ET.fromstring(z.read(target))
                except (KeyError, ET.ParseError):
                    continue
                notes_text = "\n".join(
                    filter(None, (_para_text(p_el) for p_el in notes.iter(f"{A}p")))
                ).strip()
                if notes_text:
                    node = doc.add_text(
                        label="text", text=notes_text,
                        content_layer=FURNITURE, parent=parent_slide,
                    )
                    # notes carry a zero bbox, TOPLEFT (the reference's
                    # handle_notes emits a size-less provenance)
                    node.prov = [{
                        "page_no": slide_ind + 1,
                        "bbox": {"l": 0.0, "t": 0.0, "r": 0.0, "b": 0.0,
                                 "coord_origin": "TOPLEFT"},
                        "charspan": [0, len(notes_text)],
                    }]
    return doc
