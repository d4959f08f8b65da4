"""DocTags serializer (E3 in SURVEY.md §2.6).

Token-stream export mirroring the observed fixture shape
(/root/reference/tests/data/groundtruth/docling_v2/*.doctags.txt):
``<doctag>`` wrapper; one element per line as
``<label><loc_l><loc_t><loc_r><loc_b>text</label>`` with 0-500
quantized page-relative coordinates when geometry exists; HTML-origin
documents have no geometry, so their tags carry no ``loc_*`` (the
reference emits locs only for paginated backends).

Label mapping follows the fixtures: section headers serialize as
``section_header_level_N``, list groups as ``<unordered_list>`` /
``<ordered_list>`` containers with ``<list_item>`` children, code as
``<code>``, pictures as ``<picture>``, tables as ``<otsl>`` rows of
``<fcel>`` cells (structure-only subset).
"""

from __future__ import annotations

from .doc_model import (
    BODY,
    CODE,
    GROUP,
    G_LIST,
    LIST_ITEM,
    PICTURE,
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
    Doc,
)


def _loc(bbox, page_w: float, page_h: float) -> str:
    if bbox is None or not page_w or not page_h:
        return ""
    l, t, r, b = bbox
    q = lambda v, d: max(0, min(500, round(v / d * 500)))  # noqa: E731
    return f"<loc_{q(l, page_w)}><loc_{q(t, page_h)}><loc_{q(r, page_w)}><loc_{q(b, page_h)}>"


def export_to_doctags(
    doc: Doc,
    bboxes: dict[int, tuple] | None = None,
    page_w: float = 0.0,
    page_h: float = 0.0,
) -> str:
    """``bboxes`` optionally maps node_id -> (l, t, r, b)."""
    bboxes = bboxes or {}
    parts: list[str] = ["<doctag>"]

    def loc_for(node_id: int) -> str:
        return _loc(bboxes.get(node_id), page_w, page_h)

    def otsl(table) -> str:
        """OTSL token stream with the reference's full cell vocabulary
        (observed in *.doctags.txt): <fcel> full, <ecel> empty, <ched>
        column header, <rhed> row header, <lcel> colspan continuation,
        <ucel> rowspan continuation, <nl> row end."""
        origin: dict[tuple[int, int], object] = {}
        covered: dict[tuple[int, int], object] = {}
        for c in table.cells:
            for r in range(c.start_row, min(c.end_row, table.num_rows)):
                for k in range(c.start_col, min(c.end_col, table.num_cols)):
                    covered[(r, k)] = c
            origin[(c.start_row, c.start_col)] = c
        toks: list[str] = []
        for r in range(table.num_rows):
            for k in range(table.num_cols):
                cell = covered.get((r, k))
                if cell is None:
                    toks.append("<ecel>")
                elif (r, k) == (cell.start_row, cell.start_col):
                    if cell.column_header:
                        toks.append(f"<ched>{cell.text}")
                    elif cell.row_header:
                        toks.append(f"<rhed>{cell.text}")
                    elif cell.text:
                        toks.append(f"<fcel>{cell.text}")
                    else:
                        toks.append("<ecel>")
                elif r == cell.start_row:
                    toks.append("<lcel>")  # horizontal span continuation
                else:
                    toks.append("<ucel>")  # vertical span continuation
            toks.append("<nl>")
        return "<otsl>" + "".join(toks) + "</otsl>"

    def walk(node_id: int) -> None:
        node = doc.nodes[node_id]
        if node.content_layer != BODY:
            if node.kind in ("page_header", "page_footer"):
                label = node.kind
            elif node.kind in (TITLE, TEXT):
                label = "page_header"
            else:
                label = None
            if label and node.text:
                parts.append(f"<{label}>{loc_for(node_id)}{node.text}</{label}>")
            for c in node.children:
                walk(c)
            return
        if node.kind == TITLE:
            parts.append(f"<title>{loc_for(node_id)}{node.text}</title>")
        elif node.kind == SECTION_HEADER:
            tag = f"section_header_level_{node.level}"
            parts.append(f"<{tag}>{loc_for(node_id)}{node.text}</{tag}>")
        elif node.kind == CODE:
            parts.append(f"<code>{loc_for(node_id)}{node.text}</code>")
        elif node.kind == GROUP and node.group_label == G_LIST:
            enumerated = any(
                doc.nodes[c].kind == LIST_ITEM and doc.nodes[c].enumerated
                for c in node.children
            )
            tag = "ordered_list" if enumerated else "unordered_list"
            parts.append(f"<{tag}>")
            for c in node.children:
                walk(c)
            parts.append(f"</{tag}>")
            return
        elif node.kind == LIST_ITEM:
            parts.append(f"<list_item>{loc_for(node_id)}{node.text}</list_item>")
        elif node.kind == TABLE and node.table is not None:
            pre = ""
            if node.caption_id >= 0:
                cap = doc.nodes[node.caption_id].text
                if cap:
                    pre = f"<caption>{loc_for(node.caption_id)}{cap}</caption>"
            parts.append(pre + otsl(node.table))
        elif node.kind == PICTURE:
            cap = ""
            if node.caption_id >= 0:
                ct = doc.nodes[node.caption_id].text
                if ct:
                    cap = f"<caption>{loc_for(node.caption_id)}{ct}</caption>"
            parts.append(f"<picture>{loc_for(node_id)}{cap}</picture>")
        elif node.kind == "caption":
            # rendered inline with its owning table/picture; standalone
            # captions (unattached) still serialize
            if not any(
                n.caption_id == node_id
                for n in doc.nodes
                if n.kind in (TABLE, PICTURE)
            ):
                parts.append(f"<caption>{loc_for(node_id)}{node.text}</caption>")
        elif node.kind == "footnote":
            parts.append(f"<footnote>{loc_for(node_id)}{node.text}</footnote>")
        elif node.kind == "formula":
            parts.append(f"<formula>{loc_for(node_id)}{node.text}</formula>")
        elif node.kind in (TEXT, "paragraph") and node.text:
            parts.append(f"<text>{loc_for(node_id)}{node.text}</text>")
        for c in node.children:
            walk(c)

    for child in doc.body_children:
        walk(child)
    parts.append("</doctag>")
    return "\n".join(parts)
