"""Plain-text export + span offsets.

The north rule asks for "structured extracted text plus span offsets
per url": ``to_text`` emits the body-layer text in reading order
(DFS over the node pool, like docling's ``export_to_text`` surface),
and ``text_spans`` returns per-node (node_id, label, start, end)
character offsets into that text.
"""

from __future__ import annotations

from .doc_model import BODY, GROUP, PICTURE, TABLE, Doc, DocNode


def _text_nodes(doc: Doc) -> list[DocNode]:
    caption_refs = {
        n.caption_id for n in doc.nodes if n.kind == PICTURE and n.caption_id >= 0
    }
    out: list[DocNode] = []

    def walk(node_id: int) -> None:
        node = doc.nodes[node_id]
        if node.content_layer != BODY:
            return
        if node.kind == GROUP:
            pass
        elif node.kind == PICTURE:
            if node.caption_id >= 0:
                cap = doc.nodes[node.caption_id]
                if cap.text:
                    out.append(cap)
        elif node.kind == TABLE:
            out.append(node)
        elif node.text and node.node_id not in caption_refs:
            out.append(node)
        for child in node.children:
            walk(child)

    for child in doc.body_children:
        if doc.nodes[child].node_id not in caption_refs or True:
            walk(child)
    # drop duplicates introduced by caption hoisting (a caption item is a
    # body child AND referenced by its picture); keep first occurrence
    seen: set[int] = set()
    uniq = []
    for n in out:
        if n.node_id in seen:
            continue
        seen.add(n.node_id)
        uniq.append(n)
    return uniq


def _node_text(doc: Doc, node: DocNode) -> str:
    if node.kind == TABLE and node.table is not None:
        return "\n".join(
            ", ".join(cell for cell in row if cell) for row in node.table.grid()
        )
    return node.text


def to_text(doc: Doc) -> str:
    return "\n".join(
        t for n in _text_nodes(doc) if (t := _node_text(doc, n))
    )


def text_spans(doc: Doc) -> list[tuple[int, str, int, int]]:
    spans = []
    pos = 0
    for n in _text_nodes(doc):
        t = _node_text(doc, n)
        if not t:
            continue
        spans.append((n.node_id, n.kind, pos, pos + len(t)))
        pos += len(t) + 1  # the joining newline
    return spans


# ------------------------------------------------------- indented text


def _itxt_clip(text: str, max_text_len: int) -> str:
    # Empirically derived from the groundtruth corpora: texts up to 74
    # chars stay verbatim (wiki_duck keeps 72, elife keeps a 74-char
    # heading), 75+ are clipped to first-32 + " ... " + last-38 — i.e.
    # clip exactly when the clipped form would not be longer.
    if len(text) < max_text_len + 5:
        return text
    half = max_text_len // 2
    return text[: half - 3] + " ... " + text[-(half + 3) :]


def to_indented_text(doc: Doc, max_text_len: int = 70) -> str:
    """E2: ``_export_to_indented_text`` parity (docling_core surface used
    by /root/reference/tests/test_backend_html.py:176-180; format pinned
    by tests/data/groundtruth/docling_v2/*.html.itxt): DFS item lines
    ``item-N at level L: label: text`` with 2-space indent; pictures
    render their caption as a child line sharing N; tables render as
    ``table with [RxC]``; groups as ``<label>: group <name>``; text
    longer than ``max_text_len`` clipped to 32+' ... '+38 chars."""
    lines = [f"item-0 at level 0: unspecified: group {doc.name and '_root_'}"]
    counter = 0

    def walk(node: DocNode, level: int) -> None:
        nonlocal counter
        if node.content_layer != BODY:  # furniture pruned at any depth
            return
        counter += 1
        n = counter
        pad = "  " * level
        if node.kind == PICTURE:
            lines.append(f"{pad}item-{n} at level {level}: picture")
            if node.caption_id >= 0:
                cap = doc.nodes[node.caption_id]
                if cap.text:  # caption child lines are NOT clipped
                    lines.append(
                        f"{pad}  item-{n} at level {level + 1}: caption: {cap.text}"
                    )
        elif node.kind == TABLE and node.table is not None:
            lines.append(
                f"{pad}item-{n} at level {level}: table with "
                f"[{node.table.num_rows}x{node.table.num_cols}]"
            )
            if node.caption_id >= 0:
                cap = doc.nodes[node.caption_id]
                if cap.text:
                    lines.append(
                        f"{pad}  item-{n} at level {level + 1}: caption: {cap.text}"
                    )
        elif node.kind == GROUP:
            lines.append(
                f"{pad}item-{n} at level {level}: {node.group_label}: "
                f"group {node.name or 'group'}"
            )
        else:
            lines.append(
                f"{pad}item-{n} at level {level}: {node.kind}: "
                f"{_itxt_clip(node.text, max_text_len)}"
            )
        for c in node.children:
            walk(doc.nodes[c], level + 1)

    for cid in doc.body_children:
        node = doc.nodes[cid]
        if node.content_layer == BODY:
            walk(node, 1)
    return "\n".join(lines)
