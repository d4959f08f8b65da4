"""Document-IR -> Markdown serializer.

Re-creates the observable behavior of the reference's
``DoclingDocument.export_to_markdown()`` (docling-core dependency, not
vendored in the reference repo), reverse-engineered from the committed
golden fixtures ``/root/reference/tests/data/groundtruth/docling_v2/
*.html.md`` (the byte-identity target, see
/root/reference/tests/test_backend_html.py:156-183 and
tests/verify_utils.py:500-511):

* body layer only by default; furniture opt-in;
* top-level blocks joined with a blank line;
* title ``# ``, section header level N -> ``#`` x (N+1);
* inline groups joined with a single space (producing the
  characteristic `` .`` before punctuation);
* bold ``**``, italic ``*``, strikethrough ``~~``, underline/sub/sup
  dropped; hyperlinks ``[text](url)``; underscores escaped in text;
* list items ``- `` / ``{n}. `` with 4-space indent per nested list
  group; enumerated items use their stored marker, else their ordinal;
* code: fenced block standalone, single backticks in inline scope;
* pictures: optional caption text + ``<!-- image -->``;
* tables: padded github-style pipe grid with numeric right-alignment
  (tabulate-compatible: column width >= header width + 2).
"""

from __future__ import annotations

from typing import Optional

from .doc_model import (
    BODY,
    CAPTION,
    CODE,
    G_INLINE,
    G_LIST,
    G_SECTION,
    GROUP,
    LIST_ITEM,
    PICTURE,
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
    Doc,
    DocNode,
    TableDataIR,
)

_INDENT = "    "


def _escape_text(text: str) -> str:
    """Escape markdown-significant underscores and HTML specials
    (observed in wiki_duck.html.md: ``10.1007/978-1-4615-6787-5\\_4`` in
    link text while the URL stays unescaped; ``&`` rendered ``&amp;`` in
    text items but not in table cells or code)."""
    text = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return text.replace("_", "\\_")


def _render_inline(node: DocNode) -> str:
    """Render a text-like item with formatting + hyperlink markers."""
    if node.kind == "formula":
        return f"${node.text}$" if node.text else ""
    if node.kind == CODE:
        text = f"`{node.text}`"
        f = node.formatting
        if f is not None:
            if f.bold:
                text = f"**{text}**"
            if f.italic:
                text = f"*{text}*"
        return text
    text = _escape_text(node.text)
    f = node.formatting
    if f is not None and text:
        if f.bold:
            text = f"**{text}**"
        if f.italic:
            text = f"*{text}*"
        if f.strikethrough:
            text = f"~~{text}~~"
    if node.hyperlink and text:
        text = f"[{text}]({node.hyperlink})"
    return text


# ---------------------------------------------------------------- tables


def _is_number(s: str) -> bool:
    if not s:
        return False
    try:
        float(s)
    except ValueError:
        try:
            int(s, 16) if s.lower().startswith("0x") else int(s)
        except ValueError:
            return False
        return True
    return s.lower() not in ("inf", "-inf", "nan")


def _format_number(s: str) -> str:
    try:
        int(s)
        return str(int(s))
    except ValueError:
        return format(float(s), "g")


def render_table(table: TableDataIR) -> str:
    grid = table.grid()
    if not grid or table.num_cols == 0:
        return ""
    grid = [[cell.replace("\n", " ") for cell in row] for row in grid]
    headers = grid[0]
    body = grid[1:]

    ncols = table.num_cols
    numeric = []
    for c in range(ncols):
        # tabulate: a column is numeric only if EVERY body cell parses
        # as a number — an empty cell makes it textual (pone golden)
        vals = [row[c] for row in body]
        numeric.append(bool(vals) and all(_is_number(v) for v in vals))

    cells: list[list[str]] = []
    for row in body:
        cells.append(
            [
                _format_number(row[c]) if numeric[c] and row[c] != "" else row[c]
                for c in range(ncols)
            ]
        )

    def _visible(s: str) -> int:
        # tabulate measures via wcswidth, which returns -1 for strings
        # holding control chars (e.g. an embedded tab, csv-tab golden);
        # such cells don't widen the column and get width+1 padding
        return -1 if any(ord(ch) < 32 for ch in s) else len(s)

    widths = []
    for c in range(ncols):
        w = len(headers[c]) + 2  # tabulate MIN_PADDING on headers
        for row in cells:
            w = max(w, _visible(row[c]))
        widths.append(w)

    def _pad(s: str, w: int, right: bool) -> str:
        fill = " " * max(w - _visible(s), 0)
        return fill + s if right else s + fill

    def fmt_row(row: list[str]) -> str:
        out = []
        for c in range(ncols):
            out.append(_pad(row[c], widths[c], right=numeric[c]))
        return "| " + " | ".join(out) + " |"

    lines = [fmt_row(headers)]
    lines.append("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for row in cells:
        lines.append(fmt_row(row))
    return "\n".join(lines)


# ---------------------------------------------------------------- serializer


class MarkdownSerializer:
    def __init__(self, doc: Doc, layers: Optional[set] = None):
        self.doc = doc
        self.layers = layers or {BODY}
        # caption items referenced by pictures are rendered inside the
        # picture block, never standalone
        self.caption_refs = {
            n.caption_id
            for n in doc.nodes
            if n.kind in (PICTURE, TABLE) and n.caption_id >= 0
        }

    def _visible(self, node: DocNode) -> bool:
        return node.content_layer in self.layers and node.node_id not in self.caption_refs

    def serialize(self) -> str:
        blocks: list[str] = []
        for child in self.doc.children_of(None):
            if self._visible(child):
                blocks.extend(self._ser(child, 0))
        return "\n\n".join(b for b in blocks if b)

    # returns a list of top-level blocks for this node (and its subtree)
    def _ser(self, node: DocNode, list_depth: int) -> list[str]:
        kind = node.kind
        doc = self.doc

        if kind == GROUP:
            if node.group_label == G_LIST:
                lines = self._ser_list(node, list_depth)
                return ["\n".join(lines)] if lines else []
            if node.group_label == G_INLINE:
                joined = " ".join(
                    _render_inline(c) for c in doc.children_of(node) if self._visible(c)
                )
                return [joined] if joined else []
            # section / generic groups: flatten children
            out: list[str] = []
            for c in doc.children_of(node):
                if self._visible(c):
                    out.extend(self._ser(c, list_depth))
            return out

        if kind in (TITLE, SECTION_HEADER):
            # markdown has exactly 6 heading levels; deeper section
            # levels (font-size-ranked PDF hierarchies can nest past
            # 5) clamp to ###### instead of emitting invalid md
            prefix = "#" if kind == TITLE else "#" * min(node.level + 1, 6)
            head = _render_inline(node)
            inline_children = [
                c for c in doc.children_of(node)
                if c.kind == GROUP and c.group_label == G_INLINE
                and c.name == "heading-runs" and self._visible(c)
            ]
            parts = [head] if head else []
            for g in inline_children:
                joined = " ".join(
                    _render_inline(c) for c in doc.children_of(g) if self._visible(c)
                )
                if joined:
                    parts.append(joined)
            blocks = [f"{prefix} {' '.join(parts)}"]
            rest = []
            for c in doc.children_of(node):
                if c in inline_children:
                    continue
                if self._visible(c):
                    rest.extend(self._ser(c, list_depth))
            blocks.extend(rest)
            return blocks
        elif kind == "formula":
            blocks = [f"$${node.text}$$"] if node.text else []
        elif kind in (TEXT, CAPTION, LIST_ITEM, "paragraph", "footnote"):
            r = _render_inline(node)
            blocks = [r] if r else []
        elif kind == CODE:
            blocks = [f"```\n{node.text}\n```"]
        elif kind == PICTURE:
            parts = []
            if node.caption_id >= 0:
                cap = doc.nodes[node.caption_id]
                cap_text = _escape_text(cap.text)
                if cap_text:
                    parts.append(cap_text)
            parts.append("<!-- image -->")
            blocks = ["\n\n".join(parts)]
        elif kind == TABLE:
            rendered = render_table(node.table) if node.table else ""
            blocks = []
            if node.caption_id >= 0:
                cap_text = _escape_text(doc.nodes[node.caption_id].text)
                if cap_text:
                    blocks.append(cap_text)
            if rendered:
                blocks.append(rendered)
        else:
            blocks = []

        for c in doc.children_of(node):
            if self._visible(c):
                blocks.extend(self._ser(c, list_depth))
        return blocks

    def _ser_list(self, group: DocNode, depth: int) -> list[str]:
        doc = self.doc
        indent = _INDENT * depth
        lines: list[str] = []
        ordinal = 0
        for child in doc.children_of(group):
            if not self._visible(child):
                continue
            if child.kind == LIST_ITEM:
                ordinal += 1
                if child.enumerated:
                    marker = child.marker if child.marker else f"{ordinal}."
                else:
                    marker = "-"
                segs = []
                head = _render_inline(child)
                if head:
                    segs.append(head)
                tail_lines: list[str] = []
                for sub in doc.children_of(child):
                    if not self._visible(sub):
                        continue
                    if sub.kind == GROUP and sub.group_label == G_INLINE:
                        joined = " ".join(
                            _render_inline(c)
                            for c in doc.children_of(sub)
                            if self._visible(c)
                        )
                        if joined:
                            segs.append(joined)
                    elif sub.kind == GROUP and sub.group_label == G_LIST:
                        tail_lines.extend(self._ser_list(sub, depth + 1))
                    else:
                        for block in self._ser(sub, depth + 1):
                            tail_lines.append(block)
                # keep a trailing space inside item text (pptx golden
                # "- l1 "); rstrip only the empty-item "marker + space"
                line = f"{indent}{marker} {' '.join(segs)}"
                lines.append(line if segs else line.rstrip())
                lines.extend(tail_lines)
            elif child.kind == GROUP and child.group_label == G_LIST:
                lines.extend(self._ser_list(child, depth + 1))
            else:
                for block in self._ser(child, depth):
                    lines.append(block)
        return lines


def to_markdown(doc: Doc, include_furniture: bool = False) -> str:
    layers = {BODY, "furniture"} if include_furniture else {BODY}
    return MarkdownSerializer(doc, layers).serialize()
