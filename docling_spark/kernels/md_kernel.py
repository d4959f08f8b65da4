"""Markdown backend kernel (B1): markdown bytes -> Doc.

From-scratch block-level parser with the same *structural* mapping as
the reference's marko-based backend
(/root/reference/docling/backend/md_backend.py): ATX headings (level 1
-> title, level N -> heading N-1, matching the HTML backend's h1/hN
mapping), nested bullet/ordered lists (indent-based, ordered markers
preserved), fenced code blocks, GitHub tables (first row = column
header), blockquotes and paragraphs (lazy continuation joined with
spaces).

Deliberate difference, documented: inline runs (bold/italic/links) are
kept verbatim in node text instead of being exploded into inline
groups — the reference's marko AST walk (md_backend.py:207-380) splits
them into child nodes; for extraction purposes the text content is
identical and ``to_markdown`` round-trips the markers unchanged.
"""

from __future__ import annotations

import re

from .doc_model import BODY, Doc, TableCellData, TableDataIR

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_BULLET_RE = re.compile(r"^(\s*)([-*+])\s+(.*)$")
_ORDERED_RE = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^\s*(```+|~~~+)\s*(\S*)\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?[\s:|-]+\|[\s:|-]*$")


def _split_table_row(line: str) -> list[str]:
    row = line.strip()
    if row.startswith("|"):
        row = row[1:]
    if row.endswith("|"):
        row = row[:-1]
    return [c.strip() for c in re.split(r"(?<!\\)\|", row)]


def parse_markdown(data: bytes, name: str = "doc") -> Doc:
    text = data.decode("utf-8", errors="replace")
    lines = text.split("\n")
    doc = Doc(name)

    # heading parent stack like the HTML backend (html_backend.py:584-638)
    parents: dict[int, object] = {0: None}

    def current_parent(level: int = 99):
        best = None
        for lvl in sorted(parents):
            if lvl < level and parents[lvl] is not None:
                best = parents[lvl]
        return best

    para: list[str] = []
    i = 0
    n = len(lines)

    def flush_para() -> None:
        if para:
            doc.add_text(
                text=" ".join(s.strip() for s in para).strip(),
                content_layer=BODY,
                parent=current_parent(),
            )
            para.clear()

    # (indent, group_node, is_ordered) stack for nested lists
    list_stack: list[tuple[int, object, bool]] = []

    def close_lists(indent: int = -1) -> None:
        while list_stack and list_stack[-1][0] >= indent >= 0 or (
            indent < 0 and list_stack
        ):
            if indent >= 0 and list_stack[-1][0] < indent:
                break
            list_stack.pop()

    while i < n:
        line = lines[i]
        stripped = line.strip()

        fence = _FENCE_RE.match(line)
        if fence:
            flush_para()
            close_lists()
            marker = fence.group(1)[:3]
            body: list[str] = []
            i += 1
            while i < n and not lines[i].strip().startswith(marker):
                body.append(lines[i])
                i += 1
            i += 1  # skip closing fence
            doc.add_code(text="\n".join(body), parent=current_parent())
            continue

        if not stripped:
            flush_para()
            close_lists()
            i += 1
            continue

        m = _HEADING_RE.match(line)
        if m:
            flush_para()
            close_lists()
            level = len(m.group(1))
            text_h = m.group(2)
            if level == 1:
                node = doc.add_title(text_h)
                parents = {0: None, 1: node}
            else:
                h_level = level - 1
                node = doc.add_heading(
                    text_h, level=h_level, parent=current_parent(level)
                )
                parents = {k: v for k, v in parents.items() if k < level}
                parents[level] = node
            i += 1
            continue

        bullet = _BULLET_RE.match(line)
        ordered = None if bullet else _ORDERED_RE.match(line)
        if bullet or ordered:
            flush_para()
            m2 = bullet or ordered
            indent = len(m2.group(1).replace("\t", "    "))
            is_ordered = ordered is not None
            item_text = m2.group(3).strip()
            while list_stack and list_stack[-1][0] > indent:
                list_stack.pop()
            # a change of list type at the same indent starts a new group
            if list_stack and list_stack[-1][0] == indent and list_stack[-1][2] != is_ordered:
                list_stack.pop()
            if not list_stack or list_stack[-1][0] < indent:
                parent = list_stack[-1][1] if list_stack else current_parent()
                group = doc.add_list_group(parent=parent)
                list_stack.append((indent, group, is_ordered))
            group = list_stack[-1][1]
            marker = f"{m2.group(2)}." if is_ordered else "-"
            doc.add_list_item(
                item_text,
                enumerated=is_ordered,
                marker=marker if is_ordered else "",
                parent=group,
            )
            i += 1
            continue

        if "|" in line and i + 1 < n and _TABLE_SEP_RE.match(lines[i + 1]):
            flush_para()
            close_lists()
            header = _split_table_row(line)
            rows = [header]
            i += 2
            while i < n and "|" in lines[i] and lines[i].strip():
                rows.append(_split_table_row(lines[i]))
                i += 1
            num_cols = max(len(r) for r in rows)
            cells = [
                TableCellData(
                    text=v,
                    start_row=ri,
                    end_row=ri + 1,
                    start_col=ci,
                    end_col=ci + 1,
                    column_header=ri == 0,
                )
                for ri, row in enumerate(rows)
                for ci, v in enumerate(row)
            ]
            doc.add_table(
                TableDataIR(len(rows), num_cols, cells), parent=current_parent()
            )
            continue

        if stripped.startswith(">"):
            para.append(stripped.lstrip("> "))
            i += 1
            continue

        para.append(stripped)
        i += 1

    flush_para()
    return doc
