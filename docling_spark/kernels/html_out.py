"""E5: HTML serializer for the Doc IR.

Reference capability: ``DoclingDocument.save_as_html`` (docling_core),
driven from /root/reference/docling/cli/main.py:184-240 including the
``split_page_view`` variant. No groundtruth exists in-sandbox (the
serializer lives in docling_core), so the correctness contract here is
**round-trip fidelity**: ``to_html(doc)`` re-parsed by this engine's
own HTML kernel reconstructs an equivalent node pool (kinds, texts,
heading levels, list nesting/enumeration, table grids incl. spans and
headers, code blocks, formatting, hyperlinks) — pinned by
tests/test_html_out.py.

Inverse mapping of html_kernel's parse rules:

* title -> <h1>, section_header level L -> <h(L+1)>
* "section" wrapper groups (created by the parser for skipped heading
  levels) serialize transparently — re-parsing recreates them
* list groups -> <ul> / <ol start=N> (the group name encodes order)
* tables -> <table> with rowspan/colspan and <th> for column headers
* furniture-layer content precedes the first heading; later furniture
  re-emits inside <footer> (its parse-time encoding), <details>
  sections round-trip by tag, sub/sup scripts by <sub>/<sup>, and
  image captions by figcaption / alt / ancestor-<a> — all 18 reference
  HTML fixtures round-trip with identical node pools
"""

from __future__ import annotations

import html as _html

from .doc_model import (
    BODY,
    CAPTION,
    CODE,
    GROUP,
    G_LIST,
    LIST_ITEM,
    PARAGRAPH,
    PICTURE,
    SCRIPT_SUB,
    SCRIPT_SUPER,
    SECTION_HEADER,
    TABLE,
    TEXT,
    TITLE,
    Doc,
    DocNode,
    TableDataIR,
)


def _esc(text: str) -> str:
    return _html.escape(text, quote=False)


def _inline(node: DocNode) -> str:
    """Text with formatting/hyperlink wrappers, innermost first."""
    out = _esc(node.text)
    f = node.formatting
    if f is not None and f.script == SCRIPT_SUB:
        out = f"<sub>{out}</sub>"
    elif f is not None and f.script == SCRIPT_SUPER:
        out = f"<sup>{out}</sup>"
    if f is not None:
        if f.bold:
            out = f"<b>{out}</b>"
        if f.italic:
            out = f"<i>{out}</i>"
        if f.underline:
            out = f"<u>{out}</u>"
        if f.strikethrough:
            out = f"<s>{out}</s>"
    if node.hyperlink:
        out = f'<a href="{_html.escape(node.hyperlink, quote=True)}">{out}</a>'
    return out


def _table_html(t: TableDataIR) -> list[str]:
    out = ["<table>"]
    covered: set[tuple[int, int]] = set()
    by_origin = {}
    for c in t.cells:
        by_origin[(c.start_row, c.start_col)] = c
        for r in range(c.start_row, c.end_row):
            for k in range(c.start_col, c.end_col):
                if (r, k) != (c.start_row, c.start_col):
                    covered.add((r, k))
    for r in range(t.num_rows):
        out.append("<tr>")
        for k in range(t.num_cols):
            if (r, k) in covered:
                continue
            c = by_origin.get((r, k))
            if c is None:
                out.append("<td></td>")
                continue
            tag = "th" if c.column_header else "td"
            attrs = ""
            if c.row_span > 1:
                attrs += f' rowspan="{c.row_span}"'
            if c.col_span > 1:
                attrs += f' colspan="{c.col_span}"'
            out.append(f"<{tag}{attrs}>{_esc(c.text)}</{tag}>")
        out.append("</tr>")
    out.append("</table>")
    return out


def to_html(doc: Doc) -> str:
    """Serialize the body tree to a standalone HTML document."""
    body: list[str] = []
    seen_body_heading = False
    owned_captions = {
        n.caption_id
        for n in doc.nodes
        if n.kind in (PICTURE, TABLE) and n.caption_id >= 0
    }

    def walk(node: DocNode, in_footer: bool = False) -> None:
        nonlocal seen_body_heading
        # furniture BEFORE the first heading round-trips naturally (the
        # parser assigns the furniture layer to leading content); later
        # furniture survives only inside a <footer> group (which IS its
        # visible-HTML encoding) — anything else furniture is excluded,
        # matching the markdown/body-content contract
        if node.content_layer != BODY and seen_body_heading and not in_footer:
            if not (
                node.kind == GROUP
                and node.group_label == "section"
                and node.name == "footer"
            ):
                return
            body.append("<footer>")
            for cid in node.children:
                walk(doc.nodes[cid], in_footer=True)
            body.append("</footer>")
            return
        if node.kind in (TITLE, SECTION_HEADER) and node.content_layer == BODY:
            seen_body_heading = True
        if node.kind == TITLE:
            if node.content_layer != BODY:
                return  # head <title> — emitted into <head> below
            body.append(f"<h1>{_inline(node)}</h1>")
        elif node.kind == SECTION_HEADER:
            h = min(max(node.level + 1, 2), 6)
            body.append(f"<h{h}>{_inline(node)}</h{h}>")
        elif node.kind in (TEXT, PARAGRAPH):
            body.append(f"<p>{_inline(node)}</p>")
        elif node.kind == CAPTION:
            # serialized by the owning picture/table; standalone
            # captions render as paragraphs
            if node.node_id not in owned_captions:
                body.append(f"<p>{_inline(node)}</p>")
        elif node.kind == CODE:
            body.append(f"<pre><code>{_esc(node.text)}</code></pre>")
        elif node.kind == LIST_ITEM:
            body.append(f"<li>{_inline(node)}")
            for cid in node.children:
                walk(doc.nodes[cid], in_footer)
            body.append("</li>")
            return
        elif node.kind == TABLE:
            if node.table is not None:
                body.extend(_table_html(node.table))
            if node.caption_id >= 0:
                cap = doc.nodes[node.caption_id]
                if cap.text:
                    body.append(f"<figcaption>{_inline(cap)}</figcaption>")
        elif node.kind == PICTURE:
            cap = doc.nodes[node.caption_id] if node.caption_id >= 0 else None
            if (
                cap is not None
                and cap.text == "Image Hyperlink."
                and cap.hyperlink
            ):
                # inverse of the parser's ancestor-<a> rule (H9): an
                # image inside a link captions itself "Image Hyperlink."
                # with that href — re-emit the ancestor link, not a
                # figcaption, so the reparse rebuilds the same caption
                href = _html.escape(cap.hyperlink, quote=True)
                body.append(f'<a href="{href}"><figure><img /></figure></a>')
                return
            body.append("<figure><img />")
            if cap is not None and cap.text:
                body.append(f"<figcaption>{_inline(cap)}</figcaption>")
            body.append("</figure>")
        elif node.kind == GROUP:
            if node.group_label == "inline":
                # mixed-format run: one paragraph, space-joined parts
                # (inverse of html_kernel's inline grouping); CODE
                # children are inline <code>, not <pre> blocks
                parts = [
                    f"<code>{_esc(doc.nodes[cid].text)}</code>"
                    if doc.nodes[cid].kind == CODE
                    else _inline(doc.nodes[cid])
                    for cid in node.children
                ]
                body.append(f"<p>{' '.join(parts)}</p>")
                return
            if node.group_label == G_LIST:
                ordered = node.name.startswith("ordered list")
                tag = "ol" if ordered else "ul"
                attrs = ""
                if ordered and " start " in node.name:
                    attrs = f' start="{node.name.rsplit(" ", 1)[-1]}"'
                body.append(f"<{tag}{attrs}>")
                for cid in node.children:
                    child = doc.nodes[cid]
                    if child.kind == PICTURE:
                        # pictures hang off the list group in the parse;
                        # an image-only <li> reparses to exactly that —
                        # the caption rides in alt (the parser derives
                        # captions from alt outside <figure>)
                        ccap = (
                            doc.nodes[child.caption_id]
                            if child.caption_id >= 0
                            else None
                        )
                        if (
                            ccap is not None
                            and ccap.text == "Image Hyperlink."
                            and ccap.hyperlink
                        ):
                            # ancestor-<a> inverse, like the figure case
                            href = _html.escape(ccap.hyperlink, quote=True)
                            body.append(
                                f'<li><a href="{href}"><img /></a></li>'
                            )
                            continue
                        alt = ""
                        if ccap is not None and ccap.text:
                            alt = (
                                " alt="
                                f'"{_html.escape(ccap.text, quote=True)}"'
                            )
                        body.append(f"<li><img{alt} /></li>")
                    else:
                        walk(child, in_footer)
                body.append(f"</{tag}>")
                return
            if node.group_label == "section" and node.name == "details":
                # a parsed <details> element (html_kernel._use_section
                # _group keeps tag.name); heading-skip wrapper sections
                # are named header-N and stay transparent
                body.append("<details>")
                for cid in node.children:
                    walk(doc.nodes[cid], in_footer)
                body.append("</details>")
                return
            # section wrapper / inline groups serialize transparently
        for cid in node.children:
            walk(doc.nodes[cid], in_footer)

    for cid in doc.body_children:
        walk(doc.nodes[cid])

    # head <title> only when the doc carries a furniture title node —
    # otherwise the parser would materialize a title the source lacks
    head_title = next(
        (
            n.orig or n.text
            for n in doc.nodes
            if n.kind == TITLE and n.content_layer != BODY
        ),
        None,
    )
    title_el = f"<title>{_esc(head_title)}</title>\n" if head_title else ""
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        '<meta charset="utf-8"/>\n'
        + title_el
        + "</head>\n<body>\n"
        + "\n".join(body)
        + "\n</body>\n</html>\n"
    )


def to_html_split_pages(page_docs: list[Doc], title: str = "document") -> str:
    """``split_page_view`` variant (cli/main.py:238-240): one <section>
    per page with a page header, for paged sources (PDF/METS)."""
    parts = [
        "<!DOCTYPE html>\n<html>\n<head>\n"
        '<meta charset="utf-8"/>\n'
        f"<title>{_esc(title)}</title>\n</head>\n<body>"
    ]
    for i, pd in enumerate(page_docs, start=1):
        inner = to_html(pd)
        body = inner.split("<body>\n", 1)[1].rsplit("\n</body>", 1)[0]
        parts.append(f'<section class="page" data-page="{i}">')
        parts.append(body)
        parts.append("</section>")
    parts.append("</body>\n</html>\n")
    return "\n".join(parts)
