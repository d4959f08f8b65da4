"""PDF layout heuristics: cell merge, parse-quality scoring, block
assembly, reading order, document build.

Behavioral ports (written fresh against the reference's semantics):

* ``merge_horizontal_cells`` — pypdfium2's fragmented sub-word cells are
  grouped into rows by vertical overlap (0.5x row height) and merged
  when the horizontal gap <= average cell height
  (/root/reference/docling/backend/pypdfium2_backend.py:155-250);
* ``rate_text_quality`` — garbage detectors (replacement char,
  GLYPH<...>, /G-runs, slash-token runs) hard-zero; fragmented-word
  pattern >=3 occurrences adds 0.1 penalties; page parse_score is the
  10th percentile of cell scores
  (/root/reference/docling/models/page_preprocessing_model.py:29-35,120-145,
  80-87);
* ``sanitize_lines`` — hyphen-merge across lines + the 6-entry unicode
  normalization (/root/reference/docling/models/page_assemble_model.py:38-63);
* block classification / reading order — the rule-based skeleton of the
  reference's layout postprocess + reading-order stage
  (layout_postprocessor.py:654-684 cell sort; readingorder_model.py):
  without the RT-DETR layout model we classify by font-size rank
  (doc-median body size; larger = section headers, largest-on-page-1 =
  title), and order blocks top-to-bottom, left-to-right with column
  awareness.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from statistics import median

from .doc_model import BODY, Doc
from .pdf_kernel import PdfPage, TextCell

# ------------------------------------------------------------- cell merge


def _group_rows(
    cells: list[TextCell], vertical_threshold_factor: float = 0.5
) -> list[list[TextCell]]:
    """Group TOPLEFT-origin cells into visual rows; thresholds follow
    pypdfium2_backend.py:160-196 (running row bbox, 0.5x height)."""
    rows: list[list[TextCell]] = []
    cur = [cells[0]]
    row_top, row_bot = cells[0].t, cells[0].b  # TL origin: t < b
    row_h = abs(row_bot - row_top)
    for cell in cells[1:]:
        thr = row_h * vertical_threshold_factor
        if abs(cell.t - row_top) <= thr and abs(cell.b - row_bot) <= thr:
            cur.append(cell)
            row_top = min(row_top, cell.t)
            row_bot = max(row_bot, cell.b)
            row_h = row_bot - row_top
        else:
            rows.append(cur)
            cur = [cell]
            row_top, row_bot = cell.t, cell.b
            row_h = abs(row_bot - row_top)
    rows.append(cur)
    return rows


def _bidi_class(ch: str) -> str:
    import unicodedata

    return unicodedata.bidirectional(ch)


def _is_ltr_cell(text: str) -> bool:
    return all(_bidi_class(c) in ("L", "EN", "ES", "CS", "WS", "ON") for c in text)


def _logical_order(parts_cells: list, parts_seps: list) -> tuple[list, list]:
    """Visual LTR glyph order -> logical order for RTL-dominant lines
    (pdfium emits logical order; PDFs place glyphs visually): reverse
    the cell sequence, then flip maximal LTR runs back. Works at GLYPH
    granularity so multi-char ToUnicode expansions (e.g. lam-alef
    ligatures) keep their internal logical order."""
    text_all = "".join(parts_cells)
    n_rtl = sum(1 for c in text_all if _bidi_class(c) in ("R", "AL", "AN"))
    n_ltr = sum(1 for c in text_all if _bidi_class(c) == "L")
    if n_rtl == 0 or n_rtl < n_ltr:
        return parts_cells, parts_seps
    cells = parts_cells[::-1]
    seps = parts_seps[::-1]
    # re-flip maximal LTR cell runs to their original (LTR) order
    out_cells: list = []
    out_seps: list = []
    i = 0
    while i < len(cells):
        if cells[i].strip() and _is_ltr_cell(cells[i]):
            j = i
            # whitespace-only cells continue an LTR run (a space glyph
            # between two latin words must not split the re-flip)
            while j < len(cells) and _is_ltr_cell(cells[j]):
                j += 1
            while j > i and not cells[j - 1].strip():
                j -= 1  # trailing space cells stay at the boundary
            out_cells.extend(cells[i:j][::-1])
            # separators inside the run reverse with it; the run's
            # trailing separator stays at the boundary
            inner = seps[i : j - 1][::-1] if j - 1 > i else []
            out_seps.extend(inner)
            if j - 1 < len(seps):
                out_seps.append(seps[j - 1])
            i = j
        else:
            out_cells.append(cells[i])
            if i < len(seps):
                out_seps.append(seps[i])
            i += 1
    return out_cells, out_seps


_WORD_GAP_EM = 0.17  # inter-cell gap above this fraction of the font
# size reads as a word space; below it the cells are kerned fragments
# of one word. Real PDFs show per-glyph/per-cluster Tj runs — pdfium
# resolves this internally (get_text_bounded over the merged bbox,
# pypdfium2_backend.py:232-240); this is the same decision from cell
# geometry.


def _merge_group(group: list[TextCell]) -> TextCell:
    if len(group) == 1:
        return group[0]
    ordered = sorted(group, key=lambda c: c.l)
    texts = [c.text for c in ordered]
    seps = []
    for prev, cur in zip(ordered, ordered[1:]):
        gap = cur.l - prev.r
        size = max(min(prev.size, cur.size), 1.0)
        seps.append(" " if gap > size * _WORD_GAP_EM else "")
    texts, seps = _logical_order(texts, seps)
    parts = [texts[0]]
    for sep, t in zip(seps, texts[1:]):
        parts.append(sep)
        parts.append(t)
    return TextCell(
        text="".join(parts).strip(),
        l=min(c.l for c in group),
        t=min(c.t for c in group),
        r=max(c.r for c in group),
        b=max(c.b for c in group),
        size=max(c.size for c in group),
    )


def merge_horizontal_cells(
    cells: list[TextCell],
    horizontal_threshold_factor: float = 1.0,
    vertical_threshold_factor: float = 0.5,
) -> list[TextCell]:
    """TOPLEFT-origin cells -> row-merged line cells."""
    if not cells:
        return []
    merged: list[TextCell] = []
    for row in _group_rows(cells, vertical_threshold_factor):
        row = sorted(row, key=lambda c: c.l)
        group = [row[0]]
        for cell in row[1:]:
            prev = group[-1]
            avg_h = ((prev.b - prev.t) + (cell.b - cell.t)) / 2
            if cell.l - prev.r <= avg_h * horizontal_threshold_factor:
                group.append(cell)
            else:
                merged.append(_merge_group(group))
                group = [cell]
        merged.append(_merge_group(group))
    return merged


# --------------------------------------------------------- quality score

_GLYPH_RE = re.compile(r"GLYPH<[0-9A-Fa-f]+>")
_SLASH_G_RE = re.compile(r"(?:/G\d+){2,}")
_FRAG_RE = re.compile(r"\b[A-Za-z](?:/[a-z]{1,3}\.[a-z]{1,3}){2,}\b")
_SLASH_TOKEN_RE = re.compile(r"(?:/\w+\s*){2,}")


def rate_text_quality(text: str) -> float:
    if (
        "�" in text
        or _GLYPH_RE.search(text)
        or _SLASH_G_RE.search(text)
        or _SLASH_TOKEN_RE.match(text)
    ):
        return 0.0
    penalty = 0.0
    frag = _FRAG_RE.findall(text)
    if len(frag) >= 3:
        penalty += 0.1 * len(frag)
    return max(1.0 - penalty, 0.0)


def page_parse_score(cell_texts: list[str]) -> float:
    """10th-percentile of per-cell scores (page_preprocessing_model.py:80-87),
    with numpy's linear-interpolation quantile."""
    if not cell_texts:
        return float("nan")
    scores = sorted(rate_text_quality(t) for t in cell_texts)
    k = (len(scores) - 1) * 0.10
    lo = int(k)
    hi = min(lo + 1, len(scores) - 1)
    return scores[lo] + (scores[hi] - scores[lo]) * (k - lo)


# ------------------------------------------------------- text sanitizing

_SANITIZE = {
    "⁄": "/",
    "’": "'",
    "‘": "'",
    "“": '"',
    "”": '"',
    "•": "·",
}
_WORD_RE = re.compile(r"\b[\w]+\b")


def sanitize_lines(lines: list[str]) -> str:
    """Hyphen-merge + normalization (page_assemble_model.py:38-63)."""
    lines = list(lines)
    if len(lines) <= 1:
        text = " ".join(lines)
    else:
        for ix in range(len(lines) - 1):
            prev_line, line = lines[ix], lines[ix + 1]
            if prev_line.endswith("-"):
                prev_words = _WORD_RE.findall(prev_line)
                line_words = _WORD_RE.findall(line)
                if (
                    prev_words
                    and line_words
                    and prev_words[-1].isalnum()
                    and line_words[0].isalnum()
                ):
                    lines[ix] = prev_line[:-1]
            else:
                lines[ix] += " "
        text = "".join(lines)
    for src, dst in _SANITIZE.items():
        text = text.replace(src, dst)
    return text.strip()


# ------------------------------------------------- blocks + reading order


@dataclass
class Block:
    kind: str  # 'title' | 'section_header' | 'text'
    text: str
    level: int
    page_no: int
    l: float
    t: float
    r: float
    b: float
    size: float
    parse_score: float = 1.0


def _cluster_columns(lines: list[TextCell], page_w: float) -> list[int]:
    """Assign each line a column index: 0 for full-width/left, 1 for
    lines living entirely in the right half of a two-column layout."""
    cols = []
    mid = page_w / 2
    for ln in lines:
        cols.append(1 if ln.l > mid * 0.96 and ln.r > mid else 0)
    return cols


def page_blocks(page: PdfPage) -> list[Block]:
    """Lines -> vertically-clustered blocks in reading order."""
    lines = merge_horizontal_cells(page.cells_top_left())
    if not lines:
        return []
    heights = [ln.b - ln.t for ln in lines]
    med_h = median(heights) or 1.0
    cols = _cluster_columns(lines, page.width)
    order = sorted(range(len(lines)), key=lambda i: (cols[i], lines[i].t, lines[i].l))

    blocks: list[Block] = []
    cur: list[TextCell] = []

    def flush() -> None:
        if not cur:
            return
        text = sanitize_lines([c.text for c in cur])
        if text:
            blocks.append(
                Block(
                    kind="text",
                    text=text,
                    level=0,
                    page_no=page.page_no,
                    l=min(c.l for c in cur),
                    t=min(c.t for c in cur),
                    r=max(c.r for c in cur),
                    b=max(c.b for c in cur),
                    size=max(c.size for c in cur),
                    parse_score=page_parse_score([c.text for c in cur]),
                )
            )
        cur.clear()

    prev_idx = None
    for i in order:
        ln = lines[i]
        if cur:
            prev = lines[prev_idx]
            same_col = cols[i] == cols[prev_idx]
            gap = ln.t - prev.b
            size_jump = abs(ln.size - prev.size) > 0.15 * max(ln.size, prev.size)
            if not same_col or gap > 0.9 * med_h or size_jump:
                flush()
        cur.append(ln)
        prev_idx = i
    flush()
    # P14: collapse duplicate/contained blocks (no-op for the disjoint
    # vertical clusters above; load-bearing once model clusters exist)
    return resolve_overlapping_blocks(blocks)


def classify_blocks(blocks: list[Block]) -> None:
    """Font-size-rank classification, in place: body size = the size
    bucket carrying the most characters (robust when headings outnumber
    paragraphs); >=1.25x body -> section_header (bigger = shallower
    level); the single largest header block on page 1 -> title."""
    if not blocks:
        return
    chars_by_size: dict[float, int] = {}
    for b in blocks:
        key = round(b.size * 2) / 2
        chars_by_size[key] = chars_by_size.get(key, 0) + len(b.text)
    body = max(chars_by_size.items(), key=lambda kv: kv[1])[0]
    header_sizes = sorted(
        {round(b.size, 2) for b in blocks if b.size >= 1.25 * body}, reverse=True
    )
    for b in blocks:
        if b.size >= 1.25 * body and len(b.text) < 300:
            b.kind = "section_header"
            b.level = header_sizes.index(round(b.size, 2)) + 1
    page1 = [b for b in blocks if b.page_no == 1 and b.kind == "section_header"]
    if page1:
        top = max(page1, key=lambda b: b.size)
        if top.level == 1:
            top.kind = "title"
            for b in blocks:
                if b.kind == "section_header" and b.level > 1:
                    b.level -= 1


def assemble_doc(
    all_blocks: list[Block], name: str = "doc", classify: bool = True
) -> Doc:
    """Blocks (already in per-page reading order, pages ascending) ->
    Doc IR. Runs doc-wide classification, so it must see ALL pages —
    in the Spark paged path this is the post-shuffle kernel. Pass
    ``classify=False`` when the blocks were already classified
    doc-wide (e.g. per-page slices of a classified document)."""
    if classify:
        classify_blocks(all_blocks)
    doc = Doc(name)
    for b in all_blocks:
        if b.kind == "title":
            doc.add_title(b.text, content_layer=BODY)
        elif b.kind == "section_header":
            doc.add_heading(b.text, level=max(1, b.level), content_layer=BODY)
        else:
            doc.add_text(text=b.text, content_layer=BODY)
    return doc


def build_doc(pages: list[PdfPage], name: str = "doc") -> tuple[Doc, list[float]]:
    """Pages -> Doc IR + per-page parse scores (P17/P18 doc assembly,
    standard_pdf_pipeline.py:183-201 + readingorder_model.py)."""
    all_blocks: list[Block] = []
    page_scores: list[float] = []
    for page in sorted(pages, key=lambda p: p.page_no):
        blocks = page_blocks(page)
        page_scores.append(
            page_parse_score([c.text for c in page.cells]) if page.cells else float("nan")
        )
        all_blocks.extend(blocks)
    return assemble_doc(all_blocks, name), page_scores


@dataclass
class PdfResult:
    doc: Doc
    page_scores: list[float] = field(default_factory=list)


# ------------------------------------- P14: overlap resolution (UnionFind)


class UnionFind:
    """Union-find with path compression + union by rank
    (layout_postprocessor.py:17-47)."""

    def __init__(self, elements):
        self.parent = {e: e for e in elements}
        self.rank = dict.fromkeys(elements, 0)

    def find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression, iterative
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if self.rank[rx] > self.rank[ry]:
            self.parent[ry] = rx
        elif self.rank[rx] < self.rank[ry]:
            self.parent[rx] = ry
        else:
            self.parent[ry] = rx
            self.rank[rx] += 1

    def groups(self) -> dict:
        out: dict = {}
        for e in self.parent:
            out.setdefault(self.find(e), []).append(e)
        return out


def _block_area(b: Block) -> float:
    return max(b.r - b.l, 0.0) * max(b.b - b.t, 0.0)


def _intersection(a: Block, b: Block) -> float:
    w = min(a.r, b.r) - max(a.l, b.l)
    h = min(a.b, b.b) - max(a.t, b.t)
    return w * h if w > 0 and h > 0 else 0.0


def blocks_overlap(
    a: Block,
    b: Block,
    overlap_threshold: float = 0.8,
    containment_threshold: float = 0.8,
) -> bool:
    """IoU above threshold OR either box mostly contained in the other
    (layout_postprocessor.py:86-106 check_overlap)."""
    area_a, area_b = _block_area(a), _block_area(b)
    if area_a <= 0 or area_b <= 0:
        return False
    inter = _intersection(a, b)
    iou = inter / (area_a + area_b - inter)
    return (
        iou > overlap_threshold
        or inter / area_a > containment_threshold
        or inter / area_b > containment_threshold
    )


def resolve_overlapping_blocks(
    blocks: list[Block],
    overlap_threshold: float = 0.8,
    containment_threshold: float = 0.8,
    area_threshold: float = 1.3,
    conf_threshold: float = 0.05,
) -> list[Block]:
    """Merge duplicate/contained blocks: candidate pairs from a sorted
    x-interval sweep, grouping via UnionFind, one survivor per group —
    the larger block unless its confidence (parse_score) trails by more
    than ``conf_threshold`` (layout_postprocessor.py:488-543 +
    _select_best_cluster_from_group, 'regular' OVERLAP_PARAMS). The
    survivor absorbs the losers' text in reading order and grows to the
    union bbox. Defaults match the reference's 'regular' class; a
    future layout model plugs its clusters straight in."""
    if len(blocks) < 2:
        return list(blocks)

    ids = list(range(len(blocks)))
    uf = UnionFind(ids)
    # sweep on x-intervals: only pairs whose [l, r] overlap are candidates
    order = sorted(ids, key=lambda i: blocks[i].l)
    active: list[int] = []
    for i in order:
        bi = blocks[i]
        active = [j for j in active if blocks[j].r > bi.l]
        for j in active:
            if blocks[j].page_no == bi.page_no and blocks_overlap(
                bi, blocks[j], overlap_threshold, containment_threshold
            ):
                uf.union(i, j)
        active.append(i)

    out: list[tuple[int, Block]] = []  # (reading-order key, block)
    for group in uf.groups().values():
        if len(group) == 1:
            out.append((group[0], blocks[group[0]]))
            continue
        members = sorted(group)  # reading order = creation order
        best = None
        for cand in members:
            bc = blocks[cand]
            ok = True
            for other in members:
                if other == cand:
                    continue
                bo = blocks[other]
                area_ratio = _block_area(bc) / max(_block_area(bo), 1e-9)
                conf_diff = bo.parse_score - bc.parse_score
                if area_ratio <= area_threshold and conf_diff > conf_threshold:
                    ok = False
                    break
            if ok and (
                best is None
                or (
                    _block_area(bc) > _block_area(blocks[best])
                    and blocks[best].parse_score - bc.parse_score <= conf_threshold
                )
            ):
                best = cand
        if best is None:
            best = members[0]
        bb = blocks[best]
        order_key = members[0]
        texts, seen = [], set()
        for m in members:
            t = blocks[m].text
            if t and t not in seen:
                seen.add(t)
                if m == best or t not in bb.text:
                    texts.append(t)
        merged = Block(
            kind=bb.kind,
            text=" ".join(texts) if len(texts) > 1 else bb.text,
            level=bb.level,
            page_no=bb.page_no,
            l=min(blocks[m].l for m in members),
            t=min(blocks[m].t for m in members),
            r=max(blocks[m].r for m in members),
            b=max(blocks[m].b for m in members),
            size=bb.size,
            parse_score=bb.parse_score,
        )
        out.append((order_key, merged))
    # preserve the caller's reading order (page_blocks emits column-major
    # order for two-column pages; a geometric re-sort would interleave
    # the columns) — survivors keep their earliest member's position
    out.sort(key=lambda kv: kv[0])
    return [b for _, b in out]
