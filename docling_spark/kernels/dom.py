"""Minimal HTML DOM built on stdlib ``html.parser``.

Re-creates the subset of BeautifulSoup (``html.parser`` tree builder)
behavior that the extraction kernel depends on, pinned against the
reference backend's observable semantics
(/root/reference/docling/backend/html_backend.py:203-214 parses with
``BeautifulSoup(raw, "html.parser")``):

* stack-based tree building: an end tag pops to the nearest matching
  open tag, unmatched end tags are ignored;
* HTML void elements never take children;
* whitespace-only text runs collapse to ``"\n"`` (if they contain a
  newline) or ``" "`` unless inside ``pre``/``textarea``;
* character references decoded (``convert_charrefs=True``), except in
  ``script``/``style`` CDATA content;
* comments / doctypes / processing instructions are kept as skip-nodes
  (BeautifulSoup's ``PreformattedString``) that text extraction ignores.

No code is copied from BeautifulSoup; only the behavior needed for the
fixture corpus is implemented.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterable, Iterator, Optional, Union

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "basefont", "bgsound", "br", "col", "command",
        "embed", "frame", "hr", "image", "img", "input", "isindex",
        "keygen", "link", "menuitem", "meta", "nextid", "param", "source",
        "spacer", "track", "wbr",
    }
)

PRESERVE_WHITESPACE_TAGS = frozenset({"pre", "textarea"})


class TextNode(str):
    """A text node; subclass of str like bs4's NavigableString."""

    __slots__ = ("parent",)

    def __new__(cls, value: str):
        self = super().__new__(cls, value)
        self.parent = None
        return self


class SkipNode(TextNode):
    """Comment / doctype / PI — ignored by text extraction.

    Equivalent to bs4's ``PreformattedString`` family
    (html_backend.py:353-354, :412-413 skip these).
    """

    __slots__ = ()


Node = Union["Tag", TextNode]


def _name_matches(tag_name: str, name_filter) -> bool:
    if name_filter is None:
        return True
    if isinstance(name_filter, str):
        return tag_name == name_filter
    return tag_name in name_filter


# Parse-time descendant flags: a bit per "rare but scanned-for" tag.
# Marking open ancestors when such a tag starts costs O(depth) per
# occurrence; it lets the kernel skip whole-subtree find_all("img") /
# find("table") scans on the overwhelmingly common subtrees that lack
# them (profiled: ~15% of kernel time was these no-hit scans).
WATCH_IMG = 1
WATCH_FORMULA = 2
WATCH_TABLE = 4
# any block-level tag (html_kernel.BLOCK_TAGS imports this set): the
# walk asks "does this inline-looking subtree hide a block?" for
# almost every node — a parse-time bit turns that from an O(subtree)
# scan into one mask test
WATCH_BLOCK = 8
BLOCK_TAG_NAMES = frozenset(
    {
        "address", "details", "figure", "footer",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "ol", "p", "pre", "summary", "table", "ul",
    }
)
_WATCH_BITS = {"img": WATCH_IMG, "inline-formula": WATCH_FORMULA, "table": WATCH_TABLE}
for _t in BLOCK_TAG_NAMES:
    _WATCH_BITS[_t] = _WATCH_BITS.get(_t, 0) | WATCH_BLOCK


class Tag:
    __slots__ = ("name", "attrs", "contents", "parent", "watch")

    def __init__(self, name: str, attrs: Optional[dict] = None):
        self.name = name
        self.attrs = attrs or {}
        self.contents: list[Node] = []
        self.parent: Optional[Tag] = None
        self.watch = 0  # OR of _WATCH_BITS present in DESCENDANTS

    # -- construction -------------------------------------------------
    def append(self, node: Node) -> None:
        node.parent = self
        self.contents.append(node)

    # -- bs4-like API used by the kernel -------------------------------
    def get(self, key: str, default=None):
        return self.attrs.get(key, default)

    def __iter__(self) -> Iterator[Node]:
        return iter(self.contents)

    def __bool__(self) -> bool:  # empty tags are still truthy, like bs4
        return True

    def descendants(self) -> Iterator[Node]:
        # iterative pre-order DFS: nested `yield from` generators cost
        # one Python frame per tree level per item (profiled at ~13% of
        # kernel time on deep crawl pages)
        stack: list[Iterator[Node]] = [iter(self.contents)]
        while stack:
            it = stack[-1]
            advanced = False
            for node in it:
                yield node
                if isinstance(node, Tag) and node.contents:
                    stack.append(iter(node.contents))
                    advanced = True
                    break
            if not advanced:
                stack.pop()

    def find_all(
        self,
        name=None,
        recursive: bool = True,
        has_attr: Optional[str] = None,
    ) -> list["Tag"]:
        out: list[Tag] = []
        nodes: Iterable[Node] = self.descendants() if recursive else self.contents
        for node in nodes:
            if not isinstance(node, Tag):
                continue
            if not _name_matches(node.name, name):
                continue
            if has_attr is not None and has_attr not in node.attrs:
                continue
            out.append(node)
        return out

    def __call__(self, name=None, recursive: bool = True, has_attr=None):
        return self.find_all(name, recursive=recursive, has_attr=has_attr)

    def find(self, name=None, recursive: bool = True) -> Optional["Tag"]:
        nodes: Iterable[Node] = self.descendants() if recursive else self.contents
        for node in nodes:
            if isinstance(node, Tag) and _name_matches(node.name, name):
                return node
        return None

    def find_parent(self, name) -> Optional["Tag"]:
        p = self.parent
        while p is not None:
            if _name_matches(p.name, name):
                return p
            p = p.parent
        return None

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts: list[str] = []
        for node in self.descendants():
            if isinstance(node, SkipNode) or isinstance(node, Tag):
                continue
            s = str(node)
            if strip:
                s = s.strip()
                if not s:
                    continue
            parts.append(s)
        return separator.join(parts)

    def decompose(self) -> None:
        if self.parent is not None:
            try:
                self.parent.contents.remove(self)
            except ValueError:
                pass
            self.parent = None

    def replace_with(self, node: Node) -> None:
        if self.parent is None:
            return
        idx = self.parent.contents.index(self)
        node.parent = self.parent
        self.parent.contents[idx] = node
        self.parent = None

    def __repr__(self) -> str:  # debug aid only
        return f"<Tag {self.name} children={len(self.contents)}>"


class Soup(Tag):
    """Document root ('[document]' in bs4 terms)."""

    __slots__ = ()

    def __init__(self) -> None:
        super().__init__("[document]")

    @property
    def title(self) -> Optional[Tag]:
        return self.find("title")

    @property
    def body(self) -> Optional[Tag]:
        return self.find("body")


class _TreeParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Soup()
        self.stack: list[Tag] = [self.root]
        self._pre_depth = 0

    # -- text handling -------------------------------------------------
    def _append_text(self, data: str, cls=TextNode) -> None:
        if data == "":
            return
        if cls is TextNode and self._pre_depth == 0 and not data.strip():
            # bs4 collapses whitespace-only strings outside pre/textarea
            data = "\n" if "\n" in data else " "
        self.stack[-1].append(cls(data))

    def handle_data(self, data: str) -> None:
        self._append_text(data)

    def handle_comment(self, data: str) -> None:
        self.stack[-1].append(SkipNode(data))

    def handle_decl(self, decl: str) -> None:
        self.stack[-1].append(SkipNode(decl))

    def handle_pi(self, data: str) -> None:
        self.stack[-1].append(SkipNode(data))

    def unknown_decl(self, data: str) -> None:
        self.stack[-1].append(SkipNode(data))

    def updatepos(self, i: int, j: int) -> int:
        # stdlib HTMLParser tracks (lineno, offset) for error messages
        # on every chunk boundary — ~3% of kernel time at crawl scale
        # (profiled); nothing downstream reads positions, so skip it
        return j

    # -- tags ------------------------------------------------------------
    @staticmethod
    def _make_attrs(attrs) -> dict:
        out: dict = {}
        for k, v in attrs:
            if k not in out:  # first occurrence wins
                out[k] = "" if v is None else v
        return out

    def handle_starttag(self, tag: str, attrs) -> None:
        node = Tag(tag, self._make_attrs(attrs))
        self.stack[-1].append(node)
        bit = _WATCH_BITS.get(tag)
        if bit is not None:
            for open_tag in self.stack:
                open_tag.watch |= bit
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)
            if tag in PRESERVE_WHITESPACE_TAGS:
                self._pre_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].append(Tag(tag, self._make_attrs(attrs)))
        bit = _WATCH_BITS.get(tag)
        if bit is not None:
            for open_tag in self.stack:
                open_tag.watch |= bit

    def handle_endtag(self, tag: str) -> None:
        # pop to the nearest matching open tag; ignore if unmatched
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                for popped in self.stack[i:]:
                    if popped.name in PRESERVE_WHITESPACE_TAGS:
                        self._pre_depth -= 1
                del self.stack[i:]
                return


def parse_html(raw: Union[bytes, str]) -> Soup:
    """Parse HTML bytes/str into a Soup tree.

    Encoding: try UTF-8, fall back to latin-1 (never fails), matching the
    lenient behavior the pipeline needs at crawl scale.
    """
    if isinstance(raw, bytes):
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = raw.decode("latin-1", errors="replace")
    else:
        text = raw
    parser = _TreeParser()
    parser.feed(text)
    parser.close()
    return parser.root
