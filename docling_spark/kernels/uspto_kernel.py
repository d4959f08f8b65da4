"""USPTO patent backends (B8 in SURVEY.md §2.4).

Behavioral port of the reference's four patent parsers
(/root/reference/docling/backend/xml/uspto_backend.py:60-151 dispatch,
167-501 ICE, 503-845 grant v2.5, 848-1061 APS, 1063-1398 app v1,
1400-1694 OASIS table model) onto this engine's Doc IR — byte-identity
against the reference's committed groundtruth demands matching its
accumulation/stripping quirks exactly, so the per-generation
``_add_property`` state machines mirror the reference closely while
the surrounding infrastructure (document model, serializers, SAX base
class, ElementTree-based table parser instead of BeautifulSoup) is this
repo's own.

Generations:

* **ICE** — Grant/Application Full Text Data/XML 4.x (2005+)
* **Grant v2.5** — XML Version 2.5 (2002-2004), PDAT-keyed
* **APS** — key/value text format (1976-2001)
* **App v1** — Application XML 1.x (2001-2004)
"""

from __future__ import annotations

import html as _html
import re
import xml.etree.ElementTree as ET
import xml.sax
import xml.sax.handler

from .doc_model import PARAGRAPH, Doc, TableCellData, TableDataIR

XML_DECLARATION = '<?xml version="1.0" encoding="UTF-8"?>'

ABSTRACT_HEADING = ("ABSTRACT", 2)
CLAIMS_HEADING = ("CLAIMS", 2)

_TABLE_RE = re.compile(r"^(<table .*?</table>)", re.MULTILINE | re.DOTALL)


class UsptoError(Exception):
    pass


# ------------------------------------------------------------ text styling

# Unicode mappings for USPTO styled text (uspto_backend.py:1697-1905;
# factual character tables from unicode-table.com / W3C WD-math-970515).
_SUPERSCRIPT = str.maketrans(
    {
        "1": "&sup1;", "2": "&sup2;", "3": "&sup3;", "4": "&#8308;",
        "5": "&#8309;", "6": "&#8310;", "7": "&#8311;", "8": "&#8312;",
        "9": "&#8313;", "0": "&#8304;", "+": "&#8314;", "-": "&#8315;",
        "−": "&#8315;", "=": "&#8316;", "(": "&#8317;", ")": "&#8318;",
        "a": "&#170;", "o": "&#186;", "i": "&#8305;", "n": "&#8319;",
    }
)
_SUBSCRIPT = str.maketrans(
    {
        "1": "&#8321;", "2": "&#8322;", "3": "&#8323;", "4": "&#8324;",
        "5": "&#8325;", "6": "&#8326;", "7": "&#8327;", "8": "&#8328;",
        "9": "&#8329;", "0": "&#8320;", "+": "&#8330;", "-": "&#8331;",
        "−": "&#8331;", "=": "&#8332;", "(": "&#8333;", ")": "&#8334;",
        "a": "&#8336;", "e": "&#8337;", "o": "&#8338;", "x": "&#8339;",
    }
)
_MATH_ITALIC = str.maketrans(
    {
        c: f"&#{base + i};"
        for chars, base in (
            ("ABCDEFGHIJKLMNOPQRSTUVW", 119860),  # A-W contiguous
            ("YZ", 119884),
            ("abcdefghijklmnopqrstuvwxyz", 119886),
        )
        for i, c in enumerate(chars)
    }
)
# ISO 8879 greek entities -> standard HTML entities
_ISO8879_GREEK = {
    f"&{iso}gr;": f"&{std};"
    for iso, std in (
        ("A", "Alpha"), ("B", "Beta"), ("G", "Gamma"), ("D", "Delta"),
        ("E", "Epsilon"), ("Z", "Zeta"), ("EE", "Eta"), ("TH", "Theta"),
        ("I", "Iota"), ("K", "Kappa"), ("L", "Lambda"), ("M", "Mu"),
        ("N", "Nu"), ("X", "Xi"), ("O", "Omicron"), ("P", "Pi"),
        ("R", "Rho"), ("S", "Sigma"), ("T", "Tau"), ("U", "Upsilon"),
        ("PH", "Phi"), ("KH", "Chi"), ("PS", "Psi"), ("OH", "Omega"),
        ("a", "alpha"), ("b", "beta"), ("g", "gamma"), ("d", "delta"),
        ("e", "epsilon"), ("z", "zeta"), ("ee", "eta"), ("th", "theta"),
        ("i", "iota"), ("k", "kappa"), ("l", "lambda"), ("m", "mu"),
        ("n", "nu"), ("x", "xi"), ("o", "omicron"), ("p", "pi"),
        ("r", "rho"), ("s", "sigmaf"), ("t", "tau"), ("u", "upsilon"),
        ("ph", "phi"), ("kh", "chi"), ("ps", "psi"), ("oh", "omega"),
    )
}


def superscript(text: str) -> str:
    return _html.unescape(text.translate(_SUPERSCRIPT))


def subscript(text: str) -> str:
    return _html.unescape(text.translate(_SUBSCRIPT))


def math_italic(text: str) -> str:
    return _html.unescape(text.translate(_MATH_ITALIC))


def greek_from_iso8879(entity: str) -> str:
    return _ISO8879_GREEK.get(entity, entity)


# ---------------------------------------------------------- handler base


class _PatentHandler(xml.sax.handler.ContentHandler):
    """Shared SAX plumbing: tag registry, text accumulation, entity
    unescaping, sup/sub gating. Subclasses define the tag sets, the
    per-generation ``_add_property`` state machine, and how styles
    apply."""

    ROOTS: tuple = ()
    TEXT_TAGS: frozenset = frozenset()
    ALL_TAGS: frozenset = frozenset()
    SUP = ""
    SUB = ""
    LEVEL_ATTR = "level"
    STRIP_AT_END = False  # ICE strips text before _add_property

    def __init__(self) -> None:
        self.doc: Doc | None = None
        self.level = 1
        self.parents: dict = {1: None}
        self.text = ""
        self._clean_data()

    def _clean_data(self) -> None:
        self.property: list[str] = []
        self.claim = ""
        self.claims: list[str] = []
        self.abstract = ""

    # -- SAX events
    def startElement(self, tag, attributes):
        if tag in self.ROOTS:
            self.doc = Doc("file")
            self.text = ""
        self._start_registered_elements(tag, attributes)

    def endElement(self, tag):
        if tag in self.ROOTS:
            self._clean_data()
        if tag in self.ALL_TAGS and self.property:
            current_tag = self.property.pop()
            self._add_property(
                current_tag, self.text.strip() if self.STRIP_AT_END else self.text
            )

    def characters(self, content):
        self._push_text(content)

    def skippedEntity(self, name):
        if not self.property or self.property[-1] not in self.TEXT_TAGS:
            return
        escaped = greek_from_iso8879(f"&{name};")
        unescaped = _html.unescape(escaped)
        if unescaped == escaped:
            return
        self._push_text(unescaped)

    def _push_text(self, content: str) -> None:
        if not self.property:
            return
        top = self.property[-1]
        if top not in self.TEXT_TAGS:
            return
        if top in (self.SUP, self.SUB):
            # sup/sub must sit under a text element
            if len(self.property) < 2 or self.property[-2] not in self.TEXT_TAGS:
                return
            self.text += self._apply_style(content, top)
        else:
            self.text += content

    # -- heading level bookkeeping shared by the XML generations
    def _set_heading_level(self, attributes) -> None:
        level_attr = attributes.get(self.LEVEL_ATTR, "")
        new_level = int(level_attr) if level_attr.isnumeric() else 1
        max_level = min(self.parents.keys())
        self.level = new_level + 1 if (new_level + 1) in self.parents else max_level

    def _heading_parent(self, level: int):
        return self.parents[level] if level in self.parents else None

    def _add_fixed_heading(self, spec: tuple) -> object:
        text, want_level = spec
        level = want_level if want_level in self.parents else 1
        return self.doc.add_heading(text, level=level, parent=self.parents[level])

    def _start_registered_elements(self, tag, attributes) -> None:
        raise NotImplementedError

    def _add_property(self, name: str, text: str) -> None:
        raise NotImplementedError

    def _apply_style(self, text: str, style_tag: str) -> str:
        if style_tag == self.SUP:
            return superscript(text)
        if style_tag == self.SUB:
            return subscript(text)
        return text


# ------------------------------------------------------------------- ICE


class _IceHandler(_PatentHandler):
    """Grant/Application Full Text Data/XML 4.x ICE (2005+);
    uspto_backend.py:212-501."""

    ROOTS = ("us-patent-application", "us-patent-grant")
    TEXT_TAGS = frozenset(
        ["abstract", "invention-title", "claim-text", "p", "heading",
         "description-of-drawings", "sup", "sub"]
    )
    ALL_TAGS = TEXT_TAGS | frozenset(
        ["claims", "claim", "description", "table", "maths"]
    )
    SUP, SUB = "sup", "sub"
    LEVEL_ATTR = "level"
    STRIP_AT_END = True

    def _start_registered_elements(self, tag, attributes):
        if tag in self.ALL_TAGS:
            # claim lines may start before the previous one is closed
            if (
                tag == "claim-text"
                and self.property
                and self.property[-1] == tag
                and self.text.strip()
            ):
                self.claim += " " + self.text.strip()
                self.text = ""
            elif tag == "heading":
                self._set_heading_level(attributes)
            self.property.append(tag)

    def _add_property(self, name, text):
        if not name or not self.doc:
            return
        if name == "invention-title":
            if text:
                self.parents[self.level + 1] = self.doc.add_title(
                    text, parent=self.parents[self.level]
                )
                self.level += 1
            self.text = ""
        elif name == "abstract":
            if self.abstract:
                abstract_item = self._add_fixed_heading(ABSTRACT_HEADING)
                self.doc.add_text(label=PARAGRAPH, text=self.abstract, parent=abstract_item)
        elif name == "claim-text":
            text = re.sub("\\s+", " ", text).strip()
            if text:
                self.claim += " " + text
            self.text = ""
        elif name == "claim" and self.claim:
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "claims" and self.claims:
            claims_item = self._add_fixed_heading(CLAIMS_HEADING)
            for t in self.claims:
                self.doc.add_text(label=PARAGRAPH, text=t, parent=claims_item)
        elif name == "p" and text:
            text = re.sub("\\s+", " ", text)
            if "abstract" in self.property:
                self.abstract = (self.abstract + " " + text) if self.abstract else text
            else:
                self.doc.add_text(label=PARAGRAPH, text=text, parent=self.parents[self.level])
            self.text = ""
        elif name == "heading" and text:
            self.parents[self.level + 1] = self.doc.add_heading(
                text, level=self.level, parent=self.parents[self.level]
            )
            self.level += 1
            self.text = ""
        elif name == "table":
            self.doc.add_table(
                TableDataIR(0, 0, []), parent=self.parents[self.level]
            )


# -------------------------------------------------------------- grant v2.5


class _GrantV2Handler(_PatentHandler):
    """Grant Full Text Data/XML 2.5 (2002-2004), PDAT-keyed;
    uspto_backend.py:549-845."""

    ROOTS = ("PATDOC",)
    TEXT_TAGS = frozenset(["PDAT", "PARA", "H"])
    ALL_TAGS = TEXT_TAGS | frozenset(
        ["SDOAB", "SDOCL", "B540", "CL", "CLM", "DRWDESC", "SP", "SB",
         "ITALIC", "CWU", "table"]
    )
    SUP, SUB = "SP", "SB"
    LEVEL_ATTR = "LVL"
    STRIP_AT_END = False

    def __init__(self):
        super().__init__()
        self.paragraph = ""

    def _clean_data(self):
        super()._clean_data()
        self.text = ""
        self.paragraph = ""

    def _start_registered_elements(self, tag, attributes):
        if tag in self.ALL_TAGS:
            if tag == "H" and "SDOCL" not in self.property:
                self._set_heading_level(attributes)
            self.property.append(tag)

    def _apply_style(self, text, style_tag):
        if style_tag == "SP":
            return superscript(text)
        if style_tag == "SB":
            return subscript(text)
        if style_tag == "ITALIC":
            return math_italic(text)
        return text

    def _add_property(self, name, text):
        if not name or not self.doc:
            return
        if name == "PDAT" and text:
            if not self.property:
                self.text = ""
                return
            wrapper = self.property[-1]
            text = self._apply_style(text, wrapper)
            if "B540" in self.property and text.strip():
                self.parents[self.level + 1] = self.doc.add_title(
                    text.strip(), parent=self.parents[self.level]
                )
                self.level += 1
            elif "SDOAB" in self.property:
                self.abstract += text
            elif "CLM" in self.property:
                self.claim += text
            elif (
                "PARA" in self.property
                and "CLM" not in self.property
                and "SDOAB" not in self.property
            ):
                self.paragraph += text
            elif (
                "H" in self.property
                and "SDOCL" not in self.property
                and text.strip()
            ):
                self.parents[self.level + 1] = self.doc.add_heading(
                    text.strip(), level=self.level, parent=self.parents[self.level]
                )
                self.level += 1
            self.text = ""
        elif name == "CLM" and self.claim.strip():
            self.claims.append(self.claim.strip())
            self.claim = ""
        elif name == "CL" and self.claims:
            claims_item = self._add_fixed_heading(CLAIMS_HEADING)
            for t in self.claims:
                self.doc.add_text(label=PARAGRAPH, text=t, parent=claims_item)
        elif name == "SDOAB" and self.abstract.strip():
            abstract_item = self._add_fixed_heading(ABSTRACT_HEADING)
            self.doc.add_text(
                label=PARAGRAPH, text=self.abstract.strip(), parent=abstract_item
            )
        elif name == "PARA":
            paragraph = self.paragraph.strip()
            if paragraph and "CLM" not in self.property:
                self.doc.add_text(
                    label=PARAGRAPH, text=paragraph, parent=self.parents[self.level]
                )
            elif "CLM" in self.property:
                # a space may be needed after a paragraph in claim text
                self.claim += " "
            self.paragraph = ""
        elif name == "table":
            self.doc.add_table(TableDataIR(0, 0, []), parent=self.parents[self.level])


# ---------------------------------------------------------------- app v1


class _AppV1Handler(_PatentHandler):
    """Application Full Text Data/XML 1.x (2001-2004);
    uspto_backend.py:1110-1398."""

    ROOTS = ("patent-application-publication",)
    TEXT_TAGS = frozenset(
        ["title-of-invention", "claim-text", "paragraph", "heading",
         "superscript", "subscript"]
    )
    ALL_TAGS = TEXT_TAGS | frozenset(
        ["brief-description-of-drawings", "subdoc-abstract", "subdoc-claims",
         "claim", "number", "table", "math-cwu"]
    )
    SUP, SUB = "superscript", "subscript"
    LEVEL_ATTR = "lvl"
    STRIP_AT_END = False

    def _start_registered_elements(self, tag, attributes):
        if tag in self.ALL_TAGS:
            if (
                tag == "claim-text"
                and self.property
                and self.property[-1] == tag
                and self.text.strip()
            ):
                self.claim += " " + self.text.strip("\n")
                self.text = ""
            elif tag == "heading":
                self._set_heading_level(attributes)
            self.property.append(tag)

    def _apply_style(self, text, style_tag):
        formatted = _html.unescape(text)
        if style_tag == "superscript":
            return superscript(formatted)
        if style_tag == "subscript":
            return subscript(formatted)
        return formatted

    def _add_property(self, name, text):
        if not name or not self.doc:
            return
        if name == "title-of-invention":
            title = text.strip()
            if title:
                self.parents[self.level + 1] = self.doc.add_title(
                    title, parent=self.parents[self.level]
                )
                self.level += 1
            self.text = ""
        elif name == "subdoc-abstract":
            abstract = self.abstract.strip()
            if abstract:
                abstract_item = self._add_fixed_heading(ABSTRACT_HEADING)
                self.doc.add_text(label=PARAGRAPH, text=self.abstract, parent=abstract_item)
                self.abstract = ""
            self.text = ""
        elif name == "claim-text":
            if text:
                self.claim += self.text.strip("\n")
            self.text = ""
        elif name == "claim":
            claim = self.claim.strip()
            if claim:
                self.claims.append(claim)
            self.claim = ""
        elif name == "subdoc-claims" and self.claims:
            claims_item = self._add_fixed_heading(CLAIMS_HEADING)
            for t in self.claims:
                self.doc.add_text(label=PARAGRAPH, text=t, parent=claims_item)
        elif name in ("paragraph", "heading"):
            if text and "subdoc-abstract" in self.property:
                self.abstract = (self.abstract + text) if self.abstract else text
            elif text.strip():
                text = re.sub("\\s+", " ", text).strip()
                if name == "heading":
                    self.parents[self.level + 1] = self.doc.add_heading(
                        text, level=self.level, parent=self.parents[self.level]
                    )
                    self.level += 1
                else:
                    self.doc.add_text(
                        label=PARAGRAPH, text=text, parent=self.parents[self.level]
                    )
            self.text = ""
        elif name == "table":
            self.doc.add_table(TableDataIR(0, 0, []), parent=self.parents[self.level])


# ------------------------------------------------------------------- APS


class ApsParser:
    """Grant Full Text Data/APS key-value format (1976-2001);
    uspto_backend.py:848-1061."""

    SECTIONS = {"ABST", "BSUM", "DETD", "CLMS", "DRWD"}
    PARAGRAPH_FIELDS = ("PAR", "PA1", "PA2", "PA3")

    def __init__(self) -> None:
        self.doc: Doc | None = None
        self.level = 1
        self.parents: dict = {1: None}

    def _last_text_item(self):
        parent = self.parents[self.level]
        child_ids = self.doc.body_children if parent is None else parent.children
        texts = [
            self.doc.nodes[i] for i in child_ids if self.doc.nodes[i].kind == PARAGRAPH
        ]
        return texts[-1] if texts else None

    def store_section(self, section: str) -> None:
        if self.doc is None:
            return
        if section == "ABST":
            spec = ABSTRACT_HEADING
        elif section == "CLMS":
            spec = CLAIMS_HEADING
        else:
            return
        self.level = spec[1] if spec[1] in self.parents else 1
        self.parents[self.level + 1] = self.doc.add_heading(
            spec[0], level=self.level, parent=self.parents[self.level]
        )
        self.level += 1

    def store_content(self, section: str, field: str, value: str) -> None:
        if not self.doc or not field:
            return
        if field == "TTL":
            self.parents[self.level + 1] = self.doc.add_title(
                value, parent=self.parents[self.level]
            )
            self.level += 1
        elif field == "PAL" and section == "ABST":
            item = self._last_text_item()
            if item is not None:
                # text grows; orig keeps the creation-time value
                # (docling TextItem semantics — pinned by the APS json
                # groundtruth where appended claims keep orig="")
                item.text += " " + value
            else:
                self.doc.add_text(label=PARAGRAPH, text=value, parent=self.parents[self.level])
        elif field == "NUM" and section == "CLMS":
            self.doc.add_text(label=PARAGRAPH, text="", parent=self.parents[self.level])
        elif field in self.PARAGRAPH_FIELDS and section == "CLMS":
            last_claim = self._last_text_item()
            if last_claim is None:
                last_claim = self.doc.add_text(
                    label=PARAGRAPH, text="", parent=self.parents[self.level]
                )
            last_claim.text += f" {value.strip()}" if last_claim.text else value.strip()
        elif field == "PAC" and section in ("BSUM", "DETD", "DRWD"):
            # captions are siblings of abstract (no level info provided)
            self.level = (
                ABSTRACT_HEADING[1] if ABSTRACT_HEADING[1] in self.parents else 1
            )
            self.parents[self.level + 1] = self.doc.add_heading(
                value, level=self.level, parent=self.parents[self.level]
            )
            self.level += 1
        elif field in self.PARAGRAPH_FIELDS and section in ("BSUM", "DETD", "DRWD"):
            self.doc.add_text(label=PARAGRAPH, text=value, parent=self.parents[self.level])

    def parse(self, content: str) -> Doc:
        self.doc = Doc("file")
        section = key = value = ""
        for line in content.splitlines():
            cols = re.split("\\s{2,}", line, maxsplit=1)
            if key and value and (len(cols) == 1 or (len(cols) == 2 and cols[0])):
                self.store_content(section, key, value)
                key = ""
                value = ""
            if len(cols) == 1:  # section title
                section = cols[0]
                self.store_section(section)
            elif len(cols) == 2:
                if cols[0]:
                    key = cols[0]
                    value = cols[1]
                elif not re.match(r"^##STR\d+##$", cols[1]):  # continuation
                    value += " " + cols[1]
        if key and value:
            self.store_content(section, key, value)
        return self.doc


# ---------------------------------------------------------- OASIS tables

_UNDEF_ENTITY_RE = re.compile(r"&(?!amp;|lt;|gt;|quot;|apos;|#)[A-Za-z][A-Za-z0-9]*;")


class XmlTable:
    """OASIS Open XML Exchange Table Model parser
    (uspto_backend.py:1400-1694; DTD at oasis-open.org/specs/soextblx.dtd).

    Column widths from <colspec> define per-tgroup offsets; the union of
    offsets across tgroups defines the unified column grid; namest/
    nameend entry spans replicate cells across their range; rows pad to
    the widest tgroup; fully-empty rows are dropped."""

    def __init__(self, input_xml: str) -> None:
        self.empty_text = ""
        # the reference's XML soup (lxml, recover=True) drops undefined
        # entities; strip them before the strict stdlib parse
        clean = _UNDEF_ENTITY_RE.sub("", input_xml)
        try:
            self._root = ET.fromstring(clean)
        except ET.ParseError as exc:
            raise UsptoError(f"table xml: {exc}") from exc
        self._parents = {c: p for p in self._root.iter() for c in p}

    def _find_table(self):
        if self._root.tag == "table":
            return self._root
        return self._root.find(".//table")

    @staticmethod
    def _col_width(raw: str):
        cw = re.sub("pt", "", raw, flags=re.I)
        cw = re.sub("mm", "", cw, flags=re.I)
        try:
            return int(cw)
        except ValueError:
            return float(cw)

    def _create_tg_range(self, tgs: list[dict]) -> dict[int, dict]:
        colinfo: dict[int, dict] = {}
        if not tgs:
            return colinfo
        for itg, tg in enumerate(tgs):
            info = {"offset": [], "colwidth": [], "cell_range": [], "cell_offst": [0]}
            offst = 0
            for spec in tg["colinfo"]:
                cw = self._col_width(spec["colwidth"])
                info["colwidth"].append(cw)
                info["offset"].append(offst)
                offst += cw
            info["offset"].append(offst)
            colinfo[itg] = info

        offsets = list(colinfo[0]["offset"])
        offset_w0 = []
        for col in colinfo.values():
            for ic, cw in enumerate(col["colwidth"]):
                if cw == 0:
                    offset_w0.append(col["offset"][ic])
            offsets = sorted(set(col["offset"] + offsets))
        # restore duplicate slots for zero-width columns
        offsets = sorted(offsets + list(set(offset_w0)))

        for col in colinfo.values():
            i = 1
            range_ = 1
            for min_i in range(1, len(offsets)):
                min_offst = offsets[min_i]
                offst = col["offset"][i]
                if min_offst == offst:
                    if len(col["offset"]) == i + 1 and len(offsets) > min_i + 1:
                        range_ += 1
                    else:
                        col["cell_range"].append(range_)
                        col["cell_offst"].append(col["cell_offst"][-1] + range_)
                        range_ = 1
                        i += 1
                elif min_offst < offst:
                    range_ += 1
                else:
                    return {}  # inconsistent offsets: give up on the table
        ncols_max = len(offsets) - 1
        for col in colinfo.values():
            col["ncols_max"] = ncols_max
        return colinfo

    def parse(self) -> TableDataIR | None:
        table = self._find_table()
        if table is None:
            return None

        tgs: list[dict] = []
        tg_elems = [el for el in table.iter() if el.tag == "tgroup"]
        for tg in tg_elems:
            cols_val = tg.get("cols", "")
            tg_info = {
                "ncols": int(cols_val) if cols_val.isnumeric() else 1,
                "colinfo": [
                    {"colname": cs.get("colname"), "colwidth": cs.get("colwidth")}
                    for cs in tg.iter()
                    if cs.tag == "colspec"
                ],
            }
            tgs.append(tg_info)

        tgs_range = self._create_tg_range(tgs)
        if not tgs_range:
            return TableDataIR(0, 0, [])
        ncols_max = max(len(info["colwidth"]) for info in tgs_range.values())

        cells: list[TableCellData] = []
        i_row = 0
        for itg, tg in enumerate(tg_elems):
            tg_range = tgs_range[itg]
            rows = [el for el in tg.iter() if el.tag in ("row", "tr")]
            for row in rows:
                entries = [el for el in row.iter() if el.tag in ("entry", "td")]
                parent = self._parents.get(row)
                is_header = parent is not None and parent.tag == "thead"
                ncols = 0
                local_row: list[TableCellData] = []
                is_row_empty = True
                wrong_nbr_cols = False
                for ientry, entry in enumerate(entries):
                    text = "".join(entry.itertext()).strip()
                    namest = entry.get("namest")
                    nameend = entry.get("nameend")
                    start = (
                        int(namest)
                        if isinstance(namest, str) and namest.isnumeric()
                        else ientry + 1
                    )
                    if isinstance(nameend, str) and nameend.isnumeric():
                        end = int(nameend)
                        shift = 0
                    else:
                        end = ientry + 2
                        shift = 1
                    if end > len(tg_range["cell_offst"]):
                        wrong_nbr_cols = True
                        break
                    rng = [
                        tg_range["cell_offst"][start - 1],
                        tg_range["cell_offst"][end - 1] - shift,
                    ]
                    cell_text = text if text else self.empty_text
                    if cell_text != self.empty_text:
                        is_row_empty = False
                    for _ in range(rng[0], rng[1] + 1):
                        ncols += 1
                        local_row.append(
                            TableCellData(
                                text=cell_text,
                                row_span=1,
                                col_span=rng[1] - rng[0] + 1,
                                start_row=i_row,
                                end_row=i_row + 1,
                                start_col=rng[0],
                                end_col=rng[1] + 1,
                                column_header=is_header,
                            )
                        )
                if wrong_nbr_cols:
                    local_row = []
                    ncols = 0
                for irep in range(ncols, ncols_max):
                    local_row.append(
                        TableCellData(
                            text=self.empty_text,
                            row_span=1,
                            col_span=1,
                            start_row=i_row,
                            end_row=i_row + 1,
                            start_col=irep,
                            end_col=irep + 1,
                            column_header=is_header,
                        )
                    )
                if not is_row_empty:
                    cells.extend(local_row)
                    i_row += 1

        return TableDataIR(i_row, ncols_max, cells)


# --------------------------------------------------------------- dispatch


def _select_parser(content: str):
    """Doctype-based parser choice (uspto_backend.py:87-104)."""
    for line in content.splitlines():
        if line == "PATN":
            return "aps"
        if line.startswith("<!DOCTYPE"):
            lower = line.lower()
            if "us-patent-application-v4" in lower or "us-patent-grant-v4" in lower:
                return "ice"
            if "us-grant-025" in lower:
                return "grant_v2"
            if "patent-application-publication" in lower and "pap-v1" in lower:
                return "app_v1"
            return None
    return None


def parse_uspto(data: bytes, name: str = "file") -> Doc:
    """bytes -> Doc IR for any supported USPTO generation. Raises
    UsptoError on unrecognized doctypes or malformed XML."""
    content = data.decode("utf-8", errors="replace")
    kind = _select_parser(content)
    if kind is None:
        raise UsptoError("unrecognized USPTO doctype")

    if kind == "aps":
        doc = ApsParser().parse(content)
    else:
        handler = {
            "ice": _IceHandler,
            "grant_v2": _GrantV2Handler,
            "app_v1": _AppV1Handler,
        }[kind]()
        try:
            xml.sax.parseString(content.encode("utf-8"), handler)
        except xml.sax.SAXParseException as exc:
            raise UsptoError(f"sax: {exc}") from exc
        doc = handler.doc
        if doc is None:
            raise UsptoError("no patent document element found")
        _fill_tables(doc, content)
    doc.name = name
    return doc


def _fill_tables(doc: Doc, content: str) -> None:
    """Parse raw <table> fragments with XmlTable and attach them to the
    placeholder table nodes, in document order; on a count mismatch the
    placeholders stay empty (reference behavior)."""
    raw_tables = _TABLE_RE.findall(content)
    parsed: list[TableDataIR] = []
    for fragment in raw_tables:
        try:
            data = XmlTable(XML_DECLARATION + "\n" + fragment).parse()
            if data is not None:
                parsed.append(data)
        except Exception:  # noqa: BLE001 — skip broken tables like the reference
            continue
    table_nodes = [n for n in doc.nodes if n.kind == "table"]
    if len(parsed) == len(table_nodes):
        for node, data in zip(table_nodes, parsed):
            node.table = data
