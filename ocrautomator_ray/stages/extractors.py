"""Main-content extractors (north_rule: "HTML boilerplate strip, PDF/layout
parse, DOM heuristics"; SURVEY.md §2.2 T5/T6, §2.10 U1).

Pure, deterministic ``str -> str`` functions shared by the distributed
pipeline (inside the ExtractActor pool) and the single-threaded oracle — the
span-sequence contract checks the *pipeline*; these functions are pinned by
their own unit tests.

The HTML heuristic follows the published shallow-text-features approach
(Kohlschütter, Fankhauser, Nejdl — "Boilerplate Detection using Shallow Text
Features", WSDM 2010; Arc90 readability): segment the DOM into block-level
text blocks, score each by word count and link density, drop chrome
(nav/header/footer/aside) and script/style subtrees, keep dense blocks.
stdlib ``html.parser`` only (no lxml/bs4 in this environment).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_WS_RE = re.compile(r"\s+")

# Elements that end/flush a text block.
_BLOCK_TAGS = frozenset(
    "p div section article main h1 h2 h3 h4 h5 h6 li ul ol table tr td th "
    "blockquote pre br hr form fieldset header footer nav aside body html "
    "title figure figcaption".split()
)
# Subtrees whose text is never content.
_DROP_TAGS = frozenset("script style noscript template svg iframe".split())
# Subtrees that are page chrome (boilerplate by position).
_CHROME_TAGS = frozenset("nav header footer aside".split())

MIN_CONTENT_WORDS = 3
MAX_LINK_DENSITY = 0.33


def normalize_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


@dataclass
class _Block:
    parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    total_chars: int = 0
    in_chrome: bool = False

    def text(self) -> str:
        return normalize_ws("".join(self.parts))


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur = _Block()
        self._drop_depth = 0
        self._chrome_depth = 0
        self._link_depth = 0

    def _flush(self) -> None:
        if self._cur.total_chars:
            self.blocks.append(self._cur)
        self._cur = _Block(in_chrome=self._chrome_depth > 0)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_TAGS:
            self._drop_depth += 1
        if tag in _CHROME_TAGS:
            self._flush()
            self._chrome_depth += 1
            self._cur.in_chrome = True
        elif tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_TAGS and self._drop_depth:
            self._drop_depth -= 1
        if tag in _CHROME_TAGS and self._chrome_depth:
            self._flush()
            self._chrome_depth -= 1
            self._cur.in_chrome = self._chrome_depth > 0
        elif tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._link_depth:
            self._link_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._drop_depth:
            return
        n = len(normalize_ws(data))
        if not n:
            # Preserve a separator so adjacent inline runs don't merge words.
            self._cur.parts.append(" ")
            return
        self._cur.parts.append(data)
        self._cur.total_chars += n
        if self._link_depth:
            self._cur.link_chars += n

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def extract_html_main_content(html: str) -> str:
    """Boilerplate-strip an HTML document → main-content text.

    Keep a block iff it is not inside chrome, has ≥ MIN_CONTENT_WORDS words,
    and its link density ≤ MAX_LINK_DENSITY. Kept blocks are joined with
    a single newline, in document order.
    """
    p = _BlockParser()
    p.feed(html)
    p.close()
    kept: list[str] = []
    for b in p.blocks:
        if b.in_chrome:
            continue
        t = b.text()
        if not t:
            continue
        words = t.count(" ") + 1
        if words < MIN_CONTENT_WORDS:
            continue
        if b.total_chars and b.link_chars / b.total_chars > MAX_LINK_DENSITY:
            continue
        kept.append(t)
    return "\n".join(kept)


PDF_TEXT_MAGIC = "%PDF-TXT"
_PDF_LINE_RE = re.compile(r"^(\d+);(\d+);(.*)$")


def parse_pdf_layout(text: str) -> str:
    """Layout-parse the synthetic positioned-text PDF dump.

    Format: first line ``%PDF-TXT``, then one fragment per line ``x;y;text``.
    Reading order = sort by (y, x) (stable); fragments sharing a y join with
    a space, rows join with a newline. Malformed fragment lines are skipped
    (layout parsers are lossy by nature); stands in for a real PDF text+bbox
    extraction.
    """
    lines = text.split("\n")
    frags: list[tuple[int, int, str]] = []
    for ln in lines[1:]:
        m = _PDF_LINE_RE.match(ln)
        if m:
            frags.append((int(m.group(2)), int(m.group(1)), m.group(3)))
    frags.sort(key=lambda f: (f[0], f[1]))
    rows: list[str] = []
    cur_y: int | None = None
    cur: list[str] = []
    for y, _x, t in frags:
        if cur_y is not None and y != cur_y:
            rows.append(" ".join(cur))
            cur = []
        cur_y = y
        cur.append(t)
    if cur:
        rows.append(" ".join(cur))
    return "\n".join(rows)


def extract_plain(text: str) -> str:
    """Pass-through normalization (T5): trim outer whitespace only."""
    return text.strip()


def sniff_text_kind(text: str) -> str:
    """Content-sniff a text span: 'pdftext' | 'html' | 'plain'."""
    head = text.lstrip()[:64]
    if head.startswith(PDF_TEXT_MAGIC):
        return "pdftext"
    if head.startswith("<") and "</" in text:
        return "html"
    return "plain"


TEXT_EXTRACTORS = {
    "html": extract_html_main_content,
    "pdftext": parse_pdf_layout,
    "plain": extract_plain,
}


def extract_text_span(text: str) -> str:
    """Dispatch a text input span to the right extractor by sniffed kind."""
    return TEXT_EXTRACTORS[sniff_text_kind(text)](text)
