"""HTML main-content extraction kernel (DOM-heuristic boilerplate strip).

The north rule (BASELINE.json ``north_rule``) names "HTML boilerplate
strip ... DOM heuristics" as a first-class part of the main-content
extraction pipeline; the reference repo itself is PDF-only, so this kernel
is specified against the rule (and the public boilerplate-removal
literature: Arc90 readability / boilerpipe-style link-density + structural
signals), not against a reference file.

Model: stream the document through the stdlib ``html.parser.HTMLParser``
(tolerant of malformed markup, O(1) state per open-tag class — no DOM tree
is materialized, so a 1 GB pathological page costs memory proportional to
its largest text block, not its node count). Text is segmented into blocks
at block-level tag boundaries; each block is kept or dropped by two
DOM heuristics:

1. **structural strip** — any text inside ``<nav>/<header>/<footer>/
   <aside>`` is boilerplate by construction; ``<script>/<style>/
   <noscript>/<title>`` content never enters a block at all;
2. **link density** — a surviving block is dropped iff
   ``HTML_LD_NUM * link_chars > HTML_LD_DEN * total_chars`` (chars counted
   on the RAW character data, anchors attributed while an ``<a>`` is
   open). The integer form keeps the rule exactly reproducible in ANSI
   SQL (contract module), so the DuckDB oracle can re-derive the keep
   decision per paragraph instead of trusting the kernel.

``<img>`` inside surviving content emits an interleaved media span
(kind='figure', text=alt, media_ref=src) at its DOM position — the
"interleaved text + media" payload shape of the input hint.

Entity references are decoded by the parser (``convert_charrefs=True``),
and kept block text is whitespace-normalized (``" ".join(text.split())``).

Malformed-markup stance: unclosed strip-tags (e.g. ``<nav>`` never closed)
conservatively strip the rest of the document — boilerplate containers are
template-emitted in real corpora and a false drop is the safe failure mode
for training data. Depth counters never go negative on orphan end tags.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List, Tuple

from .. import contract as C

# span tuple: (kind, text, media_ref) — media_ref '' for text spans
Span = Tuple[str, str, str]

_BLOCK_TAGS = frozenset(
    (
        "p div li ul ol dl dt dd h1 h2 h3 h4 h5 h6 figure figcaption table "
        "thead tbody tfoot tr td th blockquote pre article section main "
        "header footer nav aside form fieldset hr br"
    ).split()
)
_STRIP_TAGS = frozenset({"nav", "header", "footer", "aside"})
_SKIP_TAGS = frozenset({"script", "style", "noscript", "title"})
# void elements never push depth (they cannot contain text)
_VOID_TAGS = frozenset({"img", "br", "hr", "meta", "link", "input", "source"})


class _MainContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: List[Span] = []
        # (href, anchor_text, in_main) in document order; in_main = the
        # enclosing text block survived BOTH heuristics (links in
        # boilerplate or in link-dense blocks are navigation, not
        # citations); anchor_text = whitespace-normalized character data
        # collected while THAT anchor was open (the text a search indexer
        # attributes to the TARGET page)
        self.links: List[Tuple[str, str, bool]] = []
        self.n_dropped_structural = 0
        self.n_dropped_linkdense = 0
        # head metadata a crawl pipeline keys on: first rel=canonical href
        # (URL-level dedup key) and the robots-noindex directive
        self.canonical: str = ""
        self.noindex: bool = False
        self._buf: List[str] = []
        # per-block pending links: (href, text-part list); the part list of
        # the OPEN anchor keeps growing until the anchor closes (end tag,
        # a new <a>, or the block boundary — whichever comes first)
        self._blk_links: List[Tuple[str, List[str]]] = []
        self._a_parts: List[str] | None = None
        # media seen since the last flush, committed by the NEXT flush's
        # keep decision: an <img> between link-dense runs (sidebar thumbs,
        # share icons) is boilerplate chrome, not a content figure
        self._pending_media: List[Span] = []
        # density verdict of the last NON-EMPTY text run since the current
        # block opened: media adjacent to link-dense text on EITHER side is
        # chrome, and an empty flush alone must not launder it (a share
        # strip's trailing icon flushes with no text of its own). Reset at
        # every block START so a fresh container gets a clean context.
        self._ctx_dense = False
        self._canonical_seen = False
        self._total_chars = 0
        self._link_chars = 0
        self._strip = 0
        self._skip = 0
        self._anchor = 0

    # -- block lifecycle ---------------------------------------------------

    def _flush(self) -> None:
        if not self._buf and not self._blk_links and not self._pending_media:
            self._link_chars = 0
            self._total_chars = 0
            return
        total, link = self._total_chars, self._link_chars
        text = " ".join("".join(self._buf).split())
        hrefs = self._blk_links
        media = self._pending_media
        self._buf = []
        self._blk_links = []
        self._pending_media = []
        self._total_chars = 0
        self._link_chars = 0
        # anchor state never survives a block boundary: an UNCLOSED <a>
        # (ubiquitous in real crawls) would otherwise count 100% link
        # chars for the whole rest of the document and density-drop it
        # all. The HTML5-legal <a><div>card</div></a> shape loses its
        # link attribution — erring toward keeping content, the safe
        # failure for extraction (review finding).
        self._anchor = 0
        self._a_parts = None
        dense = C.HTML_LD_NUM * link > C.HTML_LD_DEN * total
        kept = bool(text) and self._strip == 0 and not dense
        self.links.extend(
            (h, " ".join("".join(parts).split()), kept) for h, parts in hrefs
        )
        # media commit rule: a figure between text runs follows the flushed
        # block's verdict; with no text in THIS flush it follows the block's
        # running context (_ctx_dense), so icons after a link-dense run are
        # chrome while a standalone <figure> in a fresh container is content
        # (structural/skip regions were already filtered at the <img>
        # itself, where that state is known)
        if kept or (not text and not self._ctx_dense):
            self.spans.extend(media)
        if text:
            self._ctx_dense = dense
        if not text:
            return
        if self._strip > 0:
            self.n_dropped_structural += 1
            return
        if dense:
            self.n_dropped_linkdense += 1
            return
        self.spans.append(("text", text, ""))

    # -- parser events -----------------------------------------------------

    def handle_starttag(self, tag, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if tag == "link":
            d = dict(attrs)
            # rel is a space-separated token list per the HTML spec;
            # first canonical tag wins even when its href is empty; a tag
            # inside a skip region (noscript/title) is not rendered head
            # metadata (review finding)
            if (
                not self._skip
                and "canonical" in (d.get("rel") or "").lower().split()
                and not self._canonical_seen
            ):
                self._canonical_seen = True
                self.canonical = d.get("href") or ""
            return
        if tag == "meta":
            d = dict(attrs)
            if (
                not self._skip
                and (d.get("name") or "").lower() == "robots"
                and "noindex" in (d.get("content") or "").lower()
            ):
                self.noindex = True
            return
        if tag == "img":
            self._flush()
            if self._strip == 0 and self._skip == 0:
                d = dict(attrs)
                self._pending_media.append(
                    ("figure", d.get("alt") or "", d.get("src") or "")
                )
            return
        if tag == "a":
            if self._skip:
                return
            # depth capped at 1: HTML forbids nested anchors and browsers
            # implicitly close the open one on a new <a> start (its text
            # collection ends here too)
            self._anchor = 1
            href = dict(attrs).get("href")
            if href:
                parts: List[str] = []
                self._blk_links.append((href, parts))
                self._a_parts = parts
            else:
                # href-less anchor still counts for link density but is
                # never a link record — collect no text for it
                self._a_parts = None
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            # <br>/<hr> are separators INSIDE a container, not fresh
            # containers — resetting the density context there would
            # re-open the chrome-media laundering hole (review finding)
            if tag not in _VOID_TAGS:
                self._ctx_dense = False
            if tag in _STRIP_TAGS:
                self._strip += 1

    def handle_endtag(self, tag) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a":
            self._anchor = 0
            self._a_parts = None
            return
        if tag in _BLOCK_TAGS and tag not in _VOID_TAGS:
            self._flush()
            if tag in _STRIP_TAGS:
                self._strip = max(0, self._strip - 1)

    def handle_startendtag(self, tag, attrs) -> None:
        # <tag/> — start semantics, then immediately undo any depth
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag == "a":
            self._anchor = 0
            self._a_parts = None
        elif tag in _STRIP_TAGS:
            self._strip = max(0, self._strip - 1)

    def handle_data(self, data) -> None:
        if self._skip or not data:
            return
        self._buf.append(data)
        self._total_chars += len(data)
        if self._anchor:
            self._link_chars += len(data)
            if self._a_parts is not None:
                self._a_parts.append(data)


def parse_page(html: str) -> _MainContentParser:
    """Run the full parse and return the parser state: ``spans``,
    ``links``, drop counters, ``canonical``, ``noindex``."""
    p = _MainContentParser()
    p.feed(html or "")
    p.close()
    p._flush()
    return p


def extract_main_html(html: str) -> List[Span]:
    """Parse one HTML document and return its main-content span sequence
    in DOM order: ``[(kind, text, media_ref), ...]``."""
    return parse_page(html).spans


def extract_links(html: str) -> List[Tuple[str, bool]]:
    """All anchor hrefs in document order, each tagged ``in_main`` — True
    iff the enclosing text block survived both keep heuristics. The
    outbound-link view a crawl pipeline feeds into domain filtering /
    link-graph construction: navigation chrome classifies False, citations
    inside kept prose classify True."""
    return [(h, m) for h, _t, m in parse_page(html).links]


def extract_links_text(html: str) -> List[Tuple[str, str, bool]]:
    """:func:`extract_links` plus the anchor TEXT per link — the words a
    linking page uses to describe the TARGET, the classic web-search
    relevance signal (anchor text is indexed under the target URL).
    ``(href, anchor_text, in_main)`` in document order; text is
    entity-decoded and whitespace-normalized, '' for empty anchors, and an
    anchor left open at a block boundary keeps the text collected up to
    that boundary (same conservative cut as the density attribution)."""
    return parse_page(html).links


def extract_main_html_report(html: str):
    """Like :func:`extract_main_html` but also returns the drop counters:
    ``(spans, n_dropped_structural, n_dropped_linkdense)``."""
    p = parse_page(html)
    return p.spans, p.n_dropped_structural, p.n_dropped_linkdense


def main_content_hash(spans: List[Span]) -> str:
    """THE content-dedup key: md5 of the kept text spans joined by
    newline in DOM order. Single definition shared by the batch report
    (``operators/htmlextract.html_extract_report`` /
    ``html_content_dups``) and the streaming twin
    (``streaming/dedup.dedup_html_stream``) so the two sides can never
    drift; the DuckDB oracle replays the same ``md5(string_agg(ptext,
    chr(10) ORDER BY i))`` arithmetic."""
    import hashlib

    main = "\n".join(s[1] for s in spans if s[0] == "text")
    return hashlib.md5(main.encode("utf-8")).hexdigest()
