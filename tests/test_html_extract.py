"""HTML main-content extraction: kernel heuristics + fixture contract.

The Spark-vs-DuckDB value parity for ``html_extract`` /
``html_extract_report`` runs in tests/test_oracle_parity.py (auto-discovered
from the registry). Here: the DOM heuristics one by one, malformed-markup
robustness, and the generator->extractor->arithmetic-oracle loop on the
fixture corpus.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from pdf_extraction_and_query_spark import contract as C
from pdf_extraction_and_query_spark.core.htmlmain import (
    extract_main_html,
    extract_main_html_report,
)
from pdf_extraction_and_query_spark.sources.htmlcorpus import html_from_text

SF_DIR = "/root/testdata/sf0.001"


# --- DOM heuristics -------------------------------------------------------


def test_structural_strip():
    html = (
        "<body><nav><ul><li><a href='/'>Home</a></li></ul></nav>"
        "<p>Real content paragraph here.</p>"
        "<footer>All rights reserved.</footer></body>"
    )
    assert extract_main_html(html) == [("text", "Real content paragraph here.", "")]


def test_header_aside_stripped_and_counted():
    html = (
        "<header><p>Site title</p></header><aside><p>Related stuff</p></aside>"
        "<p>Body.</p>"
    )
    spans, n_struct, n_dense = extract_main_html_report(html)
    assert spans == [("text", "Body.", "")]
    assert n_struct == 2 and n_dense == 0


def test_link_density_drop_and_keep():
    # pure-link block dies; prose with a short inline link survives
    html = (
        "<div><a href='#'>Share</a> <a href='#'>Tweet</a></div>"
        "<p>See the <a href='/r'>full report</a> for the complete details "
        "of the merger.</p>"
    )
    spans, n_struct, n_dense = extract_main_html_report(html)
    assert spans == [
        (
            "text",
            "See the full report for the complete details of the merger.",
            "",
        )
    ]
    assert n_dense == 1 and n_struct == 0


def test_link_density_integer_boundary():
    # drop iff LD_NUM * link > LD_DEN * total (3*link > total): total 12
    # chars, link 4 -> 12 > 12 is false -> kept exactly at the boundary
    kept = "<p><a href='#'>abcd</a>efghijkl</p>"
    assert extract_main_html(kept) == [("text", "abcdefghijkl", "")]
    dropped = "<p><a href='#'>abcde</a>fghijkl</p>"  # 15 > 12 -> dropped
    assert extract_main_html(dropped) == []


def test_script_style_title_never_leak():
    html = (
        "<head><title>T</title><style>p{color:red}</style>"
        "<script>var x='<p>fake</p>';</script></head><body><p>Real.</p></body>"
    )
    assert extract_main_html(html) == [("text", "Real.", "")]


def test_img_media_span_interleaved_and_stripped_in_boilerplate():
    html = (
        "<header><img src='img://logo' alt='Logo'></header>"
        "<p>Before.</p><figure><img src='img://d/1' alt='Figure 1'></figure>"
        "<p>After.</p>"
    )
    assert extract_main_html(html) == [
        ("text", "Before.", ""),
        ("figure", "Figure 1", "img://d/1"),
        ("text", "After.", ""),
    ]


def test_entities_unescaped_and_whitespace_normalized():
    html = "<p>  Tom &amp; Jerry \n\t &lt;3  caf&eacute; </p>"
    assert extract_main_html(html) == [("text", "Tom & Jerry <3 café", "")]


def test_malformed_markup_is_tolerated():
    # unclosed p/div, stray end tags, self-closed nav
    html = "</div><p>One<p>Two<div>Three<nav/><p>Four"
    assert extract_main_html(html) == [
        ("text", "One", ""),
        ("text", "Two", ""),
        ("text", "Three", ""),
        ("text", "Four", ""),
    ]


def test_unclosed_strip_tag_drops_tail_conservatively():
    html = "<p>Kept.</p><nav><p>Menu</p><p>Tail never closed</p>"
    assert extract_main_html(html) == [("text", "Kept.", "")]


def test_empty_inputs():
    assert extract_main_html("") == []
    assert extract_main_html(None) == []  # type: ignore[arg-type]
    assert extract_main_html("<nav><a href='/'>Home</a></nav>") == []


# --- fixture generator contract ------------------------------------------


def test_generator_is_deterministic_and_escapes():
    h1 = html_from_text("7", "alpha <beta> gamma & delta " * 5)
    assert h1 == html_from_text("7", "alpha <beta> gamma & delta " * 5)
    assert "&lt;beta&gt;" in h1 and "&amp; delta" in h1
    spans = extract_main_html(h1)
    text = " ".join(s[1] for s in spans if s[0] == "text")
    assert "<beta>" in text and "gamma & delta" in text  # round-trip


def test_generator_extractor_matches_arithmetic_oracle_on_fixture():
    """Meet-in-the-middle loop on the real documents table: generate the
    boilerplate-wrapped page, extract, and compare against the DuckDB
    arithmetic oracle (which never sees any HTML)."""
    from pdf_extraction_and_query_spark.plans.registry import ORACLE_SQL

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    docs = con.sql("SELECT doc_id, text FROM documents").fetchdf()

    rows = []
    for d, t in zip(docs.doc_id, docs.text):
        spans = extract_main_html(html_from_text(str(d), t or ""))
        rows.extend(
            (str(d), j, k, tx, m) for j, (k, tx, m) in enumerate(spans)
        )
    py = pd.DataFrame(
        rows, columns=["doc_id", "span_order", "kind", "text", "media_ref"]
    )
    ora = con.sql(ORACLE_SQL["html_extract"]).fetchdf()

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    assert len(py) == len(ora) > 0
    pd.testing.assert_frame_equal(canon(py), canon(ora), check_dtype=False)


def test_density_rule_fires_both_ways_on_fixture():
    """The link-density heuristic must be load-bearing on the fixture: some
    content paragraphs dropped, some kept WITH their inline link."""
    from pdf_extraction_and_query_spark.plans.registry import _HTML_KEEP, _HTML_META

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    total, dropped, kept_linked = con.sql(
        f"WITH {_HTML_META} SELECT count(*),"
        f" sum(CASE WHEN {_HTML_KEEP} THEN 0 ELSE 1 END),"
        f" sum(CASE WHEN link_chars > 0 AND {_HTML_KEEP} THEN 1 ELSE 0 END)"
        f" FROM ht"
    ).fetchone()
    assert dropped > 0, "density rule never dropped a content paragraph"
    assert kept_linked > 0, "no linked paragraph survived the density rule"
    assert dropped < total / 2, "density rule dropping most content"


def test_pathological_pages_bounded():
    """Adversarial shapes the 10^12-doc crawl will contain: deep nesting,
    megabyte single blocks, orphan anchors — must complete and stay
    correct, never raise."""
    import time

    t0 = time.monotonic()
    deep = "<div>" * 20000 + "<p>core</p>" + "</div>" * 20000
    assert ("text", "core", "") in extract_main_html(deep)

    big = "<p>" + "word " * 1_000_000 + "</p>"
    spans = extract_main_html(big)
    assert len(spans) == 1 and len(spans[0][1]) == 5_000_000 - 1

    anchors = "<p>" + "<a href='#'>x</a>" * 5000 + " prose tail</p>"
    # 5000 link chars vs 5011 total -> link-dense -> dropped, no crash
    assert extract_main_html(anchors) == []
    assert time.monotonic() - t0 < 30


def test_extract_links_classification():
    from pdf_extraction_and_query_spark.core.htmlmain import extract_links

    html = (
        "<nav><a href='/home'>Home</a></nav>"
        "<p>Read the <a href='/cite'>long cited source text</a> in this "
        "long surrounding paragraph of prose.</p>"
        "<div><a href='#s'>Share</a> <a href='#t'>Tweet</a></div>"
        "<p><a>no href</a>anchor without target keeps no row</p>"
    )
    assert extract_links(html) == [
        ("/home", False),   # structural boilerplate
        ("/cite", True),    # citation inside kept prose
        ("#s", False),      # link-dense block
        ("#t", False),
    ]


def test_extract_links_text_semantics():
    """Anchor text: entity-decoded, whitespace-normalized, cut at implicit
    closes (new <a>, block boundary), '' for empty anchors, and never
    recorded for href-less anchors."""
    from pdf_extraction_and_query_spark.core.htmlmain import (
        extract_links_text,
    )

    html = (
        "<p>see <a href='/x'>A &amp;  B</a> in long surrounding prose "
        "text that keeps this paragraph.</p>"
        "<p><a href='/open'>cut here</p>"
        "<p><a href='/1'>first<a href='/2'>second</a> long enough prose "
        "tail keeps the block alive here.</p>"
        "<p><a href='/empty'></a>no anchor words in this long prose "
        "paragraph that survives density.</p>"
        "<p><a>href-less</a> collects nothing in this long surviving "
        "paragraph of prose text.</p>"
    )
    assert extract_links_text(html) == [
        ("/x", "A & B", True),
        ("/open", "cut here", False),  # whole-block link => dense
        ("/1", "first", True),
        ("/2", "second", True),
        ("/empty", "", True),
    ]


def test_extract_links_text_fixture_matches_arithmetic():
    """The fixture's anchor texts are word-index arithmetic: nav items,
    'More k' sidebar, cookie/share constants, and the first
    HTML_LINK_WORDS words of each cadence-triggered paragraph."""
    from pdf_extraction_and_query_spark.core.htmlmain import (
        extract_links_text,
    )

    words = [f"w{i}" for i in range(5 * C.HTML_WORDS_PER_PARA)]
    links = extract_links_text(html_from_text("9", " ".join(words)))
    texts = {h: t for h, t, _m in links}
    for item in C.HTML_NAV_ITEMS:
        assert texts[f"/{item.lower()}"] == item
    for k in range(C.HTML_SIDEBAR_LINKS):
        assert texts[f"/t/{k}"] == f"More {k}"
    assert texts["#a"] == "Accept all" and texts["#d"] == "Decline all"
    assert texts["#s"] == "Share" and texts["#t"] == "Tweet"
    for i in range(5):
        if i % C.HTML_LINK_EVERY == C.HTML_LINK_PHASE:
            assert texts[f"/ref/{i}"] == " ".join(
                words[
                    i * C.HTML_WORDS_PER_PARA : i * C.HTML_WORDS_PER_PARA
                    + C.HTML_LINK_WORDS
                ]
            )


def test_extract_links_fixture_orders_are_dense():
    from pdf_extraction_and_query_spark.core.htmlmain import extract_links

    links = extract_links(html_from_text("9", "alpha beta gamma " * 30))
    # fixed prefix: 6 nav + 8 sidebar + 2 cookie, suffix: 2 share
    assert [h for h, _ in links[:6]] == [
        f"/{x.lower()}" for x in C.HTML_NAV_ITEMS
    ]
    assert links[-2:] == [("#s", False), ("#t", False)]
    assert all(m is False for h, m in links[:16])


def test_head_metadata_canonical_and_noindex():
    from pdf_extraction_and_query_spark.core.htmlmain import parse_page

    p = parse_page(
        '<head><link rel="canonical" href="https://x/y"><link rel="canonical" '
        'href="https://second/ignored"><meta name="robots" '
        'content="NOINDEX, nofollow"></head><body><p>Body.</p></body>'
    )
    assert p.canonical == "https://x/y"  # first wins
    assert p.noindex is True
    q = parse_page("<meta name='robots' content='index,follow'><p>A.</p>")
    assert q.canonical == "" and q.noindex is False


def test_generator_metadata_cadence():
    h3 = html_from_text("3", "some words here")
    h4 = html_from_text("4", "some words here")
    assert 'content="noindex,nofollow"' in h3  # 3 % 7 == NOINDEX_PHASE
    assert "noindex" not in h4
    assert f'href="{C.HTML_CANONICAL_PREFIX}3"' in h3


# --- property-based: third independent mirror of the arithmetic ----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    # words: non-empty, no python-whitespace chars (str.split round-trip),
    # markup-hostile charset (escaping, entities, unicode)
    _word = st.text(
        alphabet="abcdefgz01<>&'\"éñ日.:;!?-_/",
        min_size=1,
        max_size=12,
    )

    def _expected(doc_id, words):
        """Pure-arithmetic expectation (independent of generator AND
        DuckDB oracle): the span sequence html_extract must produce."""
        wpp = C.HTML_WORDS_PER_PARA
        n_paras = (len(words) + wpp - 1) // wpp
        out, fig = [], 0
        for i in range(n_paras):
            if i % C.HTML_IMG_EVERY == C.HTML_IMG_PHASE:
                fig += 1
                out.append(
                    ("figure", f"Figure {fig}", f"img://{doc_id}/{fig}")
                )
            pw = words[i * wpp : (i + 1) * wpp]
            ptext = " ".join(pw)
            if i % C.HTML_AMP_EVERY == C.HTML_AMP_PHASE:
                ptext += " & more"
            link = (
                len(" ".join(pw[: C.HTML_LINK_WORDS]))
                if i % C.HTML_LINK_EVERY == C.HTML_LINK_PHASE
                and len(pw) > C.HTML_LINK_WORDS
                else 0
            )
            if C.HTML_LD_NUM * link <= C.HTML_LD_DEN * len(ptext):
                out.append(("text", ptext, ""))
        return out

    @settings(max_examples=150, deadline=None)
    @given(words=st.lists(_word, max_size=80), doc_seed=st.integers(0, 10**6))
    def test_property_generator_extractor_roundtrip(words, doc_seed):
        doc_id = str(doc_seed)
        spans = extract_main_html(html_from_text(doc_id, " ".join(words)))
        assert spans == _expected(doc_id, words)


def test_img_in_link_dense_block_is_chrome_not_figure():
    """Sidebar thumbnails / share icons: an <img> between link-dense runs
    of the same block follows the block's verdict (review finding); a
    standalone <figure> image stays content."""
    chrome = (
        '<div class="sidebar"><a href="#">A</a>'
        '<img src="img://thumb" alt="t"><a href="#">B</a></div>'
    )
    assert extract_main_html(chrome) == []
    kept = "<p>Prose.</p><figure><img src='img://d/1' alt='F'></figure>"
    assert extract_main_html(kept) == [
        ("text", "Prose.", ""),
        ("figure", "F", "img://d/1"),
    ]


def test_img_after_dense_text_and_img_runs_are_chrome():
    """Review round 2: the empty-flush path must not launder chrome media
    — an icon AFTER the dense run, and trailing images in an img sequence,
    follow the block's running density context."""
    assert extract_main_html(
        '<div class="share"><a href="#s">Share</a>'
        '<img src="img://icon" alt="i"></div>'
    ) == []
    assert extract_main_html(
        '<div><a href="#">A</a><img src="i1" alt="1">'
        '<img src="i2" alt="2"><a href="#">B</a></div>'
    ) == []
    # fresh container after chrome: context resets, figure is content
    assert extract_main_html(
        '<div class="share"><a href="#">S</a></div>'
        "<figure><img src='img://d/1' alt='F'></figure>"
    ) == [("figure", "F", "img://d/1")]


def test_canonical_rel_token_list_and_strict_first_wins():
    from pdf_extraction_and_query_spark.core.htmlmain import parse_page

    # rel is a space-separated token list per the HTML spec
    p = parse_page('<link rel="canonical alternate" href="https://x/y"><p>A.</p>')
    assert p.canonical == "https://x/y"
    # first canonical wins even when its href is empty
    q = parse_page(
        '<link rel="canonical" href=""><link rel="canonical" href="https://b">'
        "<p>A.</p>"
    )
    assert q.canonical == ""


def test_unclosed_anchor_never_poisons_following_blocks():
    """Review round 3 (highest severity): an unclosed <a> must not count
    100% link chars for the rest of the document — anchor state resets at
    block boundaries, and a new <a> implicitly closes an open one."""
    assert extract_main_html(
        '<p><a href="/x">read more</p><p>Actual article text follows here.</p>'
    ) == [("text", "Actual article text follows here.", "")]
    # nested anchors: browsers auto-close; second link still recorded
    from pdf_extraction_and_query_spark.core.htmlmain import extract_links

    links = extract_links(
        '<p><a href="/1">x<a href="/2">y</a> long surrounding prose text '
        "continues for a while here.</p>"
    )
    assert [h for h, _ in links] == ["/1", "/2"]


def test_br_between_chrome_runs_does_not_reset_density_context():
    """Review round 3: <br>/<hr> are separators inside a container, not
    fresh containers — a share strip's icon after a <br> stays chrome."""
    assert extract_main_html(
        '<div class="share"><a href="#s">Share</a><br>'
        '<img src="img://icon" alt="i"></div>'
    ) == []
    assert extract_main_html(
        '<div class="share"><a href="#s">Share</a><hr>'
        '<img src="img://icon" alt="i"></div>'
    ) == []


def test_skip_regions_never_feed_links_or_head_metadata():
    """Review round 3: noscript/title content is not rendered — anchors
    and robots/canonical tags inside them must be invisible."""
    from pdf_extraction_and_query_spark.core.htmlmain import (
        extract_links,
        parse_page,
    )

    assert extract_links("<noscript><a href='/ns'>x</a></noscript><p>A.</p>") == []
    p = parse_page(
        "<noscript><meta name='robots' content='noindex'>"
        '<link rel="canonical" href="https://bad"></noscript>'
        '<link rel="canonical" href="https://good"><p>A.</p>'
    )
    assert p.noindex is False and p.canonical == "https://good"


def test_shared_content_hash_definition():
    from pdf_extraction_and_query_spark.core.htmlmain import (
        main_content_hash,
        parse_page,
    )
    import hashlib

    spans = parse_page("<p>alpha</p><figure><img src='s' alt='a'></figure><p>beta</p>").spans
    assert main_content_hash(spans) == hashlib.md5(b"alpha\nbeta").hexdigest()
    assert main_content_hash([]) == "d41d8cd98f00b204e9800998ecf8427e"


if _HAVE_HYP:
    _FRAGMENTS = [
        "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<a>",
        "<nav>", "</nav>", "<footer>", "</footer>", "<script>", "</script>",
        "<style>", "</style>", "<noscript>", "</noscript>", "<title>",
        "</title>", "<img src='s' alt='a'>", "<br>", "<hr>", "<li>", "</li>",
        "<ul>", "</ul>", "<figure>", "</figure>", "<header>", "</header>",
        "<link rel='canonical' href='u'>", "<meta name='robots' content='noindex'>",
        "text words here", "&amp;", "&lt;", "&#x1F600;", "& broken entity",
        "<", ">", "<!-- comment -->", "<!DOCTYPE html>", "<p", "=x>",
    ]

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.sampled_from(_FRAGMENTS), max_size=40))
    def test_fuzz_tag_soup_never_crashes(frags):
        """A 10^12-page crawl WILL contain every malformed shape; the
        kernel must never raise and always return well-typed state."""
        from pdf_extraction_and_query_spark.core.htmlmain import parse_page

        p = parse_page("".join(frags))
        for kind, text, ref in p.spans:
            assert kind in ("text", "figure")
            assert isinstance(text, str) and isinstance(ref, str)
            if kind == "text":
                assert text == " ".join(text.split()) and text
        for href, atext, in_main in p.links:
            assert isinstance(href, str) and isinstance(in_main, bool)
            assert isinstance(atext, str) and atext == " ".join(atext.split())
        assert isinstance(p.canonical, str) and isinstance(p.noindex, bool)
        assert p.n_dropped_structural >= 0 and p.n_dropped_linkdense >= 0
