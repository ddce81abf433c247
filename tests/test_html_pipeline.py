"""HTML source through the FULL extraction pipeline: html parse ->
span-corpus adapter -> staged/fused/hybrid chunking, all equal to the
eager kernel on the adapter's output (the north rule's one-pipeline,
two-source-formats contract)."""

from __future__ import annotations

import duckdb
import pytest

from pdf_extraction_and_query_spark.core.docpipe import ExtractConfig, extract_document
from pdf_extraction_and_query_spark.core.htmlmain import extract_main_html
from pdf_extraction_and_query_spark.operators.htmlextract import (
    html_extract_span_corpus,
)
from pdf_extraction_and_query_spark.plans.extract import extract_spans
from pdf_extraction_and_query_spark.sources.htmlcorpus import html_from_text

SF_DIR = "/root/testdata/sf0.001"
CFG = ExtractConfig()
N_DOCS = 60


@pytest.fixture(scope="module")
def html_docs():
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' LIMIT {N_DOCS}"
    ).fetchall()
    return [(str(d), html_from_text(str(d), t or "")) for d, t in rows]


def _eager_spans(html: str):
    return [
        {
            "kind": kind,
            "text": text,
            "media_ref": ref or None,
            "offset": j,
            "page": None,
            "font_size": None,
            "bold": None,
        }
        for j, (kind, text, ref) in enumerate(extract_main_html(html))
    ]


@pytest.fixture(scope="module")
def oracle_out(html_docs):
    return {
        doc_id: [
            (r["order"], r["kind"], r["text"], r["media_ref"])
            for r in extract_document(_eager_spans(h), CFG)
        ]
        for doc_id, h in html_docs
    }


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], []).append(
            (r["order"], r["kind"], r["text"], r["media_ref"])
        )
    for v in out.values():
        v.sort()
    return out


def test_adapter_matches_kernel(spark, html_docs):
    """The zero-shuffle span-corpus adapter reproduces the kernel's span
    arrays exactly (schema lift included)."""
    df = spark.createDataFrame(html_docs, schema="doc_id string, html string")
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in html_extract_span_corpus(df).collect()
    }
    for doc_id, h in html_docs:
        expected = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in _eager_spans(h)
        ]
        assert got[doc_id] == expected, doc_id


@pytest.mark.parametrize("mode", ["staged", "fused", "hybrid"])
def test_html_pipeline_matches_oracle(spark, html_docs, oracle_out, mode):
    df = spark.createDataFrame(html_docs, schema="doc_id string, html string")
    out = _collect(extract_spans(html_extract_span_corpus(df), mode=mode))
    assert set(out) == {d for d, v in oracle_out.items() if v}
    for doc_id, expected in oracle_out.items():
        got = out.get(doc_id, [])
        assert got == expected, (
            f"{doc_id}: got {len(got)} spans, expected {len(expected)}"
        )


def test_media_survives_end_to_end(spark, html_docs, oracle_out):
    """Figures referenced in the HTML must appear interleaved in the final
    chunk stream (media routed, never dropped)."""
    n_media_expected = sum(
        1 for v in oracle_out.values() for s in v if s[1] in ("figure", "table")
    )
    assert n_media_expected > 0
    df = spark.createDataFrame(html_docs, schema="doc_id string, html string")
    got = extract_spans(html_extract_span_corpus(df), mode="hybrid")
    n_media = got.where("kind in ('figure','table')").count()
    assert n_media == n_media_expected


def test_html_media_refs_join_multimodal_family(spark, html_docs):
    """HTML <img> refs flow into the multimodal plumbing: media table
    synthesized per distinct ref, decoded features classify as images."""
    from pdf_extraction_and_query_spark.operators.htmlextract import html_extract
    from pdf_extraction_and_query_spark.operators.multimodal import (
        extract_features,
        synth_media_table,
    )

    df = spark.createDataFrame(html_docs, schema="doc_id string, html string")
    media_rows = html_extract(df).where("kind = 'figure'")
    n_refs = media_rows.select("media_ref").distinct().count()
    assert n_refs > 0
    feats = extract_features(synth_media_table(spark, media_rows))
    got = feats.collect()
    assert len(got) == n_refs
    assert all(r["modality"] == "image" and r["width"] > 0 for r in got)


def test_html_checkpoint_kill_resume(spark, html_docs, tmp_path_factory):
    """North-rule resumability on the HTML surface: run 1 killed after one
    wave, run 2 resumes past the completed buckets, final output equals
    the straight-through pipeline; ledger carries per-bucket lineage."""
    from pdf_extraction_and_query_spark.plans.checkpoint import (
        completed_buckets,
        read_ledger,
        run_checkpointed_html,
    )

    def _spanset(frame):
        return {
            (r["doc_id"], r["order"], r["kind"], r["text"], r["media_ref"])
            for r in frame.select(
                "doc_id", "order", "kind", "text", "media_ref"
            ).collect()
        }

    base = tmp_path_factory.mktemp("hckpt")
    out_dir, ledger_dir = str(base / "out"), str(base / "ledger")
    df = spark.createDataFrame(html_docs, schema="doc_id string, html string")

    r1 = run_checkpointed_html(
        spark, df, out_dir, ledger_dir, "html-job",
        n_buckets=6, buckets_per_wave=2, max_waves=1, cfg=CFG,
    )
    assert r1.waves_run == 1 and len(r1.processed_buckets) == 2
    assert completed_buckets(spark, ledger_dir, "html-job") == sorted(
        r1.processed_buckets
    )

    r2 = run_checkpointed_html(
        spark, df, out_dir, ledger_dir, "html-job",
        n_buckets=6, buckets_per_wave=2, cfg=CFG,
    )
    assert sorted(r2.skipped_buckets) == sorted(r1.processed_buckets)
    assert sorted(r1.processed_buckets + r2.processed_buckets) == list(range(6))

    expected = _spanset(
        extract_spans(html_extract_span_corpus(df), CFG, mode="hybrid")
    )
    got = _spanset(spark.read.parquet(out_dir).drop("bucket"))
    assert got == expected and got

    led = read_ledger(spark, ledger_dir)
    totals = led.groupBy().sum("n_out_spans").collect()[0][0]
    assert totals == len(expected)


def test_canonical_dups_never_groups_pages_without_canonical(spark):
    """Pages lacking rel=canonical share canonical='' but are NOT mirrors
    — they must never form a dedup group (review finding)."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        html_canonical_dups,
    )

    pages = spark.createDataFrame(
        [
            ("a", "<p>alpha page</p>"),            # no canonical
            ("b", "<p>beta page</p>"),             # no canonical
            ("c", '<link rel="canonical" href="u"><p>c</p>'),
            ("d", '<link rel="canonical" href="u"><p>d</p>'),
        ],
        schema="doc_id string, html string",
    )
    got = {r["canonical"]: (r["n_pages"], r["keeper_doc_id"])
           for r in html_canonical_dups(pages).collect()}
    assert got == {"u": (2, "c")}


def test_content_dups_are_boilerplate_independent(spark):
    """The same article under DIFFERENT site chrome must hash identically
    (the point of dedup-after-extraction); distinct articles must not.
    Empty-content pages never group."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        html_content_dups,
    )

    article = "<p>The merger closed after the disclosure schedule review.</p>"
    pages = spark.createDataFrame(
        [
            ("a", f"<nav><a href='/'>Home</a></nav>{article}<footer>A Corp</footer>"),
            ("b", f"<header><p>Other site</p></header>{article}"
                 "<div class='share'><a href='#'>Tweet</a></div>"),
            ("c", "<p>A different article entirely.</p>"),
            ("d", "<nav><a href='/'>Home</a></nav>"),   # no content
            ("e", "<footer><p>chrome only</p></footer>"),  # no content
        ],
        schema="doc_id string, html string",
    )
    rows = html_content_dups(pages).collect()
    assert len(rows) == 1
    assert rows[0]["n_pages"] == 2 and rows[0]["keeper_doc_id"] == "a"


def test_crawl_keep_latest_policy(spark):
    """Keep-latest recrawl resolution: the newest fetch wins; equal
    timestamps break on the STRING form of doc_id (the documented total
    order — same rule the DuckDB oracle replays); canonical-less pages are
    excluded; single-fetch URLs appear with n_superseded = 0."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        crawl_keep_latest,
    )

    rep = spark.createDataFrame(
        [
            ("1", "u", 100),   # superseded by doc 2
            ("2", "u", 200),   # winner: latest ts
            ("3", "u", 150),
            ("10", "v", 300),  # ts tie with doc 9: string '9' > '10'
            ("9", "v", 300),
            ("5", "w", 50),    # single fetch
            ("6", "", 999),    # no canonical: excluded entirely
        ],
        schema="doc_id string, canonical string, fetched_at_ts long",
    )
    got = {
        r["canonical"]: (
            r["n_crawls"],
            r["latest_doc_id"],
            r["latest_fetched_at_ts"],
            r["n_superseded"],
        )
        for r in crawl_keep_latest(rep).collect()
    }
    assert got == {
        "u": (3, "2", 200, 2),
        "v": (2, "9", 300, 1),
        "w": (1, "5", 50, 0),
    }


def test_crawl_corpus_policy_applies_to_winner(spark):
    """The indexable-corpus gate judges the WINNING fetch: a URL whose
    LATEST fetch is noindex is excluded even though an older indexable
    fetch exists (the site's current directive governs — a stale fetch
    never resurrects it); an empty-content winner is excluded; a clean
    winner passes with its recrawl count."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        crawl_corpus,
    )

    rep = spark.createDataFrame(
        [
            # url u: old fetch indexable, NEW fetch noindex -> excluded
            ("1", "u", 100, False, 50),
            ("2", "u", 200, True, 60),
            # url v: latest fetch indexable -> kept, n_crawls counts both
            ("3", "v", 100, True, 40),
            ("4", "v", 200, False, 70),
            # url w: winner has no extractable content -> excluded
            ("5", "w", 100, False, 0),
        ],
        schema=(
            "doc_id string, canonical string, fetched_at_ts long, "
            "noindex boolean, n_chars_main long"
        ),
    )
    got = {r["canonical"]: tuple(r) for r in crawl_corpus(rep).collect()}
    assert set(got) == {"v"}
    assert got["v"] == ("v", "4", 200, 70, 2)


def test_recrawl_change_stats_semantics(spark):
    """Change detection under the keep-latest order: latest vs PREVIOUS
    fetch (not vs any older version); distinct versions counted
    boilerplate-independently; single-fetch URLs report no change and
    ratio 0; null fetch times coerce to TS_UNKNOWN (a timed fetch is
    always newer); canonical-less rows are excluded."""
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        recrawl_change_stats,
    )

    rep = spark.createDataFrame(
        [
            # u: h1 -> h2 -> h2 (latest unchanged vs previous; 2 versions)
            ("1", "u", 100, "h1"),
            ("2", "u", 200, "h2"),
            ("3", "u", 300, "h2"),
            # v: h1 -> h3 (latest CHANGED)
            ("4", "v", 100, "h1"),
            ("5", "v", 200, "h3"),
            # w: single fetch
            ("6", "w", 50, "h9"),
            # x: null ts loses to the timed fetch; latest changed
            ("7", "x", None, "ha"),
            ("8", "x", 10, "hb"),
            ("9", "", 999, "hz"),  # no canonical: excluded
        ],
        schema=(
            "doc_id string, canonical string, fetched_at_ts long, "
            "content_hash string"
        ),
    )
    got = {r["canonical"]: tuple(r)[1:] for r in recrawl_change_stats(rep).collect()}
    assert got == {
        "u": (3, 2, False, 500000),
        "v": (2, 2, True, 1000000),
        "w": (1, 1, False, 0),
        "x": (2, 2, True, 1000000),
    }


def test_link_in_degree_equals_kernel_rollup(spark, html_docs):
    """The distributed in-degree rollup must equal a driver-side
    aggregation of the link kernel over the same pages — and chrome links
    (nav/sidebar/share) must never count as main-content citations."""
    from collections import defaultdict

    from pdf_extraction_and_query_spark.core.htmlmain import extract_links
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        link_in_degree,
    )

    pages = html_docs[:20]
    want_total: dict = defaultdict(int)
    want_main: dict = defaultdict(int)
    for _, h in pages:
        for href, in_main in extract_links(h):
            want_total[href] += 1
            want_main[href] += int(in_main)

    df = spark.createDataFrame(pages, schema="doc_id string, html string")
    got = {
        r["href"]: (r["n_inlinks"], r["n_inlinks_main"])
        for r in link_in_degree(df).collect()
    }
    assert got == {h: (want_total[h], want_main[h]) for h in want_total}
    # chrome targets exist on every page and are never main-content
    assert got["/home"] == (len(pages), 0)
    assert got["#s"][1] == 0 and got["#a"][1] == 0
    # at least one cadence-triggered content link was classified in_main
    assert any(h.startswith("/ref/") and m > 0 for h, (_, m) in got.items())


def test_search_over_html_chunks_end_to_end(spark, html_docs):
    """The reference's whole user story (ingest -> chunk -> search) over
    the HTML source: BM25 retrieval on the chunk table produced by the
    shared pipeline returns ranked, non-empty hits for terms that exist
    in the extracted main content — and never matches boilerplate-only
    terms (nav labels were stripped before indexing)."""
    from pyspark.sql import functions as F

    from pdf_extraction_and_query_spark.operators import fulltext as FT

    df = spark.createDataFrame(html_docs, schema="doc_id string, html string")
    chunks = extract_spans(html_extract_span_corpus(df), mode="fused").where(
        "kind = 'text'"
    )
    # numeric chunk ids (the fulltext surface keys on long doc ids, like
    # the reference's chunk table): doc_id * 1000 + chunk order
    chunk_docs = chunks.select(
        (F.col("doc_id").cast("long") * 1000 + F.col("order")).alias("doc_id"),
        "text",
    )
    # corpus terms exist in extracted prose; 'pricing' exists ONLY in the
    # stripped nav chrome so it must have zero hits
    hits = FT.bm25_topk_multi(
        chunk_docs, queries={0: ("table", "scan"), 1: ("pricing",)}
    ).collect()
    q0 = [r for r in hits if r["q_id"] == 0]
    assert q0 and all(r["score_e9"] > 0 for r in q0)
    assert [r["rank"] for r in sorted(q0, key=lambda r: r["rank"])] == list(
        range(1, len(q0) + 1)
    )
    assert not [r for r in hits if r["q_id"] == 1]


def test_corpus_block_dedup_semantics(spark):
    """Corpus-level block dedup (CCNet paragraph dedup): a block recurring
    in >= MIN_DOCS DISTINCT docs is dropped in every doc; a block repeated
    only WITHIN one doc has nd=1 and survives. The content hash is the
    documented hash-of-block-hashes in span order."""
    import hashlib

    from pdf_extraction_and_query_spark.operators.htmlextract import (
        corpus_block_dedup,
    )

    shared = "subscribe to our newsletter for updates"
    pages = spark.createDataFrame(
        [
            ("a", f"<p>{shared}</p><p>unique alpha prose</p>"),
            ("b", f"<p>{shared}</p><p>unique beta prose</p>"),
            ("c", "<p>solo repeated</p><p>solo repeated</p>"),
        ],
        schema="doc_id string, html string",
    )
    got = {r["doc_id"]: r for r in corpus_block_dedup(pages).collect()}

    def h(*texts):
        inner = "".join(hashlib.md5(t.encode()).hexdigest() for t in texts)
        return hashlib.md5(inner.encode()).hexdigest()

    a = got["a"]
    assert (a["n_blocks"], a["n_dropped"]) == (2, 1)
    assert a["n_chars_kept"] == len("unique alpha prose")
    assert a["content_hash"] == h("unique alpha prose")
    # within-doc repetition is NOT corpus boilerplate
    c = got["c"]
    assert (c["n_blocks"], c["n_dropped"]) == (2, 0)
    assert c["n_chars_kept"] == 2 * len("solo repeated")
    assert c["content_hash"] == h("solo repeated", "solo repeated")


def test_corpus_block_dedup_matches_text_equality_twin(spark, html_docs):
    """The shipped operator reduces blocks to md5s before any exchange; this
    twin recomputes the whole thing from RAW TEXT equality in pandas on the
    fixture corpus — identical results prove the hash form changes nothing."""
    import hashlib
    from collections import defaultdict

    from pdf_extraction_and_query_spark import contract as C2
    from pdf_extraction_and_query_spark.operators.htmlextract import (
        corpus_block_dedup,
        html_extract,
    )

    df = spark.createDataFrame(html_docs, schema="doc_id string, html string")
    got = {r["doc_id"]: r for r in corpus_block_dedup(df).collect()}

    spans = [
        r
        for r in html_extract(df).collect()
        if r["kind"] == "text"
    ]
    docs_per_text = defaultdict(set)
    for r in spans:
        docs_per_text[r["text"]].add(r["doc_id"])
    per_doc = defaultdict(list)
    for r in spans:
        per_doc[r["doc_id"]].append(r)
    assert set(got) == set(per_doc)
    for d, rows in per_doc.items():
        rows.sort(key=lambda r: r["span_order"])
        kept = [
            r["text"]
            for r in rows
            if len(docs_per_text[r["text"]]) < C2.HTML_BLOCKDUP_MIN_DOCS
        ]
        dropped = len(rows) - len(kept)
        inner = "".join(hashlib.md5(t.encode()).hexdigest() for t in kept)
        assert got[d]["n_blocks"] == len(rows)
        assert got[d]["n_dropped"] == dropped
        assert got[d]["n_chars_kept"] == sum(len(t) for t in kept)
        assert got[d]["content_hash"] == hashlib.md5(inner.encode()).hexdigest()
    # the rule must be load-bearing on the fixture: some block recurs
    assert any(len(v) >= C2.HTML_BLOCKDUP_MIN_DOCS for v in docs_per_text.values())
