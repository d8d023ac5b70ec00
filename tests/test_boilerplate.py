"""HTML boilerplate strip / DOM heuristics (extractors/boilerplate.py).

The strong invariant: a page synthesized from clean text round-trips to
exactly that text, while every piece of chrome (nav, adverts, sidebar,
comments, scripts, styles, HTML comments, footer) is dropped.  Fixture
html spans add the line-preserving variant the extraction pipeline uses.
"""

from __future__ import annotations

import html as _htmllib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_documents_spark.extractors.boilerplate import (
    CHUNK_WORDS, MIN_TAIL_WORDS, chunk_paragraphs, classify_blocks,
    expected_content_blocks, extract_main_content, html_to_page_text,
    page_title, segment_blocks, synthesize_page)

_WORDS = st.lists(st.sampled_from(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango".split()),
    min_size=1, max_size=120)


@settings(max_examples=150, deadline=None)
@given(_WORDS, st.integers(min_value=0, max_value=10_000))
def test_synthesized_page_roundtrips(words, doc_id):
    text = " ".join(words)
    r = extract_main_content(synthesize_page(doc_id, text))
    assert r["main_text"] == text
    assert r["n_content_blocks"] == expected_content_blocks(len(words))
    assert r["title"] == f"Document {doc_id} — Example Site"
    assert r["n_boilerplate_blocks"] > 0          # chrome was present
    assert 0.0 < r["boilerplate_ratio"] < 1.0


@settings(max_examples=150, deadline=None)
@given(_WORDS)
def test_chunk_arithmetic_matches_helper(words):
    chunks = chunk_paragraphs(list(words))
    assert len(chunks) == expected_content_blocks(len(words))
    assert [w for c in chunks for w in c] == words           # lossless
    if len(chunks) > 1:
        assert all(len(c) >= MIN_TAIL_WORDS for c in chunks)
    assert all(len(c) <= CHUNK_WORDS + MIN_TAIL_WORDS - 1 for c in chunks)


def test_chrome_only_page_yields_nothing():
    html = ('<html><body><nav><a href="/">Home</a> <a href="/x">X</a></nav>'
            '<div class="footer">about press contact jobs terms</div>'
            "</body></html>")
    r = extract_main_content(html)
    assert r["main_text"] == ""
    assert r["n_content_blocks"] == 0
    assert r["boilerplate_ratio"] == 1.0


def test_link_density_marks_boilerplate():
    # long block, but almost all characters live inside <a> -> navigation
    links = "".join(f'<a href="/{i}">section number {i} of the site</a> '
                    for i in range(8))
    html = f"<body><div>{links}</div><p>{'word ' * 30}</p></body>"
    r = extract_main_content(html)
    assert r["main_text"] == ("word " * 30).strip()


def test_context_smoothing_adopts_short_neighbors():
    long1 = "one two three four five six seven eight nine ten"
    html = (f"<body><p>{long1}</p><p>short line</p><p>{long1}</p>"
            "</body>")
    blocks = segment_blocks(html)
    assert [b.text for b in blocks] == [long1, "short line", long1]
    assert classify_blocks(blocks) == [True, True, True]


def test_isolated_short_blocks_are_boilerplate():
    html = "<body><p>tiny</p><p>bits</p></body>"
    assert extract_main_content(html)["main_text"] == ""


def test_positive_container_keeps_short_lines():
    html = ('<body><article><p>Name: Jo</p><p>ID: 7</p></article>'
            '<div class="promo"><p>Buy now</p></div></body>')
    assert extract_main_content(html)["main_text"] == "Name: Jo ID: 7"


def test_negative_hint_beats_positive_container():
    html = ('<article><p>real content line with enough words to stand '
            'alone here</p><div class="ad-banner"><p>buy buy buy buy buy '
            "buy buy buy buy</p></div></article>")
    r = extract_main_content(html)
    assert "buy" not in r["main_text"]
    assert r["main_text"].startswith("real content")


def test_script_style_comments_never_leak():
    html = ("<body><script>var hidden = 'leak';</script>"
            "<style>.x { content: 'leak'; }</style><!-- leak -->"
            "<p>visible words one two three four five six seven</p></body>")
    r = extract_main_content(html)
    assert "leak" not in r["main_text"]
    assert r["main_text"].startswith("visible words")


def test_entities_and_mrz_chevrons_roundtrip():
    mrz = "P<INDMEKALA<<CHURCHIL<SUNDAR<<<<<<<<<<<<<<<<"
    lines = [mrz, "A & B < C > D \"quoted\""]
    html = ("<article>" + "".join(
        "<p>" + _htmllib.escape(line) + "</p>" for line in lines)
        + "</article>")
    assert html_to_page_text(html) == "\n".join(lines)


def test_unmatched_close_tags_degrade_gracefully():
    html = ("</div></article><body><p>stable content words one two three "
            "four five six seven</p></span></body>")
    r = extract_main_content(html)
    assert r["main_text"].startswith("stable content")


def test_page_title_extraction():
    assert page_title("<title> A &amp;  B </title>") == "A & B"
    assert page_title("<body><p>x</p></body>") is None


_SOUP_TOKENS = st.sampled_from([
    "<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>", "<span>",
    "</span>", "<nav>", "</nav>", "<article>", "</article>", "<br>",
    "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
    "<p", ">", "<", "&amp;", "&bogus;", "&#65;", "words here",
    "secretpayload", "\n", "  ", '<div class="ad">', "</table>",
    "<TITLE>", "</TITLE>", "<![CDATA[", "]]>",
])


@settings(max_examples=300, deadline=None)
@given(st.lists(_SOUP_TOKENS, max_size=40))
def test_tag_soup_never_crashes_or_leaks_script(tokens):
    """Adversarial tag soup: arbitrary interleavings of tags, malformed
    fragments, entities, and raw-text regions must never raise, and text
    opened inside a <script>/<style> that is properly CLOSED must never
    reach main_text."""
    html = "".join(tokens)
    r = extract_main_content(html)        # must not raise
    assert isinstance(r["main_text"], str)
    assert 0.0 <= r["boilerplate_ratio"] <= 1.0
    assert r["n_content_blocks"] + r["n_boilerplate_blocks"] == r["n_blocks"]
    if "<script>" in html and "</script>" in html:
        start = html.index("<script>") + len("<script>")
        end = html.find("</script>", start)
        if end > start:
            inner = html[start:end]
            if "secretpayload" in inner and "secretpayload" not in (
                    html[:start] + html[end:]):
                assert "secretpayload" not in r["main_text"]


def test_fixture_html_span_recovers_chunk_lines():
    from ocr_documents_spark.fixtures.gen import _html_span
    import random
    lines = ["INVOICE NO: INV-2024-001", "Total:  1,250.00 AED",
             "P<INDX<<Y<<<<"]
    span = _html_span("d1", 0, lines, random.Random(7))
    assert span["kind"] == "html" and span["media_ref"] is None
    assert html_to_page_text(span["text"]) == "\n".join(
        " ".join(line.split()) for line in lines)
    # chrome really is in the page, and really is dropped
    assert "nav" in span["text"] and "footer" in span["text"]


@pytest.mark.usefixtures("spark")
def test_q40_spark_matches_pure_and_stays_shuffle_free(spark):
    from ocr_documents_spark.plans.inspect import exchange_count
    from ocr_documents_spark.queries import q40_main_content
    df = q40_main_content(spark, "/root/testdata/sf0.001")
    # scan -> Arrow stages -> project.  The only exchange permitted is
    # the CONDITIONAL input fan-out (r6: the one-file test corpus is an
    # under-split scan; at lake split counts fan_out no-ops and the
    # plan is exchange-free — tests/test_fanout.py pins the contract).
    # No aggregation/join shuffle may ever appear here.
    n_ex = exchange_count(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert n_ex <= 1
    if n_ex == 1:
        assert "REPARTITION_BY_NUM" in plan
    rows = {r["doc_id"]: r for r in df.collect()}
    import duckdb
    src = duckdb.sql("SELECT doc_id, text FROM "
                     "'/root/testdata/sf0.001/documents.parquet'").fetchall()
    assert len(rows) == len(src)
    for doc_id, text in src[:50]:
        got = rows[doc_id]
        pure = extract_main_content(synthesize_page(doc_id, text))
        assert got["main_text"] == pure["main_text"] == " ".join(text.split())
        assert got["n_blocks"] == pure["n_blocks"]
        assert got["n_content_blocks"] == pure["n_content_blocks"]
