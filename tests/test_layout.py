"""XY-cut layout parse (extractors/layout.py, operators/layout.py).

Strong invariant: the synthesized header + two-staggered-columns page is
restored to exact reading order by XY-cut, while the flat (y, x) sort —
which is the correct ordering for single-column scans (O2) — interleaves
the columns and fails.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_documents_spark.extractors.layout import (
    MIN_GAP, largest_gap, naive_order, reading_order_words,
    synthesize_token_boxes, xy_cut_order)


def test_largest_gap_basics():
    assert largest_gap([(0, 10), (40, 50), (12, 20)]) == (20.0, 30.0)
    assert largest_gap([(0, 10), (5, 20)]) is None          # overlap merges
    assert largest_gap([(0, 10)]) is None


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=120),
       st.integers(min_value=0, max_value=100_000))
def test_xycut_restores_reading_order(n_words, doc_id):
    words = [f"w{i}" for i in range(n_words)]
    boxes = synthesize_token_boxes(doc_id, words)
    assert reading_order_words(boxes) == words
    # order-independence: geometry, not input order, decides
    assert reading_order_words(list(reversed(boxes))) == words


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=12, max_value=120),
       st.integers(min_value=0, max_value=100_000))
def test_flat_sort_interleaves_two_columns(n_words, doc_id):
    # enough words that both columns are populated with >= 2 rows
    words = [f"w{i}" for i in range(n_words)]
    boxes = synthesize_token_boxes(doc_id, words)
    geom = [(b[0], b[1], b[2], b[3]) for b in boxes]
    flat = [boxes[i][4] for i in naive_order(geom)]
    assert flat != words


def test_single_column_degenerates_to_y_sort():
    # one column, tight line spacing: a leaf region, ordered by (y, x)
    boxes = [(0.0, 30.0, 50.0, 40.0, "c"), (0.0, 0.0, 50.0, 10.0, "a"),
             (0.0, 15.0, 50.0, 25.0, "b")]
    assert reading_order_words(boxes) == ["a", "b", "c"]
    geom = [b[:4] for b in boxes]
    assert xy_cut_order(geom) == naive_order(geom)


def test_wide_line_gap_cuts_horizontally_first():
    # two paragraphs separated by > MIN_GAP: horizontal cut, top first
    top = (0.0, 0.0, 100.0, 10.0, "top")
    bottom = (0.0, 10.0 + MIN_GAP + 1, 100.0, 30.0 + MIN_GAP, "bottom")
    assert reading_order_words([bottom, top]) == ["top", "bottom"]


def test_trivial_inputs():
    assert xy_cut_order([]) == []
    assert xy_cut_order([(0, 0, 1, 1)]) == [0]


@pytest.mark.usefixtures("spark")
def test_q41_spark_matches_pure_and_stays_shuffle_free(spark):
    from ocr_documents_spark.plans.inspect import exchange_count
    from ocr_documents_spark.queries import q41_layout_reading_order
    df = q41_layout_reading_order(spark, "/root/testdata/sf0.001")
    # exactly the one narrow repartition that stops Project-collapse from
    # re-inlining split(text) into the per-element scatter lambda
    assert exchange_count(df) == 1
    import duckdb
    src = dict(duckdb.sql(
        "SELECT doc_id, text FROM "
        "'/root/testdata/sf0.001/documents.parquet'").fetchall())
    got: dict[int, list] = {}
    for r in df.collect():
        got.setdefault(r["doc_id"], []).append((r["pos"], r["word"]))
    assert set(got) == set(src)
    for doc_id in list(src)[:50]:
        seq = [w for _, w in sorted(got[doc_id])]
        assert seq == src[doc_id].split()
