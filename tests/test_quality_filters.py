"""Gopher/C4 corpus-quality filters (operators/quality_filters.py):
exact DuckDB oracles for the repetition metrics and the C4 line clean,
hand-computed expectations for the per-row Gopher metrics, and the
end-to-end keep decision on engineered junk."""

import duckdb
import pandas as pd
import pytest

from ocr_documents_spark.operators import quality_filters as QF

DOCS = [
    # 0: clean multi-line prose
    (0, "the quick brown fox jumps over the lazy dog today.\n"
        "a second sentence with plenty of ordinary words here.\n"
        "and a third line to round out the paragraph nicely."),
    # 1: heavy line repetition (3 of 4 lines identical)
    (1, "buy cheap widgets now call us.\n"
        "buy cheap widgets now call us.\n"
        "buy cheap widgets now call us.\n"
        "one distinct line appears here."),
    # 2: dominant repeated 2-gram
    (2, "click here click here click here click here click here done"),
    # 3: bullets and a dangling ellipsis line
    (3, "- first bullet item\n- second bullet item\n"
        "- third bullet item\nread more..."),
    # 4: no terminal punctuation anywhere (C4 drops every line)
    (4, "header fragment\nnav menu item\nfooter text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return con


def test_line_repetition_vs_oracle(docs, duck):
    got = {r["doc_id"]: (r["n_lines"], r["dup_line_frac"],
                         r["dup_line_char_frac"])
           for r in QF.line_repetition_metrics(docs).collect()}
    want = {r[0]: (r[1], r[2], r[3]) for r in duck.execute(
        QF.duckdb_line_repetition_sql()).fetchall()}
    assert got == want
    assert got[1][1] == 0.5  # 2 of 4 line occurrences are repeats


def test_top_ngram_char_fraction_vs_oracle(docs, duck):
    got = {r["doc_id"]: (r["top_ngram"], r["top_ngram_char_frac"])
           for r in QF.top_ngram_char_fraction(docs, 2).collect()}
    want = {r[0]: (r[1], r[2]) for r in duck.execute(
        QF.duckdb_top_ngram_sql(2)).fetchall()}
    assert got == want
    assert got[2][0] in ("click here", "here click")
    assert got[2][1] > 0.7  # the spam doc is dominated by one 2-gram


def test_c4_line_filter_vs_oracle(docs, duck):
    got = {r["doc_id"]: (r["clean_text"], r["n_kept_lines"],
                         r["n_dropped_lines"])
           for r in QF.c4_line_filter(docs).collect()}
    want = {r[0]: (r[1] or "", r[2], r[3]) for r in duck.execute(
        QF.duckdb_c4_line_filter_sql()).fetchall()}
    assert got == want
    assert got[4] == ("", 0, 3)          # no line survives
    assert got[0][1] == 3 and got[0][2] == 0


def test_gopher_metrics_hand_values(docs):
    m = {r["doc_id"]: r.asDict()
         for r in QF.gopher_quality_metrics(docs).collect()}
    d3 = m[3]
    assert d3["bullet_line_frac"] == 0.75      # 3 of 4 lines
    assert d3["ellipsis_line_frac"] == 0.25    # 1 of 4 lines
    assert d3["symbol_word_ratio"] == round(1 / d3["n_words"], 6)
    d0 = m[0]
    assert d0["n_words"] == 29
    assert d0["alpha_word_frac"] == 1.0
    assert d0["symbol_word_ratio"] == 0.0


def test_quality_filter_report_keep_decisions(spark):
    """Engineered pass/fail corpus: a long clean doc passes every rule;
    the others each trip exactly the rule they were built to trip."""
    clean_lines = [
        "morning fog settled across the quiet harbor basin before dawn.",
        "seven engineers reviewed an updated compaction design yesterday.",
        "fresh bread needs patience and a lively sourdough starter.",
        "the observatory logged seventeen meteor events last night.",
        "crimson foxes darted over a frozen ridge at first light.",
        "careful benchmarks separate real wins from measurement noise.",
        "her garden produced tomatoes beyond every reasonable forecast.",
        "distant thunder rolled while children finished their game.",
    ]
    docs = spark.createDataFrame(
        [(10, "\n".join(clean_lines)),
         (11, "\n".join(["identical spam line repeated here."] * 10)),
         (12, "tiny doc."),
         (13, " ".join(["spam gram"] * 40) + ".")],
        "doc_id long, text string")
    rep = {r["doc_id"]: r.asDict()
           for r in QF.quality_filter_report(docs).collect()}
    assert rep[10]["keep"] is True
    assert rep[11]["keep"] is False and rep[11]["ok_dup_lines"] is False
    assert rep[12]["keep"] is False and rep[12]["ok_word_count"] is False
    assert rep[13]["keep"] is False and rep[13]["ok_top_2gram"] is False


def test_empty_and_whitespace_docs_fail_closed_not_crash(spark):
    """Review finding: under Spark 4's default ANSI mode the metric
    divisions threw DIVIDE_BY_ZERO for empty/whitespace-only docs.  They
    must instead yield NULL metrics and fail closed in the report."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\n\n"),
         (4, "one normal sentence that still fails the word-count rule.")],
        "doc_id long, text string")
    rep = {r["doc_id"]: r.asDict()
           for r in QF.quality_filter_report(docs).collect()}
    assert set(rep) == {1, 2, 3, 4}
    for d in (1, 2, 3):
        assert rep[d]["keep"] is False
        assert rep[d]["ok_mean_word_len"] is False  # NULL -> fail closed
