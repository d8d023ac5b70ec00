"""Exact duplicate-substring removal (operators/substring_dedup.py):
engineered corpora for the semantics (canonical-first, overlap merge,
within-doc repeats, full-doc wipe) and the exact DuckDB oracle on both
the engineered corpus and the driver's documents table."""

import duckdb
import pandas as pd
import pytest

from ocr_documents_spark.operators import substring_dedup as SD

K = 5

SHARED = "alpha bravo charlie delta echo"          # the duplicated 5-gram
LONG_RUN = "one two three four five six seven"     # 7-word duplicated run

DOCS = [
    (0, f"intro words here {SHARED} closing remarks now"),   # canonical
    (1, f"other opening text {SHARED} different tail words"),
    (2, f"{LONG_RUN} first home unique suffix body"),        # canonical run
    (3, f"prefix tokens {LONG_RUN} and an ending"),
    (4, f"{SHARED} {SHARED} pad pad pad"),  # within-doc repeat + cross-doc
    (5, "completely unrelated sentence with no repeats at all"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _clean(spark_docs, k=K):
    return {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_dropped"])
            for r in SD.remove_duplicate_spans(spark_docs, k).collect()}


def test_canonical_first_occurrence_survives(docs):
    got = _clean(docs)
    assert got[0][0] == DOCS[0][1]        # first occurrence untouched
    assert got[5][0] == DOCS[5][1]        # no-dup doc untouched
    assert SHARED not in got[1][0]        # later occurrence removed
    assert got[1] == ("other opening text different tail words", 6, 5)


def test_overlapping_run_merges_to_token_mass(docs):
    """A duplicated 7-word run holds 3 overlapping 5-gram starts; the
    island merge must drop exactly the 7 run tokens, not 15."""
    got = _clean(docs)
    assert got[3] == ("prefix tokens and an ending", 5, 7)
    assert LONG_RUN in got[2][0]          # canonical keeps the run


def test_within_doc_repeat_removed(docs):
    """doc 4 repeats the shared gram twice; both occurrences are
    non-canonical (doc 0 owns the gram), so both are dropped."""
    got = _clean(docs)
    assert got[4] == ("pad pad pad", 3, 10)


def test_vs_duckdb_oracle_engineered(docs):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SD.duckdb_remove_duplicate_spans_sql(K)).fetchall()}
    assert _clean(docs) == want


def test_vs_duckdb_oracle_driver_corpus(spark):
    """The real documents table at sf0.001 with a small k (the synthetic
    corpus repeats short phrases): Spark output == DuckDB twin row for
    row, including every rebuilt text."""
    sf_dir = "/root/testdata/sf0.001"
    sdocs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = _clean(sdocs.select("doc_id", "text"), k=4)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT doc_id, text FROM "
                f"'{sf_dir}/documents.parquet'")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SD.duckdb_remove_duplicate_spans_sql(4)).fetchall()}
    assert got == want
    assert len(got) > 0
    # the oracle must actually exercise removal on this corpus
    assert any(v[2] > 0 for v in got.values())


def test_no_window_over_corpus_tokens(spark, docs):
    """Scale shape: the only Window partitions by doc over the few
    duplicate spans; the token table itself is never windowed or sorted
    globally (no partition-less windowspec in the plan)."""
    plan = SD.remove_duplicate_spans(docs, K) \
        ._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            assert "doc_id" in line.split("windowspecdefinition(", 1)[1][:40]


def test_census_shuffles_fingerprint_not_raw_gram(docs):
    """Scale shape: every exchange in the census/join DAG keys on the
    fixed-width 15-hex md5 fingerprint (gram_fp), never the raw k-word
    gram string — at production k=20 the raw key would be ~20× corpus
    bytes of shuffle payload."""
    plan = SD.duplicate_spans(docs, K) \
        ._jdf.queryExecution().executedPlan().toString()
    ex = [ln for ln in plan.splitlines() if "hashpartitioning(" in ln]
    assert any("gram_fp#" in ln for ln in ex), plan
    for ln in ex:
        keys = ln.split("hashpartitioning(", 1)[1]
        assert "gram#" not in keys, ln


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_random_corpora_vs_oracle(spark, data):
    """Hypothesis: random small-vocab corpora (heavy accidental overlap,
    planted shared runs, within-doc repeats) — Spark output must equal
    the DuckDB twin exactly, rebuilt text included."""
    vocab = [f"w{i}" for i in range(12)]
    n_docs = data.draw(st.integers(2, 6))
    k = data.draw(st.sampled_from([3, 4]))
    texts = []
    for _ in range(n_docs):
        words = data.draw(st.lists(st.sampled_from(vocab),
                                   min_size=2, max_size=25))
        texts.append(" ".join(words))
    # plant a shared run into two docs at random offsets
    if n_docs >= 2:
        run = " ".join(data.draw(st.lists(st.sampled_from(vocab),
                                          min_size=k, max_size=2 * k)))
        texts[0] = texts[0] + " " + run
        texts[-1] = run + " " + texts[-1]
    rows = list(enumerate(texts))
    sdocs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_dropped"])
           for r in SD.remove_duplicate_spans(sdocs, k).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        SD.duckdb_remove_duplicate_spans_sql(k)).fetchall()}
    assert got == want


def test_duplicate_run_across_line_break(spark):
    """A duplicated passage must be caught whether a newline or a space
    separates its words in each copy; the rebuilt text normalizes
    whitespace to single spaces."""
    run = "alpha bravo charlie delta echo"
    rows = [(0, f"lead in words {run} trailing text"),
            (1, "other start\n" + run.replace(" ", "\n", 1)
             + " closing words here")]
    sdocs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _clean(sdocs, k=5)
    assert got[0][0] == rows[0][1]              # canonical untouched
    assert got[1] == ("other start closing words here", 5, 5)
