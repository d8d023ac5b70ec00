"""C4 phrase-blocklist filter (operators/blocklist.py): flag parity vs
the DuckDB twin, boundary semantics (substring non-matches, punctuation
variants, multi-word phrases, case), per-phrase report, and the
codegen-only plan shape."""

import duckdb
import pandas as pd
import pytest

import pyspark.sql.functions as F

from ocr_documents_spark.operators import blocklist as BL

PHRASES = ["badword", "Evil-Phrase", "two words"]

FIXTURES = [
    (1, "a clean document about classical music"),
    (2, "contains badword in the middle"),
    (3, "notbadword is a longer token"),          # substring: NOT blocked
    (4, "ends with badword"),
    (5, "BADWORD! shouted, with punctuation"),    # case+punct variants
    (6, "evil phrase spelled differently"),       # normalization unifies
    (7, "two  words with doubled spacing"),
    (8, "two words"),                             # whole text = phrase
    (9, "word two then words apart"),             # split pair: NOT blocked
    (10, None),
    (11, ""),
    (12, "badworder suffix does not count"),
]
EXPECT = {1: False, 2: True, 3: False, 4: True, 5: True, 6: True,
          7: True, 8: True, 9: False, 10: False, 11: False, 12: False}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(FIXTURES, "doc_id long, text string")


def test_flags_and_duckdb_parity(docs):
    got = {r["doc_id"]: r["blocked"]
           for r in BL.flag_blocklisted(docs, PHRASES).collect()}
    assert got == EXPECT
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(FIXTURES, columns=["doc_id", "text"]))
    want = {r[0]: r[1] for r in con.execute(
        BL.duckdb_blocklist_sql("docs", PHRASES)).fetchall()}
    assert got == want


def test_drop_keeps_survivors_and_columns(docs):
    kept = BL.drop_blocklisted(docs, PHRASES)
    assert kept.columns == ["doc_id", "text"]
    assert sorted(r["doc_id"] for r in kept.collect()) \
        == sorted(i for i, b in EXPECT.items() if not b)


def test_report_counts(docs):
    rep = {r["phrase"]: r["n_docs"]
           for r in BL.blocklist_report(docs, PHRASES).collect()}
    assert rep == {"badword": 3, "evil phrase": 1, "two words": 2}


def test_phrase_validation():
    with pytest.raises(ValueError):
        BL.blocklist_pattern(["ok", "!!!"])


def test_plan_is_codegen_only(docs):
    flagged = BL.flag_blocklisted(docs, PHRASES)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_large_list_and_determinism(docs):
    many = PHRASES + [f"filler{i}" for i in range(500)]
    a = {r["doc_id"]: r["blocked"]
         for r in BL.flag_blocklisted(docs, many).collect()}
    assert a == EXPECT   # fillers match nothing; order/dedup stable
    assert BL.blocklist_pattern(["b", "a", "B!"]) == " (a|b) "
