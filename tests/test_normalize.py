"""Unicode normalization (operators/normalize.py): byte parity vs
DuckDB's native nfc_normalize on adversarial fixtures and hypothesis
unicode, idempotence, hash-unification effect, and the audit report.

All non-ASCII is spelled as \\uXXXX escapes so the fixture bytes are
unambiguous in review."""

import re
import unicodedata

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from ocr_documents_spark.operators import normalize as N

FIXTURES = [
    (1, "café menu"),             # decomposed e + combining acute
    (2, "café menu"),              # precomposed e-acute
    (3, "a̖b x̧̊y"),     # stacked combining marks
    (4, "각 hangul"),   # jamo -> one syllable under NFC
    (5, "non breaking"),           # NBSP survives NFC
    (6, "ctrl\x00\x01\x1fhere\x7f end\ttab\nline"),
    (7, "ligature ﬁne"),           # NFC keeps fi-ligature (NFKC folds)
    (8, ""),
    (9, None),
    (10, "Å angstrom vs Å"),  # NFC maps U+212B -> U+00C5
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(FIXTURES, "doc_id long, text string")


def test_byte_parity_with_duckdb(docs):
    got = {r["doc_id"]: r["text"]
           for r in N.normalize_docs(docs).collect()}
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(FIXTURES, columns=["doc_id", "text"]))
    want = {r[0]: r[1] for r in con.execute(
        N.duckdb_normalize_sql("docs")).fetchall()}
    assert got == want
    # spot semantics: decomposed == composed after the pass
    assert got[1] == got[2] == "café menu"
    assert got[4] == "각 hangul"
    assert got[5] == "non breaking"
    assert got[6] == "ctrlhere end\ttab\nline"    # \t \n kept
    assert got[7] == "ligature ﬁne"
    assert got[9] is None
    assert got[10] == "Å angstrom vs Å"


def test_idempotent_and_unifies_hashes(docs):
    once = N.normalize_docs(docs)
    twice = N.normalize_docs(once)
    assert ({r["doc_id"]: r["text"] for r in once.collect()}
            == {r["doc_id"]: r["text"] for r in twice.collect()})
    # the dedup rationale: rows 1 and 2 now share an exact-dup hash
    hashes = {r["doc_id"]: r["h"] for r in once.withColumn(
        "h", F.md5("text")).collect()}
    assert hashes[1] == hashes[2]
    raw = {r["doc_id"]: r["h"] for r in docs.withColumn(
        "h", F.md5("text")).collect()}
    assert raw[1] != raw[2]


def test_report(docs):
    rep = N.normalize_report(docs).first()
    assert rep["n_docs"] == 10
    assert rep["n_with_control_chars"] == 1          # doc 6
    # doc 3's marks have no precomposed forms and are already in
    # canonical ccc order, so NFC leaves it alone
    assert rep["n_non_nfc_only"] == 3                # docs 1, 4, 10
    assert rep["n_changed"] == 4                     # 1, 4, 6, 10


def test_plan_shape(docs):
    from ocr_documents_spark.functions.fanout import cpu_parts
    # a WELL-SPLIT input (the lake-scale case): the conditional fan_out
    # must no-op — scrub is codegen, NFC is the only python stage, no
    # exchange at all.  (Under-split inputs gain one fan-out exchange —
    # pinned in tests/test_fanout.py.)
    spread = docs.repartition(cpu_parts(docs)).localCheckpoint()
    plan = (N.normalize_docs(spread)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


HYPO_ALPHABET = ("abcZ9 \t\n" "é" "é̖̀̊"
                 "각" "ÅÅﬁ"
                 "\x00\x1f\x7f")


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.sampled_from(HYPO_ALPHABET), max_size=40))
def test_hypothesis_parity_pure(text):
    # pure-python twin of the spark path vs duckdb, no session needed
    scrubbed = re.sub(N.CONTROL_CHAR_RE, "", text)
    py = unicodedata.normalize("NFC", scrubbed)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"doc_id": [1], "text": [text]}))
    dk = con.execute(N.duckdb_normalize_sql("t")).fetchall()[0][1]
    assert py == dk
