"""PII scrubbing (operators/pii.py): adversarial fixtures through both
engines (Java regex vs RE2 must substitute identically), census
consistency, and redaction completeness."""

import duckdb
import pandas as pd
import pytest

import pyspark.sql.functions as F

from ocr_documents_spark.operators import pii as P

DOCS = [
    (0, "contact jane.doe+spam@example.co.uk or call +1 (555) 123-4567"),
    (1, "server at 192.168.001.42 responded; backup 10.0.0.1 did not"),
    (2, "card 4111111111111111 leaked next to id 987654321 yesterday"),
    (3, "email-ish a@b.c and tiny digits 12345678 stay partly intact"),
    (4, "nothing sensitive in this perfectly ordinary sentence"),
    (5, "mixed: root@10.2.3.4 mail bob@host.org phone 044-555-1234"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_redaction_matches_duckdb(docs):
    got = {r["doc_id"]: r["clean_text"]
           for r in P.scrub_corpus(docs).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = {r[0]: r[1] for r in con.execute(P.duckdb_scrub_sql()).fetchall()}
    assert got == want


def test_redaction_masks_everything_sensitive(docs):
    got = {r["doc_id"]: r["clean_text"]
           for r in P.scrub_corpus(docs).collect()}
    assert "<EMAIL>" in got[0] and "<PHONE>" in got[0]
    assert "jane" not in got[0] and "555" not in got[0]
    assert got[1].count("<IP>") == 2
    assert "<NUM>" in got[2] and "4111" not in got[2]
    assert got[4] == DOCS[4][1]          # untouched
    # doc 3: a@b.c fails the 2-letter TLD rule, 8 digits under the 9-run
    # floor — deliberate non-matches stay readable
    assert "12345678" in got[3]


def test_census_counts_match_substitutions(docs):
    census = {r["doc_id"]: r.asDict() for r in P.pii_census(docs).collect()}
    clean = {r["doc_id"]: r["clean_text"]
             for r in P.scrub_corpus(docs).collect()}
    for i, (_, text) in enumerate(DOCS):
        c = census[i]
        total = sum(c[f"n_{name}"] for name, _, _ in P.PII_RULES)
        masks = sum(clean[i].count(tok)
                    for tok in ("<EMAIL>", "<IP>", "<PHONE>", "<NUM>"))
        assert total == masks, (i, c, clean[i])
        assert c["has_pii"] == (total > 0)
    assert census[5]["n_email"] == 2 or (
        census[5]["n_email"] == 1 and census[5]["n_ip"] >= 1)


def test_null_text_counts_zero_not_null(spark):
    """Review finding: NULL text produced NULL counts/has_pii, so a
    boolean filter dropped those docs from BOTH buckets."""
    docs = spark.createDataFrame(
        [(1, None), (2, "mail bob@host.org")], "doc_id long, text string")
    rep = {r["doc_id"]: r.asDict() for r in P.pii_census(docs).collect()}
    assert rep[1]["n_email"] == 0 and rep[1]["has_pii"] is False
    assert rep[2]["has_pii"] is True
    both = docs.join(P.pii_census(docs), "doc_id")
    assert both.filter(~F.col("has_pii")).count() \
        + both.filter(F.col("has_pii")).count() == 2
