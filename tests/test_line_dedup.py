"""Repeated-line boilerplate removal (operators/line_dedup.py) against
the exact DuckDB twin on an engineered corpus: boilerplate appended to
a third of the docs must vanish everywhere, short nav stubs stay."""

import duckdb

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import line_dedup as LD

PARQ = "/root/testdata/sf0.001/documents.parquet"
BOILER = "subscribe to our newsletter for weekly updates"
LEGAL = "copyright example corp all rights reserved"
STUB = "Home"   # < MIN_CHARS after trim -> never eligible

ENG_SQL = f"""
    SELECT doc_id,
           CASE
             WHEN doc_id % 3 = 0 THEN
               '{BOILER}' || chr(10) || text || chr(10) || '{LEGAL}'
             WHEN doc_id % 3 = 1 THEN
               '{STUB}' || chr(10) || text
             ELSE text
           END AS text
    FROM '{PARQ}'
"""


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(PARQ).select("doc_id", "text")
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(BOILER + "\n"), F.col("text"),
                        F.lit("\n" + LEGAL)))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit(STUB + "\n"), F.col("text")))
        .otherwise(F.col("text")))


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS {ENG_SQL}")
    return c


def test_matches_twin_and_strips_boilerplate(docs, con):
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_dropped"])
           for r in LD.remove_common_lines(docs).collect()}
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        LD.duckdb_remove_common_lines_sql()).fetchall()}
    assert got == want and len(got) == 500
    originals = {r["doc_id"]: r["text"] for r in
                 docs.sparkSession.read.parquet(PARQ)
                 .select("doc_id", "text").collect()}
    for d, (clean, n_lines, n_dropped) in got.items():
        assert BOILER not in clean and LEGAL not in clean
        if d % 3 == 0:
            # both appended boilerplate lines removed, body intact
            assert n_dropped == 2 and clean == originals[d]
        elif d % 3 == 1:
            # the short stub is ineligible and survives
            assert clean.startswith(STUB + "\n")
            assert n_dropped == 0
        else:
            assert clean == originals[d] and n_dropped == 0


def test_census_reports_boilerplate(docs):
    rows = {r["sample_line"]: (r["n_docs"], r["n_occurrences"])
            for r in LD.line_census(docs).collect()}
    n_hit = sum(1 for d in range(500) if d % 3 == 0)
    assert rows[BOILER] == (n_hit, n_hit)
    assert rows[LEGAL] == (n_hit, n_hit)
    assert STUB not in rows


def test_wholly_boilerplate_doc_survives_empty(spark):
    rows = ([(i, "repeated promo line everywhere") for i in range(6)]
            + [(6, "unique closing essay line")])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_dropped"])
           for r in LD.remove_common_lines(df).collect()}
    for i in range(6):
        assert got[i] == ("", 1)
    assert got[6] == ("unique closing essay line", 0)


def test_plan_shuffles_fingerprints_never_lines(docs):
    plan = (LD.remove_common_lines(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "line#" not in ln, ln
