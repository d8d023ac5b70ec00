"""Corpus snapshot diff (operators/snapshot_diff.py): four-way
classification against the DuckDB twin, NULL-text vs absent-id
distinction, fingerprint-only shuffle."""

import duckdb

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import snapshot_diff as SD

PARQ = "/root/testdata/sf0.001/documents.parquet"

# new snapshot: drop ids % 7 == 0, edit ids % 5 == 0 (and not dropped),
# add 3 fresh ids, null out id 11's text
OLD_SQL = f"SELECT doc_id, text FROM '{PARQ}'"
NEW_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id = 11 THEN NULL
                WHEN doc_id % 5 = 0 THEN text || ' edited'
                ELSE text END AS text
    FROM '{PARQ}' WHERE doc_id % 7 <> 0
    UNION ALL
    SELECT 1000 + i, 'fresh document number ' || i
    FROM range(3) t(i)
"""


@pytest.fixture(scope="module")
def sides(spark):
    old = spark.read.parquet(PARQ).select("doc_id", "text")
    new = (old.filter(F.col("doc_id") % 7 != 0)
           .withColumn("text",
                       F.when(F.col("doc_id") == 11, None)
                       .when(F.col("doc_id") % 5 == 0,
                             F.concat("text", F.lit(" edited")))
                       .otherwise(F.col("text"))))
    fresh = old.sparkSession.createDataFrame(
        [(1000 + i, f"fresh document number {i}") for i in range(3)],
        "doc_id long, text string")
    return old, new.unionByName(fresh)


def test_matches_twin_and_classifies_all_cases(sides):
    old, new = sides
    got = {r["doc_id"]: r["status"]
           for r in SD.snapshot_diff(old, new).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW old_docs AS {OLD_SQL}")
    con.execute(f"CREATE VIEW new_docs AS {NEW_SQL}")
    want = {r[0]: r[1] for r in con.execute(
        SD.duckdb_snapshot_diff_sql()).fetchall()}
    assert got == want and len(got) == 503
    assert got[0] == "removed" and got[7] == "removed"
    assert got[10] == "changed"           # %5 edit (10 %7 != 0)
    assert got[11] == "changed"           # text became NULL, id present
    assert got[1000] == got[1002] == "added"
    assert got[1] == "unchanged"
    rep = {r["status"]: r["n_docs"] for r in
           SD.snapshot_diff_report(SD.snapshot_diff(old, new)).collect()}
    assert rep["added"] == 3
    assert rep["removed"] == sum(1 for d in range(500) if d % 7 == 0)
    assert sum(rep.values()) == 503


def test_diff_plan_shuffles_fingerprints_never_text(sides):
    old, new = sides
    plan = (SD.snapshot_diff(old, new)
            ._jdf.queryExecution().executedPlan().toString())
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "text#" not in ln, ln
