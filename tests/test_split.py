"""Leakage-safe splitting (operators/split.py): whole dedup groups land
on one side, the DuckDB twin agrees value-for-value, and the split is
deterministic + salt-rotatable."""

import duckdb

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import split as SP
from ocr_documents_spark.operators.dedup import dedup_groups

PARQ = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(PARQ).select("doc_id", "text")


@pytest.fixture(scope="module")
def groups(docs):
    return (dedup_groups(docs, threshold=0.5)
            .select("doc_id", "group_id").localCheckpoint())


def test_matches_twin_and_no_group_straddles(docs, groups):
    got = {r["doc_id"]: (r["group_id"], r["split"])
           for r in SP.leakage_safe_split(docs, groups,
                                          val_frac=0.1).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT doc_id, text FROM '{PARQ}'")
    con.execute("CREATE TABLE groups (doc_id BIGINT, group_id BIGINT)")
    con.executemany("INSERT INTO groups VALUES (?, ?)",
                    [(r["doc_id"], r["group_id"])
                     for r in groups.collect()])
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        SP.duckdb_leakage_safe_split_sql(val_frac=0.1)).fetchall()}
    assert got == want and len(got) == 500
    # the leakage property: every group is entirely on one side
    sides: dict[int, set] = {}
    for gid, split in got.values():
        sides.setdefault(gid, set()).add(split)
    assert all(len(s) == 1 for s in sides.values())
    # val fraction is Bernoulli-close to the target over ~500 groups
    n_val = sum(1 for _, s in got.values() if s == "val")
    assert 0.04 * len(got) <= n_val <= 0.18 * len(got), n_val


def test_neardup_pair_never_straddles(spark):
    """The failure mode this operator exists for: a doc and its
    near-duplicate always share a side, across salts."""
    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the long river valley every single morning")
    rows = [(i, base.replace("morning", f"morning{i % 7}"))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = dedup_groups(df, threshold=0.5).select("doc_id", "group_id")
    for salt in ("", "resplit2"):
        out = SP.leakage_safe_split(df, g, val_frac=0.3,
                                    salt=salt).collect()
        by_group: dict[int, set] = {}
        for r in out:
            by_group.setdefault(r["group_id"], set()).add(r["split"])
        assert all(len(s) == 1 for s in by_group.values())


def test_groupless_docs_route_by_own_id_and_salt_rotates(docs):
    a = {r["doc_id"]: r["split"]
         for r in SP.leakage_safe_split(docs, None,
                                        val_frac=0.2).collect()}
    b = {r["doc_id"]: r["split"]
         for r in SP.leakage_safe_split(docs, None, val_frac=0.2,
                                        salt="epoch2").collect()}
    assert a != b                 # rotation changes the draw
    again = {r["doc_id"]: r["split"]
             for r in SP.leakage_safe_split(docs, None,
                                            val_frac=0.2).collect()}
    assert a == again             # determinism
    rep = {r["split"]: r["n_docs"] for r in SP.split_report(
        SP.leakage_safe_split(docs, None, val_frac=0.2)).collect()}
    assert rep["train"] + rep["val"] == 500
