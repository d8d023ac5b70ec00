"""Sequence packing (operators/packing.py): tiling invariants on the
driver corpus + the exact DuckDB manifest twin + plan shape (no token
materialization, no single-partition work)."""

import duckdb
import pytest

from ocr_documents_spark.operators import packing as PK

SF_DIR = "/root/testdata/sf0.001"
L = 128


@pytest.fixture(scope="module")
def manifest(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return PK.pack_sequences(docs.select("doc_id", "text"), L).collect()


def test_matches_duckdb_manifest(manifest):
    got = sorted((r["seq_id"], r["doc_id"], r["doc_start"], r["seq_start"],
                  r["n_tok"]) for r in manifest)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT doc_id, text FROM "
                f"'{SF_DIR}/documents.parquet'")
    want = sorted(tuple(r) for r in
                  con.execute(PK.duckdb_pack_sql(L)).fetchall())
    assert got == want and len(got) > 0


def test_sequences_tile_exactly(manifest):
    """Every sequence except the last is exactly L tokens, tiled without
    gap or overlap; slices inside a sequence are contiguous."""
    seqs = {}
    for r in manifest:
        seqs.setdefault(r["seq_id"], []).append((r["seq_start"], r["n_tok"]))
    last = max(seqs)
    assert set(seqs) == set(range(last + 1))   # no missing sequence ids
    for sid, sl in seqs.items():
        sl.sort()
        pos = 0
        for start, n in sl:
            assert start == pos and n > 0
            pos += n
        assert pos == L or (sid == last and 0 < pos <= L)


def test_documents_fully_covered(spark, manifest):
    """Each doc's slices reassemble [0, n_tokens) in order — nothing
    dropped, nothing duplicated."""
    import pyspark.sql.functions as F
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ntok = {r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id",
                F.size(F.filter(F.split("text", r"\s+"),
                                lambda w: w != "")).alias("n")).collect()}
    per_doc = {}
    for r in manifest:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_start"], r["n_tok"]))
    assert set(per_doc) == {d for d, n in ntok.items() if n > 0}
    for d, sl in per_doc.items():
        sl.sort()
        pos = 0
        for start, n in sl:
            assert start == pos
            pos += n
        assert pos == ntok[d]


def test_plan_never_explodes_tokens(spark):
    """The only Generate (explode) ranges over a doc's touched-sequence
    ids — output rows ~ tokens/L + docs, never per-token."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = PK.pack_sequences(docs.select("doc_id", "text"), L)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1
    assert "sequence(" in plan        # the per-doc seq-id range
    n_docs = docs.count()
    total_tokens = sum(
        r["n"] for r in docs.selectExpr(
            r"size(filter(split(text, '\\s+'), w -> w != '')) as n").collect())
    assert df.count() <= total_tokens // L + 1 + n_docs