"""Semantic decontamination (operators/semantic_decontaminate.py):
engineered paraphrase-contaminated eval vectors must drop exactly the
right corpus rows, value-matched against the exact DuckDB twins in both
the broadcast and the cell-routed modes."""

import duckdb

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import semantic_decontaminate as SD
from ocr_documents_spark.operators.ivf import K_CELLS
from ocr_documents_spark.queries import (NEARDUP_N, NEARDUP_SCALE,
                                         NEARDUP_SHIFT)

SF_DIR = "/root/testdata/sf0.001"
PARQ = f"{SF_DIR}/embeddings.parquet"

CORPUS_SQL = f"SELECT vec_id, embedding FROM '{PARQ}'"
# the "paraphrased eval item" recipe: eval vectors are perturbed copies
# (cos ~0.9997) of corpus vec_id < NEARDUP_N — zero lexical overlap by
# construction (there is no text at all), exactly the leak the n-gram
# decontaminator cannot see.  The raw corpus' max off-diagonal cosine
# ~0.5 keeps every other row clean at the 0.95 threshold.
EVAL_SQL = f"""
    SELECT vec_id,
           list_transform(embedding,
                          v -> v * {NEARDUP_SCALE} + {NEARDUP_SHIFT})
               AS embedding
    FROM '{PARQ}' WHERE vec_id < {NEARDUP_N}
"""


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(PARQ).select("vec_id", "embedding")


@pytest.fixture(scope="module")
def eval_emb(corpus):
    return (corpus.filter(F.col("vec_id") < NEARDUP_N)
            .select("vec_id",
                    F.transform(
                        "embedding",
                        lambda v: v * NEARDUP_SCALE + NEARDUP_SHIFT)
                    .alias("embedding")))


def test_broadcast_kept_set_matches_brute_twin(corpus, eval_emb):
    n = corpus.count()
    kept = sorted(r["vec_id"] for r in
                  SD.semantic_decontaminate(corpus, eval_emb).collect())
    con = duckdb.connect()
    want = sorted(r[0] for r in con.execute(
        SD.duckdb_semantic_kept_sql(CORPUS_SQL, EVAL_SQL)).fetchall())
    assert kept == want
    # the engineered leak is exactly vec_id < NEARDUP_N: each eval item
    # sits at cos ~0.9997 to its source and ~corpus-background to the rest
    assert kept == sorted(set(range(n)) - set(range(NEARDUP_N)))


def test_report_matches_twin(corpus, eval_emb):
    got = {r["vec_id"]: (r["n_eval_hits"], r["max_cos"]) for r in
           SD.semantic_contamination_report(corpus, eval_emb).collect()}
    con = duckdb.connect()
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        SD.duckdb_semantic_report_sql(CORPUS_SQL, EVAL_SQL)).fetchall()}
    assert got == want
    assert set(got) == set(range(NEARDUP_N))
    assert all(v[1] >= 0.95 for v in got.values())


def test_cells_full_probe_equals_brute_force(corpus, eval_emb):
    """nprobe=k probes every cell — the cell routing must then be a pure
    re-keying of the identical comparison set, drop-for-drop."""
    brute = sorted(r["vec_id"] for r in
                   SD.semantic_decontaminate(corpus, eval_emb).collect())
    routed = sorted(r["vec_id"] for r in
                    SD.semantic_decontaminate(
                        corpus, eval_emb, mode="cells",
                        nprobe=K_CELLS).collect())
    assert routed == brute


def test_cells_mode_matches_unrolled_twin(corpus, eval_emb):
    """Default nprobe: the partial-probe drop set (IVF's recall trade)
    must equal the unrolled DuckDB twin value-for-value."""
    kept = sorted(r["vec_id"] for r in
                  SD.semantic_decontaminate(
                      corpus, eval_emb, mode="cells").collect())
    con = duckdb.connect()
    want = sorted(r[0] for r in con.execute(
        SD.duckdb_semantic_kept_cells_sql(CORPUS_SQL, EVAL_SQL)).fetchall())
    assert kept == want
    # partial probe may only UNDER-drop vs brute force, never over-drop
    brute = set(r["vec_id"] for r in
                SD.semantic_decontaminate(corpus, eval_emb).collect())
    assert set(kept) >= brute


def test_injected_codebook_reused(corpus, eval_emb):
    from ocr_documents_spark.operators.ivf import train_centroids
    cb = train_centroids(corpus)
    default = sorted(r["vec_id"] for r in SD.semantic_decontaminate(
        corpus, eval_emb, mode="cells").collect())
    injected = sorted(r["vec_id"] for r in SD.semantic_decontaminate(
        corpus, eval_emb, mode="cells", centroids=cb).collect())
    assert injected == default


def test_broadcast_scoring_never_shuffles_corpus(corpus, eval_emb):
    """Scale shape: in broadcast mode the corpus reaches the scoring
    join without ANY shuffle — every Exchange in the report plan is
    either a BroadcastExchange (the eval side / codebook) or the
    post-hit per-doc aggregate keyed on vec_id (hits only, tiny)."""
    plan = SD.semantic_contamination_report(corpus, eval_emb) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for ln in plan.splitlines():
        if "Exchange" in ln and "BroadcastExchange" not in ln \
                and "ReusedExchange" not in ln:
            assert "vec_id" in ln, f"corpus-side shuffle: {ln}"
