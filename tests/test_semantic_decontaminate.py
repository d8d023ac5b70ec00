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


def test_cells_seed_by_hash_on_foreign_id_space(corpus, eval_emb):
    """Production trap regression: a corpus whose id space lacks the
    fixture INIT_IDS would silently train an EMPTY codebook under
    absolute-id seeding and the cells mode would no-op (eval leaks pass
    into training).  seed_by_hash=True derives the seeds from the data —
    the operator must actually drop, and match the seed_by_hash twin
    value-for-value on the shifted ids."""
    shift = 10_000
    sh_corpus = corpus.select(
        (F.col("vec_id") + shift).alias("vec_id"), "embedding")
    sh_eval = eval_emb.select(
        (F.col("vec_id") + shift).alias("vec_id"), "embedding")
    kept = sorted(r["vec_id"] for r in
                  SD.semantic_decontaminate(
                      sh_corpus, sh_eval, mode="cells",
                      seed_by_hash=True).collect())
    n = corpus.count()
    assert len(kept) < n, "cells mode no-opped on a foreign id space"
    con = duckdb.connect()
    sh_corpus_sql = (f"SELECT vec_id + {shift} AS vec_id, embedding "
                     f"FROM ({CORPUS_SQL})")
    sh_eval_sql = (f"SELECT vec_id + {shift} AS vec_id, embedding "
                   f"FROM ({EVAL_SQL})")
    want = sorted(r[0] for r in con.execute(
        SD.duckdb_semantic_kept_cells_sql(
            sh_corpus_sql, sh_eval_sql, seed_by_hash=True)).fetchall())
    assert kept == want


def test_hit_ids_anti_join_equals_broadcast_mode(corpus, eval_emb):
    """semantic_hit_ids is the cheap drop key the curation stage uses:
    anti-joining on it must reproduce semantic_decontaminate exactly
    (duplicates in the hit stream are harmless to an anti-join)."""
    via_helper = sorted(r["vec_id"] for r in corpus.join(
        SD.semantic_hit_ids(corpus, eval_emb),
        "vec_id", "left_anti").collect())
    direct = sorted(r["vec_id"] for r in
                    SD.semantic_decontaminate(corpus, eval_emb).collect())
    assert via_helper == direct


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
