"""N-gram LM scoring (operators/ngram_lm.py): CCNet-style perplexity
tiers and DSIR Gumbel-top-k selection against exact DuckDB twins —
integer micro-nat log terms make every sum engine- and
partitioning-exact."""

import duckdb

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import ngram_lm as LM

SF_DIR = "/root/testdata/sf0.001"
PARQ = f"{SF_DIR}/documents.parquet"
TARGET_SRC = ("(SELECT doc_id, text FROM documents "
              "WHERE source = 'src3')")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(PARQ).select("doc_id", "text", "source")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS "
              f"SELECT doc_id, text, source FROM '{PARQ}'")
    return c


def test_perplexity_matches_twin_exactly(docs, con):
    counts = LM.train_lm_counts(docs, sample_mod=2)
    got = {r["doc_id"]: (r["n_grams"], r["avg_logp"])
           for r in LM.perplexity_scores(docs, counts).collect()}
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        LM.duckdb_perplexity_sql(sample_mod=2)).fetchall()}
    assert got == want and len(got) == 500
    # sanity: in-sample docs are more probable on average than the rest
    in_s = [v[1] for k, v in got.items() if k % 2 == 0 and v[1] is not None]
    assert sum(in_s) / len(in_s) > -12  # smoothed logp is finite & sane


def test_quality_tiers_match_twin_and_fractions(docs, con):
    counts = LM.train_lm_counts(docs)
    scored = LM.perplexity_scores(docs, counts)
    cuts = LM.tier_thresholds(scored)
    got = {r["doc_id"]: (r["avg_logp"], r["tier"])
           for r in LM.quality_tiers(scored, cuts).collect()}
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        LM.duckdb_quality_tiers_sql()).fetchall()}
    assert got == want
    tiers = [t for _, t in got.values()]
    n = len(tiers)
    # quantile cuts put ~10% head / ~30% tail modulo ties at the cut
    assert abs(tiers.count("head") - 0.1 * n) <= 0.05 * n
    assert abs(tiers.count("tail") - 0.3 * n) <= 0.05 * n
    assert tiers.count("middle") > 0


def test_dsir_select_matches_twin_and_enriches_target(docs, con):
    target = docs.filter(F.col("source") == "src3")
    t_counts = LM.train_lm_counts(target)
    r_counts = LM.train_lm_counts(docs)
    got = sorted((r["doc_id"], r["weight_micro"], r["rank"]) for r in
                 LM.dsir_select(docs, t_counts, r_counts, k=50).collect())
    want = sorted(tuple(r) for r in con.execute(
        LM.duckdb_dsir_select_sql(k=50, target_src=TARGET_SRC)).fetchall())
    assert got == want and len(got) == 50
    # the selection must enrich the target domain well beyond its base
    # rate (the whole point of importance resampling)
    srcs = {r["doc_id"]: r["source"] for r in docs.collect()}
    base = sum(1 for s in srcs.values() if s == "src3") / len(srcs)
    sel = sum(1 for d, _, _ in got if srcs[d] == "src3") / len(got)
    assert sel > 2 * base, (sel, base)


def test_salt_rotates_selection_weights_stay_fixed(docs):
    target = docs.filter(F.col("source") == "src3")
    t_counts = LM.train_lm_counts(target)
    r_counts = LM.train_lm_counts(docs)
    a = {r["doc_id"]: r["weight_micro"] for r in
         LM.dsir_select(docs, t_counts, r_counts, k=30).collect()}
    b = {r["doc_id"]: r["weight_micro"] for r in
         LM.dsir_select(docs, t_counts, r_counts, k=30,
                        salt="epoch2").collect()}
    # weights are salt-independent wherever the doc appears in both
    for d in a.keys() & b.keys():
        assert a[d] == b[d]
    # but the drawn set rotates
    assert a.keys() != b.keys()


def test_gramless_docs_score_null_and_tier_tail(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha beta"), (2, "single"), (3, "")],
        "doc_id long, text string")
    counts = LM.train_lm_counts(df)
    scored = LM.perplexity_scores(df, counts)
    rows = {r["doc_id"]: (r["n_grams"], r["avg_logp"])
            for r in scored.collect()}
    assert rows[1][0] == 3 and rows[1][1] is not None
    assert rows[2] == (0, None) and rows[3] == (0, None)
    tiers = {r["doc_id"]: r["tier"] for r in LM.quality_tiers(
        scored, LM.tier_thresholds(scored)).collect()}
    assert tiers[2] == "tail" and tiers[3] == "tail"


def test_scoring_plan_shuffles_fingerprints_only(docs):
    """Scale shape: no exchange in the scoring plan carries a raw gram
    string — hashpartitioning keys are the 15-hex fingerprint or the
    doc id — and the corpus-side gram build is codegen (no UDFs)."""
    counts = LM.train_lm_counts(docs)
    plan = (LM.perplexity_scores(docs, counts)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "gram#" not in ln, ln
