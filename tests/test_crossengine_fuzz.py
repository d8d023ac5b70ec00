"""Randomized cross-engine parity: the new text operators (line dedup,
n-gram LM scoring) against their DuckDB twins on adversarial random
corpora — whitespace runs, tabs, carriage returns, blank lines, repeated
fragments — where tokenization drift between engines classically hides.

Deterministic seeds; each case registers the SAME generated corpus in
both engines and demands value-for-value equality."""

import random

import duckdb

import pytest

from ocr_documents_spark.operators import line_dedup as LD
from ocr_documents_spark.operators import ngram_lm as LM

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "NODE", "x1", "y2", "payload",
         "2024-01-05", "v2.1", "(paren)", "a,b", "tab\tsep"]
SEPS = [" ", "  ", " \t ", "\t"]
REPEATED = ["shared boilerplate line with enough characters",
            "another recurring footer fragment entirely"]


def _random_corpus(seed: int, n_docs: int = 40):
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        lines = []
        for _ in range(rng.randrange(1, 8)):
            if rng.random() < 0.3:
                lines.append(rng.choice(REPEATED))
            elif rng.random() < 0.1:
                lines.append(rng.choice(["", " ", "\t", "   "]))
            else:
                k = rng.randrange(1, 9)
                lines.append(rng.choice(SEPS).join(
                    rng.choice(WORDS) for _ in range(k)))
        text = "\n".join(lines)
        if rng.random() < 0.1:
            text += "\r"          # stray CR survives the \n split
        rows.append((d, text))
    return rows


@pytest.mark.parametrize("seed", [11, 47, 2026])
def test_line_dedup_parity_on_random_corpora(spark, seed):
    rows = _random_corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_dropped"])
           for r in LD.remove_common_lines(df, min_docs=3).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        LD.duckdb_remove_common_lines_sql(min_docs=3)).fetchall()}
    assert got == want


@pytest.mark.parametrize("seed", [13, 99])
def test_perplexity_parity_on_random_corpora(spark, seed):
    rows = _random_corpus(seed)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = LM.train_lm_counts(df, sample_mod=2)
    got = {r["doc_id"]: (r["n_grams"], r["avg_logp"])
           for r in LM.perplexity_scores(df, counts).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        LM.duckdb_perplexity_sql(sample_mod=2)).fetchall()}
    assert got == want
