"""Randomized cross-engine parity for the r5 dedup reshape (exact-class
collapse + hot-bucket star guard): `dedup_groups` against its recursive-CTE
DuckDB oracle on seeded random corpora that mix every shape the new code
paths route differently —

* exact-duplicate classes, including whitespace variants (multi-space,
  leading/trailing — same `words_col` fingerprint on both engines),
* near-duplicates (single-word edits of a shared base),
* docs too short to shingle (< SHINGLE_N words), incl. identical shorts
  (the documented r5 semantic: byte-identical content groups regardless
  of length),
* NULL and empty texts (one shared exact class on both engines),
* unique singletons,

run once at the default BUCKET_CAP (small buckets -> all-pairs branch)
and once at a tiny cap (random buckets overflow -> star branch).  The
engineered tests in test_dedup.py pin each branch on hand-built corpora;
this file's job is the cross product nobody hand-builds.  Near-dup
RECALL is probabilistic by design — both engines share the MinHash
constants, so the assertion is value parity of the full
(doc_id, group_id, group_size, is_canonical) set, never recall.
"""

import random

import duckdb
import pandas as pd
import pytest

from ocr_documents_spark.operators import dedup as D

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
         "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi",
         "omega", "2024-01-05", "v2.1", "(paren)", "a,b"]


def _random_dup_corpus(seed: int, n_base: int = 18):
    rng = random.Random(seed)
    rows, did = [], 0

    def emit(text):
        nonlocal did
        rows.append((did, text))
        did += 1

    for _ in range(n_base):
        k = rng.randrange(6, 14)
        words = [rng.choice(WORDS) for _ in range(k)]
        emit(" ".join(words))
        # exact duplicates, some as whitespace variants of the same class
        for _ in range(rng.randrange(0, 4)):
            if rng.random() < 0.5:
                emit(" ".join(words))
            else:
                emit("  " + "  ".join(words) + " ")
        # near-duplicate: one-word edit (catching it is up to the bands;
        # both engines share the constants, so parity holds either way)
        if rng.random() < 0.6:
            w2 = list(words)
            w2[rng.randrange(k)] = "EDITWORD"
            emit(" ".join(w2))
    # short docs (below shingle width): identical pairs group via the
    # exact-class star edge, lone shorts stay singletons
    for _ in range(rng.randrange(2, 5)):
        short = " ".join(rng.choice(WORDS) for _ in range(rng.randrange(1, 3)))
        emit(short)
        if rng.random() < 0.5:
            emit(short)
    # NULL and empty text share one exact class on both engines
    if rng.random() < 0.7:
        emit(None)
        emit("")
    rng.shuffle(rows)
    return rows


def _oracle(rows, **kw):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return sorted(tuple(r) for r in
                  con.execute(D.duckdb_dedup_groups_sql(**kw)).fetchall())


@pytest.mark.parametrize("seed", [7, 193, 4052])
def test_dedup_groups_parity_on_random_dup_corpora(spark, seed):
    rows = _random_dup_corpus(seed)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["group_id"], r["group_size"],
                  r["is_canonical"]) for r in D.dedup_groups(docs).collect())
    assert got == _oracle(rows)
    # the corpus engineered real duplicate structure; prove it registered
    assert any(size > 1 for _, _, size, _ in got)


@pytest.mark.parametrize("seed", [23, 881])
def test_dedup_groups_parity_with_tiny_bucket_cap(spark, seed):
    """cap=2 overflows every band bucket the random duplicates populate,
    so the star branch runs on arbitrary data, not just the engineered
    hot-cluster corpus."""
    rows = _random_dup_corpus(seed)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["doc_id"], r["group_id"], r["group_size"],
                  r["is_canonical"])
                 for r in D.dedup_groups(docs, bucket_cap=2).collect())
    assert got == _oracle(rows, bucket_cap=2)
