"""BPE tokenizer induction (operators/bpe.py): learned merges vs an
independent string-based reference, the ACL'16 textbook example,
exact round-trip on real and adversarial corpora, sequential==priority
encoding, and the distributed/DuckDB pair-census twins."""

import re
from collections import Counter

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

from ocr_documents_spark.operators import bpe as B

PARQ = "/root/testdata/sf0.001/documents.parquet"
SEP = "\x00"


def oracle_bpe(census, n_merges):
    """Independent quadratic reference: symbols kept as SEP-joined
    strings, merging via re.sub (leftmost non-overlapping), pair counts
    recounted from scratch every iteration."""
    words = [(SEP.join(w), n) for w, n in census if w]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for s, n in words:
            syms = s.split(SEP)
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)

        def sub(s):
            syms = s.split(SEP)
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1]); i += 2
                else:
                    out.append(syms[i]); i += 1
            return SEP.join(out)
        words = [(sub(s), n) for s, n in words]
    return merges


def priority_encode(word, merges):
    """Independent rank-priority encoder (HF-tokenizers shape)."""
    rank = {pair: i for i, pair in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        ranked = [(rank.get((a, b)), i)
                  for i, (a, b) in enumerate(zip(syms, syms[1:]))
                  if (a, b) in rank]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


@pytest.fixture(scope="module")
def census(spark):
    return B.word_census(spark.read.parquet(PARQ), top_words=300)


def test_learner_matches_independent_oracle(census):
    local = [(r["word"], r["n"]) for r in census.collect()]
    assert B.learn_bpe_merges(local, 40) == oracle_bpe(local, 40)


def test_textbook_example():
    census = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    got = B.learn_bpe_merges(census, 4)
    # es/st tie at 9 -> lexicographic; then est,t; then l,o / lo,w at 7
    assert got == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


def test_encode_round_trip_on_corpus(spark, census):
    merges = B.learn_bpe_merges(census, 60)
    docs = spark.read.parquet(PARQ)
    enc = B.encode_docs(docs, merges)
    joined = docs.join(enc, "doc_id")
    bad = joined.filter(
        F.array_join("tokens", "") != F.coalesce(F.col("text"), F.lit("")))
    assert bad.count() == 0
    assert enc.count() == docs.count()
    # merged symbols really appear: vocabulary grew beyond single chars
    toks = B.token_census(enc)
    assert toks.filter(F.length("token") > 1).count() > 0


def test_sequential_equals_priority_encoding(census):
    merges = B.learn_bpe_merges(census, 60)
    for w in [" the", " document", " extraction", "12345", "!!??",
              " zzzzunseen", "x", "", " lowest"]:
        assert B.encode_word(w, merges) == priority_encode(w, merges)


def test_distributed_pair_counts_matches_duckdb_and_learner(spark, census):
    got = {(r["a"], r["b"]): r["n_pairs"]
           for r in B.distributed_pair_counts(census).collect()}
    local = [(r["word"], r["n"]) for r in census.collect()]
    con = duckdb.connect()
    con.register("census", pd.DataFrame(local, columns=["word", "n"]))
    want = {(r[0], r[1]): r[2] for r in con.execute(
        B.duckdb_pair_counts_sql("census")).fetchall()}
    assert got == want
    # and both equal the learner's first-iteration counter
    counts = Counter()
    for w, n in local:
        for x, y in zip(w, w[1:]):
            counts[(x, y)] += n
    assert got == dict(counts)
    first = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert B.learn_bpe_merges(local, 1) == [first]


def test_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab ab")], "doc_id long, text string")
    enc = {r["doc_id"]: r["tokens"] for r in
           B.encode_docs(docs, [("a", "b")]).collect()}
    assert enc[1] == [] and enc[2] == []
    # pretokens "ab", " ab"; the leading space is its own symbol
    assert enc[3] == ["ab", " ", "ab"]


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=" abz09.!\t\nXY", max_size=60))
def test_pretokenizer_total_coverage_and_round_trip(text):
    toks = re.findall(B.PRETOKEN_RE, text)
    assert "".join(toks) == text
    merges = [("a", "b"), ("ab", "z"), (" ", "a"), ("0", "9")]
    out = []
    for w in toks:
        seg = B.encode_word(w, merges)
        assert "".join(seg) == w
        out.extend(seg)
    assert "".join(out) == text


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abc ", min_size=1, max_size=8),
                          st.integers(min_value=1, max_value=9)),
                min_size=1, max_size=12))
def test_learner_matches_oracle_on_random_censuses(census):
    assert B.learn_bpe_merges(census, 8) == oracle_bpe(census, 8)


def test_incremental_learner_at_ten_thousand_merges():
    """r4 verdict #3: the per-merge full recount was O(n_merges * census);
    the incremental pair-count update must make a 10^4-merge vocab over a
    several-thousand-word census tractable.  Prefix property (greedy
    sequential learning) lets the quadratic reference check the head of
    the sequence without paying its full cost.

    Measured on this VM: incremental ~2-6 s for 10_000 merges over a
    6_000-word census (the old recount shape was ~x100 that); the bound
    below is deliberately loose because VM throughput drifts 2-3x."""
    import random
    import time

    rnd = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    # zipf-ish census: many distinct words, shared morphology so merges
    # keep finding productive pairs deep into the run
    stems = ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(3, 8)))
             for _ in range(2600)]
    suffixes = ["", "s", "ing", "ed", "ly", "est", "tion", "ness"]
    census = {}
    for i, st in enumerate(stems):
        for sf in suffixes:
            if rnd.random() < 0.5:
                census[" " + st + sf] = rnd.randint(1, 1000)
    census = sorted(census.items())
    assert len(census) > 4000

    t0 = time.monotonic()
    merges = B.learn_bpe_merges(census, 10_000)
    dt = time.monotonic() - t0
    assert len(merges) == 10_000
    assert dt < 120, f"incremental learner took {dt:.1f}s for 10k merges"

    k = 250
    assert merges[:k] == oracle_bpe(census, k)
