"""Distributed Bloom filter (operators/bloom.py): bit-identical build
and verdict parity vs the DuckDB twin, the no-false-negative guarantee,
the measured false-positive band, filter mergeability, plan shape
(bounded build exchange, zero-shuffle Arrow probe), and the ingest
pre-filter composition over real document fingerprints."""

import duckdb
import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.operators import bloom as B
from ocr_documents_spark.operators.dedup import fingerprint15

M = 1 << 14          # small enough that false positives are observable
K = 7
N_MEMBERS = 2000


def _keys(prefix, n):
    return [f"{prefix}-{i:05d}" for i in range(n)]


@pytest.fixture(scope="module")
def members(spark):
    return spark.createDataFrame(
        [(k,) for k in _keys("member", N_MEMBERS)], "key string")


@pytest.fixture(scope="module")
def words(members):
    return B.bloom_build(members, "key", M, K).localCheckpoint()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("keys", pd.DataFrame({"key": _keys("member", N_MEMBERS)}))
    con.register("mixed", pd.DataFrame(
        {"key": _keys("member", 500) + _keys("fresh", 500)}))
    return con


def test_words_bit_identical_to_duckdb(words, duck):
    got = sorted((r["word_idx"], r["word"]) for r in words.collect())
    want = sorted(tuple(r) for r in duck.execute(
        B.duckdb_bloom_words_sql("keys", "key", M, K)).fetchall())
    assert got == want and len(got) > 0


def test_probe_parity_both_paths(spark, members, words, duck):
    mixed = spark.createDataFrame(
        [(k,) for k in _keys("member", 500) + _keys("fresh", 500)],
        "key string")
    join_verdicts = {r["key"]: r["maybe_present"] for r in
                     B.bloom_probe(mixed, words, "key", M, K).collect()}
    bitmap = B.bloom_words_to_bitmap(words, M)
    udf_verdicts = {r["key"]: r["maybe_present"] for r in
                    B.with_bloom_maybe(mixed, bitmap, "key", M, K)
                    .collect()}
    want = {k: v for k, v in duck.execute(
        B.duckdb_bloom_probe_sql("keys", "mixed", "key", M, K)).fetchall()}
    assert join_verdicts == want
    assert udf_verdicts == want
    # the non-broadcast relational path answers identically
    assert {r["key"]: r["maybe_present"] for r in
            B.bloom_probe(mixed, words, "key", M, K,
                          broadcast=False).collect()} == want


def test_no_false_negatives_and_fpr_band(spark, members, words):
    """Every inserted key MUST probe true (the semantic guarantee); the
    false-positive rate on fresh keys sits in the expected band around
    (1 - e^(-kn/m))^k."""
    bitmap = B.bloom_words_to_bitmap(words, M)
    flagged = B.with_bloom_maybe(members, bitmap, "key", M, K)
    assert flagged.filter(~F.col("maybe_present")).count() == 0

    fresh = spark.createDataFrame(
        [(k,) for k in _keys("fresh", 2000)], "key string")
    fp = (B.with_bloom_maybe(fresh, bitmap, "key", M, K)
          .filter(F.col("maybe_present")).count())
    expected = (1 - math.exp(-K * N_MEMBERS / M)) ** K
    assert 0 < fp / 2000 < max(4 * expected, 0.08)
    # NULL keys are not members
    nulls = spark.createDataFrame([(None,)], "key string")
    assert B.with_bloom_maybe(nulls, bitmap, "key", M, K) \
        .first()["maybe_present"] is False


def test_union_equals_joint_build(spark, members):
    """Mergeability: per-batch filters OR into the filter built over
    the union corpus, row for row — the property that lets daily-ingest
    filters fold into the history filter without a rebuild."""
    a = members.filter(F.col("key") < "member-01000")
    b = members.filter(F.col("key") >= "member-01000")
    merged = B.bloom_union(B.bloom_build(a, "key", M, K),
                           B.bloom_build(b, "key", M, K))
    joint = B.bloom_build(members, "key", M, K)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, joint.collect()))


def test_plan_shapes(members, words):
    """Build: the only exchange is the word-level aggregate with a
    map-side partial (the shuffled payload is ≤ m/32 packed rows per
    task, never the corpus).  Arrow probe: ZERO exchange — scan,
    project, one ArrowEvalPython."""
    build_plan = B.bloom_build(members, "key", M, K) \
        ._jdf.queryExecution().executedPlan().toString()
    assert build_plan.count("Exchange") == 1
    assert "Exchange hashpartitioning(word_idx" in build_plan
    assert build_plan.count("HashAggregate") == 2  # partial + final
    exch = next(l for l in build_plan.splitlines() if "Exchange" in l)
    assert "key" not in exch

    bitmap = B.bloom_words_to_bitmap(words, M)
    probe_plan = B.with_bloom_maybe(members, bitmap, "key", M, K) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in probe_plan
    assert "ArrowEvalPython" in probe_plan


def test_ingest_prefilter_composition(spark):
    """The deployment flow: a filter over the history corpus's content
    fingerprints splits a new batch into definitely-new (skips the
    exact dedup probe — provably zero false skips) and maybe-seen (the
    only rows that pay the exact check)."""
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    history = docs.filter(F.col("doc_id") % 5 != 0) \
        .select(fingerprint15(F.col("text")).alias("key"))
    words = B.bloom_build(history, "key", M, K)
    bitmap = B.bloom_words_to_bitmap(words, M)

    batch = (docs.filter(F.col("doc_id") % 10 < 6)  # overlaps history
             .select("doc_id", fingerprint15(F.col("text")).alias("key")))
    flagged = B.with_bloom_maybe(batch, bitmap, "key", M, K)

    seen_keys = {r["key"] for r in history.distinct().collect()}
    definitely_new = {r["key"] for r in
                      flagged.filter(~F.col("maybe_present")).collect()}
    assert definitely_new.isdisjoint(seen_keys)   # zero false skips
    # and the pre-filter does real work: the truly-new slice is found
    truly_new = {r["key"] for r in batch.collect()} - seen_keys
    assert len(definitely_new) >= 0.9 * len(truly_new) > 0
