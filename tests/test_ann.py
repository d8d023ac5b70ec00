"""Vector LSH functions + ANN query invariants (functions/vectors.py,
queries q21/q22/q24/q34)."""

import math

import pyspark.sql.functions as F
import pytest

from ocr_documents_spark.functions import vectors as V

SF_DIR = "/root/testdata/sf0.001"


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_seeded_sign_bands_disjoint_and_deterministic():
    bands = V.seeded_sign_bands(n_bands=2, dims_per_band=4, dim=64, seed=42)
    again = V.seeded_sign_bands(n_bands=2, dims_per_band=4, dim=64, seed=42)
    assert bands == again
    flat = [d for b in bands for d in b]
    assert len(set(flat)) == 8 and all(1 <= d <= 64 for d in flat)


def test_hyperplane_bits_signs(spark):
    """Bits follow sign(<v, plane>) exactly (hand-checkable planes)."""
    planes = [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [1.0, 1.0, 1.0]]
    df = _vecs(spark, [(0, [2.0, 3.0, -1.0]),   # +,-,+  -> 101
                       (1, [-1.0, -2.0, 0.5]),  # -,+,-  -> 010
                       (2, [0.0, 0.0, 0.0])])   # 0 counts as >=0 -> 111
    got = {r["vec_id"]: r["b"] for r in df.select(
        "vec_id", V.hyperplane_bits(F.col("embedding"), planes).alias("b")
    ).collect()}
    assert got == {0: "101", 1: "010", 2: "111"}


def test_hyperplane_bits_collide_for_neardups(spark):
    """Near-identical vectors agree on every Gaussian hyperplane whose
    margin exceeds the perturbation — the LSH property the bucket relies
    on.  With an engineered 0.9997-cosine pair all 8 seeded planes agree."""
    planes = V.random_hyperplanes(n_planes=8, dim=4, seed=7)
    base = [0.4, -1.2, 0.7, 2.0]
    near = [x * 0.99 + 0.003 for x in base]
    df = _vecs(spark, [(0, base), (1, near)])
    buckets = [r["b"] for r in df.select(
        V.hyperplane_bits(F.col("embedding"), planes).alias("b")).collect()]
    assert buckets[0] == buckets[1]


def test_q24_finds_every_engineered_pair(spark):
    """Recall of the banded sign-LSH: all 15 engineered near-dup pairs
    (cos ~0.9997) are candidates in at least one band and survive the
    exact-cosine verify; nothing else reaches 0.95."""
    from ocr_documents_spark.queries import (NEARDUP_N, NEARDUP_OFFSET,
                                             q24_embedding_neardup)
    rows = q24_embedding_neardup(spark, SF_DIR).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in rows}
    assert pairs == {(i, i + NEARDUP_OFFSET) for i in range(NEARDUP_N)}
    assert all(r["cos"] >= 0.99 for r in rows)


def test_q24_plan_has_no_allpairs_join(spark):
    """The join must key on (band_idx, bucket) — never a cross/nested-loop
    pairing (the r1 within-label quadratic shape)."""
    from ocr_documents_spark.queries import q24_embedding_neardup
    plan = q24_embedding_neardup(spark, SF_DIR) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_matches_math(spark):
    df = _vecs(spark, [(0, [1.0, 2.0, 2.0])])
    q = [2.0, 1.0, 2.0]
    got = df.select(V.cosine(
        F.col("embedding"),
        F.array(*[F.lit(x) for x in q])).alias("c")).first()["c"]
    expect = (2 + 2 + 4) / (3.0 * 3.0)
    assert math.isclose(got, expect, rel_tol=1e-12)
