"""Distributed ranking primitives (operators/rank.py) against their
single-partition window definitions, across partition counts — the
operator must be partitioning-invariant by construction."""

import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from ocr_documents_spark.operators.rank import (grouped_top_k,
                                                with_global_cumsum,
                                                with_global_rank)


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(0, 50), rng.choice("abc"))
            for i in range(503)]        # ties in v, unique id tiebreak
    return spark.createDataFrame(rows, "id long, v long, g string")


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_global_rank_matches_window_definition(data, parts):
    order = [F.desc("v"), F.asc("id")]
    got = {r["id"]: r["rk"]
           for r in with_global_rank(data, order, "rk", parts).collect()}
    want = {r["id"]: r["rk"] for r in data.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order))).collect()}
    assert got == want


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_global_cumsum_matches_window_definition(data, parts):
    order = [F.asc("v"), F.asc("id")]
    got = {r["id"]: r["cs"]
           for r in with_global_cumsum(data, order, "v", "cs",
                                       parts).collect()}
    w = (Window.orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    want = {r["id"]: r["cs"] for r in data.withColumn(
        "cs", F.coalesce(F.sum("v").over(w), F.lit(0))).collect()}
    assert got == want


@pytest.mark.parametrize("salt", [1, 4, 16])
def test_grouped_top_k_matches_window_definition(data, salt):
    got = {(r["g"], r["v"], r["id"]): r["rank"]
           for r in grouped_top_k(data, ["g"], ["v", "id"], 7,
                                  salt_buckets=salt).collect()}
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = {(r["g"], r["v"], r["id"]): r["rank"]
            for r in data.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 7).collect()}
    assert got == want


@pytest.mark.parametrize("parts", [16, 64])
def test_global_rank_all_equal_keys_high_partitions(spark, parts):
    """Adversarial range-partitioner input: every primary sort key is
    IDENTICAL, so the range sampler sees one value and boundaries must
    fall back to the unique tiebreak — ranks stay exact and dense even
    with far more partitions than distinct primary keys (and with most
    partitions empty)."""
    df = spark.createDataFrame([(i, 1) for i in range(211)],
                               "id long, v long")
    got = {r["id"]: r["rk"] for r in with_global_rank(
        df, [F.asc("v"), F.asc("id")], "rk", parts).collect()}
    assert got == {i: i + 1 for i in range(211)}


def test_global_rank_engineered_key_skew(spark):
    """90% of rows share one primary key (a hot shard): the local sorts
    stay partition-local and the result must still equal the
    single-partition window definition exactly."""
    rows = [(i, 0 if i % 10 else 7 + i % 3) for i in range(601)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.desc("v"), F.asc("id")]
    got = {r["id"]: r["rk"]
           for r in with_global_rank(df, order, "rk", 32).collect()}
    want = {r["id"]: r["rk"] for r in df.withColumn(
        "rk", F.row_number().over(Window.orderBy(*order))).collect()}
    assert got == want


@pytest.mark.parametrize("parts", [16, 64])
def test_global_cumsum_all_equal_keys_negative_doubles(spark, parts):
    """All-equal primary keys + sign-mixed doubles at high partition
    counts: the broadcast offsets must come only from genuinely
    preceding partitions (empty partitions contribute nothing) and the
    running sum must match the window definition bit-for-bit."""
    rows = [(i, 3, (-1.5 if i % 3 else 2.25)) for i in range(157)]
    df = spark.createDataFrame(rows, "id long, v long, x double")
    order = [F.asc("v"), F.asc("id")]
    got = {r["id"]: r["cs"] for r in with_global_cumsum(
        df, order, "x", "cs", parts).collect()}
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = {r["id"]: r["cs"] for r in df.withColumn(
        "cs", F.coalesce(F.sum("x").over(w), F.lit(0.0))).collect()}
    assert got == want


def test_grouped_top_k_whole_topk_in_one_salt_cell(spark):
    """Salt-collision property: engineer the data so ALL k true winners
    of the hot group hash into the SAME salt bucket (computed with the
    operator's own salt expression) — level 1 must retain the full k
    from that one cell and the merge must not admit any level-1
    survivor from other cells."""
    ids = list(range(4000))
    base = spark.createDataFrame([(i,) for i in ids], "id long")
    bucket0 = [r["id"] for r in base.select(
        "id", F.pmod(F.xxhash64(F.lit(0), F.col("id")),
                     F.lit(8)).alias("s"))
        .filter(F.col("s") == 0).limit(5).collect()]
    assert len(bucket0) == 5
    rows = [("hot", 0 if i in set(bucket0) else 1, i) for i in ids]
    rows += [("cold", v, i) for i, v in enumerate(range(3))]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    got = {(r["g"], r["rank"]): (r["v"], r["id"])
           for r in grouped_top_k(df, ["g"], ["v", "id"], 5,
                                  salt_buckets=8).collect()}
    for rank, i in enumerate(sorted(bucket0), start=1):
        assert got[("hot", rank)] == (0, i)
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = {(r["g"], r["rank"]): (r["v"], r["id"])
            for r in df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5).collect()}
    assert got == want


def test_grouped_top_k_k_exceeds_group_size(spark):
    """k larger than every group: each group returns all its rows,
    ranked, never padded or duplicated."""
    df = spark.createDataFrame(
        [("a", 2, 0), ("a", 1, 1), ("b", 9, 2)], "g string, v long, id long")
    got = sorted((r["g"], r["rank"], r["v"])
                 for r in grouped_top_k(df, ["g"], ["v", "id"], 10,
                                        salt_buckets=4).collect())
    assert got == [("a", 1, 1), ("a", 2, 2), ("b", 1, 9)]


def test_global_cumsum_double_values_exact(spark):
    """Review finding: a cast('long') floor-truncated each partition's
    partial sum for fractional inputs.  Doubles must sum exactly."""
    df = spark.createDataFrame(
        [(i, 2.5) for i in range(9)], "id long, v double")
    got = {r["id"]: r["cs"]
           for r in with_global_cumsum(df, [F.asc("id")], "v", "cs",
                                       num_partitions=3).collect()}
    assert got == {i: i * 2.5 for i in range(9)}
