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


def test_global_cumsum_double_values_exact(spark):
    """Review finding: a cast('long') floor-truncated each partition's
    partial sum for fractional inputs.  Doubles must sum exactly."""
    df = spark.createDataFrame(
        [(i, 2.5) for i in range(9)], "id long, v double")
    got = {r["id"]: r["cs"]
           for r in with_global_cumsum(df, [F.asc("id")], "v", "cs",
                                       num_partitions=3).collect()}
    assert got == {i: i * 2.5 for i in range(9)}
