"""Continuous-aggregate rollup (operators/rollup.py): the associativity
contract — folding per-batch increments must equal the one-shot rollup —
on real fixture events, under arbitrary batch splits."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_documents_spark.operators.rollup import (merge_rollups,
                                                  rollup_increment,
                                                  rollup_readout)

SF_DIR = "/root/testdata/sf0.001"


def _cells(df):
    return {(r["bucket_start"], r["event_type"]):
            (r["n"], round(r["total_value"], 6),
             r["min_value"], r["max_value"])
            for r in df.collect()}


def test_two_batch_fold_equals_one_shot(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full = rollup_increment(ev)
    a = rollup_increment(ev.filter(F.col("event_id") % 2 == 0))
    b = rollup_increment(ev.filter(F.col("event_id") % 2 == 1))
    assert _cells(merge_rollups(a, b)) == _cells(full)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=5),
       st.integers(min_value=0, max_value=10_000))
def test_any_split_folds_to_the_same_rollup(spark, n_batches, salt):
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .filter(F.col("event_id") < 400))
    full = rollup_increment(ev, window="30 minutes")
    part = F.pmod(F.xxhash64(F.col("event_id") + salt), n_batches)
    folded = rollup_increment(
        ev.filter(part == 0), window="30 minutes")
    for i in range(1, n_batches):
        folded = merge_rollups(
            folded, rollup_increment(ev.filter(part == i),
                                     window="30 minutes"))
    assert _cells(folded) == _cells(full)


def test_readout_derives_avg_and_never_stores_it(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    roll = rollup_increment(ev)
    assert "avg_value" not in roll.columns          # state stays mergeable
    out = rollup_readout(roll).limit(5).collect()
    for r in out:
        assert r["avg_value"] is not None and r["n"] > 0
