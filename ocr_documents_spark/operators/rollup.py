"""Hypertable-style continuous aggregates: incremental time-bucket rollups.

TimescaleDB's continuous aggregates (and every streaming-warehouse
equivalent) maintain a downsampled (bucket, key) table that new data
UPDATES rather than recomputes.  The Spark-native form: keep the rollup
in MERGEABLE partial-aggregate state — (n, total, min, max) per cell,
with avg derived at read time — so an increment computed from a new
batch folds into the existing table with a groupBy-sum, and
``rollup(A ∪ B) == merge(rollup(A), rollup(B))`` holds exactly (the
associativity contract tests/test_rollup.py proves).  Only states that
merge (count/sum/min/max, avg as sum÷n — NOT stored averages, NOT
medians) may live in the table; that restriction IS the design.

At scale: the increment is a partial-aggregating shuffle over the new
batch only; the fold shuffles |existing cells ∩ touched buckets| rows,
not history.  With the lake's (bucket-range) partitioning the fold
becomes a dynamic-partition-overwrite MERGE like jobs/lake.py.

The batch query twin with a value-level oracle is q26 (hourly stats);
this module adds the maintenance path a query cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the mergeable state kept per (bucket_start, event_type) cell
_STATE_COLS = ("n", "total_value", "min_value", "max_value")


def rollup_increment(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """events(ts, event_type, value) -> partial-aggregate rollup cells."""
    return (events
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("total_value"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"))
            .select(F.col("w.start").alias("bucket_start"), "event_type",
                    *_STATE_COLS))


def merge_rollups(existing: DataFrame, increment: DataFrame) -> DataFrame:
    """Fold an increment into a rollup table: cells collide on
    (bucket_start, event_type) and their mergeable states combine."""
    return (existing.unionByName(increment)
            .groupBy("bucket_start", "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("total_value").alias("total_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))


def rollup_readout(rollup: DataFrame) -> DataFrame:
    """Read-time derived columns (avg lives here, never in the state).

    avg derives from the ROUNDED total: fold order perturbs the raw sum
    by an ulp, and dividing the already-rounded figure is what makes two
    engines (or two fold orders) read out identical averages.
    """
    total_r = F.round("total_value", 2)
    return rollup.select(
        "bucket_start", "event_type", "n",
        total_r.alias("total_value"),
        "min_value", "max_value",
        F.round(total_r / F.col("n"), 4).alias("avg_value"))
